package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Checkpointed resume: stop a streaming query mid-backfill, restart it
  * against a LONGER chain, and require exactly-once block coverage across
  * the two runs. This is durability the reference does not have at all —
  * its subscriptions restart from scratch on reconnect (SURVEY §3.2) —
  * and it closes the §8.3 duplicate window.
  */
class CheckpointRecoverySpec extends SparkSpec {

  test("stream resumes from checkpoint with no loss and no duplicates") {
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val out = Files.createTempDirectory("graft_ckpt_out").toString

    def runOnce(head: Long): Unit = {
      val df = spark.readStream.format("graft-eth")
        .option("dataset", "logs")
        .option("startBlock", "0")
        .option("head", head.toString)
        .option("maxBlocksPerTrigger", "200")
        .load()
        .select("blockNumber", "logIndex", "address")
      val q = df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000L)
    }

    runOnce(head = 1000)  // first life: blocks 0..1000
    runOnce(head = 2500)  // second life: must resume at 1001, not 0

    val got = spark.read.parquet(out)
    val expected = new graft.sources.SyntheticRpc(42, 2500).getLogs(0, 2500, Seq.empty, Seq.empty)
    assert(got.count() === expected.size, "row count after resume")
    // exactly-once: every (block, logIndex) appears exactly once
    val dups = got.groupBy("blockNumber", "logIndex").count().where(col("count") > 1).count()
    assert(dups === 0, s"$dups duplicated (block,logIndex) pairs after resume")
    val blocks = got.select("blockNumber").distinct().count()
    val expectedBlocks = (0L to 2500L).count(b => new graft.sources.SyntheticRpc(42, 2500).logsInBlock(b) > 0)
    assert(blocks === expectedBlocks, "block coverage after resume")
  }
}
