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

  test("LOCF ValueState survives a restart: life 2 fills from life 1's state") {
    import spark.implicits._
    val ckpt = Files.createTempDirectory("locf_ckpt").toString
    val srcDir = Files.createTempDirectory("locf_src").toString
    val outDir = Files.createTempDirectory("locf_out").toString
    // two lives over a 2-user feed: life 1 delivers each user's last real
    // reading; life 2 delivers ONLY NULL readings, so every life-2 fill
    // must come from state recovered off the checkpoint
    val life1 = Seq(
      StreamOps.LocfEvent(1L, 10L, 100L, Some(1.5)),
      StreamOps.LocfEvent(1L, 11L, 200L, None),
      StreamOps.LocfEvent(2L, 20L, 150L, Some(7.25)),
      StreamOps.LocfEvent(3L, 30L, 120L, None)) // user 3: NO real value ever
    val life2 = Seq(
      StreamOps.LocfEvent(1L, 12L, 300L, None),
      StreamOps.LocfEvent(2L, 21L, 350L, None),
      StreamOps.LocfEvent(3L, 31L, 320L, None))
    val providerConf = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerConf)
    spark.conf.set(providerConf,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runLife(rows: Seq[StreamOps.LocfEvent], file: String): Unit = {
        rows.toDF().coalesce(1).write.parquet(s"$srcDir/$file")
        val in = spark.readStream.schema(rows.toDF().schema)
          .option("recursiveFileLookup", "true").parquet(srcDir)
          .as[StreamOps.LocfEvent]
        val q = StreamOps.locfStream(in).toDF()
          .writeStream.format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(180000L)
      }
      runLife(life1, "b0")
      runLife(life2, "b1")
    } finally prev match {
      case Some(p) => spark.conf.set(providerConf, p)
      case None => spark.conf.unset(providerConf)
    }
    val got = spark.read.parquet(outDir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.size == 7, s"expected 7 filled rows, got $got")
    assert(got(12L) == Some(1.5), "life-2 NULL must fill from life-1 state (user 1)")
    assert(got(21L) == Some(7.25), "life-2 NULL must fill from life-1 state (user 2)")
    assert(got(31L).isEmpty, "a user with no real reading ever stays NULL across lives")
    assert(got(11L) == Some(1.5) && got(30L).isEmpty, "life-1 fills intact")
  }
}
