package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ticket parse + mode-matrix routing (reference: Producer.java:38-64,
  * ClientRequest.java:30-36, LogsServiceTest mode coverage).
  */
class RequestRouterSpec extends SparkSpec {

  test("ticket JSON parses with number-or-string blocks (Producer.java:46-51)") {
    val r1 = RequestRouter.parseTicket(
      """{"dataset":"logs","startBlock":"0","endBlock":"100",
         "contractAddresses":["0xAB"],"topics":["0x1"]}""").asInstanceOf[LogsRequest]
    assert(r1.startBlock === Some(0L))
    assert(r1.endBlock === Some(100L))
    assert(r1.contractAddresses === Seq("0xAB"))
    val r2 = RequestRouter.parseTicket(
      """{"dataset":"blocks","startBlock":5,"endBlock":10}""").asInstanceOf[BlocksRequest]
    assert(r2.startBlock === Some(5L))
    val r3 = RequestRouter.parseTicket("""{"dataset":"logs"}""").asInstanceOf[LogsRequest]
    assert(r3.startBlock.isEmpty && r3.endBlock.isEmpty)
    intercept[IllegalArgumentException](RequestRouter.parseTicket("""{"dataset":"nope"}"""))
    intercept[IllegalArgumentException](RequestRouter.parseTicket("""{"startBlock":1}"""))
  }

  test("(S,E) routes to a bounded batch scan with filters pushed as options") {
    val df = RequestRouter.route(spark, RequestRouter.parseTicket(
      """{"dataset":"logs","startBlock":"0","endBlock":"499"}""").asInstanceOf[LogsRequest])
    assert(!df.isStreaming)
    val expected = new graft.sources.SyntheticRpc(42, 10000).getLogs(0, 499, Seq.empty, Seq.empty)
    assert(df.count() === expected.size)
  }

  test("(S,E) with address filter matches reference node-side filtering") {
    val rpc = new graft.sources.SyntheticRpc(42, 10000)
    val addr = rpc.getLogs(0, 199, Seq.empty, Seq.empty).head.address
    val df = RequestRouter.route(spark, LogsRequest(Some(0L), Some(199L), Seq(addr)))
    assert(df.count() === rpc.getLogs(0, 199, Seq(addr), Seq.empty).size)
  }

  test("(null,E) scans exactly block E (fixes reference §8.2 crash)") {
    val df = RequestRouter.route(spark, BlocksRequest(None, Some(42L)))
    assert(!df.isStreaming)
    val rows = df.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("number") === 42L)
  }

  test("(S,null) routes to a streaming scan from S") {
    val df = RequestRouter.route(spark, LogsRequest(Some(100L), None))
    assert(df.isStreaming)
  }

  test("(null,null) routes to a live-only streaming scan") {
    val df = RequestRouter.route(spark, LogsRequest(None, None))
    assert(df.isStreaming)
  }

  test("batch_size is honored for real (SURVEY §8.1) as trigger admission") {
    import org.apache.spark.sql.streaming.Trigger
    val df = RequestRouter.route(spark,
      RequestRouter.parseTicket(
        """{"dataset":"logs","startBlock":"0","batch_size":"100"}""").asInstanceOf[LogsRequest],
      Map("head" -> "350"))
    val q = df.groupBy().count()
      .writeStream.format("memory").queryName("router_batchsize")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000L)
    // 351 blocks at batch_size=100 → 4 micro-batches; total rows must equal
    // the chain's logs in [0,350]
    val total = spark.table("router_batchsize").head.getLong(0)
    val expected = new graft.sources.SyntheticRpc(42, 350).getLogs(0, 350, Seq.empty, Seq.empty).size
    assert(total === expected)
    assert(q.recentProgress.length >= 3, s"expected >=3 micro-batches, got ${q.recentProgress.length}")
  }
}
