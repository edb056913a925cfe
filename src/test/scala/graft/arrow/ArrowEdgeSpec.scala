package graft.arrow

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-trip and null/empty-list semantics for the Arrow IPC edge —
  * mirrors the reference's ConverterTest fixtures: full-row conversion,
  * null handling, and the empty-list vs null-list distinction
  * (ConverterTest.java:42-197).
  */
class ArrowEdgeSpec extends SparkSpec {

  import spark.implicits._

  test("logs-shaped DataFrame round-trips through Arrow IPC") {
    val dir = Files.createTempDirectory("graft_arrow").toString
    val df = spark.read.format("graft-eth").option("dataset", "logs")
      .option("startBlock", "0").option("endBlock", "199").load()
    ArrowEdge.writeIpc(df, dir, batchSize = 128)
    val back = ArrowEdge.readIpc(dir)
    assert(back.size === df.count())
    val expected = df.orderBy("blockNumber", "logIndex")
      .select("address", "blockNumber", "topics").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2).toList)).toSeq
    val cols = df.schema.fieldNames.zipWithIndex.toMap
    val got = back.map(r => (
      r(cols("address")).asInstanceOf[String],
      r(cols("blockNumber")).asInstanceOf[Long],
      r(cols("topics")).asInstanceOf[List[String]]))
      .sortBy(t => (t._2, t._1))
    assert(got.sortBy(t => (t._2, t._1)) === expected.sortBy(t => (t._2, t._1)))
  }

  test("null vs empty list are preserved distinctly (ConverterTest semantics)") {
    val dir = Files.createTempDirectory("graft_arrow_nulls").toString
    val df = Seq(
      (1L, Some(Seq("a", "b")), Some("x")),
      (2L, Some(Seq.empty[String]), None),
      (3L, None, Some("z"))
    ).toDF("id", "arr", "s")
      .select($"id", $"arr".cast("array<string>").as("arr"), $"s")
    ArrowEdge.writeIpc(df.coalesce(1), dir)
    val back = ArrowEdge.readIpc(dir).sortBy(_(0).asInstanceOf[Long])
    assert(back(0)(1) === List("a", "b"))
    assert(back(1)(1) === List.empty) // empty list stays empty, not null
    assert(back(1)(2) === null)
    assert(back(2)(1) === null) // null list stays null, not empty
    assert(back(2)(2) === "z")
  }

  test("batch_size controls record-batch granularity (SURVEY §8.1 fix)") {
    val dir = Files.createTempDirectory("graft_arrow_batch").toString
    val df = spark.range(1000).select(col("id"), concat(lit("v"), col("id")).as("s"))
    ArrowEdge.writeIpc(df.coalesce(1), dir, batchSize = 100)
    // 1000 rows / batch 100 → readable, complete
    val back = ArrowEdge.readIpc(dir)
    assert(back.size === 1000)
    assert(back.map(_(0).asInstanceOf[Long]).toSet === (0L until 1000L).toSet)
  }
}
