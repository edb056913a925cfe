package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the two-phase globalDistributionRanks (range partition + broadcast
  * prefix offsets — no single-task global window) bit-for-bit against the
  * naive `Window.orderBy` formulation it replaces, including tie-heavy
  * orderings (peer-sensitive rank/cume_dist) and n < k ntile edge cases.
  */
class StockOpsSpec extends SparkSpec {

  private def naive(df: org.apache.spark.sql.DataFrame,
                    orderCols: Seq[org.apache.spark.sql.Column],
                    k: Int) = {
    val w = Window.orderBy(orderCols: _*)
    df.withColumn("ntile", ntile(k).over(w))
      .withColumn("percent_rank", percent_rank().over(w))
      .withColumn("cume_dist", cume_dist().over(w))
  }

  private def assertSame(df: org.apache.spark.sql.DataFrame,
                         orderCols: Seq[org.apache.spark.sql.Column],
                         k: Int, parts: Int): Unit = {
    val cols = df.columns.map(col) ++ Seq(col("ntile"), col("percent_rank"), col("cume_dist"))
    val fast = StockOps.globalDistributionRanks(df, orderCols, k, parts).select(cols: _*)
    val slow = naive(df, orderCols, k).select(cols: _*)
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
      s"two-phase distribution ranks differ from the global window (k=$k, parts=$parts)")
  }

  test("matches the global window on a unique ordering (orders, sf0.001)") {
    val orders = Catalog.t(spark, sfDir, "orders")
    assertSame(orders, Seq(col("o_totalprice"), col("o_orderkey")), 4, parts = 8)
  }

  test("matches the global window on a TIE-HEAVY ordering (peer semantics)") {
    import spark.implicits._
    // many duplicated keys → rank/cume_dist diverge from row_number-based
    // shortcuts unless peers are handled exactly
    val df = (1 to 500).map(i => (i % 7, i)).toDF("key", "id")
    assertSame(df, Seq(col("key")), 3, parts = 5)
    assertSame(df, Seq(col("key")), 10, parts = 3)
  }

  test("n < k and single-row edges") {
    import spark.implicits._
    val tiny = Seq((3, "c"), (1, "a"), (2, "b")).toDF("k", "v")
    assertSame(tiny, Seq(col("k")), 10, parts = 4) // n < k: one row per tile
    val one = Seq((1, "x")).toDF("k", "v")
    assertSame(one, Seq(col("k")), 4, parts = 4) // percent_rank n==1 → 0.0
  }
}
