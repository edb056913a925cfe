package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing evidence for the 100 TB story: two fact tables bucketed on
  * the join key co-locate, so the join plans with NO shuffle exchange on
  * either side — the difference between a full-cluster exchange and a
  * map-side join of pre-organized data. (Driver-side sbt test writes to a
  * temp warehouse; the technique is what ships.)
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    val db = "graft_bucket_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Catalog.t(spark, sfDir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.li_bucketed")
      Catalog.t(spark, sfDir, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.ord_bucketed")

      // disable broadcast so the join would OTHERWISE need a shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(s"$db.li_bucketed")
        .join(spark.table(s"$db.ord_bucketed"), "l_orderkey")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinLine = plan.linesIterator.find(_.contains("SortMergeJoin"))
      assert(joinLine.isDefined, s"expected SortMergeJoin, plan:\n${plan.take(1500)}")
      // both sides bucketed on the key: no shuffle before the join
      val exchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning(l_orderkey"))
      assert(exchanges === 0, s"bucketed join still shuffles:\n${plan.take(2000)}")

      // and it computes the right thing
      val direct = Catalog.t(spark, sfDir, "lineitem")
        .join(Catalog.t(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bucketed = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bucketed === direct)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
