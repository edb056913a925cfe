package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salting must never change results — only partitioning. */
class SkewOpsSpec extends SparkSpec {

  test("salted join == plain join on skewed data") {
    import spark.implicits._
    // heavy-hitter: 90% of rows share key 1
    val large = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(1L).as("k"), col("id").as("v"))
    val small = Seq((0L, "a"), (1L, "hot"), (2L, "b"), (3L, "c"), (6L, "d")).toDF("k", "tag")
    val plain = large.join(small, Seq("k"), "inner")
      .groupBy("tag").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SkewOps.saltedJoin(large, small, "k", buckets = 8)
      .groupBy("tag").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("salted left join preserves unmatched rows exactly once") {
    import spark.implicits._
    val large = spark.range(1000).select((col("id") % 5).as("k"), col("id").as("v"))
    val small = Seq((0L, "x"), (1L, "y")).toDF("k", "tag")
    val plain = large.join(small, Seq("k"), "left").count()
    // left joins must NOT salt-explode the right side's absent keys into dup nulls
    val salted = SkewOps.saltedJoin(large, small, "k", buckets = 4, joinType = "left")
    assert(salted.count() === plain)
    assert(salted.where(col("tag").isNull).count() ===
      large.where(col("k") > 1).count())
  }

  test("salted two-phase aggregation == direct aggregation") {
    val li = Catalog.t(spark, sfDir, "lineitem")
    val direct = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_l_quantity"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = SkewOps.saltedCountSum(li, "l_returnflag", "l_quantity", buckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted === direct)
  }

  test("k03 z-buckets bound BOTH dimensions (the locality property)") {
    // fixing the top 8 Morton bits fixes the top 4 bits of each 16-bit
    // coordinate, so every per-bucket extent must sit inside one 2^12
    // cell — the guarantee that makes min/max file stats prune scans on
    // EITHER filter column
    val rows = Catalog.byName("k03_zorder_layout").build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (uMin, uMax, eMin, eMax) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(uMax - uMin < 4096, s"bucket ${r.getLong(0)}: user extent ${uMax - uMin}")
      assert(eMax - eMin < 4096, s"bucket ${r.getLong(0)}: event extent ${eMax - eMin}")
      assert(uMin / 4096 === uMax / 4096 && eMin / 4096 === eMax / 4096,
        s"bucket ${r.getLong(0)} crosses a 2^12 cell boundary")
    }
    // every event lands in exactly one bucket
    assert(rows.map(_.getLong(1)).sum === Catalog.t(spark, sfDir, "events").count())
  }

  test("k04 manifest == driver-side greedy fill; files are contiguous and near-target") {
    val target = 65536L
    val docs = Catalog.t(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).getBytes("UTF-8").length.toLong))
    val expect = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      var before = 0L
      ds.sortBy(_._1).map { case (id, _, b) =>
        val f = before / target; before += b; (src, f, id, b)
      }.groupBy(_._2).toSeq.map { case (f, xs) =>
        (src, f, xs.length.toLong, xs.map(_._4).sum, xs.map(_._3).min, xs.map(_._3).max)
      }
    }.sortBy(r => (r._1, r._2))
    val got = Catalog.byName("k04_compaction_plan").build(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got === expect)
    // greedy-fill properties: file numbers are dense from 0, doc-id spans
    // never overlap within a source, and every file except a source's last
    // is filled to at least the target minus its largest straddling doc
    got.groupBy(_._1).foreach { case (src, fs) =>
      val ordered = fs.sortBy(_._2)
      assert(ordered.map(_._2) === ordered.indices.map(_.toLong), s"$src: file numbers not dense")
      ordered.sliding(2).foreach {
        case Seq(a, b) => assert(a._6 < b._5, s"$src: files ${a._2} and ${b._2} overlap")
        case _ =>
      }
    }
    assert(got.map(_._3).sum === docs.length.toLong)
  }

  test("k05: pruned files contain zero matches; scanned files cover the full answer") {
    import org.apache.spark.sql.functions._
    val out = Catalog.byName("k05_zone_map_prune").build(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.filter(_.getAs[Boolean]("pruned")).foreach { r =>
      assert(r.getAs[Long]("n_match") == 0L,
        s"file ${r.getAs[Long]("file_id")} pruned but holds ${r.getAs[Long]("n_match")} matches")
    }
    // sum of per-file matches == the direct predicate count (nothing lost)
    val direct = Catalog.t(spark, sfDir, "events")
      .where(col("ts").between(
        to_timestamp(lit("2024-01-10 00:00:00")), to_timestamp(lit("2024-01-13 00:00:00"))))
      .count()
    assert(out.map(_.getAs[Long]("n_match")).sum == direct)
    // zone maps are consistent: min <= max, row counts positive
    out.foreach { r =>
      assert(!r.getAs[java.sql.Timestamp]("ts_min").after(r.getAs[java.sql.Timestamp]("ts_max")))
      assert(r.getAs[Long]("n_rows") > 0)
    }
  }

  test("k06: written layout == k04 plan; every file respects the greedy bin bound") {
    import org.apache.spark.sql.functions._
    val applied = Catalog.byName("k06_compaction_apply").build(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("file_no")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("bytes"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"))).toMap
    val planned = Catalog.byName("k04_compaction_plan").build(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("file_no")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("bytes"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"))).toMap
    assert(applied == planned, "written layout diverged from the planned manifest")
    // greedy fill bound: a file only exceeds the 64 KiB target by its own
    // LAST document (the one that crossed the boundary) — so bytes <
    // target + max single doc; and id spans within a source never overlap
    val maxDoc = Catalog.t(spark, sfDir, "documents")
      .agg(max(octet_length(col("text")))).head().getInt(0).toLong
    applied.foreach { case ((src, f), (_, bytes, _, _)) =>
      assert(bytes < 65536L + maxDoc, s"$src/$f overfilled: $bytes")
    }
    applied.groupBy(_._1._1).foreach { case (_, fs) =>
      val spans = fs.toSeq.sortBy(_._1._2).map { case (_, (_, _, lo, hi)) => (lo, hi) }
      spans.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(h1 < l2, "file id spans overlap")
        case _ => ()
      }
    }
  }

  test("k07: layout metrics == driver recompute; clustering strictly improves locality") {
    val ev = Catalog.t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val natPairs = ev.map { case (e, u) => (u, e / 100) }.distinct
    val clPairs = ev.sortBy { case (e, u) => (u, e) }.zipWithIndex
      .map { case ((_, u), i) => (u, i.toLong / 100) }.distinct
    val nUsers = ev.map(_._2).distinct.length.toLong
    val out = Catalog.byName("k07_clustered_layout").build(spark, sfDir).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_files"), r.getAs[Long]("user_file_pairs"),
          r.getAs[Long]("avg_files_per_user_ppm"))).toMap
    assert(out("arrival_order") == (natPairs.map(_._2).distinct.length.toLong,
      natPairs.length.toLong, natPairs.length.toLong * 1000000L / nUsers))
    assert(out("clustered_by_user") == (clPairs.map(_._2).distinct.length.toLong,
      clPairs.length.toLong, clPairs.length.toLong * 1000000L / nUsers))
    // same file count, strictly fewer files touched per user lookup
    assert(out("clustered_by_user")._1 == out("arrival_order")._1)
    assert(out("clustered_by_user")._3 < out("arrival_order")._3,
      "clustering did not improve point-lookup locality")
  }

  test("AQE splits a skewed sort-merge join at runtime (the no-salt scale path)") {
    // Manual salting (k01/k02) is the deterministic lever; AQE's skew-join
    // split is the runtime one. This pins that the lever actually FIRES in
    // this engine's configuration: a 90%-hot-key join under lowered skew
    // thresholds must show skewed AQEShuffleRead partitions in the final
    // adaptive plan, with results identical to the un-adapted join.
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val left = (1 to 60000)
        .map(i => (if (i % 10 == 0) i.toLong else 7L, i.toLong, s"payload_$i"))
        .toDF("key", "id", "pay") // 90% of rows on key 7
      val right = (1L to 200L).map(k => (k, s"dim_$k")).toDF("key", "name")
      val joined = left.join(right, "key")
      // collect() executes THIS frame's queryExecution (count() would build
      // and execute a derived plan, leaving this one isFinalPlan=false)
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"adaptive plan did not finalize:\n$plan")
      assert(plan.contains("AQEShuffleRead"), s"no adaptive shuffle read in:\n$plan")
      assert(plan.contains("skewed"),
        s"AQE did not mark the hot partition as skewed:\n$plan")
      // same answer as the un-adapted join
      conf.set("spark.sql.adaptive.enabled", "false")
      assert(rows.map(_.toSeq).toSet == left.join(right, "key").collect().map(_.toSeq).toSet,
        "AQE changed the join result")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("k08 skew report matches a driver-side recompute; salt is the covering power of two") {
    val ev = Catalog.t(spark, sfDir, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0).toString, r.getString(1)))
    def expect(dim: String, keys: Seq[String]) = {
      val per = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nKeys = per.size.toLong
      val nRows = keys.size.toLong
      val maxRows = per.values.max
      val skewX100 = maxRows * 100 * nKeys / nRows
      val ratio = (skewX100 + 99) / 100
      val salt = Seq(1L, 2L, 4L, 8L, 16L, 32L).find(_ >= ratio).getOrElse(64L)
      (dim, nKeys, nRows, maxRows, maxRows * 1000000 / nRows, skewX100, salt.toInt)
    }
    val want = Seq(expect("event_type", ev.map(_._2)), expect("user_id", ev.map(_._1)))
    val got = Catalog.byName("k08_skew_report").build(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6))).toSeq
    assert(got == want, s"skew report mismatch:\n$got\nvs\n$want")
    // the salt law itself: a power of two, and (salt) covers the hot/mean ratio
    got.foreach { case (_, _, _, _, _, skewX100, salt) =>
      assert((salt & (salt - 1)) == 0, s"salt $salt is not a power of two")
      assert(salt == 64 || salt * 100L >= skewX100,
        s"salt $salt does not cover skew ${skewX100 / 100.0}")
    }
  }
}
