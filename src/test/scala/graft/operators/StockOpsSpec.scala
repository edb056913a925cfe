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

  // ——— groupedRunningTotal (the t20 scale shape) ———

  private def naiveRunning(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("key").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("total", sum(col("v")).over(w))
  }

  private def assertSameRunning(df: org.apache.spark.sql.DataFrame, parts: Int): Unit = {
    val fast = StockOps.groupedRunningTotal(df, "key", "ord", "v", "total", parts)
      .select("key", "ord", "v", "total")
    val slow = naiveRunning(df).select("key", "ord", "v", "total")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
      s"two-phase grouped running total differs from the per-key window (parts=$parts)")
  }

  test("groupedRunningTotal matches the per-key window, incl. one DOMINANT key") {
    import spark.implicits._
    // one key with 90% of the rows — the exact shape where the naive window
    // funnels everything through a single task and the two-phase must split
    // the key across several range partitions
    val skew = ((1 to 900).map(i => ("hot", i, (i % 13).toLong)) ++
      (1 to 100).map(i => (s"cold_${i % 7}", i, (i % 5).toLong))).toDF("key", "ord", "v")
    assertSameRunning(skew, parts = 8)
    assertSameRunning(skew, parts = 3)
  }

  test("groupedRunningTotal edges: single key, single row, more parts than rows") {
    import spark.implicits._
    assertSameRunning(Seq(("a", 1, 5L)).toDF("key", "ord", "v"), parts = 4)
    assertSameRunning((1 to 10).map(i => ("only", i, i.toLong)).toDF("key", "ord", "v"),
      parts = 32)
  }

  // ——— perKeyTopK (the sim13 scale shape) ———

  private def assertSameTopK(df: org.apache.spark.sql.DataFrame, k: Int): Unit = {
    val w = Window.partitionBy("key").orderBy(col("ord"), col("id"))
    val slow = df.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select("key", "rk", "id", "ord")
    val fast = StockOps.perKeyTopK(df, Seq("key"), Seq(col("ord"), col("id")), k)
      .select("key", "rk", "id", "ord")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
      s"two-phase per-key top-$k differs from the per-key window")
  }

  test("perKeyTopK matches the per-key window, incl. few-key/many-row skew") {
    import spark.implicits._
    // 3 keys × many rows — the exact low-cardinality shape the two-phase
    // form exists for; duplicated ord values force the id tie-break
    val df = (1 to 1200).map(i => (i % 3, i % 40, i.toLong)).toDF("key", "ord", "id")
      .repartition(7)
    assertSameTopK(df, 4)
    assertSameTopK(df, 1)
    assertSameTopK(df, 2000) // k > rows-per-key: everything survives, ranks equal
  }

  test("perKeyTopK edges: single row, k larger than any partition") {
    import spark.implicits._
    assertSameTopK(Seq((1, 1, 1L)).toDF("key", "ord", "id"), 4)
    assertSameTopK((1 to 10).map(i => (1, 11 - i, i.toLong)).toDF("key", "ord", "id")
      .repartition(32), 3)
  }

  test("t20 documents offsets are bit-identical to the per-source window") {
    val nt = Catalog.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("v"))
      .withColumnRenamed("source", "key").withColumnRenamed("doc_id", "ord")
    assertSameRunning(nt, parts = 8)
  }

  // ——— c34 Count-Min sketch invariants ———

  test("c34: CMS estimate dominates the true count; each hash row covers the stream") {
    val out = Catalog.byName("c34_countmin_heavy").build(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("n_est") >= r.getAs[Long]("n_true")),
      "a Count-Min estimate fell below the true count — impossible by construction")
    // the keys are ALL distinct user_ids, so Σ true == stream size
    val total = Catalog.t(spark, sfDir, "events").count()
    assert(out.map(_.getAs[Long]("n_true")).sum == total)
  }

  // ——— c35 SCD2 interval invariants ———

  test("c35: per-user intervals are chained, versions contiguous, states change") {
    val rows = Catalog.byName("c35_scd2_intervals").build(spark, sfDir).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("version"))
      assert(sorted.map(_.getAs[Int]("version")).toSeq == (1 to rs.length),
        s"user $u: versions not contiguous")
      // exactly one open (current) interval, and it is the last one
      assert(sorted.init.forall(_.getAs[java.sql.Timestamp]("valid_to") != null) &&
        sorted.last.getAs[java.sql.Timestamp]("valid_to") == null,
        s"user $u: open interval is not exactly the last version")
      // intervals chain: this row's valid_to == next row's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") == b.getAs[java.sql.Timestamp]("valid_from"),
            s"user $u: interval chain broken at version ${b.getAs[Int]("version")}")
          assert(a.getAs[String]("state") != b.getAs[String]("state"),
            s"user $u: consecutive intervals share a state — run compression failed")
        case _ => ()
      }
    }
  }

  // ——— c36 Bloom semi-join invariants ———

  test("c36: no false negatives, FP count non-negative, exact side independently verified") {
    val out = Catalog.byName("c36_bloom_semijoin").build(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (orders, bloom, exact, fp) = (r.getAs[Long]("n_orders"),
        r.getAs[Long]("n_bloom_pass"), r.getAs[Long]("n_exact"), r.getAs[Long]("n_false_pos"))
      assert(bloom >= exact, s"false negative: bloom $bloom < exact $exact") // Bloom property
      assert(fp == bloom - exact && fp >= 0)
      assert(bloom <= orders)
    }
    // the exact column is a plain semi-join — recompute it independently
    val bk = Catalog.t(spark, sfDir, "customer")
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey")).collect()
      .map(_.getLong(0)).toSet
    val expect = Catalog.t(spark, sfDir, "orders").collect()
      .filter(r => bk(r.getAs[Long]("o_custkey")))
      .groupBy(_.getAs[String]("o_orderstatus")).view.mapValues(_.length.toLong).toMap
    val got = out.map(r => r.getAs[String]("o_orderstatus") -> r.getAs[Long]("n_exact")).toMap
    assert(got.filter(_._2 > 0) == expect)
  }

  // ——— c37 quantile-sketch contract ———

  test("c37: true quantile lies in [approx, approx + width); sketch merges by addition") {
    val out = Catalog.byName("c37_quantile_sketch").build(spark, sfDir).collect()
    val prices = Catalog.t(spark, sfDir, "orders")
      .select("o_totalprice").collect().map(_.getDouble(0)).sorted
    val n = prices.length
    assert(out.length == 4 && out.forall(_.getAs[Long]("n_total") == n.toLong))
    out.foreach { r =>
      val q = r.getAs[Int]("q_pct")
      // smallest value v with |{x <= v}| * 100 >= q * n — the read-out's
      // own definition, recomputed from the exact sorted data
      val tru = prices((q * n + 99) / 100 - 1)
      val lo = r.getAs[Long]("approx_value").toDouble
      assert(tru >= lo && tru < lo + 1000, s"q=$q: true $tru outside [$lo, ${lo + 1000})")
    }
    // mergeability: sketches of disjoint halves, summed per bucket, equal
    // the whole-data sketch (the property that makes it an executor- and
    // micro-batch-combinable summary)
    def sketch(xs: Seq[Double]): Map[Long, Long] =
      xs.groupBy(x => math.floor(x / 1000).toLong).view.mapValues(_.length.toLong).toMap
    val (h1, h2) = prices.splitAt(n / 2)
    val merged = (sketch(h1).toSeq ++ sketch(h2).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(merged == sketch(prices.toSeq))
  }

  test("c38: KMV sketches merge by union + re-take-k; estimate exact below k") {
    import StockOps.{KmvK, KmvM}
    val ev = Catalog.t(spark, sfDir, "events")
    def hashes(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_type"), Catalog.docHash(col("user_id"), KmvM).as("h")).distinct()
    def sketch(df: org.apache.spark.sql.DataFrame) =
      StockOps.perKeyTopK(hashes(df), Seq("event_type"), Seq(col("h")), KmvK)
        .select("event_type", "h")
    // merge law: sketch(shard A) ∪ sketch(shard B) re-taken to k == the
    // whole-stream sketch — the property that makes KMV an executor- and
    // micro-batch-combinable summary (each shard sees overlapping users)
    val sA = sketch(ev.where(col("event_id") % 2 === 0))
    val sB = sketch(ev.where(col("event_id") % 2 === 1))
    val merged = StockOps.kmvEstimate(
      StockOps.perKeyTopK(sA.union(sB).distinct(), Seq("event_type"), Seq(col("h")), KmvK))
    val whole = StockOps.kmvEstimate(
      StockOps.perKeyTopK(hashes(ev), Seq("event_type"), Seq(col("h")), KmvK))
    assert(merged.collect().map(_.toSeq).toSet == whole.collect().map(_.toSeq).toSet,
      "merged shard sketches != whole-corpus sketch")
    // read-out contract: a filled sketch uses the (k−1)·M/h_(k) estimator;
    // an unfilled sketch (forced via a tiny sub-stream) is EXACT
    val tiny = StockOps.kmvEstimate(StockOps.perKeyTopK(
      hashes(ev.where(col("user_id") < 3)), Seq("event_type"), Seq(col("h")), KmvK)).collect()
    tiny.foreach { r =>
      assert(r.getAs[Long]("sketch_k") < KmvK &&
        r.getAs[Long]("est_distinct") == r.getAs[Long]("sketch_k"))
    }
    // merge law under MANY shard layouts, not just the parity split:
    // deterministic pseudo-random 3-way shards (docHash of event_id) must
    // all reconcile to the whole-stream sketch
    (0 until 3).foreach { salt =>
      val shardOf = Catalog.docHash(col("event_id") + lit(salt.toLong * 7919L), 3L)
      val shards = (0L until 3L).map(i => sketch(ev.where(shardOf === i)))
      val m = StockOps.kmvEstimate(StockOps.perKeyTopK(
        shards.reduce(_ union _).distinct(), Seq("event_type"), Seq(col("h")), KmvK))
      assert(m.collect().map(_.toSeq).toSet == whole.collect().map(_.toSeq).toSet,
        s"3-way shard merge (salt $salt) != whole-corpus sketch")
    }
    val filled = Catalog.byName("c38_kmv_sketch").build(spark, sfDir).collect()
    filled.foreach { r =>
      val (k, kth, est, tru) = (r.getAs[Long]("sketch_k"), r.getAs[Long]("kth_hash"),
        r.getAs[Long]("est_distinct"), r.getAs[Long]("true_distinct"))
      if (k == KmvK) assert(est == (KmvK - 1).toLong * KmvM / kth)
      // 15-user fixture: the estimator must land within an order of
      // magnitude of truth (KMV's k=8 variance bound is far tighter)
      assert(est >= tru / 10 && est <= tru * 10, s"est $est vs true $tru")
    }
  }

  test("c62: HLL registers merge by per-register MAX; read-out is integer-exact") {
    val ev = Catalog.t(spark, sfDir, "events")
    val whole = StockOps.hllEstimate(StockOps.hllPartial(ev))
      .collect().map(_.toSeq).toSet
    // merge law: MAX-merging shard partials == the whole-stream registers,
    // across the parity split and 3 pseudo-random 3-way layouts (each
    // shard sees overlapping users, so the merge genuinely reconciles)
    val layouts: Seq[Seq[org.apache.spark.sql.DataFrame]] =
      Seq(Seq(ev.where(col("event_id") % 2 === 0), ev.where(col("event_id") % 2 === 1))) ++
        (0 until 3).map { salt =>
          val shardOf = Catalog.docHash(col("event_id") + lit(salt.toLong * 7919L), 3L)
          (0L until 3L).map(i => ev.where(shardOf === i)).toSeq
        }
    layouts.foreach { shards =>
      val merged = shards.map(StockOps.hllPartial).reduce(_ unionByName _)
        .groupBy("event_type", "reg").agg(max(col("mj")).as("mj"))
      assert(StockOps.hllEstimate(merged).collect().map(_.toSeq).toSet == whole,
        "MAX-merged shard registers != whole-stream sketch")
    }
    // register bounds: reg ∈ [0, 64), ρ ∈ [1, 55]; and the estimate lands
    // within an order of magnitude of truth on the 15-user fixture
    val regs = StockOps.hllPartial(ev).collect()
    regs.foreach { r =>
      val (reg, mj) = (r.getAs[Long]("reg"), r.getAs[Int]("mj"))
      assert(reg >= 0 && reg < StockOps.HllRegs && mj >= 1 && mj <= StockOps.HllRankBits + 1)
    }
    Catalog.byName("c62_hll_sketch").build(spark, sfDir).collect().foreach { r =>
      val (est, tru) = (r.getAs[Double]("est_distinct"), r.getAs[Long]("true_distinct"))
      assert(est >= tru / 10.0 && est <= tru * 10.0, s"est $est vs true $tru")
    }
  }

  test("per-key top-k merges by union + re-take-k under arbitrary shard layouts (x24's law)") {
    val ev = Catalog.t(spark, sfDir, "events").select("event_id", "event_type", "value")
    def topk(df: org.apache.spark.sql.DataFrame) =
      StockOps.perKeyTopK(df, Seq("event_type"), Seq(desc("value"), col("event_id")), 5)
        .select("event_type", "event_id", "value")
    val whole = topk(ev).collect().map(_.toSeq).toSet
    // any global top-5 row is in its own shard's top-5, so shard-local
    // top-5s re-ranked must reproduce the whole-stream leaderboard —
    // checked across the parity split and 3 pseudo-random 3-way layouts
    val layouts: Seq[Seq[org.apache.spark.sql.DataFrame]] =
      Seq(Seq(ev.where(col("event_id") % 2 === 0), ev.where(col("event_id") % 2 === 1))) ++
        (0 until 3).map { salt =>
          val shardOf = Catalog.docHash(col("event_id") + lit(salt.toLong * 7919L), 3L)
          (0L until 3L).map(i => ev.where(shardOf === i)).toSeq
        }
    layouts.zipWithIndex.foreach { case (shards, i) =>
      val merged = topk(shards.map(topk).reduce(_ union _)).collect().map(_.toSeq).toSet
      assert(merged == whole, s"layout $i: merged shard top-5s != whole-stream top-5")
    }
  }

  test("c46: Q14 promo share == driver recompute; part dim broadcast; date pushed") {
    val q = Catalog.byName("c46_tpch_q14").build(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "Q14 lost the part-dimension broadcast")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), "Q14 date predicate not pushed")
    val promoKeys = Catalog.t(spark, sfDir, "part")
      .where(col("p_type").like("PROMO%")).select("p_partkey").collect()
      .map(_.getLong(0)).toSet
    val li = Catalog.t(spark, sfDir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-03-01") && col("l_shipdate") < lit("1996-04-01"))
      .select("l_partkey", "l_extendedprice", "l_discount").collect()
    def rev(r: org.apache.spark.sql.Row) =
      BigDecimal(r.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP) *
        (1 - BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP))
    val total = li.map(rev).sum.toDouble
    val promo = li.filter(r => promoKeys(r.getLong(0))).map(rev).sum.toDouble
    val row = q.head()
    assert(math.abs(row.getAs[Double]("total_revenue") - total) < 1e-6)
    assert(math.abs(row.getAs[Double]("promo_revenue") - promo) < 1e-6)
    assert(row.getAs[Double]("promo_pct") == row.getAs[Double]("promo_revenue") * 100.0 /
      row.getAs[Double]("total_revenue"))
  }

  test("c47: Q8 market share == driver recompute; dims broadcast; only fact joins shuffle") {
    val q = Catalog.byName("c47_tpch_q8").build(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4,
      "Q8 dimension chains (region/nation×2/part) not broadcast")
    // driver recompute over the collected fixture (bounded at spec SF)
    val rKey = Catalog.t(spark, sfDir, "region").where(col("r_name") === "AMERICA")
      .head().getAs[Int]("r_regionkey")
    val natRegion = Catalog.t(spark, sfDir, "nation").collect()
      .map(r => r.getAs[Int]("n_nationkey") -> (r.getAs[Int]("n_regionkey"), r.getAs[String]("n_name"))).toMap
    val amCust = Catalog.t(spark, sfDir, "customer").collect()
      .filter(r => natRegion(r.getAs[Int]("c_nationkey"))._1 == rKey)
      .map(_.getAs[Long]("c_custkey")).toSet
    val ords = Catalog.t(spark, sfDir, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate").collect()
      .filter(r => amCust(r.getAs[Long]("o_custkey")))
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[java.time.LocalDateTime](2).getYear).toMap
    val promo = Catalog.t(spark, sfDir, "part").where(col("p_type").like("PROMO%"))
      .collect().map(_.getAs[Long]("p_partkey")).toSet
    val supNation = Catalog.t(spark, sfDir, "supplier").collect()
      .map(r => r.getAs[Long]("s_suppkey") -> natRegion(r.getAs[Int]("s_nationkey"))._2).toMap
    val byYear = Catalog.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount").collect()
      .filter(r => ords.contains(r.getLong(0)) && promo(r.getLong(1)))
      .groupBy(r => ords(r.getLong(0)))
    val rows = q.collect()
    assert(rows.map(_.getAs[Int]("o_year")).toSeq == byYear.keys.toSeq.sorted)
    rows.foreach { row =>
      val group = byYear(row.getAs[Int]("o_year"))
      def vol(rs: Seq[org.apache.spark.sql.Row]) = rs.map { r =>
        BigDecimal(r.getDouble(3)).setScale(4, BigDecimal.RoundingMode.HALF_UP) *
          (1 - BigDecimal(r.getDouble(4)).setScale(4, BigDecimal.RoundingMode.HALF_UP))
      }.sum.toDouble
      assert(math.abs(row.getAs[Double]("total_volume") - vol(group.toSeq)) < 1e-6)
      assert(math.abs(row.getAs[Double]("nation_volume") -
        vol(group.filter(r => supNation(r.getLong(2)) == "NATION_3").toSeq)) < 1e-6)
      assert(row.getAs[Double]("mkt_share") ==
        row.getAs[Double]("nation_volume") / row.getAs[Double]("total_volume"))
    }
  }

  test("c48: CDC merge == driver recompute; all four MERGE arms verified") {
    import spark.implicits._
    // fixture recompute: last state per user before/after the split
    val ev = Catalog.t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val splitUs = java.time.Instant.parse("2024-01-30T00:00:00Z").toEpochMilli * 1000L
    def last(rows: Seq[(Long, Long, String, Long)]): Map[Long, String] =
      rows.groupBy(_._1).view.mapValues(_.maxBy(r => (r._4, r._2))._3).toMap
    val base = last(ev.filter(_._4 < splitUs))
    val upd = last(ev.filter(_._4 >= splitUs))
    val out = Catalog.byName("c48_cdc_upsert").build(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSet == (base.keySet ++ upd.keySet))
    out.foreach { r =>
      val u = r.getLong(0)
      val expAction = (base.get(u), upd.get(u)) match {
        case (None, _) => "insert"
        case (_, None) => "keep"
        case (Some(b), Some(x)) => if (b == x) "unchanged" else "update"
      }
      assert(r.getAs[String]("action") == expAction, s"user $u action")
      assert(r.getAs[String]("new_state") == upd.getOrElse(u, base(u)), s"user $u state")
    }
    // the fixture exercises keep/update/unchanged but structurally cannot
    // produce 'insert' (every user predates the split) — synthetic frames
    // through the SAME cdcMerge path cover all four arms
    val sBase = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("user_id", "old_state")
    val sUpd = Seq((2L, "b"), (3L, "x"), (4L, "n")).toDF("user_id", "upd_state")
    val m = StockOps.cdcMerge(sBase, sUpd).collect()
      .map(r => r.getLong(0) -> (r.getAs[String]("new_state"), r.getAs[String]("action"))).toMap
    assert(m == Map(1L -> ("a", "keep"), 2L -> ("b", "unchanged"),
      3L -> ("x", "update"), 4L -> ("n", "insert")))
  }

  test("c49: rolling distinct == driver recompute; 7d >= 1d everywhere") {
    val ud = Catalog.t(spark, sfDir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val days = ud.map(_._2).distinct.sorted
    val out = Catalog.byName("c49_rolling_distinct").build(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSeq == days.toSeq)
    out.foreach { r =>
      val day = r.getLong(0)
      val d1 = ud.filter(_._2 == day).map(_._1).distinct.length.toLong
      val d7 = ud.filter(p => p._2 >= day - 6 && p._2 <= day).map(_._1).distinct.length.toLong
      assert(r.getAs[Long]("n_active_1d") == d1, s"day $day 1d")
      assert(r.getAs[Long]("n_active_7d") == d7, s"day $day 7d")
      assert(d7 >= d1)
    }
  }

  test("c40/c41: TPC-H composites plan broadcast dims + pushed dates; Q3 top-10 is TakeOrdered") {
    val q3 = Catalog.byName("c40_tpch_q3").build(spark, sfDir)
    val p3 = q3.queryExecution.executedPlan.toString
    assert(p3.contains("BroadcastHashJoin"), "Q3 lost the dimension broadcast")
    assert(p3.contains("TakeOrderedAndProject"), "Q3 top-10 planned as a global sort")
    assert(p3.contains("PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate"),
      "Q3 date predicate not pushed to the orders scan")
    val p5 = Catalog.byName("c41_tpch_q5").build(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p5).size >= 3,
      "Q5 dimension chain (region/nation/supplier) not broadcast")
    // revenue sanity: decimal-exact aggregation reproduced on the driver
    // for the top row (independent of engine decimal internals)
    val top = q3.head()
    val li = Catalog.t(spark, sfDir, "lineitem")
      .where(col("l_orderkey") === top.getAs[Long]("l_orderkey") &&
        col("l_shipdate") > lit("1998-06-15"))
      .select("l_extendedprice", "l_discount").collect()
    val exp = li.map { r =>
      val ep = BigDecimal(r.getDouble(0)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      val di = BigDecimal(r.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      ep * (1 - di)
    }.sum.toDouble
    assert(math.abs(top.getAs[Double]("revenue") - exp) < 1e-6,
      s"Q3 top revenue ${top.getAs[Double]("revenue")} != driver $exp")
  }

  test("c43: Q18 survivors all exceed the quantity cut; top-10 is TakeOrdered; sums exact") {
    val q = Catalog.byName("c43_tpch_q18").build(spark, sfDir)
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    val rows = q.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Double]("total_qty") > 300.0))
    val sums = Catalog.t(spark, sfDir, "lineitem")
      .groupBy("l_orderkey").agg(Catalog.dsum(col("l_quantity")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(r.getAs[Double]("total_qty") == sums(r.getAs[Long]("o_orderkey"))))
    // descending with the orderkey tiebreak
    val qs = rows.map(r => (-r.getAs[Double]("total_qty"), r.getAs[Long]("o_orderkey"))).toSeq
    assert(qs == qs.sorted)
  }

  test("c39: decayed aggregate == driver recompute; weights halve per day bucket") {
    val rows = Catalog.t(spark, sfDir, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val mx = rows.map(_._2).max
    val exp = rows.groupBy(_._1).view.mapValues { rs =>
      val ws = rs.map { case (_, us, v) =>
        val b = math.min((mx - us) / 86400000000L, 6L)
        val w = 64L >> b.toInt
        (BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP) * w, w)
      }
      (rs.size.toLong,
        (ws.map(_._1).sum / 64).toDouble,
        ws.map(_._2).sum.toDouble / 64)
    }.toMap
    Catalog.byName("c39_decayed_agg").build(spark, sfDir).collect().foreach { r =>
      val (n, ds, dc) = exp(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("decayed_sum") - ds) < 1e-9, s"decayed_sum ${r}")
      assert(math.abs(r.getAs[Double]("decayed_count") - dc) < 1e-12)
    }
  }

  test("c44: Q6 revenue == driver recompute; all three predicates pushed; zero wide shuffles") {
    val q = Catalog.byName("c44_tpch_q6").build(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    // the executedPlan toString elides long PushedFilters lists, so assert
    // on the stable prefix (all three columns present as pushdown guards)
    assert(plan.contains(
      "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity), GreaterThanOrEqual"),
      s"Q6 predicates not pushed to the parquet scan:\n$plan")
    assert(raw"(?<!Broadcast)Exchange (hash|range)partitioning".r.findAllIn(plan).isEmpty,
      "Q6 planned a wide shuffle — it should be scan + partial/final agg only")
    val li = Catalog.t(spark, sfDir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .select("l_extendedprice", "l_discount").collect()
    val exp = li.map { r =>
      BigDecimal(r.getDouble(0)).setScale(4, BigDecimal.RoundingMode.HALF_UP) *
        BigDecimal(r.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val row = q.head()
    assert(row.getAs[Long]("n_items") == li.length.toLong)
    assert(math.abs(row.getAs[Double]("revenue") - exp) < 1e-6,
      s"Q6 revenue ${row.getAs[Double]("revenue")} != driver $exp")
  }

  test("c45: Q10 aggregates before the customer join; top-20 descending; top row == driver recompute") {
    val q = Catalog.byName("c45_tpch_q10").build(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "Q10 top-20 planned as a global sort")
    assert(plan.contains("BroadcastHashJoin"), "Q10 lost the nation broadcast")
    val rows = q.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val order = rows.map(r => (-r.getAs[Double]("revenue"), r.getAs[Long]("c_custkey"))).toSeq
    assert(order == order.sorted, "Q10 not ordered by (revenue desc, custkey)")
    val top = rows.head
    val ordKeys = Catalog.t(spark, sfDir, "orders")
      .where(col("o_orderdate") >= lit("1996-10-01") && col("o_orderdate") < lit("1997-01-01") &&
        col("o_custkey") === top.getAs[Long]("c_custkey"))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val exp = Catalog.t(spark, sfDir, "lineitem")
      .where(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount").collect()
      .filter(r => ordKeys(r.getLong(0)))
      .map { r =>
        val ep = BigDecimal(r.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        val di = BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        ep * (1 - di)
      }.sum.toDouble
    assert(math.abs(top.getAs[Double]("revenue") - exp) < 1e-6,
      s"Q10 top revenue ${top.getAs[Double]("revenue")} != driver $exp")
  }
  test("c50 robust stats match driver-side exact median/MAD/mode") {
    val rows = Catalog.t(spark, sfDir, "events").select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted; s((s.size + 1) / 2 - 1)
    }
    val expected = rows.groupBy(_._1).map { case (et, g) =>
      val vs = g.map(_._2).toSeq
      val med = medianOf(vs)
      val mad = medianOf(vs.map(v => math.abs(v - med)))
      val (mv, cnt) = vs.map(v => math.floor(v).toLong)
        .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
        .toSeq.minBy { case (k, c) => (-c, k) }
      et -> ((vs.size.toLong, med, mad, mv, cnt))
    }
    val got = Catalog.byName("c50_robust_stats").build(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected)
  }

  test("histogram sketch partials merge to the batch read-out under arbitrary splits") {
    val orders = Catalog.t(spark, sfDir, "orders")
    val batch = StockOps.histQuantiles(spark, StockOps.histPartial(orders))
      .collect().toSeq
    Seq(2L, 3L, 5L).foreach { k =>
      val parts = (0L until k).map(i =>
        StockOps.histPartial(orders.where(pmod(col("o_orderkey"), lit(k)) === i)))
      val merged = parts.reduce(_ union _).groupBy("bucket").agg(sum("c").as("c"))
      val got = StockOps.histQuantiles(spark, merged).collect().toSeq
      assert(got == batch, s"merge law failed for $k-way split")
    }
  }

  test("c52 IGNORE NULLS navigation matches a driver-side forward fill") {
    val ev = Catalog.t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // .toSeq before flatMap: Map#flatMap would collapse the per-row tuples
    // back into a Map keyed per user (the r04 lesson)
    val expect = ev.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._1)).toSeq
      val vs = ordered.map(r => if (r._1 % 5 != 0) Some(r._4) else None)
      val reals = vs.flatten
      ordered.zipWithIndex.map { case (r, i) =>
        val filled = vs.take(i + 1).flatten.lastOption
        r._1 -> (filled, reals.headOption, reals.drop(1).headOption)
      }
    }.toMap
    val got = Catalog.byName("c52_ignore_nulls_window").build(spark, sfDir)
      .select("event_id", "filled", "first_real", "second_real").collect()
      .map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
        r.getLong(0) -> (opt(1), opt(2), opt(3))
      }.toMap
    assert(got == expect)
    // the NULLing is genuinely exercised: some rows carry no v yet are filled
    assert(ev.exists(r => r._1 % 5 == 0), "fixture has no NULLed readings")
  }

  test("c53: Q7 keeps both shipping directions, broadcasts both nation chains") {
    val q = Catalog.byName("c53_tpch_q7").build(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "Q7 nation-filtered supplier/customer chains not broadcast")
    val rows = q.collect()
    assert(rows.nonEmpty, "Q7 empty at spec SF — nation pair degenerate")
    val dirs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(dirs.subsetOf(Set(("NATION_13", "NATION_19"), ("NATION_19", "NATION_13"))))
    assert(dirs.size == 2, s"only one shipping direction present: $dirs")
    rows.foreach(r => assert(r.getInt(2) == 1995 || r.getInt(2) == 1996))
  }

  test("c54: Q15 winners exactly achieve the quarter's maximum supplier revenue") {
    val rows = Catalog.byName("c54_tpch_q15").build(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // driver recompute of the revenue view in exact decimal
    val rev = Catalog.t(spark, sfDir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1996-04-01"))
      .select("l_suppkey", "l_extendedprice", "l_discount").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map { r =>
        val ep = BigDecimal(r.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        val di = BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        ep * (1 - di)
      }.sum).toMap
    val mx = rev.values.max
    val winners = rev.collect { case (k, v) if v == mx => k }.toSet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == winners)
    rows.foreach(r => assert(r.getAs[Double]("total_revenue") == mx.toDouble))
  }

  test("c55: Q13 histogram mass equals the customer count, zero bucket honest") {
    val rows = Catalog.byName("c55_tpch_q13").build(spark, sfDir).collect()
      .map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist")).toMap
    val nCust = Catalog.t(spark, sfDir, "customer").count()
    assert(rows.values.sum == nCust, "histogram does not cover every customer")
    // the adapted exclusion keeps the zero bucket meaningful: a customer
    // whose EVERY order is urgent must land in c_count = 0
    val urgentOnly = Catalog.t(spark, sfDir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)).as("u"))
      .where(col("n") === col("u")).count()
    val noOrders = nCust - Catalog.t(spark, sfDir, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.getOrElse(0L, 0L) == noOrders + urgentOnly,
      "zero bucket != order-less + urgent-only customers")
  }

  test("c56: Q17 small-quantity cut matches an exact-decimal driver recompute") {
    val parts = Catalog.t(spark, sfDir, "part")
      .where(col("p_brand") === "Brand#13").select("p_partkey").collect()
      .map(_.getLong(0)).toSet
    val li = Catalog.t(spark, sfDir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .filter(r => parts(r.getLong(0)))
      .map(r => (r.getLong(0),
        BigDecimal(r.getDouble(1)).setScale(4, BigDecimal.RoundingMode.HALF_UP),
        BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
    val perPart = li.groupBy(_._1).view
      .mapValues(rs => (rs.map(_._2).sum, rs.size)).toMap
    val small = li.filter { case (p, q, _) =>
      val (sumQ, c) = perPart(p); q * 5 * c < sumQ
    }
    val r = Catalog.byName("c56_tpch_q17").build(spark, sfDir).head()
    assert(r.getAs[Long]("n_small") == small.length.toLong)
    assert(r.getAs[Double]("avg_yearly") == small.map(_._3).sum.toDouble / 7.0)
    assert(small.nonEmpty, "Q17 cut degenerate at spec SF")
  }

  test("c58: null-safe join accounts for every event exactly once, NULLs under 'unknown'") {
    val ids = Catalog.t(spark, sfDir, "events").select("event_id").collect().map(_.getLong(0))
    val got = Catalog.byName("c58_nullsafe_join").build(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.sum == ids.length.toLong, "null-safe join dropped or duplicated rows")
    assert(got("unknown") == ids.count(_ % 11 == 0).toLong)
    (0L until 5L).foreach { b =>
      assert(got(s"bucket_$b") == ids.count(id => id % 11 != 0 && id % 5 == b).toLong)
    }
    assert(got("unknown") > 0, "no NULL-keyed events — the null-safe path is vacuous")
  }

  test("c59: decorrelated lateral top-2 matches a driver recompute per event type") {
    val ev = Catalog.t(spark, sfDir, "events").select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (et, rows) =>
      rows.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (u, n) => (-n, u) }.take(2)
        .map { case (u, n) => (et, u, n) }
    }.toSet
    val got = Catalog.byName("c59_lateral_topn").build(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, s"lateral top-2 mismatch:\n$got\nvs\n$expect")
  }

}
