package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic tests for as-of and range joins against a hand-computed
  * driver-side reference on the real fixture.
  */
class TemporalOpsSpec extends SparkSpec {

  private lazy val events =
    Catalog.t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  test("asof join matches brute-force latest-preceding computation") {
    val purchases = events.filter(_._4 == "purchase")
    val clicks = events.filter(_._4 == "click")
    val expected = purchases.map { case (pid, user, pus, _, _) =>
      val best = clicks.filter(c => c._2 == user && c._3 <= pus)
        .sortBy(c => (c._3, c._1)).lastOption
      pid -> best.map(_._1)
    }.toMap

    val got = Catalog.byName("r01_asof_join").build(spark, sfDir)
      .select("event_id", "click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === expected)
    assert(got.values.exists(_.isDefined), "no matches at all — fixture degenerate?")
    assert(got.values.exists(_.isEmpty) || purchases.isEmpty === false)
  }

  test("range join matches brute-force window count") {
    val purchases = events.filter(_._4 == "purchase")
    val clicks = events.filter(_._4 == "click")
    val window = 3600L * 1000000L
    val expected = purchases.flatMap { case (pid, user, pus, _, _) =>
      val n = clicks.count(c => c._2 == user && c._3 <= pus && c._3 >= pus - window)
      if (n > 0) Some(pid -> n.toLong) else None
    }.toMap

    val got = Catalog.byName("r02_range_join").build(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("asof join emits exactly one row per left row") {
    val purchases = Catalog.t(spark, sfDir, "events")
      .where(col("event_type") === "purchase").count()
    assert(Catalog.byName("r01_asof_join").build(spark, sfDir).count() === purchases)
  }

  test("r03: sweep peak == brute-force max concurrency, independent of tie order") {
    // brute force: per type, count intervals covering each boundary instant
    // under [start, end) semantics — no sweep, no running sum
    val byType = events.groupBy(_._4).view.mapValues(_.map { case (_, _, us, _, v) =>
      (us, us + math.max(math.floor(v), 0.0).toLong * 1000000L)
    }.toSeq).toMap
    val expected = byType.map { case (t, iv) =>
      val peak = iv.map(_._1).distinct
        .map(p => iv.count { case (s, e) => s <= p && p < e }).max
      t -> (peak.toLong, iv.size.toLong)
    }
    val got = Catalog.byName("r03_interval_overlap").build(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("peak"), r.getAs[Long]("n_intervals"))).toMap
    assert(got === expected)
    assert(got.values.exists(_._1 > 1), "fixture degenerate: no overlap anywhere")
  }

  test("r03 is invariant to input partitioning (tie groups are sign-homogeneous)") {
    // the intra-tie prefix order differs across partitionings; the per-key
    // MAX must not — run the same sweep over three different physical
    // layouts of the same rows and require identical results
    val base = Catalog.byName("r03_interval_overlap").build(spark, sfDir)
      .collect().map(_.toSeq).toSet
    Seq(1, 7, 64).foreach { parts =>
      val ev = Catalog.t(spark, sfDir, "events").repartition(parts)
      // rebuild through the same operator body on the re-laid-out input
      val deltas = ev
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          greatest(floor(col("value")), lit(0.0)).cast("long").as("dur_s"))
        .select(col("event_type"),
          explode(array(
            struct((col("us") * 2 + 1).as("ord"), lit(1L).as("delta")),
            struct(((col("us") + col("dur_s") * 1000000L) * 2).as("ord"),
              lit(-1L).as("delta")))).as("e"))
        .select(col("event_type"), col("e.ord").as("ord"), col("e.delta").as("delta"))
      val out = StockOps.groupedRunningTotal(deltas, "event_type", "ord", "delta", "run")
        .groupBy("event_type")
        .agg(max(col("run")).as("peak"), expr("count(1) div 2").as("n_intervals"))
        .collect().map(_.toSeq).toSet
      assert(out == base, s"r03 diverged under repartition($parts)")
    }
  }

  test("r04: gap fill == driver LOCF recompute; grid dense per user; no leading gaps") {
    val dayUs = 86400000000L
    val rows = Catalog.t(spark, sfDir, "events").where(col("event_type") === "purchase")
      .select(col("user_id"), expr(s"unix_micros(ts) div $dayUs").as("day"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val obs: Map[(Long, Long), Double] = rows.groupBy(r => (r._1, r._2)).view.mapValues(
      _.map(x => BigDecimal(x._3).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      .toMap
    val daysByUser: Map[Long, Set[Long]] =
      obs.keys.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val out = Catalog.byName("r04_gap_fill").build(spark, sfDir).collect()
    val expGrid = daysByUser.toSeq.flatMap { case (u, ds) =>
      (ds.min to ds.max).map(day => (u, day))
    }.toSet
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == expGrid,
      "grid is not exactly the per-user [min_day, max_day] range")
    out.foreach { r =>
      val (u, day) = (r.getLong(0), r.getLong(1))
      val lastObsDay = daysByUser(u).filter(_ <= day).max // min_day is observed ⇒ non-empty
      assert(r.getAs[Boolean]("is_gap") == !obs.contains((u, day)), s"($u,$day) gap flag")
      assert(r.getAs[Double]("filled") == obs((u, lastObsDay)), s"($u,$day) LOCF value")
      if (r.getAs[Boolean]("is_gap")) assert(r.isNullAt(r.fieldIndex("obs_val")))
      else assert(r.getAs[Double]("obs_val") == obs((u, day)))
    }
    // the fixture must actually exercise gaps, or the operator is vacuous
    assert(out.count(_.getAs[Boolean]("is_gap")) > 0, "no gaps in the fixture grid")
  }

  test("r05: funnel == driver recompute (sessionize + ordered min-chain); steps strictly nested") {
    val gapUs = 12L * 3600L * 1000000L
    val ev = Catalog.t(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // driver sessionization: sort per user, split on >= 12h gaps
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(_._2)
      val out = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          if (b._2 - a._2 >= gapUs) out += scala.collection.mutable.ArrayBuffer(b)
          else out.last += b
        case _ =>
      }
      out.map(_.toSeq)
    }.toSeq
    def chain(s: Seq[(Long, Long, String)]): (Boolean, Boolean, Boolean) = {
      val t1 = s.collect { case (_, us, "view") => us }.minOption
      val t2 = t1.flatMap(x => s.collect { case (_, us, "click") if us >= x => us }.minOption)
      val t3 = t2.flatMap(x => s.collect { case (_, us, "purchase") if us >= x => us }.minOption)
      (t1.isDefined, t2.isDefined, t3.isDefined)
    }
    val chains = sessions.map(chain)
    val (nv, nvc, nf) =
      (chains.count(_._1).toLong, chains.count(_._2).toLong, chains.count(_._3).toLong)
    val r = Catalog.byName("r05_session_funnel").build(spark, sfDir).head()
    assert(r.getAs[Long]("n_sessions") == sessions.size.toLong)
    assert(r.getAs[Long]("n_view") == nv && r.getAs[Long]("n_view_click") == nvc &&
      r.getAs[Long]("n_full_funnel") == nf, s"funnel counts $r != driver ($nv, $nvc, $nf)")
    assert(r.getAs[Long]("cr_view_click_ppm") == nvc * 1000000L / nv)
    // monotone funnel + a non-degenerate fixture at every step
    assert(nv >= nvc && nvc >= nf && nf > 0)
  }

  test("r06: hourly bars == driver recompute (argmin/argmax open/close, exact volume)") {
    val hourUs = 3600000000L
    val expect = events.groupBy { case (_, _, us, tp, _) => (tp, us / hourUs) }
      .map { case ((tp, b), rows) =>
        val ordered = rows.sortBy { case (id, _, us, _, _) => (us, id) }
        val vol = rows.map { case (_, _, _, _, v) =>
          BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble
        (tp, b, ordered.head._5, ordered.last._5,
          rows.map(_._5).max, rows.map(_._5).min, rows.size.toLong, vol)
      }.toSet
    val got = Catalog.byName("r06_resample_ohlc").build(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getDouble(7))).toSet
    assert(got == expect, s"OHLC mismatch: ${got.diff(expect)} vs ${expect.diff(got)}")
    // bars must be well-formed: low <= open/close <= high
    got.foreach { case (_, _, o, c, h, l, _, _) =>
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }

  test("OHLC partials merge to the whole-input bars under arbitrary shard layouts (x26's law)") {
    val ev = Catalog.t(spark, sfDir, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .withColumn("bucket", expr(s"us div ${TemporalOps.OhlcHourUs}"))
    val whole = Catalog.byName("r06_resample_ohlc").build(spark, sfDir)
      .collect().map(_.toSeq).toSet
    // parity split + 3 pseudo-random 3-way layouts: shard-local partials
    // re-reduced must reproduce the one-pass bars EXACTLY (opens/closes
    // ride a total struct order; volume is exact decimal)
    val layouts: Seq[Seq[org.apache.spark.sql.DataFrame]] =
      Seq(Seq(ev.where(col("event_id") % 2 === 0), ev.where(col("event_id") % 2 === 1))) ++
        (0 until 3).map { salt =>
          val shardOf = Catalog.docHash(col("event_id") + lit(salt.toLong * 7919L), 3L)
          (0L until 3L).map(i => ev.where(shardOf === i)).toSeq
        }
    layouts.zipWithIndex.foreach { case (shards, i) =>
      val merged = TemporalOps.ohlcMerge(
          shards.map(TemporalOps.ohlcPartials).reduce(_ union _))
        .collect().map(_.toSeq).toSet
      assert(merged == whole, s"layout $i: merged bar partials != one-pass bars")
    }
  }
  test("r07 nearest as-of matches brute-force nearest-within-tolerance") {
    val purchases = events.filter(_._4 == "purchase")
    val clicks = events.filter(_._4 == "click")
    val T = TemporalOps.NearTolUs
    val expected = purchases.map { case (pid, user, pus, _, _) =>
      val best = clicks.filter(c => c._2 == user && math.abs(c._3 - pus) <= T)
        .sortBy(c => (math.abs(c._3 - pus),
          if (c._3 <= pus) 0L else 1L,
          if (c._3 <= pus) -c._1 else c._1)).headOption
      pid -> best.map(c => (c._1, c._3 - pus))
    }.toMap
    val got = Catalog.byName("r07_asof_nearest").build(spark, sfDir)
      .select("event_id", "click_id", "dt_us").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toMap
    assert(got == expected)
  }

  test("r08 period deltas match a driver-side recompute, first day NULL per type") {
    val daily = events.groupBy(e => (e._4, e._3 / TemporalOps.DayUs))
      .view.mapValues(_.size.toLong).toMap
    val got = Catalog.byName("r08_period_delta").build(spark, sfDir)
      .select("event_type", "day", "n", "n_prev", "delta").collect()
    assert(got.nonEmpty)
    val byType = got.groupBy(_.getString(0))
    byType.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.head.isNullAt(3) && sorted.head.isNullAt(4),
        "first observed day must have NULL n_prev/delta")
      sorted.sliding(2).foreach {
        case Array(prev, cur) =>
          assert(cur.getLong(3) == prev.getLong(2), "n_prev must be the previous day's n")
          assert(cur.getLong(4) == cur.getLong(2) - prev.getLong(2))
        case _ =>
      }
    }
    got.foreach { r =>
      assert(r.getLong(2) == daily((r.getString(0), r.getLong(1))),
        s"count mismatch at ${r.getString(0)}/${r.getLong(1)}")
    }
    // reconciliation: the report's counts sum back to the event total
    assert(got.map(_.getLong(2)).sum == events.length.toLong)
  }

  test("r09 retention triangle matches a driver-side recompute; offset 0 is full retention") {
    val act = events.map(e => (e._2, e._3 / TemporalOps.DayUs)).distinct
    val cohort = act.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tri = act.groupBy { case (u, day) => (cohort(u), day - cohort(u)) }
      .view.mapValues(_.size.toLong).toMap
    val got = Catalog.byName("r09_retention_cohorts").build(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == tri.keySet)
    got.foreach { case ((cd, off), (n, sz, ppm)) =>
      assert(n == tri((cd, off)), s"n_active at ($cd, $off)")
      assert(sz == sizes(cd), s"cohort_size at $cd")
      assert(ppm == n * 1000000L / sz, s"retention_ppm at ($cd, $off)")
    }
    // offset 0 must be exactly full retention for every cohort
    sizes.keys.foreach(cd => assert(got((cd, 0L))._3 == 1000000L, s"cohort $cd day-0"))
    // the triangle is genuinely populated beyond day 0
    assert(got.keys.exists(_._2 > 0), "no returning users — fixture degenerate")
  }

  test("asofJoin tie rules on ADVERSARIAL ties (fixture is tie-free, so pin them here)") {
    import spark.implicits._
    // right side: three quotes AT the same (user, ts) — the largest
    // tie-break id must win; plus one strictly earlier and one later
    val right = Seq(
      (1L, 100L, 10L, "early"),
      (1L, 200L, 21L, "tie_a"),
      (1L, 200L, 23L, "tie_c"), // largest id at ts=200 → the winner
      (1L, 200L, 22L, "tie_b"),
      (1L, 300L, 30L, "late"),
      (2L, 200L, 40L, "other_user")
    ).toDF("user_id", "cus", "click_id", "tag")
    // left: exactly AT the tie (<= semantics → matches), just before,
    // just after, and a user with no quotes at all
    val left = Seq(
      (101L, 1L, 200L), // at the tie → tie_c (23)
      (102L, 1L, 199L), // before → early (10)
      (103L, 1L, 250L), // after the tie, before 'late' → tie_c (23)
      (104L, 1L, 350L), // after everything → late (30)
      (105L, 3L, 500L)  // no right rows for user 3 → NULL
    ).toDF("event_id", "user_id", "us")
    val out = TemporalOps.asofJoin(left, right, "user_id", "us", "cus",
        Seq("click_id", "tag"), "click_id")
      .select("event_id", "asof_click_id", "asof_tag").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getString(2))))).toMap
    assert(out(101L) == Some((23L, "tie_c")), "equal-ts quote must match (<=) with largest id winning")
    assert(out(102L) == Some((10L, "early")))
    assert(out(103L) == Some((23L, "tie_c")))
    assert(out(104L) == Some((30L, "late")))
    assert(out(105L).isEmpty, "partner-less left row must survive with NULLs")
    assert(out.size == 5, "asof must emit exactly one row per left row, ties included")
  }

  test("rangeJoinBucketed window ends are BOTH inclusive exactly at the boundary") {
    import spark.implicits._
    val win = 1000L
    // right rows planted exactly AT each boundary of left ts=5000:
    // [4000, 5000] must keep 4000 (lower edge), 5000 (upper edge),
    // drop 3999 (just below) and 5001 (just above); bucket straddling
    // is exercised by 4001 (previous bucket) and 4999 (same bucket)
    val left = Seq((1L, 5000L)).toDF("k", "lts")
    val right = Seq((1L, 3999L), (1L, 4000L), (1L, 4001L),
      (1L, 4999L), (1L, 5000L), (1L, 5001L)).toDF("k", "rts")
    val got = TemporalOps.rangeJoinBucketed(left, right, "k",
        col("lts"), col("rts"), win)
      .select("rts").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(4000L, 4001L, 4999L, 5000L),
      s"range window edge semantics drifted: $got")
  }

}
