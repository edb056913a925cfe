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
    "x06_stream_stream_join", "x07_stateful_sessions")

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
    "d05_embedding_neardup" -> Set("BroadcastNestedLoopJoin"),
    // single-row global aggregates: the one-partition stage IS the answer
    "a12_bool_count" -> Set("SinglePartition"),
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
}
