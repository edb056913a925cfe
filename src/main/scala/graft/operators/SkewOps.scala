package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for cluster-scale joins and aggregations.
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin) covers sort-merge
  * joins after a shuffle exists; explicit salting is still the tool when
  * (a) a single hot key dominates a shuffle-hash path, or (b) a high-
  * cardinality aggregation has a heavy-hitter key (the classic web3 case:
  * one exchange contract emitting 30% of all logs).
  */
object SkewOps {

  /** Salted large×small equi-join: the large side gets a random salt in
    * [0, buckets); the small side is exploded `buckets`× so every
    * (key, salt) partition finds its match. Turns one hot key's single
    * straggler partition into `buckets` even ones at the cost of
    * replicating the small side.
    *
    * Salt derivation is deterministic (hash of the large side's full row
    * tuple, not rand()) so retries and speculative tasks are idempotent —
    * rand() salting breaks exactly-once on task retry.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      buckets: Int,
      joinType: String = "inner",
      saltCols: Seq[Column] = Seq.empty): DataFrame = {
    require(buckets > 0)
    val saltBasis = if (saltCols.nonEmpty) saltCols else large.columns.map(col).toSeq
    val saltedLarge = large.withColumn("__salt", pmod(xxhash64(saltBasis: _*), lit(buckets)))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    val out = saltedLarge.join(saltedSmall, Seq(key, "__salt"), joinType)
    out.drop("__salt")
  }

  /** Two-phase (partial → final) aggregation with explicit salting for a
    * heavy-hitter group-by: phase 1 aggregates (key, salt) — hot keys fan
    * out over `buckets` reducers — phase 2 merges the per-salt partials.
    * Only works for decomposable aggregates; exposed for count/sum.
    */
  def saltedCountSum(
      df: DataFrame,
      key: String,
      sumCol: String,
      buckets: Int): DataFrame = {
    df.withColumn("__salt", pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(buckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(sumCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").as(s"sum_$sumCol"))
  }
}
