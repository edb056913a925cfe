package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Catalog._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Numeric design for cross-engine verifiability AND order-independence at
  * scale: per-element products are computed in double, scaled by 1e15 and
  * floored to integers (exactly representable: |x·y|·1e15 ≈ 1e13 < 2^53),
  * then summed as longs — an exact, associative reduction, so the result is
  * identical no matter how Spark partitions the work, and identical to the
  * DuckDB oracle. Final cosine is a deterministic function of exact longs.
  */
object SimilarityOps {

  val SCALE = 1e15

  /** Σ floor(a[i]·b[i]·1e15) as Long — exact scaled dot product, via the
    * codegen'd `scaled_dot` kernel (the zip_with/aggregate dataflow
    * formulation — kept as the executable spec in TextExpressionsSpec —
    * evaluates interpreted lambdas per element; this is the inner loop of
    * brute-force search, probes × corpus × dim evaluations).
    */
  def scaledDot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.scaled_dot(a, b)

  /** Σ floor(v[i]²·1e15) as Long — exact scaled squared norm. */
  def scaledNorm2(v: Column): Column = scaledDot(v, v)

  /** cosine from exact scaled components (double, deterministic). */
  def cosine(dot: Column, n1: Column, n2: Column): Column =
    dot.cast(DoubleType) / sqrt(n1.cast(DoubleType) * n2.cast(DoubleType))

  /** Embeddings with precomputed scaled norms. At cluster scale this is a
    * single narrow projection; the norm is computed once per vector, not per
    * pair.
    */
  def withNorm(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings").withColumn("norm2", scaledNorm2(col("embedding")))

  val sqlNorm2 =
    "CAST(list_sum(list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e15) AS BIGINT))) AS BIGINT)"
  val sqlDot = // a, b list columns
    "CAST(list_sum(list_transform(a.embedding, (x, i) -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE) * 1e15) AS BIGINT))) AS BIGINT)"

  /** Brute-force cosine pairs of probe vectors (vec_id < nProbes) × corpus.
    * The probe side is tiny → Spark broadcasts it; the corpus side streams:
    * no shuffle, scales linearly with corpus size across executors.
    */
  def probePairs(s: SparkSession, d: String, nProbes: Int): DataFrame = {
    val corpus = withNorm(s, d)
    val probes = corpus.where(col("vec_id") < nProbes)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"), col("norm2").as("qnorm2"))
    corpus.join(broadcast(probes), col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", cosine(scaledDot(col("qvec"), col("embedding")), col("qnorm2"), col("norm2")))
  }

  def sqlProbePairs(nProbes: Int): String =
    s"""WITH nv AS (SELECT vec_id, embedding, $sqlNorm2 AS norm2 FROM embeddings)
        SELECT a.vec_id AS qid, b.vec_id AS vec_id,
               $sqlDot / SQRT(CAST(a.norm2 AS DOUBLE) * CAST(b.norm2 AS DOUBLE)) AS cos_sim
        FROM nv a JOIN nv b ON a.vec_id < $nProbes AND a.vec_id <> b.vec_id"""

  // IVF parameters: 16 coarse cells, 4 probed per query.
  val IvfCells = 16
  val IvfProbe = 4

  // Random-hyperplane LSH: `NumPlanes` Rademacher (±1) hyperplanes from a
  // deterministic splitmix64 of (plane, dim-index); sign bits form the
  // bucket word. Codegen'd kernel — bucket assignment is a map-only scan.
  //
  // Multi-table (OR-amplified) construction: the 60 sign bits are sliced
  // into `LshTables`=15 tables of `LshBits`=4 bits each; a candidate pair is
  // any pair agreeing on ALL bits of AT LEAST ONE table. Single-table LSH at
  // k bits has per-pair recall (1-θ/π)^k — for this corpus's true top-3
  // neighbors (cos≈0.35, θ≈70°) that is ~0.1% at k=12, i.e. structurally
  // zero (measured by sim04 round 2). OR across 15 tables lifts recall to
  // 1-(1-(1-θ/π)^4)^15 ≈ 0.9 while each table stays an equi-join on a
  // 4-bit key. tables/bits trade recall against candidate volume.
  val NumPlanes = 60
  val LshBits = 4
  val LshTables = 15

  /** 60-bit hyperplane-sign word of an embedding column. */
  def lshBucket(v: Column): Column =
    graft.functions.GraftFunctions.hyperplane_bucket(v, NumPlanes)

  /** The deterministic IVF centroid sample (the `IvfCells` lowest vec_ids,
    * in vec_id order so cell index k == rank of centroid vec_id) as
    * (embedding, norm2) pairs — a bounded 16-row collect, shipped to
    * executors as codegen reference objects via `centroid_scores`.
    */
  def ivfCentroids(corpus: DataFrame): Array[(Array[Float], Long)] =
    corpus.where(col("vec_id") < IvfCells)
      .select("vec_id", "embedding", "norm2").collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getSeq[Float](1).toArray, r.getLong(2)))

  /** Corpus with its IVF cell assignment: argmax over the 16 centroid
    * scores, computed INSIDE the projection (first position of the max —
    * ties to the lowest cell). A pure narrow scan: no ×16 posexplode, no
    * corpus-wide window shuffle — shared by sim03 (search) and sim05 (the
    * Lloyd training step).
    */
  def ivfAssigned(s: SparkSession, d: String): DataFrame = {
    val corpus = withNorm(s, d)
    val cents = ivfCentroids(corpus)
    corpus
      .withColumn("__dots",
        graft.functions.GraftFunctions.centroid_scores(col("embedding"), cents.map(_._1), cents.map(_._2)))
      .withColumn("cell",
        (array_position(col("__dots"), array_max(col("__dots"))) - 1).cast(IntegerType))
      .drop("__dots")
  }

  /** Oracle CTEs shared by sim03/sim05: exact scaled scores of every vector
    * against the 16 centroid vectors and the resulting argmax cell
    * assignment (`assigned(vec_id, cell)`, cell = centroid vec_id — equal
    * to the cell INDEX because centroid vec_ids are the contiguous 0..15).
    */
  lazy val sqlIvfAssignCtes: String =
    s"""nv AS (SELECT vec_id, embedding, $sqlNorm2 AS norm2 FROM embeddings),
          cscores AS (
            SELECT a.vec_id, b.cell, $sqlDot / SQRT(CAST(b.norm2 AS DOUBLE)) AS score
            FROM nv a CROSS JOIN
              (SELECT vec_id AS cell, embedding, norm2 FROM nv WHERE vec_id < $IvfCells) b),
          assigned AS (
            SELECT vec_id, cell FROM (
              SELECT vec_id, cell,
                     ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
              FROM cscores) WHERE rn = 1)"""

  /** The 15 per-table 4-bit keys of a sign word, as (tbl, key) structs. */
  def lshTableKeys(b: Column): Column =
    array((0 until LshTables).map { t =>
      struct(lit(t).as("tbl"),
        shiftright(b, t * LshBits).bitwiseAND(lit((1 << LshBits) - 1)).as("key"))
    }: _*)

  val all: Seq[Q] = Seq(
    // Brute-force cosine top-k per probe (the exact ANN baseline).
    Q("sim01_topk_cosine",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("qid")).orderBy(desc("cos_sim"), col("vec_id"))
        probePairs(s, d, 10)
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 5)
          .select("qid", "vec_id", "cos_sim", "rk")
          .orderBy("qid", "rk")
      },
      Some(s"""SELECT qid, vec_id, cos_sim, rk FROM (
                 SELECT qid, vec_id, cos_sim,
                        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS INT) AS rk
                 FROM (${sqlProbePairs(10)}))
               WHERE rk <= 5 ORDER BY qid, rk""")),

    // IVF ANN — the second scale path: coarse-quantize the corpus into
    // `IvfCells` centroid cells (centroids = deterministic corpus sample,
    // the IvfCells lowest vec_ids, shipped as a codegen REFERENCE OBJECT
    // via the centroid_scores kernel — not plan literals, so plan size is
    // independent of dim), search the `IvfProbe` nearest cells per query,
    // exact cosine only on cell-mates. Corpus cell assignment is a map-only
    // projection; the candidate join is an equi-join on the cell id. Recall
    // tunes via IvfProbe. Fully deterministic integer-scaled math → direct
    // DuckDB oracle (cell identity mirrored as the centroid's vec_id).
    Q("sim03_ann_ivf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val corpus = withNorm(s, d)
        // deterministic centroid sample: the IvfCells lowest vec_ids, in
        // vec_id order so cell index k == rank of centroid vec_id (the
        // identity the SQL oracle mirrors)
        val cents = corpus.where(col("vec_id") < IvfCells)
          .select("vec_id", "embedding", "norm2").collect()
          .sortBy(_.getLong(0))
          .map(r => (r.getSeq[Float](1).toArray, r.getLong(2)))
        def cellScores(v: Column): Column =
          graft.functions.GraftFunctions.centroid_scores(v, cents.map(_._1), cents.map(_._2))
        def bestCells(df: DataFrame, v: Column, n: Int, idCol: String): DataFrame = {
          val w = Window.partitionBy(col(idCol)).orderBy(desc("cell_score"), col("cell"))
          df.withColumn("__dots", cellScores(v))
            .select(col("*"), posexplode(col("__dots")).as(Seq("cell", "cell_score")))
            .withColumn("__rk", row_number().over(w))
            .where(col("__rk") <= n)
            .drop("__dots", "cell_score", "__rk")
        }
        // Corpus cell assignment via [[ivfAssigned]] (argmax inside the
        // projection — ties to the lowest cell, same as the window's
        // tie-break; a map stage, not a full exchange, at 100 TB). The
        // probe side keeps the windowed top-`IvfProbe` (10 rows).
        val assigned = ivfAssigned(s, d)
        val probes = bestCells(
          corpus.where(col("vec_id") < 10)
            .select(col("vec_id").as("qid"), col("embedding").as("qvec"), col("norm2").as("qnorm2")),
          col("qvec"), IvfProbe, "qid")
        val w2 = Window.partitionBy(col("qid")).orderBy(desc("cos_sim"), col("vec_id"))
        assigned.join(broadcast(probes), Seq("cell"))
          .where(col("vec_id") =!= col("qid"))
          .withColumn("cos_sim",
            cosine(scaledDot(col("qvec"), col("embedding")), col("qnorm2"), col("norm2")))
          .withColumn("rk", row_number().over(w2))
          .where(col("rk") <= 3)
          .select("qid", "vec_id", "cos_sim", "rk")
          .orderBy("qid", "rk")
      },
      // The whole IVF pipeline is exact integer-scaled math + deterministic
      // argmax (ties to the lowest cell — mirrored by ORDER BY score DESC,
      // cell with cell = centroid vec_id), so DuckDB reproduces it directly
      // from the embeddings table: no engine-internal state involved.
      Some(s"""WITH $sqlIvfAssignCtes,
                 pcells AS (
                   SELECT vec_id AS qid, cell FROM (
                     SELECT vec_id, cell,
                            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
                     FROM cscores WHERE vec_id < 10) WHERE rn <= $IvfProbe),
                 icand AS (
                   SELECT p.qid, s.vec_id FROM pcells p JOIN assigned s ON s.cell = p.cell
                   WHERE s.vec_id <> p.qid),
                 iscored AS (
                   SELECT icand.qid, icand.vec_id,
                          $sqlDot / SQRT(CAST(a.norm2 AS DOUBLE) * CAST(b.norm2 AS DOUBLE)) AS cos_sim
                   FROM icand JOIN nv a ON a.vec_id = icand.qid
                              JOIN nv b ON b.vec_id = icand.vec_id)
               SELECT qid, vec_id, cos_sim, rk FROM (
                 SELECT qid, vec_id, cos_sim,
                        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS INT) AS rk
                 FROM iscored)
               WHERE rk <= 3 ORDER BY qid, rk""")),

    // One LLOYD (k-means) TRAINING step for the IVF coarse quantizer — the
    // piece that turns sim03's deterministic seed centroids into trained
    // ones: assign every vector to its nearest centroid (the shared
    // map-only argmax of [[ivfAssigned]]), then recompute each centroid as
    // the per-cell per-dimension mean of its members. Numeric design for
    // the hash gate: per-element values are floor-scaled to exact integers
    // (the SimilarityOps convention) and summed as DECIMAL(38,0) —
    // DuckDB's SUM(BIGINT) is HUGEINT, so BOTH sides reduce exactly and
    // order-independently, and the final long→double division is
    // deterministic. Scale shape: posexplode to (cell, dim) then a
    // two-level aggregate with map-side combine — the canonical
    // distributed-kmeans shuffle, 16×64 result rows regardless of corpus
    // size; further iterations repeat the same step with the output
    // broadcast back (centroids are always cells×dim ≪ corpus).
    Q("sim05_kmeans_step",
      (s, d) => {
        val assigned = ivfAssigned(s, d)
        assigned
          .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy("cell", "dim")
          .agg(count(lit(1)).as("n_members"),
            sum(floor(col("x").cast(DoubleType) * SCALE).cast(DecimalType(38, 0))).as("ssum"))
          .select(col("cell"), col("dim"), col("n_members"),
            (col("ssum").cast(DoubleType) / (col("n_members") * lit(SCALE))).as("centroid"))
          .orderBy("cell", "dim")
      },
      Some(s"""WITH $sqlIvfAssignCtes,
                 em AS (
                   SELECT a.cell, i.dim, e.embedding[CAST(i.dim + 1 AS INT)] AS x
                   FROM assigned a JOIN nv e USING (vec_id),
                        LATERAL (SELECT UNNEST(range(0, len(e.embedding))) AS dim) i),
                 sums AS (
                   SELECT cell, dim, COUNT(*) AS n_members,
                          SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1e15) AS BIGINT)) AS ssum
                   FROM em GROUP BY 1, 2)
               SELECT CAST(cell AS INT) AS cell, CAST(dim AS INT) AS dim, n_members,
                      CAST(ssum AS DOUBLE) / (n_members * 1e15) AS centroid
               FROM sums ORDER BY cell, dim""")),

    // LSH-bucketed ANN — the scale path: one codegen'd 60-bit sign word per
    // vector (map-only), 15 OR'd tables of 4-bit keys; candidates = probe ×
    // corpus matches on any (tbl, key) — an equi-join keyed on the table
    // slot, never the O(n²) pair space — deduped, then exact cosine only on
    // candidates, top-3 per probe. At 100 TB: corpus keying is a narrow
    // projection ×15; candidate dedup + vector re-join shuffle only the
    // (qid, vec_id) pair list; recall/candidate-volume tunes via
    // LshBits/LshTables. Oracled against the driver-side PureSig bucket
    // dump (independent splitmix64 hyperplanes, table keys re-derived in
    // SQL); the spec pins cosine exactness vs brute force, sim04 the
    // recall.
    Q("sim02_ann_lsh",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val corpus = withNorm(s, d)
        val corpusKeys = corpus
          .select(col("vec_id"), explode(lshTableKeys(lshBucket(col("embedding")))).as("tk"))
          .select(col("vec_id"), col("tk.tbl").as("tbl"), col("tk.key").as("key"))
        val probes = corpus.where(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"), col("norm2").as("qnorm2"))
        val probeKeys = corpus.where(col("vec_id") < 50)
          .select(col("vec_id").as("qid"), explode(lshTableKeys(lshBucket(col("embedding")))).as("tk"))
          .select(col("qid"), col("tk.tbl").as("tbl"), col("tk.key").as("key"))
        val cand = corpusKeys.join(broadcast(probeKeys), Seq("tbl", "key"))
          .where(col("vec_id") =!= col("qid"))
          .select("qid", "vec_id").distinct()
        val w = Window.partitionBy(col("qid")).orderBy(desc("cos_sim"), col("vec_id"))
        cand.join(corpus, "vec_id").join(broadcast(probes), "qid")
          .withColumn("cos_sim",
            cosine(scaledDot(col("qvec"), col("embedding")), col("qnorm2"), col("norm2")))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 3)
          .select("qid", "vec_id", "cos_sim", "rk")
          .orderBy("qid", "rk")
      },
      Some {
        val dump = s"'${graft.Verify.SigDumpDir}/emb_buckets.parquet/*.parquet'"
        s"""WITH nv AS (SELECT vec_id, embedding, $sqlNorm2 AS norm2 FROM embeddings),
              bkt AS (SELECT vec_id, bucket FROM $dump),
              tkeys AS (SELECT vec_id, t,
                               (bucket >> CAST(t*$LshBits AS INT)) & ${(1 << LshBits) - 1} AS key
                        FROM bkt, LATERAL (SELECT UNNEST(range(0, $LshTables)) AS t)),
              lcand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
                        FROM tkeys q JOIN tkeys c ON q.t = c.t AND q.key = c.key
                        WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id),
              scored AS (SELECT lcand.qid, lcand.cid AS vec_id,
                                $sqlDot / SQRT(CAST(a.norm2 AS DOUBLE) * CAST(b.norm2 AS DOUBLE)) AS cos_sim
                         FROM lcand JOIN nv a ON a.vec_id = lcand.qid
                                    JOIN nv b ON b.vec_id = lcand.cid)
            SELECT qid, vec_id, cos_sim, rk FROM (
              SELECT qid, vec_id, cos_sim,
                     CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS INT) AS rk
              FROM scored)
            WHERE rk <= 3 ORDER BY qid, rk"""
      }),

    // HARD-NEGATIVE mining for contrastive training — per probe, the top-5
    // most-similar corpus vectors inside a mid-similarity band
    // [0.05, 0.25]: above the band are positives/near-dups (leakage into
    // the negative set poisons the loss), below are easy negatives that
    // contribute no gradient. Same exact-integer cosine as sim01, so the
    // band boundaries are engine-exact; at scale the band filter runs
    // before the per-probe top-k window, and the candidate generation
    // rides either brute-force (bounded probe block, this baseline) or
    // the sim02 LSH path.
    Q("sim06_hard_negatives",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("qid")).orderBy(desc("cos_sim"), col("vec_id"))
        probePairs(s, d, 10)
          .where(col("cos_sim").between(0.05, 0.25))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 5)
          .select("qid", "vec_id", "cos_sim", "rk")
          .orderBy("qid", "rk")
      },
      Some(s"""SELECT qid, vec_id, cos_sim, rk FROM (
                 SELECT qid, vec_id, cos_sim,
                        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS INT) AS rk
                 FROM (${sqlProbePairs(10)}) WHERE cos_sim BETWEEN 0.05 AND 0.25)
               WHERE rk <= 5 ORDER BY qid, rk"""),
      bench = false),

    // ANN quality as a NUMBER: recall@3 of the LSH and IVF paths against
    // the exact brute-force top-3 over each method's probe set — and in
    // the HARD oracle: the IVF side is exact integer math (sim03's direct
    // SQL), the LSH side re-derives candidates from the PureSig bucket
    // dump (sim02's oracle), brute-force truth from raw embeddings, so
    // DuckDB reproduces the recall NUMBERS themselves.
    Q("sim04_ann_recall",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("qid")).orderBy(desc("cos_sim"), col("vec_id"))
        val brute = probePairs(s, d, 50)
          .withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
          .select("qid", "vec_id")
        def recallOf(method: String, ann: DataFrame, nProbes: Int) = {
          val truth = brute.where(col("qid") < nProbes)
          val hits = ann.select("qid", "vec_id").join(truth, Seq("qid", "vec_id"), "left_semi").count()
          val total = truth.count()
          (method, total, hits, hits.toDouble / total)
        }
        val rows = Seq(
          recallOf("ivf", byNameLocal("sim03_ann_ivf").build(s, d), 10),
          recallOf("lsh", byNameLocal("sim02_ann_lsh").build(s, d), 50))
        import s.implicits._
        rows.toDF("method", "n_truth", "n_hit", "recall").orderBy("method")
      },
      Some {
        val dump = s"'${graft.Verify.SigDumpDir}/emb_buckets.parquet/*.parquet'"
        s"""WITH $sqlIvfAssignCtes,
              pcells AS (
                SELECT vec_id AS qid, cell FROM (
                  SELECT vec_id, cell,
                         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cell) AS rn
                  FROM cscores WHERE vec_id < 10) WHERE rn <= $IvfProbe),
              icand AS (
                SELECT p.qid, s.vec_id FROM pcells p JOIN assigned s ON s.cell = p.cell
                WHERE s.vec_id <> p.qid),
              iscored AS (
                SELECT icand.qid, icand.vec_id,
                       $sqlDot / SQRT(CAST(a.norm2 AS DOUBLE) * CAST(b.norm2 AS DOUBLE)) AS cos_sim
                FROM icand JOIN nv a ON a.vec_id = icand.qid
                           JOIN nv b ON b.vec_id = icand.vec_id),
              ivf_top AS (
                SELECT qid, vec_id FROM (
                  SELECT qid, vec_id,
                         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rk
                  FROM iscored) WHERE rk <= 3),
              bkt AS (SELECT vec_id, bucket FROM $dump),
              tkeys AS (SELECT vec_id, t,
                               (bucket >> CAST(t*$LshBits AS INT)) & ${(1 << LshBits) - 1} AS key
                        FROM bkt, LATERAL (SELECT UNNEST(range(0, $LshTables)) AS t)),
              lcand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
                        FROM tkeys q JOIN tkeys c ON q.t = c.t AND q.key = c.key
                        WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id),
              lscored AS (SELECT lcand.qid, lcand.cid AS vec_id,
                                 $sqlDot / SQRT(CAST(a.norm2 AS DOUBLE) * CAST(b.norm2 AS DOUBLE)) AS cos_sim
                          FROM lcand JOIN nv a ON a.vec_id = lcand.qid
                                     JOIN nv b ON b.vec_id = lcand.cid),
              lsh_top AS (
                SELECT qid, vec_id FROM (
                  SELECT qid, vec_id,
                         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rk
                  FROM lscored) WHERE rk <= 3),
              bpairs AS (
                SELECT a.vec_id AS qid, b.vec_id AS vec_id,
                       $sqlDot / SQRT(CAST(a.norm2 AS DOUBLE) * CAST(b.norm2 AS DOUBLE)) AS cos_sim
                FROM nv a JOIN nv b ON a.vec_id < 50 AND a.vec_id <> b.vec_id),
              brute_top AS (
                SELECT qid, vec_id FROM (
                  SELECT qid, vec_id,
                         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, vec_id) AS rk
                  FROM bpairs) WHERE rk <= 3)
            SELECT method, n_truth, n_hit, CAST(n_hit AS DOUBLE) / n_truth AS recall FROM (
              SELECT 'ivf' AS method,
                     (SELECT COUNT(*) FROM brute_top WHERE qid < 10) AS n_truth,
                     (SELECT COUNT(*) FROM ivf_top i JOIN brute_top b USING (qid, vec_id)) AS n_hit
              UNION ALL
              SELECT 'lsh',
                     (SELECT COUNT(*) FROM brute_top),
                     (SELECT COUNT(*) FROM lsh_top l JOIN brute_top b USING (qid, vec_id))
            ) ORDER BY method"""
      },
      bench = false)
  )

  /** Local alias to avoid a Catalog init cycle. */
  private def byNameLocal(name: String): Q =
    all.find(_.name == name).getOrElse(throw new NoSuchElementException(name))
}
