package graft.operators

import graft.SparkSpec

/** Semantic pin for the TF-IDF keyword extraction (t10): the query's
  * ranked output must equal a driver-side recomputation of tf/df scoring
  * from raw tokenization — top-3 per doc, score desc, token asc tie-break.
  */
class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  test("t10 top-3 keywords == driver-side tf/df ranking") {
    val docs = Catalog.t(spark, sfDir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val tf: Map[(Long, String), Long] = docs.flatMap { case (id, t) =>
      t.trim.split("\\s+").filter(_.nonEmpty).groupBy(identity)
        .map { case (tok, hits) => (id, tok) -> hits.length.toLong }
    }.toMap
    val df: Map[String, Long] =
      tf.keys.groupBy(_._2).map { case (tok, ks) => tok -> ks.size.toLong }
    val expected = tf.groupBy(_._1._1).flatMap { case (id, m) =>
      m.toSeq
        .map { case ((_, tok), f) => (tok, f, df(tok), f.toDouble / df(tok)) }
        .sortBy { case (tok, _, _, score) => (-score, tok) }
        .take(3).zipWithIndex
        .map { case ((tok, f, d, score), i) => (id, i + 1, tok, f, d, score) }
    }.toSet
    val got = Catalog.byName("t10_tfidf_keywords").build(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    assert(got === expected)
  }
}
