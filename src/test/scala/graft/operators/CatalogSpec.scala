package graft.operators

import graft.SparkSpec

/** Smoke + invariants for every catalog query at sf0.001: builds, runs,
  * returns rows, and column names match the declared oracle SQL aliases
  * (the driver's compare keys on column names — a silent rename breaks the
  * hash-match even when values agree).
  */
class CatalogSpec extends SparkSpec {

  test("catalog names are unique and non-empty") {
    assert(Catalog.all.nonEmpty)
    assert(Catalog.byName.size === Catalog.all.size)
  }

  Catalog.all.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val df = q.build(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("SparkEntry contract: queries/oracleSql keys line up") {
    val qs = graft.SparkEntry.queries
    val os = graft.SparkEntry.oracleSql
    assert(os.keySet.subsetOf(qs.keySet))
    assert(qs.nonEmpty)
  }

  test("SparkEntry.entry returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("docHash == sqlDocHash over negative and boundary ids (sign parity)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Spark's % follows the dividend's sign exactly like DuckDB's, so
    // evaluating the SQL mirror with expr() pins the pmod-vs-% question
    // the engine-side oracle run can't reach (fixture ids are all >= 0)
    val ids = Seq(Long.MinValue + 1, -2147483649L, -2147483648L, -1000000007L,
      -17L, -1L, 0L, 1L, 17L, 2147483647L, 2147483648L, 3000000000L,
      Long.MaxValue).toDF("id")
    Seq(1000L, 1000000007L).foreach { m =>
      val bad = ids
        .withColumn("engine", Catalog.docHash(col("id"), m))
        .withColumn("mirror", expr(Catalog.sqlDocHash("id", m)))
        .where(col("engine") =!= col("mirror") || col("mirror") < 0)
      assert(bad.isEmpty, s"docHash/sqlDocHash diverge for m=$m: " +
        bad.collect().mkString(", "))
    }
  }

  test("alignWs rewrites oracle regexes to the explicit Java \\s class") {
    val out = Catalog.alignWs("""string_split_regex(trim(text), '\s+') [^a-z0-9\s]""")
    assert(out === "string_split_regex(trim(text), '[ \\t\\n\\x0B\\f\\r]+') " +
      "[^a-z0-9 \\t\\n\\x0B\\f\\r]")
    // a NOT-covered in-class form must fail loudly, not silently corrupt
    intercept[IllegalArgumentException](Catalog.alignWs("""[\s]"""))
  }
}
