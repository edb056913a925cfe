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
}
