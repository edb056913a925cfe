package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point must make graft functions SQL-visible with no
  * code-side registration — the deployment path for pure-SQL users
  * (`--conf spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions exposes hex functions in SQL") {
    // Force a NEW SparkSession (extensions only apply at session build):
    // clear the JVM-wide default, build with the extension conf (reuses the
    // existing SparkContext), then restore the shared session for other
    // suites.
    // Initialize the shared session FIRST: its lazy creation sets the JVM
    // default session, which must happen before the clears below (else the
    // lazy init would undo them and getOrCreate would return it, skipping
    // extensions).
    val sc = SparkSpec.session.sparkContext
    GraftExtensions.sessionSwapLock.synchronized {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // in-JVM caveat: with a live SparkContext, session builders read
    // spark.sql.extensions from the CONTEXT conf (static conf), so set it
    // there — exactly what --conf does on a real cluster at submit time.
    // SparkContext.conf is private[spark] to scalac but public in bytecode
    sc.getClass.getMethod("conf").invoke(sc)
      .asInstanceOf[org.apache.spark.SparkConf]
      .set("spark.sql.extensions", "graft.GraftExtensions")
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s.sql(
        "SELECT hex_to_long('0x1b4') AS l, CAST(hex_to_decimal('0xde0b6b3a7640000') AS STRING) AS d").head
      assert(r.getLong(0) === 436L)
      assert(r.getString(1) === "1000000000000000000")
      // malformed input is null, not an error, even via SQL
      assert(s.sql("SELECT hex_to_long('0xzz') AS v").head.isNullAt(0))
      // kernels injected by the extensions are SQL-visible too
      assert(s.sql("SELECT word_ngrams('a b a b', 2) AS ng").head.getSeq[String](0)
        === Seq("a b", "b a", "a b"))

      // --- topic0 pushdown rule (injected by the same extensions) ---
      import org.apache.spark.sql.functions._
      val all = s.read.format("graft-eth").option("dataset", "logs")
        .option("startBlock", "0").option("endBlock", "199").load()
      val someTopic = all.where(size(col("topics")) > 0)
        .select(element_at(col("topics"), 1)).head.getString(0)
      val q = s.read.format("graft-eth").option("dataset", "logs")
        .option("startBlock", "0").option("endBlock", "199").load()
        .where(element_at(col("topics"), 1) === someTopic)
      // plan: the scan must show the pushed topic set
      assert(q.queryExecution.executedPlan.toString.contains("topics=1"),
        "topic0 predicate was not pushed into the connector")
      // correctness: equals the unpushed evaluation of the same predicate
      val expected = all.collect()
        .count(r => { val t = r.getSeq[String](2); t.nonEmpty && t.head == someTopic })
      assert(q.count() === expected)

      // --- the same rule matches the SPJ catalog path (e21) ---
      val cat = "graft_spj_pushdown_spec"
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.EthSpjCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.head", "199")
      s.conf.set(s"spark.sql.catalog.$cat.chunk", "100")
      try {
        val qSpj = s.table(s"$cat.logs")
          .where(element_at(col("topics"), 1) === someTopic)
        assert(qSpj.queryExecution.executedPlan.toString.contains("topics=1"),
          "topic0 predicate was not pushed into the SPJ catalog scan")
        assert(qSpj.count() === expected)
      } finally {
        s.conf.unset(s"spark.sql.catalog.$cat")
        s.conf.unset(s"spark.sql.catalog.$cat.head")
        s.conf.unset(s"spark.sql.catalog.$cat.chunk")
      }
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
    }
  }

  test("concurrent extensions-session builds are serialized and restore the shared session") {
    // e04's builder swaps the JVM-global default/active sessions under
    // GraftExtensions.sessionSwapLock; two threads building it at once must
    // both succeed with identical results and leave the shared session as
    // the default afterwards.
    val before = { SparkSpec.session; SparkSession.getDefaultSession }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futs = (1 to 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Seq[String]] {
          def call(): Seq[String] =
            graft.operators.Catalog.byName("e04_eth_topic_pushdown")
              .build(SparkSpec.session, "/root/testdata/sf0.001")
              .collect().map(_.toString).toSeq
        })
      }
      val results = futs.map(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
      assert(results.head.nonEmpty)
      assert(results.toSet.size === 1, "concurrent builds disagreed")
    } finally pool.shutdown()
    assert(SparkSession.getDefaultSession === before,
      "shared default session not restored after concurrent extension builds")
  }
}
