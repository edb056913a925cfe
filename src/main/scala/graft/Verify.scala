package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Location of the synthetic-chain reference dump; the connector oracle
    * SQL (EngineOps e01-e04) reads these files in DuckDB. The oracle
    * strings and the dump are produced by the same JVM, so the env override
    * stays consistent between them.
    */
  val ChainDumpDir: String =
    sys.env.getOrElse("GRAFT_CHAIN_DUMP_DIR", "/tmp/graft_synthetic_chain")

  /** Location of the driver-computed signature dump (PureSig): ground truth
    * for the engine-hash dedup/ANN family (d03/d04/d06/d07/d08, sim02). The
    * oracle SQL for those queries reads these files in DuckDB.
    */
  val SigDumpDir: String =
    sys.env.getOrElse("GRAFT_SIG_DUMP_DIR", "/tmp/graft_sig_dump")

  /** Materialize the deterministic synthetic chain (seed 42, the connector's
    * default) as parquet, WITHOUT going through the DSv2 read path: rows come
    * straight from SyntheticRpc's pure functions on the driver, so the dump
    * is an independent ground truth for the connector's scan machinery
    * (chunked partitions, pushdown, bisection). totalDifficulty is decoded
    * with BigInteger — independent of the HexToDecimal kernel too.
    */
  /** x16's reorg scenario — ONE set of constants shared by the driver-side
    * dump below, the x16 streaming query's source options, and its oracle
    * SQL, so the three cannot drift apart.
    */
  val ReorgAt = 50L
  val ReorgDepth = 2
  val ReorgHead = 99L

  def dumpSyntheticChain(spark: SparkSession): Unit = {
    import spark.implicits._
    val rpc = new graft.sources.SyntheticRpc(42L, 10000L)
    val logs = (0L to 2999L).flatMap(b => (0 until rpc.logsInBlock(b)).map(i => rpc.logAt(b, i)))
    logs.toDF().coalesce(1).write.mode("overwrite").parquet(s"$ChainDumpDir/logs.parquet")
    // the delivered event stream of the reorg-mode chain (appends +
    // removed=true retractions + replacements), straight from SyntheticRpc's
    // pure functions on the driver — ground truth for x16's streamed path
    val reorgRpc = new graft.sources.SyntheticRpc(42L, 10000L,
      reorgAt = ReorgAt, reorgDepth = ReorgDepth)
    (0L to ReorgHead).flatMap(reorgRpc.deliveredAt).toDF()
      .coalesce(1).write.mode("overwrite").parquet(s"$ChainDumpDir/reorg_logs.parquet")
    val blocks = (0L to 999L).flatMap(rpc.getBlock).map { b =>
      (b.number, new java.math.BigInteger(b.totalDifficulty.stripPrefix("0x"), 16).longValueExact(),
        b.gasUsed, b.transactions.size, b.timestamp)
    }
    blocks.toDF("number", "td_dec", "gasUsed", "n_tx", "timestamp")
      .coalesce(1).write.mode("overwrite").parquet(s"$ChainDumpDir/blocks.parquet")
  }

  /** MinHash/SimHash signatures and hyperplane buckets for the CURRENT
    * sfDir's corpus, computed on the driver by graft.verify.PureSig — a
    * from-scratch reimplementation (public xxHash spec, no Catalyst, no
    * Spark hash classes) — so the LSH/SimHash/ANN pipelines are oracled
    * against math computed entirely outside the engine under test.
    */
  /** dumpSignatures collects both tables to the driver BY DESIGN (the
    * oracle must be computed outside the engine under test); that is only
    * sane at verification scale. Guarded so pointing Verify at a big sfDir
    * fails with an explanation instead of an OOM'd driver.
    */
  private val SigDumpMaxRows = 1000000L

  def dumpSignatures(spark: SparkSession, sfDir: String): Unit = {
    import graft.verify.PureSig
    import spark.implicits._
    Seq("documents", "embeddings").foreach { tbl =>
      val n = spark.read.parquet(s"$sfDir/$tbl.parquet").count()
      require(n <= SigDumpMaxRows,
        s"dumpSignatures is a TEST-SCALE oracle aid: it materializes $tbl on the driver " +
          s"($n rows > $SigDumpMaxRows). Run Verify against a verification-scale sfDir.")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.toSeq.map { case (id, txt) =>
      (id, PureSig.simhash64(txt), PureSig.minhashSignature(txt, 3, 64).toSeq)
    }.toDF("doc_id", "simhash", "sig")
      .coalesce(1).write.mode("overwrite").parquet(s"$SigDumpDir/doc_sigs.parquet")
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    embs.toSeq.map { case (id, v) => (id, PureSig.hyperplaneBucket(v, 60)) }
      .toDF("vec_id", "bucket")
      .coalesce(1).write.mode("overwrite").parquet(s"$SigDumpDir/emb_buckets.parquet")
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    dumpSyntheticChain(spark)
    dumpSignatures(spark, sfDir)
    // Per-query watchdog: one hung/pathological query must not zero the
    // whole correctness round — cancel its job group and move on.
    val timeoutMs = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "600").toLong * 1000
    // dev aid (mirrors Bench): GRAFT_VERIFY_ONLY=q1,q2 restricts the dump
    // an empty/blank value means "no filter", not "match nothing"
    val only = sys.env.get("GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).filter(_.nonEmpty)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val timer = new java.util.Timer(true)
      spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
      timer.schedule(new java.util.TimerTask {
        def run(): Unit = {
          System.err.println(s"[verify] $name timed out after ${timeoutMs / 1000}s — cancelling")
          spark.sparkContext.cancelJobGroup(name)
        }
      }, timeoutMs)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        timer.cancel()
        spark.sparkContext.clearJobGroup()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
