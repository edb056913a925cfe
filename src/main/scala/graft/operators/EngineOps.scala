package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Catalog._
import graft.functions.GraftFunctions

/** Engine-proper operators from SURVEY §2a exercised as verifiable queries:
  * hex-quantity decode (S18), scan range chunking (S5), and the multimodal
  * binary-column plumbing. The DSv2 connector itself (S3-S9) is spec-tested
  * against a stub node in `graft.sources`.
  */
object EngineOps {

  val all: Seq[Q] = Seq(
    // S18: hex → int64 decode via the custom codegen'd Catalyst expression.
    // Round-trips engine-generated hex strings; the oracle is the identity.
    Q("s18_hex_decode",
      (s, d) => {
        GraftFunctions.register(s)
        t(s, d, "events")
          .select(col("event_id"),
            GraftFunctions.hex_to_long(
              concat(lit("0x"), lower(hex(col("event_id"))))).as("decoded"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_id AS decoded FROM events ORDER BY event_id""")),

    // S5: range chunking — split [0, max_id] into 500-sized closed intervals
    // (reference: LogsService.java:509-521 chunk loop → our
    // planInputPartitions). Expressed as a data-driven sequence generator.
    Q("s05_chunk_plan",
      (s, d) => {
        val mx = t(s, d, "events").agg(max(col("event_id")).as("mx"))
        mx.select(explode(sequence(lit(0L), col("mx"), lit(500L))).as("chunk_start"), col("mx"))
          .select(col("chunk_start"), least(col("chunk_start") + 499L, col("mx")).as("chunk_end"))
          .orderBy("chunk_start")
      },
      Some("""WITH m AS (SELECT MAX(event_id) AS mx FROM events)
              SELECT CAST(t.s AS BIGINT) AS chunk_start,
                     CAST(LEAST(t.s + 499, m.mx) AS BIGINT) AS chunk_end
              FROM m, LATERAL (SELECT UNNEST(range(0, m.mx + 1, 500)) AS s) t
              ORDER BY chunk_start""")),

    // S3/S5: the DSv2 connector end-to-end as a catalog query — bounded
    // logs scan (synthetic chain), per-signature counts. The oracle runs on
    // graft.Verify's direct SyntheticRpc parquet dump (pure-function rows,
    // no DSv2 involved), so chunked partition planning + pushdown are in the
    // hard hash-compare signal.
    Q("e01_eth_logs_scan",
      (s, d) => {
        val logs = s.read.format("graft-eth").option("dataset", "logs")
          .option("startBlock", "0").option("endBlock", "2999").load()
        logs.where(col("blockNumber").between(500, 2499))
          .withColumn("sig", when(size(col("topics")) > 0, element_at(col("topics"), 1)).otherwise("none"))
          .groupBy("sig").agg(count(lit(1)).as("n"), countDistinct(col("address")).as("n_addr"))
          .orderBy(desc("n"), col("sig"))
      },
      Some(s"""SELECT CASE WHEN len(topics) > 0 THEN topics[1] ELSE 'none' END AS sig,
                      CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(COUNT(DISTINCT address) AS BIGINT) AS n_addr
               FROM '${graft.Verify.ChainDumpDir}/logs.parquet/*.parquet'
               WHERE blockNumber BETWEEN 500 AND 2499
               GROUP BY 1 ORDER BY n DESC, sig""")),

    // S4: blocks scan through the connector + hex_to_decimal over the
    // totalDifficulty column (S18's decimal path, on engine data). max_td is
    // compared as a string so the decimal survives both engines' pandas
    // conversion untouched.
    Q("e02_eth_blocks_scan",
      (s, d) => {
        GraftFunctions.register(s)
        s.read.format("graft-eth").option("dataset", "blocks")
          .option("startBlock", "0").option("endBlock", "999").load()
          .select(col("number"),
            GraftFunctions.hex_to_decimal(col("totalDifficulty")).as("td"),
            col("gasUsed"), size(col("transactions")).as("n_tx"))
          .agg(count(lit(1)).as("n_blocks"), sum(col("n_tx")).as("total_tx"),
            max(col("td")).cast(StringType).as("max_td"))
      },
      Some(s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
                      CAST(SUM(n_tx) AS BIGINT) AS total_tx,
                      CAST(MAX(td_dec) AS VARCHAR) AS max_td
               FROM '${graft.Verify.ChainDumpDir}/blocks.parquet/*.parquet'""")),

    // S6: adaptive bisection under a node result cap — the capped connector
    // read must agree exactly with the uncapped ground-truth dump.
    Q("e03_eth_bisection",
      (s, d) => s.read.format("graft-eth").option("dataset", "logs")
        .option("startBlock", "0").option("endBlock", "999")
        .option("maxResults", "60").load()
        .agg(count(lit(1)).as("n"), sum(col("blockNumber")).as("sum_bn")),
      Some(s"""SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(blockNumber) AS BIGINT) AS sum_bn
               FROM '${graft.Verify.ChainDumpDir}/logs.parquet/*.parquet'
               WHERE blockNumber <= 999""")),

    // Multimodal plumbing: opaque binary column + typed metadata extraction.
    // The real decode (image/audio libs) is stubbed (see graft.operators
    // MultimodalOps); the schema/partition/batch plumbing is real.
    Q("m01_binary_meta",
      (s, d) => t(s, d, "documents")
        .withColumn("payload", col("text").cast(BinaryType))
        .select(
          col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          hex(substring(col("payload"), 1, 8)).as("head_hex"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
                     CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                     substring(hex(encode(text)), 1, 16) AS head_hex
              FROM documents ORDER BY doc_id"""))
  )
}
