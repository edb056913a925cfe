package graft.sources

import org.apache.spark.sql.types._

/** Fixed dataset schemas (reference: Converter.java:41-52 for logs,
  * Converter.java:81-107 for blocks; also README.md:31-80). All fields
  * nullable, matching the reference's explicit per-row null handling
  * (Converter.java:306-336).
  */
object EthSchemas {

  val logs: StructType = StructType(Seq(
    StructField("address", StringType),
    StructField("data", StringType),
    StructField("topics", ArrayType(StringType)),
    StructField("blockNumber", LongType),
    StructField("transactionHash", StringType),
    StructField("transactionIndex", IntegerType),
    StructField("blockHash", StringType),
    StructField("logIndex", IntegerType),
    StructField("removed", BooleanType)))

  val blocks: StructType = StructType(Seq(
    StructField("number", LongType),
    StructField("hash", StringType),
    StructField("parentHash", StringType),
    StructField("nonce", StringType),
    StructField("sha3Uncles", StringType),
    StructField("logsBloom", StringType),
    StructField("transactionsRoot", StringType),
    StructField("stateRoot", StringType),
    StructField("receiptsRoot", StringType),
    StructField("author", StringType),
    StructField("miner", StringType),
    StructField("mixHash", StringType),
    // difficulty/totalDifficulty stay raw hex strings: they may exceed
    // int64 (Converter.java:267-268); decode with hex_to_decimal on demand.
    StructField("difficulty", StringType),
    StructField("totalDifficulty", StringType),
    StructField("extraData", StringType),
    StructField("size", LongType),
    StructField("gasLimit", LongType),
    StructField("gasUsed", LongType),
    StructField("timestamp", LongType),
    StructField("transactions", ArrayType(StringType)),
    StructField("uncles", ArrayType(StringType)),
    StructField("sealFields", ArrayType(StringType))))

  def forDataset(dataset: String): StructType = dataset match {
    case "logs" => logs
    case "blocks" => blocks
    case other => throw new IllegalArgumentException(
      s"unknown dataset '$other' (expected 'logs' or 'blocks')")
  }
}
