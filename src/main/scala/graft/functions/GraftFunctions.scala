package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, lit}

/** Registration point for graft's custom scalar / aggregate functions.
  *
  * Everything registered here is a native Catalyst `Expression` (codegen'd,
  * whole-stage-compatible) or a typed `Aggregator` — never a boxed Scala UDF —
  * so the hot path stays inside Tungsten.
  */
object GraftFunctions {

  /** Idempotently register all graft functions on a session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("hex_to_long", exprs => HexToLong(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("hex_to_decimal", exprs => HexToDecimal(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      exprs => WordShingles(exprs.head, exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("simhash64", exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("minhash_signature",
      exprs => MinHashSignature(exprs.head,
        exprs(1).eval(null).asInstanceOf[Int], exprs(2).eval(null).asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("scaled_dot",
      exprs => ScaledDot(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("hyperplane_bucket",
      exprs => HyperplaneBucket(exprs.head, exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    spark.udf.register("sum_of_squares", SumOfSquaresLong.udaf)
  }

  // Column-API wrappers (require register() to have been called on the session).
  def hex_to_long(c: Column): Column = call_function("hex_to_long", c)
  def hex_to_decimal(c: Column): Column = call_function("hex_to_decimal", c)
  def word_shingles(c: Column, n: Int): Column = call_function("word_shingles", c, lit(n))
  def simhash64(c: Column): Column = call_function("simhash64", c)
  def minhash_signature(c: Column, shingleN: Int, numHashes: Int): Column =
    call_function("minhash_signature", c, lit(shingleN), lit(numHashes))
  def scaled_dot(a: Column, b: Column): Column = call_function("scaled_dot", a, b)
  def hyperplane_bucket(v: Column, numPlanes: Int): Column =
    call_function("hyperplane_bucket", v, lit(numPlanes))
}

/** Exemplar typed UDAF (SURVEY §2c: `Aggregator[IN,BUF,OUT]` extension
  * surface). Exact integer arithmetic → order-independent, safe to verify
  * against a SQL oracle.
  */
object SumOfSquaresLong extends Aggregator[Long, Long, Long] {
  override def zero: Long = 0L
  override def reduce(b: Long, a: Long): Long = b + a * a
  override def merge(b1: Long, b2: Long): Long = b1 + b2
  override def finish(r: Long): Long = r
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  def udaf = org.apache.spark.sql.functions.udaf(this)
}
