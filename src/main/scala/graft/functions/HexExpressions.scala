package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared runtime for the hex-quantity decode expressions.
  *
  * Semantics mirror the reference engine's JSON-RPC quantity decoding
  * (reference: server/src/main/java/net/broscorp/web3/converter/Converter.java:322-336,
  * which delegates to web3j `Numeric.decodeQuantity`): an optional "0x"/"0X"
  * prefix followed by hex digits, decoded as an unsigned big-endian integer.
  * Null/empty/malformed input decodes to null (the reference is null-safe and
  * our engine must never fail a 100 TB scan on one bad cell).
  */
object HexDecode extends Serializable {
  /** Decode to Long; returns null (boxed) on malformed input or overflow. */
  def toLong(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    val str = s.toString
    val h = stripPrefix(str)
    if (h == null || h.isEmpty || h.length > 16) return decodeBigSafe(h) match {
      case null => null
      case b if b.bitLength <= 63 => java.lang.Long.valueOf(b.longValueExact)
      case _ => null // overflows int64: caller should use hex_to_decimal
    }
    var acc = 0L
    var i = 0
    while (i < h.length) {
      val d = Character.digit(h.charAt(i), 16)
      if (d < 0) return null
      // 16 hex digits can still overflow a signed long (top bit set)
      if (acc > (Long.MaxValue >> 4)) return null
      acc = (acc << 4) | d
      i += 1
    }
    if (acc < 0) null else java.lang.Long.valueOf(acc)
  }

  /** Decode to a Spark Decimal(38,0); null on malformed / > 38 digits. */
  def toDecimal(s: UTF8String): org.apache.spark.sql.types.Decimal = {
    if (s == null) return null
    val b = decodeBigSafe(stripPrefix(s.toString))
    if (b == null) return null
    val d = Decimal(new java.math.BigDecimal(b))
    // Decimal(38,0) can hold up to 38 significant digits
    if (b.toString.length > 38) null else d
  }

  private def stripPrefix(str: String): String = {
    val t = str.trim
    if (t.length >= 2 && t.charAt(0) == '0' && (t.charAt(1) == 'x' || t.charAt(1) == 'X')) t.substring(2)
    else t
  }

  private def decodeBigSafe(h: String): java.math.BigInteger = {
    if (h == null || h.isEmpty) return null
    var i = 0
    while (i < h.length) {
      if (Character.digit(h.charAt(i), 16) < 0) return null
      i += 1
    }
    new java.math.BigInteger(h, 16)
  }
}

/** `hex_to_long("0x1b4") = 436L`. Codegen-enabled scalar expression:
  * the decode runs inside whole-stage codegen (no UDF serialization,
  * no boxing of the happy path beyond the nullable result).
  */
case class HexToLong(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"hex_to_long expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hex_to_long"

  protected override def nullSafeEval(input: Any): Any =
    HexDecode.toLong(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("decoded")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          java.lang.Long $boxed = graft.functions.HexDecode.toLong(${childGen.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.longValue(); }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): HexToLong = copy(child = newChild)
}

/** `hex_to_decimal("0xc70d815d562d3cfa955")` → Decimal(38,0). For
  * quantities that may exceed int64 (e.g. chain total-difficulty values;
  * reference keeps them as raw strings — Converter.java:267-268).
  */
case class HexToDecimal(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"hex_to_decimal expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "hex_to_decimal"

  protected override def nullSafeEval(input: Any): Any =
    HexDecode.toDecimal(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("decoded")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.types.Decimal ${ev.value} = null;
        if (!${childGen.isNull}) {
          org.apache.spark.sql.types.Decimal $boxed = graft.functions.HexDecode.toDecimal(${childGen.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed; }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): HexToDecimal = copy(child = newChild)
}
