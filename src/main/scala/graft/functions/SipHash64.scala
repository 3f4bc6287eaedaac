package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SipHash-2-4 core (Aumasson & Bernstein, "SipHash: a fast short-input
  * PRF"). Static so generated Java code can call it directly; allocation-free
  * hot path. Mirrors the reference's keyed canonical-value hashing
  * (`/root/reference/counter.go:593-601`).
  */
object SipHash64Function {

  /** Parse the 32-hex-char key into (k0, k1), little-endian 8-byte words —
    * the layout of the reference's `siphash.Hash(k0, k1, data)` key split
    * (`counter.go:595-600`).
    */
  def parseKey(hex: String): (Long, Long) = {
    require(hex.length == 32, s"siphash key must be 32 hex chars, got '$hex'")
    val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    (leLong(bytes, 0), leLong(bytes, 8))
  }

  private def leLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  def hash(data: Array[Byte], k0: Long, k1: Long): Long = {
    var v0 = k0 ^ 0x736f6d6570736575L
    var v1 = k1 ^ 0x646f72616e646f6dL
    var v2 = k0 ^ 0x6c7967656e657261L
    var v3 = k1 ^ 0x7465646279746573L

    val n = data.length
    val end = n - (n % 8)
    var i = 0
    while (i < end) {
      val m = (data(i) & 0xffL) |
        ((data(i + 1) & 0xffL) << 8) |
        ((data(i + 2) & 0xffL) << 16) |
        ((data(i + 3) & 0xffL) << 24) |
        ((data(i + 4) & 0xffL) << 32) |
        ((data(i + 5) & 0xffL) << 40) |
        ((data(i + 6) & 0xffL) << 48) |
        ((data(i + 7) & 0xffL) << 56)
      v3 ^= m
      // 2 compression rounds
      var r = 0
      while (r < 2) {
        v0 += v1; v1 = java.lang.Long.rotateLeft(v1, 13); v1 ^= v0; v0 = java.lang.Long.rotateLeft(v0, 32)
        v2 += v3; v3 = java.lang.Long.rotateLeft(v3, 16); v3 ^= v2
        v0 += v3; v3 = java.lang.Long.rotateLeft(v3, 21); v3 ^= v0
        v2 += v1; v1 = java.lang.Long.rotateLeft(v1, 17); v1 ^= v2; v2 = java.lang.Long.rotateLeft(v2, 32)
        r += 1
      }
      v0 ^= m
      i += 8
    }

    var last = (n & 0xffL) << 56
    var j = 0
    while (i + j < n) { last |= (data(i + j) & 0xffL) << (8 * j); j += 1 }
    v3 ^= last
    var r = 0
    while (r < 2) {
      v0 += v1; v1 = java.lang.Long.rotateLeft(v1, 13); v1 ^= v0; v0 = java.lang.Long.rotateLeft(v0, 32)
      v2 += v3; v3 = java.lang.Long.rotateLeft(v3, 16); v3 ^= v2
      v0 += v3; v3 = java.lang.Long.rotateLeft(v3, 21); v3 ^= v0
      v2 += v1; v1 = java.lang.Long.rotateLeft(v1, 17); v1 ^= v2; v2 = java.lang.Long.rotateLeft(v2, 32)
      r += 1
    }
    v0 ^= last

    v2 ^= 0xff
    r = 0
    while (r < 4) { // finalization: 4 rounds
      v0 += v1; v1 = java.lang.Long.rotateLeft(v1, 13); v1 ^= v0; v0 = java.lang.Long.rotateLeft(v0, 32)
      v2 += v3; v3 = java.lang.Long.rotateLeft(v3, 16); v3 ^= v2
      v0 += v3; v3 = java.lang.Long.rotateLeft(v3, 21); v3 ^= v0
      v2 += v1; v1 = java.lang.Long.rotateLeft(v1, 17); v1 ^= v2; v2 = java.lang.Long.rotateLeft(v2, 32)
      r += 1
    }
    v0 ^ v1 ^ v2 ^ v3
  }

  /** UTF8String convenience for codegen over string inputs. */
  def hash(s: UTF8String, k0: Long, k1: Long): Long = hash(s.getBytes, k0, k1)
}

/** Catalyst expression `siphash64(data, keyHex)`: keyed SipHash-2-4 of a
  * binary/string column, with full whole-stage-codegen support (the
  * generated code calls the static [[SipHash64Function]], same pattern as
  * Spark's own `XxHash64`). Registered as a SQL function by
  * [[graft.GraftExtensions]].
  */
case class SipHash64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "siphash64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"siphash64 expects (BINARY, STRING key), got (${left.dataType}, ${right.dataType})")
  }

  private lazy val key: (Long, Long) = {
    require(right.foldable, "siphash64 key must be a literal")
    SipHash64Function.parseKey(right.eval().asInstanceOf[UTF8String].toString)
  }

  override protected def nullSafeEval(data: Any, keyHex: Any): Any =
    SipHash64Function.hash(data.asInstanceOf[Array[Byte]], key._1, key._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (k0, k1) = key
    nullSafeCodeGen(ctx, ev, (data, _) => {
      s"${ev.value} = graft.functions.SipHash64Function.hash($data, ${k0}L, ${k1}L);"
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SipHash64 {
  val functionIdentifier: FunctionIdentifier = FunctionIdentifier("siphash64")

  val expressionInfo: ExpressionInfo = new ExpressionInfo(
    classOf[SipHash64].getName, "siphash64")

  val builder: Seq[Expression] => Expression = {
    case Seq(data, key) => SipHash64(data, key)
    case other => throw new IllegalArgumentException(
      s"siphash64 expects (data, keyHex), got ${other.length} args")
  }
}
