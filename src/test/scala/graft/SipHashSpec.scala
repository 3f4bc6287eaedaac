package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SipHash64Function

/** SipHash-2-4 correctness against the published reference vector
  * (Aumasson & Bernstein, "SipHash: a fast short-input PRF", §Appendix A:
  * key 000102…0f, message 00 01 … 0e → 0xa129ca6149be45e5), plus
  * structural properties and the Catalyst expression ↔ kernel equivalence.
  */
class SipHashSpec extends AnyFunSuite {

  private val paperKeyHex = "000102030405060708090a0b0c0d0e0f"

  test("paper test vector: 15-byte message") {
    val (k0, k1) = SipHash64Function.parseKey(paperKeyHex)
    val msg = Array.tabulate[Byte](15)(_.toByte)
    assert(SipHash64Function.hash(msg, k0, k1) == 0xa129ca6149be45e5L)
  }

  test("key parsing is little-endian per 8-byte word") {
    val (k0, k1) = SipHash64Function.parseKey(paperKeyHex)
    assert(k0 == 0x0706050403020100L)
    assert(k1 == 0x0f0e0d0c0b0a0908L)
  }

  test("deterministic; key- and input-sensitive") {
    val (k0, k1) = SipHash64Function.parseKey(paperKeyHex)
    val (j0, j1) = SipHash64Function.parseKey("00000000000000000000000000000000")
    val m = "hello world".getBytes("UTF-8")
    assert(SipHash64Function.hash(m, k0, k1) == SipHash64Function.hash(m, k0, k1))
    assert(SipHash64Function.hash(m, k0, k1) != SipHash64Function.hash(m, j0, j1))
    assert(SipHash64Function.hash(m, k0, k1) !=
      SipHash64Function.hash("hello worlD".getBytes("UTF-8"), k0, k1))
    // length-extension resistant framing: all 0..16-byte lengths distinct
    val hs = (0 to 16).map(n => SipHash64Function.hash(Array.fill[Byte](n)(0), k0, k1))
    assert(hs.distinct.size == hs.size)
  }
}

/** The registered `siphash64` expression (interpreted AND codegen paths)
  * agrees with the static kernel.
  */
class SipHashExpressionSpec extends SparkTestBase {
  import spark.implicits._

  test("siphash64 expression ≡ kernel, via SQL function registry") {
    val key = graft.config.CounterDef.DefaultSipHashKeyHex
    val (k0, k1) = SipHash64Function.parseKey(key)
    val inputs = Seq("", "a", "0123456", "01234567", "012345678",
      "a longer input exceeding two words")
    val got = inputs.toDF("s")
      .select(call_function("siphash64", col("s").cast("binary"), lit(key)).as("h"))
      .as[Long].collect().toSeq
    val want = inputs.map(s => SipHash64Function.hash(s.getBytes("UTF-8"), k0, k1))
    assert(got == want)
  }
}
