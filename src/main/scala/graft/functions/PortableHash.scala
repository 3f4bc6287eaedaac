package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing used by the dedup / fingerprint
  * operators.
  *
  * The only hash primitive Spark and the DuckDB oracle share bit-for-bit is
  * `md5` over UTF-8 bytes, so every hash-derived value in the oracle-checked
  * query surface is defined as a function of the md5 hex string:
  *
  *  - [[md5Long60]]: first 15 hex chars (60 bits) parsed as a non-negative
  *    BIGINT — fits a signed 64-bit value with no overflow ambiguity.
  *    DuckDB equivalent: `('0x' || substr(md5(x), 1, 15))::BIGINT`.
  *  - [[md5Hex]]: the full 32-char hex string; lexicographic MIN over these
  *    is a valid (and portable) MinHash permutation surrogate.
  *
  * At scale these evaluate inside whole-stage codegen (`md5`, `conv`,
  * `substring` are all built-in codegen'd expressions); no UDFs.
  */
object PortableHash {

  /** 60-bit non-negative hash of any column's string form. */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  /** Full md5 hex string (32 chars, lowercase). */
  def md5Hex(c: Column): Column = md5(c.cast("string").cast("binary"))

  /** DuckDB SQL fragment equivalent of [[md5Long60]] for oracle authoring. */
  def duckMd5Long60(sqlExpr: String): String =
    s"(('0x' || substr(md5($sqlExpr), 1, 15))::BIGINT)"

  /** JVM-side twin of [[md5Hex]], bit-identical, for typed (Dataset)
    * operators that emit full digests off-plan.
    */
  def jvmMd5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** JVM-side twin of [[md5Long60]], bit-identical, for typed (Dataset)
    * operators that compute hashes off-plan.
    */
  def jvmMd5Long60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = high 60 bits of the digest
    var v = 0L
    var i = 0
    while (i < 8) {
      val b = d(i) & 0xff
      if (i < 7) v = (v << 8) | b
      else v = (v << 4) | (b >> 4) // 15th hex char = high nibble of byte 8
      i += 1
    }
    v
  }
}
