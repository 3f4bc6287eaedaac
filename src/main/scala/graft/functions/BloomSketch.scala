package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable Bloom membership filter — the SET-MEMBERSHIP member of the
  * mergeable-summaries family beside HLL (distinct count, a01),
  * the compressed-CDF quantile summary (e13) and the Misra–Gries
  * hitter table (e14): "have we seen this URL/content digest before?"
  * at crawl scale, where the exact seen-set is corpus-sized but the
  * filter is a fixed `mBits` bit array, mergeable across
  * partitions/snapshots by bitwise OR.
  *
  * Hashing is the repo's portable md5 discipline ([[PortableHash]]):
  * bit_i(key) = (h1 + i·h2) mod m with h1 = md5_60(key),
  * h2 = md5_60(key ++ "#2") — Kirsch–Mitzenmacher double hashing, so the
  * whole scheme is TWO md5s per key regardless of `kHashes`, and the
  * probe side evaluates as pure codegen'd Column arithmetic
  * ([[testColumn]]) against the broadcast bit array. Both 60-bit hashes
  * are non-negative, so `kHashes ≤ 8` keeps h1 + i·h2 overflow-free.
  *
  * Contracts (the d26 gate measures both):
  *  - NO false negatives, ever — an inserted key always tests true;
  *    this is a theorem of the OR-merge, not a probability, so the gate
  *    hash-compares the false-negative COUNT against literal 0.
  *  - false positives at rate ≈ (1 − e^(−k·n/m))^k; the gate checks the
  *    measured count against a generous ppm budget — a drifting hash or
  *    a saturated filter breaks the verdict column.
  */
object BloomSketch {

  /** Serialized filter: `mBits/64` words + the insert count. */
  final case class Buf(words: Array[Long], n: Long)

  /** JVM-side bit positions of a key, identical to [[testColumn]]'s. */
  private[graft] def jvmBits(key: String, mBits: Int, kHashes: Int): Array[Int] = {
    val h1 = PortableHash.jvmMd5Long60(key)
    val h2 = PortableHash.jvmMd5Long60(key + "#2")
    Array.tabulate(kHashes)(i => ((h1 + i.toLong * h2) % mBits).toInt)
  }

  /** Codegen'd membership test of `key` against a `words` array column
    * (array&lt;bigint&gt;, 1-based `element_at` indexing) — TRUE iff all
    * `kHashes` bits are set. Pure Column arithmetic: two md5s, k
    * mask-and-tests, no UDF.
    */
  def testColumn(words: Column, key: Column, mBits: Int, kHashes: Int): Column = {
    val h1 = PortableHash.md5Long60(key)
    val h2 = PortableHash.md5Long60(concat(key.cast("string"), lit("#2")))
    (0 until kHashes).map { i =>
      val bit = pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong)).cast("int")
      val mask = call_function("shiftleft", lit(1L), bit % 64)
      (element_at(words, call_function("shiftright", bit, lit(6)) + 1)
        .bitwiseAND(mask)) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** The typed Aggregator face: a whole-frame filter with
    * `ds.select(new BloomSketch.Agg(m, k).toColumn)` — partial buffers
    * OR together map-side, so only fixed-size word arrays cross the
    * (single-group) exchange.
    */
  final class Agg(mBits: Int = 16384, kHashes: Int = 4)
      extends Aggregator[String, Buf, Buf] {
    require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    require(kHashes > 0 && kHashes <= 8, "kHashes must be in [1, 8]")
    override def zero: Buf = Buf(new Array[Long](mBits / 64), 0L)
    override def reduce(b: Buf, x: String): Buf = {
      val bits = jvmBits(x, mBits, kHashes)
      var i = 0
      while (i < bits.length) {
        b.words(bits(i) >> 6) |= 1L << (bits(i) & 63)
        i += 1
      }
      Buf(b.words, b.n + 1L)
    }
    override def merge(a: Buf, b: Buf): Buf = {
      var i = 0
      while (i < a.words.length) { a.words(i) |= b.words(i); i += 1 }
      Buf(a.words, a.n + b.n)
    }
    override def finish(b: Buf): Buf = b
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }
}
