package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.BloomSketch

/** Semantics of the mergeable Bloom membership filter and its d26 gate
  * operator — the no-false-negative theorem, JVM-insert ⇄ Column-test
  * bit parity, OR-merge, and that the FP budget verdict CAN fail (a
  * saturated filter trips it).
  */
class BloomSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def build(keys: Seq[String], a: BloomSketch.Agg): BloomSketch.Buf =
    a.finish(keys.foldLeft(a.zero)((b, x) => a.reduce(b, x)))

  test("no false negatives: every JVM-inserted key passes the codegen'd Column test") {
    val keys = (0 until 500).map(i => s"key$i")
    val a = new BloomSketch.Agg(mBits = 4096, kHashes = 4)
    val buf = build(keys, a)
    assert(buf.n == 500L)
    val df = keys.toDF("key")
      .crossJoin(broadcast(Seq(Tuple1(buf.words)).toDF("words")))
    val misses = df
      .where(!BloomSketch.testColumn(col("words"), col("key"), 4096, 4))
      .count()
    assert(misses == 0L, "an inserted key can never test false")
  }

  test("OR-merge: membership from either side survives; counts add") {
    val a = new BloomSketch.Agg(mBits = 1024, kHashes = 3)
    val m = a.merge(build(Seq("left1", "left2"), a), build(Seq("right1"), a))
    assert(m.n == 3L)
    Seq("left1", "left2", "right1").foreach { k =>
      val ok = BloomSketch.jvmBits(k, 1024, 3)
        .forall(b => (m.words(b >> 6) & (1L << (b & 63))) != 0L)
      assert(ok, s"$k lost in merge")
    }
  }

  test("bloomMembership: exact accounting; a saturated filter trips the FP gate") {
    val f = (0 until 40).map(i => s"seen$i").toDF("key")
    val p = ((0 until 10).map(i => s"seen$i") ++
      (0 until 90).map(i => s"new$i")).toDF("key")
    val row = Dedup.bloomMembership(f, p, mBits = 16384, kHashes = 4).collect().head
    assert(row.getLong(0) == 40L && row.getLong(1) == 100L)
    assert(row.getLong(2) == 10L, "exact member count")
    assert(row.getLong(3) == 0L, "no false negatives")
    assert(row.getLong(4) == 1L, "an unsaturated filter stays in budget")
    // 64-bit filter with 40 keys × 4 hashes is ~saturated: most of the 90
    // non-members collide, far past the 5% + 3 budget → the gate FAILS,
    // proving the verdict is a real measurement, not a tautology
    val sat = Dedup.bloomMembership(f, p, mBits = 64, kHashes = 4).collect().head
    assert(sat.getLong(3) == 0L, "false negatives stay impossible even saturated")
    assert(sat.getLong(4) == 0L, s"saturated filter must trip the FP gate: $sat")
  }
}
