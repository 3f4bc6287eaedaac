package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable heavy-hitter SKETCH — the frequency member of the
  * mergeable-summaries family this engine carries beside the reference's
  * HLL distinct counter (a01) and the compressed-CDF quantile summary
  * ([[QuantileSketch]], e13): the exact per-(window, key) count table
  * ([[graft.relational.Temporal.windowHeavyHitters]]) is sized by DISTINCT
  * keys per window, which is right for bounded key domains and wrong for,
  * e.g., per-IP or per-URL hitters at 100 TB. This summary caps state at
  * `capacity` counters regardless of domain, at the price of a count
  * error the e14 gate MEASURES against the exact answer.
  *
  * Family: Misra–Gries '82 in the MERGEABLE formulation of Agarwal et
  * al. PODS'12 §3: a summary is ≤ k (key, count) pairs; inserting a key
  * increments its counter, a full summary decrements all; merging sums
  * the two counter tables and subtracts the (k+1)-th largest count from
  * every entry, dropping the non-positive ones (≤ k strictly-larger
  * entries can survive). The guarantee — preserved under arbitrary merge
  * trees, which is exactly what Spark's partial/final aggregation needs —
  * is `true(x) − n/(k+1) ≤ est(x) ≤ true(x)`: never an over-count, and
  * an under-count bounded by the total stream length over k+1.
  *
  * Like the HLL and quantile sketches, the summary contents are
  * partition-order-dependent (which keys survive a decrement depends on
  * merge order), so they are deliberately NOT hash-compared; the
  * oracle-facing query (e14) emits the exact counts plus a measured
  * `within_bound` verdict — integer-exact on both engines since the
  * bound floors to `exact − n div (k+1)` for integer estimates — and a
  * sketch drifting past its own theorem breaks the verdict column.
  */
object FreqSketch {

  /** Serialized summary: parallel arrays (keys sorted ascending for a
    * canonical form, counts aligned), total insert count, and the
    * unfolded insert buffer.
    * `pn` is the fill count of `pending` — the array is allocated once at
    * the flush capacity and filled in place (O(1) store per reduce instead
    * of an O(pending) `:+` copy); only the first `pn` slots are live, and
    * a buffer serialized mid-fill carries nulls past `pn`, which flush
    * ignores.
    */
  final case class Buf(keys: Array[String], counts: Array[Long],
                       n: Long, pending: Array[String], pn: Int)

  private def emptyBuf = Buf(Array.empty, Array.empty, 0L, Array.empty, 0)

  /** Sum-union two counter tables, then reduce to ≤ k entries by the
    * Agarwal-et-al merge rule: subtract the (k+1)-th largest count from
    * every entry and keep the strictly-positive remainder.
    */
  private def combine(aK: Array[String], aC: Array[Long],
                      bK: Array[String], bC: Array[Long],
                      k: Int): (Array[String], Array[Long]) = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < aK.length) { m.update(aK(i), m.getOrElse(aK(i), 0L) + aC(i)); i += 1 }
    i = 0
    while (i < bK.length) { m.update(bK(i), m.getOrElse(bK(i), 0L) + bC(i)); i += 1 }
    val d = if (m.size <= k) 0L
    else {
      val vals = m.values.toArray
      java.util.Arrays.sort(vals)
      vals(vals.length - (k + 1)) // (k+1)-th largest; ≤ k exceed it strictly
    }
    val kept = m.iterator
      .map { case (key, c) => (key, c - d) }
      .filter(_._2 > 0L)
      .toArray
      .sortBy(_._1)
    (kept.map(_._1), kept.map(_._2))
  }

  /** Fold the live prefix of the pending buffer in as an exact count table. */
  private def flush(b: Buf, k: Int): Buf = {
    if (b.pn == 0) return b
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < b.pn) { m.update(b.pending(i), m.getOrElse(b.pending(i), 0L) + 1L); i += 1 }
    val pk = m.keysIterator.toArray
    val pc = pk.map(m)
    val (ck, cc) = combine(b.keys, b.counts, pk, pc, k)
    Buf(ck, cc, b.n + b.pn, Array.empty, 0)
  }

  /** The typed Aggregator face: group-wise sketching with
    * `ds.groupByKey(...).agg(new FreqSketch.Agg(k).toColumn)` — rides
    * ObjectHashAggregate with PARTIAL merge, so only ≤ k-entry summaries
    * cross the group shuffle.
    */
  final class Agg(capacity: Int = 16, pendingCap: Int = 256)
      extends Aggregator[String, Buf, Buf] {
    require(capacity > 0, "capacity must be positive")
    override def zero: Buf = emptyBuf
    override def reduce(b: Buf, x: String): Buf = {
      // In-place append into a once-allocated capacity-sized array: each
      // group's buffer is exclusively owned between serialization points,
      // so the mutation is safe, and the per-row cost drops from an
      // O(pending) `:+` copy to one array store.
      val arr = if (b.pending.length >= pendingCap) b.pending
                else java.util.Arrays.copyOf(b.pending, pendingCap)
      arr(b.pn) = x
      val nb = Buf(b.keys, b.counts, b.n, arr, b.pn + 1)
      if (nb.pn >= pendingCap) flush(nb, capacity) else nb
    }
    override def merge(a: Buf, b: Buf): Buf = {
      val fa = flush(a, capacity); val fb = flush(b, capacity)
      val (ck, cc) = combine(fa.keys, fa.counts, fb.keys, fb.counts, capacity)
      Buf(ck, cc, fa.n + fb.n, Array.empty, 0)
    }
    override def finish(b: Buf): Buf = flush(b, capacity)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }
}
