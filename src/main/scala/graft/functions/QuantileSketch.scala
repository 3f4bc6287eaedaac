package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable ε-approximate quantile SKETCH — the unbounded-domain
  * companion to the exact cents-histogram percentile counter
  * ([[Quantiles.fromHistogram]] over `Temporal.valueCentsHistogram`):
  * the histogram is exact but its state grows with DISTINCT values,
  * which is fine for money-like bounded domains and wrong for, e.g.,
  * nanosecond latencies at 100 TB. This sketch caps state at
  * O(1/ε) regardless of domain, at the price of a rank error the
  * e13 gate MEASURES against the exact answer.
  *
  * Family: compressed-CDF summaries (the mergeable-summary line of
  * Greenwald–Khanna '01 and Agarwal et al. '12, simplified to the
  * deterministic knot form): a summary is ≤ O(1/ε) sorted `knots`
  * (actual data values) with `ranks[i]` = the sketch's rank estimate of
  * `knots[i]` in everything inserted so far. Inserts buffer into
  * `pending` and fold in as an exact mini-CDF; merge sums the two rank
  * functions at every knot of either side; compression keeps one knot
  * per `ε·n/2` rank advance (first and last always kept, so min/max are
  * exact). Each compress contributes ≤ ε·n/2 rank error; Spark's
  * aggregation tree gives a small merge depth, so the error bound is
  * a few multiples of ε — the honest contract is the MEASURED per-query
  * gate (|rank(estimate) − target rank| ≤ gate·n), not the constant.
  *
  * The sketch is intentionally NOT hash-compared: like the reference's
  * HLL distinct counter (the a01 pattern), estimates depend on partition
  * order; the oracle-facing output carries the exact quantile plus the
  * measured within-ε verdict, and a drifting sketch breaks the verdict
  * column, not the estimate's bits.
  */
object QuantileSketch {

  /** Serialized summary: parallel arrays (knots sorted ascending,
    * ranks non-decreasing), total count, and the unsorted insert buffer.
    * `pn` is the fill count of `pending` — the array is allocated once at
    * the flush capacity and filled in place, so per-row reduce is an O(1)
    * store instead of a whole-buffer `:+` copy; only the first `pn`
    * elements are live (a buffer serialized mid-fill carries zeros past
    * `pn`, which flush ignores).
    */
  final case class Buf(knots: Array[Long], ranks: Array[Long],
                       n: Long, pending: Array[Long], pn: Int)

  private def emptyBuf = Buf(Array.empty, Array.empty, 0L, Array.empty, 0)

  /** Rank estimate of `v` under a summary: the rank of the largest knot
    * ≤ v (0 when v precedes every knot). Error ≤ the compression step.
    */
  private def rankOf(knots: Array[Long], ranks: Array[Long], v: Long): Long = {
    var lo = 0; var hi = knots.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (knots(mid) <= v) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    if (ans < 0) 0L else ranks(ans)
  }

  /** Keep one knot per `step` of rank advance; first and last always
    * survive, so the summary's min/max stay exact.
    */
  private def compress(knots: Array[Long], ranks: Array[Long],
                       step: Long): (Array[Long], Array[Long]) = {
    if (knots.length <= 2 || step <= 1) return (knots, ranks)
    val kb = Array.newBuilder[Long]; val rb = Array.newBuilder[Long]
    kb += knots(0); rb += ranks(0)
    var lastRank = ranks(0)
    var i = 1
    while (i < knots.length - 1) {
      if (ranks(i) - lastRank >= step) {
        kb += knots(i); rb += ranks(i); lastRank = ranks(i)
      }
      i += 1
    }
    kb += knots(knots.length - 1); rb += ranks(ranks.length - 1)
    (kb.result(), rb.result())
  }

  /** Sum two rank functions at the union of their knots, then compress
    * to the target ε for the combined count.
    */
  private def mergeCdfs(a: Buf, b: Buf, epsPpm: Long): Buf = {
    if (a.n == 0) return b
    if (b.n == 0) return a
    val union = (a.knots ++ b.knots).distinct.sorted
    val knots = union
    val ranks = union.map(v =>
      rankOf(a.knots, a.ranks, v) + rankOf(b.knots, b.ranks, v))
    val n = a.n + b.n
    val step = math.max(1L, epsPpm * n / 2000000L)
    val (ck, cr) = compress(knots, ranks, step)
    Buf(ck, cr, n, Array.empty, 0)
  }

  /** Fold the live prefix of the pending buffer in as an exact mini-CDF. */
  private def flush(b: Buf, epsPpm: Long): Buf = {
    if (b.pn == 0) return b
    val sorted = java.util.Arrays.copyOf(b.pending, b.pn)
    java.util.Arrays.sort(sorted)
    // exact CDF of the batch: rank of each distinct value = count ≤ it
    val kb = Array.newBuilder[Long]; val rb = Array.newBuilder[Long]
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j + 1 < sorted.length && sorted(j + 1) == sorted(i)) j += 1
      kb += sorted(i); rb += (j + 1).toLong
      i = j + 1
    }
    mergeCdfs(Buf(b.knots, b.ranks, b.n, Array.empty, 0),
      Buf(kb.result(), rb.result(), sorted.length.toLong, Array.empty, 0), epsPpm)
  }

  /** Query: the value at the first knot whose rank reaches `target`
    * (clamped to the last knot — the exact max).
    */
  def query(knots: Array[Long], ranks: Array[Long], target: Long): Long = {
    var i = 0
    while (i < knots.length - 1 && ranks(i) < target) i += 1
    knots(i)
  }

  /** The typed Aggregator face: group-wise sketching with
    * `ds.groupByKey(...).agg(new QuantileSketch.Agg().toColumn)`.
    */
  final class Agg(epsPpm: Long = 5000L, pendingCap: Int = 256)
      extends Aggregator[Long, Buf, Buf] {
    override def zero: Buf = emptyBuf
    override def reduce(b: Buf, x: Long): Buf = {
      // In-place append into a once-allocated capacity-sized array: each
      // group's buffer is exclusively owned between serialization points,
      // so the mutation is safe, and the per-row cost drops from an
      // O(pending) `:+` copy to one array store.
      val arr = if (b.pending.length >= pendingCap) b.pending
                else java.util.Arrays.copyOf(b.pending, pendingCap)
      arr(b.pn) = x
      val nb = Buf(b.knots, b.ranks, b.n, arr, b.pn + 1)
      if (nb.pn >= pendingCap) flush(nb, epsPpm) else nb
    }
    override def merge(a: Buf, b: Buf): Buf =
      mergeCdfs(flush(a, epsPpm), flush(b, epsPpm), epsPpm)
    override def finish(b: Buf): Buf = flush(b, epsPpm)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }
}
