package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.QuantileSketch
import graft.functions.QuantileSketch.Buf

/** Semantics of the mergeable compressed-CDF quantile sketch — the data
  * structure alone (the e13 operator's measured gate locks the
  * query-level contract against the exact histogram).
  */
class QuantileSketchSpec extends AnyFunSuite {

  private def agg = new QuantileSketch.Agg(epsPpm = 5000L, pendingCap = 256)

  private def build(xs: Seq[Long], a: QuantileSketch.Agg = agg): Buf =
    a.finish(xs.foldLeft(a.zero)((b, x) => a.reduce(b, x)))

  private def rankError(b: Buf, sorted: IndexedSeq[Long]): Long = {
    // for every knot: |sketch rank − true rank| (true rank = count ≤ v)
    b.knots.zip(b.ranks).map { case (v, r) =>
      math.abs(r - sorted.count(_ <= v).toLong)
    }.max
  }

  test("small inputs (one flush, no compression) are the exact CDF") {
    val b = build(Seq(5L, 1L, 3L, 3L, 9L))
    assert(b.n == 5L)
    assert(b.knots.toSeq == Seq(1L, 3L, 5L, 9L))
    assert(b.ranks.toSeq == Seq(1L, 3L, 4L, 5L))
    // the shared rank rule: target = ((n−1)p) div 1e6 + 1
    assert(QuantileSketch.query(b.knots, b.ranks, target = 3L) == 3L)
    assert(QuantileSketch.query(b.knots, b.ranks, target = 1L) == 1L)
    assert(QuantileSketch.query(b.knots, b.ranks, target = 5L) == 9L)
  }

  test("large shuffled input: bounded summary, bounded rank error, exact min/max") {
    val n = 50000
    val r = new scala.util.Random(7)
    val xs = r.shuffle((0 until n).map(_.toLong * 3L).toVector)
    val b = build(xs)
    assert(b.n == n.toLong)
    // O(1/ε) knots, not O(n)
    assert(b.knots.length < 1500, s"summary blew up: ${b.knots.length}")
    // first/last knots survive every compression — min/max exact
    assert(b.knots.head == 0L && b.knots.last == (n - 1).toLong * 3L)
    val sorted = xs.sorted
    // a few compress levels of ε·n/2 each; 5% of n is generous slack
    assert(rankError(b, sorted) <= n / 20, s"rank error ${rankError(b, sorted)}")
  }

  test("merge of disjoint halves ≈ whole; counts add exactly") {
    val a1 = build((0L until 10000L).map(_ * 2L))
    val a2 = build((10000L until 20000L).map(_ * 2L))
    val m = agg.merge(a1, a2)
    assert(m.n == 20000L)
    val sorted = (0L until 20000L).map(_ * 2L).toIndexedSeq
    assert(rankError(m, sorted) <= 20000L / 20L)
    // median of the merged stream sits near the boundary of the halves
    val est = QuantileSketch.query(m.knots, m.ranks, target = 10000L)
    assert(math.abs(est - 19998L) <= 2000L, s"median estimate $est")
  }

  test("merge with empty is identity; empty finish is empty") {
    val b = build(Seq(7L, 7L, 7L))
    val m = agg.merge(b, agg.zero)
    assert(m.knots.toSeq == b.knots.toSeq && m.n == b.n)
    val e = agg.finish(agg.zero)
    assert(e.n == 0L && e.knots.isEmpty)
  }
}
