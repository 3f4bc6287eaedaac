package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FreqSketch
import graft.functions.FreqSketch.Buf

/** Semantics of the mergeable Misra–Gries heavy-hitter sketch — the data
  * structure alone (the e14 operator's measured gate locks the
  * query-level contract against the exact count table).
  */
class FreqSketchSpec extends AnyFunSuite {

  private def agg(k: Int = 16) = new FreqSketch.Agg(capacity = k, pendingCap = 64)

  private def build(xs: Seq[String], a: FreqSketch.Agg): Buf =
    a.finish(xs.foldLeft(a.zero)((b, x) => a.reduce(b, x)))

  private def est(b: Buf, key: String): Long = {
    val i = b.keys.indexOf(key)
    if (i < 0) 0L else b.counts(i)
  }

  private def assertTheorem(b: Buf, xs: Seq[String], k: Int): Unit = {
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val slack = xs.length.toLong / (k + 1)
    (exact.keySet ++ b.keys).foreach { key =>
      val t = exact.getOrElse(key, 0L); val e = est(b, key)
      assert(e <= t, s"overcount for $key: est $e > true $t")
      assert(e >= t - slack, s"undercount past n/(k+1) for $key: est $e, true $t, slack $slack")
    }
  }

  test("distinct ≤ capacity: the summary IS the exact count table, keys sorted") {
    val a = agg(16)
    val xs = Seq("b", "a", "b", "c", "a", "b")
    val b = build(xs, a)
    assert(b.n == 6L)
    assert(b.keys.toSeq == Seq("a", "b", "c"), "canonical sorted keys")
    assert(b.counts.toSeq == Seq(2L, 3L, 1L))
  }

  test("skewed stream with distinct > capacity: ≤ k entries, theorem holds, hitters survive") {
    val k = 8
    val a = agg(k)
    // 3 heavy keys (200 each) + 300 singleton keys, interleaved
    val heavy = (0 until 600).map(i => s"hot${i % 3}")
    val noise = (0 until 300).map(i => s"cold$i")
    val r = new scala.util.Random(11)
    val xs = r.shuffle(heavy ++ noise)
    val b = build(xs, a)
    assert(b.n == 900L)
    assert(b.keys.length <= k, s"summary blew past capacity: ${b.keys.length}")
    assertTheorem(b, xs, k)
    // each hot key's true count (200) exceeds n/(k+1) = 100, so the
    // theorem forces every hitter to survive with a positive estimate
    (0 until 3).foreach(i => assert(est(b, s"hot$i") >= 100L))
  }

  test("merge of disjoint halves: counts add, theorem holds across the merge tree") {
    val k = 8
    val a = agg(k)
    val r = new scala.util.Random(23)
    val xs1 = r.shuffle((0 until 300).map(i => s"x${i % 40}") ++ Seq.fill(150)("star"))
    val xs2 = r.shuffle((0 until 300).map(i => s"y${i % 40}") ++ Seq.fill(150)("star"))
    val m = a.merge(build(xs1, a), build(xs2, a))
    assert(m.n == 900L)
    assert(m.keys.length <= k)
    assertTheorem(m, xs1 ++ xs2, k)
    // "star" is 300 of 900 ≫ n/(k+1) = 100 — must survive the merge
    assert(est(m, "star") >= 200L)
  }

  test("empty and zero identities") {
    val a = agg(4)
    val e = a.finish(a.zero)
    assert(e.n == 0L && e.keys.isEmpty)
    val b = build(Seq("q", "q"), a)
    assert(a.merge(a.zero, b).counts.toSeq == b.counts.toSeq)
    assert(a.merge(b, a.zero).keys.toSeq == b.keys.toSeq)
  }
}
