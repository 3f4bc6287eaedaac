package graft

import graft.dedup.Dedup

/** Connected-components label propagation: multi-hop chains (forcing
  * several convergence rounds), disjoint components, and the
  * keeper-selection contract (component = min id).
  */
class DedupClusterSpec extends SparkTestBase {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("chain graph needs multiple propagation rounds") {
    // 1-2-3-4-5-6-7-8: diameter 7, min label must travel the whole chain
    val out = cc((1L to 7L).map(i => (i, i + 1)))
    assert(out == (1L to 8L).map(_ -> 1L).toMap)
  }

  test("disjoint components keep separate min-id keepers") {
    val out = cc(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L)))
    assert(out(10L) == 10L && out(11L) == 10L && out(12L) == 10L)
    assert(out(20L) == 20L && out(21L) == 20L)
    assert(out(30L) == 30L && out(31L) == 30L)
  }

  test("star and triangle converge in one round each") {
    val out = cc(Seq((5L, 9L), (5L, 8L), (5L, 7L), (1L, 2L), (2L, 3L), (1L, 3L)))
    assert(out(9L) == 5L && out(8L) == 5L && out(7L) == 5L && out(5L) == 5L)
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
  }
}
