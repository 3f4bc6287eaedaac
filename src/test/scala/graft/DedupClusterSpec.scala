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

  test("adversarial diameter falls back to large/small-star (SoCC'14)") {
    // path graph 0-1-2-...-100: diameter 100 ≫ the 8 propagation rounds;
    // O(diameter) label propagation would need 100 shuffle rounds, the
    // star fallback contracts it in O(log²) rounds
    val out = cc((0L until 100L).map(i => (i, i + 1)))
    assert(out.size == 101)
    assert(out.values.forall(_ == 0L), s"mislabeled: ${out.filter(_._2 != 0L)}")
    // two long chains + an isolated pair stay separate components
    val out2 = cc((0L until 40L).map(i => (i, i + 1)) ++
      (50L until 90L).map(i => (i, i + 1)) ++ Seq((200L, 201L)))
    assert((0L to 40L).forall(out2(_) == 0L))
    assert((50L to 90L).forall(out2(_) == 50L))
    assert(out2(200L) == 200L && out2(201L) == 200L)
  }

  test("largeSmallStar alone labels chains, stars and disjoint components") {
    import org.apache.spark.sql.functions.col
    def star(pairs: Seq[(Long, Long)]): Map[Long, Long] =
      Dedup.largeSmallStar(pairs.toDF("a", "b")
        .select(col("a").as("u"), col("b").as("v")))
        .as[(Long, Long)].collect().toMap
    val chain = star((1L to 9L).map(i => (i, i + 1)))
    assert(chain == (1L to 10L).map(_ -> 1L).toMap)
    val mixed = star(Seq((5L, 9L), (5L, 8L), (20L, 21L), (21L, 22L)))
    assert(mixed(9L) == 5L && mixed(8L) == 5L && mixed(5L) == 5L)
    assert(mixed(20L) == 20L && mixed(21L) == 20L && mixed(22L) == 20L)
  }
}
