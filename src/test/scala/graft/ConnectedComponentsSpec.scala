package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.Fixtures

/** dd7's min-label propagation against hand-checkable graphs — in
  * particular a long path graph, which needs ~diameter rounds and catches
  * any early-exit bug the (shallow) LSH pair graphs would never hit. */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    ops.DedupOps.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("chain, triangle, isolated pair, and bridge merge correctly") {
    val result = cc(Seq(
      (1L, 2L), (2L, 3L),           // path 1-2-3
      (10L, 11L),                   // isolated pair
      (20L, 21L), (21L, 22L), (20L, 22L), // triangle
      (3L, 20L)))                   // bridge merges path + triangle
    assert(result(1L) == (1L, 6L) && result(22L) == (1L, 6L))
    assert(result(10L) == (10L, 2L) && result(11L) == (10L, 2L))
    assert(result.size == 8)
  }

  test("long path needs many propagation rounds and still converges") {
    // Path 100-101-...-120 with the MIN at the far end: label 100 must walk
    // the full diameter (20 hops) to reach node 120.
    val path = (100L until 120L).map(i => (i, i + 1))
    val result = cc(path)
    assert(result.values.forall { case (cid, n) => cid == 100L && n == 21L })
  }

  test("duplicate and self-referencing edges are harmless") {
    val result = cc(Seq((5L, 6L), (5L, 6L), (6L, 5L), (7L, 7L)))
    assert(result(5L) == (5L, 2L) && result(6L) == (5L, 2L))
    assert(result(7L) == (7L, 1L))
  }

  private def ccStar(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    ops.DedupOps.ccTwoStar(pairs.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("two-star contraction agrees with label propagation on every fixture graph") {
    val graphs = Seq(
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
        (20L, 22L), (3L, 20L)),
      (100L until 120L).map(i => (i, i + 1)),          // 20-hop path
      Seq((5L, 6L), (5L, 6L), (6L, 5L), (7L, 7L)),
      // two stars joined at the tips + a far singleton pair
      (1L to 5L).map(i => (0L, i)) ++ (11L to 15L).map(i => (10L, i)) ++
        Seq((5L, 15L), (40L, 41L)))
    graphs.foreach { g =>
      assert(ccStar(g) == cc(g), s"two-star diverged on $g")
    }
  }

  private def ccBounded(pairs: Seq[(Long, Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    ops.DedupOps.boundedComponents(pairs.toDF("cell", "doc_a", "doc_b"), "cell")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("bounded per-group union-find agrees with label propagation when edges stay in-group") {
    // Same fixture graphs, each assigned a group id such that no edge
    // crosses groups (the dd26 precondition: pairs exist only within a
    // k-means cell). Components, labels, and sizes must be identical to
    // the global iterative result.
    val grouped = Seq(
      // path+triangle+bridge all share one component → one group; the
      // isolated pair gets its own
      Seq((1L, 1L, 2L), (1L, 2L, 3L), (2L, 10L, 11L), (1L, 20L, 21L),
        (1L, 21L, 22L), (1L, 20L, 22L), (1L, 3L, 20L)),
      // 20-hop path in one group
      (100L until 120L).map(i => (7L, i, i + 1)),
      // duplicate/self edges
      Seq((1L, 5L, 6L), (1L, 5L, 6L), (1L, 6L, 5L), (2L, 7L, 7L)))
    grouped.foreach { g =>
      val flat = g.map { case (_, a, b) => (a, b) }
      assert(ccBounded(g) == cc(flat), s"boundedComponents diverged on $g")
    }
  }

  test("two-star converges on a path far deeper than its round budget allows propagation") {
    // 60-hop path: min-label propagation needs ~60 rounds (dd7 caps at
    // 50 and is never given such graphs); two-star's alternation closes
    // it within its 25-round cap — the O(log n) claim, exercised.
    val path = (200L until 260L).map(i => (i, i + 1))
    val result = ccStar(path)
    assert(result.values.forall { case (cid, n) => cid == 200L && n == 61L })
  }
}
