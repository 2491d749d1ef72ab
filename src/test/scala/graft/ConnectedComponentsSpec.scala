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
}
