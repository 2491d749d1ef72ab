package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.Fixtures

/** g1_pagerank invariants, re-derived independently in memory: the
  * distributed join+agg iteration must equal a sequential replay of the
  * same integer recurrence over the collected edge list, and the floor
  * arithmetic must conserve total mass within the deterministic loss
  * bound (each node floors twice per round: div deg and div 100). */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()
  val sfDir = "/root/testdata/sf0.001"

  private val SCALE = 1000000000000L

  test("g1: distributed iteration equals the sequential integer replay") {
    val pairs = operators.CurationOps.jaccardPairs(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "sf0.001 must yield a non-trivial near-dup graph")
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    val n = deg.size.toLong
    val tele = (15L * (SCALE / n)) / 100L
    var r: Map[Long, Long] = deg.map { case (node, _) => node -> SCALE / n }.toMap
    for (_ <- 1 to operators.GraphOps.ITERS) {
      val contrib = edges
        .map { case (u, v) => v -> (85L * (r(u) / deg(u))) / 100L }
        .groupBy(_._1).map { case (v, cs) => v -> cs.map(_._2).sum }
      r = contrib.map { case (v, c) => v -> (tele + c) }.toMap
    }
    val got = SparkEntry.queries("g1_pagerank")(spark, sfDir).collect()
      .map(row => row.getLong(0) -> (row.getLong(1), row.getLong(2))).toMap
    assert(got.keySet == r.keySet, "node set = every endpoint of the pair graph")
    got.foreach { case (node, (rank, d)) =>
      assert(rank == r(node), s"node $node: distributed $rank != replay ${r(node)}")
      assert(d == deg(node), s"node $node degree")
    }
  }

  test("g1: mass is conserved within the deterministic floor loss") {
    val out = SparkEntry.queries("g1_pagerank")(spark, sfDir).collect()
    val n = out.length.toLong
    val total = out.map(_.getLong(1)).sum
    // Upper bound: floors only lose mass, never add.
    assert(total <= SCALE, s"total $total exceeds the initial mass")
    // Lower bound: per round each node loses < deg(u) from the div-deg
    // floor (spread over its edges), < 100 from the div-100 floor, and the
    // teleport floor loses < 100 + n once — so after k rounds total mass
    // is within k * (sum(deg) + 100n) + 100 + n of SCALE. Loose but
    // deterministic; catches a dropped node or a lost contribution.
    val sumDeg = out.map(_.getLong(2)).sum
    val bound = operators.GraphOps.ITERS * (sumDeg + 100L * n) + 100L + n
    assert(total >= SCALE - bound, s"total $total lost more than $bound")
    // Ordering contract: rank desc, doc_id asc.
    val ord = out.map(r => (-r.getLong(1), r.getLong(0))).toSeq
    assert(ord == ord.sorted, "output ordered by (rank desc, doc_id)")
  }

  test("g5: fixed-round peel reaches the true 2-core fixpoint on this corpus") {
    val row = SparkEntry.queries("g5_kcore")(spark, sfDir).collect().head
    // sequential peel to FIXPOINT over the same pair graph
    val pairs = graft.operators.CurationOps.jaccardPairs(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = (pairs ++ pairs.map(p => (p._2, p._1))).toSet
    var changed = true
    var rounds = 0
    while (changed) {
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= graft.operators.GraphOps.KCORE_K).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != edges.size
      edges = next
      rounds += 1
    }
    assert(rounds <= graft.operators.GraphOps.KCORE_ROUNDS,
      s"fixpoint after $rounds rounds must fit the fixed budget")
    val nodes = edges.map(_._1)
    assert(row.getLong(0) == nodes.size, "core nodes")
    assert(row.getLong(1) == edges.size / 2, "core edges")
    val maxDeg = if (edges.isEmpty) 0L
      else edges.groupBy(_._1).values.map(_.size).max.toLong
    assert(row.getLong(2) == maxDeg, "max core degree")
    // every surviving node really has degree >= k
    edges.groupBy(_._1).values.foreach(g =>
      assert(g.size >= graft.operators.GraphOps.KCORE_K))
  }
}
