package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.Fixtures

/** Approximate-search quality: both scale paths (LSH buckets, IVF cells)
  * must recover a reasonable fraction of the exact top-k neighbors. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()
  val sfDir = "/root/testdata/sf0.001"

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH ANN recall vs exact top-k") {
    val exact = pairs("sim1_cosine_topk")
    val lsh = pairs("sim2_lsh_ann")
    assert(lsh.subsetOf(exact.union(lsh))) // sanity: well-formed
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.2, s"LSH recall $recall too low")
  }

  test("LSH near-dup is a subset of the exact near-dup pairs (perfect precision)") {
    def dupPairs(name: String): Set[(Long, Long)] =
      SparkEntry.queries(name)(spark, sfDir)
        .select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = dupPairs("dd6_embedding_neardup")
    val lsh = dupPairs("dd8_neardup_lsh")
    assert(lsh.nonEmpty, "bucketed near-dup found nothing")
    // filter-verify: every emitted pair passed the exact cosine threshold,
    // so precision is 1.0 by construction; only recall is approximate.
    assert(lsh.subsetOf(exact), s"false positives: ${lsh diff exact}")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.2, s"near-dup recall $recall too low")
  }

  test("IVF ANN recall vs exact top-k") {
    val exact = pairs("sim1_cosine_topk")
    val ivf = pairs("sim3_ivf_ann")
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.2, s"IVF recall $recall too low")
    // every returned neighbor must carry a valid similarity
    val bad = SparkEntry.queries("sim3_ivf_ann")(spark, sfDir)
      .filter(col("sim").isNull || col("sim") > 1.0001 || col("sim") < -1.0001)
    assert(bad.count() == 0)
  }

  test("trained-quantizer IVF (sim12) recalls at least as a usable index") {
    val exact = pairs("sim1_cosine_topk")
    val trained = pairs("sim12_ivf_trained")
    val rTrained = (exact & trained).size.toDouble / exact.size
    val rSeed = (exact & pairs("sim3_ivf_ann")).size.toDouble / exact.size
    assert(rTrained >= 0.2, s"trained-IVF recall $rTrained too low")
    // training centers the cells on corpus density; on this corpus the
    // trained codebook must not LOSE recall vs the raw seed anchors
    // (equality allowed — one Lloyd round can leave assignments fixed).
    assert(rTrained >= rSeed - 1e-9,
      s"trained recall $rTrained below seeded recall $rSeed")
  }

  test("dd26: every semantic-dup group keeps exactly its farthest-from-centroid member") {
    val rows = SparkEntry.queries("dd26_semdedup")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, ms) =>
      assert(ms.count(_._5) == 1, s"cluster $cid must keep exactly one member")
      assert(ms.forall(_._3 == ms.length.toLong), s"cluster $cid n_members")
      val kept = ms.find(_._5).get
      // the paper's rule: representative = max centroid distance, ties -> min id
      val best = ms.maxBy(m => (m._4, -m._1))
      assert(kept._1 == best._1, s"cluster $cid kept ${kept._1} not ${best._1}")
    }
    // singletons keep themselves
    assert(rows.filter(_._3 == 1L).forall(_._5))
  }

  test("sim5: distributed recall@k agrees with the set-intersection recall") {
    val exact = pairs("sim1_cosine_topk")
    val ann = pairs("sim2_lsh_ann")
    val got = SparkEntry.queries("sim5_recall_at_k")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getDouble(4))))
      .toMap
    got.foreach { case (q, (nExact, nHits, recall)) =>
      val e = exact.filter(_._1 == q).map(_._2)
      val a = ann.filter(_._1 == q).map(_._2)
      assert(nExact == e.size.toLong, s"query $q n_exact")
      assert(nHits == (e & a).size.toLong, s"query $q n_hits")
      assert(recall == nHits.toDouble / 5 && recall >= 0.0 && recall <= 1.0)
    }
    // the panel mean must clear the same sanity floor as the pairwise tests
    val mean = got.values.map(_._3).sum / got.size
    assert(mean >= 0.2, s"mean recall $mean too low")
  }

  test("sim6: negatives are cross-label and are the hardest available") {
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v",
        "label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (dp, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = vecs.map(v => v._1 -> v).toMap
    val got = SparkEntry.queries("sim6_hard_negatives")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length == 5, s"query $q row count")
      rows.foreach { case (_, ql, n, nl) =>
        assert(ql == byId(q)._3 && nl == byId(n)._3 && ql != nl,
          s"query $q neighbor $n label leak")
      }
      // hardness: the chosen set IS the brute-force top-5 among cross-label
      val (_, qv, ql) = byId(q)
      val expected = vecs.filter(v => v._3 != ql)
        .map(v => (v._1, cos(qv, v._2)))
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
      assert(rows.map(_._3).toSet == expected, s"query $q not the hardest set")
    }
  }

  test("sim8: nDCG is 1 exactly when the ANN list equals the exact list in order") {
    val ndcg = SparkEntry.queries("sim8_ndcg")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = SparkEntry.queries("sim1_cosine_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (-t._3, t._2)).map(_._2).toSeq).toMap
    val ann = SparkEntry.queries("sim2_lsh_ann")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (-t._3, t._2)).map(_._2).toSeq).toMap
    val disc = Seq(1000000L, 630930L, 500000L, 430677L, 386853L)
    val idcg = 10271927L
    ndcg.foreach { case (q, (dcg6, nd)) =>
      val ex = exact(q)
      val an = ann.getOrElse(q, Seq.empty)
      val expectDcg = an.zipWithIndex.map { case (nbr, i) =>
        val rel = ex.indexOf(nbr) match { case -1 => 0L; case r => 5L - r }
        rel * disc(i)
      }.sum
      assert(dcg6 == expectDcg, s"query $q dcg")
      assert(math.abs(nd - expectDcg.toDouble / idcg) < 1e-5, s"query $q ndcg")
      assert(nd >= 0.0 && nd <= 1.0)
      if (an == ex) assert(math.abs(nd - 1.0) < 1e-9, "perfect list scores 1")
    }
    assert(ndcg.nonEmpty)
  }

  test("sim9: integer MIPS top-k equals a driver-side exact dot-product replay") {
    val out = SparkEntry.queries("sim9_mips_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray)
    val byId = vecs.toMap
    for (q <- vecs.map(_._1).filter(_ < 10)) {
      val qv = byId(q)
      val expect = vecs.filter(_._1 != q)
        .map { case (id, v) => (id, qv.zip(v).map { case (a, b) => a * b }.sum) }
        .sortBy { case (id, dp) => (-dp, id) }.take(5)
      val got = out(q).sortBy(t => (-t._3, t._2)).map(t => (t._2, t._3)).toSeq
      assert(got == expect.toSeq, s"query $q MIPS top-5")
    }
  }

  test("emb8: mined triples respect the margin bands and stay in-cell") {
    val rows = SparkEntry.queries("emb8_contrastive_mining")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty, "no contrastive triples mined")
    rows.foreach { r =>
      val (a, p, ps, n, ns) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(ps >= 0.35, s"anchor $a positive_sim $ps below band")
      assert(ns < 0.2, s"anchor $a negative_sim $ns inside margin")
      assert(p != n && p != a && n != a, s"anchor $a degenerate triple")
      assert(ps > ns, s"anchor $a margin inverted")
    }
    // every participant of a triple shares the anchor's trained cell
    val cells = graft.operators.StatOps.lloydAssign(
        graft.operators.StatOps.intGrid(spark, sfDir),
        graft.operators.StatOps.trainedCentroids(spark, sfDir))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    rows.foreach { r =>
      val (a, p, n) = (r.getLong(0), r.getLong(1), r.getLong(3))
      assert(cells(a) == cells(p) && cells(a) == cells(n),
        s"triple for anchor $a crosses cells")
    }
  }

  test("tx25: cluster topic terms come from member documents and rank " +
    "by the c-TF-IDF order") {
    val rows = SparkEntry.queries("tx25_cluster_terms")(spark, sfDir)
      .collect()
      .map(r => (r.get(0).toString.toLong, r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty, "no cluster terms emitted")
    // per cell: ranks are exactly 1..k (k ≤ 3), scores non-increasing,
    // ties broken by term ascending
    rows.groupBy(_._1).foreach { case (cell, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"cell $cell rank gap")
      sorted.sliding(2).foreach {
        case Array((_, _, t1, _, s1), (_, _, t2, _, s2)) =>
          assert(s1 > s2 || (s1 == s2 && t1 < t2),
            s"cell $cell order violated: ($t1,$s1) before ($t2,$s2)")
        case _ =>
      }
    }
    // every labeled term occurs, with the claimed frequency, in the
    // cell's member documents
    val cells = graft.operators.StatOps.lloydAssign(
        graft.operators.StatOps.intGrid(spark, sfDir),
        graft.operators.StatOps.trainedCentroids(spark, sfDir))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.get(1).toString.toLong).toMap
    val docTerms = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z]+").filter(_.length >= 3))
      .toMap
    rows.foreach { case (cell, _, term, ctf, _) =>
      val freq = docTerms.collect {
        case (id, ts) if cells.get(id).contains(cell) => ts.count(_ == term)
      }.sum
      assert(freq == ctf, s"cell $cell term '$term': claimed $ctf, found $freq")
    }
  }
}
