package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.Fixtures

/** Round-8 relevance & robustness pack invariants, re-derived independently
  * in memory from the raw parquet at sf0.001 (the crosscheck gate proves
  * DuckDB equivalence; these prove the SEMANTICS — the distributed plan
  * equals a sequential replay of the operator's definition). */
class RelevanceOpsSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()
  val sfDir = "/root/testdata/sf0.001"

  private lazy val vecs: Map[Long, Array[Long]] =
    Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map { r =>
        r.getLong(0) -> r.getSeq[Float](1).map(v =>
          math.floor(v.toDouble * 1e6 + 0.5).toLong).toArray
      }.toMap

  private lazy val labels: Map[Long, Int] =
    Tables.embeddings(spark, sfDir).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  /** Sequential replay of the exact-integer 5-NN: directed edges. */
  private lazy val knnReplay: Set[(Long, Long)] = {
    val ids = vecs.keys.toArray.sorted
    ids.flatMap { src =>
      val scored = ids.filter(_ != src).map { dst =>
        val a = vecs(src); val b = vecs(dst)
        var dot = 0L; var i = 0
        while (i < a.length) { dot += a(i) * b(i); i += 1 }
        (dst, dot)
      }
      scored.sortBy { case (dst, dot) => (-dot, dst) }.take(5)
        .map { case (dst, _) => (src, dst) }
    }.toSet
  }

  private lazy val mutualReplay: Set[(Long, Long)] =
    knnReplay.filter { case (s, d) => knnReplay.contains((d, s)) }

  test("sim10: mutual-kNN census equals the sequential integer replay") {
    val got = SparkEntry.queries("sim10_knn_graph")(spark, sfDir).collect()
    val byLabel = mutualReplay.toSeq.groupBy { case (s, _) => labels(s) }
    assert(got.nonEmpty)
    got.foreach { r =>
      val l = r.getInt(0)
      val edges = byLabel(l)
      assert(r.getLong(2) == edges.size.toLong, s"label $l mutual_edges")
      assert(r.getLong(3) ==
        edges.count { case (_, d) => labels(d) == l }.toLong,
        s"label $l within_label")
      assert(r.getLong(1) == labels.values.count(_ == l).toLong, s"label $l n_nodes")
    }
  }

  test("sim13: propagated labels equal the sequential majority-vote replay") {
    val got = SparkEntry.queries("sim13_label_spread")(spark, sfDir).collect()
    assert(got.nonEmpty, "no held-out vectors received votes")
    // replay: per held-out src, majority label over seed-labeled mutual
    // neighbors, ties to the smaller label
    val expect = mutualReplay.toSeq
      .filter { case (s, d) => s % 5 == 0 && d % 5 != 0 }
      .groupBy(_._1)
      .map { case (src, es) =>
        val byLabel = es.groupBy { case (_, d) => labels(d) }
          .map { case (l, g) => (l, g.size) }
        val (predL, n) = byLabel.toSeq.minBy { case (l, c) => (-c, l) }
        src -> (predL, n.toLong, es.size.toLong)
      }
    assert(got.length == expect.size, "one row per voted held-out vector")
    got.foreach { r =>
      val v = r.getLong(0)
      val (predL, n, tot) = expect(v)
      assert(r.getInt(1) == predL, s"vec $v pred_label")
      assert(r.getLong(2) == n, s"vec $v n_votes")
      assert(r.getLong(3) == tot, s"vec $v total_votes")
      assert(r.getInt(4) == labels(v), s"vec $v true_label")
      assert(r.getBoolean(5) == (predL == labels(v)), s"vec $v correct flag")
    }
  }

  test("g6: candidates are non-adjacent, cn counts match the replay") {
    val rows = SparkEntry.queries("g6_link_prediction")(spark, sfDir).collect()
    assert(rows.nonEmpty, "sf0.001 mutual-kNN graph must yield wedge candidates")
    val nbrs = mutualReplay.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    rows.foreach { r =>
      val (a, b, cn) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(a < b, "canonical pair orientation")
      assert(!mutualReplay.contains((a, b)), s"($a,$b) is an existing edge")
      val expect = (nbrs(a) & nbrs(b)).size.toLong
      assert(cn == expect, s"($a,$b): cn $cn != replay $expect")
      assert(r.getLong(3) == nbrs(a).size.toLong && r.getLong(4) == nbrs(b).size.toLong,
        s"($a,$b) degrees")
    }
    // Ranking contract: (cn desc, jaccard desc, ids) over ALL candidates —
    // verify the reported top matches the replay's best score.
    val allCand = (for {
      (a, na) <- nbrs; (b, nb) <- nbrs
      if a < b && !mutualReplay.contains((a, b))
      cn = (na & nb).size if cn > 0
    } yield (cn, cn.toDouble / (na.size + nb.size - cn), a, b)).toSeq
    val best = allCand.maxBy { case (cn, j, a, b) => (cn, j, -a, -b) }
    assert((rows.head.getLong(0), rows.head.getLong(1)) == (best._3, best._4) ||
      rows.head.getLong(2) == best._1.toLong, "top candidate matches replay")
  }

  test("ir1: BM25 scores equal the sequential replay, top-20 is global") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val q = Seq("hash", "join", "vector")
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length).sum.toDouble / n
    val df = q.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    def score(ts: Seq[String]): Double = {
      val dl = ts.length.toDouble
      q.map { t =>
        val tf = ts.count(_ == t).toDouble
        val idf = (n - df(t) + 0.5) / (df(t) + 0.5)
        idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.sum
    }
    val expected = docs.filter { case (_, ts) => q.exists(ts.contains) }
      .map { case (id, ts) => (id, score(ts)) }
      .sortBy { case (id, sc) => (-sc, id) }.take(20)
    val got = SparkEntry.queries("ir1_bm25_topk")(spark, sfDir).collect()
    assert(got.length == expected.length.min(20))
    got.zip(expected).foreach { case (r, (id, sc)) =>
      assert(r.getLong(0) == id, s"rank order: got ${r.getLong(0)} want $id")
      assert(math.abs(r.getDouble(5) - sc) < 1e-5,
        s"doc $id score ${r.getDouble(5)} != $sc")
    }
  }

  test("ir2: expansion terms exclude the query and score by fb_tf x idf") {
    val out = SparkEntry.queries("ir2_prf_expansion")(spark, sfDir).collect()
    assert(out.length == 10)
    val q = Set("hash", "join", "vector")
    out.foreach { r =>
      assert(!q(r.getString(0)), s"query term ${r.getString(0)} must not expand itself")
      val n = 500.0
      val idf = (n - r.getLong(2) + 0.5) / (r.getLong(2) + 0.5)
      assert(math.abs(r.getDouble(3) - r.getLong(1) * idf) < 1e-4,
        s"${r.getString(0)} score recomputes from its own row")
    }
    // Ranking: descending score with term tiebreak.
    val scores = out.map(_.getDouble(3)).toSeq
    assert(scores == scores.sortBy(-_), "descending expansion scores")
  }

  test("sa14: randomized response is deterministic and mass-conserving") {
    val out = SparkEntry.queries("sa14_randomized_response")(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("de", "en", "es", "fr", "zh"))
    val nTrue = out.map(_.getLong(1)).sum
    val nRep = out.map(_.getLong(2)).sum
    assert(nTrue == nRep, "privatization permutes labels, never drops rows")
    out.foreach { r =>
      val est = (r.getLong(2).toDouble - nTrue * 0.05) / 0.75
      assert(math.abs(r.getDouble(3) - est) < 1e-3, s"${r.getString(0)} estimator")
      // The debiased estimate must be closer to truth than the raw
      // released count whenever the label deviates from uniform share.
      val raw = r.getLong(2).toDouble
      val truth = r.getLong(1).toDouble
      if (math.abs(truth - nTrue / 5.0) > 30)
        assert(math.abs(est - truth) < math.abs(raw - truth),
          s"${r.getString(0)}: debias must help on skewed labels")
    }
    val again = SparkEntry.queries("sa14_randomized_response")(spark, sfDir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq, "deterministic")
  }

  test("emb4: exact-integer outlier census equals the double replay") {
    val got = SparkEntry.queries("emb4_standardize")(spark, sfDir).collect()
    assert(got.length == 64)
    val byDim = Array.fill(64)(collection.mutable.ArrayBuffer[Long]())
    vecs.values.foreach(a => a.indices.foreach(i => byDim(i) += a(i)))
    got.foreach { r =>
      val dim = r.getInt(0)
      val xs = byDim(dim)
      val n = xs.length
      assert(r.getLong(1) == n.toLong)
      val s6 = xs.sum
      val mean = s6.toDouble / n / 1e6
      assert(math.abs(r.getDouble(2) - mean) < 1e-5, s"dim $dim mean")
      // Replay the fence in BigInt (the operator's exact-integer claim).
      val s66 = xs.map(x => BigInt(x) * x).sum
      val outliers = xs.count { x =>
        val lhs = BigInt(n.toLong * x - s6).pow(2) * (n - 1)
        val rhs = BigInt(4) * n * (BigInt(n) * s66 - BigInt(s6).pow(2))
        lhs > rhs
      }
      assert(r.getLong(4) == outliers.toLong, s"dim $dim outlier census")
      // Chebyshev sanity: |z| > 2 can hold for at most n/4 points.
      assert(r.getLong(4) <= n / 4, s"dim $dim Chebyshev bound")
    }
  }

  test("emb5: prefix-dot recall equals the sequential replay") {
    def top5(p: Int): Set[(Long, Long)] = {
      val ids = vecs.keys.toArray.sorted
      ids.flatMap { src =>
        ids.filter(_ != src).map { dst =>
          val a = vecs(src); val b = vecs(dst)
          var dot = 0L; var i = 0
          while (i < p) { dot += a(i) * b(i); i += 1 }
          (dst, dot)
        }.sortBy { case (dst, dot) => (-dot, dst) }.take(5)
          .map { case (dst, _) => (src, dst) }
      }.toSet
    }
    val full = top5(64)
    val got = SparkEntry.queries("emb5_matryoshka_eval")(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(8L, 16L, 32L))
    got.foreach { r =>
      val p = r.getLong(0).toInt
      val kept = (top5(p) & full).size.toLong
      assert(r.getLong(2) == kept, s"prefix $p n_kept ${r.getLong(2)} != $kept")
      assert(r.getLong(1) == vecs.size.toLong)
    }
    // More dimensions must not lose recall on this corpus (8 -> 32 spans
    // a 4x information gap; a reversal means the slice/ranking is wrong).
    assert(got(0).getLong(2) <= got(2).getLong(2), "recall grows 8 -> 32")
  }

  test("sa15: tempered shares renormalize and boost the tail") {
    val out = SparkEntry.queries("sa15_temperature_mixture")(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("de", "en", "es", "fr", "zh"))
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-4, "raw shares sum to 1")
    assert(math.abs(out.map(_.getDouble(4)).sum - 1.0) < 1e-4, "temp shares sum to 1")
    val byLang = out.map(r => r.getString(0) -> r).toMap
    val maxLang = out.maxBy(_.getLong(2)).getString(0)
    assert(byLang(maxLang).getDouble(5) < 1.0, "head lang is downweighted")
    val minLang = out.minBy(_.getLong(2)).getString(0)
    assert(byLang(minLang).getDouble(5) > 1.0, "tail lang is boosted")
    // alpha = 0.5 ordering: tempered share order preserves raw order.
    val rawOrd = out.sortBy(_.getDouble(3)).map(_.getString(0)).toSeq
    val tmpOrd = out.sortBy(_.getDouble(4)).map(_.getString(0)).toSeq
    assert(rawOrd == tmpOrd, "temperature preserves share ranking")
  }

  test("emb6: packed-sign Hamming recall equals the sequential replay") {
    // Signs from the RAW floats (the operator binarizes pre-scaling; the
    // 1e6-scaled ints would flip coordinates in (0, 5e-7] to zero).
    val raw = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_ > 0f).toArray).toMap
    val ids = raw.keys.toArray.sorted
    def hd(a: Array[Boolean], b: Array[Boolean]) = a.zip(b).count(p => p._1 != p._2)
    val hamTop = ids.flatMap { src =>
      ids.filter(_ != src).map(dst => (dst, hd(raw(src), raw(dst))))
        .sortBy { case (dst, h) => (h, dst) }.take(5)
        .map { case (dst, _) => (src, dst) }
    }.toSet
    val kept = (hamTop & knnReplay).size.toLong
    val r = SparkEntry.queries("emb6_binary_retrieval")(spark, sfDir).collect().head
    assert(r.getLong(0) == 64L && r.getLong(4) == 32L)
    assert(r.getLong(1) == ids.length.toLong)
    assert(r.getLong(2) == kept, s"n_kept ${r.getLong(2)} != replay $kept")
    // 1-bit codes lose information: recall must be strictly below 1 on
    // real-valued vectors, but far above the ~5/n random-overlap floor.
    assert(r.getDouble(3) > 0.05 && r.getDouble(3) < 1.0)
  }

  test("g9: BFS layers equal the sequential replay") {
    val nbrs = mutualReplay.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    var dist = vecs.keys.map(v => v -> (if (v % 100 == 0) Some(0) else None)).toMap
    for (_ <- 1 to 4) {
      dist = dist.map { case (v, dv) =>
        val viaNb = nbrs.getOrElse(v, Set.empty)
          .flatMap(u => dist(u).map(_ + 1))
        // Pregel as implemented pushes along src->dst; since mutual edges
        // carry both orientations, pull-from-neighbors is equivalent.
        val best = (dv.toSeq ++ viaNb).sorted.headOption
        v -> best
      }
    }
    val expect = dist.values.map(_.getOrElse(-1)).groupBy(identity)
      .map { case (l, g) => l.toLong -> g.size.toLong }
    val got = SparkEntry.queries("g9_bfs_layers")(spark, sfDir).collect()
    assert(got.map(r => r.getLong(0) -> r.getLong(1)).toMap == expect)
    // The checksum pins membership, not just counts.
    val byLevel = dist.toSeq.groupBy(_._2.getOrElse(-1))
      .map { case (l, g) => l.toLong -> g.map(_._1).sum }
    got.foreach(r => assert(r.getLong(2) == byLevel(r.getLong(0)), s"level ${r.getLong(0)}"))
  }

  test("sim11: greedy MMR selection equals the sequential replay") {
    val qid = vecs.keys.min
    def dot(a: Long, b: Long): Long = {
      val x = vecs(a); val y = vecs(b)
      var s = 0L; var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }
      s
    }
    val rel = vecs.keys.filter(_ != qid).map(v => v -> dot(qid, v)).toMap
    var sel = Vector.empty[(Long, Long, Long)] // (v, rel, mmr)
    for (_ <- 1 to 5) {
      val chosen = sel.map(_._1).toSet
      val best = rel.filterNot { case (v, _) => chosen(v) }
        .map { case (v, r) =>
          val ms = if (chosen.isEmpty) 0L else chosen.map(s => dot(v, s)).max
          (v, r, r - ms)
        }
        .minBy { case (v, _, mmr) => (-mmr, v) }
      sel :+= best
    }
    val got = SparkEntry.queries("sim11_mmr_select")(spark, sfDir).collect()
    assert(got.length == 5)
    got.zip(sel).zipWithIndex.foreach { case ((r, (v, rl, mmr)), i) =>
      assert(r.getLong(0) == i + 1L)
      assert(r.getLong(1) == v, s"rank ${i + 1}: picked ${r.getLong(1)}, replay $v")
      assert(r.getLong(2) == rl && r.getLong(3) == mmr, s"rank ${i + 1} scores")
    }
    // NOTE: margins are NOT monotone in rank — max-sim to the selected set
    // can be NEGATIVE (anti-correlated vectors), which RAISES a later
    // margin above an earlier pure-relevance pick. The replay equality
    // above is the correctness property; monotonicity would be wrong.
  }

  test("f28: credit is conserved — one unit per touched conversion") {
    val out = SparkEntry.queries("f28_attribution")(spark, sfDir).collect()
    val types = out.map(_.getString(0)).toSet
    assert(types.subsetOf(Set("view", "click", "(direct)")))
    val touched = out.filter(_.getString(0) != "(direct)")
    val direct = out.find(_.getString(0) == "(direct)").get
    // Linear attribution conserves mass: summed credit over channels =
    // number of touched conversions (each splits exactly one unit).
    val nConvTouched = Tables.events(spark, sfDir)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS t")
      .collect().groupBy(_.getLong(1)).values.flatMap { g =>
        val touches = g.filter(r => Set("view", "click")(r.getString(2))).map(_.getLong(3))
        g.filter(_.getString(2) == "purchase").map { c =>
          val t = c.getLong(3)
          touches.count(tt => tt <= t && tt > t - 86400000000L) > 0
        }
      }.toSeq
    assert(math.abs(touched.map(_.getDouble(3)).sum -
      nConvTouched.count(identity).toDouble) < 0.01, "credit mass")
    assert(direct.getLong(1) == nConvTouched.count(!_).toLong, "(direct) count")
  }

  test("g8: conductance census is consistent with the mutual graph") {
    val out = SparkEntry.queries("g8_conductance")(spark, sfDir).collect()
    val byLabel = mutualReplay.toSeq.groupBy { case (s, _) => labels(s) }
    out.foreach { r =>
      val l = r.getInt(0)
      val es = byLabel(l)
      assert(r.getLong(1) == es.size.toLong, s"label $l vol")
      assert(r.getLong(2) == es.count { case (_, d) => labels(d) != l }.toLong,
        s"label $l cut")
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.000001, s"label $l range")
    }
    // Cut edges are symmetric in aggregate: total cut counted from src
    // labels equals total cross-label edges counted from dst labels.
    val totalCut = out.map(_.getLong(2)).sum
    assert(totalCut == mutualReplay.count { case (s, d) => labels(s) != labels(d) })
  }

  test("ts7: pair counts and slope bounds against the raw events") {
    val rows = SparkEntry.queries("ts7_theil_sen")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val days = Tables.events(spark, sfDir)
      .selectExpr("event_type", "CAST(ts AS DATE) AS day").distinct().collect()
      .groupBy(_.getString(0)).map { case (k, v) => k -> v.length.toLong }
    rows.foreach { r =>
      val et = r.getString(0)
      val nd = days(et)
      assert(r.getLong(1) == nd * (nd - 1) / 2, s"$et n_pairs = C(days, 2)")
      assert(r.getLong(3) + r.getLong(4) <= r.getLong(1), s"$et sign census")
      // Sign consistency: a majority-up slope census forces a positive
      // discrete median (and symmetrically for down).
      if (r.getLong(3) > r.getLong(1) / 2)
        assert(r.getDouble(2) > 0, s"$et majority-up implies positive median")
      if (r.getLong(4) > r.getLong(1) / 2)
        assert(r.getDouble(2) < 0, s"$et majority-down implies negative median")
    }
  }

  test("ir3: rerank is a permutation of ir1's candidates with a consistent pair census") {
    val ir1 = SparkEntry.queries("ir1_bm25_topk")(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val rows = SparkEntry.queries("ir3_rerank")(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).toSet == ir1,
      "stage 2 reorders exactly the stage-1 candidate set")
    val n = rows.length
    assert(rows.map(r => r.getInt(3)).sorted.toSeq == (1 to n),
      "rerank ranks are a permutation of 1..k")
    assert(rows.map(r => r.getInt(2)).sorted.toSeq == (1 to n),
      "bm25 ranks are a permutation of 1..k")
    assert(rows.map(r => r.getInt(4)).sum == 0, "rank deltas cancel")
    // pair census recomputed from the emitted ranks
    val rk = rows.map(r => (r.getLong(1), r.getInt(2), r.getInt(3)))
    val pairs = for {
      (ida, ba, ra) <- rk; (idb, bb, rb) <- rk if ida < idb
    } yield (ba - bb) * (ra - rb)
    assert(rows.head.getLong(6) == pairs.count(_ > 0).toLong, "concordant")
    assert(rows.head.getLong(7) == pairs.count(_ < 0).toLong, "discordant")
  }
}
