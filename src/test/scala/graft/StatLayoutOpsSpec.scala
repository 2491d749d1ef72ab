package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.Fixtures

/** In-memory re-derivations of the statistical-profiling (StatOps), layout
  * (LayoutOps), and triangle (GraphOps.g3) operators at sf0.001 — every
  * property here is scale-free, so the check on 50-document data covers
  * the semantics at any SF; the driver's DuckDB hash gate covers the
  * cross-engine representation. */
class StatLayoutOpsSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()
  val sfDir = "/root/testdata/sf0.001"

  test("f20: Pearson r matches a direct double-precision recomputation") {
    val out = SparkEntry.queries("f20_pearson_corr")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), math.round(r.getDouble(3) * 100).toDouble)))
      .groupBy(_._1)
    out.foreach { r =>
      val xs = rows((r.getString(0), r.getString(1))).map(_._2)
      val n = xs.length.toDouble
      val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
      val sxy = xs.map(p => p._1 * p._2).sum
      val sxx = xs.map(p => p._1 * p._1).sum
      val syy = xs.map(p => p._2 * p._2).sum
      val expect = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      assert(math.abs(r.getDouble(3) - expect) < 1e-5,
        s"group ${r.getString(0)}/${r.getString(1)}")
      assert(r.getDouble(3).abs <= 1.0, "corr in [-1, 1]")
    }
  }

  test("ts4: OLS slope/intercept match the normal equations on the daily rollup") {
    val out = SparkEntry.queries("ts4_ols_trend")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val daily = Tables.orders(spark, sfDir)
      .selectExpr("o_orderpriority",
        "CAST(datediff(to_date(o_orderdate), '1992-01-01') AS LONG) AS x",
        "o_totalprice").collect()
      .map(r => ((r.getString(0), r.getLong(1)), math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).map { case ((p, x), xs) => (p, x.toDouble, xs.map(_._2).sum.toDouble) }
      .toSeq.groupBy(_._1)
    out.foreach { r =>
      val pts = daily(r.getString(0))
      val n = pts.length.toDouble
      val sx = pts.map(_._2).sum; val sy = pts.map(_._3).sum
      val sxy = pts.map(p => p._2 * p._3).sum
      val sxx = pts.map(p => p._2 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getDouble(2) - slope / 100.0) < 1e-5, "slope")
      assert(math.abs(r.getDouble(3) - ((sy - slope * sx) / n) / 100.0) < 1e-3, "intercept")
      assert(r.getLong(1) == n.toLong, "n_days")
    }
  }

  test("qc_benford: digit census is exhaustive and shares are exact ratios") {
    val out = SparkEntry.queries("qc_benford")(spark, sfDir).collect()
    val total = Tables.orders(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum == total, "every order has a first digit")
    assert(out.map(_.getInt(0)).toSet.subsetOf((1 to 9).toSet))
    out.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getLong(1).toDouble / total) < 1e-6)
      assert(r.getDouble(4) >= 0 && r.getDouble(4) < 1, "abs deviation bounded")
    }
  }

  test("emb1: dim 0 stats match an in-memory recount; all dims covered") {
    val out = SparkEntry.queries("emb1_dim_stats")(spark, sfDir).collect()
    val nVec = Tables.embeddings(spark, sfDir).count()
    assert(out.map(_.getInt(0)).toSeq == out.indices.toSeq, "dims are 0..d-1, no gaps")
    out.foreach(r => assert(r.getLong(1) == nVec, "every vector contributes to every dim"))
    val d0 = Tables.embeddings(spark, sfDir)
      .selectExpr("CAST(embedding[0] AS DOUBLE) AS v").collect().map(_.getDouble(0))
    val r0 = out.find(_.getInt(0) == 0).get
    assert(math.abs(r0.getDouble(2) - d0.sum / d0.length) < 1e-5, "mean")
    assert(r0.getDouble(3) == d0.min && r0.getDouble(4) == d0.max, "min/max exact")
    assert(math.abs(r0.getDouble(5) -
      math.sqrt(d0.map(v => v * v).sum / d0.length)) < 1e-4, "rms")
  }

  test("s17: bin assignment equals an in-memory first-fit replay; bins fill in order") {
    val out = SparkEntry.queries("s17_compaction_plan")(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val replay = docs.toSeq.flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(d => (-d._3, d._2)).toSeq.map { d =>
        val bin = cum / 8192L; cum += d._3; ((src, bin), d._3)
      }
    }.groupBy(_._1).map { case (k, xs) => k -> ((xs.size.toLong, xs.map(_._2).sum)) }
    assert(out == replay, "per-(source, bin) file count and bytes match the replay")
    replay.keys.groupBy(_._1).foreach { case (_, bins) =>
      val ids = bins.map(_._2).toSeq.sorted
      assert(ids == (0L until ids.length).toSeq, "bins are contiguous from 0")
    }
  }

  test("w19: peak concurrency matches a brute-force sweep") {
    val out = SparkEntry.queries("w19_max_concurrent")(spark, sfDir).collect()
    val evs = Tables.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts) AS t0",
        "CAST(FLOOR(value * 60000000.0) AS BIGINT) AS dur").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    out.foreach { r =>
      val iv = evs(r.getString(0))
      assert(r.getLong(1) == iv.length.toLong, "n_intervals")
      // brute force: concurrency just after each start (half-open intervals)
      val peak = iv.map { case (_, s0, _) =>
        iv.count { case (_, s1, d1) => s1 <= s0 && s0 < s1 + d1 }
      }.max
      assert(r.getLong(2) == peak.toLong, s"peak for ${r.getString(0)}")
    }
  }

  test("dd22: SNM output equals an in-memory sorted-neighborhood replay") {
    val out = SparkEntry.queries("dd22_sorted_neighborhood")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // .toSeq before flatMap: flatMapping a Map with a tuple-yielding
    // function re-collects into a Map and silently collapses pairs by key
    val replay = docs.groupBy(_._2.take(1)).toSeq.flatMap { case (_, ds) =>
      val sorted = ds.sortBy(d => (d._2.take(16), d._1))
      for {
        i <- sorted.indices; j <- (i + 1) until math.min(i + 4, sorted.length)
        a = sorted(i); b = sorted(j)
        ta = a._2.split(" ").toSet; tb = b._2.split(" ").toSet
        inter = (ta & tb).size
        if inter.toDouble / (ta.size + tb.size - inter) >= 0.5
      } yield (math.min(a._1, b._1), math.max(a._1, b._1))
    }.toSet
    assert(out == replay, "matched pair set equals the replay")
  }

  test("qc_welch: reference row is exactly 0; t matches a direct recomputation") {
    val out = SparkEntry.queries("qc_welch_ttest")(spark, sfDir).collect()
    val ref = out.find(_.getString(0) == "1-URGENT").get
    assert(ref.getDouble(3) == 0.0, "cohort vs itself must be exactly 0")
    val cohorts = Tables.orders(spark, sfDir)
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100).toDouble))
      .groupBy(_._1).map { case (k, xs) =>
        val v = xs.map(_._2); val n = v.length.toDouble
        val m = v.sum / n
        (k, (n, m, v.map(x => (x - m) * (x - m)).sum / (n - 1)))
      }
    val (n0, m0, v0) = cohorts("1-URGENT")
    out.filterNot(_.getString(0) == "1-URGENT").foreach { r =>
      val (n1, m1, v1) = cohorts(r.getString(0))
      val t = (m1 - m0) / math.sqrt(v1 / n1 + v0 / n0)
      assert(math.abs(r.getDouble(3) - t) < 1e-4, s"t for ${r.getString(0)}")
      assert(math.abs(r.getDouble(2) - m1 / 100.0) < 1e-2, "mean")
    }
  }

  test("f21: islands cover no more than span, at least max single interval") {
    val out = SparkEntry.queries("f21_interval_merge")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val iv = Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS t0",
        "unix_micros(ts) + CAST(FLOOR(value * 60000000.0) AS BIGINT) AS t1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    out.foreach { r =>
      val u = iv(r.getLong(0))
      assert(r.getLong(1) == u.length.toLong, "n_intervals")
      // independent island replay: sort, sweep
      var islands = 0L; var covered = 0L
      var curS = Long.MinValue; var curE = Long.MinValue
      u.sortBy(x => (x._2, x._3)).foreach { case (_, s0, e0) =>
        if (islands == 0 || s0 >= curE) {
          if (islands > 0) covered += curE - curS
          islands += 1; curS = s0; curE = e0
        } else if (e0 > curE) curE = e0
      }
      covered += curE - curS
      assert(r.getLong(2) == islands, s"n_islands for user ${r.getLong(0)}")
      assert(r.getLong(3) == covered, s"covered_us for user ${r.getLong(0)}")
    }
  }

  test("f22: cohort diagonal sums to the user count; k=0 row exists per cohort") {
    val out = SparkEntry.queries("f22_cohort_retention")(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val nUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    val k0 = out.filter(_._1._2 == 0L)
    assert(k0.map(_._2).sum == nUsers, "every user appears in exactly one cohort at k=0")
    val cohorts = out.map(_._1._1).distinct
    assert(cohorts.forall(c => k0.exists(_._1._1 == c)), "each cohort has its k=0 row")
    out.foreach { case ((c, k), n) =>
      assert(k >= 0 && n > 0)
      assert(n <= k0.find(_._1._1 == c).get._2, "retention never exceeds the cohort size")
    }
  }

  test("sim7: fused ranking is consistent with its two source rankings") {
    val out = SparkEntry.queries("sim7_rank_fusion")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rows) =>
      assert(rows.length <= 5, "top-5 per query")
      rows.foreach { r =>
        assert(r.getBoolean(3) || r.getBoolean(4),
          "every fused hit comes from at least one modality")
        val expectLo = 1.0 / 65 // worst single-list rank
        assert(r.getDouble(2) >= expectLo - 1e-9, "score at least one rank-5 term")
        assert(r.getDouble(2) <= 2.0 / 61 + 1e-9, "score at most two rank-1 terms")
      }
    }
    // exact top-1 neighbor must always survive fusion when it has >= one vote
    val exact = SparkEntry.queries("sim1_cosine_topk")(spark, sfDir).collect()
      .groupBy(_.getLong(0))
    exact.foreach { case (q, _) => assert(byQuery.contains(q), "every query fused") }
  }

  test("a23: count-min never undercounts and is exact for collision-free probes") {
    val out = SparkEntry.queries("a23_countmin")(spark, sfDir).collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), "CM estimate >= exact, always")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1), "overcount is the gap")
    }
    val exact = Tables.lineitem(spark, sfDir)
      .filter("l_suppkey BETWEEN 1 AND 10").groupBy("l_suppkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(r.getLong(1) == exact.getOrElse(r.getLong(0), 0L)))
  }

  test("a24: HLL estimate lands within the expected error band") {
    val r = SparkEntry.queries("a24_hll_registers")(spark, sfDir).collect().head
    val (n, hit) = (r.getLong(0), r.getLong(1))
    assert(hit <= 256, "256 registers at p=8")
    // standard error 1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert(math.abs(r.getDouble(3)) < 0.26, s"rel_error ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(2) - n * (1 + r.getDouble(3))) < n * 0.001,
      "estimate, exact, and rel_error are mutually consistent")
  }

  test("tx21: postings digest matches an in-memory rebuild; tf covers the corpus") {
    val out = SparkEntry.queries("tx21_inverted_index")(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val allToks = docs.flatMap { case (id, t) => t.split(" ", -1).map((id, _)) }
    assert(out.map(_.getLong(2)).sum == allToks.length.toLong,
      "sum of tf equals the corpus token count")
    out.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), "df <= tf")
      val ids = allToks.filter(_._2 == r.getString(0)).map(_._1).distinct.sorted
      assert(r.getLong(1) == ids.length.toLong, s"df for ${r.getString(0)}")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(ids.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getString(5) == md, s"postings digest for ${r.getString(0)}")
    }
  }

  test("s18: scan/skip partition the file set; skipped files hold no matches") {
    val r = SparkEntry.queries("s18_zonemap_prune")(spark, sfDir).collect().head
    assert(r.getLong(1) + r.getLong(2) == r.getLong(0), "scanned + skipped = files")
    assert(r.getLong(4) <= r.getLong(3), "matches are inside scanned rows")
    val total = Tables.orders(spark, sfDir)
      .filter("o_custkey BETWEEN 100 AND 200").count()
    assert(r.getLong(4) == total, "pruning loses no matching row")
  }

  test("f23: trigram total equals sum over users of max(0, n-2)") {
    val out = SparkEntry.queries("f23_event_trigrams")(spark, sfDir).collect()
    val perUser = Tables.events(spark, sfDir)
      .groupBy("user_id").count().collect().map(_.getLong(1))
    val expect = perUser.map(n => math.max(0L, n - 2)).sum
    assert(out.map(_.getLong(3)).sum == expect, "every consecutive triple counted once")
    assert(out.forall(_.getLong(3) > 0))
  }

  test("j20: six-way join revenue matches an in-memory snowflake replay") {
    val out = SparkEntry.queries("j20_regional_revenue")(spark, sfDir).collect()
    def lv(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[Number](i).longValue
    val nat = Tables.nation(spark, sfDir).collect()
      .map(r => lv(r, 0) -> (r.getString(1), lv(r, 2))).toMap
    val asia = Tables.region(spark, sfDir).collect()
      .filter(_.getString(1) == "ASIA").map(lv(_, 0)).toSet
    val custNation = Tables.customer(spark, sfDir).collect()
      .map(r => lv(r, 0) -> lv(r, 2)).toMap
    val suppNation = Tables.supplier(spark, sfDir).collect()
      .map(r => lv(r, 0) -> lv(r, 2)).toMap
    val ordCust = Tables.orders(spark, sfDir)
      .filter("o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'")
      .collect().map(r => lv(r, 0) -> lv(r, 1)).toMap
    val rev = scala.collection.mutable.Map[String, (Double, Long)]().withDefaultValue((0.0, 0L))
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .collect().foreach { r =>
        for {
          ck <- ordCust.get(lv(r, 0))
          cn <- custNation.get(ck)
          sn <- suppNation.get(lv(r, 1))
          if cn == sn
          (name, rk) <- nat.get(sn)
          if asia.contains(rk)
        } {
          val (a, n) = rev(name)
          rev(name) = (a + r.getDouble(2) * (1.0 - r.getDouble(3)), n + 1)
        }
      }
    assert(out.map(_.getString(0)).toSet == rev.keySet, "nation coverage")
    out.foreach { r =>
      val (a, n) = rev(r.getString(0))
      assert(r.getLong(2) == n, s"n_items for ${r.getString(0)}")
      assert(math.abs(r.getDouble(1) - a) < 0.01, s"revenue for ${r.getString(0)}")
    }
    assert(out.map(_.getDouble(1)).toSeq == out.map(_.getDouble(1)).sortBy(-_).toSeq,
      "ordered by revenue desc")
  }

  test("sa11: folds partition the corpus; assignment is deterministic") {
    val a = SparkEntry.queries("sa11_kfold")(spark, sfDir).collect()
    val b = SparkEntry.queries("sa11_kfold")(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "fold assignment reproducible")
    assert(a.map(_.getLong(0)).toSet == (0L until 5L).toSet, "all 5 folds present")
    val docs = Tables.documents(spark, sfDir).agg(
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.sum("doc_id")).collect().head
    assert(a.map(_.getLong(1)).sum == docs.getLong(0), "counts partition")
    assert(a.map(_.getLong(2)).sum == docs.getLong(1), "checksums partition")
  }

  test("qc_fill: every (month, column) cell accounts for its rows") {
    val out = SparkEntry.queries("qc_fill_trend")(spark, sfDir).collect()
    val perMonth = Tables.orders(spark, sfDir)
      .selectExpr("CAST(year(o_orderdate)*100 + month(o_orderdate) AS LONG) AS ym")
      .groupBy("ym").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(_.getString(1)).distinct.sorted.toSeq ==
      Seq("o_orderpriority", "o_orderstatus", "o_totalprice"))
    out.foreach { r =>
      assert(r.getLong(2) == perMonth(r.getLong(0)), "n_rows per month")
      assert(r.getLong(3) <= r.getLong(2), "filled <= rows")
      assert(r.getDouble(4) <= 1.0 && r.getDouble(4) >= 0.0)
    }
  }

  test("u9: time-travel state equals a latest-wins replay at the cutoff") {
    val out = SparkEntry.queries("u9_time_travel")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val cut = out.head.getLong(4)
    val ev = Tables.events(spark, sfDir)
      .filter("event_type IN ('signup','purchase','error')")
      .selectExpr("event_id", "user_id", "event_type", "value", "unix_micros(ts) AS t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
    val ts = ev.map(_._5)
    assert(cut == ts.min + (ts.max - ts.min) / 2, "cutoff is the integer midpoint")
    val replay = ev.filter(_._5 <= cut)
      .groupBy(_._2).flatMap { case (u, es) =>
        val last = es.maxBy(e => (e._5, e._1))
        if (last._3 == "error") None
        else Some(u -> ((last._3, last._4, es.length.toLong)))
      }
    assert(out.length == replay.size)
    out.foreach { r =>
      val (op, v, n) = replay(r.getLong(0))
      assert(r.getString(1) == op && r.getDouble(2) == v && r.getLong(3) == n,
        s"state for user ${r.getLong(0)}")
    }
  }

  test("w20: new-user counts partition the user base; cumulative is monotone") {
    val out = SparkEntry.queries("w20_new_vs_returning")(spark, sfDir).collect()
    val nUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(out.map(_.getLong(2)).sum == nUsers, "every user is new exactly once")
    assert(out.last.getLong(4) == nUsers, "cumulative ends at the user base")
    out.foreach(r => assert(r.getLong(3) == r.getLong(1) - r.getLong(2)))
    val cums = out.map(_.getLong(4)).toSeq
    assert(cums == cums.sorted, "cumulative user count is monotone")
  }

  test("tok2: applied merge equals a true left-to-right greedy replay") {
    val out = SparkEntry.queries("tok2_bpe_apply")(spark, sfDir).collect()
    assert(out.length == 20)
    val texts = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0).split(" ").toList)
    // top pair under (n desc, l, r)
    val counts = texts.flatMap(t => t.zip(t.tail))
      .groupBy(identity).map { case (p, xs) => p -> xs.length }
    val (ml, mr) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }._1
    assert(out.head.getString(0) == ml && out.head.getString(1) == mr)
    // genuine greedy left-to-right application — independent of the
    // island-parity formulation the operator uses
    def applyMerge(t: List[String]): List[String] = t match {
      case a :: b :: rest if a == ml && b == mr => s"${ml}_$mr" :: applyMerge(rest)
      case a :: rest => a :: applyMerge(rest)
      case Nil => Nil
    }
    val recount = texts.map(applyMerge).flatMap(t => t.zip(t.tail))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val expectTop = recount.toSeq
      .sortBy { case ((l, r), n) => (-n, l, r) }.take(20)
      .map { case ((l, r), n) => (l, r, n) }
    val got = out.map(r => (r.getString(2), r.getString(3), r.getLong(4))).toSeq
    assert(got == expectTop, "post-merge pair table matches the greedy replay")
  }

  test("g3: triangle count matches brute force over the pair graph") {
    val row = SparkEntry.queries("g3_triangles")(spark, sfDir).collect().head
    val pairs = graft.operators.CurationOps.jaccardPairs(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    def conn(a: Long, b: Long) =
      edges.contains((a min b, a max b))
    val tris = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.length; k <- (j + 1) until nodes.length
      if conn(nodes(i), nodes(j)) && conn(nodes(i), nodes(k)) && conn(nodes(j), nodes(k))
    } yield 1).size
    assert(row.getLong(0) == nodes.length.toLong, "n_nodes")
    assert(row.getLong(1) == pairs.length.toLong, "n_edges")
    assert(row.getLong(3) == tris.toLong, "n_triangles")
    val deg = pairs.flatMap(p => Seq(p._1, p._2)).groupBy(identity).map(_._2.length.toLong)
    assert(row.getLong(2) == deg.map(d => d * (d - 1) / 2).sum, "wedge count")
  }

  test("a25: the bitmap distinct equals the exact distinct on every group") {
    val out = SparkEntry.queries("a25_bitmap_distinct")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), "bitmap == exact")
      assert(r.getLong(1) == ev(r.getString(0)), "matches raw replay")
    }
  }

  test("u12: SCD2 versions chain without gaps and exactly one current per key") {
    val out = SparkEntry.queries("u12_scd2_build")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5),
        r.getBoolean(6)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (uid, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"user $uid versions dense")
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        assert(pair(0)._4 == pair(1)._3, s"user $uid ranges chain")
      }
      assert(rows.count(_._5) == 1, s"user $uid exactly one current")
      assert(sorted.last._5 && sorted.last._4 == Long.MaxValue, "open tail")
      assert(uid % 7 == 0, "sampled key set")
    }
  }

  test("u11: base + the three delta terms reproduce the full recompute exactly") {
    val out = SparkEntry.queries("u11_join_view_delta")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size == 5)
    val incPairs = Seq("1_base", "2_delta_fact", "3_delta_dim", "4_delta_both")
      .map(out(_)._1).sum
    val incRev = Seq("1_base", "2_delta_fact", "3_delta_dim", "4_delta_both")
      .map(out(_)._2).sum
    assert(incPairs == out("5_full_recompute")._1, "pair count identity")
    assert(incRev == out("5_full_recompute")._2, "revenue identity")
    assert(out.values.forall(_._1 >= 0))
  }

  test("sa13: weights equalize source shares; ESS is k x harmonic mean of strata") {
    val out = SparkEntry.queries("sa13_reweight_ess")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byLang = out.groupBy(_.getString(0))
    byLang.foreach { case (_, rows) =>
      val k = rows.length
      val ns = rows.map(_.getLong(2))
      val total = ns.sum
      rows.foreach { r =>
        // weighted mass of each stratum is equal: n_i * w_i = N/k
        val expectW = total.toDouble / k / r.getLong(2)
        assert(math.abs(r.getDouble(3) - expectW) < 1e-5, "weight")
      }
      val ess = rows.head.getDouble(4)
      val expectEss = k.toDouble * k / ns.map(1.0 / _).sum
      assert(math.abs(ess - expectEss) < 1e-2, "ESS")
      assert(ess <= total + 1e-9, "ESS cannot exceed the stratum total")
      assert(rows.map(_.getDouble(4)).distinct.length == 1, "ESS constant per lang")
    }
  }

  test("emb2: every (vector, subspace) is assigned to its true nearest code") {
    val out = SparkEntry.queries("emb2_pq_assign")(spark, sfDir).collect()
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong).toArray)
      .sortBy(_._1)
    val anchors = vecs.take(16)
    def dist(a: Array[Long], b: Array[Long], sub: Int): Long =
      (0 until 8).map { o =>
        val d = a(sub * 8 + o) - b(sub * 8 + o); d * d
      }.sum
    // replay the assignment and census
    val census = collection.mutable.Map[(Int, Long), (Long, Long)]().withDefaultValue((0L, 0L))
    for ((_, v) <- vecs; sub <- 0 until 8) {
      val (code, d) = anchors.map { case (aid, av) => (aid, dist(v, av, sub)) }
        .minBy { case (aid, d) => (d, aid) }
      val (n, e) = census((sub, code))
      census((sub, code)) = (n + 1, e + d)
    }
    assert(out.length == census.size, "cell count")
    out.foreach { r =>
      val key = (r.getInt(0), r.getLong(1))
      assert(census(key) == ((r.getLong(2), r.getLong(3))), s"cell $key")
    }
  }

  test("emb7: distributed Lloyd rounds match a sequential replay and the " +
    "assignment step is monotone") {
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT) + 4000000L) AS ivec")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .sortBy(_._1)
    val seed = vecs.take(16).map { case (id, v) => id -> v }.toMap
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assignAll(cs: Map[Long, Array[Long]]) =
      vecs.map { case (id, v) =>
        val (cell, d) = cs.toSeq.map { case (c, cv) => (c, dist(v, cv)) }
          .minBy { case (c, d) => (d, c) }
        (id, cell, d)
      }
    val a1 = assignAll(seed)
    val c1 = a1.groupBy(_._2).map { case (cell, members) =>
      val mv = members.map(m => vecs.find(_._1 == m._1).get._2)
      val n = mv.length.toLong
      cell -> mv.head.indices.map { d =>
        val sx = mv.map(_(d)).sum
        (2 * sx + n) / (2 * n)
      }.toArray
    }
    val a2 = assignAll(c1)
    // the gate's per-cell census equals the replay's round-2 census
    val expected = a2.groupBy(_._2).map { case (cell, ms) =>
      cell -> ((ms.length.toLong, ms.map(_._3).sum, ms.map(_._1).min))
    }
    val got = SparkEntry.queries("emb7_kmeans_train")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
    // Lloyd's assignment-step guarantee: re-assigning against the trained
    // centroids never increases total error relative to keeping the
    // round-1 assignment under those same centroids.
    val errKept = a1.map { case (id, cell, _) =>
      dist(vecs.find(_._1 == id).get._2, c1(cell))
    }.sum
    assert(a2.map(_._3).sum <= errKept, "assignment step must be monotone")
  }

  test("emb9: power-iteration PCA matches a sequential exact replay, stays " +
    "normalized, and improves the Rayleigh quotient") {
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT) + 4000000L) AS ivec")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .sortBy(_._1)
    val dims = vecs.head._2.length
    val n = vecs.length.toLong
    val mu = Array.tabulate(dims) { d =>
      val sx = vecs.map(_._2(d)).sum
      (2 * sx + n) / (2 * n)
    }
    val ys = vecs.map { case (_, v) => Array.tabulate(dims)(d => v(d) - mu(d)) }
    def rayleigh(w: Array[Long]): BigDecimal = {
      val num = ys.map { y =>
        val t = BigInt(y.indices.map(d => y(d) * w(d)).sum)
        t * t
      }.sum
      val den = BigInt(w.map(x => x * x).sum)
      BigDecimal(num) / BigDecimal(den)
    }
    var w = Array.fill(dims)(1000000L)
    val rho0 = rayleigh(w)
    for (_ <- 1 to 3) {
      val s = Array.fill(dims)(BigInt(0))
      ys.foreach { y =>
        val t = y.indices.map(d => y(d) * w(d)).sum
        val t2 = (if (t < 0) -1L else 1L) * (math.abs(t) / 1000L)
        y.indices.foreach(d => s(d) += BigInt(t2) * BigInt(y(d)))
      }
      val m = s.map(_.abs).max.max(BigInt(1))
      w = s.map(sv =>
        ((if (sv < 0) -1 else 1) * ((BigInt(2000000) * sv.abs + m) / (2 * m))).toLong)
    }
    val got = SparkEntry.queries("emb9_pca_power")(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1).map(_._2)
    assert(got.toSeq == w.toSeq, "distributed loadings != sequential replay")
    assert(got.map(math.abs).max == 1000000L, "normalization invariant")
    // power iteration must strictly improve the dominant-direction fit
    // from the uninformed all-ones start (tolerance for the integer
    // coarsening at each round)
    assert(rayleigh(w) >= rho0 * BigDecimal("0.999999"),
      s"Rayleigh quotient regressed: $rho0 -> ${rayleigh(w)}")

    // emb10 (train→apply): the projection coefficient and the rank-1
    // residual energy against a sequential replay using THIS w, plus the
    // residual-shrinks-the-vector invariant (the rank-1 reconstruction
    // must not lose more energy than the vector has).
    val ss = w.map(x => x * x).sum
    val expected = vecs.map(_._1).zip(ys).map { case (id, y) =>
      val t = y.indices.map(d => y(d) * w(d)).sum
      val c = (if (t < 0) -1L else 1L) * (math.abs(t) / (ss / 1000000L))
      val e = y.indices.map { d =>
        val cw = c * w(d)
        val recon = (if (cw < 0) -1L else 1L) * (math.abs(cw) / 1000000L)
        val r = y(d) - recon
        r * r
      }.sum
      (id, c, e)
    }
    val gotP = SparkEntry.queries("emb10_pca_project")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(gotP.toSeq == expected.toSeq,
      "distributed projection != sequential replay")
    val yEnergy = ys.map(y => y.map(v => v * v).sum).zip(gotP)
    yEnergy.foreach { case (ey, (id, _, e)) =>
      // +256 = worst-case integer-coarsening slack (≤2 per dim, squared
      // cross-term bounded by the 64-dim sum; exact when y = 0)
      assert(e <= ey + 256,
        s"vec $id: residual energy $e exceeds vector energy $ey")
    }
  }
}
