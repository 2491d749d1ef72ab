package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.Fixtures

/** Structural invariants of the round-7 additions: BPE pair counting
  * (tok1), per-source boilerplate grams (tx20), per-domain caps (sa9),
  * cross-source overlap matrix (dd20), grid-histogram quantiles (a22),
  * the leakage-safe cluster split (sa10), CDC changelog compaction (u8),
  * and session PMI (f19). Each is re-derived
  * independently in memory at sf0.001 — these properties hold by
  * construction at every scale. */
class RoundSevenOpsSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()
  val sfDir = "/root/testdata/sf0.001"

  test("tok1: top merge candidate matches an in-memory pair recount") {
    val out = SparkEntry.queries("tok1_bpe_pair_merges")(spark, sfDir)
      .collect()
    assert(out.length == 20, "top-20 merge candidates")
    // independent recount of every adjacent pair
    val counts = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
      .flatMap(t => { val w = t.split(" "); w.zip(w.tail) })
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val expectedTop = counts.toSeq
      .sortBy { case ((l, r), n) => (-n, l, r) }.take(20)
    val got = out.map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toSeq
    assert(got == expectedTop, "top-20 must equal the recount under the same total order")
    val total = counts.values.sum
    out.foreach { r =>
      assert(r.getDouble(3) == r.getLong(2).toDouble / total, "pair_share exact")
    }
  }

  test("tx20: boilerplate shares are consistent and bounded") {
    val out = SparkEntry.queries("tx20_boilerplate_grams")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nd, nb) = (r.getLong(1), r.getLong(2))
      val (ni, nbi) = (r.getLong(3), r.getLong(4))
      assert(nb <= nd, "boiler grams are a subset of distinct grams")
      assert(nbi <= ni, "boiler instances are a subset of instances")
      assert(r.getDouble(5) == nbi.toDouble / ni, "share is the exact ratio")
    }
  }

  test("sa9: every source keeps at most K docs and the cap is deterministic") {
    val a = SparkEntry.queries("sa9_domain_cap")(spark, sfDir).collect()
    val b = SparkEntry.queries("sa9_domain_cap")(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq, "cap membership must be reproducible")
    a.foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      assert(kept == math.min(10L, n), s"source ${r.getString(0)}: kept $kept of $n")
    }
  }

  test("dd20: matrix totals equal dd16's cross-source pair count") {
    val pairs = operators.CurationOps.jaccardPairs(spark, sfDir)
    val src = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
    val cross = pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), Seq("doc_b"))
      .filter(col("sa") =!= col("sb")).count()
    val matrix = SparkEntry.queries("dd20_source_overlap")(spark, sfDir)
      .agg(sum("n_pairs")).collect()(0).getLong(0)
    assert(matrix == cross, s"matrix sums to $matrix but dd16 has $cross cross-source pairs")
  }

  test("u7: merged partials equal a from-scratch recompute, bit for bit") {
    val merged = SparkEntry.queries("u7_incremental_refresh")(spark, sfDir)
      .collect().toSeq
    val rebuilt = Tables.orders(spark, sfDir)
      .withColumn("mon", month(col("o_orderdate")))
      .groupBy("o_orderpriority", "mon")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(expr("CAST(o_totalprice AS DECIMAL(30,8))")), 4)
          .cast("double").as("revenue"))
      .withColumn("avg_price", col("revenue") / col("n_orders"))
      .orderBy("o_orderpriority", "mon")
      .collect().toSeq
    assert(merged == rebuilt, "incremental refresh must be indistinguishable from rebuild")
  }

  test("dd21: funnel statuses partition the corpus and stages are ordered") {
    val out = SparkEntry.queries("dd21_dedup_funnel")(spark, sfDir).collect()
    val total = out.map(_.getLong(1)).sum
    assert(total == Tables.documents(spark, sfDir).count(),
      "every document gets exactly one funnel status")
    val byStatus = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact stage runs first: an exact dup must never be counted as near
    val exactIds = Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.ops.TextOps.bagFingerprint.as("fp"))
      .withColumn("first", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("doc_id") > col("first"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val nearIds = operators.CurationOps.jaccardPairs(spark, sfDir)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    assert(byStatus.getOrElse("exact_dup", 0L) == exactIds.size)
    assert(byStatus.getOrElse("near_dup", 0L) == (nearIds -- exactIds).size)
  }

  test("a22: each grid quantile bucket brackets the exact percentile") {
    val out = SparkEntry.queries("a22_grid_quantiles")(spark, sfDir).collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(0.5, 0.9, 0.99))
    val exact = Tables.lineitem(spark, sfDir)
      .select("l_extendedprice").collect().map(_.getDouble(0)).sorted
    out.foreach { r =>
      val q = r.getDouble(0)
      // the ceil(q*n)-th smallest value (1-based) must land inside the
      // reported bucket (inclusive bounds — the bucket edge itself may be
      // the value when it sits exactly on the grid)
      val v = exact(math.ceil(q * exact.length).toInt - 1)
      assert(r.getDouble(3) <= v && v <= r.getDouble(4),
        s"q=$q: exact $v outside bucket [${r.getDouble(3)}, ${r.getDouble(4)}]")
    }
  }

  test("sa10: cluster split equals an in-memory md5 replay and never splits a cluster") {
    def mdBucket(clusterId: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(("graft-cluster-split" + clusterId.toString)
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 7), 16) % 100
    }
    val manifest = SparkEntry.queries("dd9_dedup_manifest")(spark, sfDir)
      .select("doc_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = manifest
      .map { case (doc, cl) =>
        val b = mdBucket(cl)
        val split = if (b < 90) "train" else if (b < 95) "val" else "test"
        (split, doc, cl)
      }
      .groupBy(_._1).map { case (split, xs) =>
        split -> (xs.length.toLong, xs.map(_._3).distinct.length.toLong,
          xs.map(_._2).sum)
      }
    val got = SparkEntry.queries("sa10_cluster_split")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected, "split aggregate must equal the md5 replay")
    // no-span invariant: if any cluster reached two splits it would be
    // counted once per split and the per-split cluster counts would
    // overshoot the global distinct count
    assert(got.values.map(_._2).sum == manifest.map(_._2).distinct.length.toLong,
      "sum of per-split cluster counts = total distinct clusters")
    assert(got.values.map(_._1).sum == manifest.length.toLong,
      "every document is assigned exactly one split")
  }

  test("g2: modularity bookkeeping closes — edges and degrees partition exactly") {
    val out = SparkEntry.queries("g2_modularity")(spark, sfDir).collect()
    assert(out.nonEmpty, "the LSH pair graph must yield clusters")
    val m = SparkEntry.queries("dd2_minhash_lsh")(spark, sfDir)
      .select("doc_a", "doc_b").distinct().count()
    // under a CC partition every edge is intra-cluster: cluster pair
    // counts and degree masses must tile the whole graph
    assert(out.map(_.getLong(2)).sum == m, "sum e_c = m")
    assert(out.map(_.getLong(3)).sum == 2 * m, "sum deg_c = 2m")
    out.foreach { r =>
      val (nm, ec, dc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ec >= nm - 1, "a connected component has >= n-1 edges")
      assert(dc == out.filter(_.getLong(0) == r.getLong(0)).map(_.getLong(3)).head)
      assert(r.getDouble(4) <= ec.toDouble / m + 1e-9, "term <= e_c/m")
    }
    // the broadcast total equals the decimal replay of the terms
    val replay = out.map(r => BigDecimal(r.getDouble(4)).setScale(8))
      .sum.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getDouble(5) == replay, "q_total = exact decimal sum")
  }

  test("u8: compaction equals a sequential latest-wins replay of the changelog") {
    val log = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("signup", "purchase", "error"))
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)),
        r.getString(3), r.getDouble(4)))
    assert(log.nonEmpty)
    // latest record per key = max (ts_micros, event_id)
    val expected = log.groupBy(_._1).flatMap { case (user, recs) =>
      val last = recs.maxBy(_._2)
      if (last._3 == "error") None
      else Some(user -> (last._3, last._4, recs.length.toLong))
    }
    val got = SparkEntry.queries("u8_changelog_compact")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(got == expected, "compacted snapshot must equal the replay")
    // tombstoned keys are really gone
    val tombstoned = log.groupBy(_._1)
      .filter { case (_, recs) => recs.maxBy(_._2)._3 == "error" }.keySet
    assert(tombstoned.forall(!got.contains(_)), "tombstones must drop their key")
  }

  test("f19: PMI counts are consistent and the ratio is the exact integer quotient") {
    val out = SparkEntry.queries("f19_session_pmi")(spark, sfDir).collect()
    assert(out.nonEmpty, "events must yield co-occurring type pairs")
    out.foreach { r =>
      val (nAb, nA, nB, nS) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(r.getString(0) < r.getString(1), "pairs are ordered ta < tb")
      assert(nAb <= math.min(nA, nB), "co-occurrence bounded by each marginal")
      assert(math.max(nA, nB) <= nS, "marginals bounded by session count")
      assert(r.getDouble(6) == (nAb * nS).toDouble / (nA * nB).toDouble,
        "pmi_ratio is exactly the integer quotient")
    }
  }
}
