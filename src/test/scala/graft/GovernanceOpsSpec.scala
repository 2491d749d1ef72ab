package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.Fixtures

/** In-memory re-derivations of the governance / corpus-planning operators
  * (GovernanceOps) at sf0.001 — each test replays the operator's semantics
  * with naive driver-side Scala (including the quadratic dominance check
  * that t6's plan deliberately avoids) so the distributed formulation is
  * checked against the definition, not against itself. The driver's DuckDB
  * hash gate covers cross-engine representation. */
class GovernanceOpsSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()
  val sfDir = "/root/testdata/sf0.001"

  test("qc_kanonymity: risk counts match a naive QI-group replay, rates in [0,1]") {
    val out = SparkEntry.queries("qc_kanonymity")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 100))
    val byLang = docs.groupBy(_._1)
    out.foreach { r =>
      val lang = r.getString(0)
      val groups = byLang(lang).groupBy(identity).values.map(_.length).toSeq
      assert(r.getLong(1) == groups.length, "n_groups")
      assert(r.getLong(2) == groups.count(_ < 5), "risk_groups")
      assert(r.getLong(3) == groups.filter(_ < 5).sum, "risk_docs")
      assert(r.getLong(4) == groups.sum, "n_docs")
      val rate = r.getDouble(5)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - groups.filter(_ < 5).sum.toDouble / groups.sum) < 1e-5)
    }
  }

  test("s19: NDV, code bits, and the dictionary decision match per-column recounts") {
    val out = SparkEntry.queries("s19_encoding_plan")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 6)
    val li = Tables.lineitem(spark, sfDir)
    val n = li.count()
    for (c <- Seq("l_returnflag", "l_linestatus", "l_partkey", "l_suppkey",
      "l_quantity", "l_shipdate")) {
      val ndv = li.select(c).distinct().count()
      val r = out(c)
      assert(r.getLong(1) == n, s"$c n_rows")
      assert(r.getLong(2) == ndv, s"$c ndv")
      assert(r.getLong(3) == java.lang.Long.toBinaryString(math.max(ndv - 1, 0)).length,
        s"$c code_bits")
      assert(r.getString(4) == (if (ndv * 10 <= n) "dictionary" else "plain"), s"$c decision")
    }
  }

  test("f24: support/confidence/lift satisfy their identities against basket recounts") {
    val out = SparkEntry.queries("f24_assoc_rules")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val baskets = Tables.events(spark, sfDir).select("user_id", "event_type")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nb = baskets.map(_._1).distinct.length.toDouble
    val item = baskets.groupBy(_._2).view.mapValues(_.length).toMap
    val byUser = baskets.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { r =>
      val (a, c) = (r.getString(0), r.getString(1))
      assert(a < c, "canonical pair order")
      val np = byUser.values.count(s => s(a) && s(c))
      assert(r.getLong(2) == np, s"n_pair $a->$c")
      assert(math.abs(r.getDouble(3) - np / nb) < 1e-5, "support")
      assert(math.abs(r.getDouble(4) - np.toDouble / item(a)) < 1e-5, "confidence")
      assert(math.abs(r.getDouble(5) - np * nb / (item(a).toDouble * item(c))) < 1e-5, "lift")
    }
  }

  test("t6: bucketed skyline equals the quadratic dominance definition") {
    val out = SparkEntry.queries("t6_pareto_skyline")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val per = Tables.orders(spark, sfDir).collect()
      .map(r => (r.getLong(1), math.round(r.getDouble(3) * 100)))
      .groupBy(_._1).map { case (_, os) => (os.map(_._2).sum, os.length.toLong) }
      .toSeq
    val sky = per.distinct.filter { case (s0, n0) =>
      !per.exists { case (s1, n1) =>
        s1 >= s0 && n1 >= n0 && (s1 > s0 || n1 > n0)
      }
    }.sortBy(_._1)
    assert(out.map(p => (p._1, p._2)).toSeq == sky, "skyline point set")
    out.foreach { case (s0, n0, cnt) =>
      assert(cnt == per.count(p => p._1 == s0 && p._2 == n0), "n_customers")
    }
  }

  test("ts5: seasonal indices average to ~1 weighted by day counts") {
    val out = SparkEntry.queries("ts5_seasonal_index")(spark, sfDir).collect()
    assert(out.length == 7)
    assert(out.map(_.getLong(0)).toSet == (0L to 6L).toSet, "all 7 DOWs")
    val weighted = out.map(r => r.getDouble(3) * r.getLong(1)).sum /
      out.map(_.getLong(1)).sum
    // Σ_d idx_d · n_d / Σ n_d = Σ dow_cents / all_cents · all_days/all_days = 1
    assert(math.abs(weighted - 1.0) < 1e-4, s"weighted mean $weighted")
    val allCents = out.map(_.getLong(2)).sum
    out.foreach { r =>
      val expect = r.getLong(2).toDouble * out.map(_.getLong(1)).sum /
        (r.getLong(1).toDouble * allCents)
      assert(math.abs(r.getDouble(3) - expect) < 1e-5)
    }
  }

  test("qc_fd: the key FD holds, the quasi-FDs are violated, counts replay") {
    val out = SparkEntry.queries("qc_fd_violations")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 3)
    assert(out("1_doc_id->source").getLong(2) == 0, "true key FD has no violations")
    assert(out("1_doc_id->source").getLong(4) == 1, "max variants 1")
    assert(out("3_custkey->orderpriority").getLong(2) > 0, "fact FD is violated")
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "n_chars", "source").collect()
      .map(r => ((r.getString(0), r.getLong(1) / 100), r.getString(2)))
    val byKey = docs.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val r2 = out("2_lang,len_bucket->source")
    assert(r2.getLong(1) == byKey.size, "n_keys")
    assert(r2.getLong(2) == byKey.values.count(_ > 1), "violating keys")
    assert(r2.getLong(4) == byKey.values.max, "max variants")
  }

  test("s20: per-month runs match a sequential replay under the total order") {
    val out = SparkEntry.queries("s20_rle_probe")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val li = Tables.lineitem(spark, sfDir)
      .selectExpr("CAST(date_trunc('month', l_shipdate) AS STRING) AS mon",
        "CAST(l_shipdate AS STRING) AS sd", "l_orderkey", "l_linenumber",
        "l_returnflag")
      .collect()
      .map(r => (r.getString(0).take(7), (r.getString(1), r.getLong(2),
        r.getInt(3), r.getString(4))))
      .groupBy(_._1)
    out.foreach { r =>
      val rows = li(r.getAs[Any](0).toString.take(7))
        .map(_._2).sortBy(t => (t._1, t._2, t._3, t._4))
      val flags = rows.map(_._4)
      val runs = 1 + flags.sliding(2).count(p => p.length == 2 && p(0) != p(1))
      assert(r.getLong(1) == flags.length, "n_rows")
      assert(r.getLong(2) == runs, "n_runs")
      assert(r.getDouble(3) >= 1.0, "avg run length >= 1")
    }
  }

  test("ts6: CUSUM statistic is exact and peaks where the replay peaks") {
    val out = SparkEntry.queries("ts6_cusum_changepoint")(spark, sfDir).collect()
    assert(out.length == 5)
    val daily = Tables.orders(spark, sfDir)
      .selectExpr("o_orderpriority AS prio", "to_date(o_orderdate) AS day",
        "CAST(ROUND(o_totalprice * 100) AS LONG) AS cents")
      .collect()
      .map(r => (r.getString(0), (r.getDate(1).toString, r.getLong(2))))
      .groupBy(_._1)
    out.foreach { r =>
      val days = daily(r.getString(0)).map(_._2)
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      val d = days.length.toLong
      val total = days.map(_._2).sum
      var prefix = 0L
      val cusums = days.zipWithIndex.map { case ((day, c), i) =>
        prefix += c
        (day, d * prefix - (i + 1) * total)
      }
      val best = cusums.minBy { case (day, cu) => (-math.abs(cu), day) }
      assert(r.getLong(1) == d, "n_days")
      assert(r.getDate(2).toString == best._1, "change-point day")
      assert(r.getLong(3) == math.abs(best._2), "max |CUSUM|")
      // the last CUSUM is identically zero: D*prefix(D) - D*T = 0
      assert(cusums.last._2 == 0L, "telescoping sanity")
    }
  }

  test("s21: the coordinated-sample estimator replays and truth matches a full join") {
    val out = SparkEntry.queries("s21_join_card_sample")(spark, sfDir).collect()
    assert(out.length == 5)
    val orders = Tables.orders(spark, sfDir)
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val custs = Tables.customer(spark, sfDir).select("c_custkey").collect()
      .map(_.getLong(0)).toSet
    def sampled(k: Long) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes).map("%02x".format(_)).mkString.head == '0'
    out.foreach { r =>
      val prio = r.getString(0)
      val mine = orders.filter(_._2 == prio)
      assert(r.getLong(1) == mine.count(o => custs(o._1)), "true pairs")
      assert(r.getLong(2) ==
        mine.count(o => custs(o._1) && sampled(o._1)), "sampled pairs")
      assert(r.getLong(3) == r.getLong(2) * 16, "scale-up")
    }
  }

  test("emb3: centroid-identity means equal the naive all-pairs means") {
    val out = SparkEntry.queries("emb3_label_separation")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getInt(1),
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray))
    def dot(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    out.foreach { r =>
      val lbl = r.getInt(0)
      val mine = vecs.filter(_._1 == lbl).map(_._2)
      val rest = vecs.filter(_._1 != lbl).map(_._2)
      assert(r.getLong(1) == mine.length, "n_vecs")
      val intra = (for (i <- mine.indices; j <- mine.indices if i != j)
        yield dot(mine(i), mine(j))).sum / (mine.length.toDouble * (mine.length - 1))
      assert(math.abs(r.getDouble(2) - intra / 1e12) < 1e-4, "intra mean")
      val inter = (for (a <- mine; b <- rest) yield dot(a, b)).sum /
        (mine.length.toDouble * rest.length)
      assert(math.abs(r.getDouble(3) - inter / 1e12) < 1e-4, "inter mean")
      // NOTE: no "intra > inter" assertion — whether labels separate under
      // raw inner product is the audit's FINDING about the data (this
      // synthetic corpus's labels are not dot-product clusters at small
      // SF), not a property of the operator.
    }
  }

  test("dd24: dot products replay per pair; both verdicts occur on this corpus") {
    val out = SparkEntry.queries("dd24_cross_modal_verify")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
    assert(out.nonEmpty)
    val iv = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6 + 0.5).toLong).toArray)
      .toMap
    out.foreach { case (a, b, dot6, confirms) =>
      val expect = iv(a).zip(iv(b)).map { case (x, y) => x * y }.sum
      assert(dot6 == expect, s"pair ($a,$b) dot")
      assert(confirms == (dot6 >= 200000000000L), "verdict threshold")
    }
    // the text-modality pair set is exactly dd16's verified pairs
    val pairSet = graft.operators.CurationOps.jaccardPairs(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(p => (p._1, p._2)).toSet == pairSet, "pair provenance")
  }

  test("qc_label_balance: gini from exact moments matches the share replay") {
    val r = SparkEntry.queries("qc_label_balance")(spark, sfDir).collect().head
    val counts = Tables.embeddings(spark, sfDir)
      .groupBy("label").count().collect().map(_.getLong(1))
    val n = counts.sum.toDouble
    assert(r.getLong(0) == counts.length)
    assert(r.getLong(1) == counts.sum)
    val gini = 1.0 - counts.map(c => (c / n) * (c / n)).sum
    assert(math.abs(r.getDouble(2) - gini) < 1e-5, "gini")
    assert(math.abs(r.getDouble(3) - counts.max / n) < 1e-5, "max share")
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0)
  }

  test("f25: popcount census conserves users and events; masks fit in 24 bits") {
    val out = SparkEntry.queries("f25_hour_bitmap")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "hour(ts) AS h").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val byUser = ev.groupBy(_._1).view
      .mapValues(es => (es.map(_._2).toSet, es.length)).toMap
    assert(out.map(_.getLong(1)).sum == byUser.size, "user conservation")
    assert(out.map(_.getLong(3)).sum == ev.length, "event conservation")
    out.foreach { r =>
      val h = r.getLong(0)
      assert(h >= 0 && h <= 24, "popcount bounded by 24 hours")
      val expectUsers = byUser.values.count(_._1.size == h)
      assert(r.getLong(1) == expectUsers, s"n_users at $h active hours")
      val expectPatterns = byUser.values.filter(_._1.size == h).map(_._1).toSet.size
      assert(r.getLong(2) == expectPatterns, s"n_patterns at $h")
    }
  }

  test("qc_datacard: per-source card conserves docs/tokens and agrees with tx23") {
    val docs = Tables.documents(spark, sfDir)
    val cards = SparkEntry.queries("qc_datacard")(spark, sfDir).collect()
    assert(cards.map(_.getLong(1)).sum == docs.count(), "doc conservation")
    val totalToks = docs.selectExpr(
      "CAST(sum(size(split(text, ' '))) AS BIGINT)").head().getLong(0)
    assert(cards.map(_.getLong(2)).sum == totalToks, "token conservation")
    // the card's keep counts must equal tx23's per-doc keep flags rolled
    // up by source (same derived weights, same margin)
    val keepBySource = SparkEntry.queries("tx23_hashed_classifier")(spark, sfDir)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("keep"), 1L).otherwise(0L)).as("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    cards.foreach { r =>
      val src = r.getString(0)
      val nKeep = math.round(r.getDouble(5) * r.getLong(1)).toLong
      assert(nKeep == keepBySource(src), s"keep rate at $src")
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) < 1.0, s"dup rate at $src")
    }
  }
}
