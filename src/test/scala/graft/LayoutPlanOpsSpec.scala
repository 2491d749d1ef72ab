package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.Fixtures

/** Round-8 layout/OLAP pack invariants (s22 sort advisor, a26 weighted
  * median, j21 trade flows, ts8 seasonal decomposition, mm5 perceptual
  * hash), each re-derived sequentially from the raw parquet at sf0.001. */
class LayoutPlanOpsSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()
  val sfDir = "/root/testdata/sf0.001"

  test("s22: run counts equal the sequential replay for l_suppkey") {
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getString(3), r.getString(4)))
    val (rfRuns, lsRuns) = rows.groupBy(_._1).values.map { g =>
      val sorted = g.sortBy { case (_, ok, ln, rf, ls) => (ok, ln, rf, ls) }
      val rf = sorted.map(_._4)
      val ls = sorted.map(_._5)
      def runs(xs: Seq[String]) = 1 + xs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
      (runs(rf), runs(ls))
    }.foldLeft((0L, 0L)) { case ((a, b), (x, y)) => (a + x, b + y) }
    val got = SparkEntry.queries("s22_sort_advisor")(spark, sfDir).collect()
      .find(_.getString(0) == "l_suppkey").get
    assert(got.getLong(2) == rfRuns, s"runs_returnflag ${got.getLong(2)} != $rfRuns")
    assert(got.getLong(3) == lsRuns, s"runs_linestatus ${got.getLong(3)} != $lsRuns")
  }

  test("a26: weighted median equals the sequential replay per group") {
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
      .collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getDouble(3), r.getDouble(4).toLong))
    val expect = rows.groupBy(_._1).map { case (rf, g) =>
      val sorted = g.sortBy { case (_, ok, ln, price, _) => (price, ok, ln) }
      val tot = sorted.map(_._5).sum
      var cum = 0L
      val pick = sorted.find { r => cum += r._5; cum * 2 >= tot }.get
      rf -> (tot, pick._4)
    }
    val got = SparkEntry.queries("a26_weighted_median")(spark, sfDir).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (tot, med) = expect(r.getString(0))
      assert(r.getLong(1) == tot, s"${r.getString(0)} total_weight")
      assert(r.getDouble(2) == med, s"${r.getString(0)} weighted median")
    }
  }

  test("j21: flows are antisymmetric-complete and revenue is positive") {
    // sf0.001's 6k-row lineitem yields no NATION_0<->NATION_1 flow inside
    // the 1996-97 window; the flow structure test needs sf0.01.
    val got = SparkEntry.queries("j21_trade_flows")(spark, "/root/testdata/sf0.01").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getString(0) != r.getString(1), "no self-flow")
      assert(Set("NATION_0", "NATION_1")(r.getString(0)))
      assert(r.getLong(2) == 1996L || r.getLong(2) == 1997L, "year predicate")
      assert(r.getDouble(3) > 0 && r.getLong(4) > 0)
    }
    // Both directions of the pair appear (the Q7 report reads the flow
    // imbalance; a one-sided result means a dropped join arm).
    val dirs = got.map(r => (r.getString(0), r.getString(1))).toSet
    assert(dirs.contains(("NATION_0", "NATION_1")) && dirs.contains(("NATION_1", "NATION_0")))
  }

  test("ts8: full-window trend only, complete DOW coverage") {
    val got = SparkEntry.queries("ts8_seasonal_decompose")(spark, sfDir).collect()
    val types = got.map(_.getString(0)).distinct
    got.groupBy(_.getString(0)).foreach { case (et, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (0L to 6L), s"$et DOW coverage")
      // 30 observed days minus 3 edge days each side = 24 interior days.
      assert(rs.map(_.getLong(2)).sum == 24, s"$et interior day count")
      // Seasonal components are deviations from a local mean: weighted by
      // day counts they must be SMALL relative to the raw daily volume
      // (the detrend step removes the level; what remains is day-of-week
      // texture). A leaked trend would leave mass comparable to the level.
      val weighted = rs.map(r => r.getDouble(3) * r.getLong(2)).sum
      val level = Tables.events(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("event_type") === et)
        .agg(org.apache.spark.sql.functions.sum("value")).collect()(0).getDouble(0)
      assert(math.abs(weighted) < 0.15 * level,
        s"$et seasonal mass $weighted vs level $level")
    }
    assert(types.length == 5)
  }

  test("ts9: term counts follow the calendar and ACF stays in [-1, 1]") {
    val got = SparkEntry.queries("ts9_acf")(spark, sfDir).collect()
    assert(got.length == 15, "5 event types x 3 lags")
    val nDays = Tables.events(spark, sfDir)
      .selectExpr("event_type", "CAST(ts AS DATE) AS day").distinct().collect()
      .groupBy(_.getString(0)).map { case (k, v) => k -> v.length.toLong }
    got.foreach { r =>
      val (et, lag) = (r.getString(0), r.getLong(1))
      // The synthetic calendar is contiguous, so lag-k pairing drops
      // exactly k days per series.
      assert(r.getLong(2) == nDays(et) - lag, s"$et lag $lag n_terms")
      assert(math.abs(r.getDouble(3)) <= 1.000001, s"$et lag $lag acf bound")
    }
  }

  test("f29: distributed power iteration equals the sequential integer replay") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._4, e._2)).map(_._3)
      sorted.sliding(2).filter(_.length == 2).map(p => (p(0), p(1)))
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nFrom = pairs.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val states = nFrom.keys.toSeq.sorted
    val SCALE = 1000000000000L
    var pi = states.map(_ -> SCALE / states.size).toMap
    for (_ <- 1 to 8) {
      pi = pairs.toSeq.groupBy(_._1._2).map { case (next, es) =>
        next -> es.map { case ((prev, _), n) => pi(prev) * n / nFrom(prev) }.sum
      }
    }
    val got = SparkEntry.queries("f29_markov_stationary")(spark, sfDir).collect()
    got.foreach { r =>
      assert(r.getLong(1) == pi(r.getString(0)),
        s"${r.getString(0)}: ${r.getLong(1)} != replay ${pi(r.getString(0))}")
    }
    // Floors only lose mass; 8 rounds of <= |pairs| floors bound the loss.
    val total = got.map(_.getLong(1)).sum
    assert(total <= SCALE && total >= SCALE - 8L * pairs.size * states.size - SCALE % states.size)
  }

  test("qc_expectation_suite: integer pass rule, designed failure surfaces") {
    val out = SparkEntry.queries("qc_expectation_suite")(spark, sfDir).collect()
    assert(out.length == 6)
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "n_ok <= n_checked")
      assert(r.getBoolean(5) == (r.getLong(3) == r.getLong(2)),
        s"rule ${r.getLong(0)}: pass decided on exact integers")
    }
    val byId = out.map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(!byId(3L), "(l_orderkey, l_linenumber) is known non-unique — rule 3 must fail")
    assert(Seq(1L, 2L, 4L, 5L, 6L).forall(byId), "contract rules hold on this data")
  }

  test("u13: MERGE bookkeeping identities hold") {
    val r = SparkEntry.queries("u13_merge_apply")(spark, sfDir).collect().head
    val (nt, nu, nd, ni, nr) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nr == nt + ni - nd, "result rows = target + inserts - deletes")
    // Balance: each update adds exactly 100 cents; deletes remove their
    // row's cents; inserts add theirs. Verify via the raw table.
    val orders = Tables.orders(spark, sfDir)
      .selectExpr("o_orderkey AS k", "CAST(ROUND(o_totalprice * 100) AS LONG) AS cents")
      .collect().map(x => x.getLong(0) -> x.getLong(1))
    val delCents = orders.filter { case (k, _) => k % 7 != 0 && k % 11 == 0 }.map(_._2).sum
    val insCents = orders.filter { case (k, _) => k % 7 != 0 && k % 11 != 0 && k % 13 == 0 }
      .map(_._2).sum
    assert(r.getLong(6) == r.getLong(5) + nu * 100 - delCents + insCents,
      "cents_after = cents_before + 100/update - deleted + inserted")
    assert(nu == orders.count(_._1 % 7 == 0).toLong)
  }

  test("mm5: census equals the sequential aHash replay") {
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def ahash(text: String): Long = {
      val pw = text.padTo(256, ' ').take(256)
      val bsums = (0 until 16).map(k => (0 until 16).map(i => pw(k * 16 + i).toLong).sum)
      val total = bsums.sum
      (0 until 16).map(k => if (bsums(k) * 16 > total) 1L << k else 0L).sum
    }
    val hs = texts.map { case (id, t) => id -> ahash(t) }
    val byHash = hs.groupBy(_._2)
    val exactPairs = byHash.values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val ham1 = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      if java.lang.Long.bitCount(ha ^ hb) == 1
    } yield 1).size.toLong
    val r = SparkEntry.queries("mm5_phash_dedup")(spark, sfDir).collect().head
    assert(r.getLong(0) == texts.length.toLong)
    assert(r.getLong(1) == byHash.size.toLong, "n_distinct_hashes")
    assert(r.getLong(2) == byHash.values.map(_.size).max.toLong, "max_cluster")
    assert(r.getLong(3) == exactPairs, "n_exact_pairs")
    assert(r.getLong(4) == ham1, "n_hamming1_pairs")
  }

  test("mm6: batch composition conserves docs and fills the 2:1:1 recipe") {
    val nDocs = Tables.documents(spark, sfDir).count()
    val batches = SparkEntry.queries("mm6_batch_compose")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(5)))
    assert(batches.map(b => b._2 + b._3 + b._4).sum == nDocs,
      "every doc lands in exactly one batch")
    // complete batches carry exactly the recipe; incomplete ones exist
    // only at the per-modality tails
    batches.filter(_._5).foreach { b =>
      assert((b._2, b._3, b._4) == ((2L, 1L, 1L)), s"batch ${b._1}")
    }
    val nText = batches.map(_._2).sum
    val nImg = batches.map(_._3).sum
    val nAud = batches.map(_._4).sum
    val fullBatches = math.min(math.min(nText / 2, nImg), nAud)
    assert(batches.count(_._5) == fullBatches,
      "complete-batch count = min over modality capacities")
  }
}
