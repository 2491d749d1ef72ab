package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.Fixtures

/** Structural invariants of the late-round operators: salted join
  * algebra, funnel ordering, rolling-distinct bounds, corrupt-record
  * accounting, and the rolling-anomaly baseline. These hold by
  * construction at any scale. */
class LateRoundOpsSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()
  val sfDir = "/root/testdata/sf0.001"

  test("j14: salted join equals the plain unsalted join") {
    val salted = SparkEntry.queries("j14_salted_join")(spark, sfDir)
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        graft.functions.Exact.dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderpriority")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("f15: conversions are bounded by clickers and delays are non-negative") {
    val r = SparkEntry.queries("f15_funnel")(spark, sfDir).collect()(0)
    val (clicked, converted, delay) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(converted <= clicked)
    assert(delay >= 0L)
    assert(r.getDouble(3) == converted.toDouble / clicked)
  }

  test("a21: 7-day active users bound daily actives and total users") {
    val rolling = SparkEntry.queries("a21_rolling_distinct")(spark, sfDir).cache()
    val totalUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    val daily = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("report_day"))
      .agg(countDistinct(col("user_id")).as("daily"))
    val joined = rolling.join(daily, Seq("report_day"))
    // the 7-day window can only add users relative to its last day, and
    // never exceeds the population
    assert(joined.filter(col("active_users_7d") < col("daily")).count() == 0)
    assert(rolling.filter(col("active_users_7d") > totalUsers).count() == 0)
    rolling.unpersist()
  }

  test("f16: corrupt + valid partition the file, with no silent drops") {
    val r = SparkEntry.queries("f16_corrupt_json")(spark, sfDir).collect()(0)
    assert(r.getLong(0) == r.getLong(1) + r.getLong(2),
      "every line must be either valid or quarantined")
    assert(r.getLong(1) > 0, "the staged file must actually contain corrupt lines")
  }

  test("ts3: rolling baseline is gap-aware, excludes today, and flags obey it") {
    val rows = SparkEntry.queries("ts3_rolling_anomaly")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getDouble(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        r.getBoolean(6)))
    val daysByUser = rows.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).toSet }
    rows.foreach { case (u, dn, x, n, mean, std, flag) =>
      // gap-aware PRIOR-days frame: today never baselines itself
      val expectedN = (dn - 7 to dn - 1).count(daysByUser(u).contains).toLong
      assert(n == expectedN, s"user $u day $dn window size")
      assert(mean.isDefined == (n > 0) && std.isDefined == (n > 0),
        s"user $u day $dn stats nullability")
      std.foreach(s => assert(s >= 0.0))
      // the flag must be consistent with the emitted stats
      val expectFlag = n >= 4 && std.exists(_ > 0.0) &&
        std.exists(s => math.abs(x - mean.get) > s * 2.0)
      assert(flag == expectFlag, s"user $u day $dn flag")
    }
    // the gate is only meaningful if some baseline actually fills to 7
    assert(rows.exists(_._4 == 7L))
    // with the exclusive frame, a genuine spike CAN fire (the inclusive
    // form provably could not at n=4) — the fixture data must show some
    assert(rows.exists(_._7), "no anomaly fired anywhere at sf0.001")
  }

  test("tx24: perplexity = 2^bits_per_token, only multi-token docs scored, " +
    "and a uniform-corpus doc scores near the vocab-uniform ceiling") {
    val r = SparkEntry.queries("tx24_ngram_perplexity")(spark, sfDir).collect()
    val multiTok = Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(r.length == multiTok, "every >=2-token doc gets exactly one score")
    r.foreach { row =>
      val (h, ppl) = (row.getDouble(2), row.getDouble(3))
      assert(h > 0.0 && ppl > 1.0)
      // ppl was rounded at 2, h at 4: consistency within rounding slack
      assert(math.abs(math.pow(2.0, h) - ppl) <= 0.01 * ppl + 0.01,
        s"doc ${row.getLong(0)}: 2^$h != $ppl")
      // add-one smoothing bounds every conditional by 1/(c1+V) >= 1/(N+V):
      // bits/token can never exceed log2(corpus bigrams + vocab)
      assert(h <= 30.0)
    }
  }

  test("sa18: DSIR weights rank the target slice above the complement") {
    val top = SparkEntry.queries("sa18_dsir_resample")(spark, sfDir).collect()
    assert(top.length == 100)
    // ranked by rounded weight desc, doc_id asc
    val ws = top.map(_.getDouble(3)).toSeq
    assert(ws == ws.sorted.reverse, "not sorted by weight desc")
    // the whole point of DSIR: importance weights pull the target slice
    // to the front. The synthetic corpus draws every lang from ONE shared
    // 31-token vocabulary (label is independent of content), so the only
    // guaranteed pull is the self-estimation bias — the target counts are
    // estimated FROM the en slice, so en docs fit p_target strictly
    // better on average. Assert that bias end-to-end: en share of the
    // top-100 strictly above the corpus base rate (0.386 at this sf).
    val baseRate = {
      val docs = Tables.documents(spark, sfDir)
      docs.filter(col("lang") === "en").count().toDouble / docs.count()
    }
    val enShare = top.count(_.getString(1) == "en").toDouble / top.length
    assert(enShare > baseRate,
      s"top-100 en share $enShare not above base rate $baseRate")
  }

  test("a13: sketch columns stay inside their declared error bounds; exact " +
    "columns equal the hash-gated twin") {
    val sketches = graft.operators.SessionScaleOps.a13Full(spark, sfDir)
      .orderBy("o_orderpriority")
      .select("o_orderpriority", "exact_distinct", "exact_median",
        "distinct_rel_err", "median_rel_err")
      .collect()
    assert(sketches.nonEmpty)
    sketches.foreach { r =>
      val prio = r.getString(0)
      // approx_count_distinct was asked for rsd = 0.02; HLL++ at that rsd
      // stays within a few standard errors on any input — 10% is a hard
      // ceiling that still catches a broken sketch outright
      assert(r.getDouble(3) <= 0.10, s"$prio: HLL distinct rel err ${r.getDouble(3)}")
      // percentile_approx at accuracy 10000 has rank error <= n/10000; at
      // fixture scale that is exact-or-near-exact — 5% value error ceiling
      assert(r.getDouble(4) <= 0.05, s"$prio: approx median rel err ${r.getDouble(4)}")
    }
    // and the GATE's booleans must all be true (same bounds, hash-gated)
    val gated = SparkEntry.queries("a13_approx_sketches")(spark, sfDir).collect()
    assert(gated.forall(g => g.getBoolean(4) && g.getBoolean(5)))
    // the exact columns must be THE SAME numbers the hash-gated twin
    // (a13_exact_stats, full DuckDB oracle) verifies cross-engine
    val twin = SparkEntry.queries("a13_exact_stats")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    sketches.foreach { r =>
      val (d, m) = twin(r.getString(0))
      assert(r.getLong(1) == d, s"${r.getString(0)}: exact_distinct drifted from twin")
      assert(math.abs(r.getDouble(2) - m) <= 5e-5,
        s"${r.getString(0)}: exact_median drifted from twin")
    }
  }
}
