package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.Fixtures

/** Round-12 gates: semantic invariants beyond the DuckDB hash oracle. */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()
  val sfDir = "/root/testdata/sf0.001"

  test("a27: quantile profile is monotone and its p50 equals the built-in " +
    "percentile_disc") {
    val rows = SparkEntry.queries("a27_group_quantiles")(spark, sfDir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val qs = (2 to 7).map(r.getDouble) // p10 p25 p50 p75 p90 p99
      assert(qs == qs.sorted, s"${r.getString(0)}: profile not monotone: $qs")
    }
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("a27_li")
    val builtin = spark.sql(
      """SELECT l_returnflag,
        |       percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p
        |FROM a27_li GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(r.getDouble(4) == builtin(r.getString(0)),
      s"${r.getString(0)}: p50 drifted from percentile_disc"))
  }

  test("sa20: temperature mixture normalizes, boosts the tail and flattens " +
    "the head") {
    val rows = SparkEntry.queries("sa20_temperature_mixture")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "p_shares must sum to 1")
    val byN = rows.sortBy(_._2)
    assert(byN.head._5 > 1.0, s"rarest language must be boosted: ${byN.head}")
    assert(byN.last._5 < 1.0, s"dominant language must be damped: ${byN.last}")
    // alpha < 1 compresses the share spread
    def spread(xs: Seq[Double]) = xs.max / xs.min
    assert(spread(rows.map(_._4).toSeq) < spread(rows.map(_._3).toSeq),
      "temperature must flatten the distribution")
  }

  test("dd27: estimation error is exactly est minus exact and the sketch " +
    "tracks exact Jaccard within minhash variance") {
    val rows = SparkEntry.queries("dd27_minhash_estimate")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, jac, err) = (r.getDouble(2), r.getDouble(4), r.getDouble(5))
      assert(err == est - jac)
      assert(est >= 0.5, "only LSH-surfaced pairs are audited")
      assert(jac >= 0.0 && jac <= 1.0)
      // K=16 minhashes: sd <= 0.125; 4 sd is a hard per-pair ceiling
      assert(math.abs(err) <= 0.5, s"sketch error implausibly large: $r")
    }
    val meanAbs = rows.map(r => math.abs(r.getDouble(5))).sum / rows.length
    assert(meanAbs <= 0.2, s"mean |error| $meanAbs exceeds minhash variance")
  }
}
