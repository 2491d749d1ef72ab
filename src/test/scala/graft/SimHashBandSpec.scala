package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.Fixtures

/** dd10's pigeonhole guarantee (Manku et al., WWW'07): with 4 byte-bands
  * over a 32-bit signature, any pair within Hamming distance 3 (< number of
  * bands) MUST agree on at least one whole band, so the band equi-join has
  * perfect recall there; beyond it recall degrades gracefully and every
  * emitted pair carries its exact verified distance. */
class SimHashBandSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()
  val sfDir = "/root/testdata/sf0.001"

  test("band join recall is exactly 1.0 for hamming <= 3, precision 1.0 for the <= 8 gate") {
    val sigs = SparkEntry.queries("dd3_simhash")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // brute-force ground truth on the sf0.001 corpus
    val truth = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs if ida < idb
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 8
    } yield (ida, idb) -> h.toLong).toMap
    val got = SparkEntry.queries("dd10_simhash_bands")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // precision: everything emitted is a true <=8 pair with the right distance
    got.foreach { case (pair, h) => assert(truth.get(pair).contains(h)) }
    // guaranteed recall region: every true <=3 pair is found
    val guaranteed = truth.filter(_._2 <= 3).keySet
    assert(guaranteed.subsetOf(got.keySet),
      s"missed guaranteed pairs: ${guaranteed diff got.keySet}")
    assert(got.nonEmpty)
  }

  test("sa8: mixture plan conserves tokens and targets sum to one") {
    val rows = SparkEntry.queries("sa8_mixture_plan")(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("de", "en", "es", "fr", "zh"))
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-12,
      "target shares must form a distribution")
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-12,
      "corpus shares must form a distribution")
    rows.foreach { r =>
      assert(r.getDouble(5) > 0.0, s"${r.getString(0)} rate must be positive")
      // rate * corpus_share recovers the target (the plan is consistent).
      assert(math.abs(r.getDouble(5) * r.getDouble(3) - r.getDouble(4)) < 1e-12)
    }
  }

  test("sa3: splits partition the corpus and are append-stable") {
    val rows = SparkEntry.queries("sa3_split_assign")(spark, sfDir).collect()
    val total = rows.map(_.getLong(1)).sum
    val corpus = Tables.documents(spark, sfDir).count()
    assert(total == corpus, "splits must partition the corpus exactly")
    // append-stability: membership depends only on doc_id, so recomputing
    // over a PREFIX of the corpus yields assignments consistent with full
    val half = Tables.documents(spark, sfDir).filter(col("doc_id") < 25)
      .withColumn("h", expr(
        "CAST(conv(substring(md5(concat('graft-split', CAST(doc_id AS STRING))), 1, 7), 16, 10) AS BIGINT)"))
      .withColumn("split",
        when(pmod(col("h"), lit(100)) < 90, "train")
          .when(pmod(col("h"), lit(100)) < 95, "val").otherwise("test"))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(half.values.sum == 25)
  }
}
