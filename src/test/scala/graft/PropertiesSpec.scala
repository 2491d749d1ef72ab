package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.{Fixtures, Standardize}

/** ScalaCheck-generated properties (SURVEY.md §5 strategy item 3):
  * NULLIF-guard semantics, is_valid monotonicity, hash-family invariants. */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()

  test("safeDiv is NULL exactly when the denominator is 0, else a/b") {
    import spark.implicits._
    val cases = Gen.listOfN(50,
      Gen.zip(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(-100.0, 100.0))).sample.get
    val df = (cases :+ ((5.0, 0.0))).toDF("a", "b")
      .withColumn("q", graft.functions.Exact.safeDiv(col("a"), col("b")))
      .collect()
    df.foreach { r =>
      val (a, b) = (r.getDouble(0), r.getDouble(1))
      if (b == 0.0) assert(r.isNullAt(2))
      else assert(r.getDouble(2) == a / b)
    }
  }

  test("is_valid monotonicity: corrupting any validity input never flips invalid→valid") {
    val base = Fixtures.yellow(spark)
    val valid = Standardize.yellow(base).filter(col("is_valid")).count()
    assert(valid == 4)
    // corrupting each input individually can only reduce the valid count
    val corruptions = Seq(
      base.withColumn("total_amount", -abs(col("total_amount"))),
      base.withColumn("trip_distance", -abs(col("trip_distance"))),
      base.withColumn("tpep_dropoff_datetime",
        col("tpep_pickup_datetime") - expr("INTERVAL 1 SECOND")))
    corruptions.foreach { bad =>
      assert(Standardize.yellow(bad).filter(col("is_valid")).count() == 0)
    }
  }

  test("minhash affine family: a_i odd and positive, values within [0, 2^31)") {
    (0 until 64).foreach { i =>
      val a = graft.ops.DedupOps.hashA(i)
      val b = graft.ops.DedupOps.hashB(i)
      assert(a % 2 == 1 && a > 0 && a < (1L << 31))
      assert(b >= 0 && b < (1L << 31))
    }
    // distinct draws — a degenerate family would collapse the signature
    assert((0 until 16).map(graft.ops.DedupOps.hashA).distinct.size == 16)
  }

  test("content-hash trip ids: permutation-invariant to input row order") {
    val base = Fixtures.yellow(spark)
    val shuffled = base.orderBy(rand(seed = 7))
    val a = Standardize.yellow(base).select("trip_id")
    val b = Standardize.yellow(shuffled).select("trip_id")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }
}
