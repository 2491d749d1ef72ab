package graft

import org.apache.spark.sql.{Encoders, functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGries
import graft.tlc.Fixtures

/** The custom heavy-hitters aggregate: exact below capacity, and within
  * the n/(capacity+1) undercount bound above it — across real shuffled
  * partials, not a single in-memory fold. */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()

  private def run(values: Seq[String], capacity: Int): Map[String, Long] = {
    import spark.implicits._
    val mg = F.udaf(MisraGries(capacity), Encoders.STRING)
    values.toDF("v").repartition(8)
      .agg(mg(F.col("v")).as("hh"))
      .collect()(0).getMap[String, Long](0).toMap
  }

  test("exact when capacity >= distinct count") {
    val data = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(7)("c")
    assert(run(scala.util.Random.shuffle(data), 8) ==
      Map("a" -> 30L, "b" -> 20L, "c" -> 7L))
  }

  test("above capacity: heavy hitters survive within the undercount bound") {
    // 100 'a' + 50 'b' + 60 singletons; n = 210, capacity 4 -> bound 42.
    val data = Seq.fill(100)("a") ++ Seq.fill(50)("b") ++
      (1 to 60).map(i => s"x$i")
    val r = run(scala.util.Random.shuffle(data), 4)
    val n = data.size
    val bound = n / 5
    assert(r.contains("a") && r.contains("b"), s"heavy hitters lost: $r")
    assert(r("a") <= 100 && r("a") >= 100 - bound, r.toString)
    assert(r("b") <= 50 && r("b") >= 50 - bound, r.toString)
    assert(r.size <= 4)
  }

  test("merge of disjoint partials sums counts") {
    val data = (1 to 3).flatMap(i => Seq.fill(10 * i)(s"k$i"))
    assert(run(data, 3) == Map("k1" -> 10L, "k2" -> 20L, "k3" -> 30L))
  }
}
