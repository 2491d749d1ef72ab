package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.Fixtures

/** The spark.sql.extensions path must wire every custom piece without any
  * runtime register() call: sessions created with the conf get the
  * strategy, the optimizer rule, and the catalog function. */
class GraftExtensionsSpec extends AnyFunSuite {

  // `spark.sql.extensions` is a STATIC conf: in a fresh spark-submit it is
  // read at context creation, but this JVM already holds a SparkContext, so
  // the test exercises the equivalent programmatic path — the same
  // GraftExtensions instance handed to Builder.withExtensions.
  private def withExtendedSession(f: SparkSession => Unit): Unit = {
    val orig = Fixtures.sparkSession() // ensures a context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions().apply(_))
        .getOrCreate()
      assert(s2 ne orig, "extensions require a fresh session")
      f(s2)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("cosine_sim resolves from the catalog registry (no register() call)") {
    withExtendedSession { s =>
      val r = s.sql(
        "SELECT cosine_sim(array(1.0D, 0.0D, 1.0D), array(1.0D, 0.0D, 1.0D)) AS c")
        .first().getDouble(0)
      assert(math.abs(r - 1.0) < 1e-12)
      val orth = s.sql(
        "SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 2.0D)) AS c")
        .first().getDouble(0)
      assert(math.abs(orth) < 1e-12)
    }
  }

  test("row_number top-N idiom rewrites to TopKPerGroup via injected rule") {
    withExtendedSession { s =>
      import s.implicits._
      val df = Seq((1, 10.0), (1, 20.0), (1, 30.0), (2, 5.0), (2, 15.0))
        .toDF("k", "v")
      df.createOrReplaceTempView("ext_t")
      val q = s.sql(
        """SELECT k, v FROM (
          |  SELECT k, v, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) AS rn
          |  FROM ext_t) WHERE rn <= 2""".stripMargin)
      assert(q.queryExecution.executedPlan.toString.contains("TopKPerGroup"),
        q.queryExecution.executedPlan.toString)
      assert(q.collect().map(r => (r.getInt(0), r.getDouble(1))).toSet ==
        Set((1, 30.0), (1, 20.0), (2, 15.0), (2, 5.0)))
    }
  }
}
