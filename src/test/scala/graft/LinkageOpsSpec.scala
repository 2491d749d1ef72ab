package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JaroWinklerSimilarity
import graft.tlc.Fixtures

/** Kernel-level checks for the codegen'd Jaro-Winkler expression plus
  * in-memory replays of the linkage / bootstrap / assortativity operators
  * at sf0.001. The driver's DuckDB gate (jaro_winkler_similarity is the
  * oracle comparator) covers cross-engine agreement pair-by-pair. */
class LinkageOpsSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()
  val sfDir = "/root/testdata/sf0.001"

  private def jw(a: String, b: String): Double =
    JaroWinklerSimilarity.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro_winkler kernel matches the textbook values DuckDB returns") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-15)
    assert(math.abs(jw("aabbcc", "ccbbaa") - 0.5555555555555555) < 1e-15)
    assert(math.abs(jw("abcdef", "fedcba") - 0.38888888888888884) < 1e-15)
    assert(jw("", "") == 0.0 && jw("", "abc") == 0.0 && jw("a", "b") == 0.0)
    assert(jw("abc", "abc") == 1.0 && jw("a", "a") == 1.0)
  }

  test("jaro_winkler matches DuckDB's BYTE-level semantics on non-ASCII input") {
    // DuckDB's jaro_winkler_similarity compares raw UTF-8 bytes: 'ébc' is a
    // 4-byte string. Values below are DuckDB 1.0 outputs — a char-level
    // kernel would return 0.7778 / 0.6667 instead and break the f26/dd23
    // gates the moment an accented character enters a blocked prefix.
    assert(math.abs(jw("ébc", "abc") - 0.7222222222222222) < 1e-12)
    assert(jw("éb", "ab") == 0.0)
    assert(jw("é", "é") == 1.0, "multi-byte self-match")
  }

  test("jaro_winkler is symmetric, bounded, and boosts only above 0.7") {
    val samples = Seq("alpha", "alpaca", "beta", "betamax", "gamma", "gamut",
      "", "a", "ab", "xylophone", "xylograph")
    for (a <- samples; b <- samples) {
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0, s"[$a,$b] in range")
      assert(s == jw(b, a), s"[$a,$b] symmetric")
    }
    // below-threshold pair keeps raw jaro even with a shared prefix:
    // jw(abcdef, abdcfe...) constructed: prefix 2 but jaro <= 0.7 -> no boost
    val raw = jw("abqqqqqq", "abzzzzzz")
    assert(raw <= 0.7, "constructed pair stays below the boost threshold")
  }

  test("f26: bucket census conserves the blocked pair count") {
    val out = SparkEntry.queries("f26_jaro_winkler")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getString(1), r.getLong(2) / 50))
    val expectPairs = docs.groupBy(identity).values.map(g => g.length.toLong * (g.length - 1) / 2).sum
    assert(out.map(_.getLong(2)).sum == expectPairs, "pair conservation")
    out.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 10, "bucket in [0,10]")
    }
  }

  test("dd23: every score is one of the 8 reachable weight combinations") {
    val out = SparkEntry.queries("dd23_er_score")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val reachable = (for {
      a <- Seq(24L, -8L); b <- Seq(16L, -4L); c <- Seq(30L, -10L)
    } yield a + b + c).toSet
    out.foreach(r => assert(reachable(r.getLong(1)), s"score ${r.getLong(1)}"))
  }

  test("sa12: point mean matches recomputation; interval brackets are ordered") {
    val out = SparkEntry.queries("sa12_bootstrap_ci")(spark, sfDir).collect()
    assert(out.length == 5)
    val byPrio = Tables.orders(spark, sfDir)
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1)
    out.foreach { r =>
      val xs = byPrio(r.getString(0)).map(_._2)
      assert(r.getLong(1) == xs.length, "n_orders")
      val mean = xs.sum.toDouble / xs.length / 100.0
      assert(math.abs(r.getDouble(2) - mean) < 1e-3, "point mean")
      assert(r.getDouble(3) <= r.getDouble(4), "lo <= hi")
      // the interval contains the point estimate for any near-symmetric
      // resampling of a mean (sanity, not a distributional claim)
      assert(r.getDouble(3) <= r.getDouble(2) + 1.0 &&
        r.getDouble(4) >= r.getDouble(2) - 1.0)
    }
  }

  test("g4: assortativity matches an in-memory Pearson over the edge degrees") {
    val out = SparkEntry.queries("g4_assortativity")(spark, sfDir).collect()
    assert(out.length == 1)
    val r = out.head.getDouble(1)
    assert(r >= -1.0 && r <= 1.0, "bounded")
    val (adj, deg) = graft.operators.GraphOps.adjacency(spark, sfDir)
    val degMap = deg.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val es = adj.select("src", "dst").collect()
      .map(x => (degMap(x.getLong(0)).toDouble, degMap(x.getLong(1)).toDouble))
    val n = es.length.toDouble
    val sx = es.map(_._1).sum; val sy = es.map(_._2).sum
    val sxy = es.map(p => p._1 * p._2).sum
    val sxx = es.map(p => p._1 * p._1).sum
    val syy = es.map(p => p._2 * p._2).sum
    val expect = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(r - expect) < 1e-5, s"assortativity $r vs $expect")
    assert(out.head.getLong(0) == es.length, "n_edges")
  }
}
