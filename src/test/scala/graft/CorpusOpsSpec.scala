package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.Fixtures

/** Structural invariants of the corpus-build operators added in round 4:
  * span-level dedup (dd11), embedding-space manifest (dd12), and int8
  * quantization (sim4). These hold by construction at every scale, so they
  * are the properties a refactor must not break. */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()
  val sfDir = "/root/testdata/sf0.001"

  test("dd11: every distinct span survives exactly once corpus-wide") {
    val out = SparkEntry.queries("dd11_chunk_dedup")(spark, sfDir).cache()
    val totalKept = out.agg(sum("n_kept")).collect()(0).getLong(0)
    // independent count of distinct spans, same chunking formula
    val distinctSpans = Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("ts"))
      .select(explode(expr(
        """transform(sequence(0, CAST(floor((size(ts) - 1) / 10) AS INT)),
           i -> concat_ws(' ', slice(ts, i * 10 + 1, 10)))""")).as("chunk"))
      .distinct().count()
    assert(totalKept == distinctSpans,
      s"kept $totalKept spans but corpus has $distinctSpans distinct")
    // dedup never grows a document
    assert(out.filter(col("n_kept") > col("n_chunks")).count() == 0)
    out.unpersist()
  }

  test("dd12: exactly one keeper per cluster, and it is the min vec_id") {
    val m = SparkEntry.queries("dd12_embedding_manifest")(spark, sfDir).cache()
    val badClusters = m.groupBy("cluster_id")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("keepers"),
        min("vec_id").as("lo"), first(col("cluster_id")).as("cid"))
      .filter(col("keepers") =!= 1 || col("lo") =!= col("cid"))
      .count()
    assert(badClusters == 0)
    // manifest covers the whole corpus, once
    val n = Tables.embeddings(spark, sfDir).count()
    assert(m.count() == n && m.select("vec_id").distinct().count() == n)
    m.unpersist()
  }

  test("sim4: codes are int8-range and reconstruction error is within half a step") {
    val codes = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("lo", expr("array_min(v)"))
      .withColumn("hi", expr("array_max(v)"))
      .withColumn("codes", expr(
        """transform(v, x -> CASE WHEN hi = lo THEN 0
           ELSE CAST(floor((x - lo) / (hi - lo) * 255 + 0.5) AS INT) END)"""))
      // worst-case |x - dequant(code)| over the vector, in units of one
      // quantization step (hi-lo)/255: affine rounding guarantees <= 0.5
      .withColumn("max_err_steps", expr(
        """aggregate(zip_with(v, codes, (x, c) ->
             abs((x - lo) / ((hi - lo) / 255) - c)), 0D, (a, e) -> greatest(a, e))"""))
    assert(codes.filter(expr(
      "exists(codes, c -> c < 0 OR c > 255)")).count() == 0)
    assert(codes.filter(col("max_err_steps") > 0.5 + 1e-9).count() == 0)
  }

  test("dd19: verdicts match an in-memory recomputation of both dup checks") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def fp(t: String) = t.toLowerCase.split(" ", -1).distinct.sorted.mkString(" ")
    def grams(t: String): Set[String] = {
      val ts = t.split(" ", -1)
      (0 to ts.length - 3).map(i => s"${ts(i)} ${ts(i + 1)} ${ts(i + 2)}").toSet
    }
    val (batch, corpus) = docs.partition(_._1 % 10 == 0)
    val corpusFps = corpus.values.map(fp).toSet
    val corpusGrams = corpus.map { case (id, t) => id -> grams(t) }
    val out = SparkEntry.queries("dd19_incremental_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(3),
        r.getString(5))).toList
    // exactly the batch docs, each exactly once
    assert(out.map(_._1).toSet == batch.keySet && out.size == batch.size)
    out.foreach { case (id, isExact, nNear, verdict) =>
      assert(isExact == corpusFps.contains(fp(docs(id))), s"doc $id exact flag")
      val g = grams(docs(id))
      val expectedNear = corpusGrams.count { case (_, cg) =>
        val inter = (g & cg).size
        inter > 0 && inter.toDouble / (g.size + cg.size - inter) >= 0.5
      }
      assert(nNear == expectedNear.toLong, s"doc $id near count")
      assert(verdict == (if (isExact || nNear > 0) "drop" else "keep"))
    }
    // the check is only meaningful if both verdicts actually occur
    assert(out.exists(_._4 == "drop") && out.exists(_._4 == "keep"))
  }

  test("tx22: Flesch inputs replay from raw text; score obeys the formula") {
    val out = SparkEntry.queries("tx22_readability")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
    out.foreach { r =>
      val texts = docs(r.getString(0)).map(_._2)
      val words = texts.map(_.split(" ", -1).length.toLong).sum
      val sentences = texts.map(t => math.ceil(t.split(" ", -1).length / 15.0).toLong).sum
      val syllables = texts.map(t => "[aeiouy]+".r.findAllIn(t).length.toLong).sum
      assert(r.getLong(2) == words, "words")
      assert(r.getLong(3) == sentences, "sentences")
      assert(r.getLong(4) == syllables, "syllables")
      val expect = 206.835 - 1.015 * (words.toDouble / sentences) -
        84.6 * (syllables.toDouble / words)
      assert(math.abs(r.getDouble(5) - expect) < 1e-3, "flesch")
    }
  }

  test("tok3: coverage is monotone in vocab size and cumulative counts replay") {
    val out = SparkEntry.queries("tok3_vocab_coverage")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.nonEmpty)
    val grams = Tables.documents(spark, sfDir).select("text").collect()
      .flatMap(r => r.getString(0).sliding(4).filter(_.length == 4))
    val ranked = grams.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case (g, f) => (-f, g) }
    out.foreach { case (k, gAt, cum, total, cov) =>
      assert(total == grams.length, "total grams")
      assert(gAt == ranked(k.toInt - 1)._1, s"gram at cut $k")
      assert(cum == ranked.take(k.toInt).map(_._2).sum, s"cum at $k")
      assert(math.abs(cov - cum.toDouble / total) < 1e-5)
    }
    assert(out.map(_._5).sorted.toSeq == out.map(_._5).toSeq, "coverage monotone")
  }

  test("f27: transition rows are probability distributions per prev state") {
    val out = SparkEntry.queries("f27_markov_transitions")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "row sums to 1")
    }
    out.foreach { case (p, n, _, prob, self) =>
      assert(self == (p == n), "self-loop flag")
      assert(prob > 0.0 && prob <= 1.0)
    }
    // conservation: total transitions = total events - number of users
    val ev = Tables.events(spark, sfDir).select("user_id").collect()
    val nUsers = ev.map(_.getLong(0)).distinct.length
    assert(out.map(_._3).sum == ev.length - nUsers, "transition conservation")
  }
}
