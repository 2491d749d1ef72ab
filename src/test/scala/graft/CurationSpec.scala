package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.Fixtures

/** Round-5 curation/layout pack: the claims the oracle gates can't see —
  * Z-order's file-level skipping consequence, the chunk-aligned equi join
  * matching the naive range join it replaces, and TF-IDF/negative-pair
  * invariants. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()
  val sfDir = "/root/testdata/sf0.001"

  test("s15: z-order range layout yields tile-local per-partition bounding boxes") {
    val o = Tables.orders(spark, sfDir)
      .withColumn("x", pmod(col("o_custkey"), lit(256L)))
      .withColumn("y", pmod(col("o_orderkey"), lit(256L)))
    val z = (0 until 8).map { i =>
      shiftleft(shiftright(col("x"), i).bitwiseAND(lit(1L)), 2 * i) +
      shiftleft(shiftright(col("y"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    val zed = o.withColumn("z", z)
    def meanBBox(df: org.apache.spark.sql.DataFrame): Double = {
      val boxes = df
        .groupBy(spark_partition_id().as("pid"))
        .agg(((max(col("x")) - min(col("x")) + 1L) *
              (max(col("y")) - min(col("y")) + 1L)).as("area"))
        .agg(avg(col("area"))).collect()(0).getDouble(0)
      boxes
    }
    // Z-ordered range layout: contiguous z ranges are 2-D tiles, so each
    // output file's (x, y) zone map covers a small rectangle. A hash layout
    // spreads every partition across the full 256×256 domain.
    val zLayout = meanBBox(zed.repartitionByRange(16, col("z")))
    val hashLayout = meanBBox(zed.repartition(16, col("z")))
    assert(zLayout * 4 < hashLayout,
      s"z-range layout bbox $zLayout should be <1/4 of hash layout $hashLayout")
  }

  test("j16: chunk-aligned equi join reproduces the naive BETWEEN range join") {
    val viaChunks = operators.CurationOps.queries("j16_scd2_range_join")(spark, sfDir)
    // Naive form: non-equi join against the same dim (BroadcastNestedLoop).
    val orders = Tables.orders(spark, sfDir)
    val span = orders.agg(
      min(to_date(col("o_orderdate"))).as("d0"),
      max(to_date(col("o_orderdate"))).as("d1"))
    val offs = "CASE (%s) %% 3 WHEN 0 THEN ((%s) div 3) * 135 WHEN 1 THEN ((%s) div 3) * 135 + 30 ELSE ((%s) div 3) * 135 + 75 END"
    val dim = span
      .select(col("d0"),
        explode(expr("sequence(0, (datediff(d1, d0) div 135 + 2) * 3)")).as("k"))
      .withColumn("off0", expr(offs.format("k", "k", "k", "k")))
      .withColumn("off1", expr(offs.format("k+1", "k+1", "k+1", "k+1")))
      .withColumn("valid_from", expr("date_add(d0, cast(off0 as int))"))
      .withColumn("valid_to", expr("date_add(d0, cast(off1 as int))"))
      .withColumn("rate", lit(1.0) + (col("k") % 7).cast("double") * lit(0.01))
      .select("k", "valid_from", "valid_to", "rate")
    val naive = orders.withColumn("od", to_date(col("o_orderdate")))
      .join(broadcast(dim),
        col("od") >= col("valid_from") && col("od") < col("valid_to"))
      .groupBy(col("k").as("period_id"), col("valid_from"), col("valid_to"), col("rate"))
      .agg(count(lit(1)).as("n_orders"),
        functions.Exact.dsum(col("o_totalprice") * col("rate")).as("adj_revenue"))
      .orderBy("period_id")
    assert(viaChunks.collect().toSeq == naive.collect().toSeq)
  }

  test("tx13: rank-1 term has the maximum tf-idf in its document") {
    val top = operators.CurationOps.queries("tx13_tfidf_topterms")(spark, sfDir)
      .filter(col("rk") === 1).select("doc_id", "tfidf")
      .withColumnRenamed("tfidf", "top_score")
    val all = operators.CurationOps.queries("tx13_tfidf_topterms")(spark, sfDir)
      .groupBy("doc_id").agg(max(col("tfidf")).as("max_score"))
    val bad = top.join(all, "doc_id")
      .filter(col("top_score") < col("max_score")).count()
    assert(bad == 0)
  }

  test("j17: bucket-exploded band join reproduces the naive inequality join") {
    val viaBuckets = operators.CurationOps.queries("j17_interval_join")(spark, sfDir)
    val HOUR_US = 3600L * 1000000L
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("t_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("t_us").as("t1"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u2"), col("t_us").as("t2"))
    val naive = c.join(p, col("user_id") === col("u2") &&
        col("t2") > col("t1") && col("t2") <= col("t1") + HOUR_US)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("t2") - col("t1")).as("total_delay_us"),
        min(col("t2") - col("t1")).as("min_delay_us"),
        max(col("t2") - col("t1")).as("max_delay_us"))
      .orderBy("user_id")
    assert(viaBuckets.collect().toSeq == naive.collect().toSeq)
  }

  test("j18: bloom pre-filter passes every match and filters hard") {
    val exact = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir).filter(col("c_nationkey") === 3)
        .select(col("c_custkey")), col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    val gate = operators.CurationOps.queries("j18_bloom_semi")(spark, sfDir)
      .collect()(0)
    assert(gate.getLong(0) == exact, "bloom+exact must equal the plain semi join")
    // No false negatives (candidates ⊇ matches) and a real reduction: a
    // 4096-bit / 3-hash bloom over this key set has a sub-1% fp rate, so a
    // candidate set beyond 1.5x the matches means the bit plumbing broke.
    val candidates = operators.CurationOps.bloomCandidates(spark, sfDir).count()
    val total = Tables.orders(spark, sfDir).count()
    assert(candidates >= exact)
    assert(candidates <= (exact * 1.5).toLong + 1,
      s"bloom not filtering: $candidates candidates vs $exact matches of $total")
  }

  test("w15: sequential partition walk matches a per-group in-memory fold") {
    val viaWalk = operators.CurationOps.queries("w15_ewma_decay")(spark, sfDir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val rows = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = rows.groupBy(_._1).map { case (u, es) =>
      val ewma = es.sortBy(e => (e._2, e._3)).foldLeft(0.0)((acc, e) => e._4 + 0.5 * acc)
      u -> (es.length.toLong, BigDecimal(ewma).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(viaWalk == expected)
  }

  test("dd16: prefix filter prunes candidates and loses no qualifying pair") {
    def pairsFrom(sel: org.apache.spark.sql.DataFrame): Long = sel
      .groupBy("sh").agg(sort_array(collect_set(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
           transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))""")).as("p"))
      .select("p.a", "p.b").distinct().count()
    val allPairs = pairsFrom(ops.DedupOps.shingles(spark, sfDir))
    val prefixPairs = pairsFrom(operators.CurationOps.shinglePrefix(spark, sfDir))
    assert(prefixPairs < allPairs,
      s"prefix filter must prune: $prefixPairs vs $allPairs co-occurring pairs")
    // losslessness is proven cross-engine by the oracle (naive all-pairs
    // SQL); here assert the fixture exercises the threshold at all
    val gate = operators.CurationOps.queries("dd16_prefix_jaccard")(spark, sfDir)
    assert(gate.count() > 0, "fixture must contain near-dup pairs at J >= 0.5")
  }

  test("dd17: containment prefix prunes candidates yet reproduces dd15 exactly") {
    // Pruning: the prefix-vs-full candidate set must be strictly smaller
    // than dd15's every-co-occurring-pair set.
    val allPairs = ops.DedupOps.shingles(spark, sfDir)
      .groupBy("sh").agg(sort_array(collect_set(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
           transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a, y AS b))))""")).as("p"))
      .select("p.a", "p.b").distinct().count()
    val candPairs = operators.CurationOps.containmentCandidates(spark, sfDir).count()
    assert(candPairs < allPairs,
      s"containment prefix must prune: $candPairs vs $allPairs co-occurring pairs")
    // Losslessness at the gate threshold: dd17 == dd15 row-for-row (same
    // 0.6 threshold, same columns).
    val dd17 = operators.CurationOps.queries("dd17_prefix_containment")(spark, sfDir)
      .collect().toSeq
    val dd15 = ops.DedupOps.queries("dd15_containment")(spark, sfDir)
      .collect().toSeq
    assert(dd17 == dd15, s"dd17 (${dd17.size} rows) must equal dd15 (${dd15.size} rows)")
    assert(dd17.nonEmpty, "fixture must contain containment pairs at t >= 0.6")
  }

  test("w16: fence deciles cover all rows and agree with w14 away from ties") {
    val w16 = operators.CurationOps.queries("w16_decile_fences")(spark, sfDir).collect()
    val w14 = operators.CurationOps.queries("w14_ntile_deciles")(spark, sfDir).collect()
    // Same total row coverage: both bandings partition the orders table.
    assert(w16.map(_.getLong(1)).sum == w14.map(_.getLong(1)).sum)
    // Bands are labeled 1..10 and non-empty at this SF.
    assert(w16.map(_.getLong(0)).toSeq == (1L to 10L))
    // Fence banding deviates from exact NTILE only by rows tied at fence
    // values: per-band counts must stay within 1% of n/10 on this data.
    val total = w16.map(_.getLong(1)).sum.toDouble
    w16.foreach { r =>
      assert(math.abs(r.getLong(1) - total / 10) <= total / 100,
        s"band ${r.getLong(0)} count ${r.getLong(1)} far from ${total / 10}")
    }
  }

  test("tx15: benchmark docs never appear in output; rates are coherent") {
    val out = operators.CurationOps.queries("tx15_decontamination")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    assert(!out.exists(_.getLong(0) % 23 == 0), "eval docs must be excluded")
    out.foreach { r =>
      val (n, c, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(c <= n && rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - c.toDouble / n) < 1e-15)
      assert(r.getBoolean(4) == (rate >= 0.5))
    }
    // The shared-vocabulary fixture guarantees real overlap to catch.
    assert(out.exists(_.getBoolean(4)), "fixture must contain contaminated docs")
  }

  test("tx16: novelty is the df=1 share and bounds are respected") {
    val out = operators.CurationOps.queries("tx16_novelty")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, u, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(u <= n && rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - u.toDouble / n) < 1e-15)
    }
    // Every sufficiently-long doc is scored (df >= 1 join drops nothing).
    val nDocs = graft.ops.DedupOps.shingles(spark, sfDir)
      .select("doc_id").distinct().count()
    assert(out.length.toLong == nDocs)
  }

  test("tx17: histogram partitions the corpus; waste identities hold") {
    val out = operators.CurationOps.queries("tx17_length_histogram")(spark, sfDir)
      .collect()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum == nDocs, "bins must partition the corpus")
    out.foreach { r =>
      assert(r.getLong(4) == r.getLong(3) - r.getLong(2), "waste = padded - tokens")
      val share = r.getDouble(5)
      assert(share >= 0.0 && share < 1.0)
    }
  }

  test("tx14: chunks tile the token stream — every chunk but the last is full") {
    val chunks = operators.CurationOps.queries("tx14_sequence_pack")(spark, sfDir)
      .collect()
    val last = chunks.map(_.getLong(0)).max
    chunks.foreach { r =>
      val (id, fill) = (r.getLong(0), r.getLong(3))
      if (id < last) assert(fill == 512L, s"chunk $id filled $fill")
      else assert(fill > 0L && fill <= 512L)
    }
    // Chunk ids are contiguous from 0 — no hole means no span was dropped.
    assert(chunks.map(_.getLong(0)).sorted.sameElements(0L to last))
  }

  test("sa7: negative pairing is deterministic and never self-pairs") {
    val q = operators.CurationOps.queries("sa7_negative_pairs")(spark, sfDir)
    assert(q.collect().toSeq == q.collect().toSeq)
    // Rebuild the pair set and check anchor != partner row-by-row.
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val mx = docs.agg((max(col("doc_id")) + 1L).as("id_mod"))
    val selfPairs = docs.crossJoin(broadcast(mx))
      .select(col("doc_id").as("anchor_id"), col("id_mod"),
        explode(array(lit(1L), lit(2L))).as("j"))
      .withColumn("neg_id",
        pmod(col("anchor_id") * lit(48271L) + col("j") * lit(7919L) + lit(11L),
          col("id_mod")))
      .filter(col("neg_id") =!= col("anchor_id"))
      .filter(col("neg_id") === col("anchor_id")).count()
    assert(selfPairs == 0)
  }

  test("tx18: sliding chunks tile each document with the declared overlap") {
    val (w, s) = (32L, 24L)
    val rows = operators.CurationOps.queries("tx18_sliding_chunks")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docLen = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (doc, cs) =>
      val n = docLen(doc)
      val sorted = cs.sortBy(_._2)
      // starts are consecutive multiples of the stride from 0
      sorted.zipWithIndex.foreach { case ((_, idx, start, len), i) =>
        assert(idx == i && start == i * s, s"doc $doc chunk order broken")
        assert(len >= 1L && len <= w, s"doc $doc chunk $i len $len")
        if (i < sorted.length - 1)
          assert(len == w, s"doc $doc non-final chunk $i not full")
      }
      // the final window reaches the last token, and no window starts past it
      val (_, _, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen == n, s"doc $doc tail uncovered")
      assert(lastStart < n, s"doc $doc chunk starts past the end")
    }
  }

  test("tx19: oov counts match an in-memory top-100 vocabulary") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val freq = docs.flatMap(_._2).groupBy(identity).map { case (t, o) => t -> o.size }
    val vocab = freq.toSeq.sortBy { case (t, f) => (-f, t) }.take(100).map(_._1).toSet
    val got = SparkEntry.queries("tx19_oov_rate")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    docs.foreach { case (id, ts) =>
      val (nTok, nOov) = got(id)
      assert(nTok == ts.size.toLong, s"doc $id token count")
      assert(nOov == ts.count(t => !vocab.contains(t)).toLong, s"doc $id oov")
    }
  }

  test("dd18: manifest matches an in-memory recomputation of merged spans") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    // corpus-wide positional 3-gram occurrence counts
    val gramCount = scala.collection.mutable.Map.empty[String, Int]
    val perDocGrams = docs.map { case (id, ts) =>
      val grams = (0 to ts.length - 3).map(i => (i + 1).toLong ->
        s"${ts(i)} ${ts(i + 1)} ${ts(i + 2)}")
      grams.foreach { case (_, g) => gramCount(g) = gramCount.getOrElse(g, 0) + 1 }
      id -> grams
    }
    val expected = perDocGrams.map { case (id, grams) =>
      val spans = grams.collect { case (p, g) if gramCount(g) > 1 => (p, p + 3L) }
      // merge overlapping spans left to right (same rule as the window)
      var (nSpans, removed) = (0L, 0L)
      var curStart, curEnd = -1L
      spans.sortBy(_._1).foreach { case (st, en) =>
        if (curEnd < 0 || st >= curEnd) {
          if (curEnd >= 0) { nSpans += 1; removed += curEnd - curStart }
          curStart = st; curEnd = en
        } else curEnd = math.max(curEnd, en)
      }
      if (curEnd >= 0) { nSpans += 1; removed += curEnd - curStart }
      id -> ((nSpans, removed))
    }.toMap
    val got = operators.CurationOps.queries("dd18_span_removal")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (nSpans, removed)) =>
      assert((nSpans, removed) == expected(id),
        s"doc $id: got ($nSpans, $removed) expected ${expected(id)}")
      val total = docs.find(_._1 == id).get._2.length.toLong
      assert(removed <= total, s"doc $id removes more than it has")
    }
  }

  test("tx23: hashed-classifier scores match a sequential replay") {
    import java.math.BigInteger
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = texts.map { case (id, t) =>
      val ws = t.split(" ", -1).map { tok =>
        val b = new BigInteger(md5hex(tok).take(7), 16).longValueExact() % 1024L
        (1103515245L * b + 12345L) % 2147483648L % 2001L - 1000L
      }
      val margin = ws.sum.toDouble / (ws.length * 1000.0)
      id -> ((ws.length.toLong, margin / (1.0 + math.abs(margin)), margin > 0))
    }.toMap
    val got = ops.TextOps.queries("tx23_hashed_classifier")(spark, sfDir)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (n, q, keep)) =>
      val (en, eq, ekeep) = expected(id)
      assert(n == en && keep == ekeep, s"doc $id")
      assert(math.abs(q - eq) < 2e-6, s"doc $id: $q vs $eq")
    }
  }

  test("sa16: shard plan conserves tokens, respects the budget, and partitions hash space") {
    val shards = operators.SamplingOps.queries("sa16_shard_shuffle")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val totalTokens = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.expr(
        "CAST(sum(size(split(text, ' '))) AS BIGINT)")).head().getLong(0)
    assert(shards.map(_._3).sum == totalTokens, "every token lands in exactly one shard")
    // contiguous shard ids; each shard STARTS inside its budget window, so
    // every shard except the last holds ≥ its budget minus one doc overhang
    // — equivalently, the next shard exists only once this one's cumulative
    // fill crossed the 4096 boundary.
    assert(shards.map(_._1).toSeq == shards.indices.map(_.toLong))
    val fills = shards.map(_._3)
    fills.init.zipWithIndex.foreach { case (f, i) =>
      val cumThrough = fills.take(i + 1).sum
      assert(cumThrough >= (i + 1) * 4096L,
        s"shard $i closed before its budget filled")
    }
    // hash ranges partition the shuffle order: strictly increasing,
    // non-overlapping
    shards.sliding(2).foreach {
      case Array(a, b) => assert(a._5 <= b._4, s"shards ${a._1}/${b._1} overlap in hash space")
      case _ =>
    }
  }

  test("sa17: curriculum phases conserve the corpus and order by length") {
    val phases = operators.SamplingOps.queries("sa17_curriculum_plan")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val docs = Tables.documents(spark, sfDir)
    assert(phases.map(_._2).sum == docs.count(), "doc conservation")
    val totalToks = docs.selectExpr(
      "CAST(sum(size(split(text, ' '))) AS BIGINT)").head().getLong(0)
    assert(phases.map(_._3).sum == totalToks, "token conservation")
    // easy -> hard: each phase's length range sits at or below the next's
    phases.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._5 <= b._4, s"phase ${a._1} max_len exceeds phase ${b._1} min_len")
      case _ =>
    }
    // the 20/50% boundaries hold up to one straddling doc: phase 1 ends
    // at or after 20% of tokens, phases 1+2 at or after 50%
    assert(phases.length == 3)
    assert(phases(0)._3 * 5 >= totalToks - 5 * phases(0)._5)
    assert((phases(0)._3 + phases(1)._3) * 2 >= totalToks - 2 * phases(1)._5)
  }

  test("sa19: UniMax allocation conserves the budget, never over-draws a " +
    "stratum, and matches a sequential water-filling replay") {
    val rows = SparkEntry.queries("sa19_unimax")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty, "no strata emitted")
    val k = rows.length
    val total = rows.map(_._3).sum
    val budget = 2 * total / 5
    val alloc = rows.map(_._4).sum
    assert(alloc <= budget, s"allocation $alloc exceeds budget $budget")
    // floor-division slack is < the number of above-pivot strata ≤ k
    assert(budget - alloc < k, s"unspent ${budget - alloc} with $k strata")
    rows.foreach { case (l, src, av, al, ep, capped) =>
      assert(al <= av, s"$l/$src over-drawn: $al > $av")
      assert(ep == al * 1000000L / av, s"$l/$src epochs_ppm mismatch")
      if (capped) assert(al < av, s"$l/$src capped but fully drawn")
      else assert(al == av, s"$l/$src uncapped but rationed")
    }
    // every capped stratum receives the same (single) cap value
    assert(rows.filter(_._6).map(_._4).toSet.size <= 1, "multiple cap values")
    // sequential replay of the pivot + cap
    val sorted = rows.sortBy(r => (r._3, r._1, r._2))
    var m = 0; var sm = 0L; var cum = 0L
    sorted.zipWithIndex.foreach { case (r, idx) =>
      cum += r._3
      if (cum + (k - idx - 1) * r._3 <= budget) { m = idx + 1; sm = cum }
    }
    val cap = (budget - sm) / (k - m)
    rows.foreach { case (l, src, av, al, _, _) =>
      assert(al == math.min(av, cap), s"$l/$src: $al != min($av, $cap)")
    }
  }
}
