package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for a large-scale training-data pipeline:
  * language-ID (marker n-gram heuristic), quality scoring, token counting
  * (whitespace + BPE-ish chunking), document fingerprinting, and exact /
  * canonical-form deduplication over the `documents` table.
  *
  * Everything is built from codegen'd `functions._` / higher-order array
  * expressions — no UDFs — so the per-document work stays inside
  * whole-stage codegen and scales linearly with document count; the only
  * shuffles are the final group-bys on the (tiny) dedup keys.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  /** Marker vocabularies for the language-ID heuristic. Deterministic and
    * mirrored verbatim in the DuckDB oracle. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "la", "que"),
    "fr" -> Seq("le", "la", "et"))

  private def tokens = split(col("text"), " ")

  /** tx4's canonical bag-of-words fingerprint (md5 of the sorted distinct
    * lowercase token set). Shared with dd19's incremental exact-dup check,
    * whose contract is "matches tx4's fingerprint" — one definition, no
    * silent divergence. The DuckDB mirror below must stay in lockstep. */
  private[graft] def bagFingerprint: org.apache.spark.sql.Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(lower(col("text")), " ")))))

  /** DuckDB form of [[bagFingerprint]] (same canonicalization, same md5). */
  private[graft] val duckBagFingerprint: String =
    "md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))"

  private def markerScore(ms: Seq[String]): org.apache.spark.sql.Column = {
    val inList = ms.map(m => s"'$m'").mkString(", ")
    expr(s"size(filter(split(text, ' '), t -> t IN ($inList)))")
  }

  val queries: Map[String, Q] = Map(
    // TX24: N-GRAM LM PERPLEXITY FILTER — the CCNet/Wikipedia-LM quality
    // gate (score every document by a language model trained on the corpus
    // itself; filter on bits-per-token). Model = add-one-smoothed bigram
    // LM: P(w2|w1) = (c2(w1 w2)+1) / (c1(w1)+V), where c1 counts contexts
    // (bigrams starting with w1) and V is the context vocabulary size, so
    // train and score are BOTH pure aggregation over one bigram stream —
    // no iteration, no state. The bigram stream comes from the codegen'd
    // NGramsGenerator UDTF (tx10's hot-map seam — streams grams into
    // Generate, no per-row array materialization). Shape at scale: one
    // corpus scan → two vocab-sized count aggs (c2, c1 — log-scale smaller
    // than the corpus, AQE broadcasts them when small, plain shuffle joins
    // otherwise) → one per-doc agg. log2 terms are doubles on exact
    // integer ratios; the per-doc mean rounds at 4 digits, far above
    // 1ulp-per-term summation noise. Docs under 2 tokens have no bigrams
    // and drop out (both engines). keep = cross-entropy under a fixed
    // 12-bit threshold, decided on the ROUNDED value so the cut is
    // summation-order independent (dd26's convention).
    "tx24_ngram_perplexity" -> { (s, d) =>
      graft.functions.NGramsGenerator.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .createOrReplaceTempView("tx24_docs")
      val bg = s.sql(
        "SELECT doc_id, ngram FROM tx24_docs LATERAL VIEW ngrams(ts, 2) g AS ngram")
        .withColumn("w1", expr("substring_index(ngram, ' ', 1)"))
      val c2 = bg.groupBy("ngram").agg(count(lit(1)).as("c2"))
      val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
      val v = bg.agg(countDistinct(col("w1")).as("v"))
      bg.join(c2, Seq("ngram"))
        .join(c1, Seq("w1"))
        .crossJoin(broadcast(v))
        .withColumn("lp",
          log2((col("c2") + lit(1)).cast("double") / (col("c1") + col("v"))))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          (-sum(col("lp")) / count(lit(1))).as("h"))
        .select(col("doc_id"), col("n_bigrams"),
          graft.functions.Exact.stableRound(col("h"), 4).as("bits_per_token"),
          graft.functions.Exact.stableRound(pow(lit(2.0), col("h")), 2)
            .as("perplexity"),
          (graft.functions.Exact.stableRound(col("h"), 4) < 12.0).as("keep"))
        .orderBy("doc_id")
    },

    // TX23: model-based quality scoring via the HASHING TRICK — the
    // linear-classifier quality filter every web-corpus pipeline runs
    // (CCNet / fastText-style: hash tokens into a fixed feature space,
    // score = squashed dot with a weight vector). The weight vector is
    // DERIVED, not stored: bucket b = 28-bit md5 prefix mod 1024 (the
    // MinHash base-hash recipe), weight w_b = lcg(b) scaled to integer
    // units in [-1000, 1000] (sim2's hyperplane convention) — so the
    // "model" is a formula both engines replay verbatim, standing in for
    // a broadcast weight table. A trained model slots in as a 1024-row
    // broadcast join with zero plan change. Integer weight sums are
    // exact (order-independent); the margin squashes through the
    // rational sigmoid z/(1+|z|) — no libm exp, bit-identical IEEE both
    // engines. Shape at scale: pure projection + ONE hash-agg per doc —
    // no join, no second shuffle; the filter is a single corpus pass.
    "tx23_hashed_classifier" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("b",
          expr("CAST(conv(substring(md5(tok), 1, 7), 16, 10) AS BIGINT) % 1024"))
        .withColumn("w", (lit(1103515245L) * col("b") + 12345L) % 2147483648L % 2001L - 1000L)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(col("w")).as("wsum"))
        .withColumn("margin",
          col("wsum").cast("double") / (col("n_tokens") * lit(1000.0)))
        .select(col("doc_id"), col("n_tokens"),
          graft.functions.Exact.stableRound(
            col("margin") / (lit(1.0) + abs(col("margin"))), 6).as("quality"),
          (col("margin") > 0).as("keep"))
        .orderBy("doc_id")
    },

    // TX22: readability scoring (Flesch reading ease) — the classic text
    // quality prior a curation pipeline thresholds on. The synthetic
    // corpus carries no sentence punctuation, so the sentence unit is the
    // standard fixed-window proxy (ceil(words/15)); syllables are vowel
    // groups (the usual heuristic). All three inputs are INTEGER corpus
    // sums, so the Flesch formula is one short double chain on identical
    // inputs in both engines. One scan, one dimension-sized hash-agg.
    "tx22_readability" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          size(tokens).cast("long").as("words"),
          expr("CAST(ceil(size(split(text, ' ')) / 15.0) AS LONG)").as("sentences"),
          expr("CAST(regexp_count(text, '[aeiouy]+') AS LONG)").as("syllables"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("words")).as("n_words"),
          sum(col("sentences")).as("n_sentences"),
          sum(col("syllables")).as("n_syllables"))
        .select(
          col("lang"), col("n_docs"), col("n_words"), col("n_sentences"),
          col("n_syllables"),
          graft.functions.Exact.stableRound(
            lit(206.835)
              - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
              - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")), 4)
            .as("flesch_score"))
        .orderBy("lang")
    },

    // TOK3: vocabulary coverage curve — "how large must the vocab be to
    // cover X% of the corpus": cumulative frequency share at vocab cuts
    // K ∈ {10, 100, 500} over character 4-grams ranked by (freq desc,
    // gram). The ranked vocabulary is log-scale smaller than the corpus
    // (dimension-sized), so the cumulative window rides the tiny
    // aggregated frame — the w2/w20 pattern — while the corpus itself
    // only feeds one partial-agg groupBy.
    "tok3_vocab_coverage" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // The gram scan is the codegen'd CharGramsGenerator UDTF — a single
      // boundary-indexing pass streaming grams into Generate — replacing
      // round 10's explode(transform(sequence(..., substring))) form whose
      // interpreted lambdas re-walked the string per gram (the r10 verdict's
      // 9× constant-factor gap vs DuckDB was exactly this scan). Short docs
      // (< 4 chars) yield nothing from the generator; the pushed-down
      // length filter mirrors the oracle's GREATEST(len - 3, 0) guard.
      graft.functions.CharGramsGenerator.register(s)
      val grams = Tables.documents(s, d)
        .where(length(col("text")) >= 4)
        .select(expr("char_grams(text, 4)").as("gram"))
      val vocab = grams.groupBy("gram").agg(count(lit(1)).as("freq"))
      val total = vocab.agg(sum(col("freq")).as("total_grams"))
      // Only the rank<=500 cuts are reported, and the cumulative sum at
      // rank k depends only on rows ranked above k — so take the top 500
      // by (freq desc, gram) with TakeOrderedAndProject FIRST, then run
      // the rank/cumsum window over those 500 rows. The previous global
      // Window.orderBy moved the ENTIRE gram vocabulary (unbounded in
      // corpus size) to one partition; this shape keeps the full-vocab
      // work inside the partial-agg groupBy and sorts only a constant
      // 500 rows. total_grams still sums the whole vocabulary.
      val top = vocab.orderBy(col("freq").desc, col("gram")).limit(500)
      val w = Window.orderBy(col("freq").desc, col("gram"))
      top
        .withColumn("rk", row_number().over(w))
        .withColumn("cum", sum(col("freq")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("rk").isin(10, 100, 500))
        .crossJoin(broadcast(total))
        .select(col("rk").cast("long").as("vocab_size"),
          col("gram").as("gram_at_cut"), col("cum").as("cum_grams"),
          col("total_grams"),
          graft.functions.Exact.stableRound(
            col("cum").cast("double") / col("total_grams"), 6).as("coverage"))
        .orderBy("vocab_size")
    },

    // TOK1: the BPE tokenizer-TRAINING inner step — count every adjacent
    // symbol pair across the corpus and surface the top merge candidates.
    // (Word-level symbols here; byte/char pairs are the same dataflow with
    // a different splitter.) This is the step that runs corpus-wide per
    // merge round at training time, so its shape must be one scan + one
    // pair-keyed exchange: the per-row pair expansion is a bounded
    // projection (doc length − 1 structs), the count is a partial-agg
    // groupBy, and the top-K is TakeOrderedAndProject under a TOTAL order
    // (count desc, then pair) so the cut is engine-independent.
    // pair_share = n / total is a ratio of the same integers on both
    // engines — IEEE-exact.
    "tok1_bpe_pair_merges" -> { (s, d) =>
      val pairs = Tables.documents(s, d)
        .select(split(col("text"), " ").as("ts"))
        // sequence(0, -1) DESCENDS in Spark — a 1-token doc must not reach it
        .filter(size(col("ts")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS l, ts[i + 1] AS r))"))
          .as("p"))
        .select(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      val counted = pairs.groupBy("left_sym", "right_sym")
        .agg(count(lit(1)).as("n_pairs"))
      val total = pairs.agg(count(lit(1)).as("total_pairs"))
      counted.crossJoin(broadcast(total))
        .withColumn("pair_share",
          col("n_pairs").cast("double") / col("total_pairs"))
        .select("left_sym", "right_sym", "n_pairs", "pair_share")
        .orderBy(col("n_pairs").desc, col("left_sym"), col("right_sym"))
        .limit(20)
    },

    // TOK2: one BPE TRAINING ITERATION — take tok1's top merge candidate,
    // APPLY it to the corpus (greedy non-overlapping, the real tokenizer
    // semantics), and recount the pair table for the next round. The
    // subtle part is greediness when left == right: a run of k identical
    // tokens yields floor(k/2) merges at alternating positions — computed
    // as run-islands (pos − row_number) with even-offset survivors, which
    // reproduces left-to-right greedy exactly and degenerates to "all
    // matches" when left ≠ right (adjacent matches are then impossible).
    // Everything is doc-partitioned windows + (doc, pos) equi joins — one
    // exchange family, no driver loop; a full tokenizer training run is
    // this operator iterated with the pair table kept as state.
    "tok2_bpe_apply" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byPos = Window.partitionBy("doc_id").orderBy("pos")
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "t")))
      // nxt feeds THREE consumers (the pair count that picks the merge, the
      // match scan, and the final re-tokenized recount) — without
      // materialization each one re-runs the scan + split + doc_id window,
      // tripling the dominant cost. localCheckpoint is exactly the state an
      // iterated BPE trainer keeps anyway: the tokenized corpus between
      // merge rounds (dd7's lineage discipline, O(tokens) rows).
      val nxt = toks.withColumn("nt", lead(col("t"), 1).over(byPos))
        .localCheckpoint()
      val pairCounts = nxt.filter(col("nt").isNotNull)
        .groupBy(col("t").as("l"), col("nt").as("r"))
        .agg(count(lit(1)).as("n"))
      val top = pairCounts
        .orderBy(col("n").desc, col("l"), col("r")).limit(1)
        .select("l", "r")
      val matches = nxt.crossJoin(broadcast(top))
        .filter(col("t") === col("l") && col("nt") === col("r"))
        .select(col("doc_id"), col("pos"))
      val isl = matches.withColumn("grp",
        col("pos") - row_number().over(byPos))
      val kept = isl.withColumn("g0",
          min(col("pos")).over(Window.partitionBy("doc_id", "grp")))
        .filter((col("pos") - col("g0")) % 2 === 0)
        .select(col("doc_id"), col("pos"))
      val applied = nxt.crossJoin(broadcast(top))
        .join(kept.withColumn("merged", lit(true)), Seq("doc_id", "pos"), "left")
        .join(kept.select(col("doc_id"), (col("pos") + 1).as("pos"),
          lit(true).as("consumed")), Seq("doc_id", "pos"), "left")
        .filter(col("consumed").isNull)
        .select(col("doc_id"), col("pos"),
          when(col("merged"), concat_ws("_", col("l"), col("r")))
            .otherwise(col("t")).as("t2"),
          col("l").as("merge_l"), col("r").as("merge_r"))
      applied
        .withColumn("nt2", lead(col("t2"), 1).over(byPos))
        .filter(col("nt2").isNotNull)
        .groupBy(col("merge_l"), col("merge_r"),
          col("t2").as("left_sym"), col("nt2").as("right_sym"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("n_pairs").desc, col("left_sym"), col("right_sym"))
        .limit(20)
    },

    // TX20: per-SOURCE boilerplate n-gram detection — the C4-style "this
    // line is navigation chrome" filter at gram granularity: a 3-gram that
    // appears in >= 60% of one source's documents is boilerplate FOR THAT
    // SOURCE (corpus-global df — tx16 — can't see it: a template shared by
    // every doc of one domain is rare corpus-wide). Output is the
    // per-source audit: distinct grams, boilerplate grams, and the share
    // of (doc, gram) instances a boilerplate strip would remove. Shuffles:
    // one exchange on (source, gram), one re-agg on source — both linear;
    // the integer-only threshold compare (5*c >= 3*D) avoids a
    // cross-engine double.
    "tx20_boilerplate_grams" -> { (s, d) =>
      val docSrc = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val grams = graft.ops.DedupOps.shingles(s, d)
        .join(docSrc, Seq("doc_id"))
      val srcSizes = docSrc.groupBy("source").agg(count(lit(1)).as("n_docs"))
      val perGram = grams.groupBy("source", "sh")
        .agg(count(lit(1)).as("c"))
        .join(broadcast(srcSizes), Seq("source"))
        .withColumn("is_boiler", col("c") * 5 >= col("n_docs") * 3)
      perGram.groupBy("source")
        .agg(count(lit(1)).as("n_distinct_grams"),
          count(when(col("is_boiler"), lit(1))).as("n_boiler_grams"),
          sum(col("c")).as("n_instances"),
          sum(when(col("is_boiler"), col("c")).otherwise(lit(0L))).as("n_boiler_instances"))
        .withColumn("boiler_share",
          col("n_boiler_instances").cast("double") / col("n_instances"))
        .orderBy("source")
    },

    // Language-ID: score each candidate language by marker-token hits,
    // argmax with 'und' fallback; report the confusion table vs the label.
    "tx1_lang_id" -> { (s, d) =>
      val scored = markers.foldLeft(Tables.documents(s, d)) {
        case (df, (lang, ms)) => df.withColumn(s"s_$lang", markerScore(ms))
      }
      val best = greatest(markers.map { case (l, _) => col(s"s_$l") }: _*)
      val pred = markers.foldLeft(when(best <= 0, "und")) {
        case (c, (lang, _)) => c.when(col(s"s_$lang") === best, lang)
      }
      scored.withColumn("pred_lang", pred)
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang")
    },

    // Quality scoring: length / stopword-ratio / mean-token-length bands.
    "tx2_quality_score" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("n_tokens", size(tokens).cast("long"))
        .withColumn("n_stop",
          expr("size(filter(split(text, ' '), t -> t IN ('the','a','of','and','to','in')))")
            .cast("long"))
        .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
        .withColumn("avg_token_len",
          (col("n_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
        .withColumn("quality_score",
          col("stop_ratio") * 0.3 +
          least(col("n_tokens"), lit(100L)).cast("double") / 100.0 * 0.4 +
          (lit(1.0) - abs(col("avg_token_len") - 4.5) / 10.0) * 0.3)
        .select("doc_id", "n_tokens", "n_stop", "stop_ratio",
          "avg_token_len", "quality_score")
        .orderBy("doc_id")
    },

    // Token counting: whitespace tokens, regex word/number tokens, and a
    // BPE-ish ≤4-char chunk count (ceil(len/4) per token).
    "tx3_token_count" -> { (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(tokens).cast("long").as("ws_tokens"),
          expr("regexp_count(text, '[a-z]+')").cast("long").as("alpha_tokens"),
          expr("regexp_count(text, '[0-9]+')").cast("long").as("num_tokens"),
          expr("aggregate(split(text, ' '), 0L, (acc, t) -> acc + CAST(ceil(length(t) / 4.0) AS LONG))")
            .as("bpe_pieces"))
        .orderBy("doc_id")
    },

    // Document fingerprint: canonical form = sorted distinct lowercase
    // tokens, hashed. Robust to token reordering.
    "tx4_fingerprint" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), bagFingerprint.as("fingerprint"))
        .orderBy("doc_id")
    },

    // Order-sensitive rolling-hash fingerprint: polynomial fold over the
    // token stream, h = (h*31 + tokenHash) mod 2^31-1 — unlike tx4 it
    // distinguishes reordered documents; pure integer math, oracle-exact.
    "tx5_rolling_fingerprint" -> { (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          expr("""aggregate(split(text, ' '), 0L, (acc, t) ->
                  (acc * 31 + CAST(conv(substring(md5(t), 1, 7), 16, 10) AS BIGINT))
                  % 2147483647)""").as("rolling_hash"))
        .orderBy("doc_id")
    },

    // Exact dedup: hash-groupBy on md5(text), keep min(doc_id) as the
    // representative. At scale this is one shuffle on a 32-byte key.
    "dd1_exact_dedup" -> { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy("rep_doc_id")
    },

    // Canonical-form dedup: same shape keyed on the tx4 fingerprint —
    // catches reordered-token duplicates exact dedup misses.
    "dd5_fingerprint_dedup" -> { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(concat_ws(" ",
          array_sort(array_distinct(split(lower(col("text")), " "))))).as("fingerprint"))
        .agg(min(col("doc_id")).as("rep_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy("rep_doc_id")
    },

    // TX6: bigram language-model fluency score — avg over a doc's bigrams
    // of the corpus conditional probability c(w1 w2)/c(w1). The probability
    // is kept EXACT as an integer-scaled floor division (c2*10^8 div c1) so
    // the cross-engine comparison never touches float rounding; only the
    // final normalization is a (bit-identical) double division. Corpus count
    // tables are vocabulary-sized → broadcast to the per-bigram join.
    "tx6_bigram_lm_score" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
      val bigrams = docs.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i+1] AS w2))"))
          .as("b"))
        .select(col("doc_id"), col("b.w1"), col("b.w2"))
      val uni = docs.select(explode(col("ts")).as("w1"))
        .groupBy("w1").agg(count(lit(1)).as("c1"))
      val bi = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      bigrams
        .join(broadcast(bi), Seq("w1", "w2"))
        .join(broadcast(uni), Seq("w1"))
        .withColumn("p_scaled", expr("(c2 * CAST(100000000 AS BIGINT)) div c1"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("p_scaled")).as("sum_scaled"))
        .withColumn("avg_cond_p",
          col("sum_scaled").cast("double") / (col("n_bigrams") * lit(100000000L)))
        .select("doc_id", "n_bigrams", "avg_cond_p")
        .orderBy("doc_id")
    },

    // TX7: repetition metrics — the Gopher-style repetition filters a
    // pre-training corpus pipeline gates on (Rae et al. 2021 §A1.1, public):
    // duplicate-token fraction, most-common-bigram fraction, and the
    // Simpson concentration index Σc²/n² (an exact-rational stand-in for
    // token entropy: pure integer sums + one double division, so the value
    // is bit-identical cross-engine with no rounding tolerance needed).
    // Two hash-aggregates per modality (token, bigram), one broadcast-sized
    // join of per-doc rollups — linear at corpus scale.
    "tx7_repetition_metrics" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
      val uni = docs.select(col("doc_id"), explode(col("ts")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          sum("c").as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sum(col("c") * col("c")).as("sc2"))
      val bi = docs.filter(size(col("ts")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(ts) - 2), i -> concat_ws(' ', ts[i], ts[i+1]))"))
          .as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          sum("c").as("n_bigrams"),
          max("c").as("top_bigram"))
      uni.join(bi, Seq("doc_id"), "left")
        .withColumn("dup_token_frac",
          lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"))
        .withColumn("top_bigram_frac",
          col("top_bigram").cast("double") / col("n_bigrams"))
        .withColumn("simpson_index",
          col("sc2").cast("double") / (col("n_tokens") * col("n_tokens")))
        .withColumn("is_repetitive",
          col("dup_token_frac") > 0.6 || col("top_bigram_frac") > 0.18)
        .select("doc_id", "n_tokens", "n_distinct", "dup_token_frac",
          "top_bigram_frac", "simpson_index", "is_repetitive")
        .orderBy("doc_id")
    },

    // TX8: PII scrubbing — email/phone/IP detection + redaction, the
    // compliance pass every training-data pipeline runs before a corpus
    // ships. The synthetic corpus carries no PII, so deterministic
    // specimens are injected by doc_id arithmetic (replayed verbatim in the
    // oracle, like the scaled TLC fixture); counts come from the raw text,
    // the redacted text is md5'd for compact exact comparison. Pure per-row
    // regex work — linear, codegen'd, no shuffle before the final sort.
    "tx8_pii_scrub" -> { (s, d) =>
      val injected = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 5 === 0, lit(" reach me at user42@example.com")).otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit(" call +1 212-555-0142 now")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0, lit(" server at 192.168.0.12 logs")).otherwise(lit("")))
          .as("text"))
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"
      val ipRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
      injected.select(
        col("doc_id"),
        regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(phoneRe)).cast("long").as("n_phones"),
        regexp_count(col("text"), lit(ipRe)).cast("long").as("n_ips"),
        md5(regexp_replace(regexp_replace(regexp_replace(col("text"),
          emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), ipRe, "<IP>"))
          .as("scrubbed_md5"))
        .orderBy("doc_id")
    },

    // TX12: CHARACTER ENTROPY — the Shannon-entropy quality gate that
    // catches gibberish, binary spill, and single-char padding (too-low or
    // too-high entropy both flag). Two hash-aggregates (per-(doc, char)
    // counts, then the per-doc fold); the -p·log2(p) terms are identical
    // doubles on both engines and the cross-engine SUM order tolerance is
    // absorbed by the same ROUND(4) convention the stddev gates use.
    "tx12_char_entropy" -> { (s, d) =>
      val chars = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .filter(col("ch") =!= "")
      val counts = chars.groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      val tot = counts.groupBy("doc_id")
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct_chars"))
      counts.join(tot, "doc_id")
        .withColumn("term",
          -(col("c") / col("n")) * log2(col("c") / col("n")))
        .groupBy("doc_id")
        .agg(
          max(col("n")).as("n_chars"),
          max(col("n_distinct_chars")).as("n_distinct_chars"),
          round(sum(col("term")), 4).as("entropy_bits"))
        .orderBy("doc_id")
    },

    // TX11: URL extraction + DOMAIN NORMALIZATION — the web-corpus curation
    // primitive (domain-level quality lists, per-domain caps, domain dedup
    // all key on it). Deterministic URL specimens are injected by doc_id
    // (same seam as tx8's PII specimens — this synthetic corpus carries no
    // URLs of its own); extraction and normalization are one regex pass:
    // scheme-relative host, lowercased, www-stripped. Linear scan, one
    // shuffle on the (tiny) domain key.
    "tx11_url_extract" -> { (s, d) =>
      val urlRe = "https?://[^ ]+"
      val hostRe = "^https?://([^/?#]+)"
      val injected = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(4)) === 0,
            lit(" see https://www.Example.COM/path/a?q=1 ref"))
            .when(pmod(col("doc_id"), lit(4)) === 1,
              lit(" at http://data.example.org/x now"))
            .when(pmod(col("doc_id"), lit(4)) === 2,
              lit(" from https://sub.test.net/y/z.html end"))
            .otherwise(lit(""))).as("text"))
      injected
        .withColumn("url", regexp_extract(col("text"), urlRe, 0))
        .filter(col("url") =!= "")
        .withColumn("domain",
          regexp_replace(lower(regexp_extract(col("url"), hostRe, 1)), "^www\\.", ""))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .orderBy("domain")
    },

    // TX10: the custom-GENERATOR path for the tokenize→n-gram hot map (see
    // functions.NGramsGenerator — streams n-grams into Generate instead of
    // materializing the per-row array the explode(transform(...)) idiom
    // builds). Exercised from SQL generator position (LATERAL VIEW) to
    // prove the registry seam; the aggregate proves the emitted stream.
    "tx10_ngram_udtf" -> { (s, d) =>
      graft.functions.NGramsGenerator.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .createOrReplaceTempView("tx10_docs")
      s.sql("SELECT doc_id, ngram FROM tx10_docs LATERAL VIEW ngrams(ts, 3) g AS ngram")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_ngrams"),
          countDistinct(col("ngram")).as("n_distinct"))
        .orderBy("doc_id")
    },

    // TX19: out-of-vocabulary rate against a CORPUS-DERIVED vocabulary —
    // the tokenizer-coverage audit run before committing a vocab size:
    // build the top-100 token dictionary (frequency desc, token asc — a
    // total order, so the cut is deterministic), broadcast it, and score
    // every document's share of tokens outside it. Two exchanges total
    // (token frequencies, per-doc regroup); the dictionary is bounded by
    // construction so the scoring join is scan-local at any corpus size —
    // same broadcast posture as tx15's benchmark grams.
    "tx19_oov_rate" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("tok")).limit(100)
        .select(col("tok"), lit(1).as("in_vocab"))
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("in_vocab").isNull, lit(1))).as("n_oov"))
        .withColumn("oov_rate",
          col("n_oov").cast("double") / col("n_tokens"))
        .orderBy("doc_id")
    })

  private def duckMarkerScore(ms: Seq[String]): String = {
    val inList = ms.map(m => s"'$m'").mkString(", ")
    s"len(list_filter(string_split(text, ' '), t -> t IN ($inList)))"
  }

  val oracles: Map[String, String] = Map(
    // Bigram stream replayed via lateral UNNEST over 1-indexed positions
    // (range(1, len) = 1..len-1, so ts[i]/ts[i+1] are in bounds); counts,
    // smoothing and the rounded-threshold keep mirror the Spark side.
    "tx24_ngram_perplexity" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
          bg AS (SELECT doc_id, ts[i] AS w1, ts[i] || ' ' || ts[i+1] AS ngram
                 FROM t, UNNEST(range(1, len(ts))) AS g(i)),
          c2 AS (SELECT ngram, COUNT(*) AS c2 FROM bg GROUP BY 1),
          c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
          v AS (SELECT COUNT(DISTINCT w1) AS v FROM bg),
          scored AS (SELECT bg.doc_id,
                            log2(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.v)) AS lp
                     FROM bg JOIN c2 USING (ngram) JOIN c1 USING (w1), v),
          agg AS (SELECT doc_id, COUNT(*) AS n_bigrams,
                         -SUM(lp) / COUNT(*) AS h
                  FROM scored GROUP BY 1)
          SELECT doc_id, n_bigrams,
                 ROUND(1e-9 + h, 4) AS bits_per_token,
                 ROUND(1e-9 + POW(2.0, h), 2) AS perplexity,
                 ROUND(1e-9 + h, 4) < 12.0 AS keep
          FROM agg ORDER BY doc_id""",

    // The derived weight formula replayed verbatim; the rational sigmoid
    // is +,/,ABS only so the rounded score is bit-identical.
    "tx23_hashed_classifier" ->
      """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                       FROM documents),
          feats AS (SELECT doc_id,
                           ('0x' || substr(md5(tok), 1, 7))::BIGINT % 1024 AS b
                    FROM toks),
          w AS (SELECT doc_id,
                       (1103515245 * b + 12345) % 2147483648 % 2001 - 1000 AS w
                FROM feats),
          agg AS (SELECT doc_id, COUNT(*) AS n_tokens, SUM(w) AS wsum
                  FROM w GROUP BY 1),
          m AS (SELECT doc_id, n_tokens,
                       CAST(wsum AS DOUBLE) / (n_tokens * 1000.0) AS margin
                FROM agg)
          SELECT doc_id, n_tokens,
                 ROUND(1e-9 + margin / (1.0 + ABS(margin)), 6) AS quality,
                 margin > 0 AS keep
          FROM m ORDER BY doc_id""",

    "tx22_readability" ->
      """WITH pd AS (
           SELECT lang,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
                  CAST(CEIL(len(string_split(text, ' ')) / 15.0) AS BIGINT) AS sentences,
                  CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS syllables
           FROM documents)
         SELECT lang,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(words) AS BIGINT) AS n_words,
                CAST(SUM(sentences) AS BIGINT) AS n_sentences,
                CAST(SUM(syllables) AS BIGINT) AS n_syllables,
                ROUND(1e-9 + 206.835
                  - 1.015 * (CAST(SUM(words) AS DOUBLE) / SUM(sentences))
                  - 84.6 * (CAST(SUM(syllables) AS DOUBLE) / SUM(words)), 4) + 0.0
                  AS flesch_score
         FROM pd GROUP BY lang ORDER BY lang""",

    "tok3_vocab_coverage" ->
      """WITH grams AS (
           SELECT substr(text, i, 4) AS gram
           FROM documents, UNNEST(generate_series(1, GREATEST(len(text) - 3, 0))) AS u(i)),
         vocab AS (SELECT gram, COUNT(*) AS freq FROM grams GROUP BY 1),
         tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total_grams FROM vocab),
         ranked AS (
           SELECT gram, freq,
                  ROW_NUMBER() OVER (ORDER BY freq DESC, gram) AS rk,
                  SUM(freq) OVER (ORDER BY freq DESC, gram
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM vocab)
         SELECT CAST(rk AS BIGINT) AS vocab_size, gram AS gram_at_cut,
                CAST(cum AS BIGINT) AS cum_grams, total_grams,
                ROUND(1e-9 + CAST(cum AS DOUBLE) / total_grams, 6) + 0.0 AS coverage
         FROM ranked, tot WHERE rk IN (10, 100, 500)
         ORDER BY vocab_size""",

    "tok1_bpe_pair_merges" ->
      """WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents
                    WHERE len(string_split(text, ' ')) >= 2),
          p AS (SELECT ts[i] AS left_sym, ts[i + 1] AS right_sym
                FROM t, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)),
          c AS (SELECT left_sym, right_sym, COUNT(*) AS n_pairs FROM p GROUP BY 1, 2),
          tot AS (SELECT COUNT(*) AS total_pairs FROM p)
          SELECT left_sym, right_sym, n_pairs,
                 CAST(n_pairs AS DOUBLE) / total_pairs AS pair_share
          FROM c, tot
          ORDER BY n_pairs DESC, left_sym, right_sym LIMIT 20""",

    // Same greedy-run semantics: islands of consecutive match positions,
    // even offsets survive (= left-to-right greedy; no-op when l <> r).
    "tok2_bpe_apply" ->
      """WITH tok AS (
           SELECT doc_id, i - 1 AS pos, ts[i] AS t
           FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
                UNNEST(generate_series(1, len(ts))) AS u(i)),
         nxt AS (
           SELECT doc_id, pos, t,
                  LEAD(t) OVER (PARTITION BY doc_id ORDER BY pos) AS nt
           FROM tok),
         pc AS (SELECT t AS l, nt AS r, COUNT(*) AS n FROM nxt
                WHERE nt IS NOT NULL GROUP BY 1, 2),
         top AS (SELECT l, r FROM pc ORDER BY n DESC, l, r LIMIT 1),
         m AS (SELECT n.doc_id, n.pos FROM nxt n, top
               WHERE n.t = top.l AND n.nt = top.r),
         isl AS (SELECT doc_id, pos,
                        pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
                 FROM m),
         kept AS (SELECT doc_id, pos FROM (
                    SELECT doc_id, pos,
                           MIN(pos) OVER (PARTITION BY doc_id, grp) AS g0
                    FROM isl) t0
                  WHERE (pos - g0) % 2 = 0),
         applied AS (
           SELECT n.doc_id, n.pos,
                  CASE WHEN k.pos IS NOT NULL
                       THEN top.l || '_' || top.r ELSE n.t END AS t2
           FROM nxt n CROSS JOIN top
           LEFT JOIN kept k ON k.doc_id = n.doc_id AND k.pos = n.pos
           LEFT JOIN kept c ON c.doc_id = n.doc_id AND c.pos = n.pos - 1
           WHERE c.pos IS NULL),
         nxt2 AS (
           SELECT doc_id, t2,
                  LEAD(t2) OVER (PARTITION BY doc_id ORDER BY pos) AS nt2
           FROM applied)
         SELECT (SELECT l FROM top) AS merge_l, (SELECT r FROM top) AS merge_r,
                t2 AS left_sym, nt2 AS right_sym, COUNT(*) AS n_pairs
         FROM nxt2 WHERE nt2 IS NOT NULL
         GROUP BY 1, 2, 3, 4
         ORDER BY n_pairs DESC, left_sym, right_sym LIMIT 20""",

    "tx20_boilerplate_grams" ->
      s"""WITH ${graft.ops.DedupOps.duckShingles},
          src AS (SELECT doc_id, source FROM documents),
          sizes AS (SELECT source, COUNT(*) AS n_docs FROM src GROUP BY 1),
          pg AS (SELECT s2.source, sh.sh, COUNT(*) AS c
                 FROM sh JOIN src s2 ON s2.doc_id = sh.doc_id
                 GROUP BY 1, 2),
          flagged AS (SELECT pg.source, pg.c, (pg.c * 5 >= z.n_docs * 3) AS is_boiler
                      FROM pg JOIN sizes z ON z.source = pg.source)
          SELECT source, COUNT(*) AS n_distinct_grams,
                 CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_boiler_grams,
                 CAST(SUM(c) AS BIGINT) AS n_instances,
                 CAST(SUM(CASE WHEN is_boiler THEN c ELSE 0 END) AS BIGINT)
                   AS n_boiler_instances,
                 CAST(SUM(CASE WHEN is_boiler THEN c ELSE 0 END) AS DOUBLE)
                   / SUM(c) AS boiler_share
          FROM flagged GROUP BY 1 ORDER BY 1""",

    "tx1_lang_id" -> {
      val scores = markers.map { case (l, ms) => s"${duckMarkerScore(ms)} AS s_$l" }
        .mkString(", ")
      val best = "GREATEST(" + markers.map { case (l, _) => s"s_$l" }.mkString(", ") + ")"
      val predCase = "CASE WHEN " + best + " <= 0 THEN 'und' " +
        markers.map { case (l, _) => s"WHEN s_$l = $best THEN '$l'" }.mkString(" ") +
        " END"
      s"""WITH scored AS (SELECT lang, $scores FROM documents),
          pred AS (SELECT lang, $predCase AS pred_lang FROM scored)
          SELECT lang, pred_lang, COUNT(*) AS n FROM pred GROUP BY 1, 2 ORDER BY 1, 2"""
    },

    "tx2_quality_score" ->
      """WITH t AS (
           SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  CAST(len(list_filter(string_split(text, ' '),
                       t -> t IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stop,
                  n_chars
           FROM documents)
         SELECT doc_id, n_tokens, n_stop,
                CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
                CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_token_len,
                (CAST(n_stop AS DOUBLE) / n_tokens) * 0.3
                  + LEAST(n_tokens, 100) / 100.0 * 0.4
                  + (1.0 - ABS(CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens - 4.5) / 10.0) * 0.3
                  AS quality_score
         FROM t ORDER BY doc_id""",

    "tx3_token_count" ->
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
                CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS alpha_tokens,
                CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS num_tokens,
                CAST(list_aggregate(list_transform(string_split(text, ' '),
                     t -> CAST(ceil(length(t) / 4.0) AS BIGINT)), 'sum') AS BIGINT) AS bpe_pieces
         FROM documents ORDER BY doc_id""",

    "tx4_fingerprint" ->
      s"""SELECT doc_id, $duckBagFingerprint AS fingerprint
          FROM documents ORDER BY doc_id""",

    "tx5_rolling_fingerprint" ->
      """SELECT doc_id,
                list_reduce(
                  list_prepend(CAST(0 AS BIGINT),
                    list_transform(string_split(text, ' '),
                      t -> ('0x' || substr(md5(t), 1, 7))::BIGINT)),
                  (acc, x) -> (acc * 31 + x) % 2147483647) AS rolling_hash
         FROM documents ORDER BY doc_id""",

    "dd1_exact_dedup" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS rep_doc_id,
                COUNT(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY rep_doc_id""",

    "dd5_fingerprint_dedup" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fingerprint,
                MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY rep_doc_id""",

    "tx6_bigram_lm_score" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
            bigrams AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2
                        FROM (SELECT * FROM docs WHERE len(ts) >= 2),
                             UNNEST(generate_series(1, len(ts) - 1)) AS u(i)),
            uni AS (SELECT w1, COUNT(*) AS c1
                    FROM (SELECT UNNEST(ts) AS w1 FROM docs) GROUP BY 1),
            bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM bigrams GROUP BY 1, 2)
         SELECT doc_id, COUNT(*) AS n_bigrams,
                CAST(SUM((c2 * 100000000) // c1) AS DOUBLE)
                  / CAST(COUNT(*) * 100000000 AS BIGINT) AS avg_cond_p
         FROM bigrams JOIN bi USING (w1, w2) JOIN uni USING (w1)
         GROUP BY doc_id ORDER BY doc_id""",

    "tx7_repetition_metrics" ->
      """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                       FROM documents),
          u1 AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
          uni AS (SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct,
                         SUM(c * c) AS sc2
                  FROM u1 GROUP BY 1),
          tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
          bg0 AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS bg
                  FROM (SELECT * FROM tk WHERE len(ts) >= 2),
                       UNNEST(generate_series(1, len(ts) - 1)) AS g(i)),
          b1 AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg0 GROUP BY 1, 2),
          bi AS (SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bigram
                 FROM b1 GROUP BY 1),
          j AS (SELECT u.doc_id,
                       CAST(u.n_tokens AS BIGINT) AS n_tokens,
                       CAST(u.n_distinct AS BIGINT) AS n_distinct,
                       1.0 - CAST(u.n_distinct AS DOUBLE) / u.n_tokens AS dup_token_frac,
                       CAST(b.top_bigram AS DOUBLE) / b.n_bigrams AS top_bigram_frac,
                       CAST(u.sc2 AS DOUBLE) / (u.n_tokens * u.n_tokens) AS simpson_index
                FROM uni u LEFT JOIN bi b USING (doc_id))
          SELECT *, (dup_token_frac > 0.6 OR top_bigram_frac > 0.18) AS is_repetitive
          FROM j ORDER BY doc_id""",

    "tx8_pii_scrub" ->
      """WITH injected AS (
           SELECT doc_id,
                  text
                    || CASE WHEN doc_id % 5 = 0 THEN ' reach me at user42@example.com' ELSE '' END
                    || CASE WHEN doc_id % 7 = 0 THEN ' call +1 212-555-0142 now' ELSE '' END
                    || CASE WHEN doc_id % 11 = 0 THEN ' server at 192.168.0.12 logs' ELSE '' END
                    AS text
           FROM documents)
         SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
                CAST(len(regexp_extract_all(text, '\+?[0-9][0-9()\- ]{7,}[0-9]')) AS BIGINT) AS n_phones,
                CAST(len(regexp_extract_all(text, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
                md5(regexp_replace(regexp_replace(regexp_replace(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g'),
                    '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g')) AS scrubbed_md5
         FROM injected ORDER BY doc_id""",

    "tx12_char_entropy" ->
      """WITH chars AS (
           SELECT doc_id, substr(text, i, 1) AS ch
           FROM documents, UNNEST(generate_series(1, len(text))) AS u(i)),
         counts AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2),
         tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
                        COUNT(*) AS n_distinct_chars
                 FROM counts GROUP BY 1)
         SELECT c.doc_id,
                MAX(t.n) AS n_chars,
                MAX(t.n_distinct_chars) AS n_distinct_chars,
                ROUND(SUM(-(CAST(c.c AS DOUBLE) / t.n) * log2(CAST(c.c AS DOUBLE) / t.n)), 4) AS entropy_bits
         FROM counts c JOIN tot t ON c.doc_id = t.doc_id
         GROUP BY 1 ORDER BY 1""",

    "tx11_url_extract" ->
      """WITH injected AS (
           SELECT doc_id,
                  text || CASE CAST(doc_id % 4 AS INT)
                    WHEN 0 THEN ' see https://www.Example.COM/path/a?q=1 ref'
                    WHEN 1 THEN ' at http://data.example.org/x now'
                    WHEN 2 THEN ' from https://sub.test.net/y/z.html end'
                    ELSE '' END AS text
           FROM documents),
         urls AS (SELECT doc_id, regexp_extract(text, 'https?://[^ ]+', 0) AS url
                  FROM injected),
         norm AS (SELECT doc_id,
                         regexp_replace(lower(regexp_extract(url, '^https?://([^/?#]+)', 1)),
                                        '^www\.', '') AS domain
                  FROM urls WHERE url <> '')
         SELECT domain, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
         FROM norm GROUP BY 1 ORDER BY 1""",

    "tx10_ngram_udtf" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
          g AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS ngram
                FROM t, UNNEST(generate_series(1, len(ts) - 2)) AS u(i))
          SELECT doc_id, COUNT(*) AS n_ngrams,
                 COUNT(DISTINCT ngram) AS n_distinct
          FROM g GROUP BY 1 ORDER BY doc_id""",

    // top-100 vocabulary by (freq DESC, tok ASC) — a total order, so the
    // cut is identical across engines.
    "tx19_oov_rate" ->
      """WITH toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                       FROM documents),
          vocab AS (SELECT tok FROM toks GROUP BY tok
                    ORDER BY COUNT(*) DESC, tok LIMIT 100)
          SELECT t.doc_id, COUNT(*) AS n_tokens,
                 CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov,
                 CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS oov_rate
          FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
          GROUP BY 1 ORDER BY t.doc_id""")
}
