package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CosineSimilarity

/** Similarity search over the `embeddings` table (Array[Float] vectors).
  *
  * sim1 is the exact brute-force cosine top-k baseline: broadcast the (small)
  * query set against the full corpus — one pass, no shuffle of the corpus.
  * sim2 is the scale path: random-hyperplane LSH buckets shrink the candidate
  * set ~2^P×, so at 100 TB the join is bucket-local instead of all-pairs.
  * Hyperplane weights come from an LCG formula shared verbatim with the
  * DuckDB oracle, so the bucketing itself is oracle-checkable.
  *
  * The inner loop uses the native codegen'd [[CosineSimilarity]] expression
  * (index-ordered double accumulation — bit-identical to the composable
  * `aggregate(zip_with(...))` form it replaced, but a primitive loop instead
  * of per-element interpreted lambdas). Outputs round to 4 digits
  * (cross-engine accumulation-order tolerance); ranking uses the raw value.
  */
object SimilarityOps {
  type Q = (SparkSession, String) => DataFrame

  private val PLANES = 8          // total hyperplanes
  private val TABLES = 2          // independent LSH tables…
  private val ROWS_PER_TABLE = 4  // …of 4 bits (16 buckets) each
  private val TOPK = 5
  private val NQUERY = 10 // vec_id < 10 are the query vectors

  /** embeddings as double vectors. */
  private def vecs(s: SparkSession, d: String): DataFrame = {
    CosineSimilarity.register(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
  }

  private def topkPerQuery(cand: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("raw_sim").desc, col("neighbor_id"))
    cand.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TOPK)
      .select(col("query_id"), col("neighbor_id"), round(col("raw_sim"), 4).as("sim"))
      .orderBy("query_id", "neighbor_id")
  }

  val queries: Map[String, Q] = Map(
    // Brute-force cosine top-k: exact baseline.
    "sim1_cosine_topk" -> { (s, d) =>
      val all = vecs(s, d)
      val q = all.filter(col("vec_id") < NQUERY)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val cand = all
        .select(col("vec_id").as("neighbor_id"), col("v"))
        .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("raw_sim", expr("cosine_sim(qv, v)"))
      topkPerQuery(cand)
    },

    // Embedding-cosine near-duplicate detection (the vector-space dedup
    // modality): all pairs above a cosine threshold (0.35 — this synthetic corpus tops out at ~0.51 pairwise), grouped to a
    // min-id representative. Exact all-pairs here is the auditable
    // baseline; at corpus scale the same threshold query runs over the
    // LSH buckets below (sim2) instead of the cross join.
    "dd6_embedding_neardup" -> { (s, d) =>
      val all = vecs(s, d)
      val a = all.select(col("vec_id").as("vec_a"), col("v").as("qv"))
      val b = all.select(col("vec_id").as("vec_b"), col("v"))
      a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("raw_sim", expr("cosine_sim(qv, v)"))
        .filter(col("raw_sim") >= 0.35)
        .select(col("vec_a"), col("vec_b"), round(col("raw_sim"), 4).as("sim"))
        .orderBy("vec_a", "vec_b")
    },

    // Multi-table LSH ANN: TABLES independent hash tables of ROWS_PER_TABLE
    // hyperplane bits each; a candidate matches the query in ANY table
    // (union-of-buckets, the standard recall lever — one wide table starves
    // recall on small corpora and over-prunes skewed ones). Hyperplane
    // weight w(j, i) for plane j, 1-based dim i:
    //   lcg(k) = (1103515245 * k + 12345) mod 2^31,  k = j * 64 + (i - 1)
    //   w = lcg(k) / 2^31 - 0.5
    "sim2_lsh_ann" -> { (s, d) =>
      val all = vecs(s, d)
      val bucketed = lshBuckets(all)
      val q = bucketed.filter(col("vec_id") < NQUERY)
        .select(col("vec_id").as("query_id"), col("tbl"), col("bucket"))
      // candidate pairs from any table, deduped BEFORE the cosine work
      val cand = bucketed
        .select(col("vec_id").as("neighbor_id"), col("tbl"), col("bucket"))
        .join(broadcast(q), Seq("tbl", "bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id").distinct()
      val qv = all.filter(col("vec_id") < NQUERY)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val scored = cand
        .join(all.select(col("vec_id").as("neighbor_id"), col("v")), Seq("neighbor_id"))
        .join(broadcast(qv), Seq("query_id"))
        .withColumn("raw_sim", expr("cosine_sim(qv, v)"))
      topkPerQuery(scored)
    },

    // DD8: the SCALE path for embedding near-dup — dd6's exact all-pairs
    // threshold query restricted to LSH bucket collisions. The pair space
    // shrinks from O(n²) to the union of per-bucket squares (shuffle on the
    // bucket key only); each surviving candidate is verified with the exact
    // codegen'd cosine — classic filter-verify, recall traded per table
    // count exactly as in sim2.
    "dd8_neardup_lsh" -> { (s, d) =>
      val all = vecs(s, d)
      val bucketed = lshBuckets(all).select("vec_id", "tbl", "bucket")
      val cand = bucketed.select(col("vec_id").as("vec_a"), col("tbl"), col("bucket"))
        .join(bucketed.select(col("vec_id").as("vec_b"), col("tbl"), col("bucket")),
          Seq("tbl", "bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct()
      cand
        .join(all.select(col("vec_id").as("vec_a"), col("v").as("qv")), Seq("vec_a"))
        .join(all.select(col("vec_id").as("vec_b"), col("v")), Seq("vec_b"))
        .withColumn("raw_sim", expr("cosine_sim(qv, v)"))
        .filter(col("raw_sim") >= 0.35)
        .select(col("vec_a"), col("vec_b"), round(col("raw_sim"), 4).as("sim"))
        .orderBy("vec_a", "vec_b")
    },

    "sim3_ivf_ann" -> ivfQuery,

    // SIM12: IVF search over the TRAINED coarse quantizer — the
    // train → index → search chain closed end-to-end: emb7's one-round
    // Lloyd codebook (StatOps.trainedCentroids, exact integer centroids)
    // replaces sim3's raw seed anchors; the search half (argmin cell
    // assignment as a broadcast projection, NPROBE nearest cells per
    // query, exact cosine on the survivors) is identical. Hash-gated
    // like sim3 — the trained centroids are bit-identical cross-engine,
    // so "training improved the index" is itself an auditable claim
    // (SimilaritySpec compares recall against sim3's).
    "sim12_ivf_trained" -> { (s, d) =>
      val all = vecs(s, d)
      val iv = graft.operators.StatOps.intGrid(s, d)
      // trained once, consumed twice (assignment + probe codebook):
      // localCheckpoint the K-row codebook so the seed→assign→recenter
      // training subtree runs a single time per query, not once per
      // consumer (dd26's discipline for the identical subtree).
      val cent = graft.operators.StatOps.trainedCentroids(s, d)
        .localCheckpoint()
      val assigned = graft.operators.StatOps
        .lloydAssign(iv, cent)
        .select("vec_id", "cell")
      val book = cent
        .agg(sort_array(collect_list(struct(col("cell"), col("cvec"))))
          .as("abook"))
      val probes = iv.filter(col("vec_id") < NQUERY)
        .crossJoin(broadcast(book))
        .select(col("vec_id").as("query_id"),
          explode(expr(
            s"""slice(array_sort(transform(abook, a -> named_struct(
                  'dist', aggregate(zip_with(ivec, a.cvec, (x, y) -> (x - y) * (x - y)),
                                    CAST(0 AS BIGINT), (acc, e) -> acc + e),
                  'cell', a.cell))), 1, $NPROBE)""")).as("pc"))
        .select(col("query_id"), col("pc.cell").as("cell"))
      val cand = assigned
        .select(col("vec_id").as("neighbor_id"), col("cell"))
        .join(broadcast(probes), Seq("cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select("query_id", "neighbor_id").distinct()
      val qv = all.filter(col("vec_id") < NQUERY)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val scored = cand
        .join(all.select(col("vec_id").as("neighbor_id"), col("v")), Seq("neighbor_id"))
        .join(broadcast(qv), Seq("query_id"))
        .withColumn("raw_sim", expr("cosine_sim(qv, v)"))
      topkPerQuery(scored)
    },

    // DD26: SEMANTIC DEDUP (SemDeDup, Abbas et al. 2023 — public): dedup
    // by MEANING, not surface form — the step after dd2/dd6 in a modern
    // curation stack. Vectors assign to emb7's trained k-means cells;
    // within each cell, pairs above the cosine threshold are semantic
    // duplicates; duplicate groups close under connected components
    // (dd7's machinery); each group keeps the member FARTHEST from its
    // cell centroid (the paper's diversity-preserving rule — exact int64
    // distance, ties → min id). The cluster-bounded pair space is
    // SemDeDup's own scale story: pair work is Σ|cell|², bounded by
    // sizing k with the corpus, never global all-pairs. Every stage is
    // deterministic (integer centroids/distances, rounded-free threshold
    // compare like dd6), so the full train → cluster → dedup chain
    // hash-gates.
    "dd26_semdedup" -> { (s, d) =>
      val all = vecs(s, d)
      // materialized once: the assignment subtree (full Lloyd pipeline)
      // feeds four consumers below (both pair sides, the representative
      // pick, the final manifest) — without truncation each re-runs the
      // train+assign plan. Remaining cost is the trained-codebook chain
      // (emb7's two Lloyd rounds) plus one pair-verify pass; the CC step
      // is a single per-cell union-find stage (boundedComponents), not
      // the iterative chain that made this the suite's slowest gate in
      // round 10 (~3.9 s idle; cells are balanced at ~125 vectors,
      // 862 sem pairs — probed round 10).
      val assigned = graft.operators.StatOps.lloydAssign(
          graft.operators.StatOps.intGrid(s, d),
          graft.operators.StatOps.trainedCentroids(s, d))
        .select(col("vec_id"), col("cell"), col("dist"))
        .localCheckpoint()
      val withV = assigned.join(all, Seq("vec_id"))
      val pairs = withV
        .select(col("cell"), col("vec_id").as("vec_a"), col("v").as("qv"))
        .join(withV.select(col("cell"), col("vec_id").as("vec_b"), col("v")),
          Seq("cell"))
        .filter(col("vec_a") < col("vec_b"))
        .withColumn("raw_sim", expr("cosine_sim(qv, v)"))
        // threshold on the ROUNDED value (oracle mirrors ROUND(1e-9+x, 6)):
        // dd26 feeds this decision into connected components, so a pair
        // sitting within float-summation noise of 0.35 flipping cross-engine
        // would restructure whole clusters — rounding first makes the
        // boundary decision summation-order-independent.
        .filter(graft.functions.Exact.stableRound(col("raw_sim"), 6) >= 0.35)
        .select(col("cell"), col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      // Components cannot span cells (pairs exist only within a cell and
      // each vec has exactly one cell), so the iterative CC machinery is
      // unnecessary — one per-cell local union-find replaces the
      // rounds × (join + agg + checkpoint) chain that made this the
      // suite's slowest gate. Labels are identical (min member id).
      val clusters = DedupOps.boundedComponents(pairs, "cell")
      val rep = clusters
        .join(assigned.withColumnRenamed("vec_id", "doc_id"), Seq("doc_id"))
        .groupBy("cluster_id")
        .agg(max(struct(col("dist"), (-col("doc_id")).as("nid"))).as("best"))
        .select(col("cluster_id"), (-col("best.nid")).as("rep_id"))
      assigned
        .join(clusters.withColumnRenamed("doc_id", "vec_id"),
          Seq("vec_id"), "left")
        .join(broadcast(rep), Seq("cluster_id"), "left")
        .select(
          col("vec_id"), col("cell"),
          coalesce(col("cluster_id"), col("vec_id")).as("sem_cluster"),
          coalesce(col("n_members"), lit(1L)).as("n_members"),
          col("dist").as("centroid_dist"),
          (col("cluster_id").isNull || col("vec_id") === col("rep_id"))
            .as("keep"))
        .orderBy("vec_id")
    },

    // EMB8: CONTRASTIVE PAIR MINING — constructing the training triples
    // an embedding model is tuned on (anchor, positive, hard negative):
    // hard-negative mining (Karpukhin et al. 2020 DPR; Xiong et al. 2021
    // ANCE — public) wants negatives that are CLOSE to the anchor yet
    // wrong, and the standard scale trick is exactly the one this repo
    // already trains: restrict candidate pairs to the anchor's coarse
    // cell (ANCE mines from an ANN index; here emb7's trained k-means
    // cells), so pair work is Σ|cell|², never global all-pairs. Within
    // the anchor's cell: positive = highest-cosine neighbor at
    // sim >= 0.35 (dd26's semantic-duplicate band), hard negative =
    // highest-cosine neighbor BELOW 0.2 (closest confusable non-match;
    // the [0.2, 0.35) margin band is excluded as label noise). Both
    // argmaxes are one hash-agg over the pair stream (max(struct)), ties
    // to the smaller id; thresholds compare on stableRound like dd26, so
    // the triple set is summation-order-independent and hash-gates.
    "emb8_contrastive_mining" -> { (s, d) =>
      val all = vecs(s, d)
      val assigned = graft.operators.StatOps.lloydAssign(
          graft.operators.StatOps.intGrid(s, d),
          graft.operators.StatOps.trainedCentroids(s, d))
        .select(col("vec_id"), col("cell"))
        .localCheckpoint() // train+assign subtree feeds both pair sides
      val withV = assigned.join(all, Seq("vec_id"))
      val sims = withV
        .select(col("cell"), col("vec_id").as("anchor_id"), col("v").as("av"))
        .join(withV.select(col("cell"), col("vec_id").as("cand_id"), col("v")),
          Seq("cell"))
        .filter(col("anchor_id") =!= col("cand_id"))
        .withColumn("sim",
          graft.functions.Exact.stableRound(expr("cosine_sim(av, v)"), 6))
        .select("anchor_id", "cand_id", "sim")
      // r15 (§1.2/§2.4): both argmaxes in ONE aggregate over ONE pair-
      // stream evaluation. The previous two best() branches each re-ran
      // the Σ|cell|² cosine pass and met in an extra equi-join (profiled
      // 32c: two concurrent ~0.55 s pair stages + join stages); a
      // conditional max(when(...)) per band computes the same two argmaxes
      // in the same hash-agg, and the inner join's both-sides-present
      // contract becomes a both-non-null filter. max ignores NULLs, the
      // (sim, -cand_id) struct ordering is unchanged, so the triple set is
      // identical.
      sims.groupBy("anchor_id")
        .agg(
          max(when(col("sim") >= 0.35,
            struct(col("sim"), (-col("cand_id")).as("nid")))).as("bp"),
          max(when(col("sim") < 0.2,
            struct(col("sim"), (-col("cand_id")).as("nid")))).as("bn"))
        .filter(col("bp").isNotNull && col("bn").isNotNull)
        .select(col("anchor_id"),
          (-col("bp.nid")).as("positive_id"), col("bp.sim").as("positive_sim"),
          (-col("bn.nid")).as("negative_id"), col("bn.sim").as("negative_sim"))
        .orderBy("anchor_id")
    },

    // TX25: CLUSTER TOPIC LABELING (c-TF-IDF, Grootendorst's BERTopic
    // scheme, public): each emb7-trained k-means cell gets its top-3
    // characteristic terms, scored cell_tf × (n_cells+1)/(cell_df+1) —
    // term frequency within the cell against how many cells contain the
    // term at all. This is the corpus-map step of a curation pipeline
    // (Nemotron-CC-style domain clustering): cluster the embeddings,
    // then NAME the clusters so humans can audit the mixture. The score
    // is a product/quotient of integers (log-free, tx13's convention) so
    // it hash-gates; ties → lexicographically smaller term. Shape at
    // scale: assignment is emb7's broadcast-codebook projection; tf is
    // one (cell, term) hash-agg over the token stream; cell-df is a
    // re-agg of tf (never a second corpus scan); n_cells is a 1-row
    // broadcast; the rank window partitions by cell (bounded at K cells
    // × vocabulary, never by corpus size).
    "tx25_cluster_terms" -> { (s, d) =>
      val cells = graft.operators.StatOps.lloydAssign(
          graft.operators.StatOps.intGrid(s, d),
          graft.operators.StatOps.trainedCentroids(s, d))
        .select(col("vec_id").as("doc_id"), col("cell"))
      // r15 (§5 caching): tf has THREE consumers (cdf's re-agg, the n_cells
      // count, the final score join) and its lineage is the k-means train +
      // assign + corpus token explode — unpersisted, each consumer re-ran
      // that chain (profiled 32c: three concurrent ~0.4 s corpus stages,
      // stage-sum 4.1 s vs 2.5 s wall). The persisted frame is
      // (cell, term, ctf) — bounded by K cells × vocabulary, never corpus
      // rows; drained by Bench between timed repeats.
      val tf = graft.CacheScope.persistScoped(Tables.documents(s, d)
        .join(cells, Seq("doc_id"))
        .select(col("cell"),
          explode(split(lower(col("text")), "[^a-z]+")).as("term"))
        .filter(length(col("term")) >= 3)
        .groupBy("cell", "term").agg(count(lit(1)).as("ctf")))
      val cdf = tf.groupBy("term").agg(count(lit(1)).as("cdf"))
      val nc = tf.select(col("cell")).distinct()
        .agg(count(lit(1)).as("n_cells"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cell").orderBy(col("score").desc, col("term"))
      tf.join(cdf, Seq("term"))
        .crossJoin(broadcast(nc))
        .withColumn("score",
          col("ctf") * (col("n_cells") + lit(1.0)) / (col("cdf") + lit(1.0)))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("cell"), col("rk").cast("long").as("rk"), col("term"),
          col("ctf"), round(col("score"), 4).as("score"))
        .orderBy("cell", "rk")
    },

    // SIM7: reciprocal-rank fusion of two retrieval modalities — the
    // standard way hybrid search merges rankings that don't share a score
    // scale (RRF, Cormack et al. SIGIR'09): here the exact cosine ranking
    // (sim1's modality) fused with a sketch-agreement ranking (number of
    // LSH tables where the candidate collides with the query — sim2's
    // modality, integer votes). score = Σ_modality 1/(60 + rank), missing
    // from a list contributes 0. Ranks are deterministic (desc value,
    // neighbor_id tie-break); the fused score is a two-term sum of exact
    // reciprocals in fixed order, so it hash-gates. Each modality is a
    // broadcast-join + per-partition top-k — fusion adds one full-outer
    // join on (query, neighbor), both sides already tiny (≤ k per query).
    "sim7_rank_fusion" -> { (s, d) =>
      val all = vecs(s, d)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id")
      val q = all.filter(col("vec_id") < NQUERY)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val exact = all.select(col("vec_id").as("neighbor_id"), col("v"))
        .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("raw_sim", expr("cosine_sim(qv, v)"))
        .withColumn("ra", row_number().over(
          w.orderBy(col("raw_sim").desc, col("neighbor_id"))))
        .filter(col("ra") <= TOPK)
        .select("query_id", "neighbor_id", "ra")
      val bucketed = lshBuckets(all).select("vec_id", "tbl", "bucket")
      val qb = bucketed.filter(col("vec_id") < NQUERY)
        .select(col("vec_id").as("query_id"), col("tbl"), col("bucket"))
      val sketch = bucketed
        .select(col("vec_id").as("neighbor_id"), col("tbl"), col("bucket"))
        .join(broadcast(qb), Seq("tbl", "bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(count(lit(1)).as("votes"))
        .withColumn("rb", row_number().over(
          w.orderBy(col("votes").desc, col("neighbor_id"))))
        .filter(col("rb") <= TOPK)
        .select("query_id", "neighbor_id", "rb")
      exact.join(sketch, Seq("query_id", "neighbor_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60) + col("ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("rb")), lit(0.0)))
        .withColumn("rk", row_number().over(
          w.orderBy(col("rrf").desc, col("neighbor_id"))))
        .filter(col("rk") <= TOPK)
        .select(col("query_id"), col("neighbor_id"),
          graft.functions.Exact.stableRound(col("rrf"), 6).as("rrf_score"),
          col("ra").isNotNull.as("in_exact"), col("rb").isNotNull.as("in_sketch"))
        .orderBy("query_id", "neighbor_id")
    },

    // SIM4: int8 SCALAR QUANTIZATION of the embedding column — the storage
    // path for vector corpora (4x smaller than float32, 8x than float64).
    // Per-vector affine codes: q = floor((x - lo) / (hi - lo) * 255 + 0.5).
    // floor(+0.5) instead of round() because the two engines disagree on
    // rounding mode at ties, while double IEEE arithmetic and floor are
    // bit-identical. Pure map — no shuffle, embarrassingly parallel at any
    // scale. Codes are integers, so the gate compares them exactly (hashed
    // per vector to keep the result narrow).
    "sim4_quantize" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .withColumn("lo", expr("array_min(v)"))
        .withColumn("hi", expr("array_max(v)"))
        .withColumn("codes", expr(
          """transform(v, x -> CASE WHEN hi = lo THEN 0
             ELSE CAST(floor((x - lo) / (hi - lo) * 255 + 0.5) AS INT) END)"""))
        .select(col("vec_id"), col("label"),
          expr("array_min(codes)").as("code_min"),
          expr("array_max(codes)").as("code_max"),
          md5(expr("array_join(transform(codes, c -> CAST(c AS STRING)), ',')"))
            .as("code_hash"))
        .orderBy("vec_id")
    },

    // SIM5: recall@k evaluation — the ANN quality gate every index change
    // reruns: per query, how much of the exact top-k (sim1) the LSH path
    // (sim2) recovered. Both sides reuse the registered pipelines (and
    // their broadcast plans); the comparison itself is a left join on
    // (query, neighbor) + a per-query count — distributed end to end, no
    // collect, so the same evaluation runs over a 10M-query panel. Integer
    // counts make the gate hash-exact; recall is their IEEE quotient.
    "sim5_recall_at_k" -> { (s, d) =>
      val exact = queries("sim1_cosine_topk")(s, d)
        .select("query_id", "neighbor_id")
      val ann = queries("sim2_lsh_ann")(s, d)
        .select("query_id", "neighbor_id")
      val hits = exact
        .join(ann.withColumn("hit", lit(1)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hits"))
      hits
        .join(ann.groupBy("query_id").agg(count(lit(1)).as("n_ann")),
          Seq("query_id"), "left")
        .select(col("query_id"), col("n_exact"),
          coalesce(col("n_ann"), lit(0L)).as("n_ann"), col("n_hits"),
          (col("n_hits").cast("double") / lit(TOPK.toDouble)).as("recall_at_k"))
        .orderBy("query_id")
    },

    // SIM8: nDCG@k of the LSH ranking against the exact ranking — the
    // graded-relevance eval next to sim5's flat recall (an ANN index that
    // finds all 5 neighbors but inverts their order scores 1.0 recall yet
    // < 1.0 nDCG). Relevance = 6 − exact-rank; the log2 position discounts
    // are INTEGER literals (round(1e6/log2(i+1)) precomputed once) so the
    // per-query DCG is an exact int64 sum — no cross-engine libm log2 in
    // the gate — and nDCG is a single IEEE division by the constant ideal.
    "sim8_ndcg" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
      val rel = queries("sim1_cosine_topk")(s, d)
        .withColumn("erk", row_number().over(w))
        .select(col("query_id"), col("neighbor_id"),
          (lit(6L) - col("erk")).cast("long").as("rel"))
      queries("sim2_lsh_ann")(s, d)
        .withColumn("ark", row_number().over(w))
        .join(rel, Seq("query_id", "neighbor_id"), "left")
        .withColumn("relv", coalesce(col("rel"), lit(0L)))
        .withColumn("disc6", element_at(
          typedLit(Seq(1000000L, 630930L, 500000L, 430677L, 386853L)),
          col("ark").cast("int")))
        .groupBy("query_id")
        .agg(sum(col("relv") * col("disc6")).as("dcg6"))
        .select(col("query_id"), col("dcg6"),
          graft.functions.Exact.stableRound(
            col("dcg6").cast("double") / lit(10271927.0), 6).as("ndcg"))
        .orderBy("query_id")
    },

    // SIM9: maximum-inner-product top-k (the retrieval scoring for
    // embeddings trained WITHOUT norm constraints, where cosine's
    // normalization discards magnitude information). Coordinates go
    // through emb1's FLOOR(x·1e6+0.5) integer scaling, so every dot
    // product is an exact int64 — the whole gate is integer-exact with no
    // rounding convention at all. Same broadcast-query / corpus-scan
    // shape as sim1; at corpus scale the scan side swaps to an IVF/LSH
    // candidate stream unchanged.
    "sim9_mips_topk" -> { (s, d) =>
      val iv = Tables.embeddings(s, d)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT))")
            .as("iv"))
      val q = iv.filter(col("vec_id") < NQUERY)
        .select(col("vec_id").as("query_id"), col("iv").as("qiv"))
      val cand = iv.select(col("vec_id").as("neighbor_id"), col("iv"))
        .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("dot6",
          expr("aggregate(zip_with(qiv, iv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("dot6").desc, col("neighbor_id"))
      cand.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= TOPK)
        .select(col("query_id"), col("neighbor_id"), col("dot6"))
        .orderBy("query_id", "neighbor_id")
    },

    // SIM6: hard-negative mining — for each query vector, the top-k most
    // similar vectors of a DIFFERENT label (the contrastive-learning
    // negative set: negatives that look like positives train the sharpest
    // margins). Same broadcast-query / corpus-scan shape as sim1 with the
    // label inequality fused into the join condition, so mismatched pairs
    // are never scored; per-query top-k via the rank window. At corpus
    // scale the scan side swaps to sim2's LSH buckets unchanged.
    "sim6_hard_negatives" -> { (s, d) =>
      val lbl = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
      val all = vecs(s, d).join(lbl, Seq("vec_id"))
      val q = all.filter(col("vec_id") < NQUERY)
        .select(col("vec_id").as("query_id"), col("label").as("query_label"),
          col("v").as("qv"))
      val cand = all
        .select(col("vec_id").as("neighbor_id"),
          col("label").as("neighbor_label"), col("v"))
        .join(broadcast(q), col("query_label") =!= col("neighbor_label"))
        .withColumn("raw_sim", expr("cosine_sim(qv, v)"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("raw_sim").desc, col("neighbor_id"))
      cand.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= TOPK)
        .select(col("query_id"), col("query_label"), col("neighbor_id"),
          col("neighbor_label"), round(col("raw_sim"), 4).as("sim"))
        .orderBy("query_id", "neighbor_id")
    },

    // DD12: embedding-space dedup MANIFEST — dd9's corpus-build artifact in
    // vector space: every vector with its near-dup cluster (connected
    // components over dd8's LSH-verified pair graph) and a keep/drop flag.
    // The pair graph and the clustering are memoized stage outputs (same
    // staged-pipeline contract as dd7/dd9); the manifest itself is one
    // left join over the corpus.
    "dd12_embedding_manifest" -> { (s, d) =>
      val clusters = embClustersCache.computeIfAbsent((s, d), { _ =>
        val pairs = queries("dd8_neardup_lsh")(s, d)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")).persist()
        DedupOps.connectedComponents(pairs)
          .withColumnRenamed("doc_id", "vec_id").persist()
      })
      Tables.embeddings(s, d).select(col("vec_id"))
        .join(clusters, Seq("vec_id"), "left")
        .select(
          col("vec_id"),
          coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"),
          coalesce(col("n_members"), lit(1L)).as("n_members"),
          (coalesce(col("cluster_id"), col("vec_id")) === col("vec_id")).as("keep"))
        .orderBy("vec_id")
    })

  /** dd12's memoized cluster table (the dd8 stage output run through CC). */
  private val embClustersCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** (vec_id, v, tbl, bucket) — every vector's bucket in each of the TABLES
    * independent hyperplane tables (see sim2 scaladoc for the weight
    * formula, shared verbatim with the oracles). */
  /** Hyperplane j's 64 weights, precomputed once on the driver — the same
    * LCG formula the oracle states in SQL; embedding them as a LITERAL
    * array removes the per-row re-derivation the expression form paid. */
  private def planeWeights(j: Int): Seq[Double] = (0 until 64).map { i =>
    val k = j * 64L + i
    ((1103515245L * k + 12345L) % 2147483648L) / 2147483648.0 - 0.5
  }

  private def lshBuckets(all: DataFrame): DataFrame = {
    // Bucketing consumes only the SIGN of each hyperplane dot, and
    // sign(dot(v, w)) == sign(cosine(v, w)) (norms are positive) — so the
    // dot routes through the codegen'd CosineSimilarity primitive loop
    // instead of interpreted aggregate/zip_with lambdas (Spark never
    // codegens higher-order functions). At sf0.1 the query is stage-floor
    // bound either way; at corpus scale the per-vector signature cost is
    // the linear term and the primitive loop wins. Both engines
    // accumulate in index order, so the sign agrees bit-for-bit with the
    // oracle's plain dot.
    val planeDot = (0 until PLANES).map { j =>
      val arr = planeWeights(j).mkString("array(", "D, ", "D)")
      expr(s"cosine_sim(v, $arr)")
    }
    val tables = (0 until TABLES).map { t =>
      val bucket = (0 until ROWS_PER_TABLE).map { r =>
        val c = planeDot(t * ROWS_PER_TABLE + r)
        when(c >= 0, 1L << r).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(t).as("tbl"), bucket.as("bucket"))
    }
    all.select(col("vec_id"), col("v"), explode(array(tables: _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("tb.tbl"), col("tb.bucket"))
  }

  /** IVF-style ANN: coarse quantizer cells + nprobe search restricted to
    * the probed cells — the filter-verify shape of FAISS's IVF indexes.
    *
    * The coarse quantizer is DETERMINISTICALLY SEEDED (the emb2_pq_assign
    * recipe): cell anchors are the K_CELLS lowest-vec_id vectors, and every
    * coordinate goes through emb1's FLOOR(v·1e6+0.5) integer scaling FIRST,
    * so squared L2 distances are exact int64 and the argmin (ties → min
    * cell id) cannot flip cross-engine — which upgrades this gate from
    * rows-only to a full DuckDB hash oracle. A k-means-trained codebook
    * would slot into the same plan (swap the anchor frame for trained
    * centroids); the seeded choice trades a few recall points for an
    * oracle-checkable index, and SimilaritySpec still asserts recall
    * against the exact baseline.
    *
    * Shape at scale: the codebook is ONE broadcast row, so assignment is a
    * pure projection over the corpus (no shuffle, no iteration — argmin of
    * 16 integer dots per row via nested higher-order functions); the only
    * at-scale work is the cell-key join of probes against the assigned
    * corpus, then exact cosine on the surviving candidates. Probing the
    * NPROBE (=2) nearest cells is the standard recall lever for queries
    * that land near a Voronoi boundary. */
  private val NPROBE = 2
  private val K_CELLS = 16

  /** Exact int64 squared L2 between the row's scaled vector and an anchor's,
    * accumulated in index order. */
  private def cellDist(anchor: String) =
    s"aggregate(zip_with(ivec, $anchor, (x, y) -> (x - y) * (x - y)), " +
      "CAST(0 AS BIGINT), (acc, e) -> acc + e)"

  def ivfQuery: Q = { (s, d) =>
    val all = vecs(s, d)
    val iv = all.withColumn("ivec",
      expr("transform(v, x -> CAST(FLOOR(x * 1e6 + 0.5) AS BIGINT))"))
    // the codebook as ONE broadcast row: [(cell, anchor_ivec), ...]
    val codebook = iv.orderBy("vec_id").limit(K_CELLS)
      .select(col("vec_id").as("cell"), col("ivec").as("avec"))
      .agg(sort_array(collect_list(struct(col("cell"), col("avec"))))
        .as("abook"))
    val withBook = iv.crossJoin(broadcast(codebook))
    // assignment = argmin over the 16 anchors, computed per-row: struct
    // array_min orders by (dist, cell) so exact-integer ties break to the
    // smallest cell id, same as the oracle's ROW_NUMBER (ORDER BY dist, cell).
    val assigned = withBook
      .withColumn("cell", expr(
        s"""array_min(transform(abook, a ->
              named_struct('dist', ${cellDist("a.avec")}, 'cell', a.cell))).cell"""))
      .select(col("vec_id"), col("cell"))
    // nprobe>1: each query searches its NPROBE nearest cells, not just its
    // own. Same per-row argsort over the broadcast codebook — the probe
    // list never touches the corpus.
    val probes = withBook.filter(col("vec_id") < NQUERY)
      .select(col("vec_id").as("query_id"),
        explode(expr(
          s"""slice(array_sort(transform(abook, a ->
                named_struct('dist', ${cellDist("a.avec")}, 'cell', a.cell))),
              1, $NPROBE)""")).as("pc"))
      .select(col("query_id"), col("pc.cell").as("cell"))
    // dedupe candidate PAIRS before the cosine work — a neighbor sitting in
    // two probed cells must be scored (and ranked) once.
    val cand = assigned
      .select(col("vec_id").as("neighbor_id"), col("cell"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").distinct()
    val qv = all.filter(col("vec_id") < NQUERY)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = cand
      .join(all.select(col("vec_id").as("neighbor_id"), col("v")), Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("raw_sim", expr("cosine_sim(qv, v)"))
    topkPerQuery(scored)
  }

  private val duckVecs =
    """e AS (SELECT vec_id, embedding FROM embeddings),
       u AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
             FROM e, UNNEST(generate_series(1, len(embedding))) AS g(i)),
       n AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM u GROUP BY 1)"""

  private val sim1Sql =
      s"""WITH $duckVecs,
          dot AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                         SUM(a.x * b.x) AS dp
                  FROM u a JOIN u b ON a.i = b.i
                  WHERE a.vec_id < $NQUERY AND a.vec_id <> b.vec_id
                  GROUP BY 1, 2),
          sim AS (SELECT query_id, neighbor_id,
                         dp / (na.nrm * nb.nrm) AS raw_sim
                  FROM dot
                  JOIN n na ON na.vec_id = query_id
                  JOIN n nb ON nb.vec_id = neighbor_id),
          ranked AS (SELECT query_id, neighbor_id, raw_sim,
                            ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY raw_sim DESC, neighbor_id) AS rk
                     FROM sim)
          SELECT query_id, neighbor_id, ROUND(raw_sim, 4) AS sim
          FROM ranked WHERE rk <= $TOPK ORDER BY query_id, neighbor_id"""

  private val sim2Sql =
      s"""WITH $duckVecs,
          hp AS (SELECT j, i,
                        ((1103515245 * CAST(j * 64 + (i - 1) AS BIGINT) + 12345) % 2147483648)
                          / 2147483648.0 - 0.5 AS w
                 FROM (SELECT UNNEST(generate_series(0, ${PLANES - 1})) AS j) pj,
                      (SELECT UNNEST(generate_series(1, 64)) AS i) pi),
          pdot AS (SELECT u.vec_id, hp.j, SUM(u.x * hp.w) AS pd
                   FROM u JOIN hp ON u.i = hp.i GROUP BY 1, 2),
          bkt AS (SELECT vec_id, (j // $ROWS_PER_TABLE) AS tbl,
                         CAST(SUM(CASE WHEN pd >= 0 THEN (CAST(1 AS BIGINT) << (j % $ROWS_PER_TABLE)) ELSE 0 END) AS BIGINT) AS bucket
                  FROM pdot GROUP BY 1, 2),
          cand AS (SELECT DISTINCT qa.vec_id AS query_id, nb.vec_id AS neighbor_id
                   FROM bkt qa JOIN bkt nb
                     ON qa.tbl = nb.tbl AND qa.bucket = nb.bucket
                   WHERE qa.vec_id < $NQUERY AND qa.vec_id <> nb.vec_id),
          dot AS (SELECT c.query_id, c.neighbor_id, SUM(a.x * b.x) AS dp
                  FROM cand c
                  JOIN u a ON a.vec_id = c.query_id
                  JOIN u b ON b.vec_id = c.neighbor_id AND a.i = b.i
                  GROUP BY 1, 2),
          sim AS (SELECT query_id, neighbor_id, dp / (na.nrm * nb.nrm) AS raw_sim
                  FROM dot
                  JOIN n na ON na.vec_id = query_id
                  JOIN n nb ON nb.vec_id = neighbor_id),
          ranked AS (SELECT query_id, neighbor_id, raw_sim,
                            ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY raw_sim DESC, neighbor_id) AS rk
                     FROM sim)
          SELECT query_id, neighbor_id, ROUND(raw_sim, 4) AS sim
          FROM ranked WHERE rk <= $TOPK ORDER BY query_id, neighbor_id"""

  val oracles: Map[String, String] = Map(
    "sim1_cosine_topk" -> sim1Sql,

    "dd6_embedding_neardup" ->
      s"""WITH $duckVecs,
          dot AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                         SUM(a.x * b.x) AS dp
                  FROM u a JOIN u b ON a.i = b.i AND a.vec_id < b.vec_id
                  GROUP BY 1, 2),
          sim AS (SELECT vec_a, vec_b, dp / (na.nrm * nb.nrm) AS raw_sim
                  FROM dot
                  JOIN n na ON na.vec_id = vec_a
                  JOIN n nb ON nb.vec_id = vec_b)
          SELECT vec_a, vec_b, ROUND(raw_sim, 4) AS sim
          FROM sim WHERE raw_sim >= 0.35 ORDER BY vec_a, vec_b""",

    "sim2_lsh_ann" -> sim2Sql,

    // SIM3: the seeded coarse quantizer replayed exactly — integer-scaled
    // coordinates, K_CELLS lowest-vec_id anchors, exact int64 argmin
    // assignment (ties → min cell), NPROBE nearest cells per query, exact
    // cosine on the surviving candidates.
    "sim3_ivf_ann" ->
      s"""WITH $duckVecs,
          iu AS (SELECT vec_id, i,
                        CAST(FLOOR(x * 1e6 + 0.5) AS BIGINT) AS ix
                 FROM u),
          aid AS (SELECT vec_id AS cell FROM embeddings
                  ORDER BY vec_id LIMIT $K_CELLS),
          adist AS (SELECT v.vec_id, av.vec_id AS cell,
                           SUM((v.ix - av.ix) * (v.ix - av.ix)) AS dist
                    FROM iu v
                    JOIN iu av ON av.i = v.i
                      AND av.vec_id IN (SELECT cell FROM aid)
                    GROUP BY 1, 2),
          assigned AS (SELECT vec_id, cell FROM
                         (SELECT vec_id, cell,
                                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dist, cell) AS rn
                          FROM adist)
                       WHERE rn = 1),
          probes AS (SELECT vec_id AS query_id, cell FROM
                       (SELECT vec_id, cell,
                               ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cell) AS rn
                        FROM adist WHERE vec_id < $NQUERY)
                     WHERE rn <= $NPROBE),
          cand AS (SELECT DISTINCT p.query_id, s.vec_id AS neighbor_id
                   FROM probes p JOIN assigned s ON s.cell = p.cell
                   WHERE s.vec_id <> p.query_id),
          dot AS (SELECT c.query_id, c.neighbor_id, SUM(a.x * b.x) AS dp
                  FROM cand c
                  JOIN u a ON a.vec_id = c.query_id
                  JOIN u b ON b.vec_id = c.neighbor_id AND b.i = a.i
                  GROUP BY 1, 2),
          sim AS (SELECT query_id, neighbor_id,
                         dp / (na.nrm * nb.nrm) AS raw_sim
                  FROM dot
                  JOIN n na ON na.vec_id = query_id
                  JOIN n nb ON nb.vec_id = neighbor_id),
          ranked AS (SELECT query_id, neighbor_id, raw_sim,
                            ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY raw_sim DESC, neighbor_id) AS rk
                     FROM sim)
          SELECT query_id, neighbor_id, ROUND(raw_sim, 4) AS sim
          FROM ranked WHERE rk <= $TOPK ORDER BY query_id, neighbor_id""",

    // SIM12: the sim3 search replay with the trained codebook c1 (emb7's
    // shared CTE chain) in place of the raw anchors.
    "sim12_ivf_trained" ->
      s"""WITH ${graft.operators.StatOps.duckTrainedCentroids},
          $duckVecs,
          adist AS (SELECT iu.vec_id, c.cell,
                           SUM((iu.x - c.c) * (iu.x - c.c)) AS dist
                    FROM iu JOIN c1 c ON c.dim = iu.dim
                    GROUP BY 1, 2),
          assigned AS (SELECT vec_id, cell FROM
                         (SELECT vec_id, cell,
                                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dist, cell) AS rn
                          FROM adist)
                       WHERE rn = 1),
          probes AS (SELECT vec_id AS query_id, cell FROM
                       (SELECT vec_id, cell,
                               ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cell) AS rn
                        FROM adist WHERE vec_id < $NQUERY)
                     WHERE rn <= $NPROBE),
          cand AS (SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
                   FROM probes p JOIN assigned a ON a.cell = p.cell
                   WHERE a.vec_id <> p.query_id),
          dot AS (SELECT c.query_id, c.neighbor_id, SUM(a.x * b.x) AS dp
                  FROM cand c
                  JOIN u a ON a.vec_id = c.query_id
                  JOIN u b ON b.vec_id = c.neighbor_id AND b.i = a.i
                  GROUP BY 1, 2),
          sim AS (SELECT query_id, neighbor_id,
                         dp / (na.nrm * nb.nrm) AS raw_sim
                  FROM dot
                  JOIN n na ON na.vec_id = query_id
                  JOIN n nb ON nb.vec_id = neighbor_id),
          ranked AS (SELECT query_id, neighbor_id, raw_sim,
                            ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY raw_sim DESC, neighbor_id) AS rk
                     FROM sim)
          SELECT query_id, neighbor_id, ROUND(raw_sim, 4) AS sim
          FROM ranked WHERE rk <= $TOPK ORDER BY query_id, neighbor_id""",

    // DD26: trained cells + within-cell cosine pairs + recursive-CTE
    // components + farthest-from-centroid representative.
    "dd26_semdedup" ->
      s"""WITH RECURSIVE ${graft.operators.StatOps.duckTrainedCentroids},
          $duckVecs,
          adist AS (SELECT iu.vec_id, c.cell,
                           SUM((iu.x - c.c) * (iu.x - c.c)) AS dist
                    FROM iu JOIN c1 c ON c.dim = iu.dim
                    GROUP BY 1, 2),
          assigned AS (SELECT vec_id, cell, dist FROM
                         (SELECT vec_id, cell, dist,
                                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dist, cell) AS rn
                          FROM adist)
                       WHERE rn = 1),
          cospairs AS (SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
                       FROM assigned x JOIN assigned y
                         ON x.cell = y.cell AND x.vec_id < y.vec_id),
          dot AS (SELECT p.doc_a, p.doc_b, SUM(a.x * b.x) AS dp
                  FROM cospairs p
                  JOIN u a ON a.vec_id = p.doc_a
                  JOIN u b ON b.vec_id = p.doc_b AND b.i = a.i
                  GROUP BY 1, 2),
          sem_pairs AS (SELECT doc_a, doc_b FROM dot
                        JOIN n na ON na.vec_id = doc_a
                        JOIN n nb ON nb.vec_id = doc_b
                        WHERE ROUND(1e-9 + dp / (na.nrm * nb.nrm), 6) >= 0.35),
          edges AS (SELECT doc_a AS src, doc_b AS dst FROM sem_pairs
                    UNION ALL SELECT doc_b, doc_a FROM sem_pairs),
          cnodes AS (SELECT DISTINCT src AS doc_id FROM edges),
          walk(src, node) AS (
            SELECT doc_id, doc_id FROM cnodes
            UNION
            SELECT w.src, e.dst FROM walk w JOIN edges e ON e.src = w.node),
          cluster AS (SELECT src AS doc_id, MIN(node) AS cluster_id
                      FROM walk GROUP BY 1),
          sizes AS (SELECT cluster_id, COUNT(*) AS n_members
                    FROM cluster GROUP BY 1),
          rep AS (SELECT cluster_id, doc_id AS rep_id FROM
                    (SELECT c.cluster_id, c.doc_id,
                            ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                              ORDER BY a.dist DESC, c.doc_id) AS rn
                     FROM cluster c JOIN assigned a ON a.vec_id = c.doc_id)
                  WHERE rn = 1)
          SELECT a.vec_id, a.cell,
                 CAST(COALESCE(c.cluster_id, a.vec_id) AS BIGINT) AS sem_cluster,
                 CAST(COALESCE(s.n_members, 1) AS BIGINT) AS n_members,
                 CAST(a.dist AS BIGINT) AS centroid_dist,
                 (c.cluster_id IS NULL OR a.vec_id = r.rep_id) AS keep
          FROM assigned a
          LEFT JOIN cluster c ON c.doc_id = a.vec_id
          LEFT JOIN sizes s ON s.cluster_id = c.cluster_id
          LEFT JOIN rep r ON r.cluster_id = c.cluster_id
          ORDER BY a.vec_id""",

    // EMB8: same trained-cell assignment chain as sim12/dd26, then the
    // two per-anchor argmaxes as rank-1 windows over the in-cell pair sims.
    "emb8_contrastive_mining" ->
      s"""WITH ${graft.operators.StatOps.duckTrainedCentroids},
          $duckVecs,
          adist AS (SELECT iu.vec_id, c.cell,
                           SUM((iu.x - c.c) * (iu.x - c.c)) AS dist
                    FROM iu JOIN c1 c ON c.dim = iu.dim
                    GROUP BY 1, 2),
          assigned AS (SELECT vec_id, cell FROM
                         (SELECT vec_id, cell,
                                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dist, cell) AS rn
                          FROM adist)
                       WHERE rn = 1),
          prs AS (SELECT x.vec_id AS anchor_id, y.vec_id AS cand_id
                  FROM assigned x JOIN assigned y
                    ON x.cell = y.cell AND x.vec_id <> y.vec_id),
          dot AS (SELECT p.anchor_id, p.cand_id, SUM(a.x * b.x) AS dp
                  FROM prs p
                  JOIN u a ON a.vec_id = p.anchor_id
                  JOIN u b ON b.vec_id = p.cand_id AND b.i = a.i
                  GROUP BY 1, 2),
          sim AS (SELECT anchor_id, cand_id,
                         ROUND(1e-9 + dp / (na.nrm * nb.nrm), 6) AS sim
                  FROM dot
                  JOIN n na ON na.vec_id = anchor_id
                  JOIN n nb ON nb.vec_id = cand_id),
          pos AS (SELECT anchor_id, cand_id, sim FROM
                    (SELECT anchor_id, cand_id, sim,
                            ROW_NUMBER() OVER (PARTITION BY anchor_id
                              ORDER BY sim DESC, cand_id) AS rn
                     FROM sim WHERE sim >= 0.35)
                  WHERE rn = 1),
          neg AS (SELECT anchor_id, cand_id, sim FROM
                    (SELECT anchor_id, cand_id, sim,
                            ROW_NUMBER() OVER (PARTITION BY anchor_id
                              ORDER BY sim DESC, cand_id) AS rn
                     FROM sim WHERE sim < 0.2)
                  WHERE rn = 1)
          SELECT p.anchor_id,
                 p.cand_id AS positive_id, p.sim AS positive_sim,
                 g.cand_id AS negative_id, g.sim AS negative_sim
          FROM pos p JOIN neg g USING (anchor_id)
          ORDER BY p.anchor_id""",

    // TX25: same trained-cell assignment chain, then c-TF-IDF over the
    // member documents' tokens (tx13's log-free integer-ratio scoring).
    "tx25_cluster_terms" ->
      s"""WITH ${graft.operators.StatOps.duckTrainedCentroids},
          adist AS (SELECT iu.vec_id, c.cell,
                           SUM((iu.x - c.c) * (iu.x - c.c)) AS dist
                    FROM iu JOIN c1 c ON c.dim = iu.dim
                    GROUP BY 1, 2),
          assigned AS (SELECT vec_id AS doc_id, cell FROM
                         (SELECT vec_id, cell,
                                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dist, cell) AS rn
                          FROM adist)
                       WHERE rn = 1),
          tok AS (SELECT a.cell, term FROM (
                    SELECT doc_id,
                           unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
                    FROM documents) t
                  JOIN assigned a USING (doc_id)
                  WHERE length(term) >= 3),
          tf AS (SELECT cell, term, COUNT(*) AS ctf FROM tok GROUP BY 1, 2),
          cdf AS (SELECT term, COUNT(*) AS cdf FROM tf GROUP BY 1),
          nc AS (SELECT COUNT(DISTINCT cell) AS n_cells FROM tf),
          scored AS (SELECT cell, term, ctf,
                            ctf * (n_cells + 1.0) / (cdf + 1.0) AS score
                     FROM tf JOIN cdf USING (term) CROSS JOIN nc),
          r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cell
                            ORDER BY score DESC, term) AS rk
                FROM scored)
          SELECT cell, rk, term, ctf, ROUND(score, 4) AS score
          FROM r WHERE rk <= 3
          ORDER BY cell, rk""",

    // SIM7: both modality rankings recomputed from scratch (sim1's dot
    // ranking + sim2's bucket machinery reduced to collision votes),
    // fused with the same fixed-order two-term reciprocal sum.
    "sim7_rank_fusion" ->
      s"""WITH $duckVecs,
          dot AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                         SUM(a.x * b.x) AS dp
                  FROM u a JOIN u b ON a.i = b.i
                  WHERE a.vec_id < $NQUERY AND a.vec_id <> b.vec_id
                  GROUP BY 1, 2),
          sim AS (SELECT query_id, neighbor_id, dp / (na.nrm * nb.nrm) AS raw_sim
                  FROM dot
                  JOIN n na ON na.vec_id = query_id
                  JOIN n nb ON nb.vec_id = neighbor_id),
          ex AS (SELECT query_id, neighbor_id, ra FROM (
                   SELECT query_id, neighbor_id,
                          ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY raw_sim DESC, neighbor_id) AS ra
                   FROM sim) t WHERE ra <= $TOPK),
          hp AS (SELECT j, i,
                        ((1103515245 * CAST(j * 64 + (i - 1) AS BIGINT) + 12345) % 2147483648)
                          / 2147483648.0 - 0.5 AS w
                 FROM (SELECT UNNEST(generate_series(0, ${PLANES - 1})) AS j) pj,
                      (SELECT UNNEST(generate_series(1, 64)) AS i) pi),
          pdot AS (SELECT u.vec_id, hp.j, SUM(u.x * hp.w) AS pd
                   FROM u JOIN hp ON u.i = hp.i GROUP BY 1, 2),
          bkt AS (SELECT vec_id, (j // $ROWS_PER_TABLE) AS tbl,
                         CAST(SUM(CASE WHEN pd >= 0 THEN (CAST(1 AS BIGINT) << (j % $ROWS_PER_TABLE)) ELSE 0 END) AS BIGINT) AS bucket
                  FROM pdot GROUP BY 1, 2),
          votes AS (SELECT qa.vec_id AS query_id, nb.vec_id AS neighbor_id,
                           COUNT(*) AS votes
                    FROM bkt qa JOIN bkt nb
                      ON qa.tbl = nb.tbl AND qa.bucket = nb.bucket
                    WHERE qa.vec_id < $NQUERY AND qa.vec_id <> nb.vec_id
                    GROUP BY 1, 2),
          sk AS (SELECT query_id, neighbor_id, rb FROM (
                   SELECT query_id, neighbor_id,
                          ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, neighbor_id) AS rb
                   FROM votes) t WHERE rb <= $TOPK),
          fused AS (SELECT COALESCE(e.query_id, s.query_id) AS query_id,
                           COALESCE(e.neighbor_id, s.neighbor_id) AS neighbor_id,
                           COALESCE(CAST(1 AS DOUBLE) / (60 + e.ra), 0.0) +
                           COALESCE(CAST(1 AS DOUBLE) / (60 + s.rb), 0.0) AS rrf,
                           e.ra IS NOT NULL AS in_exact,
                           s.rb IS NOT NULL AS in_sketch
                    FROM ex e FULL OUTER JOIN sk s
                      ON e.query_id = s.query_id AND e.neighbor_id = s.neighbor_id),
          rk AS (SELECT query_id, neighbor_id, rrf, in_exact, in_sketch,
                        ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY rrf DESC, neighbor_id) AS rk
                 FROM fused)
          SELECT query_id, neighbor_id, ROUND(1e-9 + rrf, 6) AS rrf_score,
                 in_exact, in_sketch
          FROM rk WHERE rk <= $TOPK ORDER BY query_id, neighbor_id""",

    // SIM5: recall@k of the LSH ANN (sim2) against the exact top-k (sim1)
    // — both pipelines re-run as subqueries, joined on (query, neighbor).
    "sim5_recall_at_k" ->
      s"""WITH exact AS (SELECT query_id, neighbor_id FROM ($sim1Sql) t),
          ann AS (SELECT query_id, neighbor_id FROM ($sim2Sql) t),
          hits AS (SELECT e.query_id,
                          CAST(COUNT(*) AS BIGINT) AS n_exact,
                          CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits
                   FROM exact e LEFT JOIN ann a
                     ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
                   GROUP BY 1),
          acount AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_ann
                     FROM ann GROUP BY 1)
          SELECT h.query_id, h.n_exact,
                 CAST(COALESCE(ac.n_ann, 0) AS BIGINT) AS n_ann, h.n_hits,
                 CAST(h.n_hits AS DOUBLE) / $TOPK AS recall_at_k
          FROM hits h LEFT JOIN acount ac ON ac.query_id = h.query_id
          ORDER BY h.query_id""",

    // SIM8: integer-scaled position discounts; the rank windows replay the
    // Spark side's (sim DESC, neighbor_id) order on the ROUNDED sims.
    "sim8_ndcg" ->
      s"""WITH exact AS (SELECT query_id, neighbor_id, sim FROM ($sim1Sql) t),
          ann AS (SELECT query_id, neighbor_id, sim FROM ($sim2Sql) t),
          rel AS (SELECT query_id, neighbor_id,
                         CAST(6 - ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rel
                  FROM exact),
          ranked AS (SELECT a.query_id,
                            ROW_NUMBER() OVER (PARTITION BY a.query_id
                              ORDER BY a.sim DESC, a.neighbor_id) AS ark,
                            COALESCE(r.rel, 0) AS relv
                     FROM ann a LEFT JOIN rel r
                       ON r.query_id = a.query_id AND r.neighbor_id = a.neighbor_id),
          d AS (SELECT query_id, relv,
                       CASE ark WHEN 1 THEN 1000000 WHEN 2 THEN 630930
                                WHEN 3 THEN 500000 WHEN 4 THEN 430677
                                WHEN 5 THEN 386853 END AS disc6
                FROM ranked)
          SELECT query_id, CAST(SUM(relv * disc6) AS BIGINT) AS dcg6,
                 ROUND(1e-9 + CAST(SUM(relv * disc6) AS DOUBLE) / 10271927.0, 6) + 0.0 AS ndcg
          FROM d GROUP BY 1 ORDER BY 1""",

    // SIM9: exact integer MIPS — coordinates scaled like emb1/emb2, dot
    // products exact BIGINT sums, no rounding anywhere in the gate.
    "sim9_mips_topk" ->
      s"""WITH iv AS (
            SELECT vec_id, i - 1 AS dim,
                   CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS iv
            FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
          q AS (SELECT vec_id AS query_id, dim, iv AS qiv
                FROM iv WHERE vec_id < $NQUERY),
          dots AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   CAST(SUM(q.qiv * c.iv) AS BIGINT) AS dot6
            FROM q JOIN iv c ON q.dim = c.dim AND c.vec_id <> q.query_id
            GROUP BY 1, 2),
          ranked AS (SELECT query_id, neighbor_id, dot6,
                            ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY dot6 DESC, neighbor_id) AS rk
                     FROM dots)
          SELECT query_id, neighbor_id, dot6
          FROM ranked WHERE rk <= $TOPK ORDER BY query_id, neighbor_id""",

    "sim6_hard_negatives" ->
      s"""WITH $duckVecs,
          lbl AS (SELECT vec_id, label FROM embeddings),
          dot AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                         SUM(a.x * b.x) AS dp
                  FROM u a JOIN u b ON a.i = b.i
                  JOIN lbl la ON la.vec_id = a.vec_id
                  JOIN lbl lb ON lb.vec_id = b.vec_id
                  WHERE a.vec_id < $NQUERY AND la.label <> lb.label
                  GROUP BY 1, 2),
          sim AS (SELECT query_id, neighbor_id,
                         dp / (na.nrm * nb.nrm) AS raw_sim
                  FROM dot
                  JOIN n na ON na.vec_id = query_id
                  JOIN n nb ON nb.vec_id = neighbor_id),
          ranked AS (SELECT query_id, neighbor_id, raw_sim,
                            ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY raw_sim DESC, neighbor_id) AS rk
                     FROM sim)
          SELECT r.query_id, lq.label AS query_label, r.neighbor_id,
                 ln.label AS neighbor_label, ROUND(r.raw_sim, 4) AS sim
          FROM ranked r
          JOIN lbl lq ON lq.vec_id = r.query_id
          JOIN lbl ln ON ln.vec_id = r.neighbor_id
          WHERE r.rk <= $TOPK ORDER BY r.query_id, r.neighbor_id""",

    "dd8_neardup_lsh" ->
      s"""WITH $embPairsCtes
          SELECT vec_a, vec_b, ROUND(raw_sim, 4) AS sim
          FROM pairs ORDER BY vec_a, vec_b""",

    // dd12: recursive-CTE connected components over dd8's pair graph, then
    // the per-vector manifest (cluster id = min reachable vec_id).
    "dd12_embedding_manifest" ->
      s"""WITH RECURSIVE $embPairsCtes,
          edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
                    UNION ALL
                    SELECT vec_b, vec_a FROM pairs),
          nodes AS (SELECT DISTINCT src AS vec_id FROM edges),
          walk(src, node) AS (
            SELECT vec_id, vec_id FROM nodes
            UNION
            SELECT w.src, e.dst FROM walk w JOIN edges e ON e.src = w.node),
          cluster AS (SELECT src AS vec_id, MIN(node) AS cluster_id
                      FROM walk GROUP BY 1),
          sizes AS (SELECT cluster_id, COUNT(*) AS n_members
                    FROM cluster GROUP BY 1)
          SELECT v.vec_id,
                 COALESCE(c.cluster_id, v.vec_id) AS cluster_id,
                 CAST(COALESCE(s.n_members, 1) AS BIGINT) AS n_members,
                 COALESCE(c.cluster_id, v.vec_id) = v.vec_id AS keep
          FROM embeddings v
          LEFT JOIN cluster c USING (vec_id)
          LEFT JOIN sizes s USING (cluster_id)
          ORDER BY v.vec_id""",

    "sim4_quantize" ->
      """WITH e AS (SELECT vec_id, label,
                           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
         b AS (SELECT vec_id, label, v, list_min(v) AS lo, list_max(v) AS hi FROM e),
         q AS (SELECT vec_id, label,
                      list_transform(v, x -> CASE WHEN hi = lo THEN 0
                        ELSE CAST(floor((x - lo) / (hi - lo) * 255 + 0.5) AS INT) END) AS codes
               FROM b)
         SELECT vec_id, label,
                list_min(codes) AS code_min,
                list_max(codes) AS code_max,
                md5(array_to_string(codes, ',')) AS code_hash
         FROM q ORDER BY vec_id""")

  /** dd8's full LSH filter-verify pipeline as a CTE chain ending in `pairs`
    * (vec_a, vec_b, raw_sim ≥ 0.35) — shared by the dd8 and dd12 oracles. */
  private lazy val embPairsCtes: String =
    s"""$duckVecs,
        hp AS (SELECT j, i,
                      ((1103515245 * CAST(j * 64 + (i - 1) AS BIGINT) + 12345) % 2147483648)
                        / 2147483648.0 - 0.5 AS w
               FROM (SELECT UNNEST(generate_series(0, ${PLANES - 1})) AS j) pj,
                    (SELECT UNNEST(generate_series(1, 64)) AS i) pi),
        pdot AS (SELECT u.vec_id, hp.j, SUM(u.x * hp.w) AS pd
                 FROM u JOIN hp ON u.i = hp.i GROUP BY 1, 2),
        bkt AS (SELECT vec_id, (j // $ROWS_PER_TABLE) AS tbl,
                       CAST(SUM(CASE WHEN pd >= 0 THEN (CAST(1 AS BIGINT) << (j % $ROWS_PER_TABLE)) ELSE 0 END) AS BIGINT) AS bucket
                FROM pdot GROUP BY 1, 2),
        cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
                 FROM bkt a JOIN bkt b
                   ON a.tbl = b.tbl AND a.bucket = b.bucket
                      AND a.vec_id < b.vec_id),
        dot AS (SELECT c.vec_a, c.vec_b, SUM(a.x * b.x) AS dp
                FROM cand c
                JOIN u a ON a.vec_id = c.vec_a
                JOIN u b ON b.vec_id = c.vec_b AND a.i = b.i
                GROUP BY 1, 2),
        pairs AS (SELECT vec_a, vec_b, dp / (na.nrm * nb.nrm) AS raw_sim
                  FROM dot
                  JOIN n na ON na.vec_id = vec_a
                  JOIN n nb ON nb.vec_id = vec_b
                  WHERE dp / (na.nrm * nb.nrm) >= 0.35)"""
}
