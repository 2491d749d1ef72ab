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

  private val PLANES = 8  // LSH hyperplanes → 256 buckets
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

    // LSH-bucketed ANN: candidates restricted to the query's hyperplane
    // bucket. Hyperplane weight w(j, i) for plane j, 1-based dim i:
    //   lcg(k) = (1103515245 * k + 12345) mod 2^31,  k = j * 64 + (i - 1)
    //   w = lcg(k) / 2^31 - 0.5
    "sim2_lsh_ann" -> { (s, d) =>
      val all = vecs(s, d)
      // per (vec, plane): dot with the formula-generated hyperplane
      val planeDot = (0 until PLANES).map { j =>
        val w = s"transform(sequence(0, 63), i -> " +
          s"((1103515245 * CAST($j * 64 + i AS BIGINT) + 12345) % 2147483648) / 2147483648.0 - 0.5)"
        expr(s"aggregate(zip_with(v, $w, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
      }
      val bucket = planeDot.zipWithIndex
        .map { case (c, j) => when(c >= 0, 1L << j).otherwise(0L) }
        .reduce(_ + _)
      val bucketed = all.withColumn("bucket", bucket)
      val q = bucketed.filter(col("vec_id") < NQUERY)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"))
      val cand = bucketed
        .select(col("vec_id").as("neighbor_id"), col("v"), col("bucket"))
        .join(broadcast(q), Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("raw_sim", expr("cosine_sim(qv, v)"))
      topkPerQuery(cand)
    })

  private val duckVecs =
    """e AS (SELECT vec_id, embedding FROM embeddings),
       u AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
             FROM e, UNNEST(generate_series(1, len(embedding))) AS g(i)),
       n AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM u GROUP BY 1)"""

  val oracles: Map[String, String] = Map(
    "sim1_cosine_topk" ->
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
          FROM ranked WHERE rk <= $TOPK ORDER BY query_id, neighbor_id""",

    "sim2_lsh_ann" ->
      s"""WITH $duckVecs,
          hp AS (SELECT j, i,
                        ((1103515245 * CAST(j * 64 + (i - 1) AS BIGINT) + 12345) % 2147483648)
                          / 2147483648.0 - 0.5 AS w
                 FROM (SELECT UNNEST(generate_series(0, ${PLANES - 1})) AS j) pj,
                      (SELECT UNNEST(generate_series(1, 64)) AS i) pi),
          pdot AS (SELECT u.vec_id, hp.j, SUM(u.x * hp.w) AS pd
                   FROM u JOIN hp ON u.i = hp.i GROUP BY 1, 2),
          bkt AS (SELECT vec_id,
                         CAST(SUM(CASE WHEN pd >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS bucket
                  FROM pdot GROUP BY 1),
          dot AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                         SUM(a.x * b.x) AS dp
                  FROM u a JOIN u b ON a.i = b.i
                  JOIN bkt ba ON ba.vec_id = a.vec_id
                  JOIN bkt bb ON bb.vec_id = b.vec_id AND ba.bucket = bb.bucket
                  WHERE a.vec_id < $NQUERY AND a.vec_id <> b.vec_id
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
          FROM ranked WHERE rk <= $TOPK ORDER BY query_id, neighbor_id""")
}
