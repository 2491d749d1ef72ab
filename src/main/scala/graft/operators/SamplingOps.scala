package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sampling — the way a 100 TB training-data pipeline
  * actually samples. RNG-based `df.sample` is irreproducible across
  * engines, partitionings and reruns; hashing a stable key gives the same
  * sample everywhere, composes with incremental loads (a document's
  * membership never changes as the corpus grows), and needs no state.
  * Both operators are pure map-side projections + one shuffle for the
  * stratified rank.
  */
object SamplingOps {
  type Q = (SparkSession, String) => DataFrame

  /** 28-bit md5-prefix hash of the salted key — same recipe as the MinHash
    * base hash (md5 is bit-identical in both engines). */
  private def keyHash(salt: String) = expr(
    s"CAST(conv(substring(md5(concat('$salt', CAST(doc_id AS STRING))), 1, 7), 16, 10) AS BIGINT)")

  val queries: Map[String, Q] = Map(
    // SA1: deterministic ~10% Bernoulli-style sample by hash bucket.
    "sa1_hash_sample" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("h", keyHash("graft-sample"))
        .filter(pmod(col("h"), lit(100)) < 10)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    },

    // SA3: train/val/test split assignment — the canonical 90/5/5 corpus
    // split, by salted hash bucket so (a) membership is reproducible across
    // engines/reruns/partitionings, (b) a document's split NEVER changes as
    // the corpus grows (append-safe), (c) no coordination or state. The
    // gate emits per-split counts plus an order-independent membership
    // checksum (sum of doc_ids) so the oracle proves the exact assignment,
    // not just the sizes.
    "sa3_split_assign" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("h", keyHash("graft-split"))
        .withColumn("split",
          when(pmod(col("h"), lit(100)) < 90, "train")
            .when(pmod(col("h"), lit(100)) < 95, "val")
            .otherwise("test"))
        .groupBy("split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("doc_id_checksum"))
        .orderBy("split")
    },

    // SA2: stratified sample — exactly min(20, |stratum|) docs per lang,
    // picked by hash order (deterministic, uniform within stratum).
    "sa2_stratified_sample" -> { (s, d) =>
      val w = Window.partitionBy("lang")
        .orderBy(col("h"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("h", keyHash("graft-strata"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 20)
        .select(col("doc_id"), col("lang"), col("rk"))
        .orderBy("lang", "rk")
    })

  val oracles: Map[String, String] = Map(
    "sa1_hash_sample" ->
      """SELECT doc_id, lang, source
         FROM (SELECT *, ('0x' || substr(md5('graft-sample' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT AS h
               FROM documents)
         WHERE h % 100 < 10
         ORDER BY doc_id""",

    "sa3_split_assign" ->
      """SELECT CASE WHEN h % 100 < 90 THEN 'train'
                     WHEN h % 100 < 95 THEN 'val'
                     ELSE 'test' END AS split,
                COUNT(*) AS n_docs,
                CAST(SUM(doc_id) AS BIGINT) AS doc_id_checksum
         FROM (SELECT *, ('0x' || substr(md5('graft-split' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT AS h
               FROM documents)
         GROUP BY 1 ORDER BY 1""",

    "sa2_stratified_sample" ->
      """SELECT doc_id, lang, rk
         FROM (SELECT doc_id, lang,
                      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
               FROM (SELECT *, ('0x' || substr(md5('graft-strata' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT AS h
                     FROM documents))
         WHERE rk <= 20
         ORDER BY lang, rk""")
}
