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

    "sa2_stratified_sample" ->
      """SELECT doc_id, lang, rk
         FROM (SELECT doc_id, lang,
                      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
               FROM (SELECT *, ('0x' || substr(md5('graft-strata' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT AS h
                     FROM documents))
         WHERE rk <= 20
         ORDER BY lang, rk""")
}
