package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Exact._

/** Reshape + nested-type operators (§2.7/§2.8 breadth beyond the
  * reference's flat-relational surface):
  *
  * - U4 `u4_unpivot`: wide → long melt via Spark's native `Dataset.unpivot`
  *   (the inverse of a15's pivot). The reference ships its wide aggregate
  *   tables straight to dashboards; a melt is the first step of any
  *   metric-store export. Constant-width: no shuffle, pure projection.
  * - F12 `f12_struct_map`: nested struct/map construction and field access
  *   — the column shapes a training-data manifest carries (typed metadata
  *   structs, tag maps) — flattened back to scalars so the DuckDB oracle
  *   compares plain columns.
  */
object ReshapeOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "u4_unpivot" -> { (s, d) =>
      val wide = Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).cast("double").as("n_orders"),
          dsum(col("o_totalprice")).as("total_value"),
          davg(col("o_totalprice")).as("avg_value"))
      wide.unpivot(
        Array(col("o_orderpriority")),
        Array(col("n_orders"), col("total_value"), col("avg_value")),
        "metric", "value")
        .orderBy("o_orderpriority", "metric")
    },

    // F13: argmax/argmin aggregates — dominant and rarest language per
    // source via max_by/min_by. Ties are broken deterministically by
    // encoding (count, lang) as one zero-padded sortable key, the same
    // encoding the DuckDB arg_max/arg_min oracle uses (its 1.0 overloads
    // take scalar ordering keys only).
    "f13_argmax" -> { (s, d) =>
      val counts = Tables.documents(s, d)
        .groupBy("source", "lang").agg(count(lit(1)).as("n"))
        .withColumn("ord", format_string("%010d|%s", col("n"), col("lang")))
      counts.groupBy("source")
        .agg(
          max_by(col("lang"), col("ord")).as("dominant_lang"),
          max(col("n")).as("dominant_n"),
          min_by(col("lang"), col("ord")).as("rarest_lang"),
          sum(col("n")).as("total_docs"))
        .withColumn("dominant_share",
          col("dominant_n").cast("double") / col("total_docs"))
        .orderBy("source")
    },

    "f12_struct_map" -> { (s, d) =>
      Tables.nation(s, d)
        .withColumn("info",
          struct(col("n_name").as("name"), col("n_regionkey").as("region")))
        .withColumn("tags",
          map(lit("key"), col("n_nationkey"),
              lit("region2x"), col("n_regionkey") * 2))
        .select(
          col("n_nationkey"),
          col("info.name").as("info_name"),
          col("info.region").as("info_region"),
          element_at(col("tags"), "key").as("tag_key"),
          element_at(col("tags"), "region2x").as("tag_region2x"),
          size(col("tags")).cast("long").as("n_tags"))
        .orderBy("n_nationkey")
    })

  val oracles: Map[String, String] = Map(
    "u4_unpivot" ->
      """WITH wide AS (
           SELECT o_orderpriority,
                  CAST(COUNT(*) AS DOUBLE) AS n_orders,
                  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 4) AS DOUBLE) AS total_value,
                  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 4) AS DOUBLE) / COUNT(o_totalprice) AS avg_value
           FROM orders GROUP BY 1)
         SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS "value" FROM wide
         UNION ALL
         SELECT o_orderpriority, 'total_value', total_value FROM wide
         UNION ALL
         SELECT o_orderpriority, 'avg_value', avg_value FROM wide
         ORDER BY o_orderpriority, metric""",

    "f13_argmax" ->
      """WITH counts AS (
           SELECT source, lang, COUNT(*) AS n,
                  printf('%010d|%s', COUNT(*), lang) AS ord
           FROM documents GROUP BY 1, 2)
         SELECT source,
                arg_max(lang, ord) AS dominant_lang,
                MAX(n) AS dominant_n,
                arg_min(lang, ord) AS rarest_lang,
                CAST(SUM(n) AS BIGINT) AS total_docs,
                CAST(MAX(n) AS DOUBLE) / SUM(n) AS dominant_share
         FROM counts GROUP BY 1 ORDER BY 1""",

    // DuckDB 1.0 map extraction yields a LIST; [1] takes the value.
    "f12_struct_map" ->
      """SELECT n_nationkey,
                struct_pack(name := n_name, region := n_regionkey).name AS info_name,
                struct_pack(name := n_name, region := n_regionkey).region AS info_region,
                MAP(['key', 'region2x'], [n_nationkey, n_regionkey * 2])['key'][1] AS tag_key,
                MAP(['key', 'region2x'], [n_nationkey, n_regionkey * 2])['region2x'][1] AS tag_region2x,
                CAST(cardinality(MAP(['key', 'region2x'], [n_nationkey, n_regionkey * 2])) AS BIGINT) AS n_tags
         FROM nation ORDER BY n_nationkey""")
}
