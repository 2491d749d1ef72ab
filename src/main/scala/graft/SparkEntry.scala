package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exact._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2 (plus
  * the beyond-reference training-data ops) to a DataFrame builder over the
  * driver's testdata tables; `oracleSql` carries the DuckDB-equivalent SQL
  * for the correctness gate. Column names/aliases match between the two
  * (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Pricing summary (A1 shape, analytics 01): grouped conditional aggs. */
  def entry(spark: SparkSession): DataFrame =
    queries("a1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.CsvOps.queries ++
    operators.OrcOps.queries ++
    operators.SinkOps.queries ++
    operators.ReshapeOps.queries ++
    operators.ExtendedOps.queries ++
    operators.BreadthOps.queries ++
    operators.BucketedOps.queries ++
    operators.DepthOps.queries ++
    operators.SamplingOps.queries ++
    operators.CompletionOps.queries ++
    operators.CurationOps.queries ++
    operators.GraphOps.queries ++
    operators.StatOps.queries ++
    operators.RelevanceOps.queries ++
    operators.LayoutOps.queries ++
    operators.SketchOps.queries ++
    operators.IndexOps.queries ++
    operators.SessionScaleOps.queries ++
    operators.GovernanceOps.queries ++
    operators.LinkageOps.queries ++
    operators.ScanFilterOps.queries ++
    operators.AggOps.queries ++
    operators.JoinOps.queries ++
    operators.WindowSortOps.queries ++
    functions.ScalarOps.queries ++
    ops.TextOps.queries ++
    ops.DedupOps.queries ++
    ops.SimilarityOps.queries ++
    ops.MultimodalOps.queries ++
    streaming.StreamingOps.queries ++
    streaming.StatefulSessionize.queries ++
    TlcDemo.queries ++
    TlcScaledDemo.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    operators.CsvOps.oracles ++
    operators.OrcOps.oracles ++
    operators.SinkOps.oracles ++
    operators.ReshapeOps.oracles ++
    operators.ExtendedOps.oracles ++
    operators.BreadthOps.oracles ++
    operators.BucketedOps.oracles ++
    operators.DepthOps.oracles ++
    operators.SamplingOps.oracles ++
    operators.CompletionOps.oracles ++
    operators.CurationOps.oracles ++
    operators.GraphOps.oracles ++
    operators.StatOps.oracles ++
    operators.RelevanceOps.oracles ++
    operators.LayoutOps.oracles ++
    operators.SketchOps.oracles ++
    operators.IndexOps.oracles ++
    operators.SessionScaleOps.oracles ++
    operators.GovernanceOps.oracles ++
    operators.LinkageOps.oracles ++
    operators.ScanFilterOps.oracles ++
    operators.AggOps.oracles ++
    operators.JoinOps.oracles ++
    operators.WindowSortOps.oracles ++
    functions.ScalarOps.oracles ++
    ops.TextOps.oracles ++
    ops.DedupOps.oracles ++
    ops.SimilarityOps.oracles ++
    ops.MultimodalOps.oracles ++
    streaming.StreamingOps.oracles ++
    streaming.StatefulSessionize.oracles ++
    TlcDemo.oracles ++
    TlcScaledDemo.oracles
}
