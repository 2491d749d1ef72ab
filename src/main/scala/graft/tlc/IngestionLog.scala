package graft.tlc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-file load-audit sink (reference: src/database/loader.py:264–333 and
  * sql/ddl/01_raw_tables.sql:110–130 `ingestion_log`): every raw-file load
  * appends one row recording what was loaded, how long it took, its
  * checksum and whether it succeeded — the table every operational user of
  * the pipeline reads first when a load looks wrong.
  *
  * The reference INSERTs into a DuckDB table with a sequence-derived id;
  * here the sink is an append-only parquet log. Entries are driver-side
  * metadata (a handful of rows per batch), so building the frame from a
  * local Seq is correct at any scale — the DATA never passes through it.
  */
object IngestionLog {

  final case class Entry(
    sequenceId: Long,
    sourceFile: String,
    serviceType: String,
    rowCount: Long,
    durationSeconds: Double,
    status: String, // completed | failed | skipped (loader.py:280,307,329)
    errorMessage: Option[String],
    fileSha256: String,
    loadedAt: java.sql.Timestamp)

  /** Entries → the ingestion_log frame (column names follow
    * 01_raw_tables.sql:110–130). */
  def build(spark: SparkSession, entries: Seq[Entry]): DataFrame = {
    import spark.implicits._
    entries.toDF()
      .select(
        $"sequenceId".as("load_sequence_id"),
        $"sourceFile".as("source_file"),
        $"serviceType".as("service_type"),
        $"rowCount".as("row_count"),
        $"durationSeconds".as("load_duration_seconds"),
        $"status",
        $"errorMessage".as("error_message"),
        $"fileSha256".as("file_sha256"),
        $"loadedAt".as("loaded_at"))
  }

  /** Append-only audit write — the log is history, never overwritten. */
  def write(log: DataFrame, path: String): Unit =
    log.write.mode("append").parquet(path)
}
