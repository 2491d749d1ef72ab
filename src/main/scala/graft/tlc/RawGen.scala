package graft.tlc

import org.apache.spark.sql.SparkSession

/** BENCH_E2E input generator: writes the scaled-fixture raw service files
  * (TlcScaledDemo.rawFixtureN — `copies` stacked replicas of the hash-gated
  * 22,320-trip pattern) to parquet, plus the zones dim, so the SAME files
  * feed both `Cli run-e2e` (Spark) and `tools/duckbase_e2e.py` (the
  * reference's own DuckDB engine path) for the BASELINE.md stage-wall-time
  * comparable.
  *
  *   runMain graft.tlc.RawGen <outDir> <copies>
  */
object RawGen {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val copies = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (y, g, h, z) = graft.TlcScaledDemo.rawFixtureN(spark, copies)
    // source_file is dropped: both loaders stamp it themselves (RawLoader
    // adds the file name; the reference's SchemaDriftHandler appends its own
    // source_file and would collide with a pre-existing column).
    y.drop("source_file").write.mode("overwrite").parquet(s"$dir/yellow.parquet")
    g.drop("source_file").write.mode("overwrite").parquet(s"$dir/green.parquet")
    h.drop("source_file").write.mode("overwrite").parquet(s"$dir/hvfhv.parquet")
    z.coalesce(1).write.mode("overwrite").parquet(s"$dir/zones.parquet")
    // the reference's SchemaManager.load_taxi_zones wants a CSV
    z.coalesce(1).write.mode("overwrite").option("header", true)
      .csv(s"$dir/zones_csv")
    println(s"[rawgen] wrote ${22320L * copies} trips across 3 services -> $dir")
    spark.stop()
  }
}
