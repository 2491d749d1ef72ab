package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.{Cli, Fixtures}

/** End-to-end Cli drive over real files: write the scaled fixture's raw
  * service frames to disk, run the full load → quality → fact → aggregate →
  * analytics pipeline through Cli's entry (session-injected), and check the
  * warehouse layout a downstream `run-analytics` user depends on. */
class CliE2eSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()

  test("cli pipeline produces the full warehouse layout from raw files") {
    val dir = Files.createTempDirectory("graft_cli_e2e").toString
    val (y, g, h, z) = TlcScaledDemo.rawFixture(spark)
    y.write.mode("overwrite").parquet(s"$dir/yellow.parquet")
    g.write.mode("overwrite").parquet(s"$dir/green.parquet")
    h.write.mode("overwrite").parquet(s"$dir/hvfhv.parquet")
    z.coalesce(1).write.mode("overwrite").option("header", true).csv(s"$dir/zones_csv")
    val zonesCsv = Files.list(Paths.get(s"$dir/zones_csv")).toArray
      .map(_.toString).filter(_.endsWith(".csv")).head

    val out = s"$dir/warehouse"
    Cli.runPipeline(spark, Map(
      "yellow" -> s"$dir/yellow.parquet",
      "green" -> s"$dir/green.parquet",
      "hvfhv" -> s"$dir/hvfhv.parquet",
      "zones" -> zonesCsv,
      "out" -> out))

    // The warehouse layout run-analytics registers (SqlRunner views).
    val expectedDirs = Seq(
      "fact_trips", "data_quality_metrics", "ingestion_log",
      "dim_zones", "dim_date", "dim_time", "dim_service", "dim_hvfhs_company")
    expectedDirs.foreach { d =>
      assert(Files.exists(Paths.get(out, d)), s"missing warehouse dir: $d")
    }
    val fact = spark.read.parquet(s"$out/fact_trips")
    assert(fact.count() == 22320, "all fixture trips standardized into the fact")
    // fact is partitioned by pickup_date (partition pruning surface).
    assert(Files.list(Paths.get(out, "fact_trips")).toArray
      .exists(_.toString.contains("pickup_date=")))
    // One ingestion_log row per raw file, all completed.
    val log = spark.read.parquet(s"$out/ingestion_log")
    assert(log.count() == 3)
    assert(log.filter("status = 'completed'").count() == 3)
    // All 14 analytics queries materialized with rows.
    val analytics = Files.list(Paths.get(out, "analytics")).toArray.map(_.toString)
    assert(analytics.length == 14, s"expected 14 analytics outputs: ${analytics.toSeq}")
    assert(spark.read.parquet(s"$out/analytics/01_top_zones_by_revenue").count() > 0)
  }
}
