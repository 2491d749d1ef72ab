package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tlc._

/** Driver-contract exposure of the TLC domain library: runs the full
  * reference pipeline (standardize → fact → dims → aggregates → analytics)
  * over deterministic in-code fixture rows (the reference's conftest rows)
  * and returns flagship results. No DuckDB oracle — the reference semantics
  * are covered by the ScalaTest suite (src/test/scala/graft/tlc) instead;
  * the driver records the weaker rows-only check here.
  */
object TlcDemo {
  type Q = (SparkSession, String) => DataFrame

  private def fixtures(s: SparkSession) = {
    // Reuse the test fixtures' row values without depending on test scope:
    // standardize straight from small in-memory frames.
    import s.implicits._
    val y = Seq(
      ("2024-06-01 10:00:00", "2024-06-01 10:15:00", 2.5, 161, 237, 12.5, 2.5, 0.0, 16.3),
      ("2024-06-01 11:00:00", "2024-06-01 11:20:00", 5.0, 237, 142, 25.0, 5.0, 0.0, 31.3),
      ("2024-06-01 12:00:00", "2024-06-01 12:30:00", 3.2, 142, 236, 16.0, 0.0, 5.76, 23.06),
      ("2024-06-01 13:00:00", "2024-06-01 13:10:00", 1.8, 236, 161, 9.5, 2.0, 0.0, 12.8))
      .toDF("p", "d", "trip_distance", "PULocationID", "DOLocationID",
        "fare_amount", "tip_amount", "tolls_amount", "total_amount")
      .select(col("p").cast("timestamp").as("tpep_pickup_datetime"),
        col("d").cast("timestamp").as("tpep_dropoff_datetime"),
        col("trip_distance"), col("PULocationID"), col("DOLocationID"),
        col("fare_amount"), lit(0.5).as("extra"), lit(0.5).as("mta_tax"),
        col("tip_amount"), col("tolls_amount"),
        lit(0.3).as("improvement_surcharge"), col("total_amount"),
        lit(2.5).as("congestion_surcharge"), lit(0.0).as("Airport_fee"),
        lit("fixture").as("source_file"))
    val g = Seq(
      ("2024-06-01 10:00:00", "2024-06-01 10:20:00", 3.0, 74, 75, 15.0, 3.0, 0.0, 19.3),
      ("2024-06-01 11:00:00", "2024-06-01 11:25:00", 4.5, 75, 41, 22.5, 4.5, 0.0, 28.3),
      ("2024-06-01 12:00:00", "2024-06-01 12:35:00", 2.8, 41, 74, 14.0, 0.0, 5.76, 21.06))
      .toDF("p", "d", "trip_distance", "PULocationID", "DOLocationID",
        "fare_amount", "tip_amount", "tolls_amount", "total_amount")
      .select(col("p").cast("timestamp").as("lpep_pickup_datetime"),
        col("d").cast("timestamp").as("lpep_dropoff_datetime"),
        col("trip_distance"), col("PULocationID"), col("DOLocationID"),
        col("fare_amount"), lit(0.5).as("extra"), lit(0.5).as("mta_tax"),
        col("tip_amount"), col("tolls_amount"),
        lit(0.3).as("improvement_surcharge"), col("total_amount"),
        lit(2.5).as("congestion_surcharge"), lit("fixture").as("source_file"))
    val h = Seq(
      ("HV0003", "2024-06-01 10:10:00", "2024-06-01 10:25:00", 161L, 237L, 2.8, 900L,
        15.5, 0.0, 0.47, 1.37, 3.0, 12.5, "N"),
      ("HV0005", "2024-06-01 11:08:00", "2024-06-01 11:30:00", 237L, 142L, 5.2, 1320L,
        28.0, 0.0, 0.84, 2.48, 5.5, 22.0, "N"),
      ("HV0003", "2024-06-01 12:08:00", "2024-06-01 12:40:00", 142L, 236L, 3.5, 1920L,
        20.0, 5.76, 0.60, 1.77, 0.0, 16.0, "Y"))
      .toDF("hvfhs_license_num", "p", "d", "PULocationID", "DOLocationID",
        "trip_miles", "trip_time", "base_passenger_fare", "tolls", "bcf",
        "sales_tax", "tips", "driver_pay", "shared_request_flag")
      .select(col("hvfhs_license_num"),
        col("p").cast("timestamp").as("pickup_datetime"),
        col("d").cast("timestamp").as("dropoff_datetime"),
        col("PULocationID"), col("DOLocationID"), col("trip_miles"),
        col("trip_time"), col("base_passenger_fare"), col("tolls"), col("bcf"),
        col("sales_tax"), lit(2.75).as("congestion_surcharge"),
        lit(0.0).as("airport_fee"), col("tips"), col("driver_pay"),
        col("shared_request_flag"), lit("N").as("shared_match_flag"),
        lit("fixture").as("source_file"))
    val z = Seq(
      (1, "EWR", "Newark Airport", "EWR"),
      (41, "Queens", "Flushing", "Boro Zone"),
      (74, "Queens", "Corona", "Boro Zone"),
      (75, "Queens", "East Elmhurst", "Boro Zone"),
      (142, "Manhattan", "Lincoln Square East", "Yellow Zone"),
      (161, "Manhattan", "Midtown Center", "Yellow Zone"),
      (236, "Manhattan", "Upper East Side South", "Yellow Zone"),
      (237, "Manhattan", "Upper West Side South", "Yellow Zone"))
      .toDF("LocationID", "Borough", "Zone", "service_zone")
    (y, g, h, z)
  }

  // one pipeline run per session — both demo queries share its lineage
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Pipeline.Result]()
  private def result(s: SparkSession): Pipeline.Result =
    cache.computeIfAbsent(s, _ => {
      val (y, g, h, z) = fixtures(s)
      Pipeline.run(s, y, g, h, z)
    })

  val queries: Map[String, Q] = Map(
    // Full TLC pipeline on fixture rows → q01 top zones by revenue.
    "tlc_pipeline_q01" -> { (s, _) =>
      result(s).analytics("01_top_zones_by_revenue")
    },
    // Same pipeline → data-quality summary (exercises restored dropoff cols).
    "tlc_pipeline_q10" -> { (s, _) =>
      result(s).analytics("10_data_quality_summary")
    })
}
