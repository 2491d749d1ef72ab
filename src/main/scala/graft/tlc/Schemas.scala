package graft.tlc

import org.apache.spark.sql.types._

/** Explicit StructTypes for the TLC pipeline (never infer on trip data).
  *
  * Mirrors the reference DDL: raw_yellow / raw_green / raw_hvfhv /
  * raw_taxi_zones (sql/ddl/01_raw_tables.sql:10–105) and the unified fact
  * (sql/ddl/03_fact_tables.sql:12–58) — with `dropoff_datetime`,
  * `dropoff_zone_id` and `is_shared_match` RESTORED: the reference's
  * "optimized" fact DDL dropped them but analytics 06/08/10 still reference
  * them (SURVEY.md §1.1).
  */
object Schemas {

  val rawYellow: StructType = StructType(Seq(
    StructField("VendorID", IntegerType),
    StructField("tpep_pickup_datetime", TimestampType),
    StructField("tpep_dropoff_datetime", TimestampType),
    StructField("passenger_count", DoubleType),
    StructField("trip_distance", DoubleType),
    StructField("RatecodeID", DoubleType),
    StructField("store_and_fwd_flag", StringType),
    StructField("PULocationID", IntegerType),
    StructField("DOLocationID", IntegerType),
    StructField("payment_type", IntegerType),
    StructField("fare_amount", DoubleType),
    StructField("extra", DoubleType),
    StructField("mta_tax", DoubleType),
    StructField("tip_amount", DoubleType),
    StructField("tolls_amount", DoubleType),
    StructField("improvement_surcharge", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("congestion_surcharge", DoubleType),
    StructField("Airport_fee", DoubleType)))

  val rawGreen: StructType = StructType(Seq(
    StructField("VendorID", IntegerType),
    StructField("lpep_pickup_datetime", TimestampType),
    StructField("lpep_dropoff_datetime", TimestampType),
    StructField("store_and_fwd_flag", StringType),
    StructField("RatecodeID", DoubleType),
    StructField("PULocationID", IntegerType),
    StructField("DOLocationID", IntegerType),
    StructField("passenger_count", DoubleType),
    StructField("trip_distance", DoubleType),
    StructField("fare_amount", DoubleType),
    StructField("extra", DoubleType),
    StructField("mta_tax", DoubleType),
    StructField("tip_amount", DoubleType),
    StructField("tolls_amount", DoubleType),
    StructField("ehail_fee", DoubleType),
    StructField("improvement_surcharge", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("payment_type", IntegerType),
    StructField("trip_type", DoubleType),
    StructField("congestion_surcharge", DoubleType)))

  val rawHvfhv: StructType = StructType(Seq(
    StructField("hvfhs_license_num", StringType),
    StructField("dispatching_base_num", StringType),
    StructField("originating_base_num", StringType),
    StructField("request_datetime", TimestampType),
    StructField("on_scene_datetime", TimestampType),
    StructField("pickup_datetime", TimestampType),
    StructField("dropoff_datetime", TimestampType),
    StructField("PULocationID", LongType),
    StructField("DOLocationID", LongType),
    StructField("trip_miles", DoubleType),
    StructField("trip_time", LongType),
    StructField("base_passenger_fare", DoubleType),
    StructField("tolls", DoubleType),
    StructField("bcf", DoubleType),
    StructField("sales_tax", DoubleType),
    StructField("congestion_surcharge", DoubleType),
    StructField("airport_fee", DoubleType),
    StructField("tips", DoubleType),
    StructField("driver_pay", DoubleType),
    StructField("shared_request_flag", StringType),
    StructField("shared_match_flag", StringType),
    StructField("access_a_ride_flag", StringType),
    StructField("wav_request_flag", StringType),
    StructField("wav_match_flag", StringType)))

  val rawTaxiZones: StructType = StructType(Seq(
    StructField("LocationID", IntegerType),
    StructField("Borough", StringType),
    StructField("Zone", StringType),
    StructField("service_zone", StringType)))

  /** Unified fact row (sql/ddl/03_fact_tables.sql:12–58 + restored dropoff/
    * shared-match columns). Kept as a case class so the standardization
    * boundary is typed; analytics work on DataFrames. */
  final case class FactTrip(
    trip_id: String,
    service_type: String,
    hvfhs_license_num: Option[String],
    pickup_datetime: java.sql.Timestamp,
    dropoff_datetime: Option[java.sql.Timestamp],
    pickup_date: java.sql.Date,
    pickup_hour: Option[Int],
    pickup_day_of_week: Option[Int],
    pickup_zone_id: Option[Int],
    dropoff_zone_id: Option[Int],
    trip_distance_miles: Option[Double],
    trip_duration_minutes: Option[Double],
    base_fare: Option[Double],
    tips: Option[Double],
    tolls: Option[Double],
    surcharges: Option[Double],
    airport_fee: Option[Double],
    taxes: Option[Double],
    total_fare: Option[Double],
    driver_pay: Option[Double],
    take_rate: Option[Double],
    price_per_mile: Option[Double],
    price_per_minute: Option[Double],
    avg_speed_mph: Option[Double],
    is_shared_request: Option[Boolean],
    is_shared_match: Option[Boolean],
    is_valid: Option[Boolean],
    source_file: Option[String])

  /** Fact column order (the standardizers all emit exactly this). */
  val factColumns: Seq[String] = Seq(
    "trip_id", "service_type", "hvfhs_license_num",
    "pickup_datetime", "dropoff_datetime", "pickup_date", "pickup_hour",
    "pickup_day_of_week", "pickup_zone_id", "dropoff_zone_id",
    "trip_distance_miles", "trip_duration_minutes",
    "base_fare", "tips", "tolls", "surcharges", "airport_fee", "taxes",
    "total_fare", "driver_pay", "take_rate",
    "price_per_mile", "price_per_minute", "avg_speed_mph",
    "is_shared_request", "is_shared_match", "is_valid", "source_file")
}
