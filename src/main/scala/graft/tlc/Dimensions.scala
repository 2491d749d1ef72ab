package graft.tlc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star-schema dimension builders (reference: sql/ddl/02_dimension_tables.sql).
  *
  * All dims are tiny (3–1826 rows) — every join against them should be
  * broadcast (`broadcast(dim)`), never a shuffle.
  */
object Dimensions {

  /** dim_zones from the raw zone lookup (02_dimension_tables.sql:9–36):
    * airport flag fires on `Zone LIKE '%Airport%' OR service_zone =
    * 'Airports'` (note EWR only matches the LIKE arm). */
  def dimZones(rawTaxiZones: DataFrame): DataFrame =
    rawTaxiZones.select(
      col("LocationID").as("location_id"),
      col("Borough").as("borough"),
      col("Zone").as("zone"),
      col("service_zone"),
      (col("Zone").like("%Airport%") || col("service_zone") === "Airports")
        .as("is_airport"),
      (col("Borough") === "Manhattan").as("is_manhattan"))

  /** dim_date spine 2021-01-01..2025-12-31 = 1826 rows
    * (02_dimension_tables.sql:60–88) via sequence()+explode. DOW is the
    * DuckDB 0=Sunday convention; congestion-fee split at 2025-01-05. */
  def dimDate(spark: SparkSession,
              start: String = "2021-01-01", end: String = "2025-12-31"): DataFrame =
    spark.range(1)
      .select(explode(expr(
        s"sequence(to_date('$start'), to_date('$end'), interval 1 day)")).as("date_id"))
      .select(
        col("date_id"),
        year(col("date_id")).as("year"),
        month(col("date_id")).as("month"),
        dayofmonth(col("date_id")).as("day"),
        quarter(col("date_id")).as("quarter"),
        (dayofweek(col("date_id")) - 1).as("day_of_week"),
        date_format(col("date_id"), "EEEE").as("day_name"),
        date_format(col("date_id"), "MMMM").as("month_name"),
        dayofweek(col("date_id")).isin(1, 7).as("is_weekend"),
        ((month(col("date_id")) === 1 && dayofmonth(col("date_id")) === 1) ||
         (month(col("date_id")) === 7 && dayofmonth(col("date_id")) === 4) ||
         (month(col("date_id")) === 12 && dayofmonth(col("date_id")) === 25))
          .as("is_holiday"),
        weekofyear(col("date_id")).as("week_of_year"),
        dayofyear(col("date_id")).as("day_of_year"),
        (col("date_id") < lit("2025-01-05").cast("date")).as("is_before_congestion_fee"),
        (col("date_id") >= lit("2025-01-05").cast("date")).as("is_after_congestion_fee"))

  /** dim_time, 24 rows (02_dimension_tables.sql:101–130). */
  def dimTime(spark: SparkSession): DataFrame =
    spark.range(0, 24)
      .select(col("id").cast("int").as("hour"))
      .select(
        col("hour"),
        when(col("hour") === 0, "12 AM")
          .when(col("hour") < 12, concat(col("hour").cast("string"), lit(" AM")))
          .when(col("hour") === 12, "12 PM")
          .otherwise(concat((col("hour") - 12).cast("string"), lit(" PM")))
          .as("hour_12"),
        when(col("hour").between(6, 11), "Morning")
          .when(col("hour").between(12, 17), "Afternoon")
          .when(col("hour").between(18, 21), "Evening")
          .otherwise("Night").as("period"),
        (col("hour").between(7, 9) || col("hour").between(16, 19)).as("is_rush_hour"),
        when(col("hour").between(6, 20), "Day (6am-9pm)")
          .otherwise("Night (9pm-6am)").as("time_bucket"))

  /** dim_service, 3 rows (02_dimension_tables.sql:143–146). */
  def dimService(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("yellow", "Yellow Taxi", "Traditional Taxi",
        "Yellow medallion taxis operating citywide"),
      ("green", "Green Taxi", "Traditional Taxi",
        "Green cabs operating outside Manhattan core"),
      ("hvfhv", "HVFHV", "Ride-Hailing",
        "High-volume for-hire vehicles (Uber, Lyft, Via, Juno)"))
      .toDF("service_type", "service_name", "service_category", "description")
  }

  /** dim_hvfhs_company, 4 rows (02_dimension_tables.sql:158–162). */
  def dimHvfhsCompany(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("HV0002", "Juno", true),
      ("HV0003", "Uber", true),
      ("HV0004", "Via", true),
      ("HV0005", "Lyft", true))
      .toDF("hvfhs_license_num", "company_name", "is_active")
  }
}
