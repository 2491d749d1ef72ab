-- Data-quality summary over the whole fact, valid or not (reference:
-- sql/analytics/10_data_quality_summary.sql — runs unchanged under
-- Spark SQL).
SELECT
    f.service_type,
    COUNT(*)                                                            AS total_records,
    SUM(CASE WHEN f.is_valid THEN 1 ELSE 0 END)                         AS valid_records,
    SUM(CASE WHEN NOT f.is_valid THEN 1 ELSE 0 END)                     AS invalid_records,
    -- 100e0, not 100.0: Spark parses exact-decimal literals as DECIMAL and
    -- would emit a DECIMAL pct; the double literal keeps the ratio in
    -- double arithmetic, matching the engine (Analytics.q10).
    ROUND(SUM(CASE WHEN f.is_valid THEN 1 ELSE 0 END) * 100e0
          / COUNT(*) + 1e-9, 2)                                                AS data_quality_pct,
    -- Specific quality issues
    SUM(CASE WHEN f.total_fare < 0 THEN 1 ELSE 0 END)                   AS negative_fares,
    SUM(CASE WHEN f.trip_distance_miles < 0 THEN 1 ELSE 0 END)          AS negative_distances,
    SUM(CASE WHEN f.trip_duration_minutes < 0 THEN 1 ELSE 0 END)        AS negative_durations,
    SUM(CASE WHEN f.dropoff_datetime <= f.pickup_datetime THEN 1 ELSE 0 END) AS invalid_timestamps,
    SUM(CASE WHEN f.avg_speed_mph > 100 THEN 1 ELSE 0 END)              AS excessive_speeds,
    -- Null checks
    SUM(CASE WHEN f.pickup_zone_id IS NULL THEN 1 ELSE 0 END)           AS null_pickup_zones,
    SUM(CASE WHEN f.dropoff_zone_id IS NULL THEN 1 ELSE 0 END)          AS null_dropoff_zones,
    MIN(f.pickup_date)                                                  AS earliest_trip,
    MAX(f.pickup_date)                                                  AS latest_trip
FROM fact_trips f
GROUP BY f.service_type
ORDER BY total_records DESC;
