-- Hourly demand patterns by service type (reference:
-- sql/analytics/02_hourly_demand_patterns.sql — runs unchanged under
-- Spark SQL; aggregates left unrounded, presentation rounding belongs
-- to the caller). Runs over the SqlRunner warehouse views.
SELECT
    t.hour,
    t.hour_12                                                       AS hour_label,
    t.is_rush_hour                                                  AS is_peak_hour,
    SUM(CASE WHEN f.service_type = 'yellow' THEN 1 ELSE 0 END)      AS yellow_trips,
    SUM(CASE WHEN f.service_type = 'green'  THEN 1 ELSE 0 END)      AS green_trips,
    SUM(CASE WHEN f.service_type = 'hvfhv'  THEN 1 ELSE 0 END)      AS hvfhv_trips,
    COUNT(*)                                                        AS total_trips,
    AVG(f.total_fare)                                               AS avg_fare,
    AVG(f.trip_duration_minutes)                                    AS avg_duration_minutes
FROM fact_trips f
JOIN dim_time t ON f.pickup_hour = t.hour
WHERE f.is_valid = TRUE
GROUP BY t.hour, t.hour_12, t.is_rush_hour
ORDER BY t.hour;
