-- Pricing comparison: yellow vs green vs HVFHV (reference:
-- sql/analytics/05_pricing_comparison.sql — runs unchanged under
-- Spark SQL including PERCENTILE_CONT … WITHIN GROUP).
SELECT
    f.service_type,
    COUNT(*)                                                        AS trip_count,
    AVG(f.price_per_mile)                                           AS avg_price_per_mile,
    PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY f.price_per_mile)   AS median_price_per_mile,
    AVG(f.price_per_minute)                                         AS avg_price_per_minute,
    PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY f.price_per_minute) AS median_price_per_minute,
    AVG(f.total_fare)                                               AS avg_total_fare,
    AVG(f.trip_distance_miles)                                      AS avg_trip_distance,
    AVG(f.trip_duration_minutes)                                    AS avg_trip_duration,
    AVG(f.tips)                                                     AS avg_tips,
    AVG(f.tips) / NULLIF(AVG(f.total_fare), 0) * 100                AS avg_tip_percentage
FROM fact_trips f
WHERE f.is_valid = TRUE
  AND f.price_per_mile BETWEEN 0.5 AND 50
  AND f.price_per_minute BETWEEN 0.1 AND 10
GROUP BY f.service_type
ORDER BY trip_count DESC;
