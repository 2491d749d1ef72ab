-- Borough-level trip patterns and economics (reference:
-- sql/analytics/09_borough_comparison.sql — runs unchanged under
-- Spark SQL).
SELECT
    z.borough,
    COUNT(*)                                                    AS total_trips,
    SUM(CASE WHEN f.service_type = 'yellow' THEN 1 ELSE 0 END)  AS yellow_trips,
    SUM(CASE WHEN f.service_type = 'green'  THEN 1 ELSE 0 END)  AS green_trips,
    SUM(CASE WHEN f.service_type = 'hvfhv'  THEN 1 ELSE 0 END)  AS hvfhv_trips,
    AVG(f.total_fare)                                           AS avg_fare,
    AVG(f.trip_distance_miles)                                  AS avg_distance,
    AVG(f.trip_duration_minutes)                                AS avg_duration,
    AVG(f.price_per_mile)                                       AS avg_price_per_mile,
    SUM(f.total_fare)                                           AS total_revenue,
    -- 100e0, not 100.0: Spark parses exact-decimal literals as DECIMAL and
    -- would emit a DECIMAL share; the double literal keeps the ratio in
    -- double arithmetic, matching the engine (Analytics.q09).
    ROUND(SUM(CASE WHEN f.service_type = 'hvfhv' THEN 1 ELSE 0 END) * 100e0
          / COUNT(*) + 1e-9, 2)                                        AS hvfhv_market_share_pct
FROM fact_trips f
JOIN dim_zones z ON f.pickup_zone_id = z.location_id
WHERE f.is_valid = TRUE
  AND z.borough != 'Unknown'
GROUP BY z.borough
ORDER BY total_trips DESC;
