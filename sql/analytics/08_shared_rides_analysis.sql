-- Shared-rides adoption and economics for HVFHV, with percent-of-total
-- window over the aggregate (reference:
-- sql/analytics/08_shared_rides_analysis.sql — runs unchanged under
-- Spark SQL).
SELECT
    CASE
        WHEN f.is_shared_request AND f.is_shared_match     THEN 'Requested & Matched'
        WHEN f.is_shared_request AND NOT f.is_shared_match THEN 'Requested but Not Matched'
        ELSE 'Not Shared'
    END                                                     AS shared_status,
    COUNT(*)                                                AS trip_count,
    -- 100e0, not 100.0: Spark parses exact-decimal literals as DECIMAL and
    -- would emit a DECIMAL percentage; the double literal keeps the whole
    -- ratio in double arithmetic, matching the engine (Analytics.q08).
    ROUND(COUNT(*) * 100e0 / SUM(COUNT(*)) OVER () + 1e-9, 2)      AS percentage,
    AVG(f.total_fare)                                       AS avg_fare,
    AVG(f.trip_distance_miles)                              AS avg_distance,
    AVG(f.price_per_mile)                                   AS avg_price_per_mile,
    AVG(f.take_rate) * 100                                  AS avg_take_rate_pct,
    AVG(f.driver_pay)                                       AS avg_driver_pay
FROM fact_trips f
WHERE f.service_type = 'hvfhv'
  AND f.is_valid = TRUE
GROUP BY
    CASE
        WHEN f.is_shared_request AND f.is_shared_match     THEN 'Requested & Matched'
        WHEN f.is_shared_request AND NOT f.is_shared_match THEN 'Requested but Not Matched'
        ELSE 'Not Shared'
    END
ORDER BY trip_count DESC;
