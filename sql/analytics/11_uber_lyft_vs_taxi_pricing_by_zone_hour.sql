-- HVFHV (Uber/Lyft) vs traditional-taxi pricing by zone and hour:
-- conditional medians, two-sided HAVING, CASE sort key, top 50
-- (reference: sql/analytics/11_uber_lyft_vs_taxi_pricing_by_zone_hour
-- .sql). Dialect fix: tie-stable ROUND(x + 1e-9, d) — see 03's header.
-- PERCENTILE_CONT … WITHIN GROUP (ORDER BY CASE …) runs natively in
-- Spark SQL; NULLs from the non-matching service rows are skipped by
-- the ordered-set aggregate in both engines.
WITH pricing_comparison AS (
    SELECT
        z.zone          AS pickup_zone,
        z.borough,
        t.hour,
        t.hour_12       AS hour_label,
        t.is_rush_hour  AS is_peak_hour,
        -- Yellow/Green taxi metrics
        PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY
            CASE WHEN f.service_type IN ('yellow', 'green') THEN f.price_per_mile END)
            AS taxi_median_price_per_mile,
        PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY
            CASE WHEN f.service_type IN ('yellow', 'green') THEN f.price_per_minute END)
            AS taxi_median_price_per_minute,
        COUNT(CASE WHEN f.service_type IN ('yellow', 'green') THEN 1 END)
            AS taxi_trip_count,
        -- HVFHV metrics
        PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY
            CASE WHEN f.service_type = 'hvfhv' THEN f.price_per_mile END)
            AS hvfhv_median_price_per_mile,
        PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY
            CASE WHEN f.service_type = 'hvfhv' THEN f.price_per_minute END)
            AS hvfhv_median_price_per_minute,
        COUNT(CASE WHEN f.service_type = 'hvfhv' THEN 1 END)
            AS hvfhv_trip_count
    FROM fact_trips f
    JOIN dim_zones z ON f.pickup_zone_id = z.location_id
    JOIN dim_time t ON f.pickup_hour = t.hour
    WHERE f.is_valid = TRUE
      AND f.price_per_mile BETWEEN 0.5 AND 50
      AND f.price_per_minute BETWEEN 0.1 AND 10
      AND z.borough != 'Unknown'
    GROUP BY z.zone, z.borough, t.hour, t.hour_12, t.is_rush_hour
    HAVING COUNT(CASE WHEN f.service_type IN ('yellow', 'green') THEN 1 END) >= 10
       AND COUNT(CASE WHEN f.service_type = 'hvfhv' THEN 1 END) >= 10
)
SELECT
    pickup_zone,
    borough,
    hour,
    hour_label,
    is_peak_hour,
    -- Taxi pricing
    ROUND(taxi_median_price_per_mile + 1e-9, 2)    AS taxi_price_per_mile,
    ROUND(taxi_median_price_per_minute + 1e-9, 2)  AS taxi_price_per_minute,
    taxi_trip_count,
    -- HVFHV pricing
    ROUND(hvfhv_median_price_per_mile + 1e-9, 2)   AS hvfhv_price_per_mile,
    ROUND(hvfhv_median_price_per_minute + 1e-9, 2) AS hvfhv_price_per_minute,
    hvfhv_trip_count,
    -- Price differences (absolute)
    ROUND(hvfhv_median_price_per_mile - taxi_median_price_per_mile + 1e-9, 2)
        AS price_diff_per_mile,
    ROUND(hvfhv_median_price_per_minute - taxi_median_price_per_minute + 1e-9, 2)
        AS price_diff_per_minute,
    -- Price differences (percentage)
    ROUND((hvfhv_median_price_per_mile - taxi_median_price_per_mile)
          / NULLIF(taxi_median_price_per_mile, 0) * 100 + 1e-9, 1)
        AS price_diff_pct_per_mile,
    ROUND((hvfhv_median_price_per_minute - taxi_median_price_per_minute)
          / NULLIF(taxi_median_price_per_minute, 0) * 100 + 1e-9, 1)
        AS price_diff_pct_per_minute,
    -- Is HVFHV materially higher? (>10% premium)
    CASE
        WHEN (hvfhv_median_price_per_mile - taxi_median_price_per_mile)
             / NULLIF(taxi_median_price_per_mile, 0) > 0.10
        THEN 'YES - HVFHV Higher'
        WHEN (hvfhv_median_price_per_mile - taxi_median_price_per_mile)
             / NULLIF(taxi_median_price_per_mile, 0) < -0.10
        THEN 'NO - Taxi Higher'
        ELSE 'Similar'
    END AS pricing_verdict
FROM pricing_comparison
ORDER BY
    CASE
        WHEN (hvfhv_median_price_per_mile - taxi_median_price_per_mile)
             / NULLIF(taxi_median_price_per_mile, 0) > 0.10
        THEN 1 ELSE 2
    END,
    price_diff_pct_per_mile DESC
LIMIT 50;
