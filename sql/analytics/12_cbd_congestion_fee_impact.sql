-- CBD congestion-fee impact: rider prices before vs. after the
-- 2025-01-05 cutover for Manhattan CBD pickup zones — zone CTE +
-- IN-subquery semi join + before/after LEFT self-join (reference:
-- sql/analytics/12_cbd_congestion_fee_impact.sql). Dialect fixes:
-- tie-stable ROUND(x + 1e-9, d) (see 03's header) and order-independent
-- decimal-sum averages mirroring graft.functions.Exact.davg — averaged
-- per-mile ratios are generic doubles that can land within 1e-9 of a
-- half-cent boundary, where a plain double AVG's shuffle-order ±1e-13
-- flips the rounded digit across runs (the round-4 q12 regression).
WITH cbd_zones AS (
    -- Manhattan south of 60th Street (CBD zones)
    SELECT location_id
    FROM dim_zones
    WHERE borough = 'Manhattan'
      AND service_zone IN ('Yellow Zone', 'Boro Zone')
),
before_after_pricing AS (
    SELECT
        CASE
            WHEN f.pickup_date < DATE '2025-01-05'  THEN 'Before Jan 5, 2025'
            WHEN f.pickup_date >= DATE '2025-01-05' THEN 'After Jan 5, 2025'
        END AS period,
        f.service_type,
        COUNT(*) AS trip_count,
        PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY f.total_fare)
            AS median_total_fare,
        CAST(ROUND(SUM(CAST(f.price_per_mile AS DECIMAL(30,8))), 4) AS DOUBLE)
            / COUNT(f.price_per_mile)                    AS avg_price_per_mile,
        CAST(ROUND(SUM(CAST(f.surcharges AS DECIMAL(30,8))), 4) AS DOUBLE)
            / COUNT(f.surcharges)                        AS avg_surcharges,
        CAST(ROUND(SUM(CAST(CASE WHEN f.service_type = 'hvfhv'
                                 THEN f.driver_pay END AS DECIMAL(30,8))), 4) AS DOUBLE)
            / COUNT(CASE WHEN f.service_type = 'hvfhv' THEN f.driver_pay END)
                                                         AS avg_driver_pay,
        CAST(ROUND(SUM(CAST(CASE WHEN f.service_type = 'hvfhv'
                                 THEN f.take_rate END AS DECIMAL(30,8))), 4) AS DOUBLE)
            / COUNT(CASE WHEN f.service_type = 'hvfhv' THEN f.take_rate END)
            * 100                                        AS avg_take_rate_pct
    FROM fact_trips f
    WHERE f.is_valid = TRUE
      AND f.pickup_zone_id IN (SELECT location_id FROM cbd_zones)
      AND f.pickup_date BETWEEN DATE '2024-12-01' AND DATE '2025-01-31'
    GROUP BY
        CASE
            WHEN f.pickup_date < DATE '2025-01-05'  THEN 'Before Jan 5, 2025'
            WHEN f.pickup_date >= DATE '2025-01-05' THEN 'After Jan 5, 2025'
        END,
        f.service_type
)
SELECT
    b.service_type,

    -- Before period
    b.trip_count                                        AS trips_before,
    ROUND(b.median_total_fare + 1e-9, 2)                AS median_fare_before,
    ROUND(b.avg_price_per_mile + 1e-9, 2)               AS price_per_mile_before,
    ROUND(b.avg_surcharges + 1e-9, 2)                   AS avg_surcharges_before,
    ROUND(b.avg_driver_pay + 1e-9, 2)                   AS driver_pay_before,
    ROUND(b.avg_take_rate_pct + 1e-9, 1)                AS take_rate_pct_before,

    -- After period
    a.trip_count                                        AS trips_after,
    ROUND(a.median_total_fare + 1e-9, 2)                AS median_fare_after,
    ROUND(a.avg_price_per_mile + 1e-9, 2)               AS price_per_mile_after,
    ROUND(a.avg_surcharges + 1e-9, 2)                   AS avg_surcharges_after,
    ROUND(a.avg_driver_pay + 1e-9, 2)                   AS driver_pay_after,
    ROUND(a.avg_take_rate_pct + 1e-9, 1)                AS take_rate_pct_after,

    -- Changes (absolute)
    ROUND(a.median_total_fare - b.median_total_fare + 1e-9, 2)   AS fare_change_dollars,
    ROUND(a.avg_price_per_mile - b.avg_price_per_mile + 1e-9, 2) AS price_per_mile_change,
    ROUND(a.avg_surcharges - b.avg_surcharges + 1e-9, 2)         AS surcharge_change,
    ROUND(a.avg_driver_pay - b.avg_driver_pay + 1e-9, 2)         AS driver_pay_change,
    ROUND(a.avg_take_rate_pct - b.avg_take_rate_pct + 1e-9, 1)   AS take_rate_change_pct,

    -- Changes (percentage)
    ROUND((a.median_total_fare - b.median_total_fare)
          / NULLIF(b.median_total_fare, 0) * 100 + 1e-9, 1)      AS fare_change_pct,
    ROUND((a.avg_surcharges - b.avg_surcharges)
          / NULLIF(b.avg_surcharges, 0) * 100 + 1e-9, 1)         AS surcharge_change_pct,

    -- Pass-through analysis (who absorbed more of the fee?)
    CASE
        WHEN b.service_type = 'hvfhv' THEN
            CASE
                WHEN (a.avg_take_rate_pct - b.avg_take_rate_pct) > 1
                    THEN 'Platform kept more (driver absorbed fee)'
                WHEN (a.avg_take_rate_pct - b.avg_take_rate_pct) < -1
                    THEN 'Driver got more (platform absorbed fee)'
                ELSE 'Passed to rider'
            END
        ELSE 'N/A - Traditional Taxi'
    END AS fee_absorption_pattern

FROM before_after_pricing b
LEFT JOIN before_after_pricing a
    ON b.service_type = a.service_type
   AND b.period = 'Before Jan 5, 2025'
   AND a.period = 'After Jan 5, 2025'
WHERE b.period = 'Before Jan 5, 2025'
ORDER BY fare_change_pct DESC;
