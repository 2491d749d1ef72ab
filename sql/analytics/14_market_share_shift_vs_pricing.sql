-- Market-share shift vs. pricing: five chained CTEs, quartile date
-- cutoffs, zone-partitioned window, ABS top-100 (reference:
-- sql/analytics/14_market_share_shift_vs_pricing.sql). Dialect fixes:
-- tie-stable ROUND(x + 1e-9, d) (see 03's header); the date quartiles go
-- through epoch days (DATEDIFF from 1970-01-01) because Spark's
-- PERCENTILE_CONT interpolates over numerics, not DATEs (same shape as
-- the engine, tlc/Analytics.scala q14); the classification strings drop
-- the reference's checkmark glyphs (engine parity). Plan-shape fix: the
-- reference computes the two quartiles as four uncorrelated scalar
-- subqueries, each re-running the market_share_with_pricing tree (CTEs
-- inline in both engines) — here they aggregate ONCE into a 1-row CTE
-- cross-joined (broadcast) into the grouping pass, the engine's plan.
WITH daily_zone_metrics AS (
    SELECT
        f.pickup_date,
        z.zone,
        z.borough,
        f.service_type,
        COUNT(*)               AS trip_count,
        AVG(f.price_per_mile)  AS avg_price_per_mile,
        AVG(f.total_fare)      AS avg_total_fare,
        SUM(f.total_fare)      AS total_revenue
    FROM fact_trips f
    JOIN dim_zones z ON f.pickup_zone_id = z.location_id
    WHERE f.is_valid = TRUE
      AND f.price_per_mile BETWEEN 0.5 AND 50
      AND z.borough != 'Unknown'
    GROUP BY f.pickup_date, z.zone, z.borough, f.service_type
),

zone_day_totals AS (
    SELECT
        pickup_date,
        zone,
        borough,
        SUM(trip_count)    AS total_trips,
        SUM(total_revenue) AS total_revenue
    FROM daily_zone_metrics
    GROUP BY pickup_date, zone, borough
),

market_share_with_pricing AS (
    SELECT
        m.pickup_date,
        m.zone,
        m.borough,
        m.service_type,
        m.trip_count,
        t.total_trips,
        ROUND(m.trip_count * 100.0 / NULLIF(t.total_trips, 0) + 1e-9, 2)
            AS market_share_pct,
        ROUND(m.avg_price_per_mile + 1e-9, 2)  AS price_per_mile,
        ROUND(m.avg_total_fare + 1e-9, 2)      AS avg_fare,
        ROUND(m.total_revenue * 100.0 / NULLIF(t.total_revenue, 0) + 1e-9, 2)
            AS revenue_share_pct
    FROM daily_zone_metrics m
    JOIN zone_day_totals t
        ON m.pickup_date = t.pickup_date
       AND m.zone = t.zone
    WHERE t.total_trips >= 50  -- Minimum volume threshold
),

-- Quartile dates of the filtered set — ONE row, broadcast into the
-- grouping pass below (the reference's four scalar subqueries, computed
-- once).
quartile_dates AS (
    SELECT
        PERCENTILE_CONT(0.25) WITHIN GROUP
            (ORDER BY DATEDIFF(pickup_date, DATE '1970-01-01')) AS q25,
        PERCENTILE_CONT(0.75) WITHIN GROUP
            (ORDER BY DATEDIFF(pickup_date, DATE '1970-01-01')) AS q75
    FROM market_share_with_pricing
),

-- Calculate market share changes over time (early = first 25% of dates,
-- late = last 25%)
market_share_changes AS (
    SELECT
        zone,
        borough,
        service_type,
        AVG(CASE WHEN DATEDIFF(pickup_date, DATE '1970-01-01') <= q.q25
            THEN market_share_pct END) AS early_market_share,
        AVG(CASE WHEN DATEDIFF(pickup_date, DATE '1970-01-01') <= q.q25
            THEN price_per_mile END) AS early_price,
        AVG(CASE WHEN DATEDIFF(pickup_date, DATE '1970-01-01') >= q.q75
            THEN market_share_pct END) AS late_market_share,
        AVG(CASE WHEN DATEDIFF(pickup_date, DATE '1970-01-01') >= q.q75
            THEN price_per_mile END) AS late_price,
        AVG(market_share_pct)        AS avg_market_share,
        AVG(price_per_mile)          AS avg_price,
        COUNT(DISTINCT pickup_date)  AS days_active,
        SUM(trip_count)              AS total_trips
    FROM market_share_with_pricing CROSS JOIN quartile_dates q
    GROUP BY zone, borough, service_type
    HAVING COUNT(DISTINCT pickup_date) >= 10  -- At least 10 days of data
),

-- Calculate relative pricing (vs. zone average across all services)
relative_pricing AS (
    SELECT
        m.*,
        ROUND(m.late_market_share - m.early_market_share + 1e-9, 2)
            AS market_share_change_pct,
        ROUND(m.late_price - m.early_price + 1e-9, 2) AS price_change,
        ROUND((m.late_price - m.early_price)
              / NULLIF(m.early_price, 0) * 100 + 1e-9, 1) AS price_change_pct,
        ROUND(m.avg_price - AVG(m.avg_price) OVER (PARTITION BY m.zone) + 1e-9, 2)
            AS price_vs_zone_avg,
        CASE
            WHEN m.late_market_share - m.early_market_share > 5  THEN 'Gaining Share'
            WHEN m.late_market_share - m.early_market_share < -5 THEN 'Losing Share'
            ELSE 'Stable'
        END AS share_trend,
        CASE
            WHEN m.avg_price > AVG(m.avg_price) OVER (PARTITION BY m.zone) * 1.1
                THEN 'Premium Priced'
            WHEN m.avg_price < AVG(m.avg_price) OVER (PARTITION BY m.zone) * 0.9
                THEN 'Discount Priced'
            ELSE 'Market Priced'
        END AS pricing_position
    FROM market_share_changes m
)

-- Final output: market share shifts correlated with pricing
SELECT
    zone,
    borough,
    service_type,

    -- Market share metrics
    ROUND(early_market_share + 1e-9, 1) AS early_share_pct,
    ROUND(late_market_share + 1e-9, 1)  AS late_share_pct,
    market_share_change_pct             AS share_change_pct,
    share_trend,

    -- Pricing metrics
    ROUND(early_price + 1e-9, 2)        AS early_price_per_mile,
    ROUND(late_price + 1e-9, 2)         AS late_price_per_mile,
    price_change                        AS price_change_dollars,
    price_change_pct,
    pricing_position,

    -- Relative pricing
    price_vs_zone_avg                   AS price_premium_vs_zone,

    -- Volume
    total_trips,
    days_active,

    -- Correlation insight
    CASE
        WHEN share_trend = 'Gaining Share' AND pricing_position = 'Discount Priced'
            THEN 'Gaining via Lower Price'
        WHEN share_trend = 'Gaining Share' AND pricing_position = 'Premium Priced'
            THEN 'Gaining Despite Higher Price (Quality/Service)'
        WHEN share_trend = 'Losing Share' AND pricing_position = 'Premium Priced'
            THEN 'Losing due to High Price'
        WHEN share_trend = 'Losing Share' AND pricing_position = 'Discount Priced'
            THEN 'Losing Despite Low Price (Quality Issues?)'
        ELSE 'Stable Market'
    END AS competitive_insight

FROM relative_pricing
WHERE total_trips >= 500  -- Meaningful volume
ORDER BY ABS(market_share_change_pct) DESC
LIMIT 100;
