-- Market-share trends over time: re-aggregate agg_market_share to daily,
-- then join the date dim (reference: sql/analytics/03_market_share_trends
-- .sql). Dialect fix: the engine's tie-stable ROUND(x + 1e-9, d) replaces
-- plain ROUND — averages of 2-decimal money values land exactly on
-- half-cent boundaries where engines round in opposite directions
-- (graft.functions.Exact.stableRound).
SELECT
    d.date_id                                            AS date,
    d.month_name,
    d.year,
    m.total_trips,
    m.yellow_trips,
    m.green_trips,
    m.hvfhv_trips,
    ROUND(m.yellow_share * 100 + 1e-9, 2)                AS yellow_share_pct,
    ROUND(m.green_share  * 100 + 1e-9, 2)                AS green_share_pct,
    ROUND(m.hvfhv_share  * 100 + 1e-9, 2)                AS hvfhv_share_pct,
    m.total_revenue,
    ROUND(m.yellow_revenue_share * 100 + 1e-9, 2)        AS yellow_revenue_share_pct,
    ROUND(m.green_revenue_share  * 100 + 1e-9, 2)        AS green_revenue_share_pct,
    ROUND(m.hvfhv_revenue_share  * 100 + 1e-9, 2)        AS hvfhv_revenue_share_pct
FROM (
    SELECT
        trip_date,
        SUM(total_trips)   AS total_trips,
        SUM(yellow_trips)  AS yellow_trips,
        SUM(green_trips)   AS green_trips,
        SUM(hvfhv_trips)   AS hvfhv_trips,
        AVG(yellow_share)  AS yellow_share,
        AVG(green_share)   AS green_share,
        AVG(hvfhv_share)   AS hvfhv_share,
        SUM(total_revenue) AS total_revenue,
        SUM(yellow_total_revenue) / NULLIF(SUM(total_revenue), 0) AS yellow_revenue_share,
        SUM(green_total_revenue)  / NULLIF(SUM(total_revenue), 0) AS green_revenue_share,
        SUM(hvfhv_total_revenue)  / NULLIF(SUM(total_revenue), 0) AS hvfhv_revenue_share
    FROM agg_market_share
    GROUP BY trip_date
) m
JOIN dim_date d ON m.trip_date = d.date_id
ORDER BY d.date_id;
