-- Weekend vs weekday demand and pricing (reference:
-- sql/analytics/07_weekend_vs_weekday.sql — runs unchanged under
-- Spark SQL; day_type is an expression of the grouped is_weekend).
SELECT
    d.is_weekend,
    CASE WHEN d.is_weekend THEN 'Weekend' ELSE 'Weekday' END AS day_type,
    f.service_type,
    COUNT(*)                                          AS trip_count,
    AVG(f.total_fare)                                 AS avg_fare,
    AVG(f.trip_distance_miles)                        AS avg_distance,
    AVG(f.trip_duration_minutes)                      AS avg_duration,
    AVG(f.price_per_mile)                             AS avg_price_per_mile,
    AVG(f.tips) / NULLIF(AVG(f.total_fare), 0) * 100  AS avg_tip_percentage,
    SUM(f.total_fare)                                 AS total_revenue
FROM fact_trips f
JOIN dim_date d ON f.pickup_date = d.date_id
WHERE f.is_valid = TRUE
GROUP BY d.is_weekend, f.service_type
ORDER BY d.is_weekend, trip_count DESC;
