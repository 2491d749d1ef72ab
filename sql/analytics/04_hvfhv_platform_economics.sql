-- HVFHV platform economics: take rates by company (reference:
-- sql/analytics/04_hvfhv_platform_economics.sql). PERCENTILE_CONT …
-- WITHIN GROUP runs natively in Spark SQL. Columns reordered to the
-- engine's canonical q04 output (percentiles last); same set, same
-- values — the gate compares by column name.
SELECT
    c.company_name,
    COUNT(*)                              AS total_trips,
    AVG(f.take_rate) * 100                AS avg_take_rate_pct,
    AVG(f.driver_pay)                     AS avg_driver_pay,
    AVG(f.total_fare - f.driver_pay)      AS avg_platform_commission,
    SUM(f.total_fare - f.driver_pay)      AS total_platform_revenue,
    SUM(f.driver_pay)                     AS total_driver_pay,
    SUM(f.total_fare)                     AS total_gross_revenue,
    PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY f.take_rate) * 100 AS p25_take_rate_pct,
    PERCENTILE_CONT(0.50) WITHIN GROUP (ORDER BY f.take_rate) * 100 AS median_take_rate_pct,
    PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY f.take_rate) * 100 AS p75_take_rate_pct
FROM fact_trips f
JOIN dim_hvfhs_company c ON f.hvfhs_license_num = c.hvfhs_license_num
WHERE f.service_type = 'hvfhv'
  AND f.is_valid = TRUE
  AND f.take_rate BETWEEN 0 AND 1
GROUP BY c.company_name
ORDER BY total_trips DESC;
