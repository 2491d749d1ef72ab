-- Monthly take-rate distribution per HVFHV company: quartiles, mean,
-- spread and IQR. Exercises ordered-set aggregates
-- (PERCENTILE_CONT ... WITHIN GROUP), which Spark SQL runs natively.
SELECT
    d.year,
    d.month,
    d.month_name,
    c.company_name,
    COUNT(*)                                                         AS trip_count,
    PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY f.take_rate) * 100  AS p25_take_rate,
    PERCENTILE_CONT(0.50) WITHIN GROUP (ORDER BY f.take_rate) * 100  AS median_take_rate,
    PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY f.take_rate) * 100  AS p75_take_rate,
    AVG(f.take_rate) * 100                                           AS avg_take_rate,
    STDDEV(f.take_rate) * 100                                        AS stddev_take_rate,
    (PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY f.take_rate)
     - PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY f.take_rate)) * 100 AS iqr_take_rate
FROM fact_trips f
JOIN dim_date d
  ON f.pickup_date = d.date_id
JOIN dim_hvfhs_company c
  ON f.hvfhs_license_num = c.hvfhs_license_num
WHERE f.is_valid = TRUE
  AND f.service_type = 'hvfhv'
  AND f.take_rate BETWEEN 0 AND 1
GROUP BY d.year, d.month, d.month_name, c.company_name
ORDER BY d.year, d.month, c.company_name;
