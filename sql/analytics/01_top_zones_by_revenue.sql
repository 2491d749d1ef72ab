-- Highest-revenue pickup zones across all three services, with the
-- per-service trip mix. Runs over the warehouse views registered by
-- graft.tlc.SqlRunner (fact_trips + dim_zones); aggregates are left
-- unrounded — presentation rounding belongs to the caller.
SELECT
    z.zone                                                          AS pickup_zone,
    z.borough,
    COUNT(*)                                                        AS total_trips,
    SUM(f.total_fare)                                               AS total_revenue,
    AVG(f.total_fare)                                               AS avg_fare,
    AVG(f.trip_distance_miles)                                      AS avg_distance,
    SUM(CASE WHEN f.service_type = 'yellow' THEN 1 ELSE 0 END)      AS yellow_trips,
    SUM(CASE WHEN f.service_type = 'green'  THEN 1 ELSE 0 END)      AS green_trips,
    SUM(CASE WHEN f.service_type = 'hvfhv'  THEN 1 ELSE 0 END)      AS hvfhv_trips
FROM fact_trips f
JOIN dim_zones z
  ON f.pickup_zone_id = z.location_id
WHERE f.is_valid = TRUE
GROUP BY z.zone, z.borough
ORDER BY total_revenue DESC
LIMIT 20;
