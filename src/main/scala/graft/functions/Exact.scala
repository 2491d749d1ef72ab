package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine numeric determinism helpers.
  *
  * Floating-point SUM/AVG over large groups is order-dependent: Spark's
  * partial aggregation tree and DuckDB's single-threaded fold accumulate in
  * different orders, so raw double aggregates differ in the low bits and a
  * value-hash comparison against a DuckDB oracle can fail spuriously.
  *
  * Fix: route additive aggregates through fixed-point decimals. Each input
  * double is rounded to `SCALE` decimal digits (identical per-row result in
  * either engine — the same IEEE-754 double rounds to the same decimal), the
  * decimal sum is exact and order-independent, and the final cast back to
  * double is again identical. Oracle SQL must mirror the same shape:
  * `CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE)`.
  *
  * Non-additive aggregates (stddev, percentile interpolation) are computed in
  * doubles and rounded to 6 digits on output — their numeric error is many
  * orders of magnitude below 1e-6 so the rounding is stable.
  */
object Exact {
  // Scale 8, not 6: the test data's money columns carry 2 decimal digits, and
  // ratios against small integers (e.g. price/qty with qty = 32) terminate
  // within 7 decimal digits. At scale 8 those casts are EXACT (no rounding at
  // all), which removes the half-up (Spark) vs half-even (DuckDB) tie-break
  // divergence that scale 6 exposed on exact .xxxxxx5 values.
  val PREC  = 30
  val SCALE = 8

  private val dec = DecimalType(PREC, SCALE)

  /** Order-independent SUM of a double expression, emitted as DOUBLE.
    *
    * The exact decimal sum is rounded to scale 4 BEFORE the double cast:
    * DuckDB converts wide decimals to double by scaling through int128 and
    * the scaled integer of a large scale-8 sum exceeds 2^53, so its result
    * is double-rounded (observed: 527756473.54472500 → …4494, one ulp off
    * Spark's correctly-rounded conversion). At scale 4 the scaled integer
    * stays under 2^53 for |sum| < 9e11 and both engines convert exactly.
    * ROUND (not a decimal rescale-cast) because DuckDB's rescale cast
    * truncates while Spark's HALF_UPs; both engines' ROUND on decimals is
    * half-away-from-zero.
    * Oracle: `CAST(ROUND(SUM(CAST(x AS DECIMAL(30,8))), 4) AS DOUBLE)` */
  def dsum(c: Column): Column = round(sum(c.cast(dec)), 4).cast("double")

  /** Order-independent AVG: rounded exact decimal sum over exact count.
    * Oracle: `CAST(ROUND(SUM(CAST(x AS DECIMAL(30,8))), 4) AS DOUBLE) / COUNT(x)` */
  def davg(c: Column): Column =
    round(sum(c.cast(dec)), 4).cast("double") / count(c)

  /** Round to 4 digits — for non-additive aggregate outputs (stddev,
    * interpolated percentiles) whose low bits legitimately differ per
    * engine; 4 digits keeps the boundary-collision probability negligible
    * relative to the ~1e-10 cross-engine numeric disagreement. */
  def r4(c: Column): Column = round(c, 4)

  /** NULL-safe division: NULL when the denominator is 0 (reference pattern
    * `x / NULLIF(y, 0)`, standardize.py:57-59). */
  def safeDiv(num: Column, den: Column): Column =
    when(den =!= 0, num / den)

  /** Tie-stable ROUND for small-denominator rationals. Averages/medians of
    * money-like 2-decimal inputs are rationals s/n with small n, which land
    * EXACTLY on a half-cent rounding boundary with probability ~1/n per
    * value — and Spark (BigDecimal-of-the-double, HALF_UP) and DuckDB
    * (scaled multiply + nearbyint) resolve the same exact tie in OPPOSITE
    * directions (round 2 found 13.675 → 13.67 vs 13.68). Biasing by 1e-9
    * before rounding moves every exact tie decisively off the boundary the
    * SAME way in both engines, and is far below the ~1e-7 minimum distance
    * of any genuinely-off-boundary small-denominator rational, so non-tie
    * results are unchanged. It also makes Spark itself run-reproducible at
    * ties (double-sum merge order varies ±1e-13 with shuffle fetch order).
    * Oracle mirror: `ROUND(x + 1e-9, d)`. */
  def stableRound(c: Column, scale: Int): Column =
    round(c + lit(1e-9), scale)

  /** `dsum` over a window frame: exact decimal prefix/frame sums are
    * order-independent given the frame's total order, so running sums
    * hash-match the oracle. Oracle shape:
    * `CAST(ROUND(SUM(CAST(x AS DECIMAL(30,8))) OVER (...), 4) AS DOUBLE)` */
  def dsumOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    round(sum(c.cast(dec)).over(w), 4).cast("double")
}
