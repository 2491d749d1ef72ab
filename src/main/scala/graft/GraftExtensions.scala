package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.CosineSimilarity
import graft.plans.{BucketHistogramStrategy, RewritePercentileAgg, RewriteTopKWindow, TopKStrategy}

/** Production registration point for every custom Catalyst piece in this
  * library, via the public extension mechanism:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions().apply) ...
  * }}}
  *
  * Injects:
  *  - `TopKStrategy` — plans the custom [[graft.plans.TopKPerGroup]]
  *    logical operator as a partial/final heap aggregation;
  *  - `RewriteTopKWindow` — optimizer rule rewriting the
  *    row_number-over-window-then-filter top-N idiom into TopKPerGroup;
  *  - `cosine_sim` — the codegen'd cosine-similarity expression, registered
  *    in the catalog function registry (visible to `spark.sql`, `expr` and
  *    `DESCRIBE FUNCTION`).
  *
  * [[graft.plans.TopK.register]] remains as the per-session runtime
  * alternative for sessions created without the conf (e.g. notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectPlannerStrategy(_ => BucketHistogramStrategy)
    ext.injectOptimizerRule(_ => RewriteTopKWindow)
    // SQL-path percentile rewrite (r14 verdict item 3): PERCENTILE_CONT
    // aggregates onto the PercentileCont mergeable reconstruction.
    // BucketHistogramStrategy must be injected alongside — the rewrite's
    // multi-column batches plan the single-pass histogram operator.
    ext.injectOptimizerRule(_ => RewritePercentileAgg)
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectFunction(GraftExtensions.longDotPrefixDescriptor)
  }
}

object GraftExtensions {
  /** (name, info, builder) descriptor for `cosine_sim`; numeric-array
    * arguments are cast to array<double> like the temp-function form. */
  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (exprs: Seq[Expression]) =>
      CosineSimilarity(
        Cast(exprs(0), ArrayType(DoubleType)),
        Cast(exprs(1), ArrayType(DoubleType))))

  /** `long_dot_prefix(a, b, p)` — the codegen'd exact-int64 prefix dot
    * (graft.functions.LongDotPrefix), same catalog-injection path. */
  val longDotPrefixDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("long_dot_prefix"),
    new ExpressionInfo(classOf[graft.functions.LongDotPrefix].getName, "long_dot_prefix"),
    (exprs: Seq[Expression]) =>
      graft.functions.LongDotPrefix(exprs(0), exprs(1), exprs(2)))
}
