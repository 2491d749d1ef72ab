package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy hitters as a custom typed aggregate — the library's
  * UDAF axis of the extension-preference ladder (SURVEY.md §7.3): custom
  * `Aggregator` with real partial/final MERGE semantics, the summary Spark
  * itself lacks (approx_count_distinct sketches cardinality, not identity).
  *
  * The buffer keeps at most `capacity` counters. Combining (used for both
  * per-row reduce and partition merge — the mergeable-summaries form of
  * Agarwal et al., "Mergeability of Summaries", PODS'12) sums counters and,
  * when more than `capacity` survive, subtracts the (capacity+1)-th largest
  * count from all and drops the non-positive ones.
  *
  * Guarantees over a group of n rows: every value with true frequency
  * > n/(capacity+1) is present, and each reported count undercounts its
  * true frequency by at most n/(capacity+1). When `capacity` is at least
  * the group's distinct-value count no trimming ever happens and the
  * result is EXACT — which is what makes the gate query (a20)
  * oracle-checkable against plain GROUP BY counts.
  */
case class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity >= 1)

  private def combine(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val merged = b.foldLeft(a) { case (m, (v, c)) =>
      m.updated(v, m.getOrElse(v, 0L) + c)
    }
    if (merged.size <= capacity) merged
    else {
      val threshold = merged.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
      merged.collect { case (v, c) if c > threshold => v -> (c - threshold) }
    }
  }

  override def zero: Map[String, Long] = Map.empty
  override def reduce(b: Map[String, Long], v: String): Map[String, Long] =
    combine(b, Map(v -> 1L))
  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
    combine(b1, b2)
  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
