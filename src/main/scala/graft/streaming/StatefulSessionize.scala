package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: per-user sessionization with
  * `flatMapGroupsWithState` (SURVEY.md §2.11 — the reference only sketches
  * streaming; this implements the stateful path the build brief names).
  *
  * Each user's open session lives in group state across micro-batches; a
  * batch's events close every session whose gap to the next event exceeds
  * GAP (emitting it downstream) and leave the trailing session open in
  * state. Gap semantics match the batch sessionizer (`w6_sessionize`):
  * strictly-greater-than-gap starts a new session.
  */
object StatefulSessionize {

  final case class Event(user_id: Long, us: Long)
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  final case class ClosedSession(
    user_id: Long, start_us: Long, n_events: Long, duration_seconds: Long)

  val GAP_US: Long = 30L * 60L * 1000000L

  /** State-transition function: fold the batch's events (sorted by time)
    * into the open session, emitting every session that closes. */
  def update(userId: Long, events: Iterator[Event],
             state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    val sorted = events.toSeq.sortBy(_.us)
    if (sorted.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
    var cur = state.getOption
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.us - s.lastUs <= GAP_US =>
          cur = Some(s.copy(lastUs = e.us, n = s.n + 1))
        case Some(s) =>
          out += ClosedSession(userId, s.startUs, s.n, (s.lastUs - s.startUs) / 1000000L)
          cur = Some(OpenSession(e.us, e.us, 1))
        case None =>
          cur = Some(OpenSession(e.us, e.us, 1))
      }
    }
    state.update(cur.get)
    out.iterator
  }

  private val runId = new AtomicInteger(0)

  /** Drive the stateful query over the events table (file-stream source,
    * memory sink, drained synchronously). Returns closed sessions; each
    * user's trailing session remains open in state by design. */
  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("graft_stateful_")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"), java.nio.file.Paths.get(path))
    val schema = spark.read.parquet(path).schema
    val events = spark.readStream.schema(schema).parquet(dir.toString)
      .select(col("user_id"), expr("ts div 1000").as("us"))
      .as[Event]
    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
    val name = s"st3_out_${runId.incrementAndGet()}"
    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  /** Gate query: per-user closed-session rollup (rows-only — the batch
    * equivalence is asserted by StatefulStreamingSpec instead of a SQL
    * oracle, since open sessions are deliberately withheld). */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st3_stateful_sessions" -> { (s, d) =>
      run(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_closed_sessions"),
          sum(col("n_events")).as("n_events_closed"))
        .orderBy("user_id")
    })
}
