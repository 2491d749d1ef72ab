package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulSessionize
import graft.tlc.Fixtures

/** The stateful streaming sessionizer must agree with the batch
  * gaps-and-islands sessionizer: closed sessions = all sessions except each
  * user's trailing (still-open) one. */
class StatefulStreamingSpec extends AnyFunSuite {
  lazy val spark = Fixtures.sparkSession()
  val sfDir = "/root/testdata/sf0.001"

  test("closed streaming sessions = batch sessions minus the open trailing one") {
    val streamed = StatefulSessionize.run(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n_closed"))
    val batch = graft.SparkEntry.queries("w6_sessionize")(spark, sfDir)
      .select(col("user_id"), (col("n_sessions") - 1).as("n_expected"))
    val joined = batch.join(streamed, Seq("user_id"), "left")
      .withColumn("n_closed", coalesce(col("n_closed"), lit(0L)))
    assert(joined.filter(col("n_closed") =!= col("n_expected")).count() == 0)
    // and at least some sessions actually closed on this data
    assert(streamed.agg(sum(col("n_closed"))).head().getLong(0) > 0)
  }

  test("state transition: gap splits, boundary gap stays in session") {
    import StatefulSessionize._
    val g = GAP_US
    // 3 events: within gap, exactly at gap (stays), beyond gap (splits)
    val events = Iterator(Event(1, 0), Event(1, g), Event(1, 2 * g + 1))
    val state = new TestGroupState[OpenSession]
    val closed = update(1, events, state).toSeq
    assert(closed.map(_.n_events) == Seq(2))
    assert(state.value.exists(_.n == 1))
  }
}

/** Minimal GroupState stub for unit-testing the transition function. */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  var value: Option[S] = None
  override def exists: Boolean = value.isDefined
  override def get: S = value.get
  override def getOption: Option[S] = value
  override def update(newValue: S): Unit = value = Some(newValue)
  override def remove(): Unit = value = None
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
