package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-barrier floor calibration (r13 verdict item 2) + streaming
  * start/drain/stop floor (item 6) — the measurement that converts the
  * suite's recurring "k dependent barriers × the local-mode stage floor"
  * adjudication from argument into arithmetic.
  *
  * Three measurements, one JSON artifact (BENCH_FLOOR_r{N}):
  *
  *   1. A SYNTHETIC k-barrier chain, k = 1..8: stage 1 is one real
  *      hash-aggregate over the session-cached lineitem; each further
  *      stage re-keys the previous result (pmod of a derived key) and
  *      re-aggregates, so Catalyst cannot collapse or reorder the
  *      exchanges — exactly k dependent shuffle barriers with near-zero
  *      marginal data work. The least-squares slope of t(k) IS the
  *      per-barrier floor (scheduling + exchange + AQE re-plan), measured
  *      under the same adaptive min-of-N rule as graft.Bench.
  *   2. An EMPTY MemoryStream episode (start → processAllAvailable →
  *      stop, no data, memory sink) and its stateful twin (groupBy count
  *      with state machinery), timing Structured Streaming's per-query
  *      lifecycle floor that the st-family adjudication cites.
  *   3. The ADJUDICATED TAIL re-expressed as barriers × floor + residual:
  *      each query's stage count is MEASURED with a SparkListener during
  *      an untimed run, then residual = min-of-N time − stages × floor.
  *      Stage count includes independent (parallelizable) stages, so the
  *      subtraction is an UPPER bound on floor credit — a residual that
  *      still exceeds the DuckDB comparable is real excess, named, not
  *      adjudicated away.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.BenchFloor out.json"
  */
object BenchFloor {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = args.headOption.getOrElse("BENCH_FLOOR.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.graft.cacheTables",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_TABLES", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // graft.Bench's adaptive min-of-N stop rule, verbatim
    def timeIt(body: => Unit): Double = {
      body // warm
      CacheScope.drain(blocking = true)
      System.gc()
      val ts = scala.collection.mutable.ArrayBuffer.empty[Double]
      var attempts = 0
      var elapsed = 0.0
      var done = false
      while (!done) {
        val t0 = System.nanoTime()
        body
        val dt = (System.nanoTime() - t0) / 1e9
        CacheScope.drain(blocking = true)
        attempts += 1
        elapsed += dt
        ts += dt
        done = (ts.size >= 2 && ts.count(_ <= ts.min * 1.2) >= 2) ||
          attempts >= 5 || elapsed > 30.0
      }
      ts.min
    }

    // --- 1. synthetic k-barrier chain -----------------------------------
    def chain(k: Int): DataFrame = {
      var df = Tables.lineitem(spark, sfDir)
        .select(pmod(col("l_orderkey"), lit(1000003L)).as("k1"),
          col("l_extendedprice").as("v"))
        .groupBy("k1").agg(sum(col("v")).as("v"))
      for (i <- 2 to k) {
        df = df
          .select(pmod(col(s"k${i - 1}") * 31 + i, lit(1000003L)).as(s"k$i"),
            col("v"))
          .groupBy(s"k$i").agg(sum(col("v")).as("v"))
      }
      df
    }
    Tables.lineitem(spark, sfDir).count() // materialize the session cache once
    val ks = 1 to 8
    val chainTimes = ks.map(k => k -> timeIt(chain(k).count())).toMap
    // least-squares slope over (k, t): the per-barrier floor
    val n = ks.size.toDouble
    val sx = ks.sum.toDouble
    val sy = ks.map(chainTimes).sum
    val sxx = ks.map(k => k * k).sum.toDouble
    val sxy = ks.map(k => k * chainTimes(k)).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - slope * sx) / n

    // --- 2. streaming lifecycle floor -----------------------------------
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val probeId = new java.util.concurrent.atomic.AtomicInteger()
    def streamEpisode(stateful: Boolean): Unit = {
      val ms = MemoryStream[Int]
      val df0 = ms.toDF()
      val agg = if (stateful) df0.groupBy(col("value")).count() else df0
      val q = agg.writeStream
        .outputMode(if (stateful) "complete" else "append")
        .format("memory")
        .queryName(s"floor_probe_${probeId.incrementAndGet()}")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // min-of-5 raw samples (no warm-run amortization: start/stop IS the
    // measured thing, every st gate pays it cold)
    def minOf5(body: => Unit): Double =
      (1 to 5).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
    val stStateless = minOf5(streamEpisode(stateful = false))
    val stStateful = minOf5(streamEpisode(stateful = true))

    // --- 3. the adjudicated tail: measured stages × floor + residual ----
    val tail = sys.env.get("SPARK_GRAFT_FLOOR_QUERIES")
      .map(_.split(",").toSeq)
      .getOrElse(Seq(
        "w12_robust_mad", "w16_decile_fences", "a18_ordered_set",
        "a27_group_quantiles", "a26_weighted_median", "tlc_sql_q14",
        "tlc_pipeline_q11", "s19_encoding_plan", "j14_salted_join"))
      .filter(SparkEntry.queries.contains)
    val stageCounter = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        stageCounter.incrementAndGet()
    }
    val tailRows = tail.map { name =>
      val run = () => { SparkEntry.queries(name)(spark, sfDir).count(); () }
      run() // warm (codegen, session caches) before counting stages
      CacheScope.drain(blocking = true)
      spark.sparkContext.addSparkListener(listener)
      stageCounter.set(0)
      run()
      Thread.sleep(500) // listener bus is async
      val stages = stageCounter.get()
      spark.sparkContext.removeSparkListener(listener)
      CacheScope.drain(blocking = true)
      val t = timeIt(run())
      val residual = t - stages * slope
      name -> (t, stages, residual)
    }

    def f(v: Double): String =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val chainJson = ks.map(k => s""""$k":${f(chainTimes(k))}""").mkString("{", ",", "}")
    val tailJson = tailRows.map { case (name, (t, st, res)) =>
      s""""$name":{"sec":${f(t)},"stages":$st,"residual_after_floor":${f(res)}}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"stage_floor_calibration","unit":"sec","sf":"$sfDir","cpus":$cpus,
 "chain_times_by_k":$chainJson,
 "per_barrier_floor_sec":${f(slope)},
 "chain_intercept_sec":${f(intercept)},
 "streaming_episode_floor_sec":{"stateless_empty":${f(stStateless)},"stateful_empty":${f(stStateful)}},
 "tail":$tailJson,
 "methodology":"chain: k dependent re-keyed hash-aggs over the session-cached lineitem, adaptive min-of-N (graft.Bench rule), floor = least-squares slope of t(k), k=1..8; streaming: min-of-5 cold start->processAllAvailable->stop of an EMPTY MemoryStream (memory sink), stateless and stateful; tail: stages counted by SparkListener on a warmed untimed run (includes independent stages, so stages x floor OVERSTATES the floor credit and the residual is conservative), residual = min-of-N sec - stages x floor"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json.linesIterator.mkString(" "))
    spark.stop()
  }
}
