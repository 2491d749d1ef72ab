package graft.tlc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Command-line pipeline runner (reference: src/cli.py `run-e2e` /
  * `run-analytics`):
  *
  *   runMain graft.tlc.Cli --yellow p1 --green p2 --hvfhv p3 --zones p4 --out dir
  *
  * Loads each raw source with the drift-tolerant loader (drift reports go to
  * stderr), runs the full pipeline, and writes under --out:
  * fact_trips/ (partitioned by pickup_date), agg_* tables, dim_* tables,
  * data_quality_metrics/, and analytics/<query>/ for all 14 queries.
  * Downloading stays outside the engine (SURVEY.md §2.1 S4).
  */
object Cli {

  def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap

  /** `run-analytics` subcommand (reference cli.py:279–297): execute a SQL
    * file against a parquet warehouse previously written by the pipeline.
    *
    *   runMain graft.tlc.Cli run-analytics --sql file.sql --warehouse dir [--out dir]
    */
  private def runAnalytics(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val missing = Seq("sql", "warehouse").filterNot(opts.contains)
    require(missing.isEmpty, s"missing arguments: ${missing.map("--" + _).mkString(" ")}")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-tlc-analytics")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same LOCAL A/B hook as Bench/PlanDump (r15): extra session confs for
    // plan-variant measurement runs (e.g. the BENCH_E2E percentile-shape
    // A/B); nothing sets it in production or driver runs.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })

    val views = SqlRunner.registerWarehouse(spark, opts("warehouse"))
    System.err.println(s"[graft] registered views: ${views.mkString(", ")}")
    val result = SqlRunner.runFile(spark, opts("sql"))
    result.show(50, truncate = false)
    opts.get("out").foreach(o => result.write.mode("overwrite").parquet(o))
    println(s"[graft] query returned ${result.count()} rows")
    spark.stop()
  }

  /** `download` subcommand (reference cli.py:44–76): fetch raw months +
    * zones into --dest. No Spark session — pure driver I/O.
    *
    *   runMain graft.tlc.Cli download --start 2024-12 --end 2025-01 \
    *     --dest dir [--services yellow,green,hvfhv] [--no-skip-existing]
    */
  private def runDownload(args: Array[String]): Unit = {
    val opts = parseArgs(args.filterNot(_ == "--no-skip-existing"))
    val missing = Seq("start", "end", "dest").filterNot(opts.contains)
    require(missing.isEmpty, s"missing arguments: ${missing.map("--" + _).mkString(" ")}")
    val Array(sy, sm) = opts("start").split("-").map(_.toInt)
    val Array(ey, em) = opts("end").split("-").map(_.toInt)
    val services = opts.get("services")
      .map(_.split(",").toSeq).getOrElse(Seq("yellow", "green", "hvfhv"))
    val results = Downloader.downloadRange(
      new Downloader.HttpFetcher(), opts("dest"), sy, sm, ey, em, services,
      skipIfExists = !args.contains("--no-skip-existing"))
    Downloader.summarize(results).toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(s"[graft] download $k: $v")
    }
    results.filter(_.status == "failed").foreach { r =>
      System.err.println(s"[graft] FAILED ${r.url}: ${r.error.getOrElse("")}")
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("run-analytics")) return runAnalytics(args.drop(1))
    if (args.headOption.contains("download")) return runDownload(args.drop(1))
    if (args.headOption.contains("run-incremental")) {
      val opts = parseArgs(args.drop(1))
      val required = Seq("yellow", "green", "hvfhv", "zones", "out")
      val missing = required.filterNot(opts.contains)
      require(missing.isEmpty, s"missing arguments: ${missing.map("--" + _).mkString(" ")}")
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
        .appName("graft-tlc-incremental")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
    // same LOCAL A/B hook as Bench/PlanDump (r15): extra session confs for
    // plan-variant measurement runs (e.g. the BENCH_E2E percentile-shape
    // A/B); nothing sets it in production or driver runs.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
      runIncremental(spark, opts)
      spark.stop()
      return
    }
    val opts = parseArgs(args)
    val required = Seq("yellow", "green", "hvfhv", "zones", "out")
    val missing = required.filterNot(opts.contains)
    require(missing.isEmpty, s"missing arguments: ${missing.map("--" + _).mkString(" ")}")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-tlc-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same LOCAL A/B hook as Bench/PlanDump (r15): extra session confs for
    // plan-variant measurement runs (e.g. the BENCH_E2E percentile-shape
    // A/B); nothing sets it in production or driver runs.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    runPipeline(spark, opts)
    spark.stop()
  }

  /** The e2e body behind `main`, session-injected so tests can drive it
    * without the session lifecycle.
    *
    * Stage wall times (load → quality → standardize → aggregates → dims →
    * analytics → finalize) are printed per stage to stderr and, when
    * `--timings file.json` is passed, written as one JSON object — the
    * BASELINE.md "stage wall time on identical input" comparable
    * (BENCH_E2E artifacts; reference point: docs/QUICK_START.md:19–34's
    * 3–5 min sample pipeline).
    *
    * After the fact write, every downstream stage reads the MATERIALIZED
    * fact_trips back from disk (Pipeline.derive's scaladoc): one
    * standardize pass per pipeline run, like the reference's warehouse. */
  private[graft] def runPipeline(spark: SparkSession, opts: Map[String, String]): Unit = {
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[T](stage: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      timings(stage) = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[timing] stage=$stage seconds=${timings(stage)}%.3f")
      r
    }
    // Per-file load audit (reference loader.py:264–333): each raw source
    // load appends an ingestion_log entry with row count, duration, checksum
    // and status, written alongside the data sinks below.
    val logEntries = scala.collection.mutable.ArrayBuffer.empty[IngestionLog.Entry]

    def loadRaw(key: String, schema: org.apache.spark.sql.types.StructType): DataFrame = {
      val path = opts(key)
      val t0 = System.nanoTime()
      val (df, drift) = RawLoader.load(spark, path, schema,
        new java.io.File(path).getName)
      if (drift.hasDrift) System.err.println(s"[drift] $key: $drift")
      val (rows, _, sha) = RawLoader.validate(spark, path)
      logEntries += IngestionLog.Entry(
        sequenceId = logEntries.size + 1L,
        sourceFile = new java.io.File(path).getName,
        serviceType = key,
        rowCount = rows,
        durationSeconds = (System.nanoTime() - t0) / 1e9,
        status = "completed",
        errorMessage = None,
        fileSha256 = sha,
        loadedAt = new java.sql.Timestamp(System.currentTimeMillis()))
      df
    }

    val zonesPath = opts("zones")
    val zones =
      if (zonesPath.endsWith(".csv"))
        spark.read.option("header", true).option("inferSchema", true).csv(zonesPath)
      else spark.read.parquet(zonesPath)

    // Stage retry counts mirror the reference's Prefect task config
    // (flows.py: load-data 2, transform-to-fact 2, build-aggregates 2,
    // quality-check 1); see Retry's scaladoc for why retries wrap actions.
    // `load` covers validation (row count + column probe + SHA256) of each
    // raw file; the parquet scan itself is lazy and is paid once, in the
    // `standardize` stage's fact write.
    val (rawY, rawG, rawH) = timed("load") {(
      Retry.withRetries(2, "load-yellow")(loadRaw("yellow", Schemas.rawYellow)),
      Retry.withRetries(2, "load-green")(loadRaw("green", Schemas.rawGreen)),
      Retry.withRetries(2, "load-hvfhv")(loadRaw("hvfhv", Schemas.rawHvfhv)))}

    // Pipeline.run executes the quality-check actions eagerly (the rest of
    // the Result is lazy lineage), so its wall time IS the quality stage.
    val result = timed("quality") { Pipeline.run(spark, rawY, rawG, rawH, zones) }

    val out = opts("out")
    val nFact = timed("standardize") {
      Retry.withRetries(2, "transform-to-fact") {
        Pipeline.writeFact(result.fact, s"$out/fact_trips")
      }
      Retry.withRetries(1, "quality-check") {
        result.qualityMetrics.coalesce(1).write.mode("overwrite")
          .parquet(s"$out/data_quality_metrics")
      }
      spark.read.parquet(s"$out/fact_trips").count()
    }
    // Everything downstream reads the MATERIALIZED fact partitioned by
    // pickup_date — one standardize pass per run, and date-scoped analytics
    // prune partitions (Pipeline.derive's scaladoc).
    val factOnDisk = spark.read.parquet(s"$out/fact_trips")
    val (tables, aggregates, analytics) = Pipeline.derive(spark, factOnDisk, zones)

    timed("aggregates") {
      Retry.withRetries(2, "build-aggregates") {
        aggregates.foreach { case (name, df) =>
          Aggregations.write(df, s"$out/$name")
        }
      }
    }
    // Dims and analytics results write WITHOUT a coalesce(1) funnel: dims
    // are bounded (3–1826 rows, naturally few partitions) but analytics
    // outputs grow with the data span (q13 is months × companies), and a
    // single-task write serializes the whole frame through one core. Plain
    // parallel writes let each result keep its natural parallelism.
    timed("dims") {
      Seq(
        "dim_zones" -> tables.dimZones,
        "dim_date" -> tables.dimDate,
        "dim_time" -> tables.dimTime,
        "dim_service" -> tables.dimService,
        "dim_hvfhs_company" -> tables.dimHvfhsCompany)
        .foreach { case (name, df) =>
          df.write.mode("overwrite").parquet(s"$out/$name")
        }
    }
    timed("analytics") {
      analytics.foreach { case (name, mk) =>
        mk().write.mode("overwrite").parquet(s"$out/analytics/$name")
      }
    }
    timed("finalize") {
      IngestionLog.write(IngestionLog.build(spark, logEntries.toSeq), s"$out/ingestion_log")
    }
    opts.get("timings").foreach(writeTimings(_, timings, nFact))
    println(s"[graft] pipeline complete: $nFact fact rows -> $out")
  }

  /** Stage timings as one JSON object. Locale.ROOT: the f-interpolator uses
    * the JVM default locale, and a comma-decimal locale would emit invalid
    * JSON (ADVICE r11). */
  private def writeTimings(path: String,
      timings: scala.collection.mutable.LinkedHashMap[String, Double],
      nFact: Long): Unit = {
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val suffix = s""", "total": ${f3(timings.values.sum)}, "fact_rows": $nFact}"""
    val json = timings.map { case (k, v) => s""""$k": ${f3(v)}""" }
      .mkString("{", ", ", suffix)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  /** `run-incremental` subcommand — the 100 TB operating mode (SURVEY
    * §7.4.10): fold NEW raw files into an EXISTING `--out` warehouse
    * previously written by the full pipeline, touching only the state the
    * new rows affect.
    *
    *   runMain graft.tlc.Cli run-incremental --yellow p1 --green p2
    *     --hvfhv p3 --zones p4 --out existingWarehouse [--timings t.json]
    *
    * Stages (each timed like runPipeline, so BENCH_E2E can put the
    * incremental episode next to the truncate-rebuild of the same state):
    *
    *   - load/quality: the same drift-tolerant loaders + eager quality
    *     checks, over the new files only.
    *   - standardize: IDEMPOTENT by lineage — an anti-join on source_file
    *     against the warehouse fact (reference loader.py's already-loaded
    *     check, S6) drops rows from files already folded in, so replaying
    *     a file is a no-op; then ONLY the affected pickup_date partitions
    *     are rewritten (dynamic partition overwrite; pre-existing rows of
    *     those dates ride along via a localCheckpoint, which also severs
    *     the read-from-the-overwritten-path dependency).
    *   - aggregates: Aggregations.rebuildDates recomputes just the
    *     affected dates' partitions of every date-grained aggregate —
    *     partition pruning keeps each rebuild's fact scan to those dates;
    *     the one period-grained table (congestion_fee_impact, no date
    *     column) and the bounded dims rebuild in full.
    *
    *   - analytics: the three percentile-surface queries (q04/q11/q13 —
    *     the QuantileRefine family) re-run over the FULL folded warehouse,
    *     each sub-timed (r13 verdict item 7: the stage-floor amortization
    *     claim, measured where it is supposed to pay). They are query-time
    *     work, not state maintenance — BENCH_E2E's maintenance_total
    *     excludes the analytics stage on both sides, as in r12.
    *
    * The affected-date list comes to the driver (calendar-bounded — same
    * contract as dd7's convergence scalar, never row data). */
  private[graft] def runIncremental(spark: SparkSession, opts: Map[String, String]): Unit = {
    import org.apache.spark.sql.functions.col
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[T](stage: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      timings(stage) = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[timing] stage=$stage seconds=${timings(stage)}%.3f")
      r
    }
    val out = opts("out")
    val logEntries = scala.collection.mutable.ArrayBuffer.empty[IngestionLog.Entry]
    def loadRaw(key: String, schema: org.apache.spark.sql.types.StructType): DataFrame = {
      val path = opts(key)
      val t0 = System.nanoTime()
      val (df, drift) = RawLoader.load(spark, path, schema,
        new java.io.File(path).getName)
      if (drift.hasDrift) System.err.println(s"[drift] $key: $drift")
      val (rows, _, sha) = RawLoader.validate(spark, path)
      logEntries += IngestionLog.Entry(
        sequenceId = logEntries.size + 1L,
        sourceFile = new java.io.File(path).getName,
        serviceType = key,
        rowCount = rows,
        durationSeconds = (System.nanoTime() - t0) / 1e9,
        status = "completed",
        errorMessage = None,
        fileSha256 = sha,
        loadedAt = new java.sql.Timestamp(System.currentTimeMillis()))
      df
    }
    val zonesPath = opts("zones")
    val zones =
      if (zonesPath.endsWith(".csv"))
        spark.read.option("header", true).option("inferSchema", true).csv(zonesPath)
      else spark.read.parquet(zonesPath)

    val (rawY, rawG, rawH) = timed("load") {(
      Retry.withRetries(2, "load-yellow")(loadRaw("yellow", Schemas.rawYellow)),
      Retry.withRetries(2, "load-green")(loadRaw("green", Schemas.rawGreen)),
      Retry.withRetries(2, "load-hvfhv")(loadRaw("hvfhv", Schemas.rawHvfhv)))}
    val result = timed("quality") { Pipeline.run(spark, rawY, rawG, rawH, zones) }

    val existing = spark.read.parquet(s"$out/fact_trips")
    val (nNew, dates) = timed("standardize") {
      val loadedFiles = existing.select("source_file").distinct()
      val newFact = result.fact
        .join(loadedFiles, Seq("source_file"), "left_anti")
        .localCheckpoint() // consumed by the date probe AND the write
      val dates = newFact.select("pickup_date").distinct()
        .collect().map(_.getDate(0)).toSeq.sortBy(_.getTime)
      if (dates.nonEmpty) {
        // pre-existing rows of the affected dates ride along; checkpointed
        // so the dynamic overwrite never reads the path it rewrites
        val oldRows = Aggregations.filterDates(existing, dates).localCheckpoint()
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try Retry.withRetries(2, "transform-to-fact-incremental") {
          oldRows.unionByName(newFact)
            .write.mode("overwrite").partitionBy("pickup_date")
            .parquet(s"$out/fact_trips")
        } finally prev match {
          case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
          case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        }
      }
      (newFact.count(), dates)
    }
    timed("aggregates") {
      if (dates.nonEmpty) {
        val factAll = spark.read.parquet(s"$out/fact_trips")
        Retry.withRetries(2, "build-aggregates-incremental") {
          Seq[(String, DataFrame => DataFrame)](
            "agg_pricing_by_zone_hour" -> Aggregations.pricingByZoneHour,
            "agg_hvfhv_take_rates" -> Aggregations.hvfhvTakeRates,
            "agg_market_share" -> Aggregations.marketShare,
            "agg_daily_summary" -> Aggregations.dailySummary)
            .foreach { case (name, build) =>
              Aggregations.rebuildDates(factAll, build, dates, s"$out/$name")
            }
          // period-grained (no date column): full rebuild is the contract
          Aggregations.write(
            Aggregations.congestionFeeImpact(factAll), s"$out/agg_congestion_fee_impact")
        }
      }
    }
    val derived =
      if (dates.nonEmpty)
        Some(Pipeline.derive(spark, spark.read.parquet(s"$out/fact_trips"), zones))
      else None
    timed("dims") {
      derived.foreach { case (tables, _, _) =>
        Seq(
          "dim_zones" -> tables.dimZones,
          "dim_date" -> tables.dimDate,
          "dim_time" -> tables.dimTime,
          "dim_service" -> tables.dimService,
          "dim_hvfhs_company" -> tables.dimHvfhsCompany)
          .foreach { case (name, df) =>
            df.write.mode("overwrite").parquet(s"$out/$name")
          }
      }
    }
    // The QuantileRefine-family analytics over the FULL warehouse (r13
    // verdict item 7): q04/q11/q13 are the percentile-surface queries the
    // r12 perf-weak adjudication said amortize their stage floor once real
    // work dominates — running them here, over the whole 16M-row fact the
    // month was folded into, measures that claim inside the e2e episode.
    // Each query is sub-timed so BENCH_E2E can show the family's share.
    timed("analytics") {
      derived.foreach { case (tables, _, _) =>
        val analytics = Analytics.all(tables)
        Seq("04_hvfhv_platform_economics", "11_uber_lyft_vs_taxi_pricing",
          "13_hvfhv_take_rate_variance").foreach { name =>
          val t0 = System.nanoTime()
          analytics(name)().write.mode("overwrite").parquet(s"$out/analytics/$name")
          timings(s"analytics_$name") = (System.nanoTime() - t0) / 1e9
          System.err.println(
            f"[timing] stage=analytics_$name seconds=${timings(s"analytics_$name")}%.3f")
        }
      }
    }
    timed("finalize") {
      // append-only audit log; sequence continues from the existing tail.
      // max(load_sequence_id), not count() (ADVICE r12): a log with gaps or
      // a partially-written append would otherwise mint duplicate sequence
      // ids, breaking the append-only audit invariant.
      val base = try spark.read.parquet(s"$out/ingestion_log")
        .agg(org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.max("load_sequence_id"),
          org.apache.spark.sql.functions.lit(0L)))
        .first().getLong(0)
        catch { case _: Throwable => 0L }
      val entries = logEntries.toSeq.map(e => e.copy(sequenceId = e.sequenceId + base))
      IngestionLog.build(spark, entries)
        .coalesce(1).write.mode("append").parquet(s"$out/ingestion_log")
    }
    opts.get("timings").foreach(writeTimings(_, timings, nNew))
    println(s"[graft] incremental fold: $nNew new fact rows across " +
      s"${dates.size} dates -> $out")
  }
}
