package graft.tlc

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Driver-side raw-file downloader (reference: src/ingestion/downloader.py
  * TripDataDownloader, downloader.py:43–291). This is deliberately NOT a
  * cluster operator — fetching source files is driver/edge I/O that happens
  * before any DataFrame exists (SURVEY.md §2.1 S4) — but it completes the
  * reference's e2e lifecycle: download → validate → load → transform.
  *
  * Behavior mirrored from the reference:
  *   - skip-if-exists short-circuits with the file's size + SHA256
  *     (downloader.py:57–72);
  *   - HTTP 404 returns `not_found` immediately, no retry
  *     (downloader.py:111–123);
  *   - other HTTP errors and network errors retry with exponential backoff
  *     2^attempt seconds up to `retryAttempts` (downloader.py:124–153);
  *   - a month-range fan-out downloads zones + services×months under a
  *     concurrency bound and reports summary counts (downloader.py:213–291).
  *
  * The transport is injectable (`Fetcher`) so the orchestration logic is
  * unit-testable without egress; `HttpFetcher` is the production transport
  * on java.net.http (JDK-only, follows redirects like the reference's
  * httpx `follow_redirects=True`).
  */
object Downloader {

  /** Transport outcome, separated so retry policy can distinguish the
    * no-retry case (404) from retryable HTTP/network failures. */
  sealed trait Fetched
  final case class Body(bytes: Array[Byte]) extends Fetched
  final case class HttpError(code: Int, message: String) extends Fetched
  final case class NetworkError(message: String) extends Fetched

  trait Fetcher { def fetch(url: String): Fetched }

  /** Production transport. Not exercised in tests (zero-egress CI); the
    * request shape is the whole implementation, so the unit surface is the
    * retry/skip orchestration around it. */
  final class HttpFetcher(timeoutSec: Long = 300L) extends Fetcher {
    private lazy val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSec))
      .build()

    def fetch(url: String): Fetched =
      try {
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofSeconds(timeoutSec))
          .GET().build()
        val resp = client.send(
          req, java.net.http.HttpResponse.BodyHandlers.ofByteArray())
        if (resp.statusCode() / 100 == 2) Body(resp.body())
        else HttpError(resp.statusCode(), s"HTTP ${resp.statusCode()}")
      } catch {
        case e: Exception => NetworkError(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
  }

  final case class FetchResult(
    url: String,
    destPath: String,
    fileSize: Long,
    checksum: Option[String],
    status: String,          // success | skipped | not_found | failed
    attempts: Int,
    error: Option[String])

  /** Download one file with skip-if-exists + retry (downloader.py:43–165). */
  def downloadFile(
      fetcher: Fetcher,
      url: String,
      dest: Path,
      skipIfExists: Boolean = true,
      retryAttempts: Int = 3,
      sleepMs: Long => Unit = Thread.sleep): FetchResult = {

    if (skipIfExists && Files.exists(dest)) {
      return FetchResult(url, dest.toString, Files.size(dest),
        Some(RawLoader.sha256(dest.toString)), "skipped", 0, None)
    }

    var lastError = ""
    var attempt = 1
    while (attempt <= retryAttempts) {
      fetcher.fetch(url) match {
        case Body(bytes) =>
          Option(dest.getParent).foreach(Files.createDirectories(_))
          Files.write(dest, bytes)
          return FetchResult(url, dest.toString, bytes.length.toLong,
            Some(RawLoader.sha256(dest.toString)), "success", attempt, None)
        case HttpError(404, _) =>
          return FetchResult(url, dest.toString, 0L, None, "not_found",
            attempt, Some("HTTP 404: File not found"))
        case HttpError(code, msg) =>
          lastError = s"HTTP $code: $msg"
          if (attempt < retryAttempts) sleepMs(1000L << attempt)
        case NetworkError(msg) =>
          lastError = s"Network error: $msg"
          if (attempt < retryAttempts) sleepMs(1000L << attempt)
      }
      attempt += 1
    }
    FetchResult(url, dest.toString, 0L, None, "failed",
      retryAttempts, Some(lastError))
  }

  /** Public NYC TLC endpoints (reference config/pipeline_config.yaml:3–19). */
  val BaseUrl = "https://d37ci6vzurychx.cloudfront.net/trip-data"
  val ZonesUrl = "https://d37ci6vzurychx.cloudfront.net/misc/taxi_zone_lookup.csv"

  /** hvfhv is published under the `fhvhv` filename (pipeline_config.yaml:15). */
  def fileName(service: String, year: Int, month: Int): String = {
    val svc = if (service == "hvfhv") "fhvhv" else service
    f"${svc}_tripdata_$year%04d-$month%02d.parquet"
  }

  def monthUrl(service: String, year: Int, month: Int): String =
    s"$BaseUrl/${fileName(service, year, month)}"

  /** Inclusive month range, e.g. (2024,12)→(2025,2) = three months
    * (reference utils.generate_month_range). */
  def monthRange(startYear: Int, startMonth: Int,
                 endYear: Int, endMonth: Int): Seq[(Int, Int)] =
    (startYear * 12 + startMonth - 1 to endYear * 12 + endMonth - 1)
      .map(k => (k / 12, k % 12 + 1))

  /** Fan out zones + services×months under a concurrency bound
    * (downloader.py:213–263's semaphore-bounded gather). */
  def downloadRange(
      fetcher: Fetcher,
      destDir: String,
      startYear: Int, startMonth: Int, endYear: Int, endMonth: Int,
      services: Seq[String] = Seq("yellow", "green", "hvfhv"),
      maxConcurrent: Int = 10,
      skipIfExists: Boolean = true,
      retryAttempts: Int = 3,
      sleepMs: Long => Unit = Thread.sleep): Seq[FetchResult] = {

    val dir = Paths.get(destDir)
    val jobs: Seq[(String, Path)] =
      (ZonesUrl, dir.resolve("taxi_zone_lookup.csv")) +:
      (for {
        service <- services
        (y, m) <- monthRange(startYear, startMonth, endYear, endMonth)
      } yield (monthUrl(service, y, m), dir.resolve(fileName(service, y, m))))

    val pool = Executors.newFixedThreadPool(math.max(1, maxConcurrent))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = jobs.map { case (url, dest) =>
        Future(downloadFile(fetcher, url, dest, skipIfExists, retryAttempts, sleepMs))
      }
      Await.result(Future.sequence(fs), Duration.Inf)
    } finally pool.shutdown()
  }

  /** Summary counts, the reference's post-gather report (downloader.py:276–289). */
  def summarize(results: Seq[FetchResult]): Map[String, Long] =
    Map(
      "total" -> results.size.toLong,
      "success" -> results.count(_.status == "success").toLong,
      "skipped" -> results.count(_.status == "skipped").toLong,
      "failed" -> results.count(_.status == "failed").toLong,
      "not_found" -> results.count(_.status == "not_found").toLong,
      "total_bytes" -> results.map(_.fileSize).sum)
}
