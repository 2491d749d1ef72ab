package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

import graft.tlc.{Downloader, Retry}
import graft.tlc.Downloader.{Body, Fetched, HttpError, NetworkError}

/** Downloader/Retry orchestration (reference downloader.py:43–291,
  * flows.py task retries) driven by in-memory transports — zero egress. */
class DownloaderSpec extends AnyFunSuite {

  private def tmpDir() = Files.createTempDirectory("graft_dl").toString

  private class ScriptedFetcher(script: Fetched*) extends Downloader.Fetcher {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    private val it = script.iterator
    def fetch(url: String): Fetched = { calls += url; it.next() }
  }

  test("success writes the body and records size + sha256") {
    val f = new ScriptedFetcher(Body("hello tlc".getBytes))
    val dest = Paths.get(tmpDir(), "y.parquet")
    val r = Downloader.downloadFile(f, "u", dest, sleepMs = _ => ())
    assert(r.status == "success" && r.attempts == 1)
    assert(r.fileSize == 9L && Files.exists(dest))
    assert(r.checksum.exists(_.length == 64))
  }

  test("skip-if-exists short-circuits without fetching") {
    val dest = Paths.get(tmpDir(), "y.parquet")
    Files.write(dest, "already here".getBytes)
    val f = new ScriptedFetcher()
    val r = Downloader.downloadFile(f, "u", dest)
    assert(r.status == "skipped" && f.calls.isEmpty)
    assert(r.fileSize == 12L && r.checksum.nonEmpty)
  }

  test("transient errors retry with exponential backoff, then succeed") {
    val f = new ScriptedFetcher(
      NetworkError("reset"), HttpError(503, "unavailable"), Body("ok".getBytes))
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val r = Downloader.downloadFile(f, "u", Paths.get(tmpDir(), "g.parquet"),
      retryAttempts = 3, sleepMs = sleeps += _)
    assert(r.status == "success" && r.attempts == 3)
    assert(sleeps.toSeq == Seq(2000L, 4000L), "2^attempt seconds backoff")
  }

  test("404 returns not_found immediately — no retries, no file") {
    val f = new ScriptedFetcher(HttpError(404, "nope"))
    val dest = Paths.get(tmpDir(), "h.parquet")
    val r = Downloader.downloadFile(f, "u", dest, sleepMs = _ => ())
    assert(r.status == "not_found" && f.calls.size == 1)
    assert(!Files.exists(dest) && r.error.exists(_.contains("404")))
  }

  test("exhausted retries report failed with the last error") {
    val f = new ScriptedFetcher(
      NetworkError("a"), NetworkError("b"), HttpError(500, "c"))
    val r = Downloader.downloadFile(f, "u", Paths.get(tmpDir(), "x.parquet"),
      retryAttempts = 3, sleepMs = _ => ())
    assert(r.status == "failed" && r.attempts == 3)
    assert(r.error.exists(_.contains("HTTP 500")))
  }

  test("range fan-out covers zones + services x months; summary adds up") {
    val months = Downloader.monthRange(2024, 12, 2025, 2)
    assert(months == Seq((2024, 12), (2025, 1), (2025, 2)))
    val n = 2 * months.size + 1 // two services x three months + zones
    val body: Fetched = Body("data".getBytes)
    val f = new Downloader.Fetcher {
      val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      def fetch(url: String): Fetched = { calls.add(url); body }
    }
    val dir = tmpDir()
    val rs = Downloader.downloadRange(f, dir, 2024, 12, 2025, 2,
      services = Seq("yellow", "hvfhv"), maxConcurrent = 4, sleepMs = _ => ())
    assert(rs.size == n && rs.forall(_.status == "success"))
    // hvfhv is published under the fhvhv filename; zones is the lookup csv.
    assert(Files.exists(Paths.get(dir, "fhvhv_tripdata_2025-01.parquet")))
    assert(Files.exists(Paths.get(dir, "taxi_zone_lookup.csv")))
    val s = Downloader.summarize(rs)
    assert(s("total") == n && s("success") == n && s("total_bytes") == 4L * n)
    // A re-run skips everything.
    val rs2 = Downloader.downloadRange(f, dir, 2024, 12, 2025, 2,
      services = Seq("yellow", "hvfhv"), sleepMs = _ => ())
    assert(Downloader.summarize(rs2)("skipped") == n)
  }

  test("month urls follow the public TLC naming") {
    assert(Downloader.monthUrl("yellow", 2025, 1)
      == s"${Downloader.BaseUrl}/yellow_tripdata_2025-01.parquet")
    assert(Downloader.monthUrl("hvfhv", 2024, 12)
      == s"${Downloader.BaseUrl}/fhvhv_tripdata_2024-12.parquet")
  }

  test("Retry.withRetries re-runs a failing stage, then surfaces the cause") {
    var runs = 0
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Retry.withRetries(2, "load", sleepMs = sleeps += _,
      onRetry = (_, _, _) => ()) {
      runs += 1
      if (runs < 3) sys.error(s"boom $runs")
      "ok"
    }
    assert(out == "ok" && runs == 3 && sleeps.toSeq == Seq(2000L, 4000L))

    runs = 0
    val e = intercept[Retry.RetriesExhausted] {
      Retry.withRetries(1, "agg", sleepMs = _ => (), onRetry = (_, _, _) => ()) {
        runs += 1; sys.error("always")
      }
    }
    assert(runs == 2 && e.getMessage.contains("'agg'"))
  }
}
