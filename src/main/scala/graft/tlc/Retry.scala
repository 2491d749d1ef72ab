package graft.tlc

/** Stage retry orchestration (reference: src/orchestration/flows.py attaches
  * Prefect `retries=N` per task — download 3, load/transform/aggregate 2,
  * quality-check 1). Spark stages are lazy lineage, so retries wrap the
  * ACTIONS (loads and sink writes), not the plan construction: re-running a
  * failed write re-executes the deterministic lineage, which is exactly the
  * reference's re-run-the-task semantics. */
object Retry {

  final class RetriesExhausted(label: String, attempts: Int, cause: Throwable)
    extends RuntimeException(
      s"stage '$label' failed after $attempts attempt(s): ${cause.getMessage}", cause)

  /** Run `stage`, retrying up to `retries` extra times on any exception,
    * sleeping 2^attempt seconds between attempts (the downloader's backoff
    * curve, downloader.py:127). `retries = 2` means up to 3 executions. */
  def withRetries[A](
      retries: Int,
      label: String,
      sleepMs: Long => Unit = Thread.sleep,
      onRetry: (String, Int, Throwable) => Unit =
        (l, a, e) => System.err.println(s"[graft] stage '$l' attempt $a failed: ${e.getMessage}"))
      (stage: => A): A = {
    var attempt = 1
    while (true) {
      try return stage
      catch {
        case e: Exception =>
          if (attempt > retries) throw new RetriesExhausted(label, attempt, e)
          onRetry(label, attempt, e)
          sleepMs(1000L << attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
