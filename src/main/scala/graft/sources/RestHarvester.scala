package graft.sources

import scala.annotation.tailrec

/** Driver-side REST harvest logic (SURVEY.md §2.1 S8) — the reference's
  * `api_event_collector.py:6-76` ingestion semantics, re-expressed as a
  * pure, pluggable pager so the policy is unit-testable without a
  * network (this environment is zero-egress; in production the `fetch`
  * function wraps an HTTP client).
  *
  * Reference behaviors preserved:
  *  - limit/offset pagination, terminating on an empty page;
  *  - 429 rate-limit → fixed backoff then retry (`:9-39`);
  *  - 500 on a window → bisect the window and skip only the poisoned
  *    half-of-one (`:41-63`), so one bad record costs log(limit) calls,
  *    not the harvest;
  *  - page results appended in order.
  *
  * This is a driver-side utility, not a Spark operator: the harvest
  * lands raw JSON to storage and the engine ingests it with
  * [[graft.ops.Ingest]] (matching the reference's split).
  */
object RestHarvester {

  sealed trait FetchResult
  /** Page fetched; `records` may be empty (terminates the harvest). */
  case class Page(records: Vector[String]) extends FetchResult
  /** HTTP 429 — back off and retry. */
  case object RateLimited extends FetchResult
  /** HTTP 5xx — bisect the window to isolate the poisoned record. */
  case object ServerError extends FetchResult

  /** Outcome counters for observability (the reference printed these). */
  case class HarvestStats(pages: Int, retries: Int, bisections: Int, skipped: Int)

  /** Harvest all records via limit/offset paging.
    *
    * @param fetch    (offset, limit) => FetchResult
    * @param limit    page size (reference used 500)
    * @param backoff  invoked on 429 before retry (injectable for tests;
    *                 reference slept 10 s)
    * @param maxRetries consecutive 429 retries before giving up a page
    */
  def harvest(fetch: (Long, Int) => FetchResult, limit: Int = 500,
              backoff: () => Unit = () => Thread.sleep(10000),
              maxRetries: Int = 10): (Vector[String], HarvestStats) = {
    var out = Vector.empty[String]
    var offset = 0L
    var pages = 0; var retries = 0; var bisections = 0; var skipped = 0

    /** Fetch [offset, offset+len) with bisect-on-500: returns records,
      * skipping (only) unfetchable single records. */
    def fetchWindow(off: Long, len: Int, retriesLeft: Int): Vector[String] =
      fetch(off, len) match {
        case Page(rs) => rs
        case RateLimited if retriesLeft > 0 =>
          retries += 1; backoff(); fetchWindow(off, len, retriesLeft - 1)
        case RateLimited =>
          throw new IllegalStateException(s"rate-limited $maxRetries times at offset $off")
        case ServerError if len == 1 =>
          skipped += 1; Vector.empty // single poisoned record: skip it
        case ServerError =>
          bisections += 1
          val half = len / 2
          fetchWindow(off, half, maxRetries) ++
            fetchWindow(off + half, len - half, maxRetries)
      }

    @tailrec def loop(): Unit = {
      val skippedBefore = skipped
      val page = fetchWindow(offset, limit, maxRetries)
      pages += 1
      // Terminate only on a genuinely empty page FROM THE SERVER. A
      // window whose records were all poisoned (every one skipped via
      // bisection) also comes back empty, but the harvest must advance
      // past it — terminating there would silently drop the remainder,
      // breaking the "skip only the poisoned record" contract.
      if (page.nonEmpty || skipped > skippedBefore) {
        out ++= page
        offset += limit
        loop()
      }
    }
    loop()
    (out, HarvestStats(pages, retries, bisections, skipped))
  }
}
