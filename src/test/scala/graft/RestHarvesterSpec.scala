package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.RestHarvester
import graft.sources.RestHarvester._

/** S8 harvest policy against a fake fetcher: pagination, 429 backoff,
  * bisect-on-500 single-record skip, empty-page termination. */
class RestHarvesterSpec extends AnyFunSuite {

  private def corpus(n: Int): Vector[String] = (0 until n).map(i => s"rec$i").toVector

  private def pagedFetch(data: Vector[String],
                         poisoned: Set[Int] = Set.empty,
                         rateLimitedCalls: Int = 0): (Long, Int) => FetchResult = {
    var remaining429 = rateLimitedCalls
    (offset: Long, limit: Int) => {
      if (remaining429 > 0) { remaining429 -= 1; RateLimited }
      else {
        val lo = offset.toInt
        val hi = math.min(lo + limit, data.length)
        if (lo >= data.length) Page(Vector.empty)
        else if ((lo until hi).exists(poisoned.contains))
          if (hi - lo == 1) ServerError
          else ServerError
        else Page(data.slice(lo, hi))
      }
    }
  }

  test("plain pagination terminates on empty page, keeps order") {
    val data = corpus(1234)
    val (got, stats) = harvest(pagedFetch(data), limit = 500, backoff = () => ())
    assert(got == data)
    assert(stats.pages == 4) // 500+500+234+empty
    assert(stats.skipped == 0 && stats.bisections == 0)
  }

  test("429s back off and retry without losing data") {
    val data = corpus(600)
    var backoffs = 0
    val (got, stats) = harvest(pagedFetch(data, rateLimitedCalls = 3),
      limit = 500, backoff = () => backoffs += 1)
    assert(got == data)
    assert(stats.retries == 3 && backoffs == 3)
  }

  test("poisoned record is bisected away; only that record lost") {
    val data = corpus(1000)
    val (got, stats) = harvest(pagedFetch(data, poisoned = Set(377)),
      limit = 500, backoff = () => ())
    assert(got == data.patch(377, Nil, 1))
    assert(stats.skipped == 1)
    assert(stats.bisections > 0 && stats.bisections <= 10, "log2(limit) bisections")
  }

  test("fully poisoned window advances instead of terminating the harvest") {
    val data = corpus(1500)
    val (got, stats) = harvest(pagedFetch(data, poisoned = (500 until 1000).toSet),
      limit = 500, backoff = () => ())
    assert(got == data.take(500) ++ data.drop(1000),
      "records after an all-poisoned window must still be harvested")
    assert(stats.skipped == 500)
  }

  test("persistent rate limiting eventually throws") {
    val data = corpus(10)
    assertThrows[IllegalStateException] {
      harvest(pagedFetch(data, rateLimitedCalls = 1000),
        limit = 5, backoff = () => (), maxRetries = 3)
    }
  }

  test("ml metrics report matches the reference's txt format") {
    val txt = graft.ml.DurationPipeline.formatMetrics("Random Forest",
      Map("rmse" -> 7.75, "mae" -> 1.35, "mse" -> 60.09, "r2" -> 0.021))
    assert(txt.contains("Random Forest Performance Metrics:"))
    assert(txt.contains("RMSE: 7.75") && txt.contains("R2: 0.021"))
  }
}
