package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-term mining with BOUNDED memory and BOUNDED shuffle — the
  * heavy-hitters primitive a corpus pipeline uses for stop-list
  * construction, vocabulary pruning, and boilerplate discovery.
  *
  * Why not `groupBy(token).count.orderBy.limit(k)`? That shuffles the
  * ENTIRE vocabulary. For web-scale n-grams the distinct-key count is
  * itself corpus-scale (most n-grams are singletons), so the "simple"
  * plan shuffles ~as many aggregate rows as there are input rows. The
  * classic fix is a mergeable bounded summary:
  *
  *  1. Per partition, a Misra–Gries summary of capacity `m` (an
  *     O(m)-size map; when full, all counters decay by the evictee's
  *     weight). Survivors are CANDIDATES. Guarantee (by the standard
  *     averaging argument, applied across partitions): any token with
  *     global frequency > N/m survives in at least one partition —
  *     if it were evicted everywhere, each partition-local frequency
  *     would be ≤ N_p/m, and summing gives freq ≤ N/m.
  *  2. Exact counts for candidates only: one hash agg over the token
  *     stream semi-joined (broadcast) against the candidate set — the
  *     shuffle carries at most |candidates| ≤ m × partitions partial
  *     rows instead of the vocabulary.
  *  3. Top-k of the exact candidate counts (deterministic: count desc,
  *     token asc), plus a per-row `guaranteed_exact`: a row whose count
  *     clears the N/m survival bound provably holds its rank (every
  *     token that could out-rank it also clears the bound and is
  *     therefore a counted candidate). If the k-th row clears it, the
  *     whole top-k equals the exact answer; otherwise widen m.
  *
  * The per-partition summary is genuine imperative per-partition state
  * (a decaying bounded map) — one of the few places `mapPartitions`
  * is the right tool rather than a missed declarative form.
  */
object HeavyHitters {

  /** Misra–Gries over one iterator: returns the surviving candidates.
    * Capacity `m`: at most m live counters at any point. */
  private[graft] def misraGries(tokens: Iterator[String], m: Int): Iterator[String] = {
    val counters = new java.util.HashMap[String, Long](m * 2)
    tokens.foreach { t =>
      if (counters.containsKey(t)) {
        counters.put(t, counters.get(t) + 1L)
      } else if (counters.size < m) {
        counters.put(t, 1L)
      } else {
        // decrement-all step: amortized O(1) per input via the min trick
        // is overkill at m ≤ 64k; a linear sweep per eviction keeps the
        // code obvious and the cost O(input × evictions/m).
        val it = counters.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counters.keySet().asScala.iterator
  }

  /** Exact-when-guaranteed top-k tokens of `documents(textCol)`.
    * Output: (token, cnt, rn, guaranteed_exact), ordered by rn. */
  def topKTokens(documents: DataFrame, k: Int, capacity: Int = 4096,
                 textCol: String = "text"): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val tokens = documents
      .select(explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) > 0)
    // Stage 1: bounded summaries → small candidate set. distinct() is a
    // shuffle of ≤ m × partitions short strings — negligible.
    val candidates = tokens.as[String]
      .mapPartitions(it => misraGries(it, capacity))
      .toDF("token").distinct()
    // Stage 2+3: exact counts for candidates only, then top-k. N (total
    // token count) rides along via a literal-free cross join of one row.
    val total = tokens.groupBy().agg(count(lit(1)).as("n_total"))
    val counted = tokens.join(broadcast(candidates), "token")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    graft.plans.TopK.topKPerKey(counted, Seq.empty,
        Seq(("cnt", false), ("token", true)), k)
      .crossJoin(broadcast(total))
      .select(col("token"), col("cnt"), col("rn"),
        (col("cnt") * lit(capacity.toLong) > col("n_total")).as("guaranteed_exact"))
      .orderBy(col("rn"))
  }
}
