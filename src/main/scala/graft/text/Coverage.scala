package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus coverage statistics off the FREQUENCY-OF-FREQUENCIES table —
  * the vocabulary-planning numbers an LLM-data pipeline reads before
  * committing to a tokenizer budget or a crawl expansion (the
  * reference's text surface stops at per-document stats; these are the
  * corpus-level laws):
  *
  *  - Good–Turing unseen mass: the probability the NEXT token drawn is
  *    a type never seen — n₁/N, the classic singleton estimator. High
  *    unseen mass says the crawl hasn't saturated the domain.
  *  - Chao1 richness: V + n₁(n₁−1)/(2(n₂+1)) (bias-corrected form —
  *    defined even when no doubletons exist), the lower-bound estimate
  *    of the TRUE vocabulary size including unseen types.
  *  - Inverse Simpson diversity: N(N−1)/Σf(f−1) — the "effective
  *    vocabulary size" under pair-collision probability; crashes when
  *    a few tokens dominate (boilerplate, templating).
  *  - Vocabulary budget coverage: the smallest top-frequency vocabulary
  *    covering p% of corpus token mass — the word-level answer to "how
  *    big must the tokenizer vocab be".
  *
  * Scale shape shared by the whole family: corpus → vocabulary (ONE
  * map-side-combined hash agg over exploded tokens, the [[TextOps
  * .vocabulary]] reduction) → frequency-of-frequencies (a SECOND hash
  * agg, output bounded by the number of DISTINCT FREQUENCIES ≤
  * O(√(2N)) — sum of distinct positive integers ≤ N) → constant-size
  * arithmetic. Nothing after the first agg is corpus-sized, and even
  * the coverage sweep needs no token-level ordering: every token in a
  * frequency class contributes the same mass, so the greedy prefix law
  * resolves inside the boundary CLASS with pure integer arithmetic
  * (k = ⌈remaining/f⌉ whole tokens), the q212 tie-class idea taken to
  * its limit — the ordered structure is an arithmetic consequence, not
  * a sort.
  *
  * Exactness: every graded column is BIGINT under floor division.
  * N(N−1) and Σf(f−1) stay in-range to N ≈ 3·10⁹ tokens; past that
  * [[simpsonDiversity]] AUTOMATICALLY switches (logged loudly) to
  * rendering the pair products in double — the counts themselves
  * (n_tokens, vocab, n1, singleton_pm) never overflow and stay exact
  * BIGINT on both routes; only sum_ff1/inv_simpson degrade to
  * DoubleType past the envelope (the [[graft.quality.RankCorr]]
  * past-envelope discipline).
  */
object Coverage {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** N(N−1) ≤ Long.MaxValue boundary: the largest corpus token count
    * whose pair products (N(N−1) and the dominated Σf(f−1) ≤ N(N−1))
    * are safe in BIGINT. */
  val ExactEnvelopeTokens = 3000000000L

  /** (cnt, n_f): the frequency-of-frequencies reduction — n_f types
    * occur exactly cnt times. Two hash aggs from the raw corpus; the
    * result is bounded by the count of distinct frequencies. */
  def freqOfFreq(documents: DataFrame): DataFrame =
    freqOfFreqFromVocab(
      documents.select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt")))

  /** The FoF reduction from an existing (token, cnt) vocabulary table —
    * shared by the batch path and the streaming maintained-vocabulary
    * sink (whose state IS such a table, additively merged). */
  def freqOfFreqFromVocab(vocab: DataFrame): DataFrame =
    vocab.groupBy(col("cnt")).agg(count(lit(1)).as("n_f"))

  /** One exact-integer row: (n_tokens, vocab, n1, n2, unseen_ppm,
    * chao1). unseen_ppm = n₁·10⁶ div N (Good–Turing); chao1 = V +
    * n₁(n₁−1) div (2(n₂+1)) (bias-corrected — total when n₂ = 0). */
  def goodTuring(documents: DataFrame): DataFrame =
    goodTuringFromFoF(freqOfFreq(documents))

  /** The Good–Turing/Chao1 tail off a prebuilt FoF table. */
  def goodTuringFromFoF(fof: DataFrame): DataFrame =
    fof
      .agg(
        sum(col("cnt") * col("n_f")).as("n_tokens"),
        sum(col("n_f")).as("vocab"),
        coalesce(sum(when(col("cnt") === 1L, col("n_f"))), lit(0L)).as("n1"),
        coalesce(sum(when(col("cnt") === 2L, col("n_f"))), lit(0L)).as("n2"))
      .select(col("n_tokens"), col("vocab"), col("n1"), col("n2"),
        expr("(n1 * 1000000) div n_tokens").as("unseen_ppm"),
        expr("vocab + (n1 * (n1 - 1)) div (2 * (n2 + 1))").as("chao1"))

  /** One exact-integer row: (n_tokens, vocab, sum_ff1, inv_simpson,
    * singleton_pm). sum_ff1 = Σ f(f−1)·n_f is the ordered-pair
    * collision count; inv_simpson = N(N−1) div sum_ff1 is the
    * effective vocabulary size (NULL when no token repeats);
    * singleton_pm = n₁·1000 div V — the per-mille of vocabulary that
    * is hapax legomena, the Heaps-law tail indicator.
    *
    * Exact to N ≈ 3·10⁹ tokens ([[ExactEnvelopeTokens]] — the pair
    * products, see object scaladoc); past it the pair products switch
    * to double AUTOMATICALLY (logged loudly): sum_ff1/inv_simpson
    * become DoubleType while every count column stays exact BIGINT.
    * The route is decided by one tiny agg action over the CHECKPOINTED
    * FoF table (bounded at O(√2N) rows), so the corpus is still
    * scanned exactly once. */
  def simpsonDiversity(documents: DataFrame): DataFrame =
    simpsonDiversity(documents, ExactEnvelopeTokens)

  /** Envelope-parameterized entry (test seam: a lowered envelope forces
    * the auto-switch through the PUBLIC wiring on a tiny fixture). */
  private[graft] def simpsonDiversity(documents: DataFrame,
                                      envelope: Long): DataFrame = {
    // checkpointed once: the route pre-count and the graded agg both
    // read the bounded FoF rows instead of re-scanning the corpus
    val fof = freqOfFreq(documents).localCheckpoint()
    // Σ cnt·n_f = N: per-term ≤ N and the sum IS N — exact BIGINT at
    // any conceivable corpus (only the PAIR products have an envelope)
    val n = fof.agg(coalesce(sum(col("cnt") * col("n_f")), lit(0L)))
      .first().getLong(0)
    if (n <= envelope) simpsonExact(fof)
    else {
      log.warn(s"simpsonDiversity: N=$n tokens exceeds the exact " +
        s"N(N-1) BIGINT envelope (<= $envelope); rendering the pair " +
        "products in double (all count columns stay exact BIGINT)")
      simpsonDouble(fof)
    }
  }

  /** The exact-BIGINT pair-product path — unchanged law, off the
    * checkpointed FoF table. */
  private[graft] def simpsonExact(fof: DataFrame): DataFrame =
    fof
      .agg(
        sum(col("cnt") * col("n_f")).as("n_tokens"),
        sum(col("n_f")).as("vocab"),
        coalesce(sum(when(col("cnt") === 1L, col("n_f"))), lit(0L)).as("n1"),
        sum(col("cnt") * (col("cnt") - 1L) * col("n_f")).as("sum_ff1"))
      .select(col("n_tokens"), col("vocab"), col("sum_ff1"),
        when(col("sum_ff1") > 0L,
          expr("(n_tokens * (n_tokens - 1)) div sum_ff1")).as("inv_simpson"),
        expr("(n1 * 1000) div vocab").as("singleton_pm"))

  /** The past-envelope path: identical FoF reduction, count columns
    * and singleton_pm still exact BIGINT; only the pair products
    * accumulate as double (each factor cast BEFORE the product so no
    * intermediate overflows). inv_simpson is the same law rendered as
    * the TRUE double ratio N(N−1)/Σf(f−1) — deliberately un-floored:
    * the exact path's floor is information only while the ratio is
    * small enough that ±1 matters, and a Spark floor() would overflow
    * its LongType result in the degenerate near-all-hapax corner this
    * route must survive. Property contract (CoverageSpec): sum_ff1 is
    * bit-equal to [[simpsonExact]]'s cast to double while every pair
    * product ≤ 2⁵³, and inv_simpson is bit-equal to the double ratio
    * formed from the exact path's own integer components; at the N it
    * actually serves the accumulated products carry double rounding
    * and partition-order sensitivity at the ulp level, acceptable for
    * a diversity ratio read to a handful of significant digits. */
  private[graft] def simpsonDouble(fof: DataFrame): DataFrame = {
    val cntD = col("cnt").cast("double")
    fof
      .agg(
        sum(col("cnt") * col("n_f")).as("n_tokens"),
        sum(col("n_f")).as("vocab"),
        coalesce(sum(when(col("cnt") === 1L, col("n_f"))), lit(0L)).as("n1"),
        sum(cntD * (cntD - 1.0d) * col("n_f").cast("double")).as("sum_ff1"))
      .select(col("n_tokens"), col("vocab"), col("sum_ff1"),
        when(col("sum_ff1") > 0.0d,
          col("n_tokens").cast("double") * (col("n_tokens") - 1L).cast("double")
            / col("sum_ff1")).as("inv_simpson"),
        expr("(n1 * 1000) div vocab").as("singleton_pm"))
  }

  /** One row per requested coverage percentage: (pct, n_tokens,
    * v_needed, mass) — the smallest vocabulary, filled greedily from
    * the most frequent type down (count desc, token asc — though the
    * within-class order provably cannot matter), whose total token
    * mass reaches ⌈pct·N/100⌉. Resolved entirely on the FoF table:
    * cumulative (mass, types) over frequency classes descending finds
    * the boundary class, and k = ⌈remaining/f⌉ whole tokens of it
    * complete the budget. */
  def vocabCoverage(documents: DataFrame,
      pcts: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val before = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val all = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // the FoF table is distinct-frequency-bounded: one partition is the
    // honest frame for its window sweep (the distinct-score discipline)
    val cum = freqOfFreq(documents).coalesce(1)
      .select(col("cnt"), col("n_f"),
        coalesce(sum(col("cnt") * col("n_f")).over(before), lit(0L)).as("mass_before"),
        coalesce(sum(col("n_f")).over(before), lit(0L)).as("v_before"),
        sum(col("cnt") * col("n_f")).over(all).as("n_total"))
    // pct fan-out as a literal-array explode — bounded × bounded needs
    // no join stage (and so no BroadcastNestedLoop in the plan)
    cum.withColumn("pct", explode(typedlit(pcts.map(_.toLong))))
      .withColumn("target", expr("(pct * n_total + 99) div 100"))
      .filter(col("mass_before") < col("target") &&
        col("mass_before") + col("cnt") * col("n_f") >= col("target"))
      .select(col("pct"), col("n_total").as("n_tokens"),
        (col("v_before") +
          expr("(target - mass_before + cnt - 1) div cnt")).as("v_needed"),
        (col("mass_before") +
          expr("((target - mass_before + cnt - 1) div cnt) * cnt")).as("mass"))
      // the sweep is single-partition (coalesce(1) upstream), so a
      // within-partition sort is a total order with no range exchange
      .sortWithinPartitions(col("pct"))
  }
}
