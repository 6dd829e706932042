package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sim.Quantize

/** Classifier evaluation over the embedding table — the missing tail
  * of a production quality-filter pipeline (CCNet / Gopher / Llama
  * style): after a filter model scores every document, the pipeline
  * needs (a) its discriminative power (ROC-AUC), (b) its full
  * precision/recall tradeoff curve to pick an operating threshold,
  * and (c) a calibration table so the score can be read as a
  * probability. The reference's ML stage stops at regression metrics
  * (`ml-sparkml.py`, `ml-savepipeline.py`: RMSE/R²); this family is the
  * classification-side evaluation a data-curation deployment runs at
  * corpus scale.
  *
  * The scored model is a CENTROID LINEAR PROBE, fit in closed form on
  * the corpus itself: w = n0·Σ_{y=1} c  −  n1·Σ_{y=0} c per dimension
  * over the corpus-wide affine int8 codes from [[Quantize]] (the
  * cross-multiplied form of the class-mean difference m1 − m0, exact
  * in BIGINT — no division anywhere), and score(v) = Σ_i c_i·w_i.
  * Labels y = [label ≥ split] binarize the 10-class column. This is
  * the Fisher-style nearest-class-mean direction: a real probe with
  * real separation, yet bit-reproducible on any engine that replays
  * the quantization (which q101/q204 already grade).
  *
  * Exactness bounds: |w_i| ≤ 255·n0·n1 and |score| ≤ d·255·|w|, so the
  * graded config (d=64) stays inside BIGINT up to ~10⁶ vectors. Past
  * that the fit AUTOMATICALLY switches (logged loudly) to a bounded
  * hash-deterministic 1/k sample — the probe is 2·d aggregates, so a
  * sample fit is the production form anyway — and because the score
  * bound depends only on the SAMPLE class sizes, full-corpus scoring
  * stays exact BIGINT with the same one-pass shape (see
  * [[probeScoresSampled]]; property-tested equal to the exact path at
  * k = 1 in EvalSpec).
  *
  * Scale shape — the point of the design: AUC needs ranks, but a
  * global row sort of the corpus is the one thing a 100-TB run must
  * not do. Every consumer here reduces the corpus with ONE map-side-
  * combined hash agg to a DISTINCT-SCORE table (cardinality bounded
  * by the score grid, ≪ corpus) and runs the rank arithmetic — a
  * cumulative sum — on that bounded table in a single partition
  * (Scalar-class, like the sketch merges). Mann–Whitney with the
  * standard tie correction comes out exactly:
  *   AUC·2·P·N = Σ_s pos_s · (2·negBelow_s + neg_s)
  * all in BIGINT. */
object Eval {

  /** Binarization threshold over the 10-class label column. */
  val LabelSplit = 5

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Session-scoped probe-score cache (the [[graft.sim.Quantize]]
    * encodeCache pattern, now a bounded LRU): SIX graded consumers
    * (q210/q211/q214/q215/q216/q217) read the same (vec_id, y, score)
    * table — fit + score once per (session, input plan), every consumer
    * sees bit-identical scores off the checkpointed table. Bounded at 8
    * distinct input plans; eviction is borrower-safe release-to-GC
    * (see [[graft.ops.BoundedCache]]).
    * Plan-hash keying assumes IMMUTABLE inputs
    * ([[graft.ops.BoundedCache]]'s contract) — call [[clearScoreCache]]
    * after an in-place rewrite. A failed fit (one-class input) is never
    * cached. */
  private val scoreCache = new graft.ops.BoundedCache[Int, DataFrame](
    maxEntries = 8)

  /** Explicit invalidation hook for in-place input rewrites. */
  def clearScoreCache(): Unit = scoreCache.clear()

  /** (vec_id, y, score): the exact-integer centroid-probe score for
    * every vector. Two corpus passes — one (i, y)-keyed hash agg to
    * fit the probe (d·2 output rows, map-side combined), one narrow
    * codegen'd fold projection to score (the [[graft.sim.Coreset]]
    * literal-fold discipline: no join, no shuffle in the scoring
    * pass) — computed once per (session, plan) via [[scoreCache]]. */
  def probeScores(embeddings: DataFrame): DataFrame =
    scoreCache.getOrCompute(
      embeddings.sparkSession.sparkContext.applicationId,
      embeddings.semanticHash())(
      probeScoresUncached(embeddings).localCheckpoint())

  /** The smallest power-of-two hash modulus k such that fitting the
    * probe on the expected 1/k hash-deterministic sample keeps
    * d·255²·ns0·ns1 inside BIGINT with a 4× variance margin. k = 1 —
    * the whole corpus, the exact path — whenever the full counts are
    * already in-envelope (every graded config). BigInt planning
    * arithmetic so the check itself can't overflow. */
  private[graft] def planSampleMod(d: Long, n0: Long, n1: Long): Long = {
    require(d > 0, s"probeScores: embeddings must have ≥1 dimension (d=$d) — " +
      "zero-dimension vectors cannot fit a probe")
    val cap = BigInt(Long.MaxValue) / 65025 / d
    var k = 1L
    while ((BigInt(n0) / k) * (BigInt(n1) / k) * 4 > cap) k *= 2
    k
  }

  private def probeScoresUncached(embeddings: DataFrame): DataFrame = {
    val extrema = Quantize.encodedWithExtrema(embeddings)._2
    val enc = encodedClasses(embeddings) // THE projection (shared with the spec seam)
    val counts = enc.groupBy(col("y")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n0 = counts.getOrElse(0L, 0L)
    val n1 = counts.getOrElse(1L, 0L)
    require(n0 > 0 && n1 > 0,
      s"probeScores: both classes must be nonempty (n0=$n0, n1=$n1)")
    // past the d·255²·n0·n1 BIGINT envelope the probe fits on a bounded
    // hash-deterministic sample instead of refusing; the automatic
    // switch is logged loudly and every graded config stays on k = 1
    val k = planSampleMod(extrema.length.toLong, n0, n1)
    if (k > 1)
      log.warn(s"probeScores: d·255²·n0·n1 exceeds the exact BIGINT " +
        s"envelope (d=${extrema.length}, n0=$n0, n1=$n1); fitting the " +
        s"probe on the deterministic 1/$k hash sample (scores stay exact)")
    // k = 1: fitBase == enc, so the class counts above ARE the fit
    // counts — don't pay the aggregation twice on the hot path
    probeScoresSampled(enc, k,
      knownFitCounts = if (k <= 1L) Some((n0, n1)) else None)
  }

  /** Fit on the 1/`sampleMod` xxhash64-deterministic sample, score the
    * WHOLE corpus. `sampleMod = 1` is the exact path verbatim. The
    * fallback is stronger than the scaladoc's original "score with
    * double weights" prescription: |score| ≤ d·255²·ns0·ns1 depends
    * only on the SAMPLE class sizes, so with the sample in-envelope the
    * full-corpus scores stay exact BIGINT and every downstream
    * integer-div consumer ([[aucReport]], [[calibrationBins]], …) is
    * unchanged. */
  private[graft] def probeScoresSampled(enc: DataFrame, sampleMod: Long,
      knownFitCounts: Option[(Long, Long)] = None): DataFrame = {
    val fitBase =
      if (sampleMod <= 1L) enc
      else enc.filter(pmod(xxhash64(col("vec_id")), lit(sampleMod)) === 0L)
    // probe fit: per-(dimension, class) code sums + class sizes.
    // posexplode shuffles d·2 grouped rows after map-side combine.
    val sums = fitBase
      .select(col("y"), posexplode(col("codes")).as(Seq("i", "c")))
      .groupBy(col("i"))
      .agg(
        sum(when(col("y") === 1L, col("c").cast("long")).otherwise(0L)).as("s1"),
        sum(when(col("y") === 0L, col("c").cast("long")).otherwise(0L)).as("s0"))
      .collect()
    val (ns0, ns1) = knownFitCounts.getOrElse {
      val fitCounts = fitBase.groupBy(col("y")).agg(count(lit(1)).as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      (fitCounts.getOrElse(0L, 0L), fitCounts.getOrElse(1L, 0L))
    }
    require(ns0 > 0 && ns1 > 0,
      s"probeScores: both classes must survive the 1/$sampleMod fit " +
        s"sample (ns0=$ns0, ns1=$ns1)")
    val d = sums.length.toLong
    // exactness envelope on the FIT sample, enforced loudly: the 4×
    // planning margin makes a violation a hash-distribution anomaly
    require(ns0 <= Long.MaxValue / 65025L / d / ns1,
      s"probeScores: d·255²·ns0·ns1 exceeds the exact BIGINT envelope " +
        s"even at sampleMod=$sampleMod (d=$d, ns0=$ns0, ns1=$ns1)")
    val w: Seq[Long] = sums.sortBy(_.getInt(0))
      .map(r => r.getLong(1) * ns0 - r.getLong(2) * ns1).toSeq
    val wLit = typedlit(w)
    val score = aggregate(
      sequence(lit(1), lit(w.length)), lit(0L),
      (acc: Column, i: Column) =>
        acc + element_at(col("codes"), i).cast("long") * element_at(wLit, i))
    enc.select(col("vec_id"), col("y"), score.as("score"))
  }

  /** The (vec_id, y, codes) projection feeding [[probeScoresSampled]] —
    * the ONE definition of the binarized-class code table, used by both
    * the production path ([[probeScoresUncached]]) and the spec seam,
    * so a change to the class law cannot desynchronize them. */
  private[graft] def encodedClasses(embeddings: DataFrame): DataFrame =
    Quantize.encodedWithExtrema(embeddings)._1.select(col("vec_id"),
      when(col("label") >= LabelSplit, 1L).otherwise(0L).as("y"),
      col("codes"))

  /** One-row exact ROC-AUC: (n_pos, n_neg, n_scores, auc_num2,
    * auc_ppm) with auc_num2 = AUC·2·P·N (the tie-corrected
    * Mann–Whitney numerator, exact BIGINT) and auc_ppm its floor'd
    * parts-per-million rendering. The corpus collapses to the
    * distinct-score table in one hash agg; the cumulative-negatives
    * sweep runs on that bounded table coalesced to one partition. */
  def aucReport(embeddings: DataFrame): DataFrame = {
    val byScore = probeScores(embeddings)
      .groupBy(col("score"))
      .agg(sum(col("y")).as("pos"),
        (count(lit(1)) - sum(col("y"))).as("neg"))
      .coalesce(1)
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    byScore
      .withColumn("neg_below", coalesce(sum(col("neg")).over(win), lit(0L)))
      .agg(
        sum(col("pos")).as("n_pos"),
        sum(col("neg")).as("n_neg"),
        count(lit(1)).as("n_scores"),
        sum(col("pos") * (col("neg_below") * 2L + col("neg"))).as("auc_num2"))
      .select(col("n_pos"), col("n_neg"), col("n_scores"), col("auc_num2"),
        expr("(auc_num2 * 1000000) div (n_pos * n_neg * 2)").as("auc_ppm"))
  }

  /** The full precision/recall curve as an exact-integer table: one
    * row per distinct score threshold t (descending), with the
    * confusion counts of the rule "keep iff score ≥ t":
    * (score, pos_at, neg_at, cum_pos = TP, cum_n = TP+FP). Precision
    * = cum_pos/cum_n and recall = cum_pos/P are exact rationals the
    * reader forms; nothing lossy is graded. Same scale shape as
    * [[aucReport]]: corpus → distinct-score table → bounded sweep. */
  def prCurve(embeddings: DataFrame): DataFrame = {
    val byScore = probeScores(embeddings)
      .groupBy(col("score"))
      .agg(sum(col("y")).as("pos_at"),
        (count(lit(1)) - sum(col("y"))).as("neg_at"))
      .coalesce(1)
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    byScore
      .select(col("score"), col("pos_at"), col("neg_at"),
        sum(col("pos_at")).over(win).as("cum_pos"),
        sum(col("pos_at") + col("neg_at")).over(win).as("cum_n"))
      .orderBy(col("score").desc)
  }

  /** The best-F1 operating point: ONE row — the threshold the
    * pipeline would actually deploy. The graded law is exact-integer:
    * over the descending distinct-score sweep (TP = cum_pos,
    * FP = cum_n − TP, FN = P − TP), maximize the floor'd
    * parts-per-million F1
    *   f1_ppm = (2·TP·10⁶) div (cum_n + P)
    * (F1 = 2TP/(2TP+FP+FN) = 2TP/(cum_n+P)), ties broken toward the
    * HIGHER threshold (the conservative operating point). The argmax
    * law is stated identically on both engines, so parity is exact;
    * the final orderBy/limit runs on the bounded distinct-score
    * table, never the corpus. |2·TP·10⁶| ≤ 2n·10⁶ stays in BIGINT to
    * n ≈ 4.6·10¹². */
  /** The descending distinct-score F1 sweep [[bestF1]],
    * [[confusionAtBestF1]], and (sliced) [[bestF1BySource]] all argmax
    * over — the ONE definition of the running/total window frames, the
    * floor'd-ppm F1 law ([[f1SweepFrom]]), and the tie law
    * ([[f1TieOrder]]), so the three graded queries name the same
    * deployed threshold BY CONSTRUCTION rather than by keeping
    * hand-maintained copies in sync. Columns:
    * (score, tp, cum_n, p, n, f1_ppm) on the bounded coalesce(1)
    * distinct-score table. */
  private def f1Sweep(embeddings: DataFrame): DataFrame =
    f1SweepFrom(
      probeScores(embeddings)
        .groupBy(col("score"))
        .agg(sum(col("y")).as("pos_at"),
          (count(lit(1)) - sum(col("y"))).as("neg_at"))
        .coalesce(1),
      sliceCols = Nil)

  /** The ONE statement of the descending-threshold window frames and
    * the floor'd-ppm F1 law, over a (sliceCols..., score, pos_at,
    * neg_at) distinct-score table — empty `sliceCols` is the global
    * sweep ([[bestF1]]/[[confusionAtBestF1]]), non-empty partitions
    * every frame by the slice ([[bestF1BySource]]), so the global and
    * per-slice operating points can never state divergent laws. */
  private def f1SweepFrom(byScore: DataFrame,
                          sliceCols: Seq[String]): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val desc =
      if (sliceCols.isEmpty) W.orderBy(col("score").desc)
      else W.partitionBy(sliceCols.map(col): _*).orderBy(col("score").desc)
    val run = desc.rowsBetween(W.unboundedPreceding, W.currentRow)
    val all = desc.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    byScore
      .select(sliceCols.map(col) ++ Seq(col("score"),
        sum(col("pos_at")).over(run).as("tp"),
        sum(col("pos_at") + col("neg_at")).over(run).as("cum_n"),
        sum(col("pos_at")).over(all).as("p"),
        sum(col("neg_at")).over(all).as("n")): _*)
      .withColumn("f1_ppm", expr("(tp * 2000000) div (cum_n + p)"))
  }

  /** The shared argmax tie law: maximum floor'd-ppm F1, ties toward
    * the HIGHER threshold (the conservative operating point) — one
    * ordering definition serving both the global LIMIT-1 argmax and
    * the per-slice row_number argmax. */
  private def f1TieOrder: Seq[org.apache.spark.sql.Column] =
    Seq(col("f1_ppm").desc, col("score").desc)

  private def f1Argmax(sweep: DataFrame): DataFrame =
    sweep.orderBy(f1TieOrder: _*).limit(1)

  /** Per-slice argmax under the SAME tie law. */
  private def f1ArgmaxBy(sweep: DataFrame, sliceCols: Seq[String]): DataFrame =
    sweep
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(sliceCols.map(col): _*).orderBy(f1TieOrder: _*)))
      .filter(col("rn") === 1)
      .drop("rn")

  def bestF1(embeddings: DataFrame): DataFrame =
    f1Argmax(f1Sweep(embeddings))
      .select(col("score"), col("tp"),
        (col("cum_n") - col("tp")).as("fp"),
        (col("p") - col("tp")).as("fn"),
        col("f1_ppm"))

  /** Per-slice AUC of the ONE globally-fit probe — the per-language
    * quality audit a multilingual curation pipeline runs (CCNet trains
    * per-language models precisely because filter quality varies by
    * language; this table is how you detect that). The slice column
    * comes from the documents table (vec_id = doc_id, the corpus'
    * 1:1 embedding↔document key): an equi join on the id key —
    * co-partitionable at scale, column-pruned to (doc_id, lang) —
    * then the same distinct-score reduction as [[aucReport]], now
    * keyed (lang, score) with the cumulative-negatives window
    * PARTITIONED by lang: bounded per-slice tables, no coalesce(1)
    * needed. A slice with one class gets auc_ppm NULL (loud, not
    * wrong) — both engines state the same guard. */
  def aucBySlice(embeddings: DataFrame, documents: DataFrame): DataFrame = {
    val slices = documents.select(col("doc_id").as("vec_id"), col("lang"))
    val byScore = probeScores(embeddings)
      .join(slices, Seq("vec_id"))
      .groupBy(col("lang"), col("score"))
      .agg(sum(col("y")).as("pos"),
        (count(lit(1)) - sum(col("y"))).as("neg"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("score").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    byScore
      .withColumn("neg_below", coalesce(sum(col("neg")).over(win), lit(0L)))
      .groupBy(col("lang"))
      .agg(
        sum(col("pos")).as("n_pos"),
        sum(col("neg")).as("n_neg"),
        count(lit(1)).as("n_scores"),
        sum(col("pos") * (col("neg_below") * 2L + col("neg"))).as("auc_num2"))
      .select(col("lang"), col("n_pos"), col("n_neg"), col("n_scores"),
        col("auc_num2"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          expr("(auc_num2 * 1000000) div (n_pos * n_neg * 2)")).as("auc_ppm"))
      .orderBy(col("lang"))
  }

  /** Exact two-sample Kolmogorov–Smirnov separation between the
    * positive- and negative-class score distributions — the
    * distribution-level counterpart of AUC (AUC integrates the
    * separation; KS reports its maximum and WHERE it occurs, which is
    * itself a threshold candidate). Exactness comes free here: both
    * empirical CDFs share the common denominator P·N, so
    *   D·P·N = max_s |cumPos_s·N − cumNeg_s·P|
    * is a pure-BIGINT argmax — no fraction comparison anywhere
    * (products ≤ n²/4, in-range to n ≈ 6·10⁹). One row:
    * (n_pos, n_neg, ks_num, ks_ppm, score_at), ties toward the LOWEST
    * attaining score. Same scale shape as [[aucReport]]. */
  def ksSeparation(embeddings: DataFrame): DataFrame = {
    val byScore = probeScores(embeddings)
      .groupBy(col("score"))
      .agg(sum(col("y")).as("pos_at"),
        (count(lit(1)) - sum(col("y"))).as("neg_at"))
      .coalesce(1)
    val asc = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").asc)
    val run = asc.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val all = asc.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    byScore
      .select(col("score"),
        sum(col("pos_at")).over(run).as("cpos"),
        sum(col("neg_at")).over(run).as("cneg"),
        sum(col("pos_at")).over(all).as("p"),
        sum(col("neg_at")).over(all).as("n"))
      .select(col("p").as("n_pos"), col("n").as("n_neg"),
        abs(col("cpos") * col("n") - col("cneg") * col("p")).as("ks_num"),
        expr("(abs(cpos * n - cneg * p) * 1000000) div (p * n)").as("ks_ppm"),
        col("score").as("score_at"))
      .orderBy(col("ks_num").desc, col("score_at").asc)
      .limit(1)
  }

  /** Equi-width calibration table over the probe score: B bins over
    * [lo, hi] (corpus extrema, Scalar-class literals), bin index
    * (score−lo)·B // (hi−lo+1) — exact BIGINT, the +1 keeping the max
    * score inside bin B−1 with no float edge anywhere (the q138
    * rounding-boundary lesson). Per bin: n, n_pos, the floor'd
    * per-mille empirical positive rate, and Σ(score−lo) so the
    * reader can place the bin's mean score exactly. A reliability
    * diagram / Brier reliability term is a projection of these exact
    * columns. One corpus pass beyond the probe; bins ≪ corpus. */
  /** The shared [lo, width] bin grid off the corpus score extrema
    * (Scalar-class), guarded loudly against the one latent wrap: a
    * near-envelope probe only bounds |score| ≤ Long.MaxValue, so a
    * range straddling zero could overflow (hi − lo + 1) or the
    * (score − lo)·bins product — refuse with the inputs named rather
    * than bin on silently wrapped arithmetic. */
  private def binGrid(scores: DataFrame, bins: Int): (Long, Long) = {
    val ext = scores.agg(min(col("score")), max(col("score"))).collect().head
    val lo = ext.getLong(0)
    val widthB = BigInt(ext.getLong(1)) - BigInt(lo) + 1
    require(widthB * bins <= BigInt(Long.MaxValue),
      s"calibration bin grid exceeds BIGINT: [$lo, ${ext.getLong(1)}] × $bins")
    (lo, widthB.toLong)
  }

  def calibrationBins(embeddings: DataFrame, bins: Int = 10): DataFrame = {
    val scores = probeScores(embeddings)
    val (lo, width) = binGrid(scores, bins)
    scores
      .withColumn("bin", expr(s"((score - ${lo}L) * $bins) div ${width}L"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("n_pos"),
        sum(col("score") - lo).as("sum_shift"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("(n_pos * 1000) div n").as("pos_rate_pm"),
        col("sum_shift"))
      .orderBy(col("bin"))
  }

  /** The FULL confusion matrix at the deployed operating point — the
    * one-row report that closes the eval family: [[bestF1]] picks the
    * threshold, this states what deploying it does, with TN (which the
    * F1 sweep never needs) and the three floor'd-ppm operating rates
    * a reviewer actually reads (precision, recall, accuracy). Same
    * argmax law as [[bestF1]] (floor'd-ppm F1, ties to the HIGHER
    * threshold) so the two queries name the same threshold by
    * construction; all columns exact BIGINT on both engines. Same
    * scale shape: corpus → distinct-score table in one hash agg, the
    * sweep + argmax on the bounded table only. */
  def confusionAtBestF1(embeddings: DataFrame): DataFrame =
    f1Argmax(f1Sweep(embeddings))
      .select(col("score"), col("tp"),
        (col("cum_n") - col("tp")).as("fp"),
        (col("p") - col("tp")).as("fn"),
        (col("n") - (col("cum_n") - col("tp"))).as("tn"),
        expr("(tp * 1000000) div cum_n").as("precision_ppm"),
        expr("(tp * 1000000) div p").as("recall_ppm"),
        expr("((tp + n - (cum_n - tp)) * 1000000) div (p + n)").as("accuracy_ppm"),
        col("f1_ppm"))

  /** Per-source calibration of the ONE global probe — [[calibrationBins]]
    * partitioned by the documents' source column (the [[aucBySlice]]
    * slice discipline): a filter calibrated on the pooled corpus can be
    * badly miscalibrated per source (web vs books), and this is the
    * table that shows it. The bin grid is the GLOBAL [lo, hi] (one
    * Scalar-class extrema pass) so every source's rows land on
    * comparable bins; the slice column arrives by the id-key equi join
    * (co-partitionable, column-pruned); one corpus pass beyond the
    * probe, output bounded by sources × bins. */
  def calibrationBySource(embeddings: DataFrame, documents: DataFrame,
                          bins: Int = 10): DataFrame = {
    val scores = probeScores(embeddings)
    val (lo, width) = binGrid(scores, bins)
    val slices = documents.select(col("doc_id").as("vec_id"), col("source"))
    scores
      .join(slices, Seq("vec_id"))
      .withColumn("bin", expr(s"((score - ${lo}L) * $bins) div ${width}L"))
      .groupBy(col("source"), col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("n_pos"),
        sum(col("score") - lo).as("sum_shift"))
      .select(col("source"), col("bin"), col("n"), col("n_pos"),
        expr("(n_pos * 1000) div n").as("pos_rate_pm"),
        col("sum_shift"))
      .orderBy(col("source"), col("bin"))
  }

  /** Per-source best-F1 operating point — [[bestF1]]'s exact argmax
    * law partitioned by the documents' source column (the
    * [[aucBySlice]] / [[calibrationBySource]] slice discipline): the
    * threshold each source would deploy if tuned independently, which
    * is how a mixed web/books corpus actually operates a filter. Same
    * floor'd-ppm F1 law and ties-toward-the-HIGHER-threshold rule as
    * the global argmax, stated per source as one row_number window over
    * the bounded (source × distinct score) sweep. A source with no
    * positives sweeps f1_ppm = 0 everywhere and deterministically
    * reports its highest threshold (tp = fn = 0) — loud, not wrong, on
    * both engines.
    *
    * Scale shape: the corpus enters ONE (source, score)-keyed hash agg
    * (downstream of the cached probe scores and the column-pruned
    * id-key equi join); the cumulative/total/argmax windows all run on
    * the bounded sweep table PARTITIONED by source — no coalesce(1),
    * no corpus sort, nothing pairwise. */
  def bestF1BySource(embeddings: DataFrame, documents: DataFrame): DataFrame = {
    val slices = documents.select(col("doc_id").as("vec_id"), col("source"))
    val byScore = probeScores(embeddings)
      .join(slices, Seq("vec_id"))
      .groupBy(col("source"), col("score"))
      .agg(sum(col("y")).as("pos_at"),
        (count(lit(1)) - sum(col("y"))).as("neg_at"))
    f1ArgmaxBy(f1SweepFrom(byScore, Seq("source")), Seq("source"))
      .select(col("source"), col("score"), col("tp"),
        (col("cum_n") - col("tp")).as("fp"),
        (col("p") - col("tp")).as("fn"),
        col("f1_ppm"))
      .orderBy(col("source"))
  }
}
