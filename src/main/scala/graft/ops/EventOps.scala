package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream (batch view) operators.
  *
  * Re-expresses the reference's time-series analytics (SURVEY.md §2.5/2.6):
  * calendar-bucket rollups (`/root/reference/simple-analyses.py:23-26`,
  * `athena.sql:26-29`), `from_json` payload parsing (`etl-events.py:82`),
  * categorical ordinal mapping (`cluster.py:13-17`), exact dedup
  * canonicalized per key (`etl.py:10`, `cluster.py:35`), plus north-star
  * sessionization / as-of style time-series ops the reference lacks.
  *
  * The `events` table keeps `ts` as epoch-nanos long (see [[Tables.events]]);
  * all time arithmetic is integer, so results are engine-exact.
  *
  * Scale notes: everything is a hash aggregate or a single window shuffle
  * on `user_id` (high cardinality — no skew hotspot); JSON parsing is a
  * codegen'd `from_json`, never a UDF.
  */
object EventOps {
  private val NanosPerMinute = 60L * 1000 * 1000 * 1000

  /** Calendar-bucket counts by event type (day × hour), the reference's
    * time-series rollup shape. */
  def bucketCounts(events: DataFrame): DataFrame =
    events.groupBy(
        dayofmonth(col("event_ts")).cast("long").as("d"),
        hour(col("event_ts")).cast("long").as("h"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("d"), col("h"), col("event_type"))

  /** Parse the JSON `props` payload with an explicit schema (the
    * streaming-ETL `from_json` shape) and aggregate a field. */
  def propsKeySum(events: DataFrame): DataFrame =
    events
      .withColumn("k",
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
          .getField("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
      .orderBy(col("event_type"))

  /** Categorical → ordinal map via chained when/otherwise (the severity
    * map at cluster.py:13-17, with the same fallback-to-1 semantics). */
  def typeOrdinal(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c === "click", 1L).when(c === "view", 2L).when(c === "signup", 3L)
      .when(c === "purchase", 4L).when(c === "error", 5L).otherwise(1L)

  /** Ordinal-mapped aggregate: avg value per mapped code (exact decimal). */
  def ordinalStats(events: DataFrame): DataFrame =
    events.groupBy(typeOrdinal(col("event_type")).as("type_code"))
      .agg(count(lit(1)).as("cnt"), Num.avgMoney(col("value")).as("avg_value"))
      .orderBy(col("type_code"))

  /** Exact dedup, canonicalized representative per key (min-per-key) so
    * the result is deterministic — the oracle-safe form of
    * `dropDuplicates('id')` (SURVEY §7.4 trap 8). */
  def firstEventPerUser(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      // micro precision: DuckDB truncates parquet nanos to micros on read
      .agg(expr("min(ts) div 1000").as("first_ts"), min(col("event_id")).as("min_event_id"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** Gap-based sessionization: a new session starts after `gapMinutes` of
    * inactivity. One window shuffle on user_id. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gap = lit(gapMinutes * NanosPerMinute)
    events
      .withColumn("new_sess",
        when(col("ts") - lag(col("ts"), 1).over(w) > gap, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), (sum(col("new_sess")) + 1L).as("n_sessions"))
      .orderBy(col("user_id"))
  }

  /** Gap-based session windows via the built-in `session_window` — the
    * batch twin of [[graft.stream.Sessions]], one row per session with
    * micro-second bounds (session end = last event + gap, per Spark's
    * session-window definition). Complementary to [[sessionize]], which
    * only counts sessions per user. */
  def sessionWindows(events: DataFrame, gapMinutes: Int): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("event_ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))

  /** min/max/avg rollup per event type (exact decimal avg). */
  def statsByType(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        Num.avgMoney(col("value")).as("avg_value"))
      .orderBy(col("event_type"))

  /** Multiple DISTINCT aggregates in one pass — Spark plans this with
    * Expand (row replication per distinct group), keeping it a single
    * shuffle instead of one job per distinct column. */
  def distinctCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(expr("ts div 86400000000000")).as("n_days"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** Conditional (FILTER-clause style) aggregates in one pass: per-user
    * event counts split by type plus exact-decimal purchase value. */
  def conditionalAggs(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        sum(when(col("event_type") === "purchase", Num.dec2(col("value"))))
          .cast("double").as("purchase_value"),
        count(when(col("event_type") === "error", 1)).as("n_errors"))
      .orderBy(col("user_id"))

  /** Per-user activity profile. */
  def userStats(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        Num.sumMoney(col("value")).as("sum_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("user_id"))

  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot: event-type counts per user cohort (user_id mod 10). Fixed
    * pivot values keep the plan single-pass (no distinct-values job). */
  def cohortTypePivot(events: DataFrame): DataFrame = {
    val p = events.groupBy((col("user_id") % 10).as("cohort"))
      .pivot("event_type", EventTypes).count()
    p.select(col("cohort") +: EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("cohort"))
  }

  /** Band/range join: classify values into [lo, hi) bands (broadcast the
    * tiny band table — see [[Joins.bandJoin]]). */
  def valueBands(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val bands = Seq(
      ("low", 0.0, 50.0), ("mid", 50.0, 150.0),
      ("high", 150.0, 400.0), ("extreme", 400.0, 1000.0)
    ).toDF("band", "lo", "hi")
    Joins.bandJoin(events, bands, "value")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("cnt"), Num.sumMoney(col("value")).as("sum_value"))
      .orderBy(col("band"))
  }

  /** Purchases as-of joined to the latest preceding click of the same
    * user (see [[Joins.asofJoinBackward]]). */
  def purchaseAsofClick(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("tsn"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), expr("ts div 1000").as("tsn"))
    Joins.asofJoinBackward(purchases, clicks, "user_id", "tsn", "tsn")
      .select(col("event_id"), col("user_id"), col("tsn"), col("asof_ts"))
      .orderBy(col("user_id"), col("tsn"), col("event_id"))
  }

  /** Conversion-funnel analysis: how far each user progresses through an
    * ORDERED stage sequence (default view → click → purchase), where a
    * stage counts only if it happens after a match of the previous one —
    * subsequence semantics, the standard funnel definition (and what
    * dedicated engines ship as `windowFunnel`/`MATCH_RECOGNIZE`).
    *
    * Plan: one hash agg collects each user's time-ordered stage-sentinel
    * string (sort_array over (ts, event_id, sentinel) structs — ties
    * deterministic), then stage reach is a greedy-subsequence regex
    * (`a.*b.*c`) — regex .* IS the greedy-subsequence match, identical
    * in DuckDB, so the whole operator is oracle-checked. Per-user state
    * is one string of sentinels; the shuffle is the same single
    * user-keyed agg every per-user rollup costs.
    *
    * Sentinels, not initials: an event type is mapped to a generated
    * letter only when it EQUALS a stage name ('a' for stage 0, 'b' for
    * stage 1, …) and to '-' otherwise — a non-stage type sharing a
    * stage's first letter ('visit' vs 'view') can never count as stage
    * progress, and stage names never leak metacharacters into the
    * pattern. */
  def funnel(events: DataFrame,
             stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size && stages.size <= 26,
      s"funnel: stages must be distinct and at most 26 (got $stages)")
    val sentinel = stages.indices.map(i => ('a' + i).toChar.toString)
    val stageMap = map(stages.zip(sentinel).flatMap {
      case (s, c) => Seq(lit(s), lit(c)) }: _*)
    val seqStr = array_join(transform(
      sort_array(collect_list(struct(
        expr("ts div 1000").as("tsn"), col("event_id"),
        coalesce(element_at(stageMap, col("event_type")), lit("-")).as("ini")))),
      x => x.getField("ini")), "")
    val stageFlags = stages.indices.map { i =>
      val pat = sentinel.take(i + 1).mkString(".*")
      when(regexp_like(col("seq"), lit(pat)), 1L).otherwise(0L)
        .as(s"reached_${stages(i)}")
    }
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), seqStr.as("seq"))
      .select(col("user_id") +: col("n_events") +: stageFlags: _*)
      .withColumn("funnel_stage",
        stages.indices.map(i => col(s"reached_${stages(i)}")).reduce(_ + _))
      .orderBy(col("user_id"))
  }

  /** Weekly retention cohorts: users grouped by FIRST active week
    * (epoch-week — tz-free integer arithmetic, like [[activityIslands]]);
    * each (cohort, offset) cell counts distinct users from that cohort
    * active `offset` weeks later — the classic retention triangle.
    * Offset 0 is the cohort size by construction. Shuffle shape: one
    * distinct agg, one min-per-user agg (both keyed on user_id), a
    * user-keyed join, and a final cell agg — all high-cardinality keys
    * until the final (small) cell table. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val wk = events
      .select(col("user_id"), expr("(ts div 1000) div 604800000000").as("wk"))
      .distinct()
    val first = wk.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    wk.join(first, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset_wk"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_wk"), col("offset_wk"))
  }

  /** Event-type co-occurrence (market-basket pairs): for every pair of
    * event types, how many users did BOTH. Distinct (user, type) first —
    * the self-join is then per-user over ≤|types| rows, so candidate
    * volume is users·types², never events²; the type domain is small so
    * the output is a tiny matrix. The association strength feeds
    * cross-sell / funnel-design decisions the way bigram PMI feeds
    * collocations. */
  def eventTypePairs(events: DataFrame): DataFrame = {
    val ut = events.select(col("user_id"), col("event_type")).distinct()
    ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** RFM segmentation — the classic customer scoring: per user, days
    * since last activity (Recency, vs the corpus max day), event count
    * (Frequency), total value (Monetary, exact decimal), each scored
    * 1–4 by which quartile BAND it falls in (1 = lowest values). Bands
    * come from exact interpolating percentiles of the per-user table
    * (the [[graft.quality.Filters.quantileBand]] Scalar-class pattern,
    * rounded 4 dp — the q24-proven cross-engine contract) folded into
    * the plan as literals, so scoring is codegen comparisons with NO
    * global window — a forced-equal-bin ntile over all users would be
    * one partition at corpus scale, and quantile-cut scoring is the
    * standard RFM practice anyway (ties share a band). */
  def rfmSegments(events: DataFrame): DataFrame = {
    val perUser = events.groupBy(col("user_id")).agg(
        max(expr("(ts div 1000) div 86400000000")).as("last_day"),
        count(lit(1)).as("frequency"),
        Num.sumMoney(col("value")).as("monetary"))
      .localCheckpoint() // feeds the max-day probe, the boundary probe, and scoring
    val d = perUser.agg(max(col("last_day"))).first().getLong(0)
    val withR = perUser.withColumn("recency_days", lit(d) - col("last_day"))
    val qs = withR.agg(
      expr("percentile(recency_days, array(0.25, 0.5, 0.75))").as("qr"),
      expr("percentile(frequency, array(0.25, 0.5, 0.75))").as("qf"),
      expr("percentile(monetary, array(0.25, 0.5, 0.75))").as("qm")).first()
    // HALF_UP at 4 dp — the Drift.psi boundary idiom (matches SQL ROUND
    // for the positive metrics here)
    def tile(c: String, bounds: Seq[Double]) =
      bounds.map(b => when(col(c) >
          BigDecimal(b).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, 1L)
          .otherwise(0L))
        .reduce(_ + _) + 1L
    def boundsOf(i: Int) = qs.getSeq[Double](i)
    withR.select(col("user_id"), col("recency_days"), col("frequency"), col("monetary"),
        tile("recency_days", boundsOf(0)).as("r_tile"),
        tile("frequency", boundsOf(1)).as("f_tile"),
        tile("monetary", boundsOf(2)).as("m_tile"))
      .orderBy(col("user_id"))
  }

  /** Cumulative unique users by day — "distinct over a running window",
    * which no engine supports directly, in its standard distributed
    * form: a user counts ONCE, on their FIRST active day (one keyed
    * agg), days roll up new-user counts (second agg), and the running
    * total is a window over the day-cardinality table only (tiny; the
    * q17 class — never over raw events). Emits every active day with
    * (n_new, cum_users); tz-free epoch-day integers as everywhere. */
  def cumulativeUniqueUsers(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firstDay = events
      .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("day"))
    val newPerDay = firstDay.groupBy(col("day")).agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    newPerDay
      .withColumn("cum_users", sum(col("n_new")).over(w))
      .select(date_add(lit("1970-01-01").cast("date"), col("day").cast("int")).as("date"),
        col("n_new"), col("cum_users"))
      .orderBy(col("date"))
  }

  /** Gaps-and-islands: maximal runs of consecutive ACTIVE DAYS per user
    * (the classic retention/streak analysis). Day boundaries are pure
    * integer arithmetic on epoch-micros (tz-free, engine-portable); the
    * island key is the `day - row_number` trick — constant within a
    * consecutive run, so islands fall out of one keyed window plus one
    * hash aggregation. The window partitions on user_id (high
    * cardinality), and the distinct pre-aggregation shrinks input to
    * ≤ |users| × |days| rows before any sort. */
  def activityIslands(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = events
      .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days.withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"), count(lit(1)).as("n_days"))
      .select(col("user_id"),
        date_add(lit("1970-01-01").cast("date"), col("d0").cast("int")).as("start_date"),
        date_add(lit("1970-01-01").cast("date"), col("d1").cast("int")).as("end_date"),
        col("n_days"))
      .orderBy(col("user_id"), col("start_date"))
  }

  /** First-order Markov transition matrix over per-user ordered event
    * streams — the sequence-mining summary behind next-action
    * prediction and anomaly scoring (a transition that never occurs in
    * the matrix is an anomaly candidate).
    *
    * One shuffle on user_id for the lag window (ties broken by
    * event_id — a total order, so `lead` is deterministic), then the
    * transition counts aggregate on the (from, to) pair whose
    * cardinality is |type-domain|² — bounded, so the row-total window
    * over it is free. Probabilities are floor'd micro-units
    * ((1e6·cnt) div row_total): exact integers, engine-portable. */
  /** Top-k most frequent 3-step event paths — the sequence-mining
    * rollup behind "what do users actually do": consecutive
    * (t₁ → t₂ → t₃) windows per user under the (ts, event_id) total
    * order (the higher-order sibling of [[transitionMatrix]]'s
    * first-order counts).
    *
    * One shuffle on user_id for the two lead() windows; the path-count
    * aggregation is bounded by |type-domain|³. The global top-k goes
    * through Spark's TakeOrderedAndProject (per-partition heaps + a
    * k-row driver merge — no global sort materializes), with the
    * (cnt desc, path asc) total order making the cut deterministic. */
  /** Per-type volume burstiness: the Fano factor (sample variance ÷
    * mean) of daily counts over each type's ACTIVE days — ≈1 for
    * Poisson-ish steady traffic, ≫1 for bursty/campaign-driven types,
    * ≪1 for metronomic ones. Zero-count days are excluded by
    * construction (an absent day is indistinguishable from a
    * pre-launch day in an event log); the statistic is "burstiness
    * while alive", documented.
    *
    * The [[graft.quality.Drift.rollingZScores]] discipline: corpus
    * reduces to (type, day) counts first, the exact integer sufficient
    * statistics (n, Σ, Σ²) reduce again to type cardinality, and the
    * Fano collapses into ONE fixed-shape double expression — engine-
    * exact. Types with a single active day are filtered by integer
    * predicate (variance undefined). Output:
    * (event_type, n_days, s1, s2, fano). */
  def burstiness(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
    val fano = ((col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n_days")) /
      (col("n_days") - 1L).cast("double")) /
      (col("s1").cast("double") / col("n_days").cast("double"))
    daily.groupBy(col("event_type")).agg(
        count(lit(1)).as("n_days"),
        sum(col("cnt")).as("s1"),
        sum(col("cnt") * col("cnt")).as("s2"))
      .filter(col("n_days") >= 2L && col("s1") > 0L)
      .withColumn("fano", fano)
      .orderBy(col("event_type"))
  }

  def topPaths(events: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("t1"))
      .withColumn("t2", lead(col("t1"), 1).over(w))
      .withColumn("t3", lead(col("t1"), 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t1"), col("t2"), col("t3"))
      .limit(k)
  }

  def transitionMatrix(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val counts = steps.groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("row_total", sum(col("cnt")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("cnt"), col("row_total"),
        expr("(1000000 * cnt) div row_total").as("prob_micro"))
      .orderBy(col("from_type"), col("to_type"))
  }
}
