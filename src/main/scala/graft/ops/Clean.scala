package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's batch ETL chains as composable operators
  * (SURVEY.md §2.3, §3.1).
  *
  * One logical op library shared by batch and streaming (SURVEY §2.9 T2):
  * every function here is a pure DataFrame→DataFrame transform, so
  * `stream.EventStream` applies the identical chain to a streaming input.
  */
object Clean {

  /** Exact dedup by event id — `dropDuplicates(['id'])`
    * (`/root/reference/etl.py:10` et al.). Arbitrary-representative form;
    * for oracle-compared outputs use the min-per-key canonicalization
    * (see [[EventOps.firstEventPerUser]]). */
  def dedupById(df: DataFrame): DataFrame = df.dropDuplicates("id")

  /** Deterministic dedup by id: keep, per id, the row sorting first by
    * (updated, description) — SURVEY §7.4 trap 8's canonical-
    * representative refinement of `dropDuplicates`, so every downstream
    * table is oracle-comparable (an arbitrary representative would make
    * row contents — e.g. exploded road counts — nondeterministic).
    * Same single shuffle on id as `dropDuplicates`; the k-per-key sort
    * is bounded by the duplicate multiplicity. */
  def dedupByIdCanonical(df: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      .orderBy(col("updated").asc_nulls_first, col("description").asc_nulls_first)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Null-drop on required keys (`etl-historical.py:58,71` etc.). */
  def requireFields(df: DataFrame, fields: Seq[String]): DataFrame =
    df.na.drop("any", fields)

  /** Offset-aware ISO-8601 → UTC timestamps for created/updated
    * (`etl.py:14`, `etl-events.py:101-102`; session TZ pinned UTC). */
  def withTimestamps(df: DataFrame): DataFrame =
    df.withColumn("created_ts", to_timestamp(col("created")))
      .withColumn("updated_ts", to_timestamp(col("updated")))

  /** Engineered duration in days — `(updated − created)/86400`
    * (`ml-sparkml.py:22`). */
  def withDuration(df: DataFrame): DataFrame =
    df.withColumn("duration",
      (unix_timestamp(col("updated_ts")) - unix_timestamp(col("created_ts"))) / 86400.0)

  /** The `etl.py:15-23` time-series table: one row per
    * (subtype × road × area), arrays exploded (explode_outer keeps
    * events with empty arrays). */
  def timeSeriesTable(events: DataFrame): DataFrame =
    events
      .transform(dedupByIdCanonical)
      .transform(withTimestamps)
      .select(col("id"), col("event_type"), col("created_ts").as("event_timestamp"),
        col("severity"), col("event_subtypes"), col("roads"), col("areas"))
      .withColumn("event_subtype", explode_outer(col("event_subtypes")))
      .withColumn("road", explode_outer(col("roads.name")))
      .withColumn("area", explode_outer(col("areas.name")))
      .drop("event_subtypes", "roads", "areas")

  /** The `etl-ml.py:61-80` ML table: cleaned event + centroid lon/lat +
    * duration + array sizes, junk columns dropped (incl. the backticked
    * `+ivr_message`). */
  def mlTable(events: DataFrame): DataFrame =
    events
      .transform(dedupByIdCanonical)
      .transform(df => requireFields(df, Seq("id", "created", "updated")))
      .transform(withTimestamps)
      .transform(withDuration)
      .withColumn("lonlat", Geo.lonLat(col("geography.type"), col("geography.coordinates")))
      .withColumn("longitude", col("lonlat.lon"))
      .withColumn("latitude", col("lonlat.lat"))
      .withColumn("num_roads", size(col("roads")).cast("int"))
      .withColumn("num_areas", size(col("areas")).cast("int"))
      .withColumn("severity_numeric", Geo.severityOrdinal(col("severity")))
      .drop("jurisdiction_url", "url", "description", "+ivr_message",
        "schedule", "geography", "roads", "areas", "lonlat", "created", "updated")

  /** The severity rollup flagship (`athena.sql:18-20` ≡
    * `simple-analyses.py:27`). */
  def severityRollup(events: DataFrame): DataFrame =
    events.transform(dedupByIdCanonical)
      .groupBy(col("severity")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("severity"))

  /** Subtype rollup (`athena.sql:22-24`) over the exploded time-series
    * table (the Athena external table's shape). */
  def subtypeRollup(events: DataFrame): DataFrame =
    timeSeriesTable(events)
      .groupBy(col("event_subtype")).agg(count(col("id")).as("cnt"))
      .orderBy(col("event_subtype"))

  /** Month/year rollup (`athena.sql:26-29`). */
  def monthlyRollup(events: DataFrame): DataFrame =
    timeSeriesTable(events)
      .groupBy(year(col("event_timestamp")).cast("long").as("y"),
        month(col("event_timestamp")).cast("long").as("m"))
      .agg(count(col("id")).as("cnt"))
      .orderBy(col("y"), col("m"))
}
