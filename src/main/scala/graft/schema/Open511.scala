package graft.schema

import org.apache.spark.sql.types._

/** The Open511 road-event schema — defined once as a Scala constant
  * (SURVEY.md §1.2). Mirrors the reference's explicit streaming schema at
  * `/root/reference/etl-events.py:9-26` and the shapes in
  * `Data/incident.json`.
  *
  * `geography.coordinates` is POLYMORPHIC in the source JSON (Point =
  * `[lon,lat]`, LineString = `[[lon,lat],...]`), so the strict schema
  * keeps it as StringType — Spark's JSON reader preserves the raw token —
  * and [[graft.ops.Geo]] parses it conditionally with `from_json`
  * (the same strategy the reference uses, `etl-events.py:18-21`).
  */
object Open511 {

  val roadType: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("from", StringType),
    StructField("to", StringType),
    StructField("direction", StringType)))

  val areaType: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("name", StringType),
    StructField("id", StringType)))

  val scheduleType: StructType = StructType(Seq(
    StructField("intervals", ArrayType(StringType)),
    StructField("recurring_schedules", ArrayType(StructType(Seq(
      StructField("days", ArrayType(IntegerType)),
      StructField("start_date", StringType),
      StructField("daily_start_time", StringType),
      StructField("end_date", StringType),
      StructField("daily_end_time", StringType)))))))

  val geographyType: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("coordinates", StringType))) // polymorphic — parsed later

  /** Strict event schema (streaming + trusted re-reads). */
  val eventSchema: StructType = StructType(Seq(
    StructField("jurisdiction_url", StringType),
    StructField("url", StringType),
    StructField("id", StringType),
    StructField("headline", StringType),
    StructField("status", StringType),
    StructField("created", StringType),
    StructField("updated", StringType),
    StructField("description", StringType),
    StructField("+ivr_message", StringType),
    StructField("+linear_reference_km", DoubleType),
    StructField("event_type", StringType),
    StructField("event_subtypes", ArrayType(StringType)),
    StructField("severity", StringType),
    StructField("geography", geographyType),
    StructField("roads", ArrayType(roadType)),
    StructField("areas", ArrayType(areaType)),
    StructField("schedule", scheduleType)))

  /** Top-level document: `{"events": [...]}`. */
  val documentSchema: StructType =
    StructType(Seq(StructField("events", ArrayType(eventSchema))))
}
