package graft.schema

import org.apache.spark.sql.{Dataset, Encoders}

/** Typed case-class view of the cleaned ML table (SURVEY.md §1.4: a
  * `Dataset[T]` strict path next to the dynamic DataFrame path).
  * Field names match [[graft.ops.Clean.mlTable]]'s output columns, so
  * `.as[CleanedEvent]` is a schema-checked cast: a drifting column name
  * or type fails at analysis, not deep in a job. */
case class CleanedEvent(
    id: String,
    headline: Option[String],
    status: Option[String],
    event_type: Option[String],
    event_subtypes: Option[Seq[String]],
    severity: Option[String],
    created_ts: Option[java.sql.Timestamp],
    updated_ts: Option[java.sql.Timestamp],
    duration: Option[Double],
    longitude: Option[Double],
    latitude: Option[Double],
    num_roads: Option[Int],
    num_areas: Option[Int],
    severity_numeric: Option[Double])

object CleanedEvent {
  /** Typed view over the ML-table DataFrame (column-name-driven cast;
    * extra columns are dropped, missing ones fail analysis). */
  def view(mlTable: org.apache.spark.sql.DataFrame): Dataset[CleanedEvent] = {
    val enc = Encoders.product[CleanedEvent]
    mlTable.selectExpr(enc.schema.fieldNames.map(n => s"`$n`").toIndexedSeq: _*).as[CleanedEvent](enc)
  }
}
