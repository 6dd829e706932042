package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scans over the driver testdata (TESTDATA.md).
  *
  * Re-expresses the reference's source operators (SURVEY.md §2.1):
  * plain parquet scan (`/root/reference/simple-analyses.py:22`), schema-on-read
  * (`cluster.py:34`), glob/union scan (`lambda-run-clustering.py:25`).
  * At 100 TB these are plain `FileScan parquet` nodes: column pruning and
  * predicate pushdown reach the scan as long as callers keep plans
  * declarative, which every operator in this package does.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** `events.ts` normalization. Fixture generations differ:
    * INT64 TIMESTAMP(NANOS) (reads as epoch-nanos long under
    * `nanosAsLong`) vs INT64 TIMESTAMP(MICROS, adjustedToUTC=false)
    * (reads as TIMESTAMP_NTZ). Every downstream operator does integer
    * time arithmetic on an epoch-nanos `ts` long (nanos exceed double's
    * exact integer range, so no floating point on the way), so we detect
    * the physical type and always expose the same logical schema:
    * `ts` = epoch-nanos BIGINT, `event_ts` = microsecond TIMESTAMP.
    * The session time zone is UTC ([[graft.GraftSession]]), so the
    * NTZ→LTZ cast preserves the wall clock as a UTC epoch — matching
    * DuckDB's `epoch_us`/`epoch_ns` on the same parquet. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = read(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("event_ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType | TimestampType =>
        raw
          .withColumn("event_ts", col("ts").cast(TimestampType))
          .withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other (expected epoch-nanos long or timestamp)")
    }
  }
}
