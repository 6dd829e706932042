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

  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it reads as epoch-nanos
    * long. We expose a normalized microsecond `event_ts` timestamp column
    * (integer division — nanos exceed double's exact integer range, so no
    * floating point on the way). */
  def events(s: SparkSession, d: String): DataFrame =
    read(s, d, "events").withColumn("event_ts", expr("timestamp_micros(ts div 1000)"))
}
