package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** File-layout control for multi-dimensional data skipping.
  *
  * A 100 TB table is pruned twice before any row is read: partition
  * directories (coarse, one column) and parquet row-group min/max stats
  * (fine, every column — Spark's parquet reader skips row groups whose
  * stats exclude the pushed filter). Row-group stats only help if rows
  * that are close in VALUE space are close in FILE space; sorting by one
  * column gives perfect stats on that column and useless stats on every
  * other. Z-ordering interleaves the bits of several columns so a range
  * predicate on ANY subset of them touches a small fraction of files —
  * the same layout trick Delta/Iceberg `OPTIMIZE ZORDER BY` applies
  * (public docs; re-derived here over plain parquet with Spark built-ins).
  *
  * Everything is codegen-able SQL lambdas — no UDF, no driver loop; the
  * write is one range repartition + in-partition sort, exactly the
  * shuffle a plain `orderBy` write would cost.
  */
object Layout {

  /** Morton (z-curve) value: interleave the low `bits` bits of each of
    * `cols` (non-negative integral columns) into one BIGINT. Bit `i` of
    * column `j` lands at position `i * cols.size + j`. Bits beyond
    * `bits` are ignored (callers quantize first); `cols.size * bits`
    * must fit in 63 bits. Native fused expression
    * ([[graft.functions.ZValue]]); bit-identical to [[zValueHof]]. */
  def zValue(cols: Seq[Column], bits: Int = 16): Column =
    graft.functions.ZValue.zValue(cols, bits)

  /** The composed built-ins form zValue replaces: per column, fold a
    * `sequence(0, bits-1)` with column-arg shifts. Contributions are
    * disjoint bits, so SUM composes them. Kept as the reference
    * implementation the native expression is equality-tested against. */
  def zValueHof(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 1 && n * bits <= 63, s"$n cols x $bits bits exceeds BIGINT")
    cols.zipWithIndex.map { case (c, j) =>
      aggregate(
        sequence(lit(0), lit(bits - 1)),
        lit(0L),
        // Column-arg shifts: the ShiftLeft/ShiftRight expressions accept
        // arbitrary children; the functions-API Int overloads are just a
        // convenience, so go through call_function.
        (acc, i) => acc + call_function("shiftleft",
          call_function("shiftright", c.cast("long"), i).bitwiseAND(lit(1L)),
          i * lit(n) + lit(j)))
    }.reduce(_ + _)
  }

  /** Linear min/max quantization of a numeric column onto [0, 2^bits):
    * the cheap rank proxy (computes two [[graft.ops.Scalar]]s at
    * construction). Constant columns map to 0. For heavily skewed
    * columns substitute a percentile-rank quantizer; the z-curve itself
    * is agnostic to how ranks were assigned. */
  def quantize(df: DataFrame, colName: String, bits: Int = 16): Column = {
    val (mn, mx) = {
      val r = df.agg(min(col(colName)).cast("double"), max(col(colName)).cast("double")).first()
      (r.getDouble(0), r.getDouble(1))
    }
    val span = if (mx > mn) mx - mn else 1.0
    val levels = (1L << bits) - 1
    least(lit(levels), floor((col(colName).cast("double") - lit(mn)) / lit(span) * lit(levels.toDouble)))
      .cast("long")
  }

  /** Write `df` as parquet z-ordered on `zCols`: quantize each column,
    * interleave, range-repartition into `numFiles` z-ranges, sort within
    * each — every file then covers a compact hyper-rectangle of the
    * value space and row-group min/max stats become selective on every
    * z-column at once. One shuffle, same cost class as a sorted write. */
  def zorderWrite(df: DataFrame, zCols: Seq[String], path: String,
                  numFiles: Int, bits: Int = 16): Unit = {
    val perCol = math.min(bits, 63 / zCols.size)
    val z = zValue(zCols.map(c => quantize(df, c, perCol)), perCol)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-files compaction: rewrite a parquet directory into
    * ~`targetFileBytes` files. Micro-batch appends (the K2 sink) leave
    * one file per batch per partition; at 100 TB a scan of that layout
    * is throttled by file-open overhead and the driver's file index, not
    * I/O. File count = ceil(current bytes / target), sized from the
    * actual footprint — no bytes-per-row guessing. The rewrite goes to
    * `path + ".compact"` first, then swaps via two FS renames (Spark
    * cannot overwrite a path it is reading; on object stores use a
    * manifest/table format for the atomic variant — this is the plain-
    * parquet form). Round-robin repartition, content otherwise
    * untouched. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileBytes: Long = 128L << 20): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Crash recovery BEFORE touching anything. A prior run can strand:
    //  - `.precompact` with `path` ABSENT — it died between the two
    //    renames; the original table is intact under `.precompact`, so
    //    roll it back (restores the pre-compact state, then proceed).
    //  - `.precompact` with `path` present — it died after installing
    //    the rewrite but before the cleanup delete; the live table is
    //    already the compacted one, the leftover is garbage: delete it.
    //  - `.compact` — a partial rewrite from any crash; always garbage
    //    (mode("overwrite") would clobber it anyway): delete it.
    // Without this, a stale `.precompact` makes fs.rename return false
    // and compact is unusable until manual cleanup.
    val old = new org.apache.hadoop.fs.Path(path + ".precompact")
    val tmpStale = new org.apache.hadoop.fs.Path(path + ".compact")
    if (fs.exists(old)) {
      if (!fs.exists(hPath)) require(fs.rename(old, hPath),
        s"compact: crash recovery could not restore $old to $path")
      else fs.delete(old, true)
    }
    if (fs.exists(tmpStale)) fs.delete(tmpStale, true)
    val totalBytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(hPath, old), s"compact: could not move $path aside")
    require(fs.rename(tmp, hPath), s"compact: could not install $tmp")
    fs.delete(old, true)
  }
}
