package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the admission gate a corpus
  * pipeline runs on every new batch (Deequ-style constraint checking,
  * re-expressed as plain Catalyst aggregates). Each rule yields one
  * result row `(rule, violations, passed)`; a batch is admitted iff
  * every rule passed.
  *
  * Scale shape: ALL row-level rules (not-null / in-set / in-range /
  * matches) evaluate in a SINGLE aggregation pass — one conditional
  * count per rule inside one map-side-combined hash agg over one scan.
  * Each uniqueness rule is one hash agg on its key (the same shuffle an
  * exact dedup costs); its violation count is "rows beyond the first
  * per duplicated key" = Σ(cnt-1), so a clean batch reports 0.
  */
object Expectations {

  sealed trait Rule { def name: String }
  /** `col` must never be null. */
  case class NotNull(column: String) extends Rule {
    val name = s"not_null($column)"
  }
  /** Non-null values of `col` must be one of `values`. */
  case class InSet(column: String, values: Seq[String]) extends Rule {
    val name = s"in_set($column)"
  }
  /** Non-null values of `col` must lie in [lo, hi]. */
  case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($column)"
  }
  /** Non-null values of `col` must match the (Java) regex. */
  case class Matches(column: String, regex: String) extends Rule {
    val name = s"matches($column)"
  }
  /** The column tuple must be unique across the batch. */
  case class Unique(columns: Seq[String]) extends Rule {
    val name = s"unique(${columns.mkString(",")})"
  }

  private def violationPredicate(r: Rule): Column = r match {
    case NotNull(c)        => col(c).isNull
    case InSet(c, vs)      => col(c).isNotNull && !col(c).isin(vs: _*)
    case InRange(c, lo, hi) =>
      col(c).isNotNull && (col(c) < lit(lo) || col(c) > lit(hi))
    case Matches(c, re)    => col(c).isNotNull && !col(c).rlike(re)
    case Unique(_) => throw new IllegalStateException("row-level only")
  }

  /** Evaluate `rules`, one result row per rule, ordered by rule name. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "check: no rules given")
    val (uniques, rowLevel) = rules.partition(_.isInstanceOf[Unique])
    val parts = new scala.collection.mutable.ArrayBuffer[DataFrame]
    if (rowLevel.nonEmpty) {
      val aggs = rowLevel.zipWithIndex.map { case (r, i) =>
        sum(when(violationPredicate(r), 1L).otherwise(0L)).as(s"__v$i") }
      parts += df.agg(aggs.head, aggs.tail: _*)
        .select(inline(array(rowLevel.zipWithIndex.map { case (r, i) =>
          struct(lit(r.name).as("rule"),
            coalesce(col(s"__v$i"), lit(0L)).as("violations"))
        }: _*)))
    }
    uniques.collect { case u @ Unique(cs) =>
      parts += df.groupBy(cs.map(col): _*).count()
        .agg(coalesce(sum(col("count") - 1L), lit(0L)).as("violations"))
        .select(lit(u.name).as("rule"), col("violations"))
    }
    parts.reduce(_.unionByName(_))
      .withColumn("passed", col("violations") === 0L)
      .orderBy(col("rule"))
  }
}
