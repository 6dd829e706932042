package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** The one sanctioned way an operator computes a driver-side scalar.
  *
  * Most operators here are fully lazy plans; a few need one scalar
  * reduction at CONSTRUCTION time (a corpus count folded into a
  * literal, a mean for a projection constant, quantile boundaries for
  * bucketing). That is an eager Spark action — acceptable because it
  * reduces to O(1) driver bytes (never `.collect()` of a dataset), but
  * it must be visible, not a case-by-case surprise. Routing through
  * this helper is the convention: callers of an operator whose Scaladoc
  * says "computes a [[Scalar]]" know construction launches a job.
  *
  * Operators that use it: `TextOps.tfidf` / `TextOps.unigramLogProb`
  * (corpus count), `DBSCAN.latLonToLocalXY` (mean latitude),
  * `Windows.globalRunningSum` (quantile boundaries + checkpoint).
  */
object Scalar {

  /** One aggregate expression → one driver value. Eager: runs a job. */
  def reduce[T](df: DataFrame, agg: Column): T =
    df.agg(agg).first().get(0).asInstanceOf[T]

  /** Row count as a literal-foldable long. Eager: runs a job. */
  def count(df: DataFrame): Long = df.count()
}
