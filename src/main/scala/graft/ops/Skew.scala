package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (builder-prompt scale checklist:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join split handles skew in sort-merge joins at runtime;
  * salting is the plan-level tool when one side has a few very hot keys
  * and the other side is small enough to replicate: the large side gets
  * a random salt in [0, saltFactor), the small side is exploded across
  * all salt values, and the join key becomes (key, salt) — splitting a
  * hot key's rows across `saltFactor` reducers instead of one.
  *
  * Semantics are identical to the plain equi-join (verified in tests);
  * the cost is replicating the small side saltFactor times.
  */
object Skew {

  /** Inner equi-join `large ⋈ small` on `key`, salted `saltFactor` ways.
    * `small`'s rows are replicated per salt; `large`'s salt is derived
    * deterministically from a uniformly-distributed hash of the full row
    * id column `distinctCol` (not random: reproducible plans). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 distinctCol: String, saltFactor: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(hash(col(distinctCol)), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-skew profile: the `topK` hottest keys with row count, share of
    * the table, and rank — the diagnostic you run BEFORE choosing a
    * mitigation (salt factor ≈ hot-key rows / target partition rows;
    * AQE skew-join handles the long tail). Computes a [[Scalar]] (the
    * table row count) at construction.
    *
    * Scale shape: one hash aggregation on the key (skew-tolerant — one
    * row per distinct key survives the map-side partial agg), then
    * `orderBy(...).limit(topK)`, which Spark plans as TakeOrdered:
    * each partition keeps a local k-heap and only k rows per partition
    * reach the driver-side merge — never a global single-partition
    * window over billions of distinct keys. Rank is assigned on the
    * k-row result. Share is rounded to 6dp and ties break on the key,
    * so output is engine-portable (oracle-checked). */
  def skewProfile(df: DataFrame, key: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val total = Scalar.count(df)
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key))
      .limit(topK)
      .withColumn("share", round(col("n") / lit(total.toDouble), 6))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col(key))).cast("long"))
      .orderBy(col("rank"))
  }
}
