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
}
