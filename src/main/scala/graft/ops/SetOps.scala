package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set operators (SURVEY.md §2.7 W4).
  *
  * The reference's only set op is the implicit UNION ALL of historical +
  * streaming parquet under one prefix (`/root/reference/etl-events.py:119`
  * + `lambda-run-clustering.py:25`); we expose it — and INTERSECT/EXCEPT —
  * as explicit verified operators. `unionByName` is the scale-safe form:
  * positional union silently mis-aligns evolving schemas.
  */
object SetOps {

  /** UNION ALL + rollup: nation-key population across customer ∪ supplier. */
  def nationKeyCounts(customer: DataFrame, supplier: DataFrame): DataFrame = {
    val c = customer.select(col("c_nationkey").as("nk"))
    val s = supplier.select(col("s_nationkey").as("nk"))
    c.unionByName(s).groupBy(col("nk")).agg(count(lit(1)).as("cnt")).orderBy(col("nk"))
  }

  /** INTERSECT (distinct): nations having both customers and suppliers. */
  def nationsWithBoth(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").as("nk"))
      .intersect(supplier.select(col("s_nationkey").as("nk")))
      .orderBy(col("nk"))

  /** EXCEPT (distinct): customers who ordered, minus customers who ever
    * placed an order above `minTotal` — non-trivial at any SF. */
  def modestCustomers(orders: DataFrame, minTotal: Double): DataFrame =
    orders.select(col("o_custkey").as("ck"))
      .except(orders.filter(col("o_totalprice") > minTotal).select(col("o_custkey").as("ck")))
      .orderBy(col("ck"))

  /** Corpus snapshot diff: what changed between two versions of a table
    * (the CommonCrawl-refresh question — which documents are new, gone,
    * or edited — answered without rescanning content downstream).
    * Compares md5 content fingerprints under a full outer join on the
    * id; emits ONLY differences, tagged `added` / `removed` / `changed`
    * (unchanged rows — the overwhelming majority between adjacent
    * snapshots — never leave the join).
    *
    * Scale shape: one shuffle per side on the id (or zero with both
    * snapshots bucketed by id, the natural layout for versioned
    * corpora); fingerprints are computed in the scan projection, so the
    * join carries (id, 32-byte hex), not document bodies. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, idCol: String,
                   contentCol: String): DataFrame = {
    val a = v1.select(col(idCol).as("id"), md5(col(contentCol)).as("fp1"))
    val b = v2.select(col(idCol).as("id"), md5(col(contentCol)).as("fp2"))
    a.join(b, Seq("id"), "full_outer")
      .withColumn("change",
        when(col("fp1").isNull, "added")
          .when(col("fp2").isNull, "removed")
          .when(col("fp1") =!= col("fp2"), "changed"))
      .filter(col("change").isNotNull)
      .select(col("id"), col("change"))
      .orderBy(col("id"))
  }

  /** Generate an APPLYABLE changelog from two snapshots — the inverse
    * of [[graft.ops.Upsert.applyChangelog]]: upsert records (op `U`,
    * full v2 payload) for added/changed ids, delete records (op `D`,
    * null payload) for removed ids, all at sequence `seq`. Applying the
    * result to v1 reproduces v2 exactly (oracle-checked end-to-end by
    * q104's roundtrip). Together the pair turns any two table versions
    * into a CDC feed and back — the export half of the merge story.
    *
    * Scale shape: [[snapshotDiff]]'s fingerprint join (ids + 32-byte
    * hashes, never bodies) plus ONE join of the changed-id set back to
    * v2 — the id set is |diff|-sized and broadcast-able in the common
    * small-drift regime. */
  def changelog(v1: DataFrame, v2: DataFrame, idCol: String,
                contentCol: String, seq: Long): DataFrame = {
    val payload = v2.columns.toSeq
    val diff = snapshotDiff(v1, v2, idCol, contentCol)
      .withColumnRenamed("id", idCol)
      .localCheckpoint() // feeds both the upsert join and the delete arm
    val upserts = v2.join(diff.filter(col("change") =!= "removed"), Seq(idCol))
      .select(payload.map(col): _*)
      .withColumn("seq", lit(seq)).withColumn("op", lit("U"))
    val deletes = diff.filter(col("change") === "removed")
      .select(col(idCol) +:
        payload.filterNot(_ == idCol).map(c => lit(null).cast(
          v2.schema(c).dataType).as(c)): _*)
      .withColumn("seq", lit(seq)).withColumn("op", lit("D"))
    upserts.unionByName(deletes)
  }
}
