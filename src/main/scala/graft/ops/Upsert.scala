package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog application (CDC upsert/merge) — materialize the next
  * snapshot of a table from a base snapshot plus a stream of keyed
  * change records, without a table format: the plain-parquet sibling of
  * MERGE INTO. A corpus pipeline uses it to roll forward the canonical
  * document table from ingestion deltas (inserts, re-crawls, takedown
  * deletes).
  *
  * Change records: (id, seq, op ∈ {I,U,D}, payload…). Per id, the
  * HIGHEST-seq record wins (ties broken toward delete, then by op for
  * determinism); `D` removes the row, `I`/`U` upsert the payload.
  *
  * Scale shape: the winner-per-key reduction runs through the
  * bounded-heap [[graft.plans.TopKPerKey]] (k=1) — one shuffle of the
  * CHANGES keyed by id, O(1) state per key, no per-key sort. The base
  * table is only anti-joined against the (typically tiny) changed-id
  * set — broadcast-able, so the base never shuffles: at 100 TB the
  * whole merge moves the delta, not the table.
  */
object Upsert {

  def applyChangelog(base: DataFrame, changes: DataFrame, idCol: String,
                     seqCol: String, opCol: String): DataFrame = {
    val payloadCols = base.columns.toSeq
    require(payloadCols.contains(idCol), s"base is missing id column $idCol")
    // winner per id: highest seq; on a seq tie prefer the delete (the
    // conservative read of conflicting same-version records), then the
    // op string for full determinism
    val winner = graft.plans.TopK.topKPerKey(
        changes, Seq(idCol),
        Seq((seqCol, false), (opCol, true)), 1)
      .drop("rn")
    val changedIds = winner.select(col(idCol)).distinct()
    val untouched = base.join(broadcast(changedIds), Seq(idCol), "left_anti")
    val upserts = winner.filter(col(opCol) =!= "D")
      .select(payloadCols.map(col): _*)
    untouched.unionByName(upserts)
  }
}
