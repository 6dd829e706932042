package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the remaining Structured Streaming capability
  * class next to aggregation/dedup/custom state. Spark buffers both
  * sides in the state store; the interval condition + watermarks give it
  * an eviction bound, so state is O(events within the interval), not
  * O(stream) — the property that makes the join safe on an unbounded
  * stream.
  */
object StreamJoins {

  /** Attribute each purchase to the same user's clicks in the preceding
    * `windowMinutes` (inner interval join). Both sides must carry a
    * `user_id` and event-time `ts`. */
  def clickPurchaseAttribution(clicks: DataFrame, purchases: DataFrame,
                               windowMinutes: Int = 30,
                               latenessMinutes: Int = 10): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", s"$latenessMinutes minutes")
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", s"$latenessMinutes minutes")
    p.join(c, expr(
      s"""c_user = p_user AND
         |click_ts >= purchase_ts - INTERVAL $windowMinutes MINUTES AND
         |click_ts <= purchase_ts""".stripMargin))
      .select(col("p_user").as("user_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))
  }
}
