package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization over the generic event stream
  * (`user_id`, `ts`) — the streaming twin of the batch sessionize
  * operator (q34). Two implementations, in the builder-prompt preference
  * order:
  *
  *  1. [[sessionWindowCounts]] — the built-in `session_window` gap
  *     aggregation: fully declarative, state managed by Spark's
  *     streaming aggregation operator, mergeable sessions, watermark
  *     eviction. The production default.
  *  2. [[sessionizeStateful]] — `flatMapGroupsWithState` with
  *     event-time timeout: the custom-state extension point
  *     (`KeyValueGroupedDataset`), for session logic the declarative
  *     form can't express (e.g. emitting per-session payload summaries
  *     or custom close conditions). State is one small struct per open
  *     session; the event-time timeout bounds it — no unbounded growth.
  *
  * Both emit one row per CLOSED session (append mode): a session closes
  * when the watermark passes its end + gap.
  */
object Sessions {

  /** Open-session buffer: epoch-millis bounds + event count. */
  case class SessionBuf(startMs: Long, endMs: Long, n: Long)

  /** One closed session. */
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long)

  /** Declarative gap-sessionization: count events per (user, session).
    * Input needs `user_id` and timestamp `ts` columns. */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
                          lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Custom-state gap-sessionization via `flatMapGroupsWithState`:
    * accumulates an open-session buffer per user and emits it once the
    * event-time timeout (session end + gap, bounded by the watermark)
    * fires. Late events within the watermark extend the open session. */
  def sessionizeStateful(events: DataFrame, gapMinutes: Int = 30,
                         latenessMinutes: Int = 30): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"))
      .withWatermark("ts", s"$latenessMinutes minutes")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionBuf, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[SessionBuf]) =>
          if (state.hasTimedOut) {
            // watermark passed session end + gap → close and emit
            val s = state.get
            state.remove()
            Iterator(ClosedSession(uid, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.endMs), s.n))
          } else {
            // A micro-batch can carry SEVERAL sessions for one user.
            // Split the sorted batch into gap-separated runs, merge the
            // open-session buffer in as one more interval, then emit
            // every run but the last as a closed session (the last stays
            // open under the event-time timeout). The gap break is >=,
            // matching session_window's [start, end) semantics: an event
            // exactly `gap` after the previous one starts a NEW session.
            val ts = rows.map(_._2.getTime).toArray.sorted
            val runs = ts.foldLeft(Vector.empty[SessionBuf]) { (acc, t) =>
              acc.lastOption match {
                case Some(r) if t - r.endMs < gapMs =>
                  acc.init :+ SessionBuf(r.startMs, t, r.n + 1)
                case _ => acc :+ SessionBuf(t, t, 1L)
              }
            }
            // interval-merge the existing open session with the runs
            // (late events can place it anywhere among them, or spanning)
            val merged = (state.getOption.toVector ++ runs).sortBy(_.startMs)
              .foldLeft(Vector.empty[SessionBuf]) { (acc, r) =>
                acc.lastOption match {
                  case Some(p) if r.startMs - p.endMs < gapMs =>
                    acc.init :+ SessionBuf(p.startMs, math.max(p.endMs, r.endMs), p.n + r.n)
                  case _ => acc :+ r
                }
              }
            val open = merged.last
            state.update(open)
            state.setTimeoutTimestamp(open.endMs + gapMs)
            merged.init.iterator.map(s =>
              ClosedSession(uid, new java.sql.Timestamp(s.startMs),
                new java.sql.Timestamp(s.endMs), s.n))
          }
      }
  }
}
