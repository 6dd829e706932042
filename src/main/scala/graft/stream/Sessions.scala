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

  /** Per-user state: EVERY gap-separated run the watermark has not yet
    * passed, not just the newest. A run can only be emitted once the
    * watermark exceeds its end + gap — before that, a late event (still
    * inside the lateness horizon) may arrive in a later micro-batch and
    * extend or bridge it; emitting early would split a session that the
    * batch `session_window` oracle merges, and append mode cannot
    * retract. Bounded: at most lateness/gap + 1 open runs per user. */
  case class OpenRuns(runs: Seq[SessionBuf])

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
    * buffers every not-yet-closeable run per user ([[OpenRuns]]) and
    * emits each once the watermark passes its end + gap (driven by the
    * event-time timeout on the earliest pending close). Late events
    * within the watermark extend, split, or bridge buffered runs. */
  def sessionizeStateful(events: DataFrame, gapMinutes: Int = 30,
                         latenessMinutes: Int = 30): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    // Shared close rule: a run is CLOSED once the watermark passes its
    // end + gap — only then can no in-horizon late event extend it (any
    // surviving event has ts >= watermark >= end + gap, which starts a
    // new session under the >= break). Runs still inside the horizon stay
    // buffered in state; the earliest pending close point drives the
    // event-time timeout. This matches session_window's emission timing
    // exactly, not just its bounds.
    def emit(uid: Long, s: SessionBuf): ClosedSession =
      ClosedSession(uid, new java.sql.Timestamp(s.startMs),
        new java.sql.Timestamp(s.endMs), s.n)
    events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"))
      .withWatermark("ts", s"$latenessMinutes minutes")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenRuns, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[OpenRuns]) =>
          val wm = state.getCurrentWatermarkMs()
          def settle(runs: Vector[SessionBuf]): Iterator[ClosedSession] = {
            val (closed, open) = runs.partition(_.endMs + gapMs <= wm)
            if (open.isEmpty) state.remove()
            else {
              state.update(OpenRuns(open))
              // min close point > wm by construction of `open`, as
              // setTimeoutTimestamp requires
              state.setTimeoutTimestamp(open.map(_.endMs + gapMs).min)
            }
            closed.sortBy(_.startMs).iterator.map(emit(uid, _))
          }
          if (state.hasTimedOut) {
            // watermark passed the earliest pending close point: emit
            // every run it has now passed, keep the rest buffered
            settle(state.get.runs.toVector)
          } else {
            // A micro-batch can carry SEVERAL sessions for one user.
            // Split the sorted batch into gap-separated runs. The gap
            // break is >=, matching session_window's [start, end)
            // semantics: an event exactly `gap` after the previous one
            // starts a NEW session.
            val ts = rows.map(_._2.getTime).toArray.sorted
            val runs = ts.foldLeft(Vector.empty[SessionBuf]) { (acc, t) =>
              acc.lastOption match {
                case Some(r) if t - r.endMs < gapMs =>
                  acc.init :+ SessionBuf(r.startMs, t, r.n + 1)
                case _ => acc :+ SessionBuf(t, t, 1L)
              }
            }
            // interval-merge ALL buffered open runs with the new ones —
            // an in-horizon late event can extend any of them, land
            // between two, or bridge them into one session
            val merged = (state.getOption.map(_.runs.toVector)
              .getOrElse(Vector.empty) ++ runs).sortBy(_.startMs)
              .foldLeft(Vector.empty[SessionBuf]) { (acc, r) =>
                acc.lastOption match {
                  case Some(p) if r.startMs - p.endMs < gapMs =>
                    acc.init :+ SessionBuf(p.startMs, math.max(p.endMs, r.endMs), p.n + r.n)
                  case _ => acc :+ r
                }
              }
            settle(merged)
          }
      }
  }
}
