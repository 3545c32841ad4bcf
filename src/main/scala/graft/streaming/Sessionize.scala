package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The streaming face of gap-based sessionization, layered on the
  * batch operator ([[graft.operators.TimeSeries.sessionize]], the q33
  * §2.7 entry — ONE session_window call site, this wrapper adds no
  * second implementation): a watermark hook so the same transform runs
  * incrementally in Structured Streaming (merging-interval state per
  * in-flight session, evicted once the watermark passes its close), a
  * last-EVENT `session_end` (the batch operator reports the window
  * end, which includes the trailing gap), and per-user session
  * statistics.
  *
  * Semantics (pinned in SessionizeSpec): an event's window is
  * [ts, ts+gap]; windows merge when they TOUCH, so an event exactly
  * `gap` after its predecessor still extends the session and a break
  * needs silence strictly EXCEEDING the gap — the lag-based SQL
  * equivalent breaks when `ts - lag(ts) > gap`, which is exactly how
  * the q109 oracle re-derives it.
  *
  * Scale: the groupBy shuffles once on (user, merged window) with
  * partial aggregation; batch cost is the one shuffle, streaming state
  * is bounded by watermark horizon × active users.
  */
object Sessionize {

  /** Sessions per `userCol`: one row per session with
    * `(user, session_start, session_end, n_events, extraAggs...)`.
    * `session_end` is the LAST EVENT's timestamp (not window end —
    * window end includes the trailing gap). Pass `watermark` on a
    * streaming frame (append mode emits a session only once the
    * watermark passes its close).
    */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               gap: String, extraAggs: Seq[Column] = Nil,
               watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark(tsCol, w))
    val aggd = graft.operators.TimeSeries.sessionize(src, userCol, tsCol,
        gap,
        Seq(max(col(tsCol)).as("__last"),
          count(lit(1)).as("n_events")) ++ extraAggs)
      .withColumn("session_end", col("__last")) // last event, not +gap
      .drop("__last")
    val rest = aggd.columns
      .filterNot(Set(userCol, "session_start", "session_end", "n_events"))
    aggd.select(col(userCol) +: col("session_start") +:
      col("session_end") +: col("n_events") +: rest.map(col).toSeq: _*)
  }

  /** Per-user session summary over [[sessions]]' output: the dashboard
    * row a behavioral pipeline derives (session counts, mean events
    * per session, mean session seconds). Duration is end − start in
    * seconds; single-event sessions count 0 seconds.
    */
  def sessionStats(sess: DataFrame, userCol: String): DataFrame =
    sess.groupBy(col(userCol))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        (sum(col("n_events")) / count(lit(1))).as("events_per_session"),
        (sum(unix_micros(col("session_end")) -
          unix_micros(col("session_start"))).cast("double") / 1e6 /
          count(lit(1))).as("mean_session_sec"))
}
