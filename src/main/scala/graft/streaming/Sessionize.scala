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

  /** Epoch-micros → Timestamp, shared by the batch fold and the
    * streaming state machine (their outputs are pinned to agree —
    * one conversion, zero drift). */
  private def microsToTs(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      us / 1000000L, (us % 1000000L) * 1000L))

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

  // --- duration-capped sessions (custom state, not session_window) --
  //
  // The session shape session_window CANNOT express: a session closes
  // on inactivity (> gap, the usual rule) OR when admitting an event
  // would stretch it past a maximum duration `cap` — the analytics
  // contract behind "a session is at most 24 h" reporting. The cap
  // makes assignment inherently SEQUENTIAL per user (whether event i
  // starts a session depends on where the previous session started),
  // so the batch face is a per-user sorted fold and the streaming face
  // is flatMapGroupsWithState with an event-time timeout — the one
  // §2.8 state API the engine had not yet needed.

  /** Join rule, shared by both faces and the q116 oracle: an event
    * extends the current session iff `ts − lastTs <= gap` AND
    * `ts − sessionStart <= cap` (both inclusive, matching
    * [[sessions]]' touching-merges boundary); otherwise it starts a
    * new one. Events fold in (ts) order; equal timestamps fold to the
    * same sessions whatever their mutual order (a 0 gap always joins).
    */
  private def foldSessions(ts: Seq[Long], gapUs: Long,
                           capUs: Long): Seq[(Long, Long, Long)] = {
    // (start, end, n) per session, over epoch-micros sorted ascending
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    ts.foreach { t =>
      if (out.nonEmpty && t - out.last._2 <= gapUs &&
          t - out.last._1 <= capUs) {
        val (s, _, n) = out.remove(out.size - 1)
        out += ((s, t, n + 1))
      } else out += ((t, t, 1L))
    }
    out.toSeq
  }

  private def intervalMicros(s: String, name: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(s))
    require(iv.months == 0, s"$name must not use month units: '$s'")
    iv.days * 86400000000L + iv.microseconds
  }

  /** Batch face: sessions per user under the gap AND the duration cap.
    * One shuffle on the user key, a sorted in-partition fold, no
    * window over history. Returns
    * `(userCol, session_start, session_end, n_events)`.
    */
  def cappedSessions(events: DataFrame, userCol: String, tsCol: String,
                     gap: String, cap: String): DataFrame = {
    val gapUs = intervalMicros(gap, "gap")
    val capUs = intervalMicros(cap, "cap")
    require(capUs >= gapUs, s"cap $cap below gap $gap closes every " +
      "multi-event session at birth — surely not intended")
    // null timestamps carry no session evidence and would NPE the
    // primitive getLong inside the fold — drop them like the
    // session_window face does (PERMISSIVE ingest routinely emits them)
    val src = events.select(col(userCol), col(tsCol))
      .filter(col(tsCol).isNotNull)
      .repartition(col(userCol))
      .sortWithinPartitions(col(userCol), col(tsCol))
    val userType = src.schema(userCol).dataType
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(userCol, userType),
      org.apache.spark.sql.types.StructField("session_start",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("session_end",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("n_events",
        org.apache.spark.sql.types.LongType)))
    val micros = src.withColumn("__us", unix_micros(col(tsCol)))
    micros.mapPartitions { it =>
      // partition holds whole users, sorted (user, ts). The fold rule
      // only ever consults the CURRENT session's (start, end, n), so
      // that triple is the whole per-user state (VERDICT r9: buffering
      // a user's full timestamp vector makes one bot user an executor
      // OOM at 100× scale) — and sessions stream out as they close, so
      // partition output is never materialized either. O(1) memory per
      // partition regardless of the hottest user.
      new scala.collection.AbstractIterator[org.apache.spark.sql.Row] {
        private def toTs(us: Long) = microsToTs(us)
        private var curUser: Any = null
        private var sStart = 0L
        private var sEnd = 0L
        private var n = 0L
        private var active = false
        private var pending: org.apache.spark.sql.Row = null
        private def closed(): org.apache.spark.sql.Row =
          org.apache.spark.sql.Row(curUser, toTs(sStart), toTs(sEnd), n)
        // same join rule as foldSessions: extend iff same user, within
        // gap of the last event AND within cap of the session start
        private def advance(): Unit = {
          while (pending == null && it.hasNext) {
            val r = it.next()
            val u = r.get(0)
            val t = r.getLong(2)
            if (active && u == curUser && t - sEnd <= gapUs &&
                t - sStart <= capUs) { sEnd = t; n += 1 }
            else {
              if (active) pending = closed()
              curUser = u; sStart = t; sEnd = t; n = 1; active = true
            }
          }
          if (pending == null && active && !it.hasNext) {
            pending = closed(); active = false
          }
        }
        def hasNext: Boolean = { advance(); pending != null }
        def next(): org.apache.spark.sql.Row = {
          advance()
          val r = pending
          if (r == null) throw new NoSuchElementException("next on empty")
          pending = null
          r
        }
      }
    }(org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema))
      .toDF(userCol, "session_start", "session_end", "n_events")
  }

  /** Streaming face (Long user keys, the typed-state convention of
    * [[graft.engine.Bookmarks]]): events buffer per user in
    * flatMapGroupsWithState state; an EVENT-TIME timeout fires once
    * the watermark passes `last buffered ts + gap`, the buffer folds
    * with the SAME rule as the batch face, sessions whose
    * `end + gap < watermark` are emitted (no future event can extend
    * them — anything later than the watermark is, by the fold rule,
    * a new session), and the still-extendable tail stays buffered.
    * State per user = events inside the watermark horizon.
    */
  def cappedSessionsStream(events: DataFrame, userCol: String,
                           tsCol: String, gap: String, cap: String,
                           watermark: String): DataFrame = {
    val gapUs = intervalMicros(gap, "gap")
    val capUs = intervalMicros(cap, "cap")
    // same degenerate-config guard as the batch face (ADVICE r9: the
    // two faces must fail identically)
    require(capUs >= gapUs, s"cap $cap below gap $gap closes every " +
      "multi-event session at birth — surely not intended")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    events
      .select(col(userCol).cast("long").as("u"),
        col(tsCol).cast("timestamp").as("ts"))
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], (Long, java.sql.Timestamp,
          java.sql.Timestamp, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, it, state) =>
          def toTs(us: Long) = microsToTs(us)
          val buffered = (state.getOption.getOrElse(Seq.empty) ++
            it.map(e => e._2.getTime * 1000L +
              (e._2.getNanos / 1000) % 1000)).sorted
          if (buffered.isEmpty) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs() * 1000L
            val sessions = foldSessions(buffered, gapUs, capUs)
            val (closed, open) =
              sessions.partition { case (_, e, _) => e + gapUs < wm }
            val keep = open.flatMap { case (s, e, _) =>
              buffered.filter(t => t >= s && t <= e) }
            if (keep.isEmpty) state.remove() else state.update(keep)
            if (keep.nonEmpty)
              state.setTimeoutTimestamp((keep.max + gapUs) / 1000L + 1L)
            closed.iterator.map { case (s, e, n) =>
              (user, toTs(s), toTs(e), n) }
          }
      }
      .toDF(userCol, "session_start", "session_end", "n_events")
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
