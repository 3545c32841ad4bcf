package graft.engine

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Bookmark state — the reference's only mutable state: a per-user ordered
  * BBL list with toggle semantics (add if absent, remove if present,
  * insertion order preserved; reference webserver/server.py:538-558).
  *
  * Two forms: a pure in-memory toggle (what the Flask session cookie did)
  * and a Structured Streaming `mapGroupsWithState` operator for the
  * at-scale variant (state sharded by user across the cluster).
  */
object Bookmarks {

  /** Pure toggle, insertion order preserved (server.py:548-552). */
  def toggle(saved: Seq[String], bbl: String): Seq[String] =
    if (saved.contains(bbl)) saved.filterNot(_ == bbl) else saved :+ bbl

  /** `seq` totally orders one user's toggles (r12): mapGroupsWithState
    * gives NO intra-group ordering guarantee — two same-trigger events
    * from different input partitions can reach the fold in either
    * order, and toggle order decides both membership (an on/off pair)
    * and the insertion order the reference contract pins. The event
    * producer assigns it (an HTTP tier's per-session counter, a log
    * offset); ties are a producer bug and break deterministically by
    * bbl.
    */
  case class ToggleEvent(userId: Long, bbl: String, seq: Long)
  case class UserBookmarks(userId: Long, bbls: Seq[String])

  /** Streaming toggle: one state entry per user, updated per toggle event
    * in `seq` order, emitting the user's current list after each batch.
    */
  def toggleStream(events: Dataset[ToggleEvent]): Dataset[UserBookmarks] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .mapGroupsWithState[Seq[String], UserBookmarks](
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[ToggleEvent], state: GroupState[Seq[String]]) =>
          val start = state.getOption.getOrElse(Seq.empty)
          // one user's one-trigger batch is interaction-sized: sorting
          // it is free, and it is what makes the fold deterministic
          val ordered = batch.toSeq.sortBy(e => (e.seq, e.bbl))
          val updated = ordered.foldLeft(start)((acc, e) => toggle(acc, e.bbl))
          state.update(updated)
          UserBookmarks(userId, updated)
      }
  }
}
