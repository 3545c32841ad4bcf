package graft

/** Wall-clock stage recorder for the lifecycle queries (q89–q95).
  *
  * Those queries deliberately bundle eager index work — build, append,
  * replayed append, compact — ahead of the lazy frame they return, so
  * their single bench timing is unattributable: VERDICT r7 could not
  * say whether q92's 73.8 s driver reading was the write, the manifest,
  * or the read without a local rerun. Each eager stage in SparkEntry is
  * now wrapped in [[timed]], and [[Bench]] emits the per-stage map of
  * the winning (min-total) rep next to the headline number, with the
  * residual (the returned frame's actual evaluation) reported as
  * `final_read`.
  *
  * Driver-side only, overhead two `nanoTime` calls per stage; recording
  * is keyed by query name so concurrent sessions (tests vs bench) can't
  * interleave stages of different queries. Not a metrics system — just
  * enough structure for a bench artifact a reader can attribute.
  */
object Stages {
  private val rec =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.LinkedHashMap[String, Double]]()

  /** Times `body` and records it as `stage` under `query`, preserving
    * stage order. Re-running a stage (bench reps) overwrites its slot.
    */
  def timed[A](query: String, stage: String)(body: => A): A = {
    val t0 = System.nanoTime()
    try body
    finally {
      val dt = (System.nanoTime() - t0) / 1e9
      rec.computeIfAbsent(query,
          _ => new java.util.LinkedHashMap[String, Double]())
        .put(stage, dt): Unit
    }
  }

  /** Drops `query`'s recorded stages (called between bench reps so a
    * rep's map never mixes stages from two runs). */
  def clear(query: String): Unit = { rec.remove(query): Unit }

  /** The stages recorded for `query` since the last [[clear]], in
    * execution order; empty for non-lifecycle queries. */
  def snapshot(query: String): Seq[(String, Double)] = {
    val m = rec.get(query)
    if (m == null) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      m.asScala.toSeq
    }
  }
}
