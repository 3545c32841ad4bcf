package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators ([[Dedup.connectedComponents]],
  * [[Graph.pageRank]]): an iterative frame's LOGICAL plan doubles every
  * round (persist caches only the physical result — analysis still walks
  * the whole history), so by round k Catalyst is optimizing a 2^k-node
  * plan. Checkpointing truncates the lineage so every round's plan is
  * constant-size.
  *
  * Two modes, selected by the session's checkpoint directory:
  *
  *  - `sc.getCheckpointDir` SET → reliable `.checkpoint()`: blocks are
  *    written to the (HDFS/S3/cluster-visible) checkpoint directory, so
  *    an executor loss mid-build re-reads them instead of finding the
  *    truncated lineage unrecomputable. This is the 100 TB deployment
  *    mode — a multi-hour index build must survive executor churn.
  *    FILE LIFETIME: checkpoint files are NOT deleted when an iteration
  *    releases its predecessor (unpersist touches the cache only) —
  *    Spark reclaims them via the ContextCleaner only when
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default
  *    false). A production deployment should set that conf, or point
  *    the checkpoint dir at a job-scoped path it deletes after the
  *    build; otherwise a k-round build leaves k label-table snapshots
  *    on the checkpoint filesystem.
  *  - UNSET → `localCheckpoint()`: blocks live in executor storage and
  *    are reclaimed by unpersist/executor exit. No filesystem
  *    round-trip (faster), but an executor loss kills the lineage — the
  *    single-JVM / interactive trade, and this sandbox's default.
  *
  * Both modes are EAGER (the frame materializes at the call) and neither
  * preserves outputPartitioning into the next round's join — the plans
  * downstream of either mode are identical (`Scan ExistingRDD`), so the
  * mode never changes results or plan shape, only fault tolerance.
  */
private[graft] object Checkpoints {

  /** Session conf escape hatch: `true` forces `localCheckpoint()` even
    * when the context has a checkpoint directory. For sessions whose
    * checkpoint dir serves OTHER jobs (a shared notebook context, a
    * test JVM) where graft's iterative builds should stay
    * executor-local — and it is settable per session and un-settable,
    * unlike the context's checkpoint dir, which has no public unset.
    */
  val ForceLocalKey = "spark.graft.localCheckpoint"

  /** Truncate `df`'s lineage: reliable checkpoint when the session has a
    * checkpoint directory (unless [[ForceLocalKey]] overrides),
    * executor-local otherwise.
    */
  def truncate(df: DataFrame): DataFrame = {
    val sess = df.sparkSession
    val forceLocal = sess.conf.get(ForceLocalKey, "false").toBoolean
    if (!forceLocal && sess.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
  }

  /** Release a frame produced by [[truncate]] when the iteration is
    * done with it. `Dataset.unpersist` is a NO-OP here — it only drops
    * CacheManager entries, while a checkpointed frame's blocks are
    * RDD-persisted under a `LogicalRDD` plan — so the old rounds'
    * label/rank snapshots accumulated in executor storage for the
    * whole build, waiting on the ContextCleaner's GC. Unpersisting the
    * underlying RDD frees the blocks immediately (for reliable
    * checkpoints the FILES still follow the lifetime note above; this
    * releases their cached blocks only).
    */
  def release(df: DataFrame): Unit = df.queryExecution.logical match {
    case l: org.apache.spark.sql.execution.LogicalRDD =>
      l.rdd.unpersist(blocking = false): Unit
    case _ => df.unpersist(blocking = false): Unit
  }
}
