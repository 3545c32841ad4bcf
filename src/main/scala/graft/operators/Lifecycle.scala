package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, max, min}

/** The shared mechanics of the persisted-index lifecycle (VERDICT r7
  * item 7): every family (digest, MinHash, SimHash, IVF, LSH, LM stats,
  * HH sketch, layout manifest) hand-rolled the same two patterns —
  * factored here so a fix lands once. Pure extraction: call sites keep
  * bit-identical plans and file layouts.
  *
  * Public (not `private[graft]`) since r12: [[gcStaged]] is the
  * crash-recovery command operators point users at, so it must be
  * callable from outside the package.
  */
object Lifecycle {

  /** Staged rewrite + promote: write the replacement table next to the
    * live one, then [[Dedup.swapTable]] it into place (retire-first
    * rename discipline, never delete-then-write). The staged path is
    * handed to `write` so each family keeps its own layout choices.
    *
    * COLLISION DETECTION (VERDICT r8): writers are serialized per index
    * path by contract, but the contract is now mechanical, not
    * documentary — a staged directory that already exists means either
    * a live concurrent writer mid-swap or a dead writer's crash residue,
    * and both fail LOUDLY here instead of silently clobbering the other
    * writer's half-written staged table (the failure mode of two
    * compactions racing: whichever promoted second would swap in a
    * directory the first was still writing). The live table is intact
    * in every branch of this failure; recovery is in the message.
    */
  def stagedSwap(spark: SparkSession, live: String)
                (write: String => Unit): Unit = {
    val staged = s"${live}_compacting"
    val fs = new org.apache.hadoop.fs.Path(live)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sp = new org.apache.hadoop.fs.Path(staged)
    if (fs.exists(sp))
      throw new IllegalStateException(
        s"staged directory $staged already exists: either a concurrent " +
          s"writer is mid-rewrite on $live (writers must be serialized " +
          "per index path) or a previous writer crashed before its swap. " +
          s"The live table at $live is intact. After confirming no other " +
          s"writer is running, delete $staged and retry " +
          s"(age-gated: Lifecycle.gcStaged(spark, \"$live\", olderThanMs)).")
    write(staged)
    Dedup.swapTable(spark, live, staged)
  }

  /** Age-gated reclamation of [[stagedSwap]] crash residue. A staged
    * directory whose NEWEST mtime (the directory or any file under it —
    * an active writer keeps touching files, so the newest child mtime is
    * the liveness signal; the dir's own mtime only moves on child
    * add/remove) is at least `olderThanMs` old is dead residue: delete
    * it and return true. A YOUNGER staged directory may be a live
    * concurrent writer mid-rewrite — throw exactly like [[stagedSwap]]
    * does, so the age gate can never clobber in-flight work. Returns
    * false when there is no residue at all. The live table is untouched
    * in every branch.
    *
    * Pick `olderThanMs` well above the slowest rewrite you run (e.g. a
    * day): the cost of a too-large bound is one manual retry later; the
    * cost of a too-small bound is the race this gate exists to prevent.
    */
  def gcStaged(spark: SparkSession, live: String,
               olderThanMs: Long): Boolean = {
    val staged = s"${live}_compacting"
    val fs = new org.apache.hadoop.fs.Path(live)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sp = new org.apache.hadoop.fs.Path(staged)
    if (!fs.exists(sp)) return false
    def newest(p: org.apache.hadoop.fs.Path): Long = {
      val st = fs.getFileStatus(p)
      if (!st.isDirectory) st.getModificationTime
      else (st.getModificationTime +:
        fs.listStatus(p).map(s => newest(s.getPath)).toSeq).max
    }
    val age = System.currentTimeMillis() - newest(sp)
    if (age < olderThanMs)
      throw new IllegalStateException(
        s"staged directory $staged was written ${age}ms ago, younger " +
          s"than the $olderThanMs ms gc bound — a concurrent writer may " +
          s"be mid-rewrite on $live. The live table is intact; nothing " +
          "was deleted. Retry once the staging is provably dead, or " +
          "delete it manually after confirming no writer is running.")
    // HDFS/S3A report failure as `false`, not an exception — a receipt
    // claiming reclaimed=true over a still-present staging would send
    // the next stagedSwap straight back into the collision the caller
    // thought they had cleared
    require(fs.delete(sp, true),
      s"gcStaged: filesystem refused to delete $staged — residue intact")
    true
  }

  /** The idempotence anti-join every id-keyed append runs, with its
    * history side RANGE-PRUNED to the batch's [min, max] id span: an
    * indexed id outside the span cannot equal any batch id, so the
    * restriction is lossless, and the id-sorted layouts the writers
    * keep turn the pushed range predicate into parquet row-group/file
    * skips — append cost is bounded by the id-range OVERLAP between
    * batch and history (≈ zero under monotonic id assignment), never by
    * reading all history ids. Costs one driver job for the bounds.
    *
    * `rawBatch`/`rawIdCol` supply the bounds (the caller's original
    * frame); `batch` and `indexIds` must both carry `idCol`, the join
    * key. Null batch ids never anti-join away, so callers drop them
    * first (or, like SimHash, dedup to one row per id).
    */
  def freshByIdRange(batch: DataFrame, rawBatch: DataFrame,
                     rawIdCol: String, indexIds: DataFrame,
                     idCol: String): DataFrame = {
    val bounds = rawBatch.agg(min(col(rawIdCol)), max(col(rawIdCol))).head()
    val seen =
      if (bounds.isNullAt(0)) indexIds.limit(0) // no non-null batch ids
      else indexIds.where(col(idCol) >= lit(bounds.get(0)) &&
        col(idCol) <= lit(bounds.get(1)))
    batch.join(seen, Seq(idCol), "left_anti")
  }
}
