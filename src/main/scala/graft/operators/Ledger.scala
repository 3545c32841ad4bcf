package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared batch-id ledger for the incremental indexes whose appends are
  * NOT idempotent by value — additive count segments ([[Corpus]] LM
  * stats, [[Profiling]] heavy-hitter sketches), where a replayed append
  * silently inflates counts and nothing downstream can tell. The guard
  * is an explicit id per append, recorded in a tiny parquet table next
  * to the index; a recorded id skips the append wholesale, which turns
  * foreachBatch's at-least-once replays into effective exactly-once
  * index growth.
  *
  * The membership read collects the ledger to the driver — rows = number
  * of appends over the index's lifetime, never data-sized. Sequential
  * writers only (the read-check-append pair is not fenced against a
  * concurrent append of the same id — same single-writer contract as the
  * index compactions).
  */
private[graft] object Ledger {

  /** Create/reset the ledger with the base marker recorded. */
  def init(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    Seq("__base__").toDF("batch_id")
      .write.mode("overwrite").parquet(path)
  }

  /** Is `batchId` already recorded? Callers check BEFORE writing their
    * payload and [[record]] AFTER it succeeds — so a crash inside the
    * payload write leaves the id unrecorded and the retry re-runs (the
    * replay window is the gap between payload completion and the record
    * landing; closing it needs a transactional table format, out of
    * scope — a failed append should be inspected, not blindly retried).
    */
  def contains(spark: SparkSession, path: String, batchId: String)
      : Boolean =
    spark.read.parquet(path)
      .collect().map(_.getString(0)).toSet
      .contains(batchId)

  /** Record `batchId` after its payload write succeeded. */
  def record(spark: SparkSession, path: String, batchId: String): Unit = {
    import spark.implicits._
    Seq(batchId).toDF("batch_id").write.mode("append").parquet(path)
  }
}
