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
  * The membership read is a pushed-down point filter over the ledger
  * table — NOTHING is collected to the driver, so driver memory is flat
  * no matter how many appends the index has seen (a per-minute
  * streaming sink writes ~525 k ledger rows/year; the check stays one
  * small filtered scan, and [[compact]] folds the accumulated
  * one-row files down on the operator's schedule). Sequential writers
  * only (the read-check-append pair is not fenced against a concurrent
  * append of the same id — same single-writer contract as the index
  * compactions).
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
    * retry converges when the payload write is crash-idempotent, as
    * `appendLmStats`'s staged promotion is). A pushed-down equality
    * filter + limit 1, never a driver-side set.
    */
  def contains(spark: SparkSession, path: String, batchId: String)
      : Boolean = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(path)
      .filter(col("batch_id") === batchId)
      .limit(1).head(1).nonEmpty
  }

  /** Record `batchId` after its payload write succeeded. */
  def record(spark: SparkSession, path: String, batchId: String): Unit = {
    import spark.implicits._
    Seq(batchId).toDF("batch_id").write.mode("append").parquet(path)
  }

  /** Fold the one-file-per-append ledger down to one file, rows exactly
    * preserved (staged write + swap, single-writer contract). Run on
    * the same schedule as the owning index's compaction — the ledger's
    * cost is file COUNT, not row count.
    */
  def compact(spark: SparkSession, path: String): Unit =
    Lifecycle.stagedSwap(spark, path) { staged =>
      spark.read.parquet(path).distinct().coalesce(1)
        .write.mode("overwrite").parquet(staged)
    }
}
