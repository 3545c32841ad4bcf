package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Ledger
import graft.sources.Layout

/** Streaming ingestion into the partitioned z-ordered lake layout —
  * the sink that closes the loop between the Structured Streaming
  * sources and [[graft.sources.Layout]]'s partitioned write lifecycle:
  * each micro-batch lands as z-clustered files in its `k=v` leaves,
  * per-leaf manifests refresh incrementally (0-cost for untouched
  * leaves), and an optional compaction cadence keeps the daily-append
  * small-files pile bounded.
  *
  * EXACTLY-ONCE: a replayed micro-batch (restart from checkpoint —
  * foreachBatch redelivers the last uncommitted batch) would duplicate
  * ROWS through the file-level append, so every batch rides the
  * applied-batch [[graft.operators.Ledger]] at `root/_ingest_ledger`:
  * a recorded batch id returns without reading anything but the
  * ledger's pushed point filter. The id is recorded only AFTER the
  * append and manifest refresh land, which leaves the one crash window
  * every file-level append has — a crash between append and record
  * replays that single batch's rows. Id-keyed streams close it by
  * routing through [[cdcUpsert]] instead (the per-key delete half
  * makes a replay converge); append-only streams that need the window
  * closed should dedup downstream on an id (the stance
  * [[Layout.appendZOrdered]] documents).
  */
object LakeSink {

  /** Land one batch: ledger-guarded append + incremental manifest
    * refresh (+ compaction when due). Public so a replayed batch is
    * testable without driving a stream; returns true when the batch
    * was applied, false for a ledger-skipped replay.
    */
  def landBatch(batch: DataFrame, batchId: String, root: String,
                partCol: String, dims: Seq[String], filesPerBatch: Int,
                compactNow: Boolean = false, filesPerLeaf: Int = 8,
                maxFilesPerLeaf: Int = 32): Boolean = {
    val spark = batch.sparkSession
    val ledger = root.stripSuffix("/") + "/_ingest_ledger"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(ledger)))
      Ledger.init(spark, ledger)
    else if (Ledger.contains(spark, ledger, batchId)) return false
    if (!batch.isEmpty) {
      Layout.appendZOrderedPartitioned(batch, root, partCol, dims,
        filesPerBatch)
      Layout.updateManifestPartitioned(spark, root, dims): Unit
      if (compactNow)
        Layout.compactPartitioned(spark, root, dims, filesPerLeaf,
          maxFilesPerLeaf): Unit
    }
    Ledger.record(spark, ledger, batchId)
    true
  }

  /** The streaming face: `docs.writeStream` through [[landBatch]] per
    * micro-batch (batch ids are stable across checkpoint restarts, so
    * the ledger makes redelivery a no-op). `compactEvery = n` compacts
    * over-budget leaves every n-th batch; 0 disables (run it from a
    * maintenance job instead). Start with `.option("checkpointLocation",
    * …)` like any foreachBatch sink.
    */
  def partitionedZOrdered(docs: DataFrame, root: String, partCol: String,
                          dims: Seq[String], filesPerBatch: Int,
                          compactEvery: Int = 0, filesPerLeaf: Int = 8,
                          maxFilesPerLeaf: Int = 32): DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        landBatch(batch, s"stream_$batchId", root, partCol, dims,
          filesPerBatch,
          compactNow =
            compactEvery > 0 && batchId % compactEvery == compactEvery - 1,
          filesPerLeaf, maxFilesPerLeaf): Unit
    }

  /** CDC apply: each micro-batch MERGEs into a FLAT z-ordered table by
    * key ([[Layout.upsertByIds]] — manifest-pruned delete half, append
    * half, vault-closed crash window), with the upsert's own ledger
    * making redelivered batches exact no-ops. For id-keyed streams
    * this is the replay-safe landing path.
    */
  def cdcUpsert(updates: DataFrame, dataPath: String, dims: Seq[String],
                idCol: String, files: Int): DataStreamWriter[Row] =
    updates.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        if (!batch.isEmpty)
          Layout.upsertByIds(batch.sparkSession, dataPath, dims, idCol,
            batch, files, batchId = Some(s"stream_$batchId")): Unit
    }
}
