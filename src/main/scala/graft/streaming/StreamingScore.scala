package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Corpus
import graft.sources.Layout

/** Streaming faces for corpus quality scoring against the persisted
  * incremental LM-stats index ([[graft.operators.Corpus.saveLmStats]]
  * family) — the stream-side of the "never re-tokenize history" story.
  */
object StreamingScore {

  /** Per micro-batch LM quality scoring: each batch is scored against
    * the index with [[Corpus.lmScoreAgainstStats]]'s exact arithmetic
    * and handed to `sink`. Per-batch cost is the batch's own tokenize +
    * vocab-bounded count joins; history documents are never read.
    *
    * Score-and-learn: the caller may grow the index from inside `sink`
    * via [[Corpus.appendLmStats]] keyed by this batch id (e.g.
    * `s"stream-$batchId"`). foreachBatch is AT-LEAST-ONCE — a recovered
    * query can re-run a batch — and doubled counts are undetectable
    * downstream, which is exactly what the index's batch-id ledger
    * guards: a replayed RECORDED append is skipped wholesale, and a
    * crash mid-append converges on retry because `appendLmStats` stages
    * both count tables and promotes them under batch-tagged names (the
    * retry removes any partial promotion first) — together, exactly-once
    * index growth for any crash point. Appended counts are visible from
    * the NEXT micro-batch's index read (this batch already resolved its
    * count frames), matching the dedup faces' visibility note.
    */
  def lmScoreEachBatch(docs: DataFrame, idCol: String, textCol: String,
                       indexPath: String)(sink: (DataFrame, Long) => Unit)
      : DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        sink(Corpus.lmScoreAgainstStats(batch, indexPath, idCol, textCol),
          batchId)
    }

  /** Per micro-batch decontamination against a persisted probe-gram
    * index ([[Corpus.saveProbeGrams]]): `sink` receives each batch's
    * CLEAN rows — documents sharing any n-gram with the benchmark suite
    * are dropped before they ever land in training data. Probe text is
    * never re-tokenized; per-batch cost is the batch scan plus a join
    * against the suite-bounded gram set.
    */
  def decontaminateEachBatch(docs: DataFrame, idCol: String,
                             textCol: String, indexPath: String)
                            (sink: (DataFrame, Long) => Unit)
      : DataStreamWriter[Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], batchId: Long) =>
        sink(Corpus.decontaminateAgainstIndex(batch.toDF(), indexPath,
          idCol, textCol), batchId)
    }

  /** Z-ordered streaming ingest: each micro-batch lands as
    * [[Layout.appendZOrdered]] files (clustered within the batch — at
    * 100 TB a batch is a day, and a day clusters itself) followed by the
    * new-files-only [[Layout.updateManifest]], so the landed table is
    * manifest-prunable the moment the batch commits. Per-batch DATA work
    * is O(batch) — no table rescan, ever — but the manifest update's
    * METADATA side (the directory listing and the manifest-name read)
    * grows with cumulative file count over the stream's lifetime, like
    * any parquet directory read; bound it by compacting files, or by
    * ROTATING the sink across per-period landing paths (one flat
    * directory per day, each with its OWN manifest — a manifest is
    * per-flat-directory, and [[Layout.updateManifest]] rejects a
    * subdirectory-partitioned path loudly; a single manifest at the
    * root of a partitioned tree would see no files and prune
    * everything).
    *
    * foreachBatch is AT-LEAST-ONCE and a raw file append has no ledger —
    * a replayed batch writes duplicate ROWS (the scaladoc caveat on
    * [[Layout.appendZOrdered]]). Route at-least-once upstreams through
    * the streaming dedup faces first, or fence replays at the source;
    * this sink's own job is layout, not delivery semantics. `files` is
    * per batch; empty batches write nothing and stat nothing.
    */
  def zorderedSinkEachBatch(rows: DataFrame, dataPath: String,
                            colA: String, colB: String, files: Int,
                            dims: Seq[String]): DataStreamWriter[Row] =
    rows.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          Layout.appendZOrdered(batch.toDF(), dataPath, colA, colB, files)
          Layout.updateManifest(batch.sparkSession, dataPath, dims): Unit
        }
    }
}
