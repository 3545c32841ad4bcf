package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the continuous-ingest twin of
  * [[graft.operators.Dedup.exact]]: drop documents whose content digest was
  * already seen, keyed on md5(text) so the dedup state stores 16-byte
  * digests, never document bodies.
  *
  * Two state regimes, chosen by `withinWatermark`:
  *  - unbounded (`None`): `dropDuplicates` on the digest — state grows with
  *    the number of DISTINCT documents forever. Correct, but only viable
  *    for bounded backfills.
  *  - watermarked (`Some(horizon)`): `dropDuplicatesWithinWatermark` —
  *    a duplicate is only suppressed while its first occurrence is within
  *    the event-time horizon, and Spark EVICTS digest state once the
  *    watermark passes it. This is the 100 TB regime: state is bounded by
  *    the distinct-docs-per-horizon rate, and near-in-time duplicate
  *    floods (retried loads, crawler re-fetches — the common case) are
  *    still collapsed.
  *
  * The default regime also works on a batch frame (plain dropDuplicates),
  * which is what the spec's streaming≡batch check uses; the watermarked
  * regime is STREAMING-ONLY — Spark rejects
  * `dropDuplicatesWithinWatermark` on batch datasets, so batch backfills
  * use `withinWatermark = false`.
  */
object StreamingDedup {

  /** Add the 16-byte dedup key. */
  def withDigest(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("digest", md5(col(textCol)))

  /** Deduplicate a (possibly streaming) doc frame on content digest. With
    * `withinWatermark` the frame must be streaming and the caller must
    * have set an event-time watermark (`withWatermark`) already.
    */
  def dedup(docs: DataFrame, textCol: String,
            withinWatermark: Boolean = false): DataFrame = {
    val keyed = withDigest(docs, textCol)
    if (withinWatermark) keyed.dropDuplicatesWithinWatermark("digest")
    else keyed.dropDuplicates("digest")
  }

  /** Drop stream documents whose content digest already exists in a
    * static HISTORY table — the stream-static stage in front of [[dedup]]
    * and the streaming face of the incremental-dedup workflow
    * ([[graft.operators.Dedup.saveMinhashIndex]] family): history lives
    * in a persisted digest table joined per micro-batch (left anti — no
    * streaming state at all; Spark re-plans the static side per batch, so
    * a small history broadcasts), while within-stream duplicates stay in
    * the watermarked state store via [[dedup]]. Compose both:
    * `dedup(againstHistory(docs, "text", history), "text", true)`.
    */
  def againstHistory(docs: DataFrame, textCol: String,
                     historyDigests: DataFrame): DataFrame =
    // null-safe: md5(NULL) = NULL never equals the history's null digest
    // row under plain equality, so null-text rows would pass every batch
    // (same fix as Dedup.incrementalExact)
    withDigest(docs, textCol)
      .join(historyDigests.select(col("digest").as("__hist_digest")),
        col("digest") <=> col("__hist_digest"), "left_anti")

  /** Flag stream documents that NEAR-duplicate the persisted history: band
    * each incoming doc with the signature family pinned in the MinHash
    * index's metadata ([[graft.operators.Dedup.saveMinhashIndex]]), join
    * the static band table per micro-batch, and emit one row per
    * (stream doc, history doc) candidate with the signature-agreement
    * similarity estimate.
    *
    * STATELESS by construction: each hit is emitted only from its FIRST
    * agreeing band ([[graft.operators.Dedup.firstBandPairs]] — a plain
    * codegen'd predicate, no state store), and the index side is a PLAIN
    * SCAN: the write-time invariant ([[graft.operators.Dedup.saveMinhashIndex]]
    * / [[graft.operators.Dedup.appendMinhashIndex]]: deduped,
    * per-bucket-capped) replaced the per-micro-batch dropDuplicates +
    * cap-window this operator used to run over the ENTIRE index — two
    * full-history shuffles per batch that grew forever.
    *
    * Static-side costs that remain are per-JOIN, not per-history-shuffle:
    * a small index broadcasts; a large one should use [[nearDupsEachBatch]],
    * whose foreachBatch plan additionally prunes the index to the
    * buckets the batch touches before the join (a continuous plan cannot
    * express that semi-join — the static side would reference the
    * stream). The static side's file listing is resolved when this
    * operator is called — rows appended to the index are picked up on
    * the next query (re)start, not mid-stream.
    *
    * Flood-cap trade (same spirit as the batch star fallback): the index
    * keeps each bucket's first `max_bucket` members, so in a boilerplate
    * flood a pair whose EARLIEST agreeing band sat in a capped bucket is
    * missed even if a later band's row survived (the first-agreeing-band
    * predicate consults signatures, which don't know about the cap).
    * Outside floods the cap never binds; where exactness under floods
    * matters more than bounded work, build the index with a larger
    * `maxBucket`.
    */
  def nearDupsAgainstIndex(docs: DataFrame, idCol: String,
                           textCol: String, indexPath: String): DataFrame = {
    import graft.operators.Dedup
    val spark = docs.sparkSession
    val meta = Dedup.readMinhashMeta(spark, indexPath)
    val streamBands = Dedup.bandRows(docs, idCol, textCol,
      meta.shingleN, meta.numHashes, meta.bands)
    // tombstones apply here like every other probe
    // (deleteFromMinhashIndex's contract: deleted ids stop surfacing
    // from the streaming faces IMMEDIATELY, not at the next
    // compaction) — this continuous face was the one reader skipping
    // the sidecar (ADVICE-class r12 review find)
    Dedup.firstBandPairs(streamBands,
      graft.operators.Tombstones.applyTo(
        spark.read.parquet(s"$indexPath/bands"), "id",
        s"$indexPath/tombstones"),
      meta.numHashes / meta.bands, idCol)
  }

  /** The 100 TB face of [[nearDupsAgainstIndex]]: run the flagger in
    * `foreachBatch`, where each micro-batch is a BATCH frame and the
    * full batch toolkit applies — [[graft.operators.Dedup.flagAgainstIndex]]
    * semi-joins the index down to the buckets the batch touches BEFORE
    * the pair join, so per-batch work is bounded by the batch (plus the
    * pruned index scan), never by history, and the per-batch band cache
    * is released as soon as `sink` returns (a continuous plan's
    * session-lifetime cache would accumulate across micro-batches).
    *
    * `sink` receives (flagged pairs, batchId) per micro-batch — write
    * them to a table, alert on them, or join them back to the batch;
    * returns the writer for the caller to configure and `.start()`.
    */
  def nearDupsEachBatch(docs: DataFrame, idCol: String, textCol: String,
                        indexPath: String)(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.Dedup
    // family pinned ONCE at stream definition (meta is immutable for a
    // stamped index) — re-reading it per micro-batch would add a
    // driver-side head() job to every batch
    val meta = Dedup.readMinhashMeta(docs.sparkSession, indexPath)
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
       batchId: Long) =>
        val (flags, banded) =
          Dedup.flagCore(batch, indexPath, idCol, textCol, Some(meta))
        try sink(flags, batchId)
        finally banded.unpersist(blocking = false)
    }
  }

  /** SimHash twin of [[nearDupsEachBatch]]: per micro-batch, mine
    * near-dup pairs (batch×history via the persisted fingerprint index's
    * pigeonhole blocks, plus batch-internal pairs) with
    * [[graft.operators.Dedup.incrementalSimhashPairs]] semantics, hand
    * them to `sink`, then release the batch's persisted frames — the
    * cheap 16-byte-per-doc tier for streams whose history is too large
    * for a MinHash band table.
    *
    * Per-batch work is bounded by the batch plus the touched-block index
    * rows (the core's semi-join prunes history BEFORE the pair join);
    * the caller may grow the index from inside `sink` via
    * [[graft.operators.Dedup.appendSimhashIndex]] — appended rows are
    * seen from the next micro-batch's index scan, mirroring the MinHash
    * face's restart-visibility note.
    */
  def simhashNearDupsEachBatch(docs: DataFrame, idCol: String,
                               textCol: String, indexPath: String,
                               maxHamming: Int = 3, blocks: Int = 4,
                               maxBucket: Int = 10000)
                              (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.Dedup
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
       batchId: Long) =>
        val (pairs, handles) = Dedup.incrementalSimhashCore(batch,
          indexPath, idCol, textCol, maxHamming, blocks, maxBucket)
        try sink(pairs, batchId)
        finally handles.foreach(_.unpersist(blocking = false))
    }
  }

  /** Deterministic batch twin of the streaming first-wins semantics: for
    * each value of `digestCol`, keep the row that is FIRST in
    * (orderCol, tieCol) order — exactly the row a streaming dedup sees
    * first when the log is replayed in that order. (Batch
    * `dropDuplicates` keeps an arbitrary row per key; a contract query
    * needs the order-defined one.)
    *
    * One hash aggregate with a `min_by` on the full row struct — map-side
    * combinable, no window, and the shuffle carries one candidate row per
    * (partition, digest), not the duplicate flood.
    */
  def firstWins(keyed: DataFrame, digestCol: String, orderCol: String,
                tieCol: String): DataFrame = {
    val cols = keyed.columns.toIndexedSeq
    keyed
      .groupBy(col(digestCol))
      .agg(min_by(struct(cols.map(col): _*),
        struct(col(orderCol), col(tieCol))).as("__first"))
      .select(cols.map(c => col(s"__first.$c").as(c)): _*)
  }
}
