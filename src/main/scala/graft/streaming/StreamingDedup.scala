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
    * STATELESS by construction, which takes care of the multi-band
    * duplicate problem without a state store: a pair that agrees on
    * several bands would surface once per band, and a streaming
    * dropDuplicates would need unbounded state — instead each hit is
    * emitted only from its FIRST agreeing band (both signatures are
    * present after the join, so "no earlier band agrees" is a plain
    * codegen'd predicate). Exactly-one-row-per-pair, zero state.
    *
    * The static side's file listing is resolved when this operator is
    * called — rows appended to the index are picked up on the next
    * query (re)start, not mid-stream; the per-batch join itself re-plans
    * (a small index broadcasts).
    *
    * Flood-cap trade (same spirit as the batch star fallback): capping
    * keeps each bucket's `maxBucket` lowest-id members, so in a
    * boilerplate flood a pair whose EARLIEST agreeing band sat in a
    * capped bucket is missed even if a later band's row survived (the
    * first-agreeing-band predicate consults signatures, which don't know
    * about the cap). Outside floods the cap never binds; where exactness
    * under floods matters more than bounded work, raise `maxBucket`.
    */
  def nearDupsAgainstIndex(docs: DataFrame, idCol: String, textCol: String,
                           indexPath: String, maxBucket: Int = 10000): DataFrame = {
    import graft.operators.Dedup
    val spark = docs.sparkSession
    val (shingleN, numHashes, bands) = Dedup.readMinhashMeta(spark, indexPath)
    val rows = numHashes / bands
    val streamBands = Dedup.bandRows(docs, idCol, textCol,
      shingleN, numHashes, bands)
    // STATIC-side hygiene, computed once per micro-batch on the index:
    // dropDuplicates absorbs re-appended batches (a retried
    // appendMinhashIndex would otherwise emit one hit per copy and break
    // the one-row-per-pair guarantee), and the same deterministic
    // hot-bucket cap as incrementalMinhashPairs bounds a boilerplate
    // flood in history to stream×maxBucket per bucket, never
    // stream×bucket.
    val capW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band_idx"), col("band_hash")).orderBy(col("id"))
    val idx = spark.read.parquet(s"$indexPath/bands")
      .dropDuplicates("band_idx", "band_hash", "id")
      .withColumn("__bn", row_number().over(capW))
      .filter(col("__bn") <= maxBucket)
      .select(col("band_idx"), col("band_hash"),
        col("id").as("neighbor_id"), col("sig").as("nsig"))
    val bandAgrees = (j: Column) =>
      slice(col("sig"), j * rows + 1, lit(rows)) ===
        slice(col("nsig"), j * rows + 1, lit(rows))
    val earlierAgrees = when(col("band_idx") === 0, lit(false))
      .otherwise(exists(sequence(lit(0), col("band_idx") - 1), bandAgrees))
    streamBands.join(idx, Seq("band_idx", "band_hash"))
      .filter(col("id") =!= col("neighbor_id"))
      // first TRULY agreeing band only → one row per pair. The own-band
      // check also drops pure hash-collision hits (equal band_hash,
      // unequal slices), which would otherwise emit from several bands.
      .filter(bandAgrees(col("band_idx")) && !earlierAgrees)
      .withColumn("est_jaccard", Dedup.sigAgreement(col("sig"), col("nsig")))
      .select(col("id").as(idCol), col("neighbor_id"), col("est_jaccard"))
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
