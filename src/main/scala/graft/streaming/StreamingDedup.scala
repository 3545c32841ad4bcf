package graft.streaming

import org.apache.spark.sql.DataFrame
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
    withDigest(docs, textCol)
      .join(historyDigests.select(col("digest")), Seq("digest"), "left_anti")

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
