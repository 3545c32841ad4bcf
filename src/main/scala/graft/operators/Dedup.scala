package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * shuffle-light for the 100 TB path:
  *
  *  - exact: one hash-groupBy (map-side combine) on a digest, never on the
  *    raw text — the shuffle carries 16-byte keys, not documents;
  *  - MinHash + LSH: signature → banding → bucket join; candidate pairs
  *    only ever meet inside a bucket, so the cross product is bounded by
  *    bucket size, not corpus size;
  *  - SimHash: one 64-bit fingerprint per doc, near-dup = small Hamming
  *    distance (`bit_count(a ^ b)` — a single codegen'd instruction);
  *  - n-gram Jaccard: exact verification on candidate pairs (never run it
  *    corpus-wide; feed it LSH/SimHash candidates).
  *
  * Everything is deterministic: hash seeds are fixed constants, no RNG.
  *
  * CACHE LIFETIME CONTRACT (applies to every operator here that
  * `persist()`s a multi-consumer frame — the MinHash band table,
  * [[ngramJaccard]]'s pair/shingle frames — and to their siblings
  * `Similarity.lshTopK`'s signature table and `Corpus.lmScore`'s token
  * frame): the cached build lives until the SESSION drops it. That is
  * deliberate — the band/signature tables are the index a production
  * pipeline keeps and reuses across calls, and an eager unpersist inside
  * the operator would re-scan the corpus on every reuse. The cost is that
  * a long-lived session calling these repeatedly over DIFFERENT corpora
  * accumulates MEMORY_AND_DISK blocks; between corpora, call
  * `spark.catalog.clearCache()` (what Bench does between reps) or
  * `df.unpersist()` the returned frame's inputs once consumed.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical value of `textCol`.
    * Grouping key is md5(text) (comparing digests, not documents); the
    * winner is chosen with min_by so it's one aggregate, no window shuffle.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("digest"), col("n_copies"))

  /** Word shingles (n-grams joined by space), distinct. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    val m = size(toks)
    when(m >= n,
      array_distinct(transform(sequence(lit(1), m - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(when(m > 0, array(concat_ws(" ", toks)))
        .otherwise(array().cast("array<string>")))
  }

  /** MinHash signature: `numHashes` independent min-hashes of the shingle
    * set, derived by hashing each shingle once and avalanche-mixing per
    * seed (native expression — fixed seeds, reproducible, no fitted model
    * state).
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    graft.functions.HashFunctions.minhashSignature(shingleCol, numHashes)

  /** Candidate near-dup pairs from LSH buckets (id1 < id2), deduped across
    * bands, with the MinHash Jaccard estimate (fraction of agreeing
    * signature positions).
    *
    * Hot-bucket guard: a bucket larger than `maxBucket` (e.g. a flood of
    * identical boilerplate docs) would otherwise emit bucket² pairs. Such
    * buckets instead emit a STAR — every member paired with the bucket's
    * lowest id — which is linear in bucket size and preserves connectivity
    * for downstream dedup clustering (the representative links the
    * component; transitive closure recovers the clique).
    */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            shingleN: Int = 3, numHashes: Int = 32,
                            bands: Int = 8, maxBucket: Int = 10000): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be a multiple of bands ($bands): " +
        "trailing signature positions would silently drop from banding")
    require(maxBucket >= 1, // 0 would silently star-degrade EVERY bucket
      s"maxBucket must be positive, got $maxBucket")
    // one signature computation (native tokens→signature pass); bands
    // derive from it and the signature rides along through the bucket
    // join so no re-join/recompute is needed
    candidatePairsFromBands(
      bandRows(df, idCol, textCol, shingleN, numHashes, bands), maxBucket)
  }

  /** Pair formation over an existing band table — shared by the corpus
    * pass above and the incremental path (which reuses its already-built
    * batch bands instead of re-signing the batch).
    */
  private def candidatePairsFromBands(banded: DataFrame,
                                      maxBucket: Int): DataFrame = {
    // bucket size via a whole-partition window count: ONE shuffle on the
    // bucket key (vs a separate aggregate + re-join), partitioned by the
    // same key the pair join needs next.
    //
    // PERSISTED: this signature/bucket table feeds four consumers (both
    // sides of the pair self-join, the oversized-bucket scan, and its
    // representative aggregate). Column pruning specializes each branch's
    // scan subtree, which defeats exchange reuse — without the persist the
    // corpus-wide signature pass runs once PER BRANCH. Materializing the
    // signature table once is also the production MinHash shape at 100 TB:
    // it's corpus × bands rows of (id, 8-byte band key, signature), the
    // index you'd keep anyway, and it costs one corpus scan instead of
    // four.
    val tagged = banded.withColumn("__bsz", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("band_idx"), col("band_hash"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val normal = tagged.filter(col("__bsz") <= maxBucket)
    val l = normal.select(col("band_idx"), col("band_hash"),
      col("id").as("id1"), col("sig").as("sig1"))
    val r = normal.select(col("band_idx"), col("band_hash"),
      col("id").as("id2"), col("sig").as("sig2"))
    val cliquePairs = l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("sig1"), col("sig2"))
    // oversized buckets: representative (lowest id) star, linear cost
    val over = tagged.filter(col("__bsz") > maxBucket)
    val reps = over.groupBy(col("band_idx"), col("band_hash"))
      .agg(min(col("id")).as("__rep_id"),
        min_by(col("sig"), col("id")).as("__rep_sig"))
    val starPairs = over.join(reps, Seq("band_idx", "band_hash"))
      .filter(col("id") =!= col("__rep_id"))
      .select(col("__rep_id").as("id1"), col("id").as("id2"),
        col("__rep_sig").as("sig1"), col("sig").as("sig2"))
    cliquePairs.unionByName(starPairs)
      // est_jaccard BEFORE the pair-dedup shuffle: the estimate is a
      // function of the two signatures, identical for every band a pair
      // meets in — computing it here ships 8 bytes per candidate row
      // through the (id1, id2) shuffle instead of 2 × numHashes longs
      // of signature payload (~60× on the operator's largest shuffle at
      // numHashes = 32), and first() then partial-aggregates map-side
      .withColumn("est_jaccard", sigAgreement(col("sig1"), col("sig2")))
      .groupBy(col("id1"), col("id2"))
      .agg(first(col("est_jaccard")).as("est_jaccard"))
      .select("id1", "id2", "est_jaccard")
  }

  /** Persist the EXACT-dedup digest history (16-byte md5 per distinct
    * text) — the cheap sibling of the MinHash band index below, and the
    * static side of [[graft.streaming.StreamingDedup.againstHistory]].
    */
  def saveDigestIndex(docs: DataFrame, path: String, textCol: String): Unit = {
    docs.select(md5(col(textCol)).as("digest")).distinct()
      .write.mode("overwrite").parquet(path)
    // a fresh index must not inherit a previous incarnation's deletes
    Tombstones.drop(docs.sparkSession, digestTombPath(path))
  }

  /** The digest table is FLAT at `path` (no subdirectories), so its
    * tombstone sidecar lives next to it, not under it — a `tombstones`
    * child would corrupt the parquet directory listing.
    */
  private def digestTombPath(path: String): String = s"${path}_tombstones"

  /** Delete documents from the digest history by TEXT: their digests go
    * to the tombstone sidecar, and every membership probe
    * ([[incrementalExact]], [[loadDigestIndex]]) stops treating those
    * texts as seen — the digest index is content-keyed, so deleting a
    * doc deletes the membership of every doc sharing its text.
    * Idempotent; physically applied (and the sidecar dropped) by
    * [[compactDigestIndex]]. See [[Tombstones]] for the contract.
    */
  def deleteFromDigestIndex(docs: DataFrame, path: String,
                            textCol: String): Unit =
    Tombstones.add(docs.select(md5(col(textCol)).as("digest")),
      "digest", digestTombPath(path))

  /** Grow the digest history with a processed batch (idempotent for the
    * membership test — duplicate digest rows change nothing downstream).
    * Re-appending a tombstoned text REVIVES it: the batch's digests are
    * cleared from the tombstone sidecar first.
    */
  def appendDigestIndex(docs: DataFrame, path: String, textCol: String): Unit = {
    val dg = docs.select(md5(col(textCol)).as("digest")).distinct()
    Tombstones.clear(dg, "digest", digestTombPath(path))
    dg.write.mode("append").parquet(path)
  }

  /** The digest history as probes must see it: tombstoned digests
    * anti-joined away. The loader for callers that take a digest FRAME
    * (e.g. [[graft.streaming.StreamingDedup.againstHistory]]) — reading
    * the path directly would resurrect deleted texts.
    */
  def loadDigestIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String): DataFrame =
    Tombstones.applyTo(spark.read.parquet(path), "digest",
      digestTombPath(path))

  /** Rewrite the digest history as one compact, globally-distinct,
    * digest-range-partitioned table. [[appendDigestIndex]] adds a file
    * set per batch and only dedups WITHIN the batch — a thousand-batch
    * year leaves thousands of small files carrying cross-batch duplicate
    * digests (harmless for membership, wasteful to scan). Run this at a
    * quiet moment (same serialized-writers contract as the appends: no
    * concurrent append, probes re-opened after the swap — see
    * [[compactMinhashIndex]]); membership results are identical before
    * and after. Staged-swap, never delete-then-write.
    */
  def compactDigestIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String): Unit = {
    Lifecycle.stagedSwap(spark, path) { staged =>
      Tombstones.applyTo(spark.read.parquet(path), "digest",
          digestTombPath(path))
        .distinct()
        .repartitionByRange(col("digest"))
        .sortWithinPartitions(col("digest"))
        .write.mode("overwrite").parquet(staged)
    }
    Tombstones.drop(spark, digestTombPath(path))
  }

  /** Exact-dedup an arriving batch against the digest history AND within
    * itself: drop rows whose text was ever seen before, keep the lowest
    * id per batch-internal duplicate group. Returns surviving rows (all
    * columns). The history join ships digests, never documents; at
    * steady state this is the whole per-batch cost of exact dedup —
    * history text is never re-read.
    */
  def incrementalExact(newDocs: DataFrame, path: String, idCol: String,
                       textCol: String): DataFrame = {
    val hist = loadDigestIndex(newDocs.sparkSession, path)
    val keyed = newDocs.withColumn("__dg", md5(col(textCol)))
    // NULL-SAFE anti-join: md5(NULL) is NULL, and a plain equality never
    // matches NULL = NULL — null-text rows would survive every batch even
    // though the history holds their (null) digest row. <=> makes the
    // membership test see them, so cross-batch dedup applies to null
    // texts exactly like [[exact]]'s within-batch null group.
    val fresh = keyed.join(hist.select(col("digest").as("__hg")),
      col("__dg") <=> col("__hg"), "left_anti")
    // lowest id per batch-internal duplicate group as ONE min_by
    // aggregate carrying the whole row (the firstWins shape) — a
    // winners-then-semi-join formulation would scan the batch and re-run
    // the history anti-join twice, and its null-unsafe join keys would
    // silently DROP null-text rows (md5(NULL) = NULL never equals
    // itself); groupBy treats nulls as one group, so null-text rows keep
    // their min-id representative exactly like [[exact]]
    val cols = newDocs.columns.toIndexedSeq
    fresh.groupBy(col("__dg"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__w"))
      .select(cols.map(c => col(s"__w.$c").as(c)): _*)
  }

  /** Persist the MinHash band index — the artifact that makes dedup
    * INCREMENTAL at corpus scale. A 100 TB pipeline never re-deduplicates
    * the whole corpus: it dedups each arriving batch against this index
    * ([[incrementalMinhashPairs]]) and appends the batch's rows
    * ([[appendMinhashIndex]]). One row per (doc, band): (id, band_idx,
    * band_hash, sig), written sorted by (band_idx, band_hash) so parquet
    * row-group min/max statistics prune probe scans; the signature rides
    * along so join-time similarity estimates never touch old TEXT.
    * `meta` pins the signature family — an increment computed with
    * different parameters would silently match nothing, so probing
    * re-reads the parameters from the index, never from caller arguments.
    */
  def saveMinhashIndex(docs: DataFrame, path: String, idCol: String,
                       textCol: String, shingleN: Int = 3,
                       numHashes: Int = 32, bands: Int = 16,
                       maxBucket: Int = 10000): Unit = {
    require(numHashes % bands == 0, "numHashes must be a multiple of bands")
    require(maxBucket >= 1, "maxBucket must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // WRITE-TIME HYGIENE (the index invariant every reader relies on):
    // at most `maxBucket` rows per bucket, lowest ids winning. Capping
    // here — one keyed shuffle, paid once at build — is what lets every
    // PROBE (incremental batch, streaming micro-batch) read the index as
    // a plain pruned scan with no per-probe dedup or window pass over
    // history. The cap's flood semantics match the in-memory star
    // fallback: a boilerplate flood keeps its `maxBucket` lowest-id
    // members as cluster evidence; readers needing a TIGHTER cap can
    // still apply their own (a looser one cannot exceed what was kept).
    writeBands(bandRows(docs, idCol, textCol, shingleN, numHashes, bands),
      s"$path/bands", maxBucket, "overwrite")
    Seq((shingleN, numHashes, bands, maxBucket))
      .toDF("shingle_n", "num_hashes", "bands", "max_bucket")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    // a fresh index must not inherit a previous incarnation's deletes
    Tombstones.drop(spark, s"$path/tombstones")
  }

  /** Delete documents from the MinHash band index by id: tombstoned ids
    * stop surfacing from every probe ([[flagAgainstIndex]],
    * [[incrementalMinhashPairs]], the streaming faces) immediately;
    * their band rows are physically removed — and the sidecar dropped —
    * at the next [[compactMinhashIndex]]. Until then the dead rows
    * still occupy their bucket-cap slots (conservative; see
    * [[Tombstones]]). Re-appending a deleted id revives it.
    */
  def deleteFromMinhashIndex(ids: DataFrame, path: String,
                             idCol: String): Unit =
    Tombstones.add(ids.select(col(idCol).as("id")), "id",
      s"$path/tombstones")

  /** Dedup (duplicate input rows — a doc ingested twice in one frame —
    * would otherwise write two identical band rows each) + per-bucket cap
    * + sorted layout: the band-table write shared by save and compact.
    */
  private def writeBands(bands: DataFrame, bandsPath: String,
                         maxBucket: Int, mode: String): Unit = {
    val capW = Window.partitionBy(col("band_idx"), col("band_hash"))
      .orderBy(col("id"))
    bands
      .groupBy(col("band_idx"), col("band_hash"), col("id"))
      .agg(first(col("sig")).as("sig"))
      .withColumn("__bn", row_number().over(capW))
      .filter(col("__bn") <= maxBucket)
      .select(col("id"), col("sig"), col("band_idx"), col("band_hash"))
      .sortWithinPartitions(col("band_idx"), col("band_hash"))
      .write.mode(mode).parquet(bandsPath)
  }

  /** One-time upgrade of a LEGACY index (written before write-time
    * hygiene existed, or grown by the old blind append): dedup identical
    * band rows, cap every bucket at `maxBucket` (lowest ids), rewrite
    * sorted, and stamp `max_bucket` into the meta so probes accept it.
    * Idempotent; probes REFUSE un-stamped indexes (see
    * [[readMinhashMeta]]) because their duplicate rows would double-emit
    * flags and their uncapped flood buckets make probe cost unbounded.
    *
    * QUIESCENCE: run at a quiet moment for the index path. Writers are
    * serialized per path (every writer here's contract), so no append
    * may run between this call's read and its swap — a concurrent
    * append's rows would land in the retired table and be lost. Readers
    * holding the OLD table's file listing (a probe planned before the
    * swap) fail on the renamed-away files and must re-open; probes
    * planned after the swap see the compacted table. Same contract for
    * [[compactDigestIndex]] and [[compactSimhashIndex]].
    */
  /** Sentinel for [[compactMinhashIndex]]'s `maxBucket`: keep the cap
    * the index's meta already stamps. */
  val KeepStampedCap: Int = -1

  def compactMinhashIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String,
                          maxBucket: Int = KeepStampedCap): Unit = {
    import spark.implicits._
    require(maxBucket >= 1 || maxBucket == KeepStampedCap,
      "maxBucket must be positive") // 0 would stamp an EMPTIED index as hygienic
    val metaDf = spark.read.parquet(s"$path/meta")
    val m = metaDf.head()
    def i(n: String): Int = m.getInt(metaDf.schema.fieldIndex(n))
    val (sn, nh, b) = (i("shingle_n"), i("num_hashes"), i("bands"))
    // default = the index's own stamped cap: the routine
    // delete-then-compact lifecycle must not silently re-cap a
    // maxBucket=50000 index at a literal 10000 (evicting rows) or
    // re-stamp a tight 500-cap index loose. A LEGACY meta (pre-stamp)
    // has no max_bucket column — that upgrade takes 10000, the
    // historical default, unless the caller names a cap.
    val cap =
      if (maxBucket != KeepStampedCap) maxBucket
      else if (metaDf.columns.contains("max_bucket")) i("max_bucket")
      else 10000
    // stage next to the live table, then swap — can't overwrite a table
    // that is being read
    Lifecycle.stagedSwap(spark, s"$path/bands") { staged =>
      writeBands(
        Tombstones.applyTo(spark.read.parquet(s"$path/bands"), "id",
          s"$path/tombstones"),
        staged, cap, "overwrite")
    }
    Seq((sn, nh, b, cap))
      .toDF("shingle_n", "num_hashes", "bands", "max_bucket")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    Tombstones.drop(spark, s"$path/tombstones")
  }

  /** Promote a staged rewrite over a live parquet table by renaming the
    * OLD table aside first (never delete-then-rename: a failed second
    * rename would have destroyed the only copy), checking every rename —
    * object-store renames return false. Shared by the index compactions;
    * callers must have finished writing `staged` before calling.
    */
  private[graft] def swapTable(spark: org.apache.spark.sql.SparkSession,
                               live: String, staged: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(live)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val retired = s"${live}_retired"
    fs.delete(p(retired), true)
    require(fs.rename(p(live), p(retired)),
      s"compact: could not retire $live — table unchanged")
    require(fs.rename(p(staged), p(live)),
      s"compact: could not promote $staged — the original table is " +
        s"intact at $retired; rename it back to recover")
    fs.delete(p(retired), true)
  }

  /** Append a processed batch's band rows to a persisted index (same
    * signature family — parameters come from the index's meta), keeping
    * the index invariant [[saveMinhashIndex]] established:
    *
    *  - IDEMPOTENT: band rows already present (a retried append, a doc
    *    re-ingested) are anti-joined away against the buckets the batch
    *    touches — a duplicate row would make every future probe emit a
    *    hit once per copy;
    *  - CAPPED: a bucket never exceeds the index's `max_bucket` of
    *    LIVE rows; already-persisted live rows keep their slots (an
    *    append cannot evict history without rewriting it), batch rows
    *    fill the remainder in id order, and tombstoned rows do NOT
    *    hold slots (a delete frees its cap capacity immediately, not
    *    at compaction — the physical bucket may transiently exceed the
    *    cap by its tombstoned rows, but the probe-visible bucket never
    *    does). Deterministic given the append/delete sequence;
    *    serialized appends per index path, like every writer here.
    *
    * All hygiene work is bounded by the BATCH's touched buckets (the
    * semi-join prunes history first), never by index size.
    */
  def appendMinhashIndex(newDocs: DataFrame, path: String, idCol: String,
                         textCol: String): Unit = {
    val spark = newDocs.sparkSession
    val meta = readMinhashMeta(spark, path)
    // append-after-delete revives: a re-ingested doc's tombstone is
    // cleared, and its still-persisted band rows (which the idempotence
    // anti-join below will decline to duplicate) become live again
    Tombstones.clear(newDocs.select(col(idCol).as("id")), "id",
      s"$path/tombstones")
    val batch = bandRows(newDocs, idCol, textCol,
        meta.shingleN, meta.numHashes, meta.bands)
      // batch-internal dedup: a doc appearing twice in one batch would
      // otherwise write two identical band rows (the anti-join below only
      // screens against HISTORY) — batch-sized work
      .groupBy(col("band_idx"), col("band_hash"), col("id"))
      .agg(first(col("sig")).as("sig"))
      .select(col("id"), col("sig"), col("band_idx"), col("band_hash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = spark.read.parquet(s"$path/bands")
      .join(batch.select(col("band_idx"), col("band_hash")).distinct(),
        Seq("band_idx", "band_hash"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fresh = batch.join(
      touched.select(col("band_idx"), col("band_hash"), col("id")),
      Seq("band_idx", "band_hash", "id"), "left_anti")
    // cap accounting counts LIVE rows only (VERDICT r8): tombstoned
    // rows still physically occupy the bucket until compaction, but a
    // probe anti-joins them away, so they must not hold cap slots
    // against new appends — a heavy-delete workload would otherwise
    // starve capped buckets until the next compaction. The effective
    // (probe-visible) bucket stays <= maxBucket throughout, and the
    // compaction's physical rewrite restores the invariant on disk.
    // Cost: one anti-join over the batch-touched slice × the sidecar.
    val have = Tombstones.applyTo(touched, "id", s"$path/tombstones")
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("__have"))
    val capW = Window.partitionBy(col("band_idx"), col("band_hash"))
      .orderBy(col("id"))
    fresh
      .withColumn("__bn", row_number().over(capW))
      .join(have, Seq("band_idx", "band_hash"), "left")
      .filter(col("__bn") + coalesce(col("__have"), lit(0L)) <= meta.maxBucket)
      .select(col("id"), col("sig"), col("band_idx"), col("band_hash"))
      .sortWithinPartitions(col("band_idx"), col("band_hash"))
      .write.mode("append").parquet(s"$path/bands")
    batch.unpersist(blocking = false)
    touched.unpersist(blocking = false)
  }

  /** Candidate near-dup pairs of a NEW batch, incrementally: (new × index)
    * pairs via a band join against the persisted index plus (new × new)
    * pairs via the in-memory pass — without recomputing one signature of
    * the historical corpus. Output matches [[minhashCandidatePairs]]:
    * (id1 < id2, est_jaccard), deduplicated across bands and sources.
    *
    * Scale shape: the index side is never scanned into memory as text —
    * the join carries (id, 8-byte band hash, signature); the index side of
    * every bucket is capped at `maxBucket` rows (lowest ids, deterministic)
    * so a boilerplate flood in the HISTORY costs new×maxBucket, never
    * new×bucket; and the new batch is small by definition of a batch.
    */
  def incrementalMinhashPairs(newDocs: DataFrame, path: String, idCol: String,
                              textCol: String,
                              maxBucket: Int = 10000): DataFrame = {
    require(maxBucket >= 1, // 0 would silently empty the index side
      s"maxBucket must be positive, got $maxBucket")
    val spark = newDocs.sparkSession
    val meta = readMinhashMeta(spark, path)
    // ONE banding/signature pass over the batch, shared by both the
    // index join and the batch-internal pair stage (which would otherwise
    // re-sign the batch internally)
    val newBands = bandRows(newDocs, idCol, textCol,
        meta.shingleN, meta.numHashes, meta.bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idx = spark.read.parquet(s"$path/bands")
    // restrict the index to buckets the BATCH touches before any
    // window work: history grows without bound, the batch doesn't — a
    // cap computed over the whole index would shuffle all of history
    // every increment. The semi-join keys are the batch's distinct
    // bucket ids (small), and the sorted index layout lets parquet
    // row-group min/max statistics cut the scan. Tombstoned ids are
    // anti-joined AFTER the bucket restriction (the sidecar filter
    // costs touched-slice × deletions, never index × deletions).
    val touched = Tombstones.applyTo(
      idx.join(
        newBands.select(col("band_idx"), col("band_hash")).distinct(),
        Seq("band_idx", "band_hash"), "left_semi"),
      "id", s"$path/tombstones")
    // per-bucket cap on the INDEX side (lowest ids win — deterministic,
    // same contract as minhashCandidatePairs' star fallback). A stamped
    // index is already write-time capped at meta.maxBucket, so the
    // window pass only runs when the caller asks for a TIGHTER cap —
    // with the default it would shuffle the touched slice to filter
    // nothing.
    val idxCapped =
      if (maxBucket >= meta.maxBucket) touched
      else {
        val capW = Window.partitionBy(col("band_idx"), col("band_hash"))
          .orderBy(col("id"))
        touched.withColumn("__bn", row_number().over(capW))
          .filter(col("__bn") <= maxBucket)
      }
    val cross = newBands
      .select(col("band_idx"), col("band_hash"),
        col("id").as("__nid"), col("sig").as("__nsig"))
      .join(idxCapped.select(col("band_idx"), col("band_hash"),
        col("id").as("__oid"), col("sig").as("__osig")),
        Seq("band_idx", "band_hash"))
      .filter(col("__nid") =!= col("__oid"))
      // est computed pre-shuffle (sigAgreement is symmetric, so the
      // (sig1, sig2) ordering is irrelevant) — same slimming as
      // candidatePairsFromBands: the pair-dedup shuffle carries one
      // double, never two signature arrays
      .select(least(col("__nid"), col("__oid")).as("id1"),
        greatest(col("__nid"), col("__oid")).as("id2"),
        sigAgreement(col("__nsig"), col("__osig")).as("est_jaccard"))
    val newNew = candidatePairsFromBands(newBands, maxBucket)
    cross
      .groupBy(col("id1"), col("id2"))
      .agg(first(col("est_jaccard")).as("est_jaccard"))
      .select(col("id1"), col("id2"), col("est_jaccard"))
      .unionByName(newNew)
      // a pair can surface from BOTH paths if the index already holds one
      // of the batch's docs (idempotent re-runs) — keep one row
      .groupBy(col("id1"), col("id2"))
      .agg(first(col("est_jaccard")).as("est_jaccard"))
  }

  /** Flag which of `docs` near-duplicate the persisted index — the
    * per-batch core behind [[graft.streaming.StreamingDedup]]'s flagging
    * faces, usable directly for ad-hoc batch screening ("does this drop
    * collide with the corpus?"). One row per (doc, index doc) candidate:
    * (idCol, neighbor_id, est_jaccard).
    *
    * Per-batch cost shape (the 100 TB contract): the index is pruned to
    * the buckets the BATCH touches via a semi-join on the batch's
    * distinct bucket keys BEFORE any join work — history grows without
    * bound, the batch doesn't — and the write-time invariant
    * ([[saveMinhashIndex]]: deduped, per-bucket-capped) means no
    * dropDuplicates or window pass over the index, ever. The join then
    * emits each pair from its FIRST agreeing band only (a codegen'd
    * predicate over the signatures both sides carry), so no
    * post-join dedup shuffle is needed either.
    *
    * Unlike [[incrementalMinhashPairs]] this does NOT propose
    * batch-internal pairs (flagging asks "is this new doc a dup of the
    * CORPUS", not "of its own batch") and keeps the (batch doc →
    * neighbor) orientation instead of id1 < id2.
    *
    * The batch's band table persists under the CACHE LIFETIME CONTRACT
    * (object doc): screening many batches in one long-lived session
    * accumulates one cached band frame per call unless the caller clears
    * between batches — for that repeated-batch shape use
    * [[graft.streaming.StreamingDedup.nearDupsEachBatch]], which
    * releases each batch's cache as soon as its sink returns.
    */
  def flagAgainstIndex(docs: DataFrame, path: String, idCol: String,
                       textCol: String): DataFrame =
    flagCore(docs, path, idCol, textCol)._1

  /** [[flagAgainstIndex]] plus the persisted band handle, so streaming
    * callers can release the per-batch cache once the sink consumed the
    * result (the batch API leaves it to the session cache contract).
    * `knownMeta` lets a per-micro-batch caller pin the family once at
    * stream definition instead of re-reading the meta table (a
    * driver-side head() job) every batch.
    */
  private[graft] def flagCore(docs: DataFrame, path: String, idCol: String,
                              textCol: String,
                              knownMeta: Option[MinhashMeta] = None)
      : (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val meta = knownMeta.getOrElse(readMinhashMeta(spark, path))
    // one banding pass, read by both the bucket-key projection and the
    // pair join
    val banded = bandRows(docs, idCol, textCol,
        meta.shingleN, meta.numHashes, meta.bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = Tombstones.applyTo(
      spark.read.parquet(s"$path/bands")
        .join(banded.select(col("band_idx"), col("band_hash")).distinct(),
          Seq("band_idx", "band_hash"), "left_semi"),
      "id", s"$path/tombstones")
    (firstBandPairs(banded, touched, meta.numHashes / meta.bands, idCol),
      banded)
  }

  /** Band-bucket join emitting each (doc, neighbor) pair exactly once —
    * from its FIRST truly-agreeing band. STATELESS dedup: a pair agreeing
    * on several bands surfaces once per band from the raw join, but both
    * signatures are present after it, so "no earlier band agrees" is a
    * plain codegen'd predicate — no distinct/groupBy shuffle, and in a
    * streaming plan no state store. The own-band agreement check also
    * drops pure hash-collision hits (equal band_hash, unequal slices).
    * Shared by the continuous-plan and foreachBatch streaming faces and
    * the batch screen so their semantics can never diverge.
    */
  private[graft] def firstBandPairs(probe: DataFrame, idx: DataFrame,
                                    rows: Int, idCol: String): DataFrame = {
    val neighbor = idx.select(col("band_idx"), col("band_hash"),
      col("id").as("neighbor_id"), col("sig").as("nsig"))
    val bandAgrees = (j: Column) =>
      slice(col("sig"), j * rows + 1, lit(rows)) ===
        slice(col("nsig"), j * rows + 1, lit(rows))
    val earlierAgrees = when(col("band_idx") === 0, lit(false))
      .otherwise(exists(sequence(lit(0), col("band_idx") - 1), bandAgrees))
    probe.join(neighbor, Seq("band_idx", "band_hash"))
      .filter(col("id") =!= col("neighbor_id"))
      .filter(bandAgrees(col("band_idx")) && !earlierAgrees)
      .withColumn("est_jaccard", sigAgreement(col("sig"), col("nsig")))
      .select(col("id").as(idCol), col("neighbor_id"), col("est_jaccard"))
  }

  /** MinHash similarity estimate = fraction of agreeing signature
    * positions — THE estimate formula, shared by the corpus pass, the
    * incremental path, and streaming flagging so they can never diverge.
    */
  private[graft] def sigAgreement(sig1: Column, sig2: Column): Column =
    size(filter(zip_with(sig1, sig2, (a, b) => a === b), x => x))
      .cast("double") / size(sig1)

  /** One row per (doc, band): the shared banding pass behind the
    * persisted index and the in-memory candidate stage.
    */
  private[graft] def bandRows(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    docs
      .select(col(idCol).as("id"),
        graft.functions.HashFunctions.minhashTokens(
          TextAnalysis.tokens(col(textCol)), shingleN, numHashes).as("sig"))
      .select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1))).as("band_idx"))
      .select(col("id"), col("sig"), col("band_idx"),
        xxhash64(col("band_idx"),
          slice(col("sig"), col("band_idx") * rows + 1, lit(rows))).as("band_hash"))
  }

  /** The signature family + retention policy a persisted index was built
    * with. Probes read these from the index, never from caller arguments
    * — an increment computed with different parameters would silently
    * match nothing.
    */
  private[graft] final case class MinhashMeta(shingleN: Int, numHashes: Int,
                                              bands: Int, maxBucket: Int)

  private[graft] def readMinhashMeta(spark: org.apache.spark.sql.SparkSession,
                              path: String): MinhashMeta = {
    val df = spark.read.parquet(s"$path/meta")
    val m = df.head()
    def i(n: String): Int = m.getInt(df.schema.fieldIndex(n))
    // the max_bucket stamp IS the hygiene certificate: probes read the
    // index as deduped + capped with no per-probe hygiene pass, so an
    // un-stamped (legacy) index — whose buckets may hold duplicate rows
    // (double-emitted flags) or uncapped floods (unbounded probe cost) —
    // must be refused loudly, not probed wrongly
    if (!df.schema.fieldNames.contains("max_bucket"))
      throw new IllegalStateException(
        s"MinHash index at $path predates write-time hygiene (no " +
          "max_bucket in meta) — run Dedup.compactMinhashIndex(spark, " +
          "path) once to dedup, cap, and stamp it")
    MinhashMeta(i("shingle_n"), i("num_hashes"), i("bands"), i("max_bucket"))
  }

  /** Exact n-gram Jaccard similarity for candidate pairs: expects columns
    * (id1, id2) plus the source frame to pull texts from; computes
    * |A ∩ B| / |A ∪ B| over distinct word n-grams.
    */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                   textCol: String, n: Int = 3): DataFrame = {
    // The pair set is read three times (two id projections for the doc
    // semi-join, then the verification join) — persist it so whatever
    // lineage PRODUCED the candidates (typically the corpus-wide LSH pass)
    // runs once, not three times. By contract it's a candidate set: tiny
    // relative to the corpus. Session-lifetime cache: see the object doc's
    // CACHE LIFETIME CONTRACT.
    val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // shingle only the docs the pair set references: candidate sets are a
    // tiny fraction of the corpus, so semi-joining first keeps the wide
    // shingle arrays off the shuffle for every uninvolved document. Also
    // persisted: both verification joins (id1 side, id2 side) read it.
    val ids = p.select(col("id1").as(idCol))
      .union(p.select(col("id2").as(idCol)))
      .distinct()
    val sh = docs.join(ids, Seq(idCol), "left_semi")
      .select(col(idCol), shingles(col(textCol), n).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p
      .join(sh.select(col(idCol).as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sh.select(col(idCol).as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh1"), col("sh2"))).cast("double"))
      .withColumn("jaccard",
        when(col("uni") > 0, col("inter") / col("uni")).otherwise(0.0))
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Best n-gram-Jaccard neighbor per document within a blocking column,
    * via an inverted shingle index: explode distinct shingles, self-join on
    * (block, shingle) to count intersections, then
    * J = |∩| / (|A| + |B| − |∩|).
    *
    * This is the 100 TB formulation: pairwise array intersection over all
    * in-block pairs is O(pairs × shingles); the inverted index only
    * materializes pairs that actually share a shingle, and the join key
    * (block, shingle) distributes across the cluster. Documents sharing no
    * shingle with anyone fall back to the smallest other id in the block
    * with Jaccard 0 (matching a full pairwise ranking with id tiebreak).
    *
    * Pinned 0/0 semantics: a pair whose shingle union is empty (both docs
    * have fewer than n tokens) counts as Jaccard 0.0 — NOT NULL/NaN — so
    * such docs rank their fallback like any other zero-overlap pair and the
    * result stays engine-independent (q21's oracle coalesces 0/0 to 0.0).
    *
    * Null contract: rows with a NULL id are DROPPED — the result is keyed
    * by `idCol` ("this document's best neighbor"), and a null id names no
    * document; it can neither rank neighbors nor be ranked as one (every
    * id join/anti-join would skip it anyway, leaving only a meaningless
    * fallback row). Null-TEXT rows with a real id stay: no shingles, so
    * they take the fallback (smallest other in-block id, Jaccard 0).
    */
  def ngramJaccardTopNeighbor(docs0: DataFrame, idCol: String, textCol: String,
                              blockCol: String, n: Int = 3): DataFrame = {
    val docs = docs0.filter(col(idCol).isNotNull)
    // distinct n-gram HASHES via one native pass — no shingle-string
    // construction, and the inverted index explodes 8-byte longs (the
    // join only needs equality; a 64-bit collision within a block is
    // ~2^-64 per pair)
    val sh = docs.select(col(blockCol).as("blk"), col(idCol).as("id"),
      graft.functions.HashFunctions.ngramHashes(
        TextAnalysis.tokens(col(textCol)), n).as("sh"))
    val sizes = sh.select(col("blk"), col("id"), size(col("sh")).as("sz"))
    val inv = sh.select(col("blk"), col("id"), explode(col("sh")).as("g"))
    // Prefilter: a shingle held by only ONE doc in its block can only form
    // self-pairs (dropped below) — and in a real corpus most shingles are
    // unique, so this removes the bulk of the self-join's input. The count
    // rides a window over (blk, g), the SAME key the pair join shuffles on,
    // so the filter costs one sort, no extra exchange (the join reuses the
    // window's partitioning on both sides).
    val shared = inv
      .withColumn("__gc", count(lit(1)).over(
        Window.partitionBy(col("blk"), col("g"))))
      .filter(col("__gc") >= 2)
      .drop("__gc")
    val inter = shared.select(col("blk"), col("id").as("id1"), col("g"))
      .join(shared.select(col("blk"), col("id").as("id2"), col("g")), Seq("blk", "g"))
      .filter(col("id1") =!= col("id2"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("inter"))
    val scored = inter
      .join(sizes.select(col("id").as("id1"), col("sz").as("sz1")), Seq("id1"))
      .join(sizes.select(col("id").as("id2"), col("sz").as("sz2")), Seq("id2"))
      .withColumn("jaccard", col("inter").cast("double")
        / (col("sz1") + col("sz2") - col("inter")))
    val w = Window.partitionBy(col("id1")).orderBy(col("jaccard").desc, col("id2"))
    val best = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id1"), col("id2").as("best_id"), col("jaccard"))
    // fallback: docs whose shingles overlap nobody → smallest other id, J=0.
    // Derived from TWO per-block aggregates (min id, then min id excluding
    // it), never a block self-join: a block² pair materialization would be
    // 10^12 rows for a 1 M-doc block, while this stays linear in block size.
    // Single-doc blocks produce no min2 row and drop out (no "other" doc
    // exists), matching a pairwise ranking's empty result for them.
    val min1 = sizes.groupBy(col("blk")).agg(min(col("id")).as("min1"))
    val min12 = sizes.join(min1, Seq("blk"))
      .filter(col("id") =!= col("min1"))
      .groupBy(col("blk"))
      .agg(first(col("min1")).as("min1"), min(col("id")).as("min2"))
    val others = sizes.join(min12, Seq("blk"))
      .select(col("id").as("id1"),
        when(col("id") === col("min1"), col("min2"))
          .otherwise(col("min1")).as("fallback_id"))
    others.join(best, Seq("id1"), "left")
      .select(col("id1").as(idCol),
        coalesce(col("best_id"), col("fallback_id")).as("best_id"),
        coalesce(col("jaccard"), lit(0.0)).as("jaccard"))
  }

  /** Duplicate SPAN detection — the "exact substring dedup" signal that set
    * similarity misses: two documents sharing a long verbatim passage
    * (quoted boilerplate, license text, copied paragraphs) can sit far
    * below any Jaccard threshold, yet the passage still memorizes. For
    * every document pair sharing at least `minSpanGrams` CONSECUTIVE word
    * n-grams, emits the pair's LONGEST run — its token length and 1-based
    * start position in each document.
    *
    * Algorithm (all relational, no per-doc state):
    *  1. positional n-gram hashes (one native pass per doc; 8-byte keys,
    *     never gram strings);
    *  2. stop-gram prefilter: a gram occurring more than `maxOcc` times
    *     corpus-wide is dropped BEFORE the pair join ("the end of" tells
    *     you nothing about copying, and hot grams are where a gram-equi-
    *     join goes quadratic). The occurrence count rides a window over
    *     the gram key — the same key the join shuffles on, so the filter
    *     adds one sort, no extra exchange. `maxOcc` is part of the
    *     operator's SEMANTICS (spans are "runs of rare shared grams"), so
    *     oracles must mirror it;
    *  3. pair join on the gram hash (id1 < id2) → matching position pairs;
    *  4. runs: positions along one diagonal (pos1 − pos2 constant) with
    *     consecutive pos1 form a run — the gaps-and-islands trick
    *     (pos1 − row_number is constant within a run), windowed per
    *     (pair, diagonal), never global;
    *  5. per-pair best run: longest, then earliest (start1, start2).
    *
    * A run of k n-grams covers k + n − 1 verbatim tokens. Cost is bounded
    * by Σ_g occ(g)² over surviving grams — `maxOcc` caps the per-gram
    * term, and in natural text the surviving occ distribution is flat.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, minSpanGrams: Int = 3,
                     maxOcc: Int = 1000): DataFrame = {
    val grams = docs
      .select(col(idCol).as("id"),
        posexplode(graft.functions.HashFunctions.ngramHashesAll(
          TextAnalysis.tokens(col(textCol)), n)).as(Seq("pos", "g")))
    // lower bound 2 is pure pruning (an occ-1 gram can only self-pair,
    // dropped by id1 < id2 below) — in natural text most grams are unique,
    // so this removes the bulk of the join input; the upper bound is the
    // stop-gram semantic. Both ride ONE window on the join's own key, and
    // because the rename projections sit ABOVE this window's exchange, the
    // self-join's two sides canonicalize to the same exchange and
    // ReuseExchange computes the gram table once.
    val rare = grams
      .withColumn("__occ", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("__occ") >= 2 && col("__occ") <= maxOcc)
      .drop("__occ")
    val hits = rare.select(col("g"), col("id").as("id1"), col("pos").as("pos1"))
      .join(rare.select(col("g"), col("id").as("id2"), col("pos").as("pos2")),
        Seq("g"))
      .filter(col("id1") < col("id2"))
    val wDiag = Window
      .partitionBy(col("id1"), col("id2"), col("pos1") - col("pos2"))
      .orderBy(col("pos1"))
    val runs = hits
      // a gram pair repeated on one diagonal is impossible (each pos1 owns
      // one pos2 per diagonal), so row_number is safe — no dense_rank needed
      .withColumn("__run", col("pos1") - row_number().over(wDiag))
      .groupBy(col("id1"), col("id2"), (col("pos1") - col("pos2")).as("__d"),
        col("__run"))
      .agg(count(lit(1)).as("__len"), min(col("pos1")).as("__s1"),
        min(col("pos2")).as("__s2"))
      .filter(col("__len") >= minSpanGrams)
    // longest run wins; ties break to the earliest (start1, start2). The
    // negations make one lexicographic max express "max length, min starts".
    runs.groupBy(col("id1"), col("id2"))
      .agg(max(struct(col("__len"), (-col("__s1")).as("__n1"),
        (-col("__s2")).as("__n2"))).as("__best"))
      .select(col("id1"), col("id2"),
        (col("__best.__len") + (n - 1)).as("span_tokens"),
        (-col("__best.__n1") + 1).as("start1"),
        (-col("__best.__n2") + 1).as("start2"))
  }

  /** Duplicate-span EXCISION — the transform [[duplicateSpans]] only
    * detects: rewrite the corpus so every verbatim passage survives
    * exactly once, in its EARLIEST document (keep-first). For each doc,
    * every token covered by a shared run of ≥ `minSpanGrams` n-grams
    * with ANY lower-id document is dropped, and the text is rebuilt
    * from the surviving tokens (single-space joined — excised docs are
    * whitespace-normalized by construction; untouched docs keep their
    * text byte-identical). This is the standard "exact substring
    * dedup" cleanup for training corpora: boilerplate, licenses, and
    * quoted passages melt out of every copy but the first, without
    * dropping whole documents the way near-dup dedup would.
    *
    * Same candidate machinery as [[duplicateSpans]] (positional gram
    * hashes, occ ∈ [2, maxOcc] prefilter, diagonal run grouping), but
    * ALL qualifying runs count — not just each pair's longest — since
    * every covered token must go. Within-doc self-repeats are kept (no
    * self-pairs; internal repetition is [[TextAnalysis]]'s repetition
    * signal, not cross-doc contamination). Null-id docs are dropped
    * (r14 null contract: excision verdicts are id-keyed — "earliest"
    * needs an order, and an anti-join can never clear a null id);
    * null-text docs pass through untouched.
    *
    * Output: (`idCol`, `textCol` rebuilt, `n_dropped` tokens) — one row
    * per input doc with a non-null id; callers re-join other columns by
    * id. Scale shape: the pair join is occ-capped like duplicateSpans;
    * coverage explodes only COVERED positions (duplication-bounded, not
    * corpus-bounded); the rebuild aggregates per-DOC windows only.
    */
  def exciseDuplicateSpans(docs0: DataFrame, idCol: String, textCol: String,
                           n: Int = 3, minSpanGrams: Int = 3,
                           maxOcc: Int = 1000): DataFrame = {
    val docs = docs0.filter(col(idCol).isNotNull)
    val toks = docs.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
    val grams = toks.select(col("id"),
      posexplode(graft.functions.HashFunctions.ngramHashesAll(
        col("__toks"), n)).as(Seq("pos", "g")))
    val rare = grams
      .withColumn("__occ", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("__occ") >= 2 && col("__occ") <= maxOcc)
      .drop("__occ")
    val hits = rare.select(col("g"), col("id").as("id1"), col("pos").as("pos1"))
      .join(rare.select(col("g"), col("id").as("id2"), col("pos").as("pos2")),
        Seq("g"))
      .filter(col("id1") < col("id2"))
    val wDiag = Window
      .partitionBy(col("id1"), col("id2"), col("pos1") - col("pos2"))
      .orderBy(col("pos1"))
    val runs = hits
      .withColumn("__run", col("pos1") - row_number().over(wDiag))
      .groupBy(col("id1"), col("id2"), (col("pos1") - col("pos2")).as("__d"),
        col("__run"))
      .agg(count(lit(1)).as("__len"), min(col("pos2")).as("__s2"))
      .filter(col("__len") >= minSpanGrams)
    // covered VICTIM token positions (0-based): a run of k grams from
    // gram-pos s covers tokens [s, s + k + n - 2]
    val covered = runs
      .select(col("id2").as("id"),
        explode(sequence(col("__s2"),
          col("__s2") + col("__len") + lit(n - 2))).as("pos"))
      .distinct()
    val affIds = covered.select(col("id")).distinct()
    val keptAgg = toks
      .join(affIds, Seq("id"), "left_semi")
      .select(col("id"), posexplode(col("__toks")).as(Seq("pos", "tok")))
      .join(covered, Seq("id", "pos"), "left_anti")
      .groupBy(col("id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("__clean"),
        count(lit(1)).as("__kept"))
    val affected = toks
      .join(affIds, Seq("id"), "left_semi")
      .select(col("id"), size(col("__toks")).cast("long").as("__tot"))
      .join(keptAgg, Seq("id"), "left") // a FULLY covered doc keeps nothing
      .select(col("id").as(idCol),
        coalesce(col("__clean"), lit("")).as(textCol),
        (col("__tot") - coalesce(col("__kept"), lit(0L))).as("n_dropped"))
    val untouched = docs
      .join(affIds.select(col("id").as(idCol)), Seq(idCol), "left_anti")
      .select(col(idCol), col(textCol), lit(0L).as("n_dropped"))
    untouched.unionByName(affected)
  }

  /** Connected components over an undirected near-dup pair list — the
    * canonical step AFTER pair detection: a component is a duplicate
    * CLUSTER, and keeping min-id-per-cluster dedups transitively (A≈B,
    * B≈C collapses all three even when A~C was never proposed).
    *
    * Algorithm: iterative min-label propagation to a fixpoint — each
    * round, every edge-touched node takes the min of its own label and
    * its neighbors'; converges in O(graph diameter) rounds. Near-dup
    * graphs are short-diameter star/clique mixtures (the LSH hot-bucket
    * cap emits stars by construction), so rounds stay single-digit at any
    * corpus size; `maxIters` guards the loop and a non-converged exit
    * THROWS rather than returning silently-wrong partial labels.
    *
    * Scale shape (the parts that matter at 100 TB):
    *  - the loop runs over EDGE-TOUCHED nodes only — in a dedup corpus
    *    the overwhelming majority of documents are in no near-dup pair,
    *    and they skip every round entirely; untouched nodes get their
    *    singleton label through one final (broadcast) join;
    *  - the edge table carries a self-loop per endpoint, so min-over-
    *    neighbors already includes the node's own label and a round is
    *    ONE join + ONE aggregate — no separate label-update join (half
    *    the exchanges of the textbook formulation), and round 1 needs no
    *    label table at all (initial labels are the ids themselves, so it
    *    collapses to `min(b) group by a` on the edge list);
    *  - per-round state is 2 longs per edge-touched node, never document
    *    payloads.
    *
    * Checkpoint, NOT persist: an iterative frame's LOGICAL plan
    * doubles every round (persist caches only the physical result —
    * analysis still walks the whole history), so by round k Catalyst is
    * optimizing a 2^k-node plan. Checkpointing truncates the lineage so
    * every round's plan is constant-size. The mode follows the session
    * ([[Checkpoints.truncate]]): reliable `.checkpoint()` when
    * `setCheckpointDir` was called — the cluster deployment, where a
    * multi-hour build must survive executor loss — executor-local
    * otherwise (the single-JVM/interactive trade). Results and plan
    * shape are identical either way.
    *
    * Deterministic: labels are exact integer minima — no tie-break
    * ambiguity, any execution order converges to the same fixpoint.
    *
    * EDGE-GRAPH SEMANTICS: components are computed over the edge list AS
    * GIVEN. An endpoint absent from `nodes` still CONDUCTS connectivity
    * (A≈X, X≈B merges A and B even when X was filtered out of `nodes` —
    * a removed document's similarity edges remain evidence of duplication)
    * but emits no output row. If removed nodes must not conduct, filter
    * the EDGE list to surviving endpoints before calling — membership is
    * the caller's one-join decision, not a cost every caller pays.
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame, idCol: String,
                          maxIters: Int = 20): DataFrame = {
    // Symmetrized edge list PLUS a self-loop per endpoint: with (a, a)
    // present, min-over-neighbors already includes the node's own label,
    // so a round is ONE join + ONE aggregate — no separate "least with my
    // previous label" update join, which halves the exchanges per round.
    val endpoints = edges.select(col("id1").as("a"))
      .union(edges.select(col("id2").as("a"))).distinct()
    val und = edges.select(col("id1").as("a"), col("id2").as("b"))
      .union(edges.select(col("id2").as("a"), col("id1").as("b")))
      .union(endpoints.select(col("a"), col("a").as("b")))
      .transform(Checkpoints.truncate)
    var converged = und.isEmpty // no edges → nothing to propagate
    // Round 1 needs no label table at all: every node's initial label is
    // its own id, so min-label-over-neighbors is just min(b) per a.
    var labels: DataFrame =
      if (converged) null
      else und.groupBy(col("a")).agg(min(col("b")).as("lbl"))
        .select(col("a").as("id"), col("lbl"))
        .transform(Checkpoints.truncate)
    // Fixpoint detection: labels only ever DECREASE, so the exact label
    // sum is strictly monotone until convergence — an unchanged sum IS
    // the fixpoint. The aggregate reads the just-checkpointed blocks
    // (decimal-exact: at corpus scale a 64-bit sum of 64-bit ids could
    // overflow).
    var prevSum: java.math.BigDecimal =
      if (converged) null
      else labels.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)
    var it = 1 // round 1 (the label-free aggregate) already ran
    while (!converged && it < maxIters) {
      val next = und
        .join(labels.select(col("id").as("b"), col("lbl").as("nlbl")), Seq("b"))
        .groupBy(col("a")).agg(min(col("nlbl")).as("lbl"))
        .select(col("a").as("id"), col("lbl"))
        .transform(Checkpoints.truncate)
      val s = next.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      // release via Checkpoints: Dataset.unpersist is a no-op on a
      // checkpointed frame (blocks are RDD-persisted, not CacheManager
      // entries), so each round's predecessor used to linger in
      // executor storage until RDD GC
      Checkpoints.release(labels)
      labels = next
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds — " +
          "graph diameter exceeds maxIters; raise maxIters (labels at " +
          "this point would be silently wrong, so refusing to return them)")
    // The loop ran over EDGE-TOUCHED nodes only — in a dedup corpus the
    // overwhelming majority of documents are in no near-dup pair and
    // skip every round. Untouched nodes become singleton clusters
    // labeled by their own id here; the label table is the duplicate
    // subgraph only — small by near-dup construction — so this join
    // broadcasts and the corpus is never shuffled.
    val out = nodes.select(col(idCol))
      .join(
        if (labels == null) endpoints.limit(0)
          .select(col("a").as(idCol), col("a").as("lbl"))
        else labels.withColumnRenamed("id", idCol),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("lbl"), col(idCol)).as("cluster"))
    Checkpoints.release(und)
    out
  }

  /** One-call corpus near-dedup — the composed pipeline a user actually
    * runs: MinHash candidates → exact n-gram-Jaccard verification at
    * `threshold` → connected components → keep the LOWEST id per
    * duplicate cluster. Returns the surviving rows of `docs` (all
    * columns) plus `cluster` (the group the row won) and `n_dropped`
    * (how many near-duplicates it absorbed — 0 for singletons).
    *
    * Each stage is the independently-tested operator above; this
    * function only owns the composition and the survivor join. Scale
    * properties are inherited: banded candidates (never all-pairs),
    * capped hot buckets, verification only on candidates, CC over the
    * duplicate subgraph only.
    */
  def dedupCorpus(docs: DataFrame, idCol: String, textCol: String,
                  threshold: Double = 0.8, shingleN: Int = 3,
                  numHashes: Int = 32, bands: Int = 16,
                  maxBucket: Int = 10000): DataFrame =
    clusteredCorpus(docs, idCol, textCol, threshold, shingleN, numHashes,
        bands, maxBucket)
      .filter(col(idCol) === col("cluster")) // survivor = cluster min
      .withColumn("n_dropped", col("__sz") - 1)
      .drop("__sz")
      .unionByName(nullIdSingletons(docs, idCol))

  /** [[dedupCorpus]] with the survivor chosen by QUALITY instead of by
    * id: each duplicate cluster keeps the row with the highest
    * `priorityCol` (id ascending tiebreak; null priority loses to any
    * non-null) — "keep the longest / highest-quality copy", the
    * selection production near-dedup pipelines actually want, where
    * cluster-min would keep whichever near-duplicate happened to be
    * crawled first. Same candidates, verification, and clusters as
    * [[dedupCorpus]]; only the survivor pick differs, via a per-cluster
    * `row_number` (clusters are near-dup-sized, so the window partition
    * is always small). `cluster` still labels the group (the cluster's
    * MIN id, which now need not be the survivor's own id).
    */
  def dedupCorpusBest(docs: DataFrame, idCol: String, textCol: String,
                      priorityCol: String,
                      threshold: Double = 0.8, shingleN: Int = 3,
                      numHashes: Int = 32, bands: Int = 16,
                      maxBucket: Int = 10000): DataFrame = {
    val ord = Window.partitionBy(col("cluster"))
      .orderBy(col(priorityCol).desc_nulls_last, col(idCol))
    clusteredCorpus(docs, idCol, textCol, threshold, shingleN, numHashes,
        bands, maxBucket)
      .withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") === 1)
      .withColumn("n_dropped", col("__sz") - 1)
      .drop("__sz", "__rn")
      .unionByName(nullIdSingletons(docs, idCol))
  }

  /** The shared [[dedupCorpus]]/[[dedupCorpusBest]] pipeline up to (but
    * not including) the survivor pick: MinHash candidates → exact
    * n-gram-Jaccard verification at `threshold` → connected components →
    * every keyed row joined with its `cluster` label and `__sz` (cluster
    * size, via a window over the SAME joined frame — a separate sizes
    * aggregate + rejoin would walk the clusters lineage, and its
    * corpus-wide singleton join, twice).
    */
  private def clusteredCorpus(docs: DataFrame, idCol: String,
                              textCol: String, threshold: Double,
                              shingleN: Int, numHashes: Int, bands: Int,
                              maxBucket: Int): DataFrame = {
    val cand = minhashCandidatePairs(docs, idCol, textCol, shingleN,
      numHashes, bands, maxBucket)
    // signature-agreement prescreen: Bin(numHashes, threshold) below half
    // the threshold is vanishingly unlikely for a true pair (same bound
    // q19 documents), so exact verification work stays candidate-sized
    val edges = ngramJaccard(cand.filter(col("est_jaccard") >= threshold / 2)
        .select("id1", "id2"), docs, idCol, textCol, shingleN)
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2")
    // null-id rows cannot key a pair or a cluster join — the inner join
    // below would silently DROP them (row loss, not dedup). They cannot
    // be near-dup-tracked either (no identity to pair on), so they
    // survive as their own singletons, like exact()'s deliberate
    // null-key handling.
    val keyed = docs.filter(col(idCol).isNotNull)
    val clusters = connectedComponents(edges, keyed.select(col(idCol)), idCol)
    val w = Window.partitionBy(col("cluster"))
    keyed
      .join(clusters, Seq(idCol))
      .withColumn("__sz", count(lit(1)).over(w))
  }

  /** The null-id rows of `docs` as their own singleton "clusters" — the
    * union branch both corpus-dedup faces append (see the null-id note
    * in [[clusteredCorpus]]).
    */
  private def nullIdSingletons(docs: DataFrame, idCol: String): DataFrame =
    docs.filter(col(idCol).isNull)
      .withColumn("cluster", col(idCol))
      .withColumn("n_dropped", lit(0L))

  /** SimHash 64-bit fingerprint from token hashes: for each bit position,
    * sum ±1 votes across token hashes; the sign recomposes the bit.
    * Pure built-ins (`transform` over 64 positions + `aggregate`), fully
    * codegen'd; near-dup test is `bit_count(a ^ b) <= t`.
    */
  def simhash64(text: Column): Column =
    graft.functions.HashFunctions.simhash64(TextAnalysis.tokens(text))

  /** Oracle-checkable SimHash profile: identical voting scheme, but token
    * hashes are the first 8 bytes of MD5(token) so any engine with md5()
    * reproduces the fingerprint bit-for-bit. Use [[simhash64]] (engine-local
    * hash family, ~no hashing cost) when cross-engine verifiability isn't
    * needed.
    */
  def simhash64Portable(text: Column): Column =
    graft.functions.HashFunctions.simhash64Md5(TextAnalysis.tokens(text))

  /** SimHash near-dup PAIR MINING — the block-bucketed join that turns
    * the per-doc fingerprint ([[simhash64]]) into pairs at corpus scale
    * (the Manku/Jain/Sarma WWW'07 shape): split the 64-bit fingerprint
    * into `blocks` equal bit-blocks and bucket-join on (block index,
    * block value).
    *
    * EXACT RECALL by pigeonhole: a pair within `maxHamming` bits differs
    * in at most `maxHamming` blocks, so with `blocks > maxHamming` at
    * least one block is IDENTICAL and the pair meets in that block's
    * bucket — candidate generation misses nothing, and the exact
    * `bit_count` filter keeps only true pairs. This is the cheap cousin
    * of MinHash-LSH: one 8-byte fingerprint per doc (vs numHashes
    * minhashes), bitwise verification (vs signature/shingle comparison),
    * at the cost of a coarser similarity notion (Hamming on hyperplane
    * votes, not Jaccard).
    *
    * Scale shape: one fingerprint pass; each doc explodes into `blocks`
    * bucket rows; the bucket-size window rides the SAME shuffle the pair
    * join needs. Bucket width is 64/blocks bits, so pick the smallest
    * `blocks` the threshold admits (blocks = maxHamming + 1 when it
    * divides 64) — wider blocks = more bucket values = smaller buckets.
    * Oversized buckets (a boilerplate flood collapses to few distinct
    * fingerprints) emit a lowest-id STAR like
    * [[minhashCandidatePairs]] — linear, connectivity-preserving for
    * clustering, but star members are only verified against the
    * representative, so exact recall holds where the cap doesn't bind.
    *
    * Returns (id1 < id2, hamming ≤ maxHamming). `portable = true` swaps
    * in the MD5-profile fingerprint ([[simhash64Portable]]) so the full
    * pair set is reproducible in any engine with md5() — the
    * verification profile, not the default.
    */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3, blocks: Int = 4,
                          maxBucket: Int = 10000,
                          portable: Boolean = false): DataFrame =
    simhashPairsCore(docs, idCol, textCol, maxHamming, blocks, maxBucket,
      portable)._1

  /** [[simhashNearDupPairs]] plus the handle of the persisted band
    * frame, for drivers that mine many corpora in one session and
    * release per call once the pairs are consumed —
    * [[graft.streaming.StreamingDedup.simhashNearDupsEachBatch]] is the
    * per-micro-batch consumer. The public face keeps the
    * session-lifetime cache contract from the header scaladoc.
    */
  private[graft] def simhashPairsCore(docs: DataFrame, idCol: String,
                                      textCol: String, maxHamming: Int,
                                      blocks: Int, maxBucket: Int,
                                      portable: Boolean): (DataFrame, DataFrame) = {
    require(blocks > maxHamming,
      s"pigeonhole recall needs blocks ($blocks) > maxHamming ($maxHamming)")
    require(blocks >= 1 && 64 % blocks == 0,
      s"blocks ($blocks) must be in 1..64 and divide 64")
    require(maxBucket >= 1, "maxBucket must be positive")
    val width = 64 / blocks
    // width = 64 (blocks = 1, the exact-duplicate profile): 1L << 64
    // wraps to 1, so the whole-word mask is spelled out
    val mask = if (width == 64) -1L else (1L << width) - 1
    val fpExpr =
      if (portable) simhash64Portable(col(textCol)) else simhash64(col(textCol))
    val tb = explode(array((0 until blocks).map(b =>
      struct(lit(b).as("blk"),
        shiftrightunsigned(col("fp"), b * width).bitwiseAND(lit(mask))
          .as("bval"))): _*))
    val banded = docs.select(col(idCol).as("id"), fpExpr.as("fp"))
      .select(col("id"), col("fp"), tb.as("tb"))
      .select(col("id"), col("fp"),
        col("tb.blk").as("blk"), col("tb.bval").as("bval"))
      .withColumn("__bsz", count(lit(1)).over(
        Window.partitionBy(col("blk"), col("bval"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val normal = banded.filter(col("__bsz") <= maxBucket)
    val clique = normal
      .select(col("blk"), col("bval"), col("id").as("id1"), col("fp").as("fp1"))
      .join(normal.select(col("blk"), col("bval"),
        col("id").as("id2"), col("fp").as("fp2")), Seq("blk", "bval"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("fp1"), col("fp2"))
    val over = banded.filter(col("__bsz") > maxBucket)
    val reps = over.groupBy(col("blk"), col("bval"))
      .agg(min(col("id")).as("__rid"), min_by(col("fp"), col("id")).as("__rfp"))
    val star = over.join(reps, Seq("blk", "bval"))
      .filter(col("id") =!= col("__rid"))
      .select(col("__rid").as("id1"), col("id").as("id2"),
        col("__rfp").as("fp1"), col("fp").as("fp2"))
    val pairs = clique.unionByName(star)
      // multi-block duplicates collapse in the same shuffle that pairs
      .groupBy(col("id1"), col("id2"))
      .agg(first(col("fp1")).as("fp1"), first(col("fp2")).as("fp2"))
      .withColumn("hamming",
        bit_count(col("fp1").bitwiseXOR(col("fp2"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
    (pairs, banded)
  }

  /** Hamming distance between two simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Persist the SimHash FINGERPRINT index: one (id, 8-byte fp) row per
    * doc — 16 bytes of index per document, vs bands × (hash + signature)
    * for the MinHash band table. The cheap screening index of the
    * incremental family: probes ([[incrementalSimhashPairs]]) derive
    * block buckets from the fingerprints at probe time, so block count /
    * Hamming threshold are PROBE parameters, not baked into the index —
    * one index serves every threshold. `meta` pins only the fingerprint
    * family (`portable`), which must match between index and probes or
    * nothing would ever collide.
    */
  def saveSimhashIndex(docs: DataFrame, path: String, idCol: String,
                       textCol: String, portable: Boolean = false): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fpExpr =
      if (portable) simhash64Portable(col(textCol)) else simhash64(col(textCol))
    // ID-sorted layout, deliberately: no reader ever filters by fp (the
    // probe derives block buckets and semi-joins — fp stats would prune
    // nothing), but every APPEND's idempotence check filters by id range,
    // and id-range-partitioned files + sorted row groups let parquet
    // stats answer it without scanning history (see [[simhashAppendRows]])
    docs.select(col(idCol).as("id"), fpExpr.as("fp"))
      .dropDuplicates("id")
      .repartitionByRange(col("id"))
      .sortWithinPartitions(col("id"))
      .write.mode("overwrite").parquet(s"$path/fp")
    Seq(Tuple1(portable)).toDF("portable")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    // a fresh index must not inherit a previous incarnation's deletes
    Tombstones.drop(spark, s"$path/tombstones")
  }

  /** The rows an append would add: the batch (internal duplicate ids
    * collapsed) minus already-indexed ids. The idempotence anti-join
    * first prunes the index scan to the batch's [min, max] id span — an
    * indexed id OUTSIDE the span cannot equal any batch id, so the
    * restriction is lossless — and the id-sorted layout the writers keep
    * turns that pushed range predicate into parquet row-group/file skips.
    * Append cost is therefore bounded by the id-range OVERLAP between
    * batch and history (≈ zero under monotonic id assignment, the normal
    * batch-pipeline case; at worst, fully interleaved ids degrade to the
    * old full-id-set scan), never by reading all history ids
    * unconditionally. Costs one extra driver job computing the batch's
    * id bounds. Exposed (not private) so DedupSpec can pin the plan
    * shape: pushed id-range filters on the index scan, id-only
    * ReadSchema, no full-index sort-merge exchange.
    */
  private[graft] def simhashAppendRows(newDocs: DataFrame, path: String,
                                       idCol: String,
                                       textCol: String): DataFrame = {
    val spark = newDocs.sparkSession
    val fpExpr =
      if (readSimhashMeta(spark, path)) simhash64Portable(col(textCol))
      else simhash64(col(textCol))
    val batch = newDocs.select(col(idCol).as("id"), fpExpr.as("fp"))
      .dropDuplicates("id")
    // CONTENT-CHANGE GUARD (r12): the idempotence anti-join below is by
    // id, so a batch id already indexed under a DIFFERENT fingerprint —
    // the delete-then-re-append-with-edited-text flow, or a mutated
    // re-ingest — would be silently skipped, leaving the id discoverable
    // only by its STALE text's fingerprint (recall loss, no error). An
    // append-only index cannot replace content; refuse loudly with the
    // working recipe. Cost: the same range-pruned span probe the
    // anti-join reads, once per append.
    val bounds = newDocs.agg(min(col(idCol)), max(col(idCol))).head()
    if (!bounds.isNullAt(0)) {
      val span = spark.read.parquet(s"$path/fp")
        .where(col("id") >= lit(bounds.get(0)) &&
          col("id") <= lit(bounds.get(1)))
      val changed = batch
        .join(span.select(col("id"), col("fp").as("__old_fp")), Seq("id"))
        .filter(col("fp") =!= col("__old_fp"))
        .select(col("id")).limit(5).collect().map(_.get(0))
      require(changed.isEmpty,
        s"appendSimhashIndex: batch ids [${changed.mkString(", ")}" +
          (if (changed.length == 5) ", …" else "") +
          "] are already indexed under a DIFFERENT fingerprint — an " +
          "append-only index cannot replace content (the stale row " +
          "would keep answering probes). deleteFromSimhashIndex the " +
          "ids, compactSimhashIndex (physically removing the old " +
          "rows), then append the new text.")
    }
    Lifecycle.freshByIdRange(batch, newDocs, idCol,
      spark.read.parquet(s"$path/fp").select(col("id")), "id")
  }

  /** Grow the fingerprint index with a processed batch: batch-internal
    * duplicate ids collapse, already-indexed ids are anti-joined away
    * (idempotent re-appends) with the history side range-pruned to the
    * batch's id span — O(overlap), not O(history ids); see
    * [[simhashAppendRows]] for the mechanism. Each appended file is
    * written id-sorted so future appends can prune it too. Serialized
    * appends per path.
    */
  def appendSimhashIndex(newDocs: DataFrame, path: String, idCol: String,
                         textCol: String): Unit = {
    // append-after-delete revives (see [[Tombstones]]): the cleared
    // id's persisted fingerprint row becomes live again, and the
    // idempotence anti-join below declines to duplicate it
    Tombstones.clear(newDocs.select(col(idCol).as("id")), "id",
      s"$path/tombstones")
    simhashAppendRows(newDocs, path, idCol, textCol)
      .sortWithinPartitions(col("id"))
      .write.mode("append").parquet(s"$path/fp")
  }

  /** Delete documents from the SimHash fingerprint index by id —
    * probes ([[incrementalSimhashPairs]], the streaming face) stop
    * matching them immediately; [[compactSimhashIndex]] applies the
    * sidecar physically and drops it. Re-appending revives.
    */
  def deleteFromSimhashIndex(ids: DataFrame, path: String,
                             idCol: String): Unit =
    Tombstones.add(ids.select(col(idCol).as("id")), "id",
      s"$path/tombstones")

  /** Rewrite the fingerprint table as one compact, globally
    * id-range-partitioned, id-sorted table. Appends keep each FILE
    * prunable but accumulate a file set per batch; after many batches
    * this restores the [[saveSimhashIndex]] layout (and collapses any
    * duplicate ids a legacy fp-sorted index may carry) so append-time
    * range pruning skips whole files again. Same quiet-moment contract
    * and staged swap as [[compactMinhashIndex]]; probe and append
    * results are identical before and after.
    */
  def compactSimhashIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String): Unit = {
    Lifecycle.stagedSwap(spark, s"$path/fp") { staged =>
      Tombstones.applyTo(spark.read.parquet(s"$path/fp"), "id",
          s"$path/tombstones")
        .groupBy(col("id")).agg(min(col("fp")).as("fp"))
        .repartitionByRange(col("id"))
        .sortWithinPartitions(col("id"))
        .write.mode("overwrite").parquet(staged)
    }
    Tombstones.drop(spark, s"$path/tombstones")
  }

  private[graft] def readSimhashMeta(spark: org.apache.spark.sql.SparkSession,
                                     path: String): Boolean =
    spark.read.parquet(s"$path/meta").head().getBoolean(0)

  /** SimHash near-dup pairs of a NEW batch against the persisted
    * fingerprint index plus within itself — [[incrementalMinhashPairs]]'
    * cheap sibling: history TEXT is never re-read and historical
    * fingerprints are never recomputed (the whole history contribution
    * is one 16-byte-per-doc scan). Output matches
    * [[simhashNearDupPairs]]: (id1 < id2, hamming ≤ maxHamming), exact
    * recall by the same pigeonhole argument.
    *
    * Scale shape: block buckets are DERIVED from the fingerprint at
    * probe time (the index stores no blocks), then the index side is
    * pruned to the buckets the batch touches via a semi-join BEFORE any
    * window work; the per-bucket cap (lowest ids, deterministic) bounds
    * a boilerplate flood's join fan-out to batch × maxBucket. Because
    * blocks are probe-derived, the cap window cannot move to write time
    * here — its input is already restricted to batch-touched buckets,
    * so the window's cost is bounded by what the batch touches, never
    * by history size.
    */
  def incrementalSimhashPairs(newDocs: DataFrame, path: String,
                              idCol: String, textCol: String,
                              maxHamming: Int = 3, blocks: Int = 4,
                              maxBucket: Int = 10000): DataFrame =
    incrementalSimhashCore(newDocs, path, idCol, textCol, maxHamming,
      blocks, maxBucket)._1

  /** [[incrementalSimhashPairs]] plus the handles of its persisted
    * frames (the batch block table and the batch-internal miner's band
    * frame), for per-batch drivers that release after each sink —
    * [[graft.streaming.StreamingDedup.simhashNearDupsEachBatch]].
    */
  private[graft] def incrementalSimhashCore(newDocs: DataFrame, path: String,
                                            idCol: String, textCol: String,
                                            maxHamming: Int, blocks: Int,
                                            maxBucket: Int): (DataFrame, Seq[DataFrame]) = {
    require(blocks > maxHamming,
      s"pigeonhole recall needs blocks ($blocks) > maxHamming ($maxHamming)")
    require(blocks >= 1 && 64 % blocks == 0,
      s"blocks ($blocks) must be in 1..64 and divide 64")
    require(maxBucket >= 1, "maxBucket must be positive")
    val spark = newDocs.sparkSession
    val portable = readSimhashMeta(spark, path)
    val width = 64 / blocks
    val mask = if (width == 64) -1L else (1L << width) - 1
    def explodeBlocks(fp: DataFrame): DataFrame = fp
      .select(col("id"), col("fp"),
        explode(array((0 until blocks).map(b =>
          struct(lit(b).as("blk"),
            shiftrightunsigned(col("fp"), b * width).bitwiseAND(lit(mask))
              .as("bval"))): _*)).as("tb"))
      .select(col("id"), col("fp"),
        col("tb.blk").as("blk"), col("tb.bval").as("bval"))
    val fpExpr =
      if (portable) simhash64Portable(col(textCol)) else simhash64(col(textCol))
    val newBlocks = explodeBlocks(
        newDocs.select(col(idCol).as("id"), fpExpr.as("fp")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val touched = Tombstones.applyTo(
      explodeBlocks(spark.read.parquet(s"$path/fp"))
        .join(newBlocks.select(col("blk"), col("bval")).distinct(),
          Seq("blk", "bval"), "left_semi"),
      "id", s"$path/tombstones")
    val capW = Window.partitionBy(col("blk"), col("bval")).orderBy(col("id"))
    val capped = touched.withColumn("__bn", row_number().over(capW))
      .filter(col("__bn") <= maxBucket)
    val cross = newBlocks
      .select(col("blk"), col("bval"), col("id").as("__nid"), col("fp").as("__nfp"))
      .join(capped.select(col("blk"), col("bval"),
        col("id").as("__oid"), col("fp").as("__ofp")), Seq("blk", "bval"))
      .filter(col("__nid") =!= col("__oid"))
      .select(least(col("__nid"), col("__oid")).as("id1"),
        greatest(col("__nid"), col("__oid")).as("id2"),
        col("__nfp").as("fp1"), col("__ofp").as("fp2"))
      .groupBy(col("id1"), col("id2"))
      .agg(first(col("fp1")).as("fp1"), first(col("fp2")).as("fp2"))
      .withColumn("hamming",
        bit_count(col("fp1").bitwiseXOR(col("fp2"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
    // batch-internal pairs re-fingerprint the (small) batch — one extra
    // pass over the batch, zero passes over history
    val (newNew, nnBanded) = simhashPairsCore(newDocs, idCol, textCol,
      maxHamming, blocks, maxBucket, portable)
    val pairs = cross.unionByName(newNew)
      // idempotent re-runs: a batch doc already in the index surfaces
      // from both paths — keep one row
      .groupBy(col("id1"), col("id2"))
      .agg(first(col("hamming")).as("hamming"))
    (pairs, Seq(newBlocks, nnBanded))
  }

  /** Embedding cosine near-dup pairs within a blocking key (e.g. an LSH
    * bucket or source partition): exact cosine on pairs that share the
    * block, id1 < id2, above `threshold`.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        blockCol: String, threshold: Double): DataFrame = {
    import graft.functions.VectorOps
    val withNorm = df.select(col(blockCol), col(idCol).as("id"),
      col(vecCol).as("v"), VectorOps.norm(col(vecCol)).as("nrm"))
    val l = withNorm.select(col(blockCol), col("id").as("id1"),
      col("v").as("v1"), col("nrm").as("n1"))
    val r = withNorm.select(col(blockCol), col("id").as("id2"),
      col("v").as("v2"), col("nrm").as("n2"))
    val nn = col("n1") * col("n2")
    l.join(r, Seq(blockCol))
      .filter(col("id1") < col("id2"))
      .withColumn("cos", when(nn === 0.0, 0.0)
        .otherwise(VectorOps.dot(col("v1"), col("v2")) / nn))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }
}
