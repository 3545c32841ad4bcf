package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Delete lifecycle for the five persisted index families: tombstoned
  * docs stop matching immediately (probe-side anti-join), deletes are
  * idempotent, re-appending revives, and compaction applies the sidecar
  * physically then drops it with identical probe results before/after.
  */
class TombstoneSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def sidecarExists(p: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(p))

  // --- digest (exact-dedup) family -----------------------------------

  test("digest: delete by text hides membership; replayed delete idempotent; append revives; compact applies+drops") {
    val path = tmpDir("graft_ts_dg") + "/digests"
    val mk = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
    val hist = mk(Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma",
      4L -> "alpha")) // 4 shares 1's text: content-keyed delete hits both
    Dedup.saveDigestIndex(hist, path, "text")
    val batch = mk(Seq(10L -> "alpha", 11L -> "beta", 12L -> "delta"))
    def survivors() =
      Dedup.incrementalExact(batch, path, "doc_id", "text")
        .collect().map(_.getString(1)).toSet
    assert(survivors() == Set("delta"))

    Dedup.deleteFromDigestIndex(mk(Seq(1L -> "alpha")), path, "text")
    assert(survivors() == Set("alpha", "delta"))
    // replayed delete: same result, and the sidecar did not grow
    val tombPath = s"${path}_tombstones"
    val tombRows = spark.read.parquet(tombPath).count()
    Dedup.deleteFromDigestIndex(mk(Seq(1L -> "alpha")), path, "text")
    assert(spark.read.parquet(tombPath).count() == tombRows)
    assert(survivors() == Set("alpha", "delta"))

    // append-after-delete revives the text (sidecar cleared)
    Dedup.appendDigestIndex(mk(Seq(20L -> "alpha")), path, "text")
    assert(survivors() == Set("delta"))

    // delete again, then compact: physically applied, sidecar dropped,
    // probe results identical before and after
    Dedup.deleteFromDigestIndex(mk(Seq(2L -> "beta")), path, "text")
    val before = survivors()
    assert(before == Set("beta", "delta"))
    Dedup.compactDigestIndex(spark, path)
    assert(!sidecarExists(tombPath), "compaction must drop the sidecar")
    assert(survivors() == before)
    // and the digest row is physically gone
    val betaDg = mk(Seq(0L -> "beta"))
      .select(md5(col("text"))).head().getString(0)
    assert(spark.read.parquet(path)
      .filter(col("digest") === betaDg).count() == 0)
  }

  // --- MinHash band index --------------------------------------------

  test("minhash: deleted id stops flagging, revives on re-append, compact removes rows") {
    val path = tmpDir("graft_ts_mh") + "/idx"
    val base = "the quick brown fox jumps over the lazy dog and runs away home"
    val hist = Seq(1L -> base, 2L -> "completely unrelated text about spark")
      .toDF("doc_id", "text")
    Dedup.saveMinhashIndex(hist, path, "doc_id", "text", bands = 16)
    val probe = Seq(50L -> base).toDF("doc_id", "text")
    def flagged() =
      Dedup.flagAgainstIndex(probe, path, "doc_id", "text")
        .collect().map(_.getLong(1)).toSet
    assert(flagged() == Set(1L))

    Dedup.deleteFromMinhashIndex(Seq(1L).toDF("doc_id"), path, "doc_id")
    assert(flagged() == Set.empty[Long])

    // re-append doc 1: tombstone cleared, persisted band rows revive,
    // and the idempotence anti-join adds no duplicates
    val rowsBefore = spark.read.parquet(s"$path/bands").count()
    Dedup.appendMinhashIndex(hist.filter(col("doc_id") === 1L), path,
      "doc_id", "text")
    assert(spark.read.parquet(s"$path/bands").count() == rowsBefore)
    assert(flagged() == Set(1L))

    // delete + compact: band rows physically removed, sidecar dropped
    Dedup.deleteFromMinhashIndex(Seq(1L).toDF("doc_id"), path, "doc_id")
    Dedup.compactMinhashIndex(spark, path)
    assert(!sidecarExists(s"$path/tombstones"))
    assert(spark.read.parquet(s"$path/bands")
      .filter(col("id") === 1L).count() == 0)
    assert(flagged() == Set.empty[Long])
    spark.sharedState.cacheManager.clearCache()
  }

  // --- SimHash fingerprint index -------------------------------------

  test("simhash: deleted id excluded from incremental pairs; compact applies+drops") {
    val path = tmpDir("graft_ts_sh") + "/idx"
    val base = "the quick brown fox jumps over the lazy dog and runs away home"
    val hist = Seq(1L -> base, 2L -> "completely unrelated text about spark")
      .toDF("doc_id", "text")
    Dedup.saveSimhashIndex(hist, path, "doc_id", "text")
    val probe = Seq(50L -> base).toDF("doc_id", "text")
    def pairs() =
      Dedup.incrementalSimhashPairs(probe, path, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs() == Set((1L, 50L)))

    Dedup.deleteFromSimhashIndex(Seq(1L).toDF("doc_id"), path, "doc_id")
    assert(pairs() == Set.empty[(Long, Long)])

    Dedup.appendSimhashIndex(hist.filter(col("doc_id") === 1L), path,
      "doc_id", "text") // revive; no duplicate fp row
    assert(spark.read.parquet(s"$path/fp").filter(col("id") === 1L)
      .count() == 1)
    assert(pairs() == Set((1L, 50L)))

    Dedup.deleteFromSimhashIndex(Seq(1L).toDF("doc_id"), path, "doc_id")
    Dedup.compactSimhashIndex(spark, path)
    assert(!sidecarExists(s"$path/tombstones"))
    assert(spark.read.parquet(s"$path/fp").filter(col("id") === 1L)
      .count() == 0)
    assert(pairs() == Set.empty[(Long, Long)])
    spark.sharedState.cacheManager.clearCache()
  }

  // --- IVF index ------------------------------------------------------

  private def vecRows(ids: Long*) = ids.map { i =>
    (i, Array.tabulate(8)(d => (math.sin(i * 7.0 + d) * 10).toFloat))
  }.toDF("vec_id", "embedding")

  test("ivf: deleted id vanishes from search, revives on re-append, compact applies+drops") {
    val path = tmpDir("graft_ts_ivf") + "/idx"
    val corpus = vecRows(1L to 40L: _*)
    val (cells, cents) =
      Similarity.ivfAssign(corpus, "vec_id", "embedding", nCells = 4)
    Similarity.saveIvfIndex(cells, cents, path)
    cells.unpersist(blocking = false)
    val queries = vecRows(1L)
    def hits() = {
      val (loaded, c) = Similarity.loadIvfIndex(spark, path)
      Similarity.ivfSearch(loaded, c, queries, "vec_id", "embedding",
        k = 40, nProbe = 4).collect().map(_.getLong(1)).toSet
    }
    val all = hits()
    assert(all.contains(2L))

    Similarity.deleteFromIvfIndex(Seq(2L).toDF("vec_id"), path, "vec_id")
    assert(hits() == all - 2L)
    // idempotent replay
    Similarity.deleteFromIvfIndex(Seq(2L).toDF("vec_id"), path, "vec_id")
    assert(hits() == all - 2L)

    // revive via append: no duplicate cell row
    Similarity.appendIvfIndex(vecRows(2L), path, "vec_id", "embedding")
    assert(spark.read.parquet(s"$path/cells")
      .filter(col("vec_id") === 2L).count() == 1)
    assert(hits() == all)

    Similarity.deleteFromIvfIndex(Seq(3L).toDF("vec_id"), path, "vec_id")
    val before = hits()
    Similarity.compactIvfIndex(spark, path, "vec_id")
    assert(!sidecarExists(s"$path/tombstones"))
    assert(spark.read.parquet(s"$path/cells")
      .filter(col("vec_id") === 3L).count() == 0)
    assert(hits() == before)
  }

  // --- LSH index ------------------------------------------------------

  test("lsh: deleted id vanishes from search and frees its cap slot; compact applies+drops") {
    val path = tmpDir("graft_ts_lsh") + "/idx"
    val corpus = vecRows(1L to 40L: _*)
    Similarity.saveLshIndex(corpus, path, "vec_id", "embedding",
      bits = 8, prefixBits = 2, tables = 2, portableDim = 8)
    val queries = vecRows(1L)
    def hits() =
      Similarity.lshSearch(spark, path, queries, "vec_id", "embedding",
        k = 40, multiProbe = true, maxBucket = Int.MaxValue)
        .collect().map(_.getLong(1)).toSet
    val all = hits()
    assert(all.nonEmpty)
    val victim = all.head

    Similarity.deleteFromLshIndex(Seq(victim).toDF("vec_id"), path, "vec_id")
    assert(hits() == all - victim)

    Similarity.appendLshIndex(vecRows(victim), path, "vec_id", "embedding")
    assert(spark.read.parquet(s"$path/sig")
      .filter(col("vec_id") === victim).count() == 2) // one per table
    assert(hits() == all)

    Similarity.deleteFromLshIndex(Seq(victim).toDF("vec_id"), path, "vec_id")
    Similarity.compactLshIndex(spark, path, "vec_id")
    assert(!sidecarExists(s"$path/tombstones"))
    assert(spark.read.parquet(s"$path/sig")
      .filter(col("vec_id") === victim).count() == 0)
    assert(hits() == all - victim)
  }

  // --- PQ index (sixth family) ---------------------------------------

  test("pq: deleted id vanishes from ADC search, revives on re-append " +
       "without a duplicate code row, compact applies+drops") {
    val path = tmpDir("graft_ts_pq") + "/idx"
    val corpus = vecRows(1L to 40L: _*)
    val books = Similarity.pqTrain(corpus, "vec_id", "embedding",
      m = 2, k = 4, iters = 1)
    Similarity.savePqIndex(
      Similarity.pqEncode(corpus, "vec_id", "embedding", books),
      books, path, "vec_id")
    val queries = vecRows(1L)
    def hits() = {
      val (codes, b) = Similarity.loadPqIndex(spark, path)
      Similarity.pqAdcTopK(codes.withColumnRenamed("vec_id", "id"), b,
          queries, "vec_id", "embedding", k = 40)
        .collect().map(_.getLong(1)).toSet
    }
    val all = hits()
    assert(all.contains(2L) && all.size == 39) // everyone but the query

    Similarity.deleteFromPqIndex(Seq(2L).toDF("vec_id"), path, "vec_id")
    assert(hits() == all - 2L)
    // idempotent replay
    Similarity.deleteFromPqIndex(Seq(2L).toDF("vec_id"), path, "vec_id")
    assert(hits() == all - 2L)

    // revive via append against frozen codebooks: one code row, and the
    // replayed append is an exact no-op
    Similarity.appendPqIndex(vecRows(2L), path, "vec_id", "embedding")
    Similarity.appendPqIndex(vecRows(2L), path, "vec_id", "embedding")
    assert(spark.read.parquet(s"$path/codes")
      .filter(col("vec_id") === 2L).count() == 1)
    assert(hits() == all)
    // frozen codebooks: the appended row's codes re-derive from the
    // saved books, bit-identically
    val reEnc = Similarity.pqEncode(vecRows(2L), "vec_id", "embedding",
        Similarity.loadPqIndex(spark, path)._2)
      .select(col("codes")).head().getSeq[Int](0)
    assert(spark.read.parquet(s"$path/codes")
      .filter(col("vec_id") === 2L)
      .select(col("codes")).head().getSeq[Int](0) == reEnc)

    Similarity.deleteFromPqIndex(Seq(3L).toDF("vec_id"), path, "vec_id")
    val before = hits()
    Similarity.compactPqIndex(spark, path, "vec_id")
    assert(!sidecarExists(s"$path/tombstones"))
    assert(spark.read.parquet(s"$path/codes")
      .filter(col("vec_id") === 3L).count() == 0)
    assert(hits() == before)
  }
}
