package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  // near-dup pair (0,1): one word changed; (2) unrelated; (3) exact dup of 0
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs far away home", "s1"),
    (1L, "the quick brown fox jumps over the lazy cat and runs far away home", "s1"),
    (2L, "completely different content about spark shuffles and partition counts", "s1"),
    (3L, "the quick brown fox jumps over the lazy dog and runs far away home", "s1")
  ).toDF("doc_id", "text", "source")

  test("exact dedup keeps lowest id and counts copies") {
    val r = Dedup.exact(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r.length == 3) // 0/3 collapse
    assert(r.head.getLong(0) == 0L && r.head.getLong(2) == 2L)
  }

  test("minhash LSH surfaces the near-dup and exact-dup pairs") {
    // 16 bands × 2 rows: detection prob at J=0.6 is 1-(1-0.36)^16 ≈ 0.999
    // (deterministic here — fixed seeds — but chosen so the band config
    // is actually sensitive enough for this pair's similarity)
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text", bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.contains((0L, 3L)) && pairs((0L, 3L)) == 1.0) // identical text
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) > 0.3) // near dup
    assert(!pairs.keySet.exists { case (a, b) => a == 2L || b == 2L }) // unrelated
  }

  test("ngram jaccard verifies candidates exactly") {
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("id1", "id2")
    val j = Dedup.ngramJaccard(pairs, docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((0L, 3L)) == 1.0)
    assert(j((0L, 1L)) > 0.3 && j((0L, 1L)) < 1.0)
    assert(j((0L, 2L)) == 0.0)
  }

  test("inverted-index top-neighbor matches pairwise ranking incl. zero-overlap fallback") {
    val top = Dedup.ngramJaccardTopNeighbor(docs, "doc_id", "text", "source")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(top(0L) == ((3L, 1.0)))
    assert(top(3L) == ((0L, 1.0)))
    assert(top(1L)._1 == 0L) // tie between 0 and 3 → smallest id
    assert(top(2L)._2 == 0.0 && top(2L)._1 == 0L) // no overlap → fallback
  }

  test("top-neighbor pinned 0/0 semantics: sub-n-token docs rank like zero-overlap docs") {
    // ADVICE r1: two docs with < n tokens in one block have EMPTY shingle
    // sets, so their pair is 0/0 — pinned to Jaccard 0.0 (not NULL/NaN).
    // Every doc here overlaps nobody → each falls back to the smallest
    // other id in the block, exactly what a full pairwise ranking with the
    // coalesced oracle (jaccard DESC, id2) yields.
    val shorties = Seq(
      (10L, "hi there", "s1"),            // 2 tokens → empty shingle set
      (11L, "bye now", "s1"),             // 2 tokens → empty shingle set
      (12L, "ordinary text with plenty of tokens in it", "s1")
    ).toDF("doc_id", "text", "source")
    val top = Dedup.ngramJaccardTopNeighbor(shorties, "doc_id", "text", "source")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(top(10L) == ((11L, 0.0)))
    assert(top(11L) == ((10L, 0.0)))
    assert(top(12L) == ((10L, 0.0)))
  }

  test("top-neighbor excludes docs in single-doc blocks (no 'other' doc exists)") {
    val lone = Seq(
      (0L, "some shared words here in this block", "s1"),
      (1L, "some shared words here in this block too", "s1"),
      (9L, "alone in its block", "s2")
    ).toDF("doc_id", "text", "source")
    val ids = Dedup.ngramJaccardTopNeighbor(lone, "doc_id", "text", "source")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 1L))
  }

  test("top-neighbor fallback joins are aggregate-based, never a block self-join") {
    // VERDICT r1: the old fallback joined per-doc rows to per-doc rows on
    // the block key alone — O(block²) pair materialization. Guard: every
    // join keyed solely on the block column must have an aggregated
    // (per-block, linear) side.
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
    val plan = Dedup.ngramJaccardTopNeighbor(docs, "doc_id", "text", "source")
      .queryExecution.optimizedPlan
    def hasAgg(p: LogicalPlan): Boolean =
      p.collectFirst { case a: Aggregate => a }.isDefined
    val blkOnlyJoins = plan.collect { case j: Join =>
      val eqNames = j.condition.toSeq.flatMap(_.collect {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          Seq(a.name, b.name)
      }.flatten).toSet
      (j, eqNames)
    }.filter { case (_, names) => names.nonEmpty && names.subsetOf(Set("blk")) }
    assert(blkOnlyJoins.nonEmpty, "expected the fallback's per-block joins")
    blkOnlyJoins.foreach { case (j, _) =>
      assert(hasAgg(j.left) || hasAgg(j.right),
        s"block-key-only join with two per-doc sides (block² shape):\n$j")
    }
  }

  test("simhash pair mining: block buckets find exactly the brute-force hamming pairs") {
    // 20 docs: a family of near-identical boilerplates (small hamming) +
    // unrelated fillers; ground truth = all-pairs bit_count, computed in
    // Spark itself — pigeonhole (blocks > maxHamming) promises the block
    // join misses nothing
    val docs = (1L to 20L).map { i =>
      val txt =
        if (i <= 6) s"shared boilerplate header about terms of service clause $i"
        else s"document $i with its own unrelated content about topic number ${i * 7}"
      (i, txt)
    }.toDF("doc_id", "text")
    // blocks = 1 with maxHamming = 0 is the exact-duplicate profile (the
    // single whole-word block must match); wider settings cover near-dups
    for (maxH <- Seq(0, 3, 7)) {
      val blocks = if (maxH == 0) 1 else if (maxH < 4) 4 else 8
      val mined = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
          maxHamming = maxH, blocks = blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val fp = docs.select(col("doc_id"),
        Dedup.simhash64(col("text")).as("fp"))
      val brute = fp.select(col("doc_id").as("id1"), col("fp").as("fp1"))
        .crossJoin(fp.select(col("doc_id").as("id2"), col("fp").as("fp2")))
        .filter(col("id1") < col("id2"))
        .withColumn("hamming",
          bit_count(col("fp1").bitwiseXOR(col("fp2"))).cast("long"))
        .filter(col("hamming") <= maxH)
        .select("id1", "id2", "hamming")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(mined == brute, s"maxHamming=$maxH")
    }
    // parameter guards: pigeonhole violated / non-divisor block count
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 4, blocks = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3, blocks = 6)
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("incremental simhash: index probe equals brute-force pairs touching the batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sh_idx").toString
    val docs = (1L to 24L).map { i =>
      val txt =
        if (i % 3 == 0) s"shared boilerplate header about terms of service clause ${i % 2}"
        else s"document $i with its own unrelated content about topic number ${i * 7}"
      (i, txt)
    }.toDF("doc_id", "text")
    val hist = docs.filter($"doc_id" <= 12)
    val batch = docs.filter($"doc_id" > 12)
    Dedup.saveSimhashIndex(hist, tmp, "doc_id", "text")
    val inc = Dedup.incrementalSimhashPairs(batch, tmp, "doc_id", "text",
        maxHamming = 3, blocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // ground truth: full-corpus mining (spec-verified ≡ brute force
    // above) restricted to pairs with a side in the batch (id2 > 12
    // since id1 < id2 and history ids are all <= 12)
    val full = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
        maxHamming = 3, blocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._2 > 12L).toSet
    assert(inc == full && inc.nonEmpty)
    // append survivors; idempotent for duplicate ids and re-appends
    Dedup.appendSimhashIndex(batch, tmp, "doc_id", "text")
    Dedup.appendSimhashIndex(batch, tmp, "doc_id", "text") // retry no-op
    assert(spark.read.parquet(s"$tmp/fp").count() == 24)
    // a later batch sees appended history
    val b2 = Seq((30L, "shared boilerplate header about terms of service clause 0"))
      .toDF("doc_id", "text")
    val inc2 = Dedup.incrementalSimhashPairs(b2, tmp, "doc_id", "text",
        maxHamming = 3, blocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc2.exists(_._2 == 30L) && inc2.forall(_._2 == 30L))
    spark.sharedState.cacheManager.clearCache()
  }

  test("appendSimhashIndex: idempotence anti-join range-prunes the index, never full-scans it") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sh_ap").toString
    val hist = (1L to 50L).map(i => (i, s"history document number $i body"))
      .toDF("doc_id", "text")
    Dedup.saveSimhashIndex(hist, tmp, "doc_id", "text")
    val batch = (100L to 104L).map(i => (i, s"new batch document $i body"))
      .toDF("doc_id", "text")
    val rows = Dedup.simhashAppendRows(batch, tmp, "doc_id", "text")
    val sig = PlanFingerprint.signature(rows)
    // the index side reaches the anti-join as a scan of the id column
    // ONLY, with the batch's [min,max] id bounds pushed into parquet —
    // ids outside the span are skipped by row-group stats, so append
    // cost tracks id-range overlap, not history size
    assert(sig.contains("cols=[id]"), sig)
    assert(sig.contains("GreaterThanOrEqual(id,100)") &&
      sig.contains("LessThanOrEqual(id,104)"), sig)
    // and no full-index sort-merge exchange anywhere in the append plan
    assert(!sig.contains("SortMergeJoin"), sig)
    // the pruned plan anti-joins the same rows the un-pruned one would:
    // an overlapping retry (ids 104..105) appends only the fresh id
    assert(rows.count() == 5)
    Dedup.appendSimhashIndex(batch, tmp, "doc_id", "text")
    val retry = Seq((104L, "new batch document 104 body"),
      (105L, "a genuinely fresh document")).toDF("doc_id", "text")
    assert(Dedup.simhashAppendRows(retry, tmp, "doc_id", "text")
      .collect().map(_.getLong(0)).toSeq == Seq(105L))
  }

  test("compactSimhashIndex: many appends compact to fewer files, identical results") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sh_cp").toString
    def mk(lo: Long, hi: Long) = (lo to hi).map { i =>
      val txt =
        if (i % 4 == 0) s"common boilerplate paragraph variant ${i % 2}"
        else s"unique document $i content"
      (i, txt)
    }.toDF("doc_id", "text")
    Dedup.saveSimhashIndex(mk(1, 10), tmp, "doc_id", "text")
    (1 to 5).foreach(b => Dedup.appendSimhashIndex(
      mk(b * 10 + 1, b * 10 + 10), tmp, "doc_id", "text"))
    def files() = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$tmp/fp"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val probe = Seq((200L, "common boilerplate paragraph variant 0"))
      .toDF("doc_id", "text")
    def probeRows() = Dedup.incrementalSimhashPairs(probe, tmp, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (filesBefore, membershipBefore, pairsBefore) =
      (files(), spark.read.parquet(s"$tmp/fp").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet, probeRows())
    Dedup.compactSimhashIndex(spark, tmp)
    assert(files() < filesBefore, s"$filesBefore -> ${files()}")
    assert(spark.read.parquet(s"$tmp/fp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == membershipBefore)
    assert(probeRows() == pairsBefore && pairsBefore.nonEmpty)
    // appends keep working against the compacted layout
    Dedup.appendSimhashIndex(mk(61, 62), tmp, "doc_id", "text")
    assert(spark.read.parquet(s"$tmp/fp").count() == membershipBefore.size + 2)
    spark.sharedState.cacheManager.clearCache()
  }

  test("compactDigestIndex: cross-batch duplicate digests collapse, membership identical") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dg_cp")
      .toString + "/digests"
    val mk = (s: Seq[String]) => s.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    Dedup.saveDigestIndex(mk(Seq("alpha", "beta")), tmp, "text")
    // five appends re-shipping "alpha" plus one fresh text each
    (1 to 5).foreach(b =>
      Dedup.appendDigestIndex(mk(Seq("alpha", s"fresh $b")), tmp, "text"))
    def files() = java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val batch = mk(Seq("alpha", "fresh 3", "never seen"))
    def survivors() = Dedup.incrementalExact(batch, tmp, "doc_id", "text")
      .collect().map(_.getString(1)).toSet
    val (filesBefore, rowsBefore, survBefore) =
      (files(), spark.read.parquet(tmp).count(), survivors())
    assert(survBefore == Set("never seen"))
    Dedup.compactDigestIndex(spark, tmp)
    assert(files() < filesBefore, s"$filesBefore -> ${files()}")
    // 7 distinct digests remain of the 12 appended rows
    assert(spark.read.parquet(tmp).count() == 7 && rowsBefore == 12)
    assert(survivors() == survBefore)
  }

  test("simhash: identical text → distance 0, near text small, unrelated large") {
    val h = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0L), h(3L)) == 0)
    assert(ham(h(0L), h(1L)) < ham(h(0L), h(2L)))
  }

  test("portable (md5) simhash matches the cross-engine fingerprint bit-for-bit") {
    // expected value independently recomputed in DuckDB 1.0.0 via
    // CAST('0x'||substr(md5(tok),1,16) AS UBIGINT) token hashes + ±1 votes
    val r = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("doc_id") === 0L)
      .select(Dedup.simhash64Portable(col("text")))
      .head().getLong(0)
    assert(r == 2360238991694013234L)
    // and it ranks similarity like the default profile
    val h = docs.select(col("doc_id"), Dedup.simhash64Portable(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0L), h(3L)) == 0)
    assert(ham(h(0L), h(1L)) < ham(h(0L), h(2L)))
  }

  test("embedding near-dups within block above threshold") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), "b1"),
      (1L, Array(0.99f, 0.1f, 0.0f), "b1"),
      (2L, Array(0.0f, 1.0f, 0.0f), "b1"),
      (3L, Array(1.0f, 0.0f, 0.0f), "b2") // same as 0 but different block
    ).toDF("vec_id", "embedding", "block")
    val dups = Dedup.embeddingNearDups(vecs, "vec_id", "embedding", "block", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dups.toSet == Set((0L, 1L))) // 2 dissimilar; 3 blocked away
  }

  test("connected components: chains collapse transitively, singletons stand") {
    // 1-2-3-4-5 is a diameter-4 chain (several propagation rounds); edges
    // never pair 1 with 5 directly, yet all five must share a cluster
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (7L, 8L), (8L, 6L))
      .toDF("id1", "id2")
    val nodes = (1L to 9L).toDF("doc_id")
    val r = Dedup.connectedComponents(edges, nodes, "doc_id")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert((1L to 5L).forall(r(_) == 1L)) // transitive closure of the chain
    assert(Seq(6L, 7L, 8L).forall(r(_) == 6L)) // min id wins, not first seen
    assert(r(9L) == 9L) // isolated node is its own cluster
    assert(r.size == 9)
  }

  test("dedupCorpus: lowest id survives per cluster, absorbed counts, uniques untouched") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (5L, "the quick brown fox jumps over the lazy dog tonight"), // = 1
      (3L, "the quick brown fox jumps over the lazy dog today"),   // near 1
      (7L, "completely different content about something else entirely"),
      (9L, "yet another unique document with its own words")).toDF("doc_id", "text")
    val r = Dedup.dedupCorpus(corpus, "doc_id", "text",
        threshold = 0.6, shingleN = 2, numHashes = 16, bands = 8)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("cluster"), x.getAs[Long]("n_dropped")))).toMap
    assert(r.keySet == Set(1L, 7L, 9L)) // 5 and 3 absorbed into 1
    assert(r(1L) == ((1L, 2L)))
    assert(r(7L) == ((7L, 0L)) && r(9L) == ((9L, 0L)))
  }

  test("dedupCorpusBest: highest-priority member survives per cluster " +
       "(id tiebreak), cluster label stays the min id, null-id singletons kept") {
    val corpus = Seq(
      (Some(1L), "the quick brown fox jumps over the lazy dog tonight", 10.0),
      (Some(5L), "the quick brown fox jumps over the lazy dog tonight", 30.0), // best
      (Some(3L), "the quick brown fox jumps over the lazy dog today", 30.0),   // tie w/ 5
      (Some(7L), "completely different content about something else entirely", 1.0),
      (None, "orphan row with no identity", 99.0)
    ).toDF("doc_id", "text", "quality")
    val r = Dedup.dedupCorpusBest(corpus, "doc_id", "text", "quality",
        threshold = 0.6, shingleN = 2, numHashes = 16, bands = 8)
      .collect().map(x => Option(x.getAs[Any]("doc_id")).map(_.asInstanceOf[Long]) ->
        ((x.getAs[Long]("cluster"), x.getAs[Long]("n_dropped")))).toMap
    // cluster {1,3,5}: priorities (10,30,30) → 3 wins the id tiebreak;
    // the label is still the cluster MIN (1), not the survivor's own id
    assert(r.keySet == Set(Some(3L), Some(7L), None), s"got $r")
    assert(r(Some(3L)) == ((1L, 2L)))
    assert(r(Some(7L)) == ((7L, 0L)))
    assert(r(None)._2 == 0L)
    // same clusters as dedupCorpus — only the survivor pick differs
    val minSurv = Dedup.dedupCorpus(corpus, "doc_id", "text",
        threshold = 0.6, shingleN = 2, numHashes = 16, bands = 8)
      .collect().flatMap(x => Option(x.getAs[Any]("doc_id")))
      .map(_.asInstanceOf[Long]).toSet
    assert(minSurv == Set(1L, 7L))
  }

  test("incremental exact: history drops seen texts, lowest batch id wins internal dups") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dg").toString + "/idx"
    val hist = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    Dedup.saveDigestIndex(hist, tmp, "text")
    val batch = Seq(
      (10L, "alpha"),  // seen by history → dies
      (11L, "gamma"), (12L, "gamma"), // batch-internal dup → 11 survives
      (13L, "delta")).toDF("doc_id", "text")
    val r1 = Dedup.incrementalExact(batch, tmp, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(r1 == Set(11L, 13L))
    // append survivors; the next batch sees them as history
    Dedup.appendDigestIndex(batch, tmp, "text")
    val batch2 = Seq((20L, "gamma"), (21L, "epsilon")).toDF("doc_id", "text")
    val r2 = Dedup.incrementalExact(batch2, tmp, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(r2 == Set(21L))
  }

  test("incremental exact: null-text rows dedup across batches (null-safe digest join)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dgn").toString + "/idx"
    // history holds one null-text row → its digest row in the index is NULL
    Dedup.saveDigestIndex(
      Seq((1L, Some("alpha")), (2L, None)).toDF("doc_id", "text"), tmp, "text")
    val batch = Seq((10L, None), (11L, None), (12L, Some("beta")))
      .toDF("doc_id", "text")
    // a plain-equality anti-join would keep 10 and 11 forever
    // (md5(NULL) = NULL never matches the history's NULL digest row)
    val r = Dedup.incrementalExact(batch, tmp, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(r == Set(12L))
    // with no null in history, the batch's null group keeps its lowest id
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_dgn2").toString + "/idx"
    Dedup.saveDigestIndex(Seq((1L, "alpha")).toDF("doc_id", "text"), tmp2, "text")
    val r2 = Dedup.incrementalExact(batch, tmp2, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(r2 == Set(10L, 12L))
    // the streaming history anti-join shares the null-safe semantics
    // (exercised batch-side: the operator is a plain stream-static join)
    val hist = Dedup.exact(
      Seq((1L, Some("alpha")), (2L, Option.empty[String])).toDF("doc_id", "text"),
      "doc_id", "text").select("digest")
    val flagged = graft.streaming.StreamingDedup
      .againstHistory(batch, "text", hist)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(12L)) // null texts die against the null digest row
  }

  test("incremental minhash: batch-vs-index pairs equal the full-corpus pairs touching the batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mh").toString
    val mk = (id: Long, text: String) => (id, text)
    val hist = Seq(
      mk(1L, "alpha beta gamma delta epsilon zeta eta theta"),
      mk(2L, "one two three four five six seven eight nine"),
      mk(3L, "red orange yellow green blue indigo violet")).toDF("doc_id", "text")
    val batch = Seq(
      mk(10L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
      mk(11L, "one two three four five six seven eight nine ten"), // near 2
      mk(12L, "totally different content nothing shared here"),
      mk(13L, "totally different content nothing shared here also")) // near 12
      .toDF("doc_id", "text")

    Dedup.saveMinhashIndex(hist, tmp, "doc_id", "text",
      shingleN = 2, numHashes = 16, bands = 8)
    val incDf = Dedup.incrementalMinhashPairs(batch, tmp, "doc_id", "text")
    // default cap = the index's write-time cap → the per-probe cap
    // window is skipped entirely (the batch-internal pair stage's
    // bucket-size window remains — it sizes the BATCH, not history)
    assert(!PlanFingerprint.signature(incDf)
      .replace("InMemoryScan[Window", "").contains("Window"))
    val inc = incDf
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: full-corpus candidates restricted to pairs touching
    // the batch (ids >= 10)
    val full = Dedup.minhashCandidatePairs(hist.unionByName(batch),
        "doc_id", "text", shingleN = 2, numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => p._2 >= 10L).toSet
    assert(inc == full)
    assert(inc.contains((1L, 10L)) && inc.contains((2L, 11L))
      && inc.contains((12L, 13L)))

    // append the batch; the next increment sees it as history
    Dedup.appendMinhashIndex(batch, tmp, "doc_id", "text")
    val batch2 = Seq(mk(20L, "totally different content nothing shared here"))
      .toDF("doc_id", "text")
    val inc2 = Dedup.incrementalMinhashPairs(batch2, tmp, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc2.contains((12L, 20L)) && inc2.contains((13L, 20L)))
    assert(inc2.forall { case (_, b) => b == 20L })
  }

  test("incremental minhash: index-side hot bucket caps at maxBucket, lowest ids win") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mh_flood").toString
    // boilerplate flood in HISTORY: 50 identical docs share every bucket
    val flood = (1L to 50L).map(i => (i, "same boilerplate text repeated verbatim"))
      .toDF("doc_id", "text")
    Dedup.saveMinhashIndex(flood, tmp, "doc_id", "text",
      shingleN = 2, numHashes = 16, bands = 8)
    val batch = Seq((100L, "same boilerplate text repeated verbatim"))
      .toDF("doc_id", "text")
    val inc = Dedup.incrementalMinhashPairs(batch, tmp, "doc_id", "text",
        maxBucket = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // new×history bounded by the cap, not the flood; deterministic lowest
    // history ids survive the cut
    assert(inc == (1L to 5L).map(i => (i, 100L)).toSet)
  }

  test("append to minhash index: idempotent re-appends, write-time bucket cap holds") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mh_app").toString
    // identical texts share EVERY bucket, so per-bucket behavior is exact
    val boiler = "same boilerplate text repeated verbatim"
    Dedup.saveMinhashIndex(Seq((1L, boiler), (2L, boiler)).toDF("doc_id", "text"),
      tmp, "doc_id", "text", shingleN = 2, numHashes = 16, bands = 8,
      maxBucket = 3)
    def bands() = spark.read.parquet(s"$tmp/bands")
    val base = bands().count()
    assert(base == 2 * 8) // 2 docs × 8 bands, under the cap
    // re-appending an ALREADY-INDEXED doc is a no-op (anti-join hygiene)
    Dedup.appendMinhashIndex(Seq((1L, boiler)).toDF("doc_id", "text"),
      tmp, "doc_id", "text")
    assert(bands().count() == base)
    // append two more copies: only ONE fits under maxBucket = 3 per
    // bucket, and the lower id (3) takes the slot in every band
    Dedup.appendMinhashIndex(Seq((4L, boiler), (3L, boiler)).toDF("doc_id", "text"),
      tmp, "doc_id", "text")
    assert(bands().count() == 3 * 8)
    assert(bands().select("id").distinct().collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
    // a doc in a FRESH bucket still appends freely — and a duplicate
    // INPUT row (same doc twice in one batch) writes one band row, not
    // two (the anti-join only screens history; batch-internal dedup is
    // the write's own job)
    Dedup.appendMinhashIndex(
      Seq((9L, "entirely different content about other things"),
        (9L, "entirely different content about other things"))
        .toDF("doc_id", "text"),
      tmp, "doc_id", "text")
    assert(bands().filter(col("id") === 9L).count() == 8)
    // no bucket anywhere exceeds the cap — the invariant readers rely on
    val overCap = bands().groupBy("band_idx", "band_hash").count()
      .filter(col("count") > 3).count()
    assert(overCap == 0)
    // save with duplicate input rows is equally duplicate-free
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_mh_dup").toString
    Dedup.saveMinhashIndex(
      Seq((1L, boiler), (1L, boiler)).toDF("doc_id", "text"),
      tmp2, "doc_id", "text", shingleN = 2, numHashes = 16, bands = 8)
    assert(spark.read.parquet(s"$tmp2/bands").count() == 8)
  }

  test("minhash bucket caps count LIVE rows: a delete frees its cap " +
       "slots for the next append, before any compaction") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mh_cap").toString
    val boiler = "same boilerplate text repeated verbatim"
    // fill every bucket to its cap of 3
    Dedup.saveMinhashIndex(
      Seq((1L, boiler), (2L, boiler), (3L, boiler)).toDF("doc_id", "text"),
      tmp, "doc_id", "text", shingleN = 2, numHashes = 16, bands = 8,
      maxBucket = 3)
    def bands() = spark.read.parquet(s"$tmp/bands")
    assert(bands().count() == 3 * 8)
    // a 4th copy is declined — buckets are full of live rows
    Dedup.appendMinhashIndex(Seq((4L, boiler)).toDF("doc_id", "text"),
      tmp, "doc_id", "text")
    assert(bands().filter(col("id") === 4L).count() == 0)
    // delete doc 2 (tombstone only; its band rows stay on disk) — the
    // freed slots must be appendable IMMEDIATELY, not after compaction
    Dedup.deleteFromMinhashIndex(Seq(2L).toDF("doc_id"), tmp, "doc_id")
    Dedup.appendMinhashIndex(Seq((5L, boiler)).toDF("doc_id", "text"),
      tmp, "doc_id", "text")
    assert(bands().filter(col("id") === 5L).count() == 8,
      "the delete's cap slots must refill on the very next append")
    // physical rows transiently exceed the cap by the tombstoned rows,
    // but the PROBE-VISIBLE bucket never does
    val live = graft.operators.Tombstones.applyTo(bands(), "id",
      s"$tmp/tombstones")
    assert(live.groupBy("band_idx", "band_hash").count()
      .filter(col("count") > 3).count() == 0)
    // and a probe sees the revived capacity, not the deleted doc
    val flags = Dedup.flagAgainstIndex(
      Seq((100L, boiler)).toDF("doc_id", "text"), tmp, "doc_id", "text")
      .collect().map(_.getLong(1)).toSet
    assert(flags == Set(1L, 3L, 5L))
    // compaction physically removes the tombstoned rows and restores
    // the on-disk invariant
    Dedup.compactMinhashIndex(spark, tmp, maxBucket = 3)
    assert(bands().groupBy("band_idx", "band_hash").count()
      .filter(col("count") > 3).count() == 0)
    assert(bands().select("id").distinct().collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 5L))
    spark.sharedState.cacheManager.clearCache()
  }

  test("legacy minhash index: probes refuse it loudly; compaction upgrades it") {
    import org.apache.spark.sql.SaveMode
    val tmp = java.nio.file.Files.createTempDirectory("graft_mh_leg").toString
    val boiler = "same boilerplate text repeated verbatim"
    Dedup.saveMinhashIndex(
      (1L to 6L).map(i => (i, boiler)).toDF("doc_id", "text"),
      tmp, "doc_id", "text", shingleN = 2, numHashes = 16, bands = 8)
    // forge a LEGACY index: strip the max_bucket stamp and blind-append a
    // duplicate of doc 1's rows (what the old append did on a retry)
    val oldMeta = spark.read.parquet(s"$tmp/meta")
      .select("shingle_n", "num_hashes", "bands").collect()
    spark.createDataFrame(java.util.Arrays.asList(oldMeta: _*),
        spark.read.parquet(s"$tmp/meta")
          .select("shingle_n", "num_hashes", "bands").schema)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$tmp/meta")
    val dup = spark.read.parquet(s"$tmp/bands").filter(col("id") === 1L)
    dup.write.mode(SaveMode.Append).parquet(s"$tmp/bands")
    // un-stamped index: every probe path refuses with guidance — a plain
    // scan over duplicate rows would double-emit flags
    val batch = Seq((100L, boiler)).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      Dedup.flagAgainstIndex(batch, tmp, "doc_id", "text")
    }
    assert(e.getMessage.contains("compactMinhashIndex"))
    // a zero cap must refuse, not stamp an emptied index as hygienic
    intercept[IllegalArgumentException] {
      Dedup.compactMinhashIndex(spark, tmp, maxBucket = 0)
    }
    // one-time upgrade: dedups the forged duplicates, caps, stamps
    Dedup.compactMinhashIndex(spark, tmp, maxBucket = 4)
    val bands = spark.read.parquet(s"$tmp/bands")
    assert(bands.groupBy("band_idx", "band_hash", "id").count()
      .filter(col("count") > 1).count() == 0) // duplicates gone
    assert(bands.groupBy("band_idx", "band_hash").count()
      .filter(col("count") > 4).count() == 0) // capped
    val flags = Dedup.flagAgainstIndex(batch, tmp, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(flags.toSeq.sorted == (1L to 4L).map((100L, _)).toSeq) // one row per pair
    spark.sharedState.cacheManager.clearCache()
  }

  test("flagAgainstIndex: corpus screen matches pairs, plan has no window or index shuffle") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_flag").toString
    val hist = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "red orange yellow green blue indigo violet")).toDF("doc_id", "text")
    Dedup.saveMinhashIndex(hist, tmp, "doc_id", "text",
      shingleN = 2, numHashes = 16, bands = 8)
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // = doc 1
      (11L, "completely unrelated fresh content")).toDF("doc_id", "text")
    val flags = Dedup.flagAgainstIndex(batch, tmp, "doc_id", "text")
    val rows = flags.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((10L, 1L, 1.0))) // one row per pair, est rides
    // the per-batch plan does NO hygiene over history: write-time
    // invariants replaced the old full-index dropDuplicates + cap window
    // (two full-history shuffles per batch). Done = no Window node and no
    // shuffle exchange anywhere in the flag plan (the only join
    // broadcasts; banding and filters are narrow).
    val sig = PlanFingerprint.signature(flags)
    assert(!sig.contains("Window"), sig)
    assert(!sig.contains("Exchange(hash"), sig)
    // same property for the continuous-plan face on a batch frame
    val cont = graft.streaming.StreamingDedup.nearDupsAgainstIndex(
      batch, "doc_id", "text", tmp)
    val csig = PlanFingerprint.signature(cont)
    assert(!csig.contains("Window"), csig)
    assert(!csig.contains("Exchange(hash"), csig)
    spark.sharedState.cacheManager.clearCache()
  }

  test("connected components & pageRank: reliable-checkpoint mode matches local mode") {
    // Checkpoints.truncate follows the session: setCheckpointDir switches
    // CC/PageRank to fault-tolerant .checkpoint() (the cluster deployment
    // mode) with identical results. SparkContext has no public unset for
    // the dir, so afterwards the suite pins graft back to local mode via
    // the supported session conf (Checkpoints.ForceLocalKey) — behavior
    // for the remaining suites is identical to the no-dir default (the
    // mode never changes results or plan shape, per Checkpoints' doc).
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "expected no checkpoint dir at start")
    // diameter-4 chain: exercises multiple propagation rounds in both modes
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id1", "id2")
    val nodes = (1L to 6L).toDF("doc_id")
    val prEdges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("s", "d")
    def ccRun() = Dedup.connectedComponents(edges, nodes, "doc_id")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    def prRun() = graft.operators.Graph.pageRank(prEdges, "s", "d", iters = 3)
      .orderBy("node").collect().map(_.toSeq).toSeq
    val (ccLocal, prLocal) = (ccRun(), prRun())
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    sc.setCheckpointDir(dir)
    try {
      assert(ccRun() == ccLocal)
      assert(prRun() == prLocal) // doubles bit-identical: same plan, same fold
      // the reliable mode actually wrote checkpoint data under the dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(_.toFile.isFile).count()
      assert(wrote > 0, "reliable checkpoint mode wrote nothing")
    } finally {
      spark.conf.set(graft.operators.Checkpoints.ForceLocalKey, "true")
    }
    // the override really does route back to localCheckpoint: a run
    // under it writes nothing new beneath the (still-set) checkpoint dir
    val before = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(_.toFile.isFile).count()
    assert(ccRun() == ccLocal)
    val after = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(_.toFile.isFile).count()
    assert(after == before, "forced-local run wrote reliable checkpoints")
  }

  test("connected components: empty edge set yields all-singleton clusters") {
    val edges = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val nodes = (1L to 4L).toDF("doc_id")
    val r = Dedup.connectedComponents(edges, nodes, "doc_id")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == (1L to 4L).map(i => i -> i).toMap)
  }

  test("connected components: out-of-nodes endpoints conduct but emit no row") {
    // X = 99 was (say) quality-filtered out of `nodes`, but its edges
    // remain: 5-99, 99-7. Documented semantics: 99 CONDUCTS (5 and 7
    // share a cluster — the removed doc's similarity is still evidence)
    // yet emits no output row. Callers wanting the opposite filter edges.
    val edges = Seq((5L, 99L), (99L, 7L)).toDF("id1", "id2")
    val nodes = Seq(5L, 7L, 8L).toDF("doc_id")
    val r = Dedup.connectedComponents(edges, nodes, "doc_id")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set(5L, 7L, 8L)) // no row for 99
    assert(r(5L) == r(7L)) // conducted through the absent endpoint
    assert(r(8L) == 8L)
  }

  test("connected components: refuses to return non-converged labels") {
    // diameter-4 chain needs 4 propagation rounds + 1 detection round;
    // maxIters = 2 cannot converge and must THROW, never return partial
    // labels that look valid
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id1", "id2")
    val nodes = (1L to 5L).toDF("doc_id")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(edges, nodes, "doc_id", maxIters = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("duplicate spans: longest shared run, positions, min-span filter") {
    val d = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x x a b c d e y"),   // shares run [a b c, b c d, c d e] with 1
      (3L, "q w e r t y u i")    // no shared grams
    ).toDF("doc_id", "text")
    val r = Dedup.duplicateSpans(d, "doc_id", "text",
      n = 3, minSpanGrams = 3, maxOcc = 1000).collect()
    assert(r.length == 1)
    val row = r.head
    // 3 consecutive grams = 5 verbatim tokens; "a b c" starts at token 1
    // of doc 1 and token 3 of doc 2
    assert(row.getLong(0) == 1L && row.getLong(1) == 2L)
    assert(row.getLong(2) == 5L && row.getInt(3) == 1 && row.getInt(4) == 3)
  }

  test("duplicate spans: best-run tiebreak is earliest start; repeats split diagonals") {
    // doc 2 contains doc 1's run twice (two diagonals, equal length):
    // the reported span must be the earliest (start1, start2)
    val d = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e z z a b c d e")
    ).toDF("doc_id", "text")
    val r = Dedup.duplicateSpans(d, "doc_id", "text",
      n = 3, minSpanGrams = 3, maxOcc = 1000).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(2) == 5L && row.getInt(3) == 1 && row.getInt(4) == 1)
  }

  test("duplicate spans: stop-gram cap removes hot grams from evidence") {
    // the shared run's grams each occur 4× corpus-wide (docs 1,2,4,5);
    // maxOcc=3 drops them all → no span survives
    val d = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"),
      (4L, "a b c d e"), (5L, "a b c d e")
    ).toDF("doc_id", "text")
    val capped = Dedup.duplicateSpans(d, "doc_id", "text",
      n = 3, minSpanGrams = 1, maxOcc = 3).collect()
    assert(capped.isEmpty)
    val uncapped = Dedup.duplicateSpans(d, "doc_id", "text",
      n = 3, minSpanGrams = 1, maxOcc = 4).collect()
    assert(uncapped.length == 6) // all C(4,2) pairs report the full span
  }

  // --- r12 review hardening ------------------------------------------

  test("compactMinhashIndex default keeps the index's STAMPED cap; " +
       "an explicit cap still re-stamps") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_capstamp")
      .toString
    Dedup.saveMinhashIndex(docs, tmp, "doc_id", "text", maxBucket = 3)
    def stamped(): Int = spark.read.parquet(s"$tmp/meta")
      .select("max_bucket").head().getInt(0)
    assert(stamped() == 3)
    // the routine delete-then-compact lifecycle must not silently
    // re-cap at a literal default
    Dedup.deleteFromMinhashIndex(Seq(2L).toDF("doc_id"), tmp, "doc_id")
    Dedup.compactMinhashIndex(spark, tmp)
    assert(stamped() == 3,
      "a default compaction re-stamped the index's cap")
    Dedup.compactMinhashIndex(spark, tmp, maxBucket = 7)
    assert(stamped() == 7, "an explicit cap is a deliberate re-stamp")
  }

  test("appendSimhashIndex refuses a batch id re-appearing with " +
       "CHANGED text; the delete-compact-append recipe then works") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_shguard")
      .toString
    Dedup.saveSimhashIndex(docs, tmp, "doc_id", "text")
    // same ids, same text: idempotent re-append, no complaint
    Dedup.appendSimhashIndex(docs, tmp, "doc_id", "text")
    val edited = Seq((1L, "an entirely rewritten document body that " +
      "shares nothing with the original")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.appendSimhashIndex(edited, tmp, "doc_id", "text")
    }
    assert(e.getMessage.contains("DIFFERENT fingerprint"))
    // the recipe the error names: delete -> compact (physical) -> append
    Dedup.deleteFromSimhashIndex(Seq(1L).toDF("doc_id"), tmp, "doc_id")
    Dedup.compactSimhashIndex(spark, tmp)
    Dedup.appendSimhashIndex(edited, tmp, "doc_id", "text")
    val fp = spark.read.parquet(s"$tmp/fp")
      .filter(col("id") === 1L).collect()
    assert(fp.length == 1, "exactly the new fingerprint row")
  }

  test("dedupCorpus: a null-id row survives as its own singleton " +
       "instead of silently vanishing") {
    val withNull = docs.unionByName(
      Seq((Option.empty[Long], "null-keyed straggler row", "s2"))
        .toDF("doc_id", "text", "source"))
    val out = Dedup.dedupCorpus(withNull, "doc_id", "text")
    val nullRows = out.filter(col("doc_id").isNull).collect()
    assert(nullRows.length == 1 && nullRows.head.getLong(
      out.columns.indexOf("n_dropped")) == 0L,
      "the null-id row is a surviving singleton")
    // keyed behavior unchanged: at the 0.8 threshold 0 absorbs its
    // exact twin 3 (the 0/1 near-dup verifies below threshold)
    assert(out.filter(col("doc_id") === 0L).head()
      .getLong(out.columns.indexOf("n_dropped")) == 1L)
  }

  test("nearDupsAgainstIndex (the continuous streaming face) respects " +
       "tombstones like every other probe") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stomb")
      .toString
    Dedup.saveMinhashIndex(docs, tmp, "doc_id", "text")
    val probe = Seq((100L, "the quick brown fox jumps over the lazy " +
      "dog and runs far away home")).toDF("doc_id", "text")
    def neighbors(): Set[Long] =
      graft.streaming.StreamingDedup
        .nearDupsAgainstIndex(probe, "doc_id", "text", tmp)
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(neighbors().contains(0L), "the exact twin surfaces")
    Dedup.deleteFromMinhashIndex(Seq(0L, 3L).toDF("doc_id"), tmp, "doc_id")
    val after = neighbors()
    assert(!after.contains(0L) && !after.contains(3L),
      "deleted ids must stop surfacing IMMEDIATELY, not at compaction")
  }

  test("maxBucket <= 0 is refused loudly by every minhash entry point") {
    intercept[IllegalArgumentException] {
      Dedup.minhashCandidatePairs(docs, "doc_id", "text", maxBucket = 0)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_mb0").toString
    Dedup.saveMinhashIndex(docs, tmp, "doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.incrementalMinhashPairs(docs, tmp, "doc_id", "text",
        maxBucket = 0)
    }
  }

  test("exciseDuplicateSpans: keep-first excision — the shared passage " +
      "survives only in its earliest doc, later copies lose exactly " +
      "the covered tokens") {
    // shared passage: "alpha beta gamma delta epsilon" (5 tokens = one
    // 5-gram run of 1... need >= minSpanGrams runs) — use a 7-token
    // passage: with n=3, grams 5, run >= 3 qualifies
    val passage = "p1 p2 p3 p4 p5 p6 p7"
    val corpus = Seq(
      (Option(1L), Option(s"owner keeps $passage tail one")),
      (Option(2L), Option(s"victim head $passage victim tail")),
      (Option(3L), Option(passage)), // fully covered → empty survivor
      (Option(4L), Option("unrelated text that shares nothing at all")),
      // self-repetition inside ONE doc is kept (no self-pairs)
      (Option(5L), Option("s1 s2 s3 s4 s5 s6 s1 s2 s3 s4 s5 s6")),
      (Option.empty[Long], Option(passage)),          // null id → dropped
      (Option(6L), Option.empty[String]))             // null text → untouched
      .toDF("doc_id", "text")
    val r = Dedup.exciseDuplicateSpans(corpus, "doc_id", "text",
        n = 3, minSpanGrams = 3, maxOcc = 100)
      .collect().map(x => (if (x.isNullAt(0)) -99L else x.getLong(0)) ->
        ((if (x.isNullAt(1)) null else x.getString(1)), x.getLong(2))).toMap
    assert(!r.contains(-99L), "null-id doc leaked")
    // the earliest doc keeps the passage byte-identical
    assert(r(1L) == ((s"owner keeps $passage tail one", 0L)))
    // the later copy loses exactly the 7 covered tokens
    assert(r(2L) == (("victim head victim tail", 7L)))
    // the fully-covered doc becomes empty, all tokens dropped
    assert(r(3L) == (("", 7L)))
    // untouched docs byte-identical; self-repeats survive
    assert(r(4L)._2 == 0L && r(5L)._2 == 0L &&
      r(5L)._1 == "s1 s2 s3 s4 s5 s6 s1 s2 s3 s4 s5 s6")
    assert(r(6L) == ((null, 0L)))
  }
}
