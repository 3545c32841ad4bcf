package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE corpus (Sennrich et al. 2016, §3.2 example shape):
  // low×5 lower×2 newest×6 widest×3
  private def corpus() = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest")
  ).toDF("doc_id", "text")

  test("train learns the classic merge sequence with deterministic " +
       "(count desc, left, right) tie-breaks") {
    val m = Bpe.train(corpus(), "text", numMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    // hand-derived: es/st tie at 9 → left-asc picks (e,s); then (es,t);
    // lo/ow tie at 7 → (l,o); then (lo,w); then ew/ne/w-est tie at 6 →
    // (e,w)
    assert(m == Seq(
      (0, "e", "s", 9L),
      (1, "es", "t", 9L),
      (2, "l", "o", 7L),
      (3, "lo", "w", 7L),
      (4, "e", "w", 6L)))
  }

  test("train is deterministic and stops early when no pairs remain") {
    val a = Bpe.train(corpus(), "text", 5).collect().map(_.toString).toSeq
    val b = Bpe.train(corpus(), "text", 5).collect().map(_.toString).toSeq
    assert(a == b)
    // a one-letter vocabulary has nothing to merge
    val tiny = Seq((1L, "a a a")).toDF("doc_id", "text")
    assert(Bpe.train(tiny, "text", 3).count() == 0)
    // "ab ab": exactly one merge possible, then done
    val ab = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = Bpe.train(ab, "text", 5).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(m == Seq(("a", "b")))
  }

  test("encode applies merges in rank order via the word dictionary; " +
       "tokens concatenate in word order") {
    val merges = Bpe.train(corpus(), "text", 5)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = Bpe.encode(
      Seq((10L, "lowest newest"), (11L, "low low")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // lowest: es→est→(l,o)→(lo,w)→ low|est ; newest: es→est→(e,w) → n|ew|est
    assert(enc(10L) == Seq("low", "est", "n", "ew", "est"))
    assert(enc(11L) == Seq("low", "low"))
  }

  test("vocab aggregates token frequencies from the word table alone") {
    val merges = Bpe.train(corpus(), "text", 5)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val v = Bpe.vocab(corpus(), "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // low×5 → [low]; lower×2 → [low, e, r]; newest×6 → [n, ew, est];
    // widest×3 → [w, i, d, est]
    assert(v("low") == 7L)   // 5 + 2
    assert(v("est") == 9L)   // 6 + 3
    assert(v("ew") == 6L)
    assert(v("r") == 2L)
    assert(v("w") == 3L)     // only widest's leading w survives unmerged
  }

  test("chunked candidate selection is merge-for-merge identical to " +
       "the one-at-a-time loop, ties and shared symbols included") {
    // three corpora stressing the chunk STOP rules: the classic corpus
    // (adjacent argmaxes share symbols constantly), a tie-heavy one,
    // and a wider pseudo-random one where disjoint candidates let the
    // chunk actually batch
    val tieHeavy = Seq(
      (1L, "aaa aab abb bbb ab ba"),
      (2L, "abc bcd cde abc abc bcd")).toDF("doc_id", "text")
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val wide = (0 until 40).map(i => (i.toLong,
      Seq(words(i % 8), words((i * 3) % 8), words((i * 5 + 1) % 8))
        .mkString(" "))).toDF("doc_id", "text")
    Seq(corpus() -> "classic", tieHeavy -> "ties", wide -> "wide")
      .foreach { case (c, label) =>
        val one = Bpe.train(c, "text", numMerges = 10, chunk = 1)
          .collect().map(_.toString).toSeq
        val batched = Bpe.train(c, "text", numMerges = 10, chunk = 8)
          .collect().map(_.toString).toSeq
        assert(one == batched, s"corpus '$label' diverged under chunking")
      }
  }

  test("encode preserves null/empty/whitespace-only docs with empty " +
       "token arrays (ADVICE r9: a tokenizer must not lose rows)") {
    val merges = Seq(("l", "o"), ("lo", "w"))
    val docs = Seq((1L, "low low"), (2L, ""),
      (3L, null.asInstanceOf[String]), (4L, "   "))
      .toDF("doc_id", "text")
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(enc.keySet == Set(1L, 2L, 3L, 4L))
    assert(enc(1L) == Seq("low", "low"))
    assert(enc(2L).isEmpty && enc(3L).isEmpty && enc(4L).isEmpty)
  }

  test("encode: a NULL doc id with real text keeps its real tokens " +
       "through the null-safe spine join") {
    val merges = Seq(("l", "o"), ("lo", "w"))
    val docs = Seq((Option(1L), "low"), (Option.empty[Long], "low low"))
      .toDF("doc_id", "text")
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getSeq[String](1))).toMap
    assert(enc(Some(1L)) == Seq("low"))
    assert(enc(None) == Seq("low", "low"),
      "a plain equi-join would silently blank the null-id group")
  }

  test("overlapping runs merge left-to-right non-overlapping, " +
       "identically to any engine's literal replace") {
    // 'aaa': merging (a,a) gives [aa, a], never [a, aa] or [aa, aa]
    val tri = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val m1 = Bpe.train(tri, "text", 1).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(m1 == Seq(("a", "a")))
    val enc = Bpe.encode(tri, "doc_id", "text", m1.toSeq)
      .head().getSeq[String](1)
    assert(enc == Seq("aa", "a", "aa", "a"))
  }

  test("save/load round-trips the model; encodeCol agrees with the " +
       "dictionary-join encode token for token — including on a " +
       "stream") {
    val merges = Bpe.train(corpus(), "text", 5)
    val path = java.nio.file.Files
      .createTempDirectory("graft_bpe_model").toString + "/m"
    Bpe.saveModel(merges, path)
    val loaded = Bpe.loadModel(spark, path)
    assert(loaded == merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq)

    val docs = Seq((10L, "lowest newest"), (11L, "low low"),
      (12L, "")).toDF("doc_id", "text")
    val viaCol = docs.select($"doc_id",
        Bpe.encodeCol($"text", loaded).as("tokens"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaDict = Bpe.encode(docs, "doc_id", "text", loaded)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // both faces preserve empty docs with empty token arrays (the
    // dictionary join restores them via the doc-id spine)
    assert(viaCol(12L) == Seq.empty[String])
    assert(viaDict(12L) == Seq.empty[String])
    assert(viaDict.keySet == viaCol.keySet)
    assert(viaDict.keySet.forall(k => viaCol(k) == viaDict(k)))
    assert(viaCol(10L) == Seq("low", "est", "n", "ew", "est"))

    // streaming: a stateless projection, no watermark needed
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .select($"doc_id", Bpe.encodeCol($"text", loaded).as("tokens"))
      .writeStream.outputMode("append").format("memory")
      .queryName("bpe_stream").start()
    try {
      input.addData((20L, "lowest newest"))
      q.processAllAvailable()
      assert(spark.table("bpe_stream").head().getSeq[String](1) ==
        Seq("low", "est", "n", "ew", "est"))
    } finally q.stop()
  }

  test("a corpus carrying the sentinel is rejected loudly on EVERY " +
       "face (in-plan guard in wrapChars — r12: only train checked; " +
       "encode silently dropped the char and blocked merges)") {
    val bad = Seq((1L, "ok \u0001bad")).toDF("doc_id", "text")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] { Bpe.train(bad, "text", 1) }
    assert(msgs(e).exists(_.contains("sentinel")))
    val e2 = intercept[Exception] {
      Bpe.encode(bad, "doc_id", "text", Seq(("o", "k"))).collect()
    }
    assert(msgs(e2).exists(_.contains("sentinel")))
    val e3 = intercept[Exception] {
      Bpe.vocab(bad, "text", Seq(("o", "k"))).collect()
    }
    assert(msgs(e3).exists(_.contains("sentinel")))
  }

  test("encode refuses duplicate doc ids (they would interleave into " +
       "one scrambled stream) and reserved idCol names") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val dup = Seq((1L, "a b"), (1L, "c d")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Bpe.encode(dup, "doc_id", "text", Nil).collect()
    }
    assert(msgs(e).exists(_.contains("duplicate doc ids")))
    intercept[IllegalArgumentException] {
      Bpe.encode(dup.toDF("tokens", "text"), "tokens", "text", Nil)
    }
  }
}
