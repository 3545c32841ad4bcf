package graft

import org.scalacheck.Gen
import org.apache.spark.sql.functions._

import graft.engine.Analytics
import graft.engine.Analytics.Window
import graft.functions.HashOps
import graft.operators.{Aggregates, TopK}

/** Property-based invariants (SURVEY.md §5 item 3). Spark-level properties
  * run on a handful of sampled cases (each case is a Spark job); pure-Scala
  * hash properties run at full scalacheck volume.
  */
class PropertySpec extends SparkSpec {
  // scalacheck generators, sampled directly (no scalatestplus bridge in deps)
  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  import spark.implicits._

  test("winnow fingerprints: deterministic, subsets of gram hashes, shift-invariant prefix") {
    samples(Gen.alphaNumStr.suchThat(_.length < 500)).foreach { s =>
      val a = HashOps.winnow(s.getBytes("UTF-8"), 8, 4)
      val b = HashOps.winnow(s.getBytes("UTF-8"), 8, 4)
      assert(a.toSeq == b.toSeq)
      assert(a.toSeq == a.toSeq.sorted)
      if (s.getBytes("UTF-8").length < 8) assert(a.isEmpty) else assert(a.nonEmpty)
    }
  }

  test("minhash: signature of identical sets identical; est jaccard bounded") {
    samples(Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))).foreach { xs =>
      val sig1 = HashOps.minhash(xs.toArray, 32)
      val sig2 = HashOps.minhash(xs.reverse.toArray, 32) // order-invariant
      assert(sig1.toSeq == sig2.toSeq)
    }
  }

  test("simhash: order-invariant over token multisets") {
    samples(Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))).foreach { xs =>
      assert(HashOps.simhash(xs.toArray) ==
        HashOps.simhash(scala.util.Random.shuffle(xs).toArray))
    }
  }

  test("t-digest: quantile monotone in q, endpoints exact, split-merge " +
       "tracks the one-shot digest, rank bound holds on random data") {
    import graft.functions.TDigestSketch
    val gen = Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6))
      .suchThat(_.size >= 20)
    samples(gen, 40).foreach { xs =>
      val d = new TDigestSketch.Digest(100.0)
      xs.foreach(d.add)
      // monotone in q, endpoints exact
      val qs = (0 to 20).map(_ / 20.0)
      val vals = qs.map(d.quantile)
      assert(vals.zip(vals.tail).forall { case (a, b) => a <= b },
        s"quantiles must be monotone in q: $vals")
      assert(d.quantile(0.0) == xs.min && d.quantile(1.0) == xs.max)
      // rank bound at the median for any input size/order
      val med = d.quantile(0.5)
      val rank = xs.count(_ <= med).toDouble / xs.size
      // discrete data: the achievable rank moves in 1/n steps, so the
      // bound is the continuous bound plus one step
      assert(math.abs(rank - 0.5) <= 0.03 + 1.0 / xs.size,
        s"n=${xs.size} med=$med rank=$rank")
      // split anywhere, sketch each half, merge: same bound holds on
      // the merged digest (the persisted-shard contract)
      val (l, r) = xs.splitAt(xs.size / 3 + 1)
      val dl = new TDigestSketch.Digest(100.0)
      val dr = new TDigestSketch.Digest(100.0)
      l.foreach(dl.add); r.foreach(dr.add)
      val merged = TDigestSketch.merge(
        Seq(dl.serialize(), dr.serialize()))
      val mmed = TDigestSketch.quantile(merged, 0.5)
      val mrank = xs.count(_ <= mmed).toDouble / xs.size
      assert(math.abs(mrank - 0.5) <= 0.03 + 1.0 / xs.size,
        s"merged: n=${xs.size} med=$mmed rank=$mrank")
      // serialization round-trips bit-exactly
      val ser = d.serialize()
      assert(java.util.Arrays.equals(ser,
        TDigestSketch.deserialize(ser).serialize()))
    }
  }

  test("gap-filled series has exactly monthsBetween rows and preserves the total") {
    // sampled windows over the fixture data
    val sr = graft.engine.NycFixtures.serviceRequests(spark)
    val cases = Seq(("2024-01-01", "2024-06-30", 6), ("2024-01-15", "2024-03-02", 3),
      ("2023-11-01", "2025-02-28", 16))
    cases.foreach { case (s, e, n) =>
      val trend = Analytics.requestTrend(spark, sr, 101L, s, e).collect()
      assert(trend.length == n, s"window $s..$e")
      val filtered = Analytics.requestTotals(sr, 101L,
        Window(Some(s), Some(e))).collect().head.getLong(0)
      assert(trend.map(_.getLong(1)).sum == filtered, s"total preserved $s..$e")
    }
  }

  test("top-N + Other preserves grand total for any N") {
    val byType = Analytics.requestsByType(
      graft.engine.NycFixtures.serviceRequests(spark),
      graft.engine.NycFixtures.complaintTypes(spark), 101L, Window.default)
    val total = byType.agg(sum($"total_count")).head().getLong(0)
    Seq(1, 3, 5, 7, 100).foreach { n =>
      val chart = TopK.topNPlusOther(byType, "complaint_type_name", n)
      assert(chart.agg(sum($"total_count")).head().getLong(0) == total, s"n=$n")
    }
  }

  test("top-N + Other: a top-ranked NULL group keeps its own bucket") {
    import spark.implicits._
    val grouped = Seq((Option.empty[String], 100L), (Some("A"), 50L), (Some("B"), 10L))
      .toDF("g", "total_count")
    val r = TopK.topNPlusOther(grouped, "g", 2).collect()
      .map(x => Option(x.getString(0)) -> x.getLong(1))
    // null ranks first (count 100) → its own bucket; B folds into Other
    assert(r.toMap == Map(None -> 100L, Some("A") -> 50L, Some("Other") -> 10L))
  }

  test("min <= median <= max on any priced subset") {
    val sale = graft.engine.NycFixtures.sales(spark)
    val stats = Aggregates.priceStats(sale, "sale_price").head()
    assert(stats.getDouble(1) <= stats.getDouble(0)
      && stats.getDouble(0) <= stats.getDouble(2))
  }

  test("budget fills on random skewed corpora: binned cumsum ≡ the naive " +
       "per-group window, kept sets grow monotonically with budgets, and " +
       "epochFill copies are budget-monotone per document") {
    import graft.operators.Corpus
    // skewed group choice (most rows land on 'hot') + zero-token docs
    // (empty text) — the regimes the binning and the weight contract
    // exist for. Each case is ~5 Spark jobs; keep the count modest.
    val rowsGen = Gen.choose(1, 50).flatMap(n => Gen.listOfN(n, for {
      grp <- Gen.frequency(5 -> Gen.const("hot"), 2 -> Gen.const("a"),
        1 -> Gen.const("unbudgeted"))
      toks <- Gen.choose(0, 7)
    } yield (grp, toks)))
    samples(rowsGen, 8).zipWithIndex.foreach { case (rows, seed) =>
      val df = rows.zipWithIndex.map { case ((g, t), i) =>
        (i.toLong, Seq.fill(t)("w").mkString(" "), g)
      }.toDF("doc_id", "text", "source")
      val budgets = Seq("hot" -> 19L, "a" -> 6L)
      val got = Corpus.tokenBudgetFill(df, "source", "doc_id", "text",
          budgets)
        .select("doc_id", "cum_tokens").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // naive single-window ground truth over the same (hash, id) order
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(Corpus.hashBucket(col("doc_id"), 1000000L), col("doc_id"))
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val bcol = when(col("source") === "hot", 19L)
        .when(col("source") === "a", 6L)
      val naive = df.filter(col("source").isin("hot", "a"))
        .withColumn("cum",
          sum(size(graft.operators.TextAnalysis.tokens(col("text")))
            .cast("long")).over(w))
        .filter(col("cum") <= bcol)
        .select("doc_id", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == naive, s"seed=$seed rows=$rows")
      // kept set only EXTENDS when budgets grow
      val bigger = Corpus.tokenBudgetFill(df, "source", "doc_id", "text",
          budgets.map { case (g, b) => g -> (b * 2) })
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got.keySet.subsetOf(bigger), s"seed=$seed")
      // epochFill: per-document copies never shrink as the budget grows
      val e1 = Corpus.epochFill(df, "source", "doc_id", "text",
          Seq("hot" -> 11L))
        .select("doc_id", "n_copies").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val e2 = Corpus.epochFill(df, "source", "doc_id", "text",
          Seq("hot" -> 29L))
        .select("doc_id", "n_copies").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(e1.keySet.subsetOf(e2.keySet), s"seed=$seed")
      assert(e1.forall { case (id, c) => e2(id) >= c }, s"seed=$seed")
    }
  }

  test("BPE chunked training equals the one-at-a-time loop on random " +
       "tiny-alphabet corpora (the adversarial regime for the chunk " +
       "stop rules: dense ties, shared symbols, symbol collisions)") {
    // tiny alphabet + short words maximize pair-count ties and the
    // chance a candidate's concatenation collides with an existing
    // symbol — exactly the cases the disjointness/tie/collision stop
    // rules must catch. Each case is 2 Spark trainings, so keep the
    // sample count modest; seeds make failures reproducible.
    val word = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val doc = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val corpus = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, doc))
    samples(corpus, n = 12).zipWithIndex.foreach { case (docs, i) =>
      val df = docs.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val one = graft.operators.Bpe.train(df, "text", numMerges = 8,
        chunk = 1).collect().map(_.toString).toSeq
      val batched = graft.operators.Bpe.train(df, "text", numMerges = 8,
        chunk = 8).collect().map(_.toString).toSeq
      assert(one == batched, s"seed=$i corpus=$docs")
    }
  }
}
