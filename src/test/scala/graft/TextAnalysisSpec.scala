package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: whitespace runs, blank/empty → empty array") {
    val df = Seq("a  b\tc", "  ", "", "single").toDF("text")
    val r = df.select(size(TextAnalysis.tokens(col("text")))).collect().map(_.getInt(0))
    assert(r.toSeq == Seq(3, 0, 0, 1))
  }

  test("lexical tokens: letter runs, digit runs, single punct") {
    val df = Seq("ab12 cd! e.f").toDF("text")
    // ab,12,cd,!,e,.,f → 7
    assert(df.select(TextAnalysis.lexTokenCount(col("text"))).head().getLong(0) == 7L)
  }

  test("quality features: ratios from known counts") {
    val df = Seq((1L, "the cat sat on the mat!")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityFeatures(df, "text").head()
    assert(r.getAs[Long]("word_count") == 6)
    assert(r.getAs[Long]("punct_count") == 1)
    // OCCURRENCES (r12, Gopher/C4-style density): 'the' twice + 'on'
    // — the old distinct-presence count saturated at the list size,
    // zeroing the quality stop-term for any long document
    assert(r.getAs[Long]("stop_hits") == 3)
    assert(r.getAs[Double]("stop_ratio") == 3.0 / 6)
    val q = r.getAs[Double]("quality_score")
    assert(q > 0 && q <= 1.0)
  }

  test("langId: marker precedence and 'und' fallback") {
    val df = Seq(
      "the cat and the dog is here",   // en
      "der hund und die katze ist",    // de
      "el perro y los gatos una casa", // es
      "le chien et les chats une",     // fr
      "zzz qqq xxx"                    // und
    ).toDF("text")
    val r = df.select(TextAnalysis.langId(col("text"))).collect().map(_.getString(0))
    assert(r.toSeq == Seq("en", "de", "es", "fr", "und"))
  }

  test("fingerprints: deterministic, shared for identical text, empty for short") {
    val df = Seq(
      (1L, "abcdefghijklmnopqrstuvwxyz"),
      (2L, "abcdefghijklmnopqrstuvwxyz"),
      (3L, "short")).toDF("id", "text")
    val fp = df.select(col("id"),
      TextAnalysis.fingerprints(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L).nonEmpty)
    assert(fp(3L).isEmpty) // shorter than k=8
  }

  test("portable (md5) fingerprints match the cross-engine derivation") {
    // expected values independently recomputed in DuckDB 1.0.0: 60-bit
    // md5 gram hashes, window-of-4 minima, distinct (sf0.01 doc 0)
    val r = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("doc_id") === 0L)
      .select(TextAnalysis.fingerprintsPortable(col("text")).as("fp"))
      .head().getSeq[Long](0)
    assert(r.length == 55 && r.min == 13432708482784600L)
    // all values fit the 60-bit non-negative contract (signed/unsigned-safe)
    assert(r.forall(v => v >= 0 && v < (1L << 60)))
    // non-ASCII text exercises the code-point gram path without crashing
    // and stays deterministic
    val uni = Seq((1L, "héllo wörld — ünïcode tèxt lóng enough")).toDF("id", "text")
    val a = uni.select(TextAnalysis.fingerprintsPortable(col("text"))).head().getSeq[Long](0)
    val b = uni.select(TextAnalysis.fingerprintsPortable(col("text"))).head().getSeq[Long](0)
    assert(a.nonEmpty && a == b)
  }

  test("repetition features: dominant trigram share and type-token ratio") {
    val d = Seq(
      (0L, "x y z x y z x y z"),    // 7 trigrams, "x y z" appears 3×
      (1L, "all distinct words here no repeats at all today"),
      (2L, "a b")                   // under 3 tokens → no trigrams
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionFeatures(d, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4)))
    assert(r(0) == ((7L, 3L, 3.0 / 7, 3.0 / 9)))
    assert(r(1)._2 == 1L && r(1)._4 < 1.0) // "all" repeats → ttr 8/9
    assert(r(2) == ((0L, 0L, 0.0, 1.0)))
  }

  test("pii redaction: emails and phones scrub, counts match, text preserved") {
    val d = Seq(
      (0L, "reach me at jane.doe+spam@mail.example.org or 212-555-0199 thanks"),
      (1L, "no contact info in this row at all"),
      (2L, "two mails a@b.co c.d@e.fg and 000-555-1234 plus 999-555-4321")
    ).toDF("doc_id", "text")
    val (ne, np) = TextAnalysis.piiCounts(col("text"))
    val r = d.select(col("doc_id"), ne, np,
        TextAnalysis.redactPii(col("text")).as("red"))
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 1 && r(0).getLong(2) == 1)
    assert(r(0).getString(3) == "reach me at <EMAIL> or <PHONE> thanks")
    assert(r(1).getLong(1) == 0 && r(1).getLong(2) == 0)
    assert(r(1).getString(3) == "no contact info in this row at all")
    assert(r(2).getLong(1) == 2 && r(2).getLong(2) == 2)
    assert(r(2).getString(3) == "two mails <EMAIL> <EMAIL> and <PHONE> plus <PHONE>")
  }

  test("pii counts on null text are null under BOTH ANSI modes — " +
       "size(null) is -1 with ANSI off and must not leak out as a count") {
    val d = Seq((0L, Some("a@b.co")), (1L, None)).toDF("doc_id", "text")
    val (ne, np) = TextAnalysis.piiCounts(col("text"))
    def counts() = d.select(col("doc_id"), ne.as("e"), np.as("p"))
      .orderBy("doc_id").collect()
      .map(r => (Option(r.get(1)), Option(r.get(2)))).toSeq
    val ansi = spark.conf.get("spark.sql.ansi.enabled")
    val on = counts()
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      assert(counts() == on, "ANSI setting changed the emitted counts")
    } finally spark.conf.set("spark.sql.ansi.enabled", ansi)
    assert(on == Seq((Some(1L), Some(0L)), (None, None)))
  }
}
