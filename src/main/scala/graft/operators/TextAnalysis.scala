package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * quality scoring, language ID, and winnowing fingerprints — all as
  * codegen-friendly `Column` expressions over a string column (no UDFs, so
  * the whole stage stays inside WholeStageCodegen at 100 TB).
  */
object TextAnalysis {

  /** Whitespace tokens; empty/blank text → empty array (not [""]). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** BPE-ish lexical token count: letter runs, digit runs, single
    * punctuation marks. The regex is ASCII-only so it behaves identically
    * under Java regex and RE2.
    */
  val lexTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def lexTokenCount(text: Column): Column =
    graft.functions.TextProfileFunctions.textProfile(text).getField("lex_count")

  /** Whitespace-token count without materializing the token array. */
  def wordCount(text: Column): Column =
    graft.functions.TextProfileFunctions.textProfile(text).getField("word_count")

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

  /** Quality features + composite score (length, punctuation ratio,
    * stopword ratio) — the classic pre-training heuristics. All ratios are
    * computed in double from integer counts, so they are reproducible
    * bit-for-bit in any engine.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    // one native byte-pass for all counters (TextProfile), ratios derived
    // from the integer counts so results are engine-reproducible
    df.withColumn("__tp",
        graft.functions.TextProfileFunctions.textProfile(col(textCol)))
      .withColumn("n_chars_m", col("__tp.n_chars"))
      .withColumn("word_count", col("__tp.word_count"))
      .withColumn("punct_count", col("__tp.punct_count"))
      .withColumn("stop_hits", col("__tp.stop_hits"))
      .withColumn("avg_word_len",
        when(col("word_count") > 0,
          col("n_chars_m").cast("double") / col("word_count")).otherwise(0.0))
      .withColumn("punct_ratio",
        when(col("n_chars_m") > 0,
          col("punct_count").cast("double") / col("n_chars_m")).otherwise(0.0))
      .withColumn("stop_ratio",
        when(col("word_count") > 0,
          col("stop_hits").cast("double") / col("word_count")).otherwise(0.0))
      .withColumn("quality_score",
        least(col("word_count").cast("double") / 100.0, lit(1.0)) * 0.4
          + (lit(1.0) - col("punct_ratio")) * 0.3
          + least(col("stop_ratio") * 5.0, lit(1.0)) * 0.3)
      .drop("__tp")
  }

  // Marker stopwords per language for the n-gram-free heuristic language
  // ID; scored by how many distinct markers appear in the document.
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "que", "y", "una"),
    "fr" -> Seq("le", "les", "et", "une", "est"))

  /** Heuristic language ID: distinct-marker-word hits per language with a
    * fixed precedence order (en > de > es > fr), 'und' (undetermined) when
    * nothing matches. Deterministic and expressible in plain SQL for the
    * oracle.
    */
  def langId(text: Column): Column = {
    val tp = graft.functions.TextProfileFunctions.textProfile(text)
    val scores = Seq("en" -> tp.getField("s_en"), "de" -> tp.getField("s_de"),
      "es" -> tp.getField("s_es"), "fr" -> tp.getField("s_fr"))
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s > 0 && s === best, lit(lang)).otherwise(els)
    }
  }

  /** Repetition / boilerplate features — the pre-training quality signal
    * the length/punct heuristics miss (navigation boilerplate, keyword
    * stuffing, generated spam repeat phrases):
    *
    *  - `n_trigrams`: word-trigram count (0 for docs under 3 tokens);
    *  - `max_rep`: occurrences of the MOST repeated trigram;
    *  - `rep_ratio`: max_rep / n_trigrams — the share of the document the
    *    dominant phrase occupies (≈0 for natural text);
    *  - `ttr`: type-token ratio (distinct tokens / tokens) — low = loops.
    *
    * One explode + two hash aggregates over (doc, trigram-hash); the
    * counted key is the native 8-byte n-gram hash WITH multiplicity
    * (`ngramHashesAll` — one codegen'd pass, no trigram-string
    * construction, an 8-byte shuffle key): counts-by-hash equal
    * counts-by-string up to a ~2⁻⁶⁴-per-pair collision, which could only
    * merge two trigram counts, and only within one document. Ratios are
    * double divisions of exact integer counts — engine-reproducible.
    * PRECONDITION: one row per `idCol` value — the trigram counts
    * aggregate BY id, so duplicate ids would merge two documents'
    * multiplicities into one inflated feature row per duplicate
    * (dedup or re-key upstream, as with [[graft.operators.Bpe.encode]]).
    */
  def repetitionFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks)
    val base = df.select(col(idCol),
      graft.functions.HashFunctions.ngramHashesAll(toks, 3).as("__tris"),
      when(n > 0, size(array_distinct(toks)).cast("double") / n)
        .otherwise(0.0).as("ttr"))
    val counts = base
      .select(col(idCol), explode(col("__tris")).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(max(col("c")).as("max_rep"), sum(col("c")).as("n_trigrams"))
    base.drop("__tris")
      .join(counts, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("max_rep"), lit(0L)).as("max_rep"),
        when(coalesce(col("n_trigrams"), lit(0L)) > 0,
          col("max_rep").cast("double") / col("n_trigrams"))
          .otherwise(0.0).as("rep_ratio"),
        col("ttr"))
  }

  /** PII patterns in the ASCII-only regex subset that behaves identically
    * under Java regex (Spark) and RE2 (oracle engines): character classes
    * and counted repetition only — no backreferences, no lookaround.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Scrub emails/phone numbers to placeholder tags. Order matters and is
    * fixed (emails first: a phone-like digit run inside an address must
    * not split the address before the email pass sees it).
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** Per-document PII hit counts (for audit metrics next to the scrub).
    * Phones are counted on the EMAIL-REDACTED text (r12): [[redactPii]]
    * replaces emails first, so a phone-shaped digit run INSIDE an email
    * address is never redacted as a phone — counting it against the raw
    * text made the audit report a phantom unredacted phone for every
    * such row. The counts now mirror the scrub exactly.
    */
  def piiCounts(text: Column): (Column, Column) = {
    // explicit null branch: size(null) is -1 (not null) when
    // spark.sql.ansi.enabled=false, so without it an ANSI-off cluster
    // reports -1 PII hits for null text where ANSI-on reports null
    def hits(t: Column, p: String): Column =
      when(t.isNull, lit(null).cast("long"))
        .otherwise(size(regexp_extract_all(t, lit(p), lit(0))).cast("long"))
    (hits(text, emailPattern),
      hits(regexp_replace(text, emailPattern, "<EMAIL>"), phonePattern))
  }

  /** Winnowing document fingerprints (local minima of a rolling k-gram
    * hash, per the MOSS scheme): hash every k-gram, take the min of each
    * sliding window of `w`, dedupe. Built entirely from `sequence` /
    * `transform` / `slice` / `array_min`, so it runs inside codegen and
    * needs no state.
    */
  def fingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    graft.functions.HashFunctions.winnowFingerprints(text, k, w)

  /** Oracle-checkable winnowing profile: same selection scheme, but gram
    * hashes are MD5-derived 60-bit values over CHARACTER k-grams, so any
    * engine with md5()/substr() reproduces the fingerprint set exactly.
    * Use [[fingerprints]] (rolling hash, ~10× cheaper) when cross-engine
    * verifiability isn't needed.
    */
  def fingerprintsPortable(text: Column, k: Int = 8, w: Int = 4): Column =
    graft.functions.HashFunctions.winnowFingerprintsMd5(text, k, w)
}
