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
