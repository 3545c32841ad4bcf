package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `text_profile(text)` → struct of the text-analysis counters the quality
  * / language-ID / tokenization operators need, computed in ONE byte-level
  * pass per document (vs one interpreted higher-order pipeline per
  * feature).
  *
  * Field semantics mirror the portable SQL the oracle runs:
  *  - `n_chars`     = `length(text)` (code points)
  *  - `word_count`  = count of `\S+` runs
  *  - `punct_count` = count of chars matching `[^A-Za-z0-9\s]`
  *  - `lex_count`   = count of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` tokens
  *  - `stop_hits`   = English stopword OCCURRENCES (lowercased; every
  *    token counted — the Gopher/C4-style density numerator, r12)
  *  - `s_en/s_de/s_es/s_fr` = distinct language-marker words present
  *
  * Whitespace is ASCII `[ \t\n\x0B\f\r]` (Java regex `\s`); non-ASCII code
  * points count as punctuation exactly like the regex character classes
  * they would fall into.
  */
case class TextProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextProfile.schema

  override def nullSafeEval(input: Any): Any =
    TextProfileKernel.profile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NativeKernels.textProfile($c);")

  override protected def withNewChildInternal(c: Expression): TextProfile =
    copy(child = c)
}

/** The single-pass counter kernel (shared by eval and generated code). */
object TextProfileKernel {
  def profile(input: UTF8String): InternalRow = {
    val bytes = input.getBytes
    val n = bytes.length
    var nChars = 0L
    var words = 0L
    var punct = 0L
    var lex = 0L
    var i = 0
    var inWord = false
    var inLetters = false
    var inDigits = false
    var wordStart = -1
    val stopSeen = new Array[Boolean](TextProfile.allMarkers.length)

    var stopOcc = 0L
    def closeWord(end: Int): Unit = {
      if (wordStart >= 0) {
        val h = TextProfile.lowerHash(bytes, wordStart, end - wordStart)
        TextProfile.markAll(h, stopSeen) // a word may be in several sets
        // stopword OCCURRENCES (r12): the distinct-presence count
        // saturates at the list size (10), so the quality formula's
        // stop term collapsed toward 0 for any long document — the
        // Gopher/C4-style density needs every occurrence
        if (TextProfile.isStopEn(h)) stopOcc += 1
        wordStart = -1
      }
    }

    while (i < n) {
      val b = bytes(i)
      // UTF-8: count only non-continuation bytes as chars
      if ((b & 0xc0) != 0x80) nChars += 1
      val isWs = b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
      val isLetter = (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
      val isDigit = b >= '0' && b <= '9'
      val isCont = (b & 0xc0) == 0x80
      if (!isWs) {
        if (!inWord) { words += 1; inWord = true; wordStart = i }
        if (isLetter) {
          if (!inLetters) { lex += 1; inLetters = true }
          inDigits = false
        } else if (isDigit) {
          if (!inDigits) { lex += 1; inDigits = true }
          inLetters = false
        } else if (!isCont) {
          punct += 1; lex += 1
          inLetters = false; inDigits = false
        }
      } else {
        if (inWord) closeWord(i)
        inWord = false; inLetters = false; inDigits = false
      }
      i += 1
    }
    if (inWord) closeWord(n)

    var sEn = 0L; var sDe = 0L; var sEs = 0L; var sFr = 0L
    i = 0
    while (i < stopSeen.length) {
      if (stopSeen(i)) {
        val set = TextProfile.markerSet(i)
        if (set == 1) sEn += 1
        else if (set == 2) sDe += 1
        else if (set == 3) sEs += 1
        else if (set == 4) sFr += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nChars, words, punct, lex, stopOcc,
      sEn, sDe, sEs, sFr))
  }
}

object TextProfile {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType), StructField("word_count", LongType),
    StructField("punct_count", LongType), StructField("lex_count", LongType),
    StructField("stop_hits", LongType), StructField("s_en", LongType),
    StructField("s_de", LongType), StructField("s_es", LongType),
    StructField("s_fr", LongType)))

  // marker word lists — MUST stay in sync with TextAnalysis.enStop /
  // TextAnalysis.langMarkers (the oracle SQL mirrors those)
  private val stopEn = Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")
  private val markerSets: Seq[(Int, Seq[String])] = Seq(
    0 -> stopEn,
    1 -> Seq("the", "and", "of", "to", "is"),
    2 -> Seq("der", "die", "und", "das", "ist"),
    3 -> Seq("el", "los", "que", "y", "una"),
    4 -> Seq("le", "les", "et", "une", "est"))

  /** Flattened (setId, word) pairs; a word can appear in several sets, so
    * each (set, word) occurrence is its own slot keyed by the word hash.
    */
  val allMarkers: Array[(Int, String)] =
    markerSets.flatMap { case (set, ws) => ws.map(set -> _) }.toArray

  private val hashes: Array[Long] = allMarkers.map { case (_, w) =>
    val b = w.getBytes("UTF-8")
    HashOps.hashBytes(b, 0, b.length)
  }

  def markerSet(i: Int): Int = allMarkers(i)._1

  private val stopEnHashes: Array[Long] =
    allMarkers.zip(hashes).collect { case ((0, _), h) => h }

  /** Is this word hash an English stopword (set 0)? Occurrence
    * counting needs the per-word answer, not just the seen flags. */
  def isStopEn(h: Long): Boolean = {
    var i = 0
    while (i < stopEnHashes.length) {
      if (stopEnHashes(i) == h) return true
      i += 1
    }
    false
  }

  /** Hash of the ASCII-lowercased byte run. */
  def lowerHash(bytes: Array[Byte], from: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    val end = from + len
    while (i < end) {
      var b = bytes(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      h ^= (b & 0xffL); h *= 0x100000001b3L
      i += 1
    }
    HashOps.fmix64(h)
  }

  /** Mark every marker slot whose word hash matches (a word can belong to
    * several language sets, e.g. EN stopwords vs EN markers).
    */
  def markAll(h: Long, seen: Array[Boolean]): Unit = {
    var i = 0
    while (i < hashes.length) { if (hashes(i) == h) seen(i) = true; i += 1 }
  }
}

object TextProfileFunctions {
  def textProfile(text: Column): Column =
    GraftInternal.column(TextProfile(GraftInternal.expression(text)))
}
