package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training (Sennrich,
  * Haddow, Birch, ACL 2016 — the subword vocabulary construction
  * under most LM tokenizers), in the WORD-TABLE formulation that makes
  * it tractable at 100 TB: one corpus pass builds (word, count) — the
  * only data-sized step — and every merge iteration runs over that
  * table (vocabulary-sized, orders of magnitude smaller than the
  * corpus), so N merges cost N vocabulary-table aggregations, never N
  * corpus scans.
  *
  * Cross-engine exactness is designed in: a word's symbol sequence is
  * ONE STRING with every symbol wrapped in `` sentinels
  * (`.a..bc.` with `.` = the sentinel is the sequence [a, bc]), and
  * applying merge (a, b) is a plain left-to-right non-overlapping
  * literal `replace(".a..b." → ".ab.")` — the exact semantics every
  * engine's non-regex replace has — so the q113 oracle re-runs the
  * whole training loop in SQL and must reproduce every merge decision
  * bit for bit. Ties break (count desc, left asc, right asc). The
  * sentinel may not appear in the corpus (enforced loudly).
  */
object Bpe {

  /** Symbol-sequence sentinel (U+0001). */
  val SEP = "\u0001"

  /** The (word, n) table — the one corpus-sized pass. Words split on
    * single spaces (pre-normalize the corpus upstream if it carries
    * other whitespace); empty tokens dropped.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** A raw word as its initial wrapped symbol string: every character
    * becomes `␁c␁`. */
  private def wrapChars(word: Column): Column =
    concat_ws("", transform(sequence(lit(1), length(word)),
      i => concat(lit(SEP), word.substr(i, lit(1)), lit(SEP))))

  /** Wrapped pattern/replacement of one merge. */
  private def pat(l: String, r: String): String = s"$SEP$l$SEP$SEP$r$SEP"
  private def rep(l: String, r: String): String = s"$SEP$l$r$SEP"

  private def applyMerges(w: Column,
                          merges: Seq[(String, String)]): Column =
    merges.foldLeft(w) { case (acc, (l, r)) =>
      replace(acc, lit(pat(l, r)), lit(rep(l, r)))
    }

  /** Symbols of a wrapped string, in order (split on the sentinel,
    * empties out). */
  private def symbols(w: Column): Column =
    filter(split(w, SEP), t => t =!= "")

  /** Adjacent symbol pairs weighted by word count: the array zipped
    * with its own tail — pure array built-ins, no window, no UDF. */
  private def pairCounts(wt: DataFrame): DataFrame =
    wt.select(col("n"), symbols(col("w")).as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("n"), explode(
        zip_with(slice(col("ts"), lit(1), size(col("ts")) - 1),
          slice(col("ts"), lit(2), size(col("ts")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("pr"))
      .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
      .agg(sum(col("n")).as("c"))

  /** Train `numMerges` merges over `docs`. Returns the ordered merge
    * table `(rank, left, right, pair_count)` — rank 0 is the first
    * merge learned; fewer rows come back iff the vocabulary runs out
    * of adjacent pairs first. Each iteration is one aggregation over
    * the vocabulary table, a driver-side argmax (one row), and one
    * `replace` projection; the evolving table is localCheckpoint'ed so
    * iteration i never replays iterations 0..i−1.
    */
  def train(docs: DataFrame, textCol: String,
            numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    require(docs.filter(col(textCol).contains(SEP)).isEmpty,
      "corpus contains the \\u0001 symbol sentinel — strip it first")
    var wt = wordTable(docs, textCol)
      .select(wrapChars(col("word")).as("w"), col("n"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[
      (Int, String, String, Long)]()
    var done = false
    while (!done && merges.size < numMerges) {
      val top = pairCounts(wt)
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c) =
          (top.head.getString(0), top.head.getString(1),
            top.head.getLong(2))
        merges += ((merges.size, l, r, c))
        wt = wt.select(
            replace(col("w"), lit(pat(l, r)), lit(rep(l, r))).as("w"),
            col("n"))
          .localCheckpoint()
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Tokenize `docs` with an ordered merge list (collected from
    * [[train]]'s output or loaded from storage): the DISTINCT words
    * fold through the merges once (vocabulary-sized work), then the
    * corpus joins word → tokens — the corpus-sized step is a
    * dictionary join, not per-row merge application. Returns
    * `(idCol, tokens)` with each document's subword tokens in word
    * order.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val dict = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "").distinct()
      .select(col("word"),
        symbols(applyMerges(wrapChars(col("word")), merges)).as("__toks"))
    docs.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("__p", "word")))
      .filter(col("word") =!= "")
      .join(dict, Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__p"), col("__toks")))),
        x => x("__toks"))).as("tokens"))
  }

  /** Persist a trained model ([[train]]'s output frame) — one small
    * parquet, rank-ordered on read. */
  def saveModel(merges: DataFrame, path: String): Unit =
    merges.coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a persisted model as the ordered merge list [[encode]] and
    * [[encodeCol]] take. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy(col("rank")).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))
      .toIndexedSeq

  /** Per-ROW tokenizer column: the same merges folded over each row's
    * own words — pure built-in expressions (split / transform /
    * replace / flatten), so it runs ANYWHERE a column does, including
    * a streaming projection (stateless, no watermark, no aggregation —
    * the face a `readStream → tokenize → writeStream` pipeline needs).
    * Cost is O(text length × merges) per row, against [[encode]]'s
    * vocabulary-sized dictionary fold — use the dictionary join for
    * batch corpora, this for streams and expression contexts. The two
    * agree token-for-token (BpeSpec pins it).
    */
  def encodeCol(text: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(
      filter(split(text, " "), w => w =!= ""),
      w => symbols(applyMerges(wrapChars(w), merges))))

  /** Corpus subword frequencies under the trained merges, straight
    * from the word table: token count = Σ word-count ×
    * occurrences-in-word. Vocabulary-sized, never re-reads the corpus.
    */
  def vocab(docs: DataFrame, textCol: String,
            merges: Seq[(String, String)]): DataFrame =
    wordTable(docs, textCol)
      .select(col("n"),
        explode(symbols(applyMerges(wrapChars(col("word")), merges)))
          .as("token"))
      .groupBy(col("token")).agg(sum(col("n")).as("n"))
}
