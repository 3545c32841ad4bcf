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

  /** a < b in CODE POINT order — Spark's orderBy compares strings as
    * UTF-8 bytes, which is exactly code-point order, while Java's
    * String.compareTo is UTF-16 code-unit order (they diverge on
    * supplementary characters). The chunked stop rule must see the
    * same order the argmax tie-break used.
    */
  private def cpLess(a: String, b: String): Boolean = {
    val x = a.codePoints().toArray
    val y = b.codePoints().toArray
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      if (x(i) != y(i)) return x(i) < y(i)
      i += 1
    }
    x.length < y.length
  }

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
  private def wrapChars(word: Column): Column = {
    // SENTINEL BAN, enforced at the ONE place every face funnels
    // through (train/encode/encodeCol/vocab — r12: only train checked,
    // so encode on a sentinel-bearing corpus silently dropped the char
    // AND blocked merges across the phantom boundary, emitting tokens a
    // trained tokenizer never produces). In-plan assert: no extra
    // corpus scan — it rides whatever pass evaluates the words.
    val guarded = when(assert_true(!word.contains(lit(SEP)),
      lit("text contains the \\u0001 symbol sentinel — strip it " +
        "first (it would silently corrupt tokenization)")).isNull, word)
    concat_ws("", transform(sequence(lit(1), length(guarded)),
      i => concat(lit(SEP), guarded.substr(i, lit(1)), lit(SEP))))
  }

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
    * of adjacent pairs first.
    *
    * Each ROUND is one pair-count aggregation over the vocabulary
    * table, a driver-side top-`chunk` collect, and one multi-`replace`
    * projection; the evolving table is localCheckpoint'ed per round so
    * round i never replays rounds 0..i−1. Up to `chunk` merges are
    * taken from ONE count pass — provably identical to the
    * one-merge-per-pass loop (the q113 oracle re-runs that loop in SQL
    * and must match bit for bit): candidates are consumed in argmax
    * order and the round ENDS (a) before the first candidate that
    * shares a symbol with a merge already applied this round (its
    * count may have changed), (b) before the first candidate whose
    * LEFT symbol sorts after any symbol created this round (a freshly
    * created symbol s can seed a new pair (s, y) that TIES the
    * candidate's count and wins the (count, left, right) tie-break;
    * its generator (r, y) ranks above the candidate only when the
    * count is strictly larger, so ties are invisible to rule (a) —
    * BpeSpec's wide corpus catches exactly this), or (c) after
    * applying a candidate whose concatenation equals a symbol some
    * EARLIER ROUND created — the collision boosts pairs over that
    * symbol, poisoning only later candidates' counts, so the
    * colliding merge itself still applies and every round advances
    * ≥1 merge. Under (a)+(b), every applied candidate's count is
    * exact and no changed-or-created pair can outrank it: a strictly
    * larger such pair implies a generator pair ranked above the
    * candidate that would have tripped (a), and a tying one implies
    * either that or a created symbol tripping (b). The applied prefix
    * is therefore exactly the sequence the one-at-a-time loop picks.
    * Round trips are bounded by numMerges and in practice are
    * ~numMerges/chunk on natural corpora (adjacent argmaxes rarely
    * interact); a 50k-merge training is ~50k/chunk aggregations, not
    * 50k.
    */
  def train(docs: DataFrame, textCol: String,
            numMerges: Int, chunk: Int = 8): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(chunk >= 1, s"chunk must be >= 1, got $chunk")
    val spark = docs.sparkSession
    import spark.implicits._
    // the sentinel ban is enforced in-plan by wrapChars (r12) — the
    // old eager require here cost a second full corpus scan
    var wt = wordTable(docs, textCol)
      .select(wrapChars(col("word")).as("w"), col("n"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[
      (Int, String, String, Long)]()
    // Every multi-char symbol is some merge's concatenation (initial
    // symbols are single chars, and l+r is always ≥2 chars), so the
    // driver knows the full collision universe for stop-rule (c)
    // without touching the table.
    val mergedSymbols = scala.collection.mutable.Set[String]()
    var done = false
    while (!done && merges.size < numMerges) {
      val k = math.min(chunk, numMerges - merges.size)
      val top = pairCounts(wt)
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(k).collect()
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set[String]()
        val created = scala.collection.mutable.ArrayBuffer[String]()
        val applied =
          scala.collection.mutable.ArrayBuffer[(String, String)]()
        var stopped = false
        top.foreach { row =>
          if (!stopped) {
            val (l, r, c) =
              (row.getString(0), row.getString(1), row.getLong(2))
            if (used(l) || used(r) ||
                created.exists(s => cpLess(s, l))) stopped = true
            else {
              // Safe per rules (a)+(b) → its count is exact and it is
              // the true argmax at its turn, so apply — even on a
              // collision (rule c), which only poisons the counts of
              // LATER candidates (pairs over the colliding symbol gain
              // occurrences), so it ends the round after applying
              // rather than before. The first candidate always
              // applies (both sets start empty) — no livelock.
              val collides = mergedSymbols(l + r)
              merges += ((merges.size, l, r, c))
              applied += ((l, r))
              used += l; used += r; used += (l + r)
              created += (l + r)
              mergedSymbols += (l + r)
              if (collides) stopped = true
            }
          }
        }
        wt = wt.select(applyMerges(col("w"), applied.toSeq).as("w"),
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
    * order. Every distinct document id comes back exactly once:
    * null/empty/whitespace-only texts — which the explode+join path
    * drops — are restored by a null-safe left join against the id
    * spine with an empty token array (ADVICE r9: a tokenizer that
    * silently loses rows corrupts downstream corpus joins). A null id
    * is a key like any other: its group's real tokens survive the
    * spine join (`<=>`, not `=`).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    require(!Seq("word", "__p", "__toks", "tokens").contains(idCol),
      s"idCol '$idCol' collides with encode's internal/output columns " +
        "(word, __p, __toks, tokens) — rename it first")
    val dict = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "").distinct()
      .select(col("word"),
        symbols(applyMerges(wrapChars(col("word")), merges)).as("__toks"))
    val toks = docs.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("__p", "word")))
      .filter(col("word") =!= "")
      .join(dict, Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__p"), col("__toks")))),
        x => x("__toks"))).as("tokens"))
    // null-SAFE spine join (<=>): a plain equi-join would never match a
    // null doc id, silently swapping that group's real tokens for [] —
    // the exact row-corruption this spine exists to prevent
    // the spine's distinct is an aggregate anyway — counting rows per
    // id in the SAME shuffle powers a free duplicate-id guard: two rows
    // sharing an id would interleave their word positions into one
    // scrambled token stream (neither document's order, no error)
    val spine = docs.groupBy(col(idCol))
      .agg(count(lit(1)).as("__dup")).as("__s")
    spine.join(toks.as("__t"),
        col(s"__s.$idCol") <=> col(s"__t.$idCol"), "left")
      .select(
        when(assert_true(col("__dup") === 1,
          lit("encode: duplicate doc ids in the batch — two rows " +
            "sharing an id would interleave into one scrambled token " +
            "stream; dedup or re-key first")).isNull,
          col(s"__s.$idCol")).as(idCol),
        coalesce(col("__t.tokens"), typedLit(Seq.empty[String]))
          .as("tokens"))
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
