package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity: deterministic sampling, vocabulary statistics,
  * and token-window chunking. All pure built-in expressions (codegen'd,
  * no UDFs, no RNG) and all SQL-portable, so every decision an engine makes
  * here — which rows a sample keeps, how a document splits — is
  * reproducible by any other engine, run, or cluster layout.
  */
object Corpus {

  /** Deterministic hash bucket in [0, buckets) for a key: first 60 bits of
    * md5 of the key's string form (SQL-portable:
    * `CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT) %
    * buckets`). Unlike `rand()`-based sampling, membership is a pure
    * function of the key — stable under retries, re-runs and repartitions,
    * and a row keeps its fate when the corpus around it changes.
    */
  def hashBucket(key: Column, buckets: Long): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") % buckets

  /** Keep ~`fraction` of rows, deterministically by key hash. A plain
    * filter — pushes past projections, no shuffle, no sort.
    */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double): DataFrame = {
    val buckets = 1000000L
    // round, don't truncate: 0.3 * 1e6 is 299999.99999999994 in binary
    // double — truncation would silently drop one bucket and diverge from
    // an engine computing round(fraction * buckets)
    df.filter(hashBucket(col(keyCol), buckets) < math.round(fraction * buckets))
  }

  /** Per-stratum quota sample: the `quota` rows with the smallest key hash
    * in each stratum (key tiebreak). Deterministic ranking, window
    * partitioned by the stratum — never a global window.
    *
    * Null contract: rows with a NULL `keyCol` are DROPPED, like
    * [[sampleByHash]] (whose null-hash comparison already drops them):
    * deterministic membership must be derivable from the key, and a null
    * key hashes to nothing — it would sort wherever the engine's null
    * ordering puts it, shifting every other row's rank engine-dependently.
    * A null STRATUM is a real group (unknown lang/source) and stays.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       quota: Int): DataFrame = {
    val h = hashBucket(col(keyCol), 1000000L)
    val w = Window.partitionBy(col(strataCol)).orderBy(h, col(keyCol))
    df.filter(col(keyCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Source-mix balancing (training-data mixture control): downsample
    * every stratum to the SMALLEST stratum's size, keeping each stratum's
    * `quota` rows with the lowest key hash — fully deterministic, so the
    * balanced mixture is reproducible across engines and runs. The quota
    * is computed in-plan (two aggregates + a one-row broadcast cross
    * join — the legitimate scalar-broadcast shape, like the IVF centroid
    * matrix), so no driver round trip and no hand-fed constant that can
    * drift from the data.
    */
  def balanceStrata(df0: DataFrame, strataCol: String, keyCol: String): DataFrame = {
    // Same null contract as stratifiedSample: null-key rows are dropped
    // BEFORE the quota aggregate too, so they neither consume a slot nor
    // deflate the min-stratum size.
    val df = df0.filter(col(keyCol).isNotNull)
    val m = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__c"))
      .agg(min(col("__c")).as("__m"))
    val h = hashBucket(col(keyCol), 1000000L)
    val w = Window.partitionBy(col(strataCol)).orderBy(h, col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .crossJoin(broadcast(m))
      .filter(col("__rn") <= col("__m"))
      .drop("__rn", "__m")
  }

  /** Weight-proportional deterministic sampling: keep each row with
    * probability `fraction × weight / max(weight)` — the training-mixture
    * knob that favors (say) long or high-quality documents without an RNG.
    * Membership is decided by pure INTEGER arithmetic
    * (`hash × wmax < fraction_ppm × weight`, all BIGINT — no float
    * rounding at the boundary), so the kept set is bit-identical across
    * engines, runs, and partitionings. The max weight is an in-plan
    * one-row broadcast, same shape as [[balanceStrata]]'s quota.
    * `weightCol` must be integral and non-negative; rows with null weight
    * are dropped (weightless = never sampled).
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     fraction: Double): DataFrame = {
    val buckets = 1000000L
    val ppm = math.round(fraction * buckets)
    val mx = df.agg(max(col(weightCol)).cast("long").as("__wmax"))
    // OVERFLOW GUARD (r12): hash is up to 1e6, so hash × wmax wraps
    // past Long.MaxValue once max(weight) ≳ 9.2e12 — under non-ANSI
    // arithmetic the wrap is silent and the "bit-identical membership"
    // contract becomes garbage. The assert rides the kept filter
    // condition (a standalone guard column would prune away).
    val guard = assert_true(col("__wmax") <= lit(9000000000000L),
      lit("weightedSample: max(weight) exceeds ~9e12 — the integer " +
        "hash×weight membership arithmetic would overflow; rescale " +
        "the weights (ratios are what matter) and retry"))
    df.crossJoin(broadcast(mx))
      .filter(guard.isNull &&
        hashBucket(col(keyCol), buckets) * col("__wmax") <
          lit(ppm) * col(weightCol).cast("long"))
      .drop("__wmax")
  }

  /** Sequence packing (context packing): assign documents/chunks to
    * fixed-budget packs per shard — the step between chunking and batch
    * assembly in a pre-training pipeline. Pack `p` holds the rows whose
    * PRECEDING token mass (in deterministic (key-hash, key) order within
    * the shard) lies in `[p·budget, (p+1)·budget)`: every pack starts
    * within budget and may overrun by its final row (consumers truncate or
    * split the straddler — the standard fixed-boundary regime). Exact
    * first-fit packing is inherently sequential state; this formulation is
    * one keyed window cumsum, fully parallel over shards, and
    * engine-reproducible (integer token sums, one double division whose
    * inputs stay far below 2^52).
    */
  def packSequences(df: DataFrame, shardCol: String, keyCol: String,
                    tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, "packSequences requires a positive budget")
    val h = hashBucket(col(keyCol), 1000000L)
    val wPre = Window.partitionBy(col(shardCol)).orderBy(h, col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withPack = df
      .withColumn("__pre",
        coalesce(sum(col(tokenCol).cast("long")).over(wPre), lit(0L)))
      .withColumn("pack_id", floor(col("__pre") / budget).cast("long"))
      .drop("__pre")
    val wPos = Window.partitionBy(col(shardCol), col("pack_id"))
      .orderBy(h, col(keyCol))
    withPack.withColumn("pack_pos", row_number().over(wPos))
  }

  /** Deterministic training-shard assignment: every row gets a
    * `shard_id` in [0, nShards) and a 1-based `shard_pos` — the manifest
    * a pre-training data loader consumes. Both are pure functions of the
    * KEY: shard = key-hash mod nShards, within-shard order = (hash, key) —
    * i.e. a deterministic pseudorandom shuffle, which is exactly what
    * training wants (hash order decorrelates neighboring source rows, so
    * no curriculum bias from crawl/source locality), and it is stable
    * under re-runs, retries, and corpus repartitioning.
    *
    * Scale shape: one shuffle (the per-shard window); shards sort
    * independently and in parallel, so the global corpus is never
    * totally ordered. SQL-portable like [[hashBucket]] — any engine
    * reproduces the same manifest from md5 arithmetic.
    */
  def shardAssignment(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, "shardAssignment requires nShards >= 1")
    val w = Window.partitionBy(col("shard_id")).orderBy(col("__h"), col(keyCol))
    df.withColumn("__h",
        conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
          .cast("long"))
      .withColumn("shard_id", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("shard_pos", row_number().over(w))
      .drop("__h")
  }

  /** Per-group Pareto / cumulative-share curve: rank each group's rows by
    * `weightCol` DESC (id tiebreak) and emit the running share of the
    * group's total mass — "the top N docs of this source carry X% of its
    * tokens", the concentration diagnostic behind mixture re-weighting and
    * head-capping decisions. `cum_share` is exact-integer cumsum and group
    * total (both windows PARTITIONED by the group, never global) with ONE
    * double division at the end — bit-reproducible anywhere. Rows with a
    * null weight rank as weight 0 (they contribute nothing to the mass).
    */
  def cumulativeShare(df: DataFrame, groupCol: String, weightCol: String,
                      idCol: String): DataFrame = {
    val wt = coalesce(col(weightCol).cast("long"), lit(0L))
    val wCum = Window.partitionBy(col(groupCol))
      .orderBy(col(weightCol).desc_nulls_last, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(groupCol))
    df.withColumn("rank_in_group", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col(weightCol).desc_nulls_last, col(idCol))))
      .withColumn("__cum", sum(wt).over(wCum))
      .withColumn("__tot", sum(wt).over(wAll))
      .withColumn("cum_share",
        when(col("__tot") > 0, col("__cum").cast("double") / col("__tot"))
          .otherwise(lit(1.0)))
      .drop("__cum", "__tot")
  }

  /** Shared skew-proof running-sum machinery for the prefix-selection
    * operators ([[tokenBudgetFill]], [[keepTopByGroup]]): `base` carries
    * a coarse `__bin` column (monotone non-decreasing along the selection
    * order) and a `__w` weight; the result adds `__cum` — each row's
    * inclusive running weight in the group's TOTAL order — computed as
    * (exclusive prefix of whole earlier bins) + (within-bin window sum).
    *
    * Why not one window per group: a per-group window serializes the
    * whole group through one task, and groups here are SOURCES — at
    * 100 TB one source can be most of the corpus. Binning caps every
    * window partition at ~1/nBins of the group: the per-(group, bin)
    * totals aggregate is map-side combined and tiny (groups × bins
    * rows), its per-group prefix window runs over ≤ nBins rows, and the
    * join back on (group, bin) produces exactly the partitioning the
    * within-bin window needs, so the corpus is shuffled ONCE.
    */
  private def binnedCumsum(base: DataFrame, groupCol: String,
                           order: Seq[Column]): DataFrame = {
    val binTotals = base.groupBy(col(groupCol), col("__bin"))
      .agg(sum(col("__w")).as("__binw"))
    val wPre = Window.partitionBy(col(groupCol)).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // __gtot (the group's WHOLE weight) rides the same tiny frame — a
    // caller needing totals ([[epochFill]]'s epoch division) must not pay
    // a second corpus-wide aggregate scan for a number this frame has
    val wAll = Window.partitionBy(col(groupCol))
    val offsets = binTotals
      .withColumn("__base", coalesce(sum(col("__binw")).over(wPre), lit(0L)))
      .withColumn("__gtot", sum(col("__binw")).over(wAll))
      .drop("__binw")
    val wIn = Window.partitionBy(col(groupCol), col("__bin"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // offsets is groups × occupied-bins — AQE broadcasts it when small;
    // when it is not, the shuffle this join pays on (group, bin) is the
    // SAME partitioning the window below requires, so it is paid once
    base.join(offsets, Seq(groupCol, "__bin"))
      .withColumn("__cum", col("__base") + sum(col("__w")).over(wIn))
  }

  /** Scratch columns the prefix-selection family writes and drops; an
    * input already carrying any of them (or the operator's own output
    * columns) would be silently overwritten mid-pipeline, so every
    * entry point refuses the collision loudly instead — the same
    * contract [[expandCopies]] pins for its outputs.
    */
  private val prefixScratch = Seq("__h", "__bin", "__w", "__base",
    "__cum", "__budget", "__gtot", "__lo", "__hi", "__e", "__r")

  private def requireFresh(df: DataFrame, op: String,
                           outputs: Seq[String]): Unit = {
    // case-INSENSITIVE match: Spark resolves columns case-insensitively
    // by default, so withColumn("n_tokens", ...) silently replaces a
    // caller's N_TOKENS — an exact-string guard would wave it through.
    // (Under spark.sql.caseSensitive=true this is stricter than needed;
    // refusing a case-variant name loudly beats destroying it silently.)
    val taken = df.columns.map(_.toLowerCase).toSet
    val clash = (outputs ++ prefixScratch).filter(c => taken(c.toLowerCase))
    require(clash.isEmpty,
      s"$op writes ${outputs.mkString("/")} plus internal __ scratch " +
        s"columns — the input already has ${clash.mkString(", ")} " +
        "(matched case-insensitively); rename or drop them first")
  }

  /** Shared fill-family preamble: validate the mixture spec,
    * broadcast-join it, attach the deterministic hash order, its coarse
    * bin, and the row weight. The operators' documented equivalences
    * ("sub-epoch epochFill ≡ tokenBudgetFill", "byWeight on a
    * token-count column ≡ the text form") hold BECAUSE this block is
    * shared, not parallel-maintained.
    */
  private def budgetedBaseW(df: DataFrame, groupCol: String, keyCol: String,
                            weight: Column, budgets: Seq[(String, Long)],
                            op: String, outputs: Seq[String]): DataFrame = {
    require(budgets.nonEmpty, s"$op requires at least one budget")
    require(budgets.forall(_._2 >= 0),
      s"$op budgets must be >= 0, got $budgets")
    require(budgets.map(_._1).distinct.size == budgets.size,
      s"$op budgets name a group twice: $budgets")
    requireFresh(df, op, outputs)
    val spark = df.sparkSession
    import spark.implicits._
    val bdf = broadcast(budgets.toDF("__grp", "__budget")
      .withColumnRenamed("__grp", groupCol))
    df.filter(col(keyCol).isNotNull)
      .join(bdf, Seq(groupCol))
      .withColumn("__h", hashBucket(col(keyCol), 1000000L))
      // __h < 1e6 and 1e6 × 4096 ≪ 2^53, so the double division is exact
      .withColumn("__bin",
        floor(col("__h") * prefixBins / 1000000L).cast("long"))
      .withColumn("__w", weight)
  }

  private def budgetedBase(df: DataFrame, groupCol: String, keyCol: String,
                           textCol: String, budgets: Seq[(String, Long)],
                           op: String, outputs: Seq[String]): DataFrame =
    budgetedBaseW(df, groupCol, keyCol,
      // "null text = 0 tokens" spelled as an explicit branch: size(null)
      // is -1 (not null) when spark.sql.ansi.enabled=false, and a -1
      // weight would make the running total DECREASE past null docs
      when(col(textCol).isNull, lit(0L))
        .otherwise(size(TextAnalysis.tokens(col(textCol))).cast("long")),
      budgets, op, outputs)

  /** The guarded weight expression for the byWeight fill faces: null
    * weights count 0 (an unweighted row consumes no budget — the same
    * contract as null text), and a NEGATIVE weight fails IN-PLAN (it
    * would make the running total non-monotone, silently corrupting
    * every membership decision after it; a guard column would be
    * optimizer-pruned, so the raise_error rides the weight itself).
    */
  private def guardedWeight(weightCol: String, op: String): Column = {
    val w = col(weightCol).cast("long")
    when(w.isNull, lit(0L))
      .when(w < 0, raise_error(concat(
        lit(s"$op: $weightCol="), w.cast("string"),
        lit(" is negative — budget weights must be >= 0"))).cast("long"))
      .otherwise(w)
  }

  /** How coarse the [[binnedCumsum]] bins are: window partitions are
    * ~group/4096, so even a group holding ALL of 100 TB caps its widest
    * window task at ~25 GB of rows — and the hash-uniform case ( [[
    * tokenBudgetFill]] ) is uniform by construction.
    */
  private val prefixBins = 4096L

  /** Per-group token-budget fill (mixture materialization): for each
    * group (source/domain) with an entry in `budgets`, keep the
    * deterministic hash-order prefix of its documents whose running
    * whitespace-token total stays within the group's budget — the step
    * that turns mixture WEIGHTS ("2B tokens of web, 500M of code") into
    * an actual document manifest. Selection is a pure function of the
    * key ([[hashBucket]] order, key tiebreak): stable under re-runs,
    * retries, partitioning, and corpus growth — a group's kept prefix
    * only EXTENDS when its budget grows, it never reshuffles.
    *
    * Adds `n_tokens` (the row's whitespace-token count; null text = 0)
    * and `cum_tokens` (inclusive running total in selection order) and
    * keeps rows with `cum_tokens <= budget`. Groups without a budget
    * entry are dropped — a mixture spec is explicit. Rows with a null
    * key are dropped (no identity to order deterministically, same
    * contract as [[weightedSample]]'s null weights). A document longer
    * than the remaining budget is NOT taken (hard cap, no straddler) —
    * the fill can stop short of the budget by at most one document.
    *
    * Scale shape: one corpus shuffle ([[binnedCumsum]] — never a
    * per-source window), one tiny aggregate, one broadcast of the
    * budget list. SQL-portable: md5 hash order + integer token cumsum.
    */
  def tokenBudgetFill(df: DataFrame, groupCol: String, keyCol: String,
                      textCol: String,
                      budgets: Seq[(String, Long)]): DataFrame =
    fillCore(budgetedBase(df, groupCol, keyCol, textCol, budgets,
      "tokenBudgetFill", Seq("n_tokens", "cum_tokens")),
      groupCol, keyCol, "n_tokens", "cum_tokens")

  /** [[tokenBudgetFill]] over a PRECOMPUTED weight column instead of a
    * whitespace-token recount — the form production budgets actually
    * use, where "tokens" means a real tokenizer's counts
    * ([[graft.operators.Bpe.encode]] sizes, a provider's usage column)
    * computed once at ingest, not re-derived per fill. Identical
    * selection machinery (shared preamble + [[binnedCumsum]]); output
    * columns are `fill_weight`/`cum_weight` (the generic weight isn't
    * token counts, so the names don't lie). Null weights count 0 (the
    * null-text contract); NEGATIVE weights fail in-plan — a negative
    * weight makes the running total non-monotone and silently corrupts
    * every membership decision after it.
    */
  def tokenBudgetFillByWeight(df: DataFrame, groupCol: String,
                              keyCol: String, weightCol: String,
                              budgets: Seq[(String, Long)]): DataFrame =
    fillCore(budgetedBaseW(df, groupCol, keyCol,
      guardedWeight(weightCol, "tokenBudgetFillByWeight"), budgets,
      "tokenBudgetFillByWeight", Seq("fill_weight", "cum_weight")),
      groupCol, keyCol, "fill_weight", "cum_weight")

  /** The shared prefix-keep tail of the budget fills: cumsum in
    * (hash, key) order, keep rows whose inclusive running weight fits
    * the group's budget, surface the weight and running total.
    */
  private def fillCore(base: DataFrame, groupCol: String, keyCol: String,
                       wOut: String, cumOut: String): DataFrame =
    binnedCumsum(base, groupCol, Seq(col("__h"), col(keyCol)))
      .filter(col("__cum") <= col("__budget"))
      .withColumn(wOut, col("__w"))
      .withColumn(cumOut, col("__cum"))
      .drop(prefixScratch: _*)

  /** [[tokenBudgetFill]] with the mixture spec supplied as a two-column
    * (group, budget) frame — the SQL face's shape, where budgets arrive
    * as a temp view rather than a Scala literal. The spec is collected
    * (mixture specs are human-authored source/domain lists; the loud cap
    * below bounds the driver) so the Seq form's validation — non-empty,
    * non-negative, no duplicate groups — applies unchanged.
    */
  def tokenBudgetFill(df: DataFrame, groupCol: String, keyCol: String,
                      textCol: String, budgets: DataFrame): DataFrame =
    tokenBudgetFill(df, groupCol, keyCol, textCol, collectBudgets(budgets))

  /** [[tokenBudgetFill]] generalized to budgets LARGER than a source
    * (epoch upsampling): each budgeted group contributes
    * `floor(budget / groupTokens)` whole epochs of itself plus the
    * deterministic hash-order prefix of the remainder — "3.2 epochs of
    * books" as mixture specs actually say it. Output is the compact
    * MANIFEST form — each kept document once, with `n_tokens` and
    * `n_copies` (epochs + 1 if the doc is in the remainder prefix;
    * rows with `n_copies` 0 are dropped) — not the exploded stream;
    * [[expandCopies]] rehydrates per-copy rows when a shard writer
    * wants them. For budgets below one epoch this degrades exactly to
    * [[tokenBudgetFill]] membership (epochs = 0, remainder = budget).
    *
    * Same determinism contract: selection is a pure function of the
    * key, so a group's manifest only grows MORE copies as its budget
    * grows. Null keys are dropped; groups without a budget entry are
    * dropped; groups whose budgeted rows total ZERO tokens are dropped
    * (no token budget is fillable by token-less documents — and their
    * epoch division is undefined).
    *
    * Scale shape: [[tokenBudgetFill]]'s single corpus shuffle, nothing
    * more — the group totals the epoch division needs ride
    * [[binnedCumsum]]'s tiny per-bin frame (`__gtot`), never a second
    * corpus-wide aggregate scan; the division is integral (`div`), so a
    * 100 T-token budget never rides a double.
    */
  def epochFill(df: DataFrame, groupCol: String, keyCol: String,
                textCol: String,
                budgets: Seq[(String, Long)]): DataFrame =
    epochCore(budgetedBase(df, groupCol, keyCol, textCol, budgets,
      "epochFill", Seq("n_tokens", "n_copies")),
      groupCol, keyCol, "n_tokens")

  /** [[epochFill]] over a precomputed weight column — see
    * [[tokenBudgetFillByWeight]] for the weight contract (null = 0,
    * negative fails in-plan); output is `fill_weight`/`n_copies`.
    */
  def epochFillByWeight(df: DataFrame, groupCol: String, keyCol: String,
                        weightCol: String,
                        budgets: Seq[(String, Long)]): DataFrame =
    epochCore(budgetedBaseW(df, groupCol, keyCol,
      guardedWeight(weightCol, "epochFillByWeight"), budgets,
      "epochFillByWeight", Seq("fill_weight", "n_copies")),
      groupCol, keyCol, "fill_weight")

  /** The shared epoch-manifest tail: whole epochs by integral division
    * plus the remainder prefix, zero-weight groups dropped. Epochs and
    * the exact remainder stay in BIGINT arithmetic end to end (a double
    * would lose exactness past 2^53).
    */
  private def epochCore(base: DataFrame, groupCol: String, keyCol: String,
                        wOut: String): DataFrame =
    binnedCumsum(base, groupCol, Seq(col("__h"), col(keyCol)))
      .filter(col("__gtot") > 0)
      .withColumn("__e", expr("__budget div __gtot"))
      .withColumn("__r", col("__budget") - col("__e") * col("__gtot"))
      .withColumn("n_copies",
        col("__e") + when(col("__cum") <= col("__r"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .withColumn(wOut, col("__w"))
      .drop(prefixScratch: _*)

  /** [[epochFill]] with the mixture spec as a two-column (group, budget)
    * frame — the SQL face's shape; same human-sized collect bound as the
    * [[tokenBudgetFill]] frame overload.
    */
  def epochFill(df: DataFrame, groupCol: String, keyCol: String,
                textCol: String, budgets: DataFrame): DataFrame =
    epochFill(df, groupCol, keyCol, textCol, collectBudgets(budgets))

  /** [[tokenBudgetFill]] with the mixture spec as FRACTIONS of one total
    * token budget — the way mixture specs are actually written ("70% web,
    * 25% code, 5% books of a 2 T-token run") — converted to per-group
    * absolute budgets by `floor(fraction × total)` and delegated, so
    * every fill contract (hash-order prefix, determinism, budget
    * monotonicity) is inherited rather than re-implemented. Fractions
    * must be positive and sum to ≤ 1 + 1e-9 (an over-committed spec is a
    * bug, not a rounding nit); they need not sum to exactly 1 — a spec
    * reserving headroom is legitimate. The floor conversion under-fills
    * each group by < 1 token, never over-fills.
    */
  def mixtureFill(df: DataFrame, groupCol: String, keyCol: String,
                  textCol: String, totalBudget: Long,
                  fractions: Seq[(String, Double)]): DataFrame = {
    require(totalBudget >= 0,
      s"mixtureFill totalBudget must be >= 0, got $totalBudget")
    require(fractions.forall(f => f._2 > 0 && !f._2.isNaN),
      s"mixtureFill fractions must be positive, got $fractions")
    val sumF = fractions.map(_._2).sum
    require(sumF <= 1.0 + 1e-9,
      f"mixtureFill fractions sum to $sumF%.6f > 1 — over-committed spec")
    tokenBudgetFill(df, groupCol, keyCol, textCol,
      fractions.map { case (g, f) => g -> math.floor(f * totalBudget).toLong })
  }

  /** [[mixtureFill]] with the fractions as a two-column (group,
    * fraction) frame — the SQL face's shape; same human-sized collect
    * bound as [[collectBudgets]], with the fraction validation delegated
    * to the Seq form.
    */
  def mixtureFill(df: DataFrame, groupCol: String, keyCol: String,
                  textCol: String, totalBudget: Long,
                  fractions: DataFrame): DataFrame = {
    require(fractions.columns.length == 2,
      "fractions frame must have exactly two columns (group, fraction), " +
        s"got ${fractions.columns.mkString("(", ", ", ")")}")
    val Array(g, f) = fractions.columns
    val rows = fractions
      .select(col(g).cast("string"), col(f).cast("double"))
      .limit(100001).collect()
    require(rows.length <= 100000,
      "fractions frame exceeds 100k groups — a mixture spec is a " +
        "human-sized list; a data-sized frame here is a bug")
    require(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      "fractions frame has null group or fraction rows")
    mixtureFill(df, groupCol, keyCol, textCol, totalBudget,
      rows.toSeq.map(r => r.getString(0) -> r.getDouble(1)))
  }

  /** [[tokenBudgetFillByWeight]] with a budgets frame (the SQL face). */
  def tokenBudgetFillByWeight(df: DataFrame, groupCol: String,
                              keyCol: String, weightCol: String,
                              budgets: DataFrame): DataFrame =
    tokenBudgetFillByWeight(df, groupCol, keyCol, weightCol,
      collectBudgets(budgets))

  /** [[epochFillByWeight]] with a budgets frame (the SQL face). */
  def epochFillByWeight(df: DataFrame, groupCol: String, keyCol: String,
                        weightCol: String, budgets: DataFrame): DataFrame =
    epochFillByWeight(df, groupCol, keyCol, weightCol,
      collectBudgets(budgets))

  /** The shared budgets-frame → Seq collection for the SQL faces: exactly
    * two columns, ≤100k rows, no nulls — mixture specs are human-authored
    * lists, so a data-sized frame here is a bug, loudly.
    */
  private def collectBudgets(budgets: DataFrame): Seq[(String, Long)] = {
    require(budgets.columns.length == 2,
      "budgets frame must have exactly two columns (group, budget), got " +
        budgets.columns.mkString("(", ", ", ")"))
    val Array(g, b) = budgets.columns
    val rows = budgets
      .select(col(g).cast("string"), col(b).cast("long"))
      .limit(100001).collect()
    require(rows.length <= 100000,
      "budgets frame exceeds 100k groups — a mixture spec is a " +
        "human-sized list; a data-sized frame here is a bug")
    require(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      "budgets frame has null group or budget rows")
    rows.toSeq.map(r => r.getString(0) -> r.getLong(1))
  }

  /** Rehydrate a copies manifest ([[epochFill]] output, or any frame
    * with a positive copies column) into per-copy rows: one row per
    * (document, `copy_idx` in 1..n_copies), plus `shuffle_key` — a
    * deterministic hash of (key, copy_idx) — so a shard writer that
    * sorts or bucket-partitions by it interleaves epochs instead of
    * emitting a document's copies back to back (repeated-data runs are
    * the known LLM-training hazard this column exists to break up).
    *
    * Rows with null or non-positive copies are dropped. A copies value
    * above `maxCopies` (default 10 000) fails IN-PLAN via the sequence
    * bound itself — a corrupted manifest cannot silently explode a
    * task; raise the cap explicitly when a tiny source really does run
    * thousands of epochs. SQL-portable: the same md5 formula as
    * [[hashBucket]] over `key || ':' || copy_idx`.
    */
  def expandCopies(df: DataFrame, keyCol: String, copiesCol: String,
                   maxCopies: Long = 10000L): DataFrame = {
    require(maxCopies > 0, s"expandCopies maxCopies must be > 0, got $maxCopies")
    require(!df.columns.contains("copy_idx") &&
      !df.columns.contains("shuffle_key"),
      "expandCopies adds copy_idx/shuffle_key — the input already has one")
    val c = col(copiesCol).cast("long")
    // the guard lives INSIDE the sequence bound: an unused side-channel
    // guard column would be pruned by the optimizer and never fire
    val bounded = when(c > maxCopies, raise_error(concat(
        lit(s"expandCopies: $copiesCol="), c.cast("string"),
        lit(s" exceeds maxCopies=$maxCopies — corrupted manifest, or pass" +
          " a higher cap"))).cast("long"))
      .otherwise(c)
    df.filter(c.isNotNull && c > 0)
      .withColumn("copy_idx", explode(sequence(lit(1L), bounded)))
      .withColumn("shuffle_key", hashBucket(
        concat_ws(":", col(keyCol).cast("string"),
          col("copy_idx").cast("string")), 1000000000L))
  }

  /** Per-domain quality gate: keep each group's top `ceil(fraction ×
    * group size)` rows by `scoreCol` (key tiebreak) — quality filtering
    * RELATIVE to the domain, so one global threshold can't silently
    * delete an entire domain whose score distribution sits lower (the
    * failure mode of thresholding a web-calibrated quality score over
    * code or non-English text). Adds `dom_rank` (1-based rank within
    * the group, best first).
    *
    * Rows with a null, NaN, or infinite score — or a null key — are
    * dropped (no deterministic rank; same contract as
    * [[weightedSample]]'s null weights). Non-finite scores must go: one
    * NaN would poison the group's max and with it EVERY row's bin
    * expression — a whole-group crash under ANSI, a whole-group silent
    * drop without it. Ties rank by key ascending, so the kept set is
    * engine-reproducible.
    *
    * Scale shape: per-group min/max/count is a tiny broadcast; ranks
    * come from [[binnedCumsum]] over score-proportional bins — never a
    * whole-group window. Degenerate distributions (every score equal)
    * collapse to one bin and degrade to the per-group window gracefully
    * (correct, just unparallel — real quality scores are continuous).
    */
  def keepTopByGroup(df: DataFrame, groupCol: String, keyCol: String,
                     scoreCol: String, fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1,
      s"keepTopByGroup fraction must be in (0, 1], got $fraction")
    requireFresh(df, "keepTopByGroup", Seq("dom_rank"))
    val s = col(scoreCol).cast("double")
    // finite scores only: a single NaN would rank greatest, so __hi = NaN
    // and the bin expression below goes NaN for the ENTIRE group — a
    // group-wide cast crash under ANSI, a group-wide silent join-miss
    // (every row deleted) without it; ±Inf makes (hi - lo) infinite and
    // every bin 0 or NaN the same way
    val ranked = df.filter(col(keyCol).isNotNull && s.isNotNull &&
      !isnan(s) && abs(s) <= lit(Double.MaxValue))
    val stats = ranked
      .groupBy(col(groupCol))
      .agg(min(s).as("__lo"), max(s).as("__hi"),
        count(lit(1)).as("__cnt"))
      .withColumn("__budget",
        ceil(lit(fraction) * col("__cnt")).cast("long"))
      .drop("__cnt")
    // bin 0 = best scores; floor of a monotone double map keeps bin
    // order consistent with (score desc) — equal scores share a bin, so
    // the within-bin (score desc, key) window settles every tie
    val base = ranked
      .join(broadcast(stats), Seq(groupCol))
      .withColumn("__bin",
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(floor((col("__hi") - s) / (col("__hi") - col("__lo"))
            * (prefixBins - 1)).cast("long")))
      .withColumn("__w", lit(1L))
    binnedCumsum(base, groupCol, Seq(s.desc, col(keyCol)))
      .filter(col("__cum") <= col("__budget"))
      .withColumn("dom_rank", col("__cum"))
      .drop(prefixScratch: _*)
  }

  /** Corpus vocabulary: lowercased whitespace tokens ranked by frequency
    * (count desc, token tiebreak), top `k`. The per-token count is a
    * map-side-combined hash aggregate and the top-k is orderBy+limit
    * (TakeOrderedAndProject) — no global sort, no global window.
    */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .select(lower(col("tok")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Corpus bigram statistics — vocab's n-gram sibling (language-model
    * count tables, tokenizer-merge candidates): adjacent lowercased token
    * pairs ranked by frequency, top `k`. The pairing is built INSIDE each
    * document's token array (`zip_with` of the array against its own
    * 1-shifted slice) so no window, no self-join, and nothing shuffles
    * until the 2-word-string counts — same one-aggregate shape as
    * [[topTokens]]. Documents with <2 tokens contribute nothing.
    */
  /** Adjacent-pair structs `(p = first token, b = "first second")` over a
    * lowercased token array — THE bigram definition, shared by
    * [[topBigrams]] and [[lmScore]] so the q67 count table and the q70 LM
    * scores can never desynchronize on tokenization or pair shape.
    */
  private def adjacentPairs(toks: Column): Column = {
    val m = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => struct(a.as("p"), concat_ws(" ", a, b).as("b")))
  }

  def topBigrams(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val toks = transform(TextAnalysis.tokens(col(textCol)), t => lower(t))
    df.select(explode(adjacentPairs(toks)).as("__s"))
      .select(col("__s.b").as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(k)
  }

  /** n-gram LM quality scoring (the CCNet/KenLM-style filter: score each
    * document by how typical its bigrams are of the corpus, keep/weight by
    * score). Per document: mean over its bigrams of the add-one-smoothed
    * conditional probability `(count(bigram)+1) / (count(prefix)+V)`,
    * V = vocabulary size. Deliberately NO logarithms: `ln` is libm-specific
    * and breaks bit-identical cross-engine verification, while one integer
    * add, one IEEE divide and an in-order fold over the sorted ratio list
    * are exact everywhere — the mean of smoothed probabilities ranks
    * documents the same way a mean log-prob does for filtering purposes.
    *
    * Shape: one pass builds the unigram/bigram count tables (hash aggs),
    * the document's bigrams join back to both (shuffle joins on the gram
    * string — the LM tables are vocab-bounded, far smaller than the
    * corpus), and the per-doc mean folds the SORTED ratio list so the
    * double sum is independent of row arrival order. Documents with <2
    * tokens have no bigrams and drop out (filter them upstream or treat
    * absence as unscorable). At extreme vocab, join on an 8-byte gram hash
    * instead of the string (the [[decontaminate]] trick) and accept the
    * collision-merge noise.
    *
    * The persisted token frame lives until the session drops it (the same
    * lifetime contract as the Dedup/MinHash cached frames): when scoring
    * many corpora in one long-lived session, `spark.catalog.clearCache()`
    * between corpora or persist the scored output and release upstream.
    */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // three consumers walk the scan+tokenize lineage (bigram counts,
    // unigram counts, the scoring join) — persist the token frame so the
    // corpus is scanned and tokenized once, not once per consumer (the
    // same multi-consumer rule as the MinHash band table / IVF build
    // base); the downstream explodes re-run from the cached arrays, which
    // is CPU-cheap next to a corpus re-scan
    val toks = df.select(col(idCol),
      transform(TextAnalysis.tokens(col(textCol)), t => lower(t)).as("__l"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = toks.select(col(idCol),
      explode(adjacentPairs(col("__l"))).as("__s"))
      .select(col(idCol), col("__s.p").as("__prefix"), col("__s.b").as("__bigram"))
    val ucnt = toks.select(explode(col("__l")).as("__prefix"))
      .groupBy(col("__prefix")).agg(count(lit(1)).as("__uc"))
    val v = ucnt.agg(count(lit(1)).as("__nv"))
    val bcnt = pairs.groupBy(col("__bigram")).agg(count(lit(1)).as("__bc"))
    pairs.join(bcnt, "__bigram").join(ucnt, "__prefix")
      .crossJoin(broadcast(v))
      .withColumn("__r",
        (col("__bc") + 1).cast("double") / (col("__uc") + col("__nv")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (Folds.sortedSum(col("__r")) / count(lit(1))).as("lm_score"))
  }

  // --- incremental LM statistics (persisted unigram/bigram counts) ---
  //
  // The count tables behind [[lmScore]] are ADDITIVE: counts from two
  // disjoint corpus slices sum to the counts of their union, exactly.
  // That makes the LM index the cheapest member of the incremental
  // family — an append writes the BATCH's own count rows and reads no
  // history at all (not even ids; contrast the dedup indexes' anti-join).
  // Merging is deferred to read time as a sum-merge over segments, and
  // [[compactLmStats]] restores the one-row-per-gram form — the LSM
  // pattern: O(batch vocab) writes, O(segments) read overhead, compaction
  // on your schedule. At 100 TB the history corpus is never re-tokenized;
  // the only thing that grows with appends is segment count, which
  // compaction resets.

  private def lmTokens(df: DataFrame, idCol: String, textCol: String) =
    df.select(col(idCol),
      transform(TextAnalysis.tokens(col(textCol)), t => lower(t)).as("__l"))

  /** The batch's own (gram, count) segments, written under `path` —
    * shared by save and append. One persisted tokenize pass feeds both
    * tables (the lmScore multi-consumer rule). */
  private def writeLmSegments(batch: DataFrame, path: String, idCol: String,
                              textCol: String, mode: String): Unit = {
    val toks = lmTokens(batch, idCol, textCol)
    // ONE corpus-sized aggregation serves both tables (r15, the q93
    // watch item's structural half: the two-job spelling tokenized and
    // shuffled the corpus once PER table; the tagged union shuffles it
    // once, and the two table writes then re-read only the aggregated
    // gram counts — gram-vocabulary-sized, not corpus-sized)
    val grams = toks.select(explode(col("__l")).as("g"), lit("u").as("k"))
      .unionAll(toks
        .select(explode(adjacentPairs(col("__l"))).as("__s"))
        .select(col("__s.b").as("g"), lit("b").as("k")))
      .groupBy(col("g"), col("k")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      grams.filter(col("k") === "u")
        .select(col("g").as("tok"), col("c"))
        .write.mode(mode).parquet(s"$path/unigrams")
      grams.filter(col("k") === "b")
        .select(col("g").as("bigram"), col("c"))
        .write.mode(mode).parquet(s"$path/bigrams")
    } finally { grams.unpersist(blocking = false); () }
  }

  /** Build a persisted LM-stats index from a history corpus. */
  def saveLmStats(hist: DataFrame, path: String, idCol: String,
                  textCol: String): Unit = {
    writeLmSegments(hist, path, idCol, textCol, "overwrite")
    Ledger.init(hist.sparkSession, s"$path/batches")
  }

  /** Append one batch's counts under an EXPLICIT batch id. Counts are not
    * idempotent by value (appending the same rows twice doubles them —
    * unlike the id-keyed dedup indexes, nothing downstream can tell), so
    * replay safety is the shared [[Ledger]]: a batch id already recorded
    * is skipped wholesale. Returns false for the skip.
    *
    * CRASH SAFETY (ADVICE r7): the unigram and bigram tables are two
    * payloads, so a naive two-append could die between them leaving a
    * torn index whose retry double-counts unigrams. Both tables are
    * therefore STAGED under a batch-id-named directory first, then
    * promoted file-by-file under DETERMINISTIC batch-tagged names —
    * and every attempt begins by deleting any `batch_<id>_*` files a
    * previously crashed promotion left in the live tables. Net effect:
    * a retry of any crash point converges to exactly-one application of
    * the batch, and the ledger record (written last) closes the replay
    * window entirely.
    */
  def appendLmStats(batch: DataFrame, path: String, idCol: String,
                    textCol: String, batchId: String): Boolean =
    // the shared crash-idempotent commit discipline (r12: the HH and
    // histogram appends had re-implemented "mode append + record" and
    // were NOT retry-safe; the pattern now lives once in Ledger)
    Ledger.guardedSegmentAppend(batch.sparkSession, path, batchId,
      Seq("unigrams" -> s"$path/unigrams", "bigrams" -> s"$path/bigrams")) {
      staging =>
        writeLmSegments(batch, staging, idCol, textCol, "overwrite")
    }

  /** Sum-merge the appended segments back to one row per gram (staged
    * write + swap, like the index compactions; quiesce writers first).
    * Read results are IDENTICAL before and after — addition is the merge.
    */
  def compactLmStats(spark: org.apache.spark.sql.SparkSession,
                     path: String): Unit = {
    // a crashed append's unrecorded batch files must not be folded:
    // the fold would merge its counts AND destroy the tagged markers
    // the retry's pre-delete keys on — the retry then double-applies
    Ledger.requireNoPendingAppends(spark, path,
      Seq(s"$path/unigrams", s"$path/bigrams"))
    Seq("unigrams" -> "tok", "bigrams" -> "bigram").foreach {
      case (table, key) =>
        val live = s"$path/$table"
        Lifecycle.stagedSwap(spark, live) { staged =>
          spark.read.parquet(live)
            .groupBy(col(key)).agg(sum(col("c")).as("c"))
            .coalesce(1).write.mode("overwrite").parquet(staged)
        }
    }
    // the ledger accumulates one file per append; fold it on the same
    // schedule (rows preserved — replay protection is not weakened)
    Ledger.compact(spark, s"$path/batches")
  }

  /** Score documents against the PERSISTED stats — [[lmScore]]'s exact
    * arithmetic ((bc+1)/(uc+V), sorted-fold mean) with counts sum-merged
    * from the index segments instead of recomputed from a corpus scan.
    * Grams the index never saw smooth to bc=0 / uc=0 (left joins), so
    * out-of-corpus documents score without error. When the index covers
    * exactly the corpus, results are bit-identical to the one-shot
    * [[lmScore]] over it.
    */
  def lmScoreAgainstStats(docs: DataFrame, path: String, idCol: String,
                          textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val ucnt = spark.read.parquet(s"$path/unigrams")
      .groupBy(col("tok").as("__prefix")).agg(sum(col("c")).as("__uc"))
    val bcnt = spark.read.parquet(s"$path/bigrams")
      .groupBy(col("bigram").as("__bigram")).agg(sum(col("c")).as("__bc"))
    val v = ucnt.agg(count(lit(1)).as("__nv"))
    val pairs = lmTokens(docs, idCol, textCol)
      .select(col(idCol), explode(adjacentPairs(col("__l"))).as("__s"))
      .select(col(idCol), col("__s.p").as("__prefix"), col("__s.b").as("__bigram"))
    pairs.join(bcnt, Seq("__bigram"), "left")
      .join(ucnt, Seq("__prefix"), "left")
      .crossJoin(broadcast(v))
      .withColumn("__r",
        (coalesce(col("__bc"), lit(0L)) + 1).cast("double") /
          (coalesce(col("__uc"), lit(0L)) + col("__nv")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (Folds.sortedSum(col("__r")) / count(lit(1))).as("lm_score"))
  }

  /** Decontamination: drop every document sharing ANY word n-gram with the
    * probe set (the standard "remove benchmark/test-set text from training
    * data" step; n = 8–13 in practice — lower n is aggressive). Probe
    * copies inside the corpus remove themselves by construction.
    *
    * Scale shape: both sides explode to 8-byte n-gram HASHES (never gram
    * strings), the probe gram set deduplicates before the join (its size
    * is bounded by the benchmark suite, not the corpus), and the
    * membership test is a semi-join on the hash — so the corpus is
    * scanned once and the shuffle carries (id, hash) pairs. A 64-bit
    * collision falsely dropping a clean doc is ~2⁻⁶⁴ per doc-gram pair —
    * the standard trade; collisions can only OVER-drop, never leak
    * contamination through.
    *
    * Null contract: rows with a NULL id are DROPPED at the edge.
    * Contamination verdicts are id-keyed, and the removal anti-join can
    * never match a null id — a CONTAMINATED null-id doc would otherwise
    * leak straight through the gate. Dropping is the conservative
    * direction for a safety gate: what it cannot track, it does not pass.
    */
  def decontaminate(docs0: DataFrame, probes: DataFrame, idCol: String,
                    textCol: String, n: Int = 8): DataFrame = {
    val docs = docs0.filter(col(idCol).isNotNull)
    val docGrams = docs.select(col(idCol),
        explode(graft.functions.HashFunctions.ngramHashes(
          TextAnalysis.tokens(col(textCol)), n)).as("g"))
    val probeGrams = probes.select(
        explode(graft.functions.HashFunctions.ngramHashes(
          TextAnalysis.tokens(col(textCol)), n)).as("g"))
      .distinct()
    val contaminated = docGrams.join(probeGrams, Seq("g"), "left_semi")
      .select(col(idCol)).distinct()
    docs.join(contaminated, Seq(idCol), "left_anti")
  }

  /** The audit face of [[decontaminate]]: instead of silently dropping
    * contaminated documents, report WHICH probe leaked into WHICH
    * document and how strongly — one row per (document, probe) pair
    * sharing at least one word n-gram, with `shared_grams` = the count
    * of distinct shared grams. This is the artifact a release review
    * actually reads: "benchmark item 17 appears verbatim in 212 crawl
    * documents" is actionable; a silently smaller corpus is not.
    * Probes that are themselves corpus rows self-report (full gram
    * count) — the q38 self-removal property, made visible.
    *
    * Output columns: `idCol`, `probe_id`, `shared_grams`. Same hash
    * family and gram length as [[decontaminate]], so
    * `report.select(idCol).distinct` is exactly the set decontaminate
    * drops. Scale shape: both sides explode to 8-byte hashes, the probe
    * side is benchmark-suite-bounded (AQE broadcasts it), the output is
    * bounded by actual contamination — never a cross join. Counts of
    * shared HASHES equal counts of shared grams except under a 64-bit
    * collision between two grams of the same document pair (~2⁻⁶⁴ per
    * gram pair — the same trade [[decontaminate]] documents).
    */
  def contaminationReport(docs: DataFrame, probes: DataFrame,
                          idCol: String, probeIdCol: String,
                          textCol: String, n: Int = 8): DataFrame = {
    require(idCol != "probe_id",
      "contaminationReport emits the probe key as 'probe_id' — rename " +
        "the document id column away from that")
    val docGrams = docs.select(col(idCol),
      explode(graft.functions.HashFunctions.ngramHashes(
        TextAnalysis.tokens(col(textCol)), n)).as("__g"))
    val probeGrams = probes.select(col(probeIdCol).as("probe_id"),
      explode(graft.functions.HashFunctions.ngramHashes(
        TextAnalysis.tokens(col(textCol)), n)).as("__g"))
    docGrams.join(probeGrams, Seq("__g"))
      .groupBy(col(idCol), col("probe_id"))
      .agg(count(lit(1)).as("shared_grams"))
  }

  /** Persist the probe set's distinct n-gram hashes — the
    * decontamination screen as an ARTIFACT: benchmark suites change on
    * releases, corpora stream daily, so the probe side is tokenized once
    * per suite release and every later batch joins against the saved
    * 8-byte hash set without touching probe text again. `n` is pinned in
    * meta so the probe and document gram lengths can never diverge
    * (mismatched n silently screens nothing — hashes of different-length
    * grams don't collide usefully).
    */
  def saveProbeGrams(probes: DataFrame, path: String, textCol: String,
                     n: Int = 8): Unit = {
    val spark = probes.sparkSession
    import spark.implicits._
    Seq(n).toDF("n").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/meta")
    probes.select(
        explode(graft.functions.HashFunctions.ngramHashes(
          TextAnalysis.tokens(col(textCol)), n)).as("g"))
      .distinct()
      .write.mode("overwrite").parquet(s"$path/grams")
  }

  /** [[decontaminate]] against a persisted probe-gram index: identical
    * contamination decisions (same hash family, `n` from the index
    * meta), with the probe side a pruned parquet read instead of a
    * tokenize pass. The gram set's size is bounded by the benchmark
    * suite, so at scale it broadcast-joins; the corpus is scanned once.
    * Same null contract as [[decontaminate]]: null-id docs are dropped.
    */
  def decontaminateAgainstIndex(docs0: DataFrame, path: String,
                                idCol: String, textCol: String): DataFrame = {
    val docs = docs0.filter(col(idCol).isNotNull)
    val spark = docs.sparkSession
    val n = spark.read.parquet(s"$path/meta").head().getInt(0)
    val docGrams = docs.select(col(idCol),
        explode(graft.functions.HashFunctions.ngramHashes(
          TextAnalysis.tokens(col(textCol)), n)).as("g"))
    val contaminated = docGrams
      .join(spark.read.parquet(s"$path/grams"), Seq("g"), "left_semi")
      .select(col(idCol)).distinct()
    docs.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Top-`k` TF-IDF terms per document, with a RATIONAL idf —
    * `tf × (N+1)/(df+1)` instead of the textbook `tf × ln((N+1)/(df+1))`:
    * log implementations are not guaranteed correctly-rounded across
    * engines, while integer multiply + one IEEE double division is
    * bit-reproducible anywhere. Rational idf is a monotone transform of
    * the log form per term, so each TERM's ranking across documents is
    * unchanged; cross-term comparisons weight rarity more aggressively —
    * fine for keyword extraction, and exactly checkable by any oracle.
    *
    * Terms are lowercased whitespace tokens. Plan: one explode → (doc,
    * term) hash-agg for tf → term hash-agg for df (map-side combined) →
    * shuffle join on term → per-doc top-k window (partitioned by doc,
    * never global).
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int, docCount: Long): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .select(col(idCol), lower(col("t")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term"))
      .withColumn("score",
        (col("tf") * (docCount + 1)).cast("double") / (col("df") + 1))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"),
        col("score"))
  }

  /** Overlapping token-window chunking: windows of `size` tokens starting
    * every `stride` tokens (the standard pre-training context-packing
    * split). Emits (chunk_idx, chunk token count, chunk text) per window;
    * documents with no tokens emit no chunks. One pass, no shuffle — the
    * explode happens where the document already lives.
    *
    * EVERY token lands in at least one chunk: when the last full window
    * ends before token n, one extra stride-aligned clipped chunk covers the
    * tail (e.g. 110 tokens at size=64/stride=48 → chunks at 1 and 49, the
    * second clipped to 62 tokens). Silently dropping the tail would be
    * data loss for a pre-training split. No redundant trailing windows:
    * the sequence stops at the FIRST stride-aligned start whose window
    * reaches token n.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            size: Int, stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1)
    val toks = TextAnalysis.tokens(col(textCol))
    val n = org.apache.spark.sql.functions.size(toks)
    // last start = 1 + ceil((n - size) / stride) * stride when n > size
    // (the smallest stride-grid start s with s + size - 1 >= n), else 1.
    // CLAMPED to n (r12): with stride > size the grid formula can land
    // past the token array, emitting a degenerate trailing chunk with
    // empty text and zero/negative n_tokens — stride > size is a legal
    // gapped-sampling config, the phantom chunk is not.
    val lastStart = when(n <= size, lit(1))
      .otherwise(least(
        floor((n - size + (stride - 1)) / lit(stride)).cast("int")
          * stride + 1,
        n))
    val starts = sequence(lit(1), lastStart, lit(stride))
    // the token count is known from the slice bounds — don't re-tokenize
    // the joined chunk string just to count what was counted already
    val chunks = when(n > 0,
      transform(starts, s => struct(
        concat_ws(" ", slice(toks, s, lit(size))).as("chunk_text"),
        least(lit(size), n - s + 1).as("n_tokens"))))
      .otherwise(array().cast("array<struct<chunk_text:string,n_tokens:int>>"))
    df.select(col(idCol), posexplode(chunks).as(Seq("chunk_idx", "c")))
      .select(col(idCol), col("chunk_idx"), col("c.n_tokens").as("n_tokens"),
        col("c.chunk_text").as("chunk_text"))
  }

  /** Line-level boilerplate removal (the CCNet/RefinedWeb cleaning
    * step): a non-empty line whose EXACT text appears in at least
    * `minDocs` distinct documents is boilerplate — headers, nav bars,
    * cookie banners, footers — and is dropped from every document;
    * survivors reassemble in original line order (documents stripped
    * to nothing keep an empty string, never vanish). Empty/whitespace
    * lines are never boilerplate candidates (blank separators carry
    * layout, not template noise) and always survive.
    *
    * Scale shape: one explode, one line-keyed countDistinct whose
    * partial aggregation collapses each boilerplate line to a row per
    * partition BEFORE the shuffle (boilerplate is by definition the
    * high-frequency tail — exactly what map-side combine eats), one
    * anti-join, one per-doc regroup. Exact line matching keeps the
    * operator oracle-portable; normalize upstream (trim, casefold) if
    * the corpus needs fuzzy template matching.
    */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                       minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val boiler = lines
      .filter(trim(col("line")) =!= "")
      .groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select(col("line"))
    val kept = lines.join(boiler, Seq("line"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x("line"))).as("__kept"))
    // the full row survives (r12): projecting down to (id, text) forced
    // every mid-pipeline caller to re-join its metadata columns back;
    // siblings (outliers, sampleByHash, packSequences) all preserve the
    // input row, and the cost is identical — the join key is the same
    docs.drop(textCol)
      .join(kept, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("__kept"), lit("")))
      .drop("__kept")
  }
}
