package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Data-profiling operators — the "what is in this table" pass a pipeline
  * runs before committing a 100 TB job to it: per-column summary stats,
  * value histograms, and statistical outlier detection. All single-scan
  * shapes: the profile is one aggregate over the table, the histogram is
  * one aggregate after a one-row min/max broadcast, outliers are one
  * aggregate plus a broadcast join of per-group moments. Nothing here
  * sorts globally or collects to the driver.
  */
object Profiling {

  /** Per-column profile in one scan: row count, null count, exact distinct
    * count, and numeric min/max (null for non-numeric columns). Output is
    * long-form — one row per profiled column — which keeps the schema
    * fixed no matter how many columns are profiled.
    *
    * Scale notes: the N exact `count_distinct`s in one aggregate plan as a
    * single pass over an Expand (each input row fans out once per distinct
    * aggregate) — one scan, ~N× shuffle volume. That is the right default
    * for correctness-gated profiling; at extreme width or cardinality flip
    * `approxDistinct=true` to use HLL++ (`approx_count_distinct`) and the
    * Expand disappears into plain partial aggregation.
    */
  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    // internal agg columns are INDEXED, not name-derived (the
    // checkConstraints rule, applied here too): a user column with a
    // dot would otherwise make the later col("__cnt_price.usd") parse
    // as struct access and fail to resolve; indexing also keeps
    // duplicate entries in `cols` unambiguous
    // backtick-quoted input references: col()/df() both PARSE the name,
    // so an unquoted dot reads as struct-field access
    def in(c: String) = df(s"`${c.replace("`", "``")}`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      val nd = if (approxDistinct) approx_count_distinct(in(c))
               else count_distinct(in(c))
      Seq(
        count(in(c)).as(s"__cnt_$i"),
        nd.as(s"__nd_$i"),
        (if (isNum) min(in(c)).cast("double")
         else lit(null).cast("double")).as(s"__min_$i"),
        (if (isNum) max(in(c)).cast("double")
         else lit(null).cast("double")).as(s"__max_$i"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$i")).as("n_nulls"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__min_$i").as("min_value"),
        col(s"__max_$i").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Equi-width histogram of a numeric column: `bins` buckets spanning
    * [min, max], the max itself clamped into the last bucket. Bounds come
    * from an in-plan one-row aggregate broadcast (no driver round trip),
    * so the full shape is scan → 1-row agg → broadcast → scan → hash agg.
    * Empty bins are absent from the output (a 100 TB-safe choice — the
    * dense form is a `bins`-row spine join away if a UI needs it).
    *
    * Bucketing arithmetic is double IEEE in a fixed operation order
    * (`(x - lo) / ((hi - lo) / bins)`), so any engine computing the same
    * order reproduces the exact bucket decisions bit-for-bit. A
    * single-valued column (hi == lo) degenerates to one bucket 0.
    */
  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins >= 1, // bins=0: null width → every row in bin_id=-1
      s"bins must be positive, got $bins")
    // nulls are excluded EXPLICITLY: floor((null-lo)/w) is null and
    // least() SKIPS null operands, so unfiltered null values would
    // silently count into the LAST bin (phantom top-bin rows). Same
    // stance as the incremental histSegment.
    val nn = df.filter(col(valueCol).isNotNull)
    val mm = nn.agg(min(col(valueCol)).cast("double").as("__lo"),
                    max(col(valueCol)).cast("double").as("__hi"))
    val w = (col("__hi") - col("__lo")) / bins
    val bin = when(col("__hi") === col("__lo"), lit(0L)).otherwise(
      least(floor((col(valueCol).cast("double") - col("__lo")) / w).cast("long"),
            lit(bins - 1L)))
    nn.crossJoin(broadcast(mm))
      .withColumn("bin_id", bin)
      .groupBy(col("bin_id"), col("__lo"), col("__hi"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo", col("__lo") + col("bin_id") * ((col("__hi") - col("__lo")) / bins))
      .withColumn("bin_hi", col("__lo") + (col("bin_id") + 1) * ((col("__hi") - col("__lo")) / bins))
      .select(col("bin_id"), col("bin_lo"), col("bin_hi"), col("n"))
  }

  /** Per-group statistical outliers: rows whose value lies more than
    * `sigmas` sample standard deviations from their group's mean. The
    * moments are computed from DECIMAL-exact sums (`sum(x)`, `sum(x²)` —
    * partition-order-independent, unlike float sums), converted to double
    * at a fixed point, so mean/variance/z are bit-reproducible across
    * engines and cluster layouts. One scan for moments (tiny result,
    * broadcast), one scan for the filter. Groups with fewer than 2 rows
    * or zero variance yield no outliers.
    */
  def outliers(df: DataFrame, groupCol: String, valueCol: String,
               sigmas: Double): DataFrame = {
    val v = col(valueCol).cast("double")
    val stats = df.groupBy(col(groupCol))
      .agg(count(v).as("__gn"), // null values join neither count nor sums
           sum(v.cast("decimal(25,6)")).cast("double").as("__s1"),
           sum((v * v).cast("decimal(30,6)")).cast("double").as("__s2"))
      // OVERFLOW GUARD: decimal(30,6) holds 24 integer digits, so x²
      // overflows (→ null under non-ANSI) for |x| ≳ 1e12 — the nulls
      // would drop out of sum() while still counting in __gn, silently
      // zeroing or corrupting the variance. assert_true turns that into
      // a loud in-plan failure, WRAPPED INTO the kept __mean column (a
      // standalone guard column would be pruned away with the guard);
      // it evaluates per GROUP row — free. Decimal widths stay
      // oracle-mirrored (q50); scale such columns before profiling.
      .withColumn("__mean", when(
        assert_true(
          col("__gn") === 0 ||
            (col("__s1").isNotNull && col("__s2").isNotNull),
          lit("outliers: decimal-exact moment sums overflowed — " +
            "|value| too large for decimal(30,6) squares (~1e12 " +
            "bound); scale the column first")).isNull,
        col("__s1") / col("__gn")))
      .withColumn("__var",
        (col("__s2") - col("__s1") * col("__s1") / col("__gn")) / (col("__gn") - 1))
      .select(col(groupCol), col("__gn"), col("__mean"), col("__var"))
    df.join(broadcast(stats), Seq(groupCol))
      .filter(col("__gn") >= 2 && col("__var") > 0)
      .withColumn("z", (v - col("__mean")) / sqrt(col("__var")))
      .filter(abs(col("z")) > sigmas)
      .drop("__gn", "__mean", "__var")
  }

  /** Per-group winsorized (clipped) mean — the robust-stats companion to
    * [[outliers]]: values below the group's `loPct`-th / above the
    * `hiPct`-th percentile clamp to those bounds before averaging, so a
    * handful of wild rows can't drag the group mean (the standard
    * robust-aggregation step before training-mixture weighting).
    *
    * Percentiles are NEAREST-RANK (the value at rank `ceil(n·p/100)` under
    * (value, tiebreak) order), NOT interpolated: the bounds are actual data
    * values, and the rank arithmetic is pure integers
    * (`(n·pct + 99) div 100`), so there is no float interpolation for
    * engines to disagree over. The clamped mean follows the repo's decimal
    * discipline — exact decimal sum, ONE double division at the end.
    *
    * Shape: rank window + count PARTITIONED by the group (never global),
    * bounds fall out of one conditional aggregate (tiny — one row per
    * group, broadcast back), clamp + mean is a second hash aggregate over
    * one more scan. Null values are excluded up front (engines disagree on
    * null sort position, and a null can't be clamped meaningfully).
    */
  def winsorizedStats(df: DataFrame, groupCol: String, valueCol: String,
                      tieBreakCol: String, loPct: Int, hiPct: Int): DataFrame = {
    require(0 <= loPct && loPct <= hiPct && hiPct <= 100,
      s"need 0 <= loPct <= hiPct <= 100, got ($loPct, $hiPct)")
    val v = col(valueCol)
    val nonNull = df.filter(v.isNotNull)
    val wRank = Window.partitionBy(col(groupCol)).orderBy(v, col(tieBreakCol))
    val wAll = Window.partitionBy(col(groupCol))
    val rank = (pct: Int) => greatest(
      floor((col("__n") * pct + 99) / 100).cast("long"), lit(1L))
    val bounds = nonNull
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(wAll))
      .groupBy(col(groupCol))
      .agg(min(when(col("__rn") === rank(loPct), v)).as("__lo"),
           min(when(col("__rn") === rank(hiPct), v)).as("__hi"))
    val clamped = least(greatest(v, col("__lo")), col("__hi"))
    nonNull.join(broadcast(bounds), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        first(col("__lo")).as("lo_bound"),
        first(col("__hi")).as("hi_bound"),
        (sum(clamped.cast("decimal(25,6)")).cast("double") / count(lit(1)))
          .as("winsorized_mean"))
  }

  /** Key-skew profile — the diagnostic to run BEFORE committing a 100 TB
    * shuffle on a key: per-key counts reduced to one row of concentration
    * stats (row/key totals, the hottest key's share, the top-`topK` keys'
    * combined share). max_share near 1 means one reducer owns the stage —
    * reach for [[graft.operators.Skew.saltedJoin]] or AQE skew-split;
    * topk_share near n_rows/n_keys·topK means it's flat.
    *
    * Shape: one hash aggregate (map-side combined) to per-key counts; the
    * two tiny consumers (global totals, top-k sum via
    * orderBy+limit = TakeOrderedAndProject) share the aggregate's exchange
    * (ReuseExchange — identical subtree), then a 1-row × 1-row broadcast
    * cross join. Shares are single double divisions of exact longs.
    */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, "keySkew requires topK >= 1")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
    val totals = counts.agg(
      sum(col("__c")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("__c")).as("max_count"))
    val top = counts.orderBy(col("__c").desc, col(keyCol)).limit(topK)
      .agg(sum(col("__c")).as("topk_count"))
    totals.crossJoin(broadcast(top))
      .withColumn("max_share",
        col("max_count").cast("double") / col("n_rows"))
      .withColumn("topk_share",
        col("topk_count").cast("double") / col("n_rows"))
      .select(col("n_rows"), col("n_keys"), col("max_count"),
        col("max_share"), col("topk_count"), col("topk_share"))
  }

  /** Declarative data-quality validation (the expectations report — the
    * batch-admission sibling of [[graft.operators.Filters.validate]]-style
    * quarantining): evaluate every named rule predicate over the frame in
    * ONE scan and report per rule how many rows violate it. A NULL
    * predicate result counts as a violation (a rule that cannot be proven
    * holds is failed, the conservative gate for admission checks); an
    * empty frame reports 0 violations, not null.
    *
    * All rules ride a single aggregate (one pass, map-side combined, no
    * shuffle beyond the 1-row final merge), then unpivot to one row per
    * rule. Internal agg columns are indexed, not name-derived, so rule
    * names are free text (dots, backticks, anything). Rules are scalar
    * predicates over the row; referential checks are a join, not a scan
    * — use [[graft.operators.Joins.referentialSplit]] and count its
    * orphans alongside. For the declarative rule vocabulary (typed
    * not-null/range/set/regex plus Unique and FkExists, with CHECK
    * null semantics and a SQL face) see [[Validation]] — this stays
    * the raw predicate counter underneath.
    */
  def checkConstraints(df: DataFrame,
                       rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkConstraints requires at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "checkConstraints rule names must be distinct")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case ((_, pred), i) =>
        coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)),
          lit(0L)).as(s"__v_$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col("__n").as("n_rows"),
        col(s"__v_$i").as("n_violations"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Heavy hitters via the Misra–Gries sketch
    * ([[graft.functions.MisraGries]]): frequent values of a column from
    * k-bounded per-partition state — the approximate fallback for when the
    * exact per-key count table is itself too large to shuffle (the exact
    * path is [[keySkew]]/plain groupBy). Estimates are undercounts by at
    * most n/(capacity+1); with true cardinality <= capacity they are
    * exact. Returns (item, n) ordered by count desc, item tiebreak.
    */
  def heavyHitters(df: DataFrame, column: String, capacity: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(column).cast("string")).as[String]
      .select(new graft.functions.MisraGries(capacity).toColumn.name("__m"))
      .select(explode(col("__m")).as(Seq("item", "n")))
      .orderBy(col("n").desc, col("item"))
  }

  // --- incremental heavy hitters (persisted Misra–Gries segments) ---
  //
  // The MG sketch is a mergeable summary (Agarwal et al., PODS 2012), so
  // the streaming-history version of [[heavyHitters]] never re-reads
  // history rows: each batch contributes its own <= capacity-row sketch
  // SEGMENT, reads sum the segments pointwise and truncate ONCE to
  // capacity with the (k+1)-th-largest subtraction. One deferred
  // truncation is at least as accurate as the pairwise merge rule (fewer
  // subtractions, same Σnᵢ/(k+1) undercount bound), and when true
  // cardinality <= capacity nothing ever truncates and every merged
  // count is EXACT — the oracle-checkable regime. A batch-id ledger
  // guards replays (a doubled segment silently inflates counts — same
  // hazard class as the LM index).

  private def hhMetaDf(spark: org.apache.spark.sql.SparkSession,
                       path: String) = spark.read.parquet(s"$path/meta")

  /** Build the persisted sketch: meta + the history corpus's segment. */
  def saveHhSketch(df: DataFrame, path: String, column: String,
                   capacity: Int): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    Seq((column, capacity)).toDF("column", "capacity")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    heavyHitters(df, column, capacity)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/segments")
    Ledger.init(spark, s"$path/batches")
  }

  /** [[Ledger]]-guarded append of one batch's sketch segment (column and
    * capacity are pinned by the index meta so batches cannot diverge).
    * Returns false when the batch id was already recorded.
    */
  def appendHhSketch(batch: DataFrame, path: String,
                     batchId: String): Boolean = {
    val spark = batch.sparkSession
    val m = hhMetaDf(spark, path).head()
    // crash-idempotent commit (r12): the old plain mode("append") +
    // record pair double-landed the segment when a crash fell between
    // them — the exact replay the ledger exists to make exactly-once
    Ledger.guardedSegmentAppend(spark, path, batchId,
      Seq("" -> s"$path/segments")) { staging =>
      heavyHitters(batch, m.getString(0), m.getInt(1))
        .coalesce(1).write.mode("overwrite").parquet(staging)
    }
  }

  /** Merged heavy hitters across all segments: pointwise sum, then one
    * capacity truncation, computed ENTIRELY in-plan — the truncation
    * branch and the (k+1)-th-largest delta ride a broadcast 1-row
    * aggregate of the same lazy `summed` frame, so every action sees one
    * consistent snapshot of the segments (an eager driver-side branch
    * decision would bake stale truncation state into a plan whose scan
    * re-reads segments appended later). Only the capacity is read
    * eagerly (one row of meta; `limit` needs a literal). The summed
    * aggregate appears twice in the plan — segment tables are
    * k × appends rows, so the double aggregation is metadata-sized.
    */
  def mergedHeavyHitters(spark: org.apache.spark.sql.SparkSession,
                         path: String): DataFrame = {
    val capacity = hhMetaDf(spark, path).head().getInt(1)
    val summed = spark.read.parquet(s"$path/segments")
      .groupBy(col("item")).agg(sum(col("n")).as("n"))
    // count and min over the top capacity+1 counts: count <= capacity
    // means no overflow (keep n); otherwise min IS the (k+1)-th largest
    val thr = summed.select(col("n")).orderBy(col("n").desc)
      .limit(capacity + 1)
      .agg(count(lit(1)).as("__cnt"), min(col("n")).as("__d"))
    summed.crossJoin(broadcast(thr))
      .withColumn("n", when(col("__cnt") <= capacity, col("n"))
        .otherwise(col("n") - col("__d")))
      .filter(col("n") > 0)
      .select(col("item"), col("n"))
      .orderBy(col("n").desc, col("item"))
  }

  /** Collapse the per-append segment litter to one merged segment
    * (staged write + swap; quiesce writers). [[mergedHeavyHitters]]
    * output is identical before and after: the merged segment is the
    * truncated sum, and truncation is a no-op on <= capacity items.
    *
    * ACCURACY ACROSS COMPACT/APPEND CYCLES (ADVICE r7): when a
    * compaction's sum DID overflow capacity, its truncation is baked
    * into the compacted segment — appends after it merge against
    * already-truncated counts, so each compaction fixes one truncation
    * into the history and repeated compact/append cycles walk the error
    * toward the pairwise-merge bound (one subtraction per cycle, still
    * within Σnᵢ/(k+1) overall). The "one deferred truncation" claim in
    * the section comment holds only between compactions; the EXACT
    * regime (true cardinality <= capacity — nothing ever truncates) is
    * the only one unaffected by compaction frequency. Compact rarely if
    * you live near the capacity boundary.
    */
  def compactHhSketch(spark: org.apache.spark.sql.SparkSession,
                      path: String): Unit = {
    // refuse a crashed append's unrecorded residue — see compactLmStats
    Ledger.requireNoPendingAppends(spark, path, Seq(s"$path/segments"))
    Lifecycle.stagedSwap(spark, s"$path/segments") { staged =>
      mergedHeavyHitters(spark, path)
        .coalesce(1).write.mode("overwrite").parquet(staged)
    }
    Ledger.compact(spark, s"$path/batches")
  }

  // --- incremental histogram index ----------------------------------
  //
  // The EXACT member of the incremental-profiling family (next to the
  // approximate HH sketch): fixed-bounds equi-width bin counts are
  // ADDITIVE, so a persisted index is meta (column, bins, lo, hi) plus
  // per-batch count segments — appends write their own segment and
  // read no history, merges are a pointwise sum, and unlike the
  // sketch there is no accuracy regime to reason about: every number
  // is exact at any compaction frequency. The fixed [lo, hi] is what
  // buys additivity (data-driven bounds would re-bin history on every
  // batch); at 100 TB bounds come from table stats or domain
  // knowledge, and the explicit underflow (−1) / overflow (`bins`)
  // bins make a wrong guess VISIBLE instead of silently folded.

  private def histMetaDf(spark: org.apache.spark.sql.SparkSession,
                         path: String) = spark.read.parquet(s"$path/meta")

  /** The bin id of a value under (lo, hi, bins): −1 below lo, `bins`
    * above hi, else floor((x−lo)/w) clamped so x == hi lands in the
    * last real bin. Fixed double op order (w = (hi−lo)/bins computed
    * in-plan), engine-reproducible; NULLs are excluded by the caller.
    */
  private def histBin(x: Column, lo: Column, hi: Column,
                      bins: Int): Column = {
    val w = (hi - lo) / bins
    when(x < lo, lit(-1L))
      .when(x > hi, lit(bins.toLong))
      .otherwise(least(floor((x - lo) / w).cast("long"),
        lit(bins - 1L)))
  }

  private def histSegment(df: DataFrame, column: String, bins: Int,
                          lo: Double, hi: Double): DataFrame =
    df.select(col(column).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
      .select(histBin(col("__x"), lit(lo), lit(hi), bins).as("bin_id"))
      .groupBy(col("bin_id")).agg(count(lit(1)).as("n"))

  /** Build the persisted histogram index: meta + the history corpus's
    * segment + a fresh applied-batch ledger. */
  def saveHistogramIndex(df: DataFrame, path: String, column: String,
                         bins: Int, lo: Double, hi: Double): Unit = {
    require(bins >= 1 && hi > lo,
      s"need hi > lo and bins >= 1, got [$lo, $hi] / $bins")
    val spark = df.sparkSession
    import spark.implicits._
    Seq((column, bins, lo, hi)).toDF("column", "bins", "lo", "hi")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    histSegment(df, column, bins, lo, hi)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/segments")
    Ledger.init(spark, s"$path/batches")
  }

  /** [[Ledger]]-guarded append of one batch's segment (binning pinned
    * by the index meta). Returns false for a replayed batch id. */
  def appendHistogramIndex(batch: DataFrame, path: String,
                           batchId: String): Boolean = {
    val spark = batch.sparkSession
    val m = histMetaDf(spark, path).head()
    // crash-idempotent commit (r12) — see [[appendHhSketch]]
    Ledger.guardedSegmentAppend(spark, path, batchId,
      Seq("" -> s"$path/segments")) { staging =>
      histSegment(batch, m.getString(0), m.getInt(1), m.getDouble(2),
          m.getDouble(3))
        .coalesce(1).write.mode("overwrite").parquet(staging)
    }
  }

  /** Merged histogram across all segments: pointwise sum plus the bin
    * edges re-derived from meta (`lo + bin·w`, same op order any
    * engine reproduces). Underflow/overflow edges follow the same
    * formula — their ids are the signal, the edges just locate them.
    */
  def mergedHistogramIndex(spark: org.apache.spark.sql.SparkSession,
                           path: String): DataFrame = {
    val m = histMetaDf(spark, path).head()
    val (bins, lo, hi) = (m.getInt(1), m.getDouble(2), m.getDouble(3))
    val w = lit(hi) - lit(lo)
    spark.read.parquet(s"$path/segments")
      .groupBy(col("bin_id")).agg(sum(col("n")).as("n"))
      .withColumn("bin_lo", lit(lo) + col("bin_id") * (w / bins))
      .withColumn("bin_hi", lit(lo) + (col("bin_id") + 1) * (w / bins))
      .select(col("bin_id"), col("bin_lo"), col("bin_hi"), col("n"))
      .orderBy(col("bin_id"))
  }

  /** Collapse segment litter to one summed segment (staged swap;
    * quiesce writers). Lossless at any frequency — the counts are
    * exact sums, nothing truncates. */
  def compactHistogramIndex(spark: org.apache.spark.sql.SparkSession,
                            path: String): Unit = {
    // refuse a crashed append's unrecorded residue — see compactLmStats
    Ledger.requireNoPendingAppends(spark, path, Seq(s"$path/segments"))
    Lifecycle.stagedSwap(spark, s"$path/segments") { staged =>
      spark.read.parquet(s"$path/segments")
        .groupBy(col("bin_id")).agg(sum(col("n")).as("n"))
        .coalesce(1).write.mode("overwrite").parquet(staged)
    }
    Ledger.compact(spark, s"$path/batches")
  }

  /** Quantile segmentation: each row's n-tile (1..n) within its group
    * under a total order — "which value quartile is this event in, among
    * its type". `orderCols` must totally order each group's rows or tile
    * boundaries are nondeterministic; the window is PARTITIONED by the
    * group, never global. ntile's distribution rule (earlier tiles take
    * the remainder rows) is the standard SQL one, identical across
    * engines. Adds `segment`.
    */
  def segments(df: DataFrame, groupCol: String, orderCols: Seq[Column],
               n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
    df.withColumn("segment", ntile(n).over(w))
  }
}
