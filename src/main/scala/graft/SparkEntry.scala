package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.engine.Tables
import graft.operators._
import graft.sources.{Layout, MatView, Scd, SnapshotGroup, TimeTravel}

/** Driver contract — one named query per implemented operator from
  * SURVEY.md §2, each with equivalent DuckDB oracle SQL.
  *
  * The reference's domain roles map onto the driver tables per FIXTURES.md:
  * `nation`/`region` play `Geographic_Area` (dimension point lookup),
  * `orders ⋈ customer` plays `Sale ⋈ Property` (priced dated fact ⋈ dim,
  * `o_orderstatus` plays `status` with active set {'O','P'} standing in for
  * {'Open','Pending','In Progress'}, reference webserver/server.py:172), and
  * `lineitem ⋈ part` plays `Service_Request ⋈ Complaint_Type`.
  */
object SparkEntry {

  // Default analysis window — plays the reference's default 2024 dashboard
  // window (webserver/server.py:392-395) over the driver data's date range.
  private val W0 = "1996-01-01"
  private val W1 = "1996-12-31"
  private val ACTIVE = Seq("O", "P")

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  // Table row counts memoized per sf dir: auto-tuned operators (q23's LSH
  // prefix scaling) need the corpus size at PLAN time; caching keeps plan
  // construction side-effect free after the first call instead of paying a
  // count() job on every rebuild (the bench builds each plan twice).
  private val tableCounts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def cachedCount(s: SparkSession, d: String, name: String): Long =
    tableCounts.computeIfAbsent(s"$d/$name",
      _ => Long.box(t(s, d, name).count())).longValue

  /** `orders ⋈ customer ⋈ nation` restricted to a nation-name key set —
    * the "resolve key once, scan facts once" shape (SURVEY.md §3.1). The
    * nation dim is broadcast; customer joins under AQE's choice.
    */
  private def ordersOf(spark: SparkSession, dir: String, nations: Seq[String],
                       windowed: Boolean): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = broadcast(t(spark, dir, "nation").filter(col("n_name").isin(nations: _*)))
    val fact =
      if (windowed) Filters.dateWindow(o, "o_orderdate", Some(W0), Some(W1)) else o
    fact
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
  }

  private val oracleOrdersOf =
    """FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey""".stripMargin.replace("\n", " ")
  private val oracleWindow =
    "o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'"

  /** Flagship: the analytics-dashboard group-by (reference
    * webserver/server.py:183-200) on sf0.001. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_group_counts")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(

    // S1+F1+J1: dimension natural-key point lookup (server.py:135-144)
    "q01_dim_lookup" -> ((s, d) => {
      Filters.naturalKey(t(s, d, "nation"), Map("n_name" -> "NATION_19"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
    }),

    // S2+F2+F3+P1+O2+O5: windowed fact listing, date-desc, top-10
    // (server.py:203-218 + analytics.html:252)
    "q02_recent_listing" -> ((s, d) => {
      ordersOf(s, d, Seq("NATION_19"), windowed = true)
        .select(col("o_orderkey"), col("c_name"),
          round(col("o_totalprice"), 2).as("price"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy(col("order_date").desc, col("o_orderkey"))
        .limit(10)
    }),

    // A1+A2+F4: global count + conditional active count (server.py:170-180)
    "q03_totals_conditional" -> ((s, d) =>
      Aggregates.totals(ordersOf(s, d, Seq("NATION_19"), windowed = true),
        "o_orderstatus", ACTIVE)),

    // A3+O1: per-group counts, count-desc + name tiebreak (server.py:183-200)
    "q04_group_counts" -> ((s, d) =>
      Aggregates.groupCounts(ordersOf(s, d, Seq("NATION_19"), windowed = true),
        "o_orderpriority", "o_orderstatus", ACTIVE)),

    // A4+A5+A8+A9: exact median/min/max with empty→0 (server.py:221-240)
    "q05_price_stats" -> ((s, d) =>
      Aggregates.priceStats(ordersOf(s, d, Seq("NATION_19"), windowed = true),
        "o_totalprice")),

    // A9 corner: empty input still yields one row of zeros (server.py:237-240)
    "q05b_price_stats_empty" -> ((s, d) =>
      Aggregates.priceStats(
        ordersOf(s, d, Seq("NO SUCH NATION"), windowed = true), "o_totalprice")),

    // A6+C1+C3: calendar-month rollup (server.py:281-289)
    "q06_monthly_counts" -> ((s, d) =>
      TimeSeries.monthly(ordersOf(s, d, Seq("NATION_19"), windowed = true),
        "o_orderdate", Seq(count(lit(1)).as("n")))),

    // J3+C5: month-spine gap fill, zero counts / null medians
    // (server.py:319-341)
    "q07_month_gap_fill" -> ((s, d) => {
      val agg = TimeSeries.monthly(
        ordersOf(s, d, Seq("NATION_19"), windowed = true), "o_orderdate",
        Seq(count(lit(1)).as("n"),
          Aggregates.exactMedianMoney(col("o_totalprice")).as("median_price")))
      TimeSeries.gapFill(TimeSeries.monthSpine(s, W0, W1), agg, Seq("n"))
    }),

    // A7+O4: top-5 + "Other" residual over lineitem ⋈ part brands
    // (server.py:411-419)
    "q08_topk_other" -> ((s, d) => {
      val li = Filters.dateWindow(t(s, d, "lineitem"), "l_shipdate", Some(W0), Some(W1))
      val grouped = li
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("total_count"))
      TopK.topNPlusOther(grouped, "p_brand", 5)
    }),

    // J4: two-key compare in one fact pass (server.py:456-473)
    "q09_compare" -> ((s, d) =>
      Compare.sideBySide(
        ordersOf(s, d, Seq("NATION_19", "NATION_11"), windowed = true),
        "n_name", Seq("NATION_19", "NATION_11"),
        Seq(count(lit(1)).as("total_count"),
          sum(when(col("o_orderstatus").isin(ACTIVE: _*), 1L).otherwise(0L))
            .as("active_count"),
          Aggregates.exactMedianMoney(col("o_totalprice")).as("median_price")))),

    // T2: bookmark fan-out as one IN-list pass, all-time window, unknown
    // keys silently absent (server.py:561-580)
    "q10_bookmarks" -> ((s, d) =>
      Compare.sideBySide(
        ordersOf(s, d, Seq("NATION_10", "NATION_20", "ATLANTIS"), windowed = false),
        "n_name", Seq("NATION_10", "NATION_20", "ATLANTIS"),
        Seq(count(lit(1)).as("total_count"),
          Aggregates.exactMedianMoney(col("o_totalprice")).as("median_price")))),

    // C6+C7+C8: BBL-style fixed-width format + parse round trip
    // (server.py:104-127)
    "q11_key_scalars" -> ((s, d) => {
      val c = t(s, d, "customer")
      val borough = (col("c_nationkey") % 9 + 1).cast("int")
      val block = (col("c_custkey") % 100000).cast("int")
      val lot = ((col("c_custkey") * 7) % 10000).cast("int")
      c.select(col("c_custkey"),
          concat_ws("-", borough, lpad(block.cast("string"), 5, "0"),
            lpad(lot.cast("string"), 4, "0")).as("bbl"),
          concat(borough.cast("string"), lpad(block.cast("string"), 5, "0"),
            lpad(lot.cast("string"), 4, "0")).as("bbl10"))
        .withColumn("p_borough", substring(col("bbl10"), 1, 1).cast("int"))
        .withColumn("p_block", substring(col("bbl10"), 2, 5).cast("int"))
        .withColumn("p_lot", substring(col("bbl10"), 7, 4).cast("int"))
        .orderBy(col("c_custkey"))
    }),

    // F5: check-constraint validation split with violation tagging
    // (schema.sql:31-35,43-44,70-73)
    "q12_validation_split" -> ((s, d) => {
      val checks = Seq(
        "price_pos" -> (col("o_totalprice") > 0),
        "date_bound" -> (col("o_orderdate") <= to_timestamp(lit("2000-12-31"))),
        "status_domain" -> col("o_orderstatus").isin("F", "O", "P"))
      Filters.validate(t(s, d, "orders"), checks)
        .groupBy(col("is_valid"), coalesce(col("violation"), lit("")).as("violation"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("is_valid"), col("violation"))
    }),

    // A1-A3 at fact scale: pricing rollup with decimal-exact sums so the
    // result is bit-deterministic across engines and partitionings
    "q13_pricing_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"),
          round(sum(col("l_discount").cast("decimal(18,6)")).cast("double")
            / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // --- Extension surface: LLM-data-pipeline operators (SURVEY.md §7.4) ---

    // Tokenization: whitespace + BPE-ish lexical token counts
    "q14_text_tokens" -> ((s, d) => {
      val doc = t(s, d, "documents")
      doc.select(col("doc_id"),
          TextAnalysis.wordCount(col("text")).as("ws_tokens"),
          TextAnalysis.lexTokenCount(col("text")).cast("long").as("lex_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Quality scoring: length/punct/stopword heuristics
    "q15_text_quality" -> ((s, d) => {
      TextAnalysis.qualityFeatures(t(s, d, "documents"), "text")
        .select(col("doc_id"), col("word_count"), col("avg_word_len"),
          col("punct_ratio"), col("stop_ratio"), col("quality_score"))
        .orderBy(col("doc_id"))
    }),

    // Heuristic language ID (marker stopwords, fixed precedence)
    "q16_lang_id" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),

    // Winnowing fingerprints, oracle-checkable profile (MD5-derived 60-bit
    // character-gram hashes — DuckDB re-derives the same fingerprint set)
    "q17_fingerprints" -> ((s, d) => {
      val fp = TextAnalysis.fingerprintsPortable(col("text"), k = 8, w = 4)
      t(s, d, "documents")
        .select(col("doc_id"), size(fp).cast("long").as("n_fingerprints"),
          array_min(fp).as("min_fp"))
        .orderBy(col("doc_id"))
    }),

    // Exact dedup via content digest: one row per distinct text
    "q18_dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), "doc_id", "text").orderBy(col("doc_id"))),

    // MinHash+LSH near-dup detection, exact-verified: LSH proposes
    // candidate pairs, exact n-gram Jaccard confirms >= 0.8. The oracle
    // computes the TRUE >= 0.8 pair set all-pairs, so LSH recall is part of
    // what's checked: 16 bands × 2 rows puts per-pair detection probability
    // at J=0.8 above 1 - 1e-7 (1-(1-0.8²)¹⁶), i.e. the candidate stage is
    // engineered to miss nothing the verifier would keep.
    "q19_minhash_lsh" -> ((s, d) => {
      val doc = t(s, d, "documents")
      // maxBucket bounded, NOT disabled (the r2 contract instance ran
      // uncapped and was the bench's one quadratic exposure): the
      // exact-pair-set contract needs every in-bucket pair proposed, and a
      // 512 cap preserves that as long as no band bucket exceeds 512 docs —
      // two orders of magnitude above the corpus's largest near-dup cluster
      // (max exact-dup cluster: 2), validated by the oracle match at the
      // correctness SF. A degenerate boilerplate flood beyond the cap
      // degrades to the linear representative-star path instead of bucket².
      val cand = Dedup.minhashCandidatePairs(doc, "doc_id", "text",
        numHashes = 32, bands = 16, maxBucket = 512)
      // prescreen on the signature-agreement estimate the candidate stage
      // already computed: Bin(32, 0.8) < 0.4·32 has probability ~1e-8, so
      // no true >= 0.8 pair is lost, while band-hash false positives (est
      // near 0) never reach the expensive exact verification
      Dedup.ngramJaccard(cand.filter(col("est_jaccard") >= 0.4)
          .select("id1", "id2"), doc, "doc_id", "text", n = 3)
        .filter(col("jaccard") >= 0.8)
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id1"), col("id2"))
    }),

    // SimHash 64-bit fingerprints, oracle-checkable profile (token hashes
    // are MD5-derived so DuckDB recomputes the fingerprint bit-for-bit)
    "q20_simhash" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), Dedup.simhash64Portable(col("text")).as("simhash"))
        .orderBy(col("doc_id"))),

    // Exact word-3-gram Jaccard: best match per doc within its source
    // block, via the inverted-index formulation (scale path)
    "q21_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardTopNeighbor(t(s, d, "documents"), "doc_id", "text",
        "source", n = 3).orderBy(col("doc_id"))),

    // Brute-force cosine top-k (exact ANN baseline)
    "q22_cosine_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"),
          col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // LSH-bucketed ANN (rows-only: engine-specific hyperplanes); auto
    // prefix scaling + 2-table OR-amplification + Hamming-1 multi-probe
    // (recall@5 ≈ 0.72 vs brute force, floor-asserted in SimilaritySpec).
    // Corpus count passed from the memoized table count so plan
    // construction doesn't run a count() job per rebuild.
    "q23_ann_lsh" -> ((s, d) =>
      Similarity.lshTopK(t(s, d, "embeddings"), "vec_id", "embedding", k = 5,
          tables = 2, multiProbe = true,
          corpusCount = Some(cachedCount(s, d, "embeddings")))
        .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"),
          col("rank"))
        .orderBy(col("query_id"), col("rank"))),

    // The same LSH-ANN mechanics under the ORACLE-PORTABLE hyperplane
    // family (MD5-derived plane components): DuckDB re-derives the planes,
    // signatures, Hamming≤1 multi-probe pair set, and cosine top-5
    // bit-for-bit — so the bucketing/probing/ranking pipeline itself is
    // hash-checked, closing r2's last no_oracle gap. q23 stays the
    // benchmark instance (native signature expression, auto prefix).
    "q23b_ann_portable" -> ((s, d) =>
      Similarity.lshTopK(t(s, d, "embeddings"), "vec_id", "embedding", k = 5,
          bits = 8, prefixBits = 8, tables = 2, maxBucket = Int.MaxValue,
          multiProbe = true, signatureFn = Similarity.portableSignature(64))
        .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"),
          col("rank"))
        .orderBy(col("query_id"), col("rank"))),

    // Streaming-shaped batch rollup over the events stream table (the
    // Structured Streaming twin is asserted equivalent in EventRollupSpec)
    "q24_event_rollup" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .orderBy(col("day"), col("event_type"))),

    // Embedding cosine near-dup stats per label block (exact, blocked —
    // the within-block pair set is what an LSH bucket would feed)
    "q25_embedding_neardups" -> ((s, d) => {
      val pairs = Dedup.embeddingNearDups(
        t(s, d, "embeddings"), "vec_id", "embedding", "label", threshold = -1.0)
      pairs.join(t(s, d, "embeddings").select(col("vec_id").as("id1"),
          col("label")), Seq("id1"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("cos") >= 0.5, 1L).otherwise(0L)).as("n_near"),
          round(max(col("cos")), 6).as("max_cos"))
        .orderBy(col("label"))
    }),

    // Composed training-data pipeline: quality filter → exact dedup →
    // per-language token stats (the end-to-end extension flagship)
    "q26_corpus_pipeline" -> ((s, d) => {
      val doc = t(s, d, "documents")
      val scored = TextAnalysis.qualityFeatures(doc, "text")
      val kept = scored.filter(col("quality_score") >= 0.5 && col("word_count") >= 20)
      val deduped = kept.join(
        Dedup.exact(kept, "doc_id", "text").select("doc_id"), Seq("doc_id"))
      deduped.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("word_count")).as("total_tokens"),
          round(sum(col("quality_score").cast("decimal(18,9)")).cast("double")
            / count(lit(1)), 6).as("avg_quality"))
        .orderBy(col("lang"))
    }),

    // IVF ANN: k-means cells (deterministic init + portable decimal-exact
    // means), nProbe-cell search — oracle-checked via the build UNROLLED
    // in SQL (2 Lloyd iterations as CTEs; every arithmetic step mirrored)
    "q28_ivf_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), "vec_id",
          "embedding", k = 10, nCells = 16, nProbe = 4)
        .select(col("query_id"), col("neighbor_id"), round(col("cos"), 6).as("cos"),
          col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Multimodal plumbing: binary payload + metadata struct (the decode /
    // feature step is spec-tested; this checks the byte-accurate metadata)
    "q27_media_meta" -> ((s, d) =>
      Multimodal.withMediaColumn(t(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("meta.media_type").as("media_type"),
          col("meta.n_bytes").as("n_bytes"))
        .orderBy(col("doc_id"))),

    // Deterministic stratified sampling: 30 docs per language by md5 key
    // hash — membership is a pure function of the key, reproducible by any
    // engine (vs rand()-based sampling)
    "q29_sample" -> ((s, d) =>
      Corpus.stratifiedSample(t(s, d, "documents"), "lang", "doc_id", quota = 30)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // Corpus vocabulary: global top-100 tokens by frequency — hash agg +
    // TakeOrderedAndProject, no global sort/window
    "q30_vocab" -> ((s, d) =>
      Corpus.topTokens(t(s, d, "documents"), "text", k = 100)),

    // Token-window chunking (size 64, stride 48): the pre-training
    // context-packing split; chunk content checked via md5 digest
    "q31_chunks" -> ((s, d) =>
      Corpus.chunk(t(s, d, "documents"), "doc_id", "text", size = 64, stride = 48)
        .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
          md5(col("chunk_text")).as("chunk_digest"))
        .orderBy(col("doc_id"), col("chunk_idx"))),

    // As-of join (temporal enrichment): each event sees its type's most
    // recent COMPLETED daily rollup (available at end of day) — union +
    // keyed-window formulation; oracle is DuckDB's native ASOF JOIN
    "q32_asof" -> ((s, d) => {
      val ev = t(s, d, "events")
      val rollup = ev
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("day_value"))
        .select(col("event_type"),
          (col("day") + expr("interval 1 day")).as("avail_ts"),
          date_format(col("day"), "yyyy-MM-dd").as("asof_day"),
          col("day_value").as("asof_value"))
      Joins.asofJoin(ev, rollup, keys = Seq("event_type"),
          leftTs = "ts", rightTs = "avail_ts",
          payload = Seq("asof_day", "asof_value"))
        .select(col("event_id"), col("event_type"), col("asof_day"),
          col("asof_value"))
        .orderBy(col("event_id"))
    }),

    // Hierarchical subtotals via rollup() — the grouping-sets tier
    // SURVEY §2.4 lists as absent from the reference; subtotal rows carry
    // NULL keys exactly like SQL ROLLUP
    "q34_rollup" -> ((s, d) =>
      t(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // Compare fan-out PIVOTED to columns (SURVEY §3.3's J4 wide form):
    // one pass, statuses become columns — the side-by-side table the
    // reference's compare page renders
    "q35_pivot" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
        // a status absent for a priority pivots to NULL; the oracle's
        // FILTER count reports 0 — align
        .na.fill(0L, Seq("n_f", "n_o", "n_p"))
        .orderBy(col("o_orderpriority"))),

    // Sessionization: gap-merge each user's events (2 h inactivity closes a
    // session) — session_window, the §2.7 capability the reference lacks;
    // oracle re-derives sessions with gaps-and-islands SQL
    "q33_sessions" -> ((s, d) =>
      TimeSeries.sessionize(t(s, d, "events"), "user_id", "ts", "2 hours",
          Seq(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value")))
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("session_start"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))),

    // Streaming exact-dedup's batch twin, driver-visible (VERDICT r2 item
    // 6): first occurrence per content digest over the time-ordered event
    // log — the exact row set a streaming replay of the log through
    // StreamingDedup keeps. Digest fields are engine-portable (floor-micros
    // for the double value: float→string formatting is engine-specific,
    // a floored integer is not). StreamingDedupSpec asserts the streaming
    // run produces this same row set.
    "q36_stream_dedup_twin" -> ((s, d) => {
      val ev = t(s, d, "events")
      val keyed = ev.withColumn("digest",
        md5(concat_ws("|", col("user_id"), col("event_type"),
          floor(col("value") * 1000000).cast("long"))))
      graft.streaming.StreamingDedup.firstWins(keyed, "digest", "ts", "event_id")
        .select(col("event_id"), col("digest"))
        .orderBy(col("event_id"))
    }),

    // Duplicate CLUSTERS from verified near-dup pairs: min-label
    // propagation to a fixpoint (a component = one duplicate group;
    // min-id-per-component is the transitive dedup winner). Oracle is a
    // recursive CTE over the same true >= 0.8 edge set.
    "q37_dedup_clusters" -> ((s, d) => {
      val doc = t(s, d, "documents")
      val cand = Dedup.minhashCandidatePairs(doc, "doc_id", "text",
        numHashes = 32, bands = 16, maxBucket = 512)
      val edges = Dedup.ngramJaccard(cand.filter(col("est_jaccard") >= 0.4)
          .select("id1", "id2"), doc, "doc_id", "text", n = 3)
        .filter(col("jaccard") >= 0.8).select("id1", "id2")
      Dedup.connectedComponents(edges, doc.select(col("doc_id")), "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Decontamination: drop documents sharing any word n-gram with the
    // probe ("benchmark") set — n=3 here so chance vocabulary overlap
    // exercises the membership join; production uses 8-13
    "q38_decontaminate" -> ((s, d) => {
      val doc = t(s, d, "documents")
      Corpus.decontaminate(doc, doc.filter(col("doc_id") < 5),
          "doc_id", "text", n = 3)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Repetition / boilerplate quality signal: dominant-trigram share +
    // type-token ratio
    "q39_repetition" -> ((s, d) =>
      TextAnalysis.repetitionFeatures(t(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_trigrams"), col("max_rep"),
          round(col("rep_ratio"), 6).as("rep_ratio"),
          round(col("ttr"), 6).as("ttr"))
        .orderBy(col("doc_id"))),

    // TF-IDF keyword extraction, rational idf (engine-reproducible: no
    // ln(), whose rounding is libm-specific) — top-3 terms per doc
    "q40_tfidf" -> ((s, d) =>
      Corpus.tfidfTopTerms(t(s, d, "documents"), "doc_id", "text", k = 3,
          docCount = cachedCount(s, d, "documents"))
        .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
          round(col("score"), 6).as("score"))
        .orderBy(col("doc_id"), col("rank"))),

    // PII scrub: the corpus carries no natural PII, so a deterministic
    // contact block (email + 3-3-4 phone derived from doc_id) is appended
    // first; the check covers hit counts AND the redacted text digest
    "q41_pii_redact" -> ((s, d) => {
      val aug = t(s, d, "documents").select(col("doc_id"),
        concat(col("text"), lit(" Contact user"),
          col("doc_id").cast("string"), lit("@example.com or "),
          lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
          lit("-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
          .as("text"))
      val (ne, np) = TextAnalysis.piiCounts(col("text"))
      aug.select(col("doc_id"), ne.as("n_emails"), np.as("n_phones"),
          md5(TextAnalysis.redactPii(col("text"))).as("redacted_digest"))
        .orderBy(col("doc_id"))
    }),

    // Range join as an equi-join on bins (no native Spark strategy — a raw
    // range predicate plans BroadcastNestedLoopJoin): events matched to 50
    // OVERLAPPING value ranges, per-range stats
    "q42_range_join" -> ((s, d) => {
      val ranges = s.range(50).select(col("id").as("range_id"),
        (col("id") * 10.0).as("lo"), (col("id") * 10.0 + 15.0).as("hi"))
      Joins.rangeJoinBinned(
          t(s, d, "events").select(col("event_id"), col("value")),
          "value", ranges, "lo", "hi", binWidth = 10.0)
        .groupBy(col("range_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .orderBy(col("range_id"))
    }),

    // Month-over-month trend deltas (the reference trends page's "change
    // vs last month") — broadcast self-join on month−1, never an
    // unpartitioned lag() window
    "q43_month_delta" -> ((s, d) =>
      TimeSeries.withMonthDelta(
          TimeSeries.monthly(ordersOf(s, d, Seq("NATION_19"), windowed = true),
            "o_orderdate", Seq(count(lit(1)).as("n"))), "n")
        .select(col("month"), col("n"), col("prev_n"), col("delta_n"),
          col("pct_change_n").as("pct_change"))
        .orderBy(col("month"))),

    // Hopping-window rollup ("last 24 h refreshed every 6 h") — each event
    // in width/slide = 4 epoch-aligned windows; streaming-native shape
    "q44_sliding_window" -> ((s, d) =>
      TimeSeries.sliding(t(s, d, "events"), "ts", "1 day", "6 hours",
          Seq("event_type"),
          Seq(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value")))
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))),

    // Source-mix balancing: every source downsampled to the smallest
    // source's size, membership a pure function of the doc key
    "q45_source_balance" -> ((s, d) =>
      Corpus.balanceStrata(t(s, d, "documents"), "source", "doc_id")
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),

    // Bloom-prefiltered fact⋈dim: lineitem rows bloom-pruned on the scan
    // before the exact join against a selective part subset — the 100 TB
    // shuffle reducer; FPs drop in the exact join so result ≡ plain join
    "q46_bloom_join" -> ((s, d) =>
      Joins.bloomPrunedJoin(t(s, d, "lineitem"),
          t(s, d, "part").filter(col("p_size") <= 3),
          "l_partkey", "p_partkey", expectedDimKeys = 10000L)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(col("p_brand"))),

    // Single-scan per-column profile (exact distincts; long form)
    "q47_profile" -> ((s, d) =>
      Profiling.profile(t(s, d, "lineitem"),
          Seq("l_partkey", "l_quantity", "l_extendedprice", "l_discount",
            "l_returnflag"))
        .orderBy(col("column_name"))),

    // Equi-width value histogram, bounds from an in-plan 1-row broadcast
    "q48_histogram" -> ((s, d) =>
      Profiling.histogram(t(s, d, "lineitem"), "l_extendedprice", bins = 20)
        .orderBy(col("bin_id"))),

    // Weight-proportional deterministic sample (longer docs favored);
    // membership pure integer arithmetic on the key hash
    "q49_weighted_sample" -> ((s, d) =>
      Corpus.weightedSample(t(s, d, "documents"), "doc_id", "n_chars", 0.5)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // Per-group 3σ outliers from decimal-exact moments
    "q50_outliers" -> ((s, d) =>
      Profiling.outliers(t(s, d, "events"), "event_type", "value", sigmas = 3.0)
        .select(col("event_id"), col("event_type"), col("value"), col("z"))
        .orderBy(col("event_id"))),

    // CDC changelog compaction: latest event per user wins, 'error' as the
    // delete marker removes the user from the snapshot
    "q51_cdc_compact" -> ((s, d) =>
      Changelog.compact(t(s, d, "events"), Seq("user_id"),
          Seq("ts", "event_id"), col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy(col("user_id"))),

    // Funnel conversion: earliest purchase within 1 h of each click, per
    // user — keyed equi-join + interval post-filter + struct-min pick
    "q52_funnel" -> ((s, d) =>
      TimeSeries.funnelPairs(t(s, d, "events"), "user_id", "event_id", "ts",
          "event_type", "click", "purchase", withinSecs = 3600L)
        .orderBy(col("user_id"), col("first_id"))),

    // Rolling mean of each user's last 5 event values, decimal-exact sum
    "q53_rolling_mean" -> ((s, d) =>
      TimeSeries.rollingMean(t(s, d, "events"), Seq("user_id"),
          Seq("ts", "event_id"), "value", window = 5)
        .select(col("event_id"), col("user_id"), col("value"), col("roll_avg"))
        .orderBy(col("event_id"))),

    // Context packing: documents into 10k-char packs per language, in
    // deterministic key-hash order — one keyed cumsum window
    "q54_pack" -> ((s, d) =>
      Corpus.packSequences(t(s, d, "documents"), "lang", "doc_id",
          "n_chars", budget = 10000L)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("pack_id"), col("pack_pos"))
        .orderBy(col("doc_id"))),

    // Z-curve layout key over (value, user_id): in-plan bounds + pure
    // bitwise Morton interleave — the write-side data-skipping device
    "q55_zorder_key" -> ((s, d) =>
      Layout.withZKey(t(s, d, "events"), "value", "user_id")
        .select(col("event_id"), col("zkey"))
        .orderBy(col("event_id"))),

    // Top-3 parts per brand by shipped quantity: keyed rank window over
    // the pre-reduced aggregate, never a global window
    "q56_topk_per_group" -> ((s, d) => {
      val agg = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))
      TopK.perGroup(agg, Seq("p_brand"),
          Seq(col("sum_qty").desc, col("p_partkey")), k = 3)
        .select(col("p_brand"), col("p_partkey"), col("sum_qty"),
          col("rank_in_group"))
        .orderBy(col("p_brand"), col("rank_in_group"))
    }),

    // Value quartile of each event within its type (quantile segmentation)
    "q57_quartiles" -> ((s, d) =>
      Profiling.segments(t(s, d, "events"), "event_type",
          Seq(col("value"), col("event_id")), n = 4)
        .select(col("event_id"), col("event_type"), col("value"), col("segment"))
        .orderBy(col("event_id"))),

    // Snapshot diff between two CDC compaction cuts: only differing users
    // survive, tagged added/removed/changed — the dataset-versioning op
    "q58_snapshot_diff" -> ((s, d) => {
      val ev = t(s, d, "events")
      val isDel = col("event_type") === "error"
      val oldSnap = Changelog.compact(
        Filters.dateWindow(ev, "ts", None, Some("2024-01-15")),
        Seq("user_id"), Seq("ts", "event_id"), isDel)
      val newSnap = Changelog.compact(ev, Seq("user_id"), Seq("ts", "event_id"), isDel)
      Changelog.diffSnapshots(oldSnap, newSnap, Seq("user_id"),
          Seq("event_id", "event_type", "value"))
        .orderBy(col("user_id"))
    }),

    // Cohort retention triangle: customers bucketed by first-order month,
    // distinct actives per (cohort, month offset) — integer calendar math
    "q59_cohort" -> ((s, d) =>
      TimeSeries.cohortRetention(t(s, d, "orders"), "o_custkey", "o_orderdate")
        .orderBy(col("cohort_month"), col("month_offset"))),

    // Winsorized per-type mean: nearest-rank p05/p95 clamp (integer rank
    // arithmetic, bounds are data values), decimal-exact clamped sum
    "q60_winsorized" -> ((s, d) =>
      Profiling.winsorizedStats(t(s, d, "events"), "event_type", "value",
          "event_id", loPct = 5, hiPct = 95)
        .orderBy(col("event_type"))),

    // CUBE over (status, priority): all four grouping sets in one pass —
    // completes the rollup (q34) / pivot (q35) grouping-sets family
    "q61_cube" -> ((s, d) =>
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // Per-source Pareto curve: running char-mass share in (length desc,
    // id) order — exact integer cumsum, one double division
    "q62_pareto" -> ((s, d) =>
      Corpus.cumulativeShare(t(s, d, "documents"), "source", "n_chars",
          "doc_id")
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("rank_in_group"), col("cum_share"))
        .orderBy(col("doc_id"))),

    // Longest shared verbatim token span per doc pair (exact-substring
    // dedup signal): positional 5-gram join + diagonal gaps-and-islands.
    // n=5 (spans ≥ 7 tokens) keeps the gram join selective: chance-level
    // 3-gram matches in a small-vocabulary corpus would dominate the pair
    // join while telling nothing about copying
    "q63_dup_spans" -> ((s, d) =>
      Dedup.duplicateSpans(t(s, d, "documents"), "doc_id", "text",
          n = 5, minSpanGrams = 3, maxOcc = 1000)
        // BIGINT span starts: the gram positions are int-sized, but the
        // oracle (and the driver's typed hash) speak BIGINT — emit the
        // wide type at the contract edge (r13 type-strict gate)
        .withColumn("start1", col("start1").cast("long"))
        .withColumn("start2", col("start2").cast("long"))
        .orderBy(col("id1"), col("id2"))),

    // Incremental view maintenance: a monthly rollup maintained by MERGING
    // the new batch's aggregate (additive, decimal-exact) must equal the
    // full recompute — the oracle IS the full recompute
    "q64_incremental" -> ((s, d) => {
      def monthlyAgg(df: DataFrame): DataFrame =
        df.groupBy(date_format(date_trunc("month", col("o_orderdate")),
            "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("sum_price_d"))
      val o = t(s, d, "orders")
      val cut = to_timestamp(lit("1996-01-01"))
      val base = monthlyAgg(o.filter(col("o_orderdate") < cut))
      val delta = monthlyAgg(o.filter(col("o_orderdate") >= cut))
      Incremental.mergeAdditive(base, delta, Seq("month"),
          Seq("n", "sum_price_d"))
        .select(col("month"), col("n"),
          col("sum_price_d").cast("double").as("sum_price"))
        .orderBy(col("month"))
    }),

    // Key-skew concentration profile over the join key l_partkey — the
    // pre-shuffle diagnostic; one agg, reused exchange, top-k via limit
    "q65_skew_profile" -> ((s, d) =>
      Profiling.keySkew(t(s, d, "lineitem"), "l_partkey", topK = 10)),

    // First-5-steps event path per user (path analysis): lexicographic
    // struct sort ≡ ORDER BY ts, event_id
    "q66_journeys" -> ((s, d) =>
      TimeSeries.journeys(t(s, d, "events"), "user_id", "ts", "event_id",
          "event_type", maxSteps = 5)
        .orderBy(col("user_id"))),

    // Corpus bigram table (LM counts / tokenizer-merge candidates): pairs
    // built inside each doc's token array — no shuffle before the count
    "q67_bigrams" -> ((s, d) =>
      Corpus.topBigrams(t(s, d, "documents"), "text", k = 100)),

    // Market-basket co-occurrence with A-priori item pruning: parts
    // co-ordered in the same order, self-join keyed on the basket
    "q68_cooccur" -> ((s, d) =>
      Affinity.cooccurrence(t(s, d, "lineitem"), "l_orderkey", "l_partkey",
          minItemSupport = 20, minPairSupport = 2, k = 100)),

    // Fuzzy record linkage: deterministically corrupted part names
    // (3rd char dropped) matched back by edit distance ≤ 2 through the
    // lossless length-bucket block — result equals the all-pairs filter,
    // which is exactly what the oracle computes
    "q69_fuzzy_join" -> ((s, d) => {
      val p = t(s, d, "part")
      val probes = p.filter(col("p_partkey") % 97 === 0)
        .select(col("p_partkey").as("probe_key"),
          concat(substring(col("p_name"), 1, 2),
            expr("substring(p_name, 4)")).as("probe"))
      val names = p.select(col("p_partkey").as("match_key"),
        col("p_name").as("name"))
      Joins.fuzzyJoin(probes, names, "probe", "name", maxDist = 2)
        .select(col("probe_key"), col("probe"), col("match_key"),
          col("name"), col("dist"))
        .orderBy(col("probe_key"), col("match_key"))
    }),

    // n-gram LM quality score per document (CCNet-style filter) — pure
    // rational arithmetic + sorted-fold mean, so the oracle reproduces the
    // doubles bit-for-bit
    "q70_lm_score" -> ((s, d) =>
      Corpus.lmScore(t(s, d, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Misra-Gries heavy hitters with capacity far above the true
    // cardinality — the sketch's no-decrement regime, where every
    // estimate is exact and the oracle is the plain group-by
    "q71_heavy_hitters" -> ((s, d) =>
      Profiling.heavyHitters(t(s, d, "events"), "event_type", capacity = 64)),

    // Interval-overlap temporal join: per-user view intervals × purchase
    // intervals (deterministic event_id-derived lengths), binned cells +
    // overlap-start dedup — oracle is the naive all-pairs overlap filter
    "q72_interval_join" -> ((s, d) => {
      val iv = t(s, d, "events").select(col("user_id"), col("event_id"),
        col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("__lo"))
        .withColumn("__hi",
          col("__lo") + (col("event_id") % 50 + 1) * lit(3600000000L))
      val views = iv.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("left_id"),
          col("__lo").as("left_lo"), col("__hi").as("left_hi"))
      val buys = iv.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("right_id"),
          col("__lo").as("right_lo"), col("__hi").as("right_hi"))
      // binWidth = 50 h (the max interval length) in micros
      Joins.intervalOverlapJoin(views, buys, Seq("user_id"),
          "left_lo", "left_hi", "right_lo", "right_hi",
          binWidth = 50L * 3600000000L)
        .select(col("user_id"), col("left_id"), col("right_id"),
          (least(col("left_hi"), col("right_hi")) -
            greatest(col("left_lo"), col("right_lo"))).as("overlap_us"))
        .orderBy(col("user_id"), col("left_id"), col("right_id"))
    }),

    // PageRank (2 power iterations, damping 0.85) over the symmetrized
    // part-affinity graph from q68's pair mining — sorted-fold double
    // sums make the iterative ranks bit-reproducible in the oracle
    "q73_pagerank" -> ((s, d) => {
      val pairs = Affinity.cooccurrencePairs(t(s, d, "lineitem"),
        "l_orderkey", "l_partkey", minItemSupport = 20, minPairSupport = 2)
      val edges = pairs.select(col("i1").as("s"), col("i2").as("d"))
        .unionByName(pairs.select(col("i2").as("s"), col("i1").as("d")))
      Graph.pageRank(edges, "s", "d", iters = 2).orderBy(col("node"))
    }),

    // Per-segment OLS trend of monthly order revenue: integer month index
    // × decimal monthly totals → exact sufficient statistics, one final
    // double divide — the "is this segment growing" primitive
    "q74_trend" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val monthly = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("x"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("y"))
      TimeSeries.trendSlope(monthly, Seq("segment"), "x", "y")
        .orderBy(col("segment"))
    }),

    // First-touch attribution: each user's purchases credited to the
    // event type that acquired them (their first event); double revenue
    // folded in sorted order at both levels
    "q75_attribution" -> ((s, d) =>
      TimeSeries.firstTouchAttribution(t(s, d, "events"), "user_id", "ts",
          "event_id", "event_type", "value", convType = "purchase")
        .orderBy(col("first_touch"))),

    // Rolling z-score anomaly flags per supplier over shipment order —
    // decimal-exact frame moments, one sqrt (IEEE-correctly-rounded,
    // unlike ln/exp) and one divide
    "q76_anomalies" -> ((s, d) =>
      TimeSeries.rollingZscore(t(s, d, "lineitem"), Seq("l_suppkey"),
          Seq("l_shipdate", "l_orderkey", "l_linenumber"),
          "l_extendedprice", window = 20, sigmas = 2.5)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("z"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))),

    // Data-quality expectations report: every rule checked in one scan,
    // null predicate = violation (conservative admission gate)
    "q77_quality_gate" -> ((s, d) =>
      Profiling.checkConstraints(t(s, d, "lineitem"), Seq(
          "discount_range" -> (col("l_discount") >= 0 && col("l_discount") <= 0.1),
          "price_positive" -> (col("l_extendedprice") > 0),
          "qty_range" -> (col("l_quantity") >= 1 && col("l_quantity") <= 50),
          "tax_range" -> (col("l_tax") >= 0 && col("l_tax") <= 0.08),
          "flag_domain" -> col("l_returnflag").isin("A", "N", "R")))
        .orderBy(col("rule"))),

    // Semantic dedup CLUSTERS: the embedding sibling of q37 — blocked
    // exact-cosine near-dup pairs (q25's edge generator, thresholded)
    // collapse transitively into duplicate groups via the same min-label
    // propagation. Oracle: brute-force within-block cosine + recursive
    // CTE — the engine's pair set AND its fixpoint must both match.
    "q78_semantic_clusters" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val edges = Dedup.embeddingNearDups(emb, "vec_id", "embedding",
          "label", threshold = 0.5)
        .select("id1", "id2")
      Dedup.connectedComponents(edges, emb.select(col("vec_id")), "vec_id")
        .orderBy(col("vec_id"))
    }),

    // Deterministic training-shard manifest: shard + position are pure
    // md5-arithmetic functions of the key (a reproducible pseudorandom
    // shuffle — no curriculum bias from source locality, stable across
    // engines/retries/partitionings)
    "q79_shards" -> ((s, d) =>
      Corpus.shardAssignment(t(s, d, "documents"), "doc_id", nShards = 8)
        .select(col("doc_id"), col("shard_id"), col("shard_pos"))
        .orderBy(col("doc_id"))),

    // One-call corpus dedup: candidates → exact verification → clusters →
    // lowest-id survivor per cluster, with the absorbed-duplicate count.
    // The end-to-end API a pipeline calls; its stages are q19/q37's.
    "q81_dedup_survivors" -> ((s, d) =>
      Dedup.dedupCorpus(t(s, d, "documents"), "doc_id", "text",
          threshold = 0.8, maxBucket = 512)
        .select(col("doc_id"), col("cluster"), col("n_dropped"), col("lang"))
        .orderBy(col("doc_id"))),

    // Exact-dedup increment against the digest history: half the corpus
    // persisted as 16-byte digests, the other half arrives as a batch —
    // drop everything history saw, keep the lowest id per batch-internal
    // duplicate group, never re-read history text
    "q82_incremental_exact" -> ((s, d) => {
      val doc = t(s, d, "documents")
      val cut = cachedCount(s, d, "documents") / 2
      // the corpus has no natural exact duplicates (q18: 500 distinct
      // digests), so engineer two deterministic families that make every
      // code path discriminating: "shared" texts exist in BOTH halves
      // (batch copies must die at the history anti-join) and "batch"
      // texts repeat only within the batch (the lowest-id winner must
      // survive per group)
      val aug = doc.withColumn("text",
        when(pmod(col("doc_id"), lit(7)) === 3,
          concat(lit("batch dup "),
            (col("doc_id") / lit(cut)).cast("long").cast("string"),
            lit(" "), pmod(col("doc_id"), lit(13)).cast("string")))
          .when(pmod(col("doc_id"), lit(7)) === 5,
            concat(lit("shared dup "),
              pmod(col("doc_id"), lit(5)).cast("string")))
          .otherwise(col("text")))
      val idxPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_dg_idx_${Integer.toHexString(d.hashCode)}").getPath
      Stages.timed("q82_incremental_exact", "save_index") {
        Dedup.saveDigestIndex(aug.filter(col("doc_id") < cut), idxPath, "text")
      }
      Dedup.incrementalExact(aug.filter(col("doc_id") >= cut), idxPath,
          "doc_id", "text")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // INCREMENTAL dedup — the 100 TB workflow: the first half of the
    // corpus is "history" persisted as a MinHash band index; the second
    // half arrives as a batch and is deduped against index + itself
    // WITHOUT recomputing any historical signature. Exact-verified ≥ 0.8;
    // oracle = the true all-pairs set restricted to pairs touching the
    // new batch — candidate recall must be total, same bar as q19.
    "q80_incremental_dedup" -> ((s, d) => {
      val doc = t(s, d, "documents")
      // half the corpus is history, half the arriving batch; doc_ids are
      // dense and 0-based, so the cut is count/2 at every SF (the oracle
      // derives the same cut with a scalar subquery)
      val cut = cachedCount(s, d, "documents") / 2
      val hist = doc.filter(col("doc_id") < cut)
      val batch = doc.filter(col("doc_id") >= cut)
      val idxPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_mh_idx_${Integer.toHexString(d.hashCode)}").getPath
      Stages.timed("q80_incremental_dedup", "save_index") {
        Dedup.saveMinhashIndex(hist, idxPath, "doc_id", "text",
          shingleN = 3, numHashes = 32, bands = 16)
      }
      val cand = Dedup.incrementalMinhashPairs(batch, idxPath, "doc_id",
        "text", maxBucket = 512)
      Dedup.ngramJaccard(cand.filter(col("est_jaccard") >= 0.4)
          .select("id1", "id2"), doc, "doc_id", "text", n = 3)
        .filter(col("jaccard") >= 0.8)
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id1"), col("id2"))
    }),

    // STREAMING-FLAGGER core, driver-visible: which arriving docs
    // near-duplicate the persisted corpus index (flagAgainstIndex — the
    // per-micro-batch plan of StreamingDedup.nearDupsEachBatch, run
    // batch-side so the oracle can check it). Candidates exact-verified
    // at >= 0.8 like q80; unlike q80 the flagger proposes CROSS pairs
    // only (batch vs corpus, never batch-internal), so the oracle is the
    // true pair set with one side in each half.
    "q83_flag_index" -> ((s, d) => {
      val doc = t(s, d, "documents")
      val cut = cachedCount(s, d, "documents") / 2
      val idxPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_flag_idx_${Integer.toHexString(d.hashCode)}").getPath
      Stages.timed("q83_flag_index", "save_index") {
        Dedup.saveMinhashIndex(doc.filter(col("doc_id") < cut), idxPath,
          "doc_id", "text", shingleN = 3, numHashes = 32, bands = 16,
          maxBucket = 512)
      }
      val cand = Dedup.flagAgainstIndex(doc.filter(col("doc_id") >= cut),
          idxPath, "doc_id", "text")
        .filter(col("est_jaccard") >= 0.4)
        .select(col("doc_id").as("id1"), col("neighbor_id").as("id2"))
      Dedup.ngramJaccard(cand, doc, "doc_id", "text", n = 3)
        .filter(col("jaccard") >= 0.8)
        .select(col("id1").as("doc_id"), col("id2").as("neighbor_id"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("doc_id"), col("neighbor_id"))
    }),

    // SimHash near-dup PAIRS via pigeonhole block bucketing (4 × 16-bit
    // blocks; hamming ≤ 3 < 4 blocks → at least one block identical, so
    // candidate recall is EXACT and the oracle is the plain all-pairs
    // hamming filter over the same MD5-portable fingerprints q20 proves
    // bit-reproducible). The engine only ever joins within blocks — the
    // oracle's all-pairs form is the semantics, not the plan. maxBucket
    // is set beyond any contract-SF bucket so the star fallback (whose
    // representative-only verification the brute-force oracle doesn't
    // model) can never silently bind.
    "q84_simhash_pairs" -> ((s, d) =>
      Dedup.simhashNearDupPairs(t(s, d, "documents"), "doc_id", "text",
          maxHamming = 3, blocks = 4, maxBucket = 1 << 20, portable = true)
        .orderBy(col("id1"), col("id2"))),

    // INCREMENTAL SimHash: first half of the corpus persisted as the
    // 16-byte-per-doc fingerprint index, second half arrives as a batch
    // and mines pairs against index + itself without re-reading any
    // history text — q80's workflow on the cheap index. Oracle = q84's
    // brute-force pair set restricted to pairs touching the batch; the
    // ample maxBucket keeps the star/cap paths out of the contract (same
    // reasoning as q84).
    "q85_incremental_simhash" -> ((s, d) => {
      val doc = t(s, d, "documents")
      val cut = cachedCount(s, d, "documents") / 2
      val idxPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_sh_idx_${Integer.toHexString(d.hashCode)}").getPath
      Dedup.saveSimhashIndex(doc.filter(col("doc_id") < cut), idxPath,
        "doc_id", "text", portable = true)
      Dedup.incrementalSimhashPairs(doc.filter(col("doc_id") >= cut),
          idxPath, "doc_id", "text",
          maxHamming = 3, blocks = 4, maxBucket = 1 << 20)
        .orderBy(col("id1"), col("id2"))
    }),

    // Audio/video container metadata: synthesize REAL WAV / MP4 bytes
    // per doc (parameters derived from the row by integer arithmetic),
    // then detectMeta parses them back from the headers alone — the
    // oracle recomputes the expected fields directly, so a parser or
    // synthesizer bug on either side breaks the hash
    "q86_container_meta" -> ((s, d) =>
      Multimodal.detectMeta(
          Multimodal.withContainerColumn(t(s, d, "documents"), "doc_id", "text"))
        .select(col("doc_id"),
          col("meta.media_type").as("media_type"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.channels").as("channels"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.n_tracks").as("n_tracks"))
        .orderBy(col("doc_id"))),

    // Int8-quantized cosine top-k: the q22 search over 4×-smaller
    // vectors (quantize once at ingest; scales cancel, so the search is
    // integer-only). The oracle re-derives the quantization with the
    // same floor(·+0.5) arithmetic, so a rounding or scale bug on
    // either side breaks the hash.
    "q87_quantized_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 6).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Two-stage retrieval: int8 candidates (q87's arithmetic, k×4) →
    // exact float rescore of candidates only. The oracle composes both
    // stages, so the candidate cut AND the rescore must both agree.
    "q88_rescored_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.rescoredTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 6).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Incremental IVF: history (vec_id >= 250) trains the index, the
    // batch appends under FROZEN centroids — appended TWICE, so the
    // idempotence anti-join is under oracle check too — then one search
    // over the loaded index must see both sides. The oracle re-derives
    // the whole build (q28's unrolled k-means on history only), assigns
    // the batch against the final centroids, and probes the union.
    "q89_incremental_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val idxPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_ivf_idx_${Integer.toHexString(d.hashCode)}").getPath
      Stages.timed("q89_incremental_ivf", "build_save") {
        val (cells, cents) = Similarity.ivfAssign(
          emb.filter(col("vec_id") >= 250), "vec_id", "embedding", nCells = 16)
        Similarity.saveIvfIndex(cells, cents, idxPath)
        cells.unpersist(blocking = false)
      }
      val batch = emb.filter(col("vec_id") < 250)
      Stages.timed("q89_incremental_ivf", "append") {
        Similarity.appendIvfIndex(batch, idxPath, "vec_id", "embedding")
      }
      Stages.timed("q89_incremental_ivf", "append_replay") {
        Similarity.appendIvfIndex(batch, idxPath, "vec_id", "embedding")
      }
      val (loaded, loadedCents) = Similarity.loadIvfIndex(s, idxPath)
      Similarity.ivfSearch(loaded, loadedCents, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, nProbe = 4)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 6).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Incremental LSH over the PORTABLE plane family (q23b's): history
    // builds the index, the batch appends under the meta-PINNED planes
    // and bucket geometry (twice — the anti-join idempotence is in the
    // flow), then a multi-probe search of the loaded index runs under
    // the oracle: DuckDB re-derives every signature from md5 arithmetic
    // and the Hamming<=1 bucket predicate, cosine-ranks, and the row
    // hashes must agree.
    "q90_incremental_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val idxPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_lsh_idx_${Integer.toHexString(d.hashCode)}").getPath
      // prefixBits sized to the corpus (16 buckets/table ≈ 100+ rows
      // each), the same sizing rule lshTopK's auto-prefix applies — a
      // 256-dir layout over 2 k vectors pays file-creation, not search
      Stages.timed("q90_incremental_lsh", "build_save") {
        Similarity.saveLshIndex(emb.filter(col("vec_id") >= 250), idxPath,
          "vec_id", "embedding", bits = 8, prefixBits = 4, tables = 2,
          portableDim = 64)
      }
      val batch = emb.filter(col("vec_id") < 250)
      Stages.timed("q90_incremental_lsh", "append") {
        Similarity.appendLshIndex(batch, idxPath, "vec_id", "embedding")
      }
      Stages.timed("q90_incremental_lsh", "append_replay") {
        Similarity.appendLshIndex(batch, idxPath, "vec_id", "embedding")
      }
      Similarity.lshSearch(s, idxPath, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, multiProbe = true,
          maxBucket = Int.MaxValue)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 6).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Z-order clustered layout + manifest-pruned read. The query
    // Z-order-writes lineitem clustered on (l_shipdate, l_partkey),
    // builds the file-stats manifest, then answers a two-dimensional
    // range slice through the pruned path. Results are LAYOUT-INVARIANT
    // — the oracle is the same filter + aggregate over the original
    // table — so the gate checks that clustering, manifest pruning, and
    // the null-conservative keep rule lose and invent nothing.
    "q91_zorder_slice" -> ((s, d) => {
      val dims = Seq("l_shipdate", "l_partkey")
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_zorder_${Integer.toHexString(d.hashCode)}").getPath
      Stages.timed("q91_zorder_slice", "zorder_write") {
        Layout.writeZOrdered(t(s, d, "lineitem"), dir,
          "l_shipdate", "l_partkey", files = 16)
      }
      Stages.timed("q91_zorder_slice", "manifest") {
        Layout.writeManifest(s, dir, dims)
      }
      Layout.prunedRead(s, dir, Seq(
          Layout.ColRange("l_shipdate",
            lit("1996-01-01").cast("timestamp"),
            lit("1996-12-31").cast("timestamp")),
          Layout.ColRange("l_partkey", lit(10L), lit(59L))))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Incremental layout: base write + batch append + manifest UPDATE
    // (stats only the new files — never a base rescan) must answer a
    // range slice exactly like a plain filter over the whole table. The
    // oracle is layout-blind, so a lost file, a double-statted file, or
    // a manifest row that prunes a live file all break the hash.
    "q92_layout_append" -> ((s, d) => {
      val dims = Seq("l_shipdate", "l_partkey")
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_zappend_${Integer.toHexString(d.hashCode)}").getPath
      // fresh lifecycle per run: a prior run's manifest must not hold
      // rows for files the base overwrite below just deleted
      def rmrf(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
        f.delete(): Unit
      }
      rmrf(new java.io.File(dir))
      rmrf(new java.io.File(Layout.manifestPath(dir)))
      val li = t(s, d, "lineitem")
      val base = li.filter(col("l_orderkey") % 4 =!= 0)
      val batch = li.filter(col("l_orderkey") % 4 === 0)
      Stages.timed("q92_layout_append", "base_write") {
        Layout.writeZOrdered(base, dir, "l_shipdate", "l_partkey", files = 8)
      }
      Stages.timed("q92_layout_append", "manifest") {
        Layout.updateManifest(s, dir, dims)
      }
      Stages.timed("q92_layout_append", "append") {
        Layout.appendZOrdered(batch, dir, "l_shipdate", "l_partkey", files = 2)
      }
      Stages.timed("q92_layout_append", "manifest_update") {
        Layout.updateManifest(s, dir, dims)
      }
      Stages.timed("q92_layout_append", "manifest_noop") {
        Layout.updateManifest(s, dir, dims) // idempotent no-op under the gate
      }
      Layout.prunedRead(s, dir, Seq(
          Layout.ColRange("l_shipdate",
            lit("1997-01-01").cast("timestamp"),
            lit("1997-12-31").cast("timestamp")),
          Layout.ColRange("l_partkey", lit(10L), lit(59L))))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Incremental LM statistics: history counts saved, two batch slices
    // appended (one REPLAYED under its original batch id — the ledger
    // must skip it or every count doubles and the hash breaks), then
    // documents scored against the merged index. hist ∪ batches == the
    // whole documents table, so the oracle recomputes q70's count tables
    // over `documents` and scores the same subset — bit-equality via the
    // shared (bc+1)/(uc+V) arithmetic and sorted-fold mean.
    "q93_incremental_lm" -> ((s, d) => {
      val doc = t(s, d, "documents")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_lmstats_${Integer.toHexString(d.hashCode)}").getPath
      val hist = doc.filter(col("doc_id") % 3 =!= 0)
      val batchA = doc.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
      val batchB = doc.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0)
      Stages.timed("q93_incremental_lm", "build_save") {
        Corpus.saveLmStats(hist, path, "doc_id", "text")
      }
      Stages.timed("q93_incremental_lm", "append") {
        Corpus.appendLmStats(batchA, path, "doc_id", "text", "batchA")
      }
      Stages.timed("q93_incremental_lm", "append_replay") {
        Corpus.appendLmStats(batchA, path, "doc_id", "text", "batchA") // replay: no-op
      }
      Stages.timed("q93_incremental_lm", "append_b") {
        Corpus.appendLmStats(batchB, path, "doc_id", "text", "batchB")
      }
      Stages.timed("q93_incremental_lm", "compact") {
        Corpus.compactLmStats(s, path) // must not change any merged count
      }
      Corpus.lmScoreAgainstStats(doc.filter(col("doc_id") < 50), path,
          "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Incremental heavy hitters: three user_id slices of events (their
    // union is the whole table) contribute Misra–Gries segments — one
    // appended twice under its batch id, so the ledger is under the gate
    // — then the compacted merge must equal q71's exact count table
    // (capacity 64 >> 5 event types: no truncation ever fires and the
    // mergeable-summaries sum is exact).
    "q94_incremental_hh" -> ((s, d) => {
      val ev = t(s, d, "events")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_hh_${Integer.toHexString(d.hashCode)}").getPath
      Stages.timed("q94_incremental_hh", "build_save") {
        Profiling.saveHhSketch(ev.filter(col("user_id") % 3 === 0), path,
          "event_type", capacity = 64)
      }
      Stages.timed("q94_incremental_hh", "append") {
        Profiling.appendHhSketch(ev.filter(col("user_id") % 3 === 1), path, "hhA")
      }
      Stages.timed("q94_incremental_hh", "append_replay") {
        Profiling.appendHhSketch(ev.filter(col("user_id") % 3 === 1), path, "hhA")
      }
      Stages.timed("q94_incremental_hh", "append_b") {
        Profiling.appendHhSketch(ev.filter(col("user_id") % 3 === 2), path, "hhB")
      }
      Stages.timed("q94_incremental_hh", "compact") {
        Profiling.compactHhSketch(s, path)
      }
      Profiling.mergedHeavyHitters(s, path)
    }),

    // Decontamination against the PERSISTED probe-gram index: q38's
    // exact semantics (same hash family, n pinned in index meta) with
    // the probe side a saved artifact — the oracle is q38's, so a
    // missed contaminated doc, a stale n, or a hash-family drift
    // between save and probe all break the hash.
    "q95_decontaminate_index" -> ((s, d) => {
      val doc = t(s, d, "documents")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_probes_${Integer.toHexString(d.hashCode)}").getPath
      Stages.timed("q95_decontaminate_index", "build_save") {
        Corpus.saveProbeGrams(doc.filter(col("doc_id") < 5), path, "text", n = 3)
      }
      Corpus.decontaminateAgainstIndex(doc, path, "doc_id", "text")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Tombstone lifecycle on the digest index: history saved, a slice
    // DELETED by text (replayed — idempotent), a sub-slice revived by
    // re-append, the index compacted (sidecar applied + dropped), then
    // a batch exact-deduped against it. The oracle re-derives effective
    // membership as history-digests minus (deleted minus revived) with
    // null-safe set algebra — a tombstone that leaks, fails to clear,
    // or survives compaction breaks the hash. Content-keyed semantics:
    // deleting one doc's text deletes membership for every doc sharing
    // that text, exactly what the digest index stores.
    "q96_tombstone_exact" -> ((s, d) => {
      val doc = t(s, d, "documents")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_digdel_${Integer.toHexString(d.hashCode)}").getPath
      val hist = doc.filter(col("doc_id") % 3 =!= 0)
      Stages.timed("q96_tombstone_exact", "build_save") {
        Dedup.saveDigestIndex(hist, path, "text")
      }
      val del = hist.filter(col("doc_id") % 5 === 0)
      Stages.timed("q96_tombstone_exact", "delete") {
        Dedup.deleteFromDigestIndex(del, path, "text")
      }
      Stages.timed("q96_tombstone_exact", "delete_replay") {
        Dedup.deleteFromDigestIndex(del, path, "text") // idempotent no-op
      }
      Stages.timed("q96_tombstone_exact", "revive_append") {
        Dedup.appendDigestIndex(hist.filter(col("doc_id") % 10 === 0),
          path, "text")
      }
      Stages.timed("q96_tombstone_exact", "compact") {
        Dedup.compactDigestIndex(s, path) // applies sidecar, drops it
      }
      Dedup.incrementalExact(doc.filter(col("doc_id") % 3 === 0), path,
          "doc_id", "text")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Tombstone lifecycle on the IVF index: q89's build/append flow,
    // then four ids deleted (replayed), one revived via re-append, the
    // index compacted, and the search re-run. The oracle is q89's full
    // SQL re-derivation with the three effectively-deleted ids excluded
    // from the neighbor side — so a probe that still returns a deleted
    // id, a revive that fails, or a compaction that drops a live row
    // all break the hash.
    "q97_tombstone_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val idxPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_ivfdel_${Integer.toHexString(d.hashCode)}").getPath
      Stages.timed("q97_tombstone_ivf", "build_save") {
        val (cells, cents) = Similarity.ivfAssign(
          emb.filter(col("vec_id") >= 250), "vec_id", "embedding",
          nCells = 16)
        Similarity.saveIvfIndex(cells, cents, idxPath)
        cells.unpersist(blocking = false)
      }
      Stages.timed("q97_tombstone_ivf", "append") {
        Similarity.appendIvfIndex(emb.filter(col("vec_id") < 250), idxPath,
          "vec_id", "embedding")
      }
      import s.implicits._
      val delIds = Seq(10L, 11L, 300L, 301L).toDF("vec_id")
      Stages.timed("q97_tombstone_ivf", "delete") {
        Similarity.deleteFromIvfIndex(delIds, idxPath, "vec_id")
      }
      Stages.timed("q97_tombstone_ivf", "delete_replay") {
        Similarity.deleteFromIvfIndex(delIds, idxPath, "vec_id")
      }
      Stages.timed("q97_tombstone_ivf", "revive_append") {
        // clears 10's tombstone; its persisted cell row revives, and
        // the idempotence anti-join appends nothing
        Similarity.appendIvfIndex(emb.filter(col("vec_id") === 10L),
          idxPath, "vec_id", "embedding")
      }
      Stages.timed("q97_tombstone_ivf", "compact") {
        Similarity.compactIvfIndex(s, idxPath, "vec_id")
      }
      val (loaded, loadedCents) = Similarity.loadIvfIndex(s, idxPath)
      Similarity.ivfSearch(loaded, loadedCents,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, nProbe = 4)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 6).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Three-dimensional Z-order: lineitem clustered on (shipdate,
    // partkey, suppkey) via the N-way bit interleave, manifest built,
    // then a 3-D box slice answered through the pruned path. Same
    // layout-invariant oracle contract as q91 — the plain filter +
    // aggregate over the original table — so the generalized interleave,
    // its per-dim stats, and the 3-range pruning lose and invent
    // nothing.
    "q99_zorder3" -> ((s, d) => {
      val dims = Seq("l_shipdate", "l_partkey", "l_suppkey")
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_zorder3_${Integer.toHexString(d.hashCode)}").getPath
      Stages.timed("q99_zorder3", "zorder_write") {
        Layout.writeZOrdered(t(s, d, "lineitem"), dir, dims, files = 16)
      }
      Stages.timed("q99_zorder3", "manifest") {
        Layout.writeManifest(s, dir, dims)
      }
      Layout.prunedRead(s, dir, Seq(
          Layout.ColRange("l_shipdate",
            lit("1996-01-01").cast("timestamp"),
            lit("1996-12-31").cast("timestamp")),
          Layout.ColRange("l_partkey", lit(10L), lit(59L)),
          Layout.ColRange("l_suppkey", lit(2L), lit(5L))))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Real PCM audio features: every doc gets a synthesized 16-bit WAV
    // whose samples are plain integer arithmetic over (doc_id, frame,
    // channel); WavCodec decodes them back and emits per-channel
    // RMS/peak. The oracle regenerates the SAME samples in SQL and
    // recomputes the statistics — an off-by-one in the frame walk, a
    // sign error in the 16-bit decode, or a channel de-interleave bug
    // all break the hash. (q86 keeps the header-metadata gate; this
    // gates the sample DECODE.)
    "q98_wav_features" -> ((s, d) =>
      Multimodal.wavChannelFeatures(
          Multimodal.withPcmColumn(t(s, d, "documents"), "doc_id", "text"))
        .select(col("doc_id"), col("channel"), col("sample_rate"),
          col("n_frames"), round(col("rms"), 6).as("rms"), col("peak"))
        .orderBy(col("doc_id"), col("channel"))),

    // Physical row deletes on a z-ordered table: write, manifest, then
    // deleteByIds rewrites ONLY the files whose manifest id range can
    // hold a doomed key (plus a replay that must be a 0-file no-op),
    // and the pruned read answers a slice over what remains. The
    // oracle is the plain filter with the deleted keys excluded — a
    // retained doomed row, a dropped survivor, an orphaned manifest
    // row that crashes the pruned read, or a non-idempotent replay all
    // break the hash.
    "q100_layout_delete" -> ((s, d) => {
      val dims = Seq("l_shipdate", "l_orderkey")
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_zdelete_${Integer.toHexString(d.hashCode)}").getPath
      val li = t(s, d, "lineitem")
      Stages.timed("q100_layout_delete", "zorder_write") {
        Layout.writeZOrdered(li, dir, dims, files = 16)
      }
      Stages.timed("q100_layout_delete", "manifest") {
        Layout.writeManifest(s, dir, dims)
      }
      val doomed = li.filter(col("l_orderkey") % 10 === 3)
        .select(col("l_orderkey"))
      Stages.timed("q100_layout_delete", "delete") {
        Layout.deleteByIds(s, dir, dims, "l_orderkey", doomed): Unit
      }
      Stages.timed("q100_layout_delete", "delete_replay") {
        // same ids again: candidates hold no matching rows — no rewrite
        Layout.deleteByIds(s, dir, dims, "l_orderkey", doomed): Unit
      }
      Layout.prunedRead(s, dir, Seq(
          Layout.ColRange("l_shipdate",
            lit("1996-01-01").cast("timestamp"),
            lit("1996-12-31").cast("timestamp"))))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Partitioned-table layout composition: a hive-partitioned root
    // whose leaves are z-clustered and carry per-leaf manifests under
    // root/_manifests (invisible to plain readers). The read prunes at
    // three granularities — partition directories, then each surviving
    // leaf's file manifest, then parquet row-group stats — and must be
    // row-identical to the plain filtered scan (the layout-invariant
    // oracle): a leaf wrongly skipped, a manifest row misattributed
    // across leaves, or the partition column lost in the basePath
    // reassembly all break the hash.
    "q101_partitioned_layout" -> ((s, d) => {
      val dims = Seq("l_shipdate", "l_partkey")
      val root = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_partz_${Integer.toHexString(d.hashCode)}").getPath
      val li = t(s, d, "lineitem")
      Stages.timed("q101_partitioned_layout", "partitioned_write") {
        Layout.writeZOrderedPartitioned(li, root, "l_returnflag", dims,
          files = 12)
      }
      Stages.timed("q101_partitioned_layout", "manifests") {
        Layout.updateManifestPartitioned(s, root, dims): Unit
      }
      Layout.prunedReadPartitioned(s, root, Seq(
          Layout.ColRange("l_returnflag", lit("N"), lit("R")),
          Layout.ColRange("l_shipdate",
            lit("1996-01-01").cast("timestamp"),
            lit("1996-12-31").cast("timestamp")),
          Layout.ColRange("l_partkey", lit(10L), lit(59L))))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // MP4 per-sample tables: every doc gets a synthesized MP4 whose
    // stts/stsz/mdhd fields are integer arithmetic over doc_id; the
    // box walk parses them back into a per-frame table (frame sizes +
    // decode durations — the frame-level metadata video pipelines
    // shard and filter by, no codec involved). The oracle regenerates
    // the table from the same arithmetic — a box-size slip, an
    // stts-run expansion bug, or a misread timescale all break the
    // hash.
    "q102_mp4_samples" -> ((s, d) =>
      Multimodal.mp4FrameTable(
          Multimodal.withMp4SampleColumn(t(s, d, "documents"), "doc_id"))
        .select(col("doc_id"), col("frame_idx"), col("frame_bytes"),
          col("dur_units"), col("timescale"))
        .orderBy(col("doc_id"), col("frame_idx"))),

    // AVI container walk: synthesized RIFF/AVI payloads with
    // arithmetic header parameters; detectMeta must recover width /
    // height / frame count / duration from the avih header + the movi
    // chunk WALK (frames actually present, not the header's claim).
    // The MJPEG pixel-decode half of the AVI story is spec-gated
    // (JDK-encoder fixtures; JPEG bytes aren't SQL-regenerable).
    "q103_avi_meta" -> ((s, d) =>
      Multimodal.detectMeta(
          Multimodal.withAviColumn(t(s, d, "documents"), "doc_id"))
        .select(col("doc_id"),
          col("meta.media_type").as("media_type"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.n_frames").as("n_frames"),
          col("meta.duration_ms").as("duration_ms"))
        .orderBy(col("doc_id"))),

    // The partitioned table's full WRITE lifecycle under the
    // layout-invariant oracle: initial load, a second batch appended
    // through the hive router (small files pile up per leaf), manifest
    // refresh, leaf compaction (retire-first promotion per leaf), and
    // a cross-partition id takedown — then the composed three-level
    // pruned read. The oracle is the plain filtered scan minus the
    // doomed ids: a row lost in compaction's rename dance, a delete
    // that missed a leaf, or a manifest left stale by either breaks
    // the hash.
    "q104_partitioned_lifecycle" -> ((s, d) => {
      val dims = Seq("l_shipdate", "l_partkey")
      val root = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_partlc_${Integer.toHexString(d.hashCode)}").getPath
      new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      val li = t(s, d, "lineitem")
      Stages.timed("q104_partitioned_lifecycle", "initial_write") {
        Layout.writeZOrderedPartitioned(
          li.filter(col("l_orderkey") % 2 === 0), root, "l_returnflag",
          dims, files = 8)
      }
      Stages.timed("q104_partitioned_lifecycle", "append") {
        Layout.appendZOrderedPartitioned(
          li.filter(col("l_orderkey") % 2 =!= 0), root, "l_returnflag",
          dims, files = 8)
      }
      Stages.timed("q104_partitioned_lifecycle", "manifests") {
        Layout.updateManifestPartitioned(s, root, dims): Unit
      }
      Stages.timed("q104_partitioned_lifecycle", "compact") {
        // budget 4/6: only the over-populated leaf compacts (the
        // returnflag=N leaf holds ~half the rows and crosses the file
        // budget; A and R stay untouched — compaction selectivity is
        // part of what the stage map shows), and 4 files keep each
        // file's partkey box a curve segment the delete below can
        // prune against instead of rewriting every file
        Layout.compactPartitioned(s, root, dims, filesPerLeaf = 4,
          maxFilesPerLeaf = 6): Unit
      }
      Stages.timed("q104_partitioned_lifecycle", "delete") {
        // a NARROW id corner: per-leaf manifests bound the rewrite to
        // the files whose partkey boxes can hold it — the takedown
        // cost model (a scattered set would honestly rewrite the
        // table; that shape is q100's flat-table territory)
        Layout.deleteByIdsPartitioned(s, root, dims, "l_partkey",
          li.select(col("l_partkey")).distinct()
            .filter(col("l_partkey").between(10L, 14L))): Unit
      }
      Layout.prunedReadPartitioned(s, root, Seq(
          Layout.ColRange("l_returnflag", lit("N"), lit("R")),
          Layout.ColRange("l_shipdate",
            lit("1996-01-01").cast("timestamp"),
            lit("1996-12-31").cast("timestamp")),
          Layout.ColRange("l_partkey", lit(10L), lit(79L))))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Skew-aware join: the fact's heaviest keys route through a
    // broadcast hash join (no shuffle for the rows that would form the
    // hotspot partition), cold keys stay on the shuffle path, and the
    // union must be EXACTLY the plain join — the hot set is a
    // performance hint, never a semantic input. The oracle is the
    // plain join: a row double-counted across branches, a hot key
    // leaking into the cold path, or a null key mishandled by the
    // split all break the hash.
    "q105_skew_join" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val part = t(s, d, "part")
        .withColumnRenamed("p_partkey", "l_partkey")
      SkewJoin.joinSkewed(li, part, "l_partkey",
          SkewJoin.hotKeys(li, "l_partkey", topN = 32))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))
        .orderBy(col("p_brand"))
    }),

    // Declarative validation suite: the reference's CHECK / NOT NULL /
    // UNIQUE / FK constraints (schema.sql:9-71) as a one-pass batch
    // report — every scalar rule a counter in ONE aggregate,
    // uniqueness a key-only shuffle, the FK an anti-join. The oracle
    // re-derives each counter as plain SQL; the suite includes a rule
    // that FAILS (l_extendedprice cap) so both report outcomes are
    // pinned.
    "q106_validation" -> ((s, d) =>
      Validation.report(t(s, d, "lineitem"), Seq(
        Validation.NotNull("l_orderkey"),
        Validation.InRange("l_quantity", lit(1), lit(50)),
        Validation.InRange("l_extendedprice", lit(0), lit(50000)),
        Validation.InSet("l_returnflag", Seq("A", "N", "R")),
        Validation.Matches("l_linestatus", "^[OF]$"),
        Validation.Unique(Seq("l_orderkey", "l_linenumber")),
        Validation.FkExists("l_orderkey", t(s, d, "orders"),
          "o_orderkey")))),

    // Deterministic hash split: train/val/test membership as a pure
    // function of the id (md5-prefix bucket vs cumulative-weight
    // thresholds) — re-derivable by any engine from the id alone,
    // which is exactly what the oracle does: DuckDB recomputes every
    // row's bucket and split from scratch and the per-(split, lang)
    // counts must agree exactly. No sampling, no seed, no stored
    // assignment state.
    // assignSplit REFUSES null ids by contract (split membership must be
    // derivable from the id — SplitsSpec gates the refusal); this query
    // makes the caller's decision explicit: exclude them at the edge,
    // oracle mirroring
    "q107_hash_split" -> ((s, d) =>
      Splits.assignSplit(t(s, d, "documents").filter(col("doc_id").isNotNull),
          "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("split"), col("lang"))),

    // Product quantization, end to end under the oracle: train 4×8
    // subspace codebooks (one deterministic Lloyd iteration), encode
    // the corpus to 4 code ints + a true norm, ADC-score via per-query
    // lookup tables, shortlist 40, exact-rescore to top-10. The oracle
    // unrolls ALL of it in SQL — init slices, per-subspace argmin,
    // decimal-exact recentroids, LUT sums, the ADC tie-break, and the
    // rescore — so a drift anywhere in the train→encode→search chain
    // breaks the hash (the q28 discipline, applied to PQ).
    "q108_pq_search" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.pqRescoredTopK(emb, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, m = 4, kCodes = 8, iters = 1,
          candidateFactor = 4)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 6).as("cos"),
          col("rank").cast("int").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Gap-based sessionization through Spark's native session_window
    // (the same expression runs incrementally under a watermark in
    // Structured Streaming — the batch face is what the oracle can
    // check). The oracle re-derives sessions the classic SQL way
    // (lag + running-sum islands, breaking when silence EXCEEDS the
    // gap — the touching-windows-merge boundary SessionizeSpec pins),
    // so the two formulations must agree session for session.
    "q109_sessionize" -> ((s, d) =>
      graft.streaming.Sessionize.sessions(t(s, d, "events"), "user_id",
          "ts", "6 hours",
          Seq(sum(col("value").cast("decimal(18,6)")).cast("double")
            .as("total_value")))
        .orderBy(col("user_id"), col("session_start"))),

    // Line-level boilerplate removal over a synthesized multi-line
    // corpus (the documents table is single-line, so template lines
    // are composed from doc_id arithmetic — the q102 pattern): a
    // shared header on every doc, a promo line on even ids, one of
    // five footers. All three families cross the minDocs=5 threshold
    // and must vanish; each doc's unique body line must survive in
    // place. The oracle rebuilds the same corpus and re-derives the
    // line frequencies from scratch.
    "q110_boilerplate" -> ((s, d) =>
      Corpus.stripBoilerplate(
        t(s, d, "documents").select(col("doc_id"),
          concat_ws("\n", lit("shared header"), col("text"),
            when(col("doc_id") % 2 === 0, lit("promo banner")),
            concat(lit("footer "), (col("doc_id") % 5).cast("string")))
            .as("text")),
        "doc_id", "text", minDocs = 5)
        .orderBy(col("doc_id"))),

    // The PQ index's full persisted lifecycle, the sixth index family:
    // codebooks trained on HISTORY only, history encoded and saved,
    // the batch appended twice against frozen codebooks (the replay
    // must be an exact no-op — a duplicated code row double-hits the
    // ADC sum's group and breaks the hash), five ids tombstoned, then
    // ADC shortlist + exact rescore from the loaded index. The oracle
    // re-derives the chain with training restricted to history and the
    // deleted ids excluded from the neighbor side.
    "q111_incremental_pq" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val hist = emb.filter(col("vec_id") < 400)
      val batch = emb.filter(col("vec_id") >= 400)
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_pqidx_${Integer.toHexString(d.hashCode)}").getPath
      Stages.timed("q111_incremental_pq", "build") {
        val books = Similarity.pqTrain(hist, "vec_id", "embedding",
          m = 4, k = 8, iters = 1)
        Similarity.savePqIndex(
          Similarity.pqEncode(hist, "vec_id", "embedding", books),
          books, path, "vec_id")
      }
      Stages.timed("q111_incremental_pq", "append") {
        Similarity.appendPqIndex(batch, path, "vec_id", "embedding")
        // the replay: every id anti-joins away, range-pruned
        Similarity.appendPqIndex(batch, path, "vec_id", "embedding")
      }
      Stages.timed("q111_incremental_pq", "delete") {
        Similarity.deleteFromPqIndex(
          emb.filter(col("vec_id").between(100L, 104L))
            .select(col("vec_id")), path, "vec_id")
      }
      val (codes, books) = Similarity.loadPqIndex(s, path)
      val queries = emb.filter(col("vec_id") < 5)
      val cand = Similarity.pqAdcTopK(
        codes.withColumnRenamed("vec_id", "id"), books, queries,
        "vec_id", "embedding", k = 40)
      Similarity.exactRescore(emb, queries, "vec_id", "embedding",
          cand, k = 10)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 6).as("cos"),
          col("rank").cast("int").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Needle lookup through a bloom-filtered z-layout: the probe
    // column (l_orderkey) is NOT a z-order dim — min/max boxes can't
    // prune it — so the read relies on the pushed IN plus the per-row-
    // group bloom filters the write laid down. Layout-invariant
    // oracle: the plain IN filter; a bloom false-negative (impossible
    // by construction, which is the point) or a lookup that dropped a
    // file would lose rows and break the hash.
    "q112_point_lookup" -> ((s, d) => {
      val dims = Seq("l_shipdate", "l_partkey")
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_bloomz_${Integer.toHexString(d.hashCode)}").getPath
      val li = t(s, d, "lineitem")
      Stages.timed("q112_point_lookup", "bloom_write") {
        Layout.writeZOrdered(li, dir, dims, files = 12,
          bloomFor = Seq("l_orderkey"))
        Layout.writeManifest(s, dir, dims)
      }
      Layout.lookupByIds(s, dir, "l_orderkey",
          Seq(3L, 7L, 500L, 999L, 1200L))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Distributed BPE training, the q28/q108 discipline applied to a
    // LOOP the driver steers: 12 merge decisions, each an aggregation
    // over the vocabulary table (never the corpus) with a (count desc,
    // left, right) argmax. The oracle re-runs the entire loop in SQL —
    // same sentinel-wrapped symbol strings, same literal left-to-right
    // replace, same tie-break — so any divergence in ANY of the 12
    // decisions (or in the pair arithmetic feeding them) breaks the
    // hash. Both sides run on the SAME deterministic sub-corpus
    // (doc_id % 20 == 0, ~5% of docs): the merge-loop semantics under
    // test are corpus-size-independent, and the full-corpus oracle's
    // 12 chained CTE recounts cost ~10 min each in DuckDB at sf0.01
    // (VERDICT r10) — enough to kill the driver's checker window. The
    // full-corpus path stays exercised by Bench and BpeSpec.
    "q113_bpe_train" -> ((s, d) =>
      Bpe.train(t(s, d, "documents").filter(col("doc_id") % 20 === 0),
          "text", numMerges = 12)
        .orderBy(col("rank"))),

    // The trained tokenizer's corpus token frequencies, computed from
    // the word table alone (token count = Σ word count × occurrences
    // in word); the oracle folds its own 12 re-derived merges over its
    // own word table and must land on the identical vocabulary. Same
    // doc_id % 20 sub-corpus as q113, same reason.
    "q114_bpe_vocab" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") % 20 === 0)
      val merges = Bpe.train(docs, "text", numMerges = 12)
        .orderBy(col("rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.vocab(docs, "text", merges).orderBy(col("token"))
    }),

    // The incremental histogram index — the EXACT member of the
    // incremental-profiling family: fixed-bounds bin counts are
    // additive, so build + ledgered append (replayed id is a no-op) +
    // lossless compaction must land on exactly the one-shot counts the
    // oracle derives with the same bin arithmetic, explicit
    // underflow/overflow bins included.
    "q115_incremental_histogram" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_histidx_${Integer.toHexString(d.hashCode)}").getPath
      Stages.timed("q115_incremental_histogram", "build") {
        Profiling.saveHistogramIndex(
          li.filter(col("l_orderkey") % 2 === 1), path,
          "l_extendedprice", bins = 20, lo = 1000.0, hi = 100000.0)
      }
      Stages.timed("q115_incremental_histogram", "append") {
        Profiling.appendHistogramIndex(
          li.filter(col("l_orderkey") % 2 === 0), path, "b1"): Unit
        // the replay: ledger-recorded id, nothing appended
        Profiling.appendHistogramIndex(
          li.filter(col("l_orderkey") % 2 === 0), path, "b1"): Unit
      }
      Stages.timed("q115_incremental_histogram", "compact") {
        Profiling.compactHistogramIndex(s, path)
      }
      Profiling.mergedHistogramIndex(s, path)
    }),

    // Duration-capped sessions — the session shape session_window
    // cannot express (close on inactivity OR on hitting a max
    // duration), so assignment is a per-user sorted fold (the
    // flatMapGroupsWithState streaming face shares the rule;
    // SessionizeSpec pins their equivalence). The oracle walks the
    // same rule as a RECURSIVE CTE — event i's session start depends
    // on event i−1's, which is exactly what recursion expresses — and
    // must agree session for session.
    "q116_capped_sessions" -> ((s, d) =>
      graft.streaming.Sessionize.cappedSessions(t(s, d, "events"),
          "user_id", "ts", gap = "6 hours", cap = "12 hours")
        .orderBy(col("user_id"), col("session_start"))),

    // IVF-PQ — the two ANN families composed the production way:
    // coarse cells bound WHICH rows a query scores, residual PQ codes
    // bound what each row costs, and the score decomposes exactly as
    // q·c (one term per probed cell) + the residual ADC sum. The
    // oracle chains BOTH unrolled trainings — cell k-means, then
    // per-subspace k-means over the float residuals — through probes,
    // LUTs, the decomposed ADC, and the exact rescore; a drift in
    // either training, the residual arithmetic, or the decomposition
    // breaks the hash.
    "q117_ivfpq_search" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val queries = emb.filter(col("vec_id") < 5)
      val (enc, cents, books) = Similarity.ivfPqBuild(emb, "vec_id",
        "embedding", nCells = 8, m = 4, kCodes = 8)
      val cand = Similarity.ivfPqSearch(enc, cents, books, queries,
        "vec_id", "embedding", k = 40, nProbe = 4)
      Similarity.exactRescore(emb, queries, "vec_id", "embedding",
          cand, k = 10)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 6).as("cos"),
          col("rank").cast("int").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // MJPEG-in-MP4 sample LOCATION (q102's discipline applied to the
    // full stsd/stsc/stco/co64 chain): every doc gets a synthesized
    // MJPEG-profile MP4 whose frame sizes and filler bytes are integer
    // arithmetic over doc_id, packed two frames per chunk (odd counts
    // → multi-run stsc) with co64 offsets on even ids; the walk slices
    // each sample back out of mdat and reports its size + unsigned
    // byte sum. The oracle regenerates both from the arithmetic — a
    // misexpanded stsc run, a misread co64, or an off-by-one slice
    // all break the hash (the filler is position-sensitive).
    "q118_mjpeg_mp4" -> ((s, d) =>
      Multimodal.mjpegMp4FrameTable(
          Multimodal.withMjpegMp4Column(t(s, d, "documents"), "doc_id"))
        .orderBy(col("doc_id"), col("track_idx"), col("frame_idx"))),

    // Mergeable t-digest percentile (the bounded-memory A4 path, r12):
    // the estimate itself is approximate, so the CONTRACT is its rank —
    // the engine computes each group's sketch median, then exactly
    // counts what fraction of the group lies at or below it; the oracle
    // pins that rank inside the δ=100 bound for every group. A broken
    // digest (merge, interpolation, serialization) lands outside the
    // bound and hash-mismatches. Same verdict-carrying shape as q23b's
    // recall contract.
    "q119_tdigest_rank" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val est = li.groupBy("l_returnflag")
        .agg(graft.functions.TDigestSketch
            .percentileAgg(col("l_extendedprice"), 0.5).as("est"),
          count(lit(1)).as("n"))
      li.join(broadcast(est), Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg((sum(when(col("l_extendedprice") <= col("est"), 1L)
            .otherwise(0L)).cast("double") / max(col("n"))).as("rank_q"))
        .select(col("l_returnflag"),
          (abs(col("rank_q") - 0.5) <= 0.02).as("within_bound"))
        .orderBy(col("l_returnflag"))
    }),

    // Token-budget mixture fill (r12): per-source hash-order prefix
    // within a token budget — the operator that turns mixture weights
    // into a document manifest. The running sums come from the binned
    // skew-proof cumsum (never a per-source window); the oracle is the
    // naive one-window form, so any bin/offset arithmetic slip breaks
    // the hash. Budgets sized so every code path discriminates: src0
    // mid-fill (prefix stops inside the source), src1 over-provisioned
    // (everything kept), src2 tiny (a handful), src3 absent (dropped).
    "q120_token_budget" -> ((s, d) =>
      Corpus.tokenBudgetFill(t(s, d, "documents"), "source", "doc_id",
          "text", Seq("src0" -> 5000L, "src1" -> 10000000L, "src2" -> 600L))
        .select(col("source"), col("doc_id"), col("n_tokens"),
          col("cum_tokens"))
        .orderBy(col("source"), col("doc_id"))),

    // Per-domain quality gate (r12): keep each source's top 40% by
    // n_chars (id tiebreak) — domain-RELATIVE filtering, so a global
    // threshold can't delete a whole lower-scoring domain. dom_rank is
    // the binned-cumsum rank; the oracle recomputes it with a plain
    // row_number window, pinning the tie discipline exactly.
    "q121_domain_gate" -> ((s, d) =>
      Corpus.keepTopByGroup(t(s, d, "documents"), "source", "doc_id",
          "n_chars", fraction = 0.4)
        .select(col("source"), col("doc_id"),
          col("n_chars").cast("long").as("n_chars_k"),
          col("dom_rank"))
        .orderBy(col("source"), col("doc_id"))),

    // Quality-survivor corpus dedup (r12): q81's full pipeline
    // (candidates → exact verification → clusters) but each cluster
    // keeps its LONGEST member (n_chars desc, id tiebreak) instead of
    // its min id — the keep-the-best-copy selection production
    // pipelines want. The oracle reruns the exact all-pairs ground
    // truth and picks the same argmax per recursive-CTE cluster.
    "q122_dedup_best" -> ((s, d) =>
      Dedup.dedupCorpusBest(t(s, d, "documents"), "doc_id", "text",
          priorityCol = "n_chars", threshold = 0.8, maxBucket = 512)
        .select(col("doc_id"), col("cluster"), col("n_dropped"),
          col("n_chars").cast("long").as("kept_chars"))
        .orderBy(col("doc_id")))
    ,

    // Epoch upsampling manifest (r12): q120's budget fill generalized
    // to budgets PAST one epoch — whole-epoch repeats by integral
    // division plus the hash-order remainder prefix, emitted compact
    // (n_copies per doc). Budgets chosen to discriminate every regime
    // at sf0.01 totals (~1.4k tokens/source): src0 3 epochs + remainder,
    // src1 SUB-epoch (pure q120 membership), src2 10 epochs + remainder,
    // src3 absent. The oracle re-derives epochs with DuckDB's integral
    // `//` over the naive window totals.
    "q123_epoch_fill" -> ((s, d) =>
      Corpus.epochFill(t(s, d, "documents"), "source", "doc_id", "text",
          Seq("src0" -> 5000L, "src1" -> 800L, "src2" -> 15000L))
        .select(col("source"), col("doc_id"), col("n_tokens"),
          col("n_copies"))
        .orderBy(col("source"), col("doc_id"))),

    // Manifest rehydration (r12): the q123 manifest exploded to one row
    // per (doc, copy_idx) with the deterministic epoch-interleaving
    // shuffle_key; the oracle unnests generate_series over the same
    // recomputed manifest and re-derives the md5 shuffle key.
    "q124_epoch_expand" -> ((s, d) =>
      Corpus.expandCopies(
          Corpus.epochFill(t(s, d, "documents"), "source", "doc_id",
            "text", Seq("src0" -> 5000L, "src1" -> 800L, "src2" -> 15000L)),
          "doc_id", "n_copies")
        .select(col("doc_id"), col("copy_idx"), col("shuffle_key"))
        .orderBy(col("doc_id"), col("copy_idx"))),

    // Budget fill over a PRECOMPUTED weight column (r12): the byWeight
    // face over n_chars — real pipelines budget by a tokenizer's counts
    // computed at ingest, not a whitespace recount. Same selection
    // machinery as q120 (shared preamble + binned cumsum); the oracle is
    // the naive window over coalesce(n_chars, 0).
    "q126_weight_fill" -> ((s, d) =>
      Corpus.tokenBudgetFillByWeight(t(s, d, "documents"), "source",
          "doc_id", "n_chars",
          Seq("src0" -> 5000L, "src1" -> 100000L, "src2" -> 900L))
        .select(col("source"), col("doc_id"), col("fill_weight"),
          col("cum_weight"))
        .orderBy(col("source"), col("doc_id"))),

    // Composed training-run materialization (r12): the whole mixture
    // path in one plan — epoch manifest (q123) → per-copy expansion with
    // the interleaving shuffle key (q124) → shard assignment by that key
    // → per-shard row/token accounting, the numbers a training job reads
    // before it starts. Pure composition of gated operators; the oracle
    // chains the q124 derivation and re-aggregates.
    "q127_training_manifest" -> ((s, d) =>
      Corpus.expandCopies(
          Corpus.epochFill(t(s, d, "documents"), "source", "doc_id",
            "text", Seq("src0" -> 5000L, "src1" -> 800L, "src2" -> 15000L)),
          "doc_id", "n_copies")
        .withColumn("shard", pmod(col("shuffle_key"), lit(8L)))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("n_tokens")).as("shard_tokens"))
        .orderBy(col("shard"))),

    // Contamination audit (r12): q38's screen as a REPORT — which probe
    // leaked into which document, with the distinct-shared-gram count.
    // Same probe set and gram length as q38, so the report's distinct
    // doc set is exactly what q38 drops; the oracle counts shared gram
    // STRINGS where the engine counts shared 64-bit hashes (equal modulo
    // the documented collision odds).
    "q125_contamination_report" -> ((s, d) => {
      val doc = t(s, d, "documents")
      Corpus.contaminationReport(doc,
          doc.filter(col("doc_id") < 5).select(col("doc_id").as("pid"),
            col("text")),
          "doc_id", "pid", "text", n = 3)
        .select(col("doc_id"), col("probe_id"), col("shared_grams"))
        .orderBy(col("doc_id"), col("probe_id"))
    }),

    // Lake time travel (r13): the versioned-snapshot lifecycle end to
    // end — three hash-split batches committed (v1..v3), a versioned
    // delete (v4), a full compaction (v5) — then FOUR as-of reads, all
    // AFTER the delete and compaction rewrote the head. The oracle
    // re-derives each version's membership from the hash splits alone
    // (the layout-invariant stance: a snapshot read must equal the
    // plain filtered scan of the batches live at that version), so a
    // lineage row misattributed, a remove applied too early, a
    // compaction that leaks into history, or an orphan file ingested
    // all break the hash.
    "q128_time_travel" -> ((s, d) => {
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_timetravel_${Integer.toHexString(d.hashCode)}").getPath
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      // version history must restart per run — clear table + lineage
      Seq(dir, dir + "_lineage", dir + "_commit_ledger").foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("source"),
          coalesce(col("n_chars"), lit(0L)).cast("long").as("nc"))
      Stages.timed("q128_time_travel", "commits") {
        (0 to 2).foreach(i => TimeTravel.commitAppend(
          docs.filter(Corpus.hashBucket(col("doc_id"), 3L) === i),
          dir, Seq("doc_id"), files = 2))
      }
      Stages.timed("q128_time_travel", "delete") {
        TimeTravel.commitDelete(s, dir, "doc_id",
          docs.filter(Corpus.hashBucket(col("doc_id"), 7L) === 3)
            .select(col("doc_id"))): Unit
      }
      Stages.timed("q128_time_travel", "compact") {
        TimeTravel.compact(s, dir, Seq("doc_id"), files = 2): Unit
      }
      (2L to 5L).map(v =>
          TimeTravel.readAsOf(s, dir, v)
            .groupBy(col("source"))
            .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("sum_chars"))
            .withColumn("as_of", lit(v)))
        .reduce(_ unionByName _)
        .select(col("as_of"), col("source"), col("n_docs"),
          col("sum_chars"))
        .orderBy(col("as_of"), col("source"))
    }),

    // Fractional mixture fill (r13): the spec form mixtures are actually
    // written in — fractions of ONE total token budget, floor-converted
    // to absolutes and delegated to the q120 fill. Fractions sum to
    // 0.911 (headroom is a legitimate spec); the oracle re-derives
    // floor(fraction × total) in SQL under explicit DOUBLE arithmetic
    // (DuckDB would otherwise compute 0.9 × 100000 in exact DECIMAL
    // while the engine floors an IEEE double product — equal here,
    // divergent for fractions like 0.29 whose double product lands just
    // below the integer), then runs the naive window form. Budgets
    // discriminate: src0 500 mid-fill, src1 90000 over-provisioned,
    // src2 600 mid-fill, src3+ absent.
    "q129_mixture_fill" -> ((s, d) =>
      Corpus.mixtureFill(t(s, d, "documents"), "source", "doc_id",
          "text", totalBudget = 100000L,
          Seq("src0" -> 0.005, "src1" -> 0.9, "src2" -> 0.006))
        .select(col("source"), col("doc_id"), col("n_tokens"),
          col("cum_tokens"))
        .orderBy(col("source"), col("doc_id"))),

    // Rollback + version diff (r13): the bad-batch undo audited by the
    // key-level diff. Two hash-split commits, a versioned delete, a
    // METADATA-ONLY rollback to the pre-delete head, then the diffs
    // across both transitions: v2→v3 must show exactly the deleted keys
    // disappearing (survivor-rewrite keys cancel between the changed
    // file sets), v3→v4 exactly the same keys reappearing. A rollback
    // that copies data, a diff that reads unchanged files wrongly, or a
    // live-set rule that mishandles re-adds all break the hash.
    "q130_tt_rollback_diff" -> ((s, d) => {
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_ttrb_${Integer.toHexString(d.hashCode)}").getPath
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(dir, dir + "_lineage", dir + "_commit_ledger").foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("source"),
          coalesce(col("n_chars"), lit(0L)).cast("long").as("nc"))
      Stages.timed("q130_tt_rollback_diff", "commits") {
        (0 to 1).foreach(i => TimeTravel.commitAppend(
          docs.filter(Corpus.hashBucket(col("doc_id"), 2L) === i),
          dir, Seq("doc_id"), files = 2))
      }
      Stages.timed("q130_tt_rollback_diff", "delete_rollback") {
        TimeTravel.commitDelete(s, dir, "doc_id",
          docs.filter(Corpus.hashBucket(col("doc_id"), 7L) === 3)
            .select(col("doc_id")))
        TimeTravel.rollback(s, dir, 2L): Unit
      }
      TimeTravel.diffByKey(s, dir, 2L, 3L, "doc_id")
        .withColumn("from_v", lit(2L))
        .unionByName(TimeTravel.diffByKey(s, dir, 3L, 4L, "doc_id")
          .withColumn("from_v", lit(3L)))
        .select(col("from_v"), col("doc_id"), col("change"))
        .orderBy(col("from_v"), col("doc_id"))
    }),

    // Versioned MERGE (r13): the lake's missing write verb. Two
    // hash-split commits, then ONE upsert that both updates (payload
    // nc+1000 for hash bucket 5→2 — ids that exist) and inserts
    // (synthetic negative ids -id-1 for bucket 11→4 — ids that don't).
    // The as-of-2/as-of-3 rollup proves whole-row replacement AND
    // history preservation in one result: version 2 must still read the
    // pre-update payloads. A survivor row lost in the rewrite, an update
    // applied to the wrong generation, or an insert duplicated against
    // its matched sibling all break the hash.
    "q131_tt_upsert" -> ((s, d) => {
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_ttup_${Integer.toHexString(d.hashCode)}").getPath
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(dir, dir + "_lineage", dir + "_commit_ledger").foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("source"),
          coalesce(col("n_chars"), lit(0L)).cast("long").as("nc"))
      Stages.timed("q131_tt_upsert", "commits") {
        (0 to 1).foreach(i => TimeTravel.commitAppend(
          docs.filter(Corpus.hashBucket(col("doc_id"), 2L) === i),
          dir, Seq("doc_id"), files = 2))
      }
      Stages.timed("q131_tt_upsert", "upsert") {
        val updated = docs
          .filter(Corpus.hashBucket(col("doc_id"), 5L) === 2)
          .withColumn("nc", col("nc") + 1000L)
        val inserted = docs
          .filter(Corpus.hashBucket(col("doc_id"), 11L) === 4)
          .select((-col("doc_id") - 1L).as("doc_id"),
            lit("synthetic").as("source"), lit(7L).as("nc"))
        TimeTravel.commitUpsert(s, dir, "doc_id",
          updated.unionByName(inserted), files = 2): Unit
      }
      Seq(2L, 3L).map(v =>
          TimeTravel.readAsOf(s, dir, v)
            .groupBy(col("source"))
            .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("sum_chars"))
            .withColumn("as_of", lit(v)))
        .reduce(_ unionByName _)
        .select(col("as_of"), col("source"), col("n_docs"),
          col("sum_chars"))
        .orderBy(col("as_of"), col("source"))
    }),

    // Row-level change feed (r13): the face an incremental consumer
    // tails. Five commits exercise every change class — appends (feed:
    // inserted), a versioned delete (deleted), an upsert that updates
    // live ids, RE-inserts previously-deleted ids (an update of a
    // missing key IS an insert — presence semantics, not intent), and
    // inserts synthetic ids — and a final compaction, which must feed
    // ZERO rows: every row it moves is content-identical, and the feed
    // cancels rewrites by payload, not by file. Survivor rows leaking
    // into the feed, a missed re-insert, or compaction noise all break
    // the hash.
    "q132_tt_changes" -> ((s, d) => {
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_ttcf_${Integer.toHexString(d.hashCode)}").getPath
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(dir, dir + "_lineage", dir + "_commit_ledger").foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("source"),
          coalesce(col("n_chars"), lit(0L)).cast("long").as("nc"))
      Stages.timed("q132_tt_changes", "commits") {
        (0 to 1).foreach(i => TimeTravel.commitAppend(
          docs.filter(Corpus.hashBucket(col("doc_id"), 2L) === i),
          dir, Seq("doc_id"), files = 2))
      }
      Stages.timed("q132_tt_changes", "delete_upsert_compact") {
        TimeTravel.commitDelete(s, dir, "doc_id",
          docs.filter(Corpus.hashBucket(col("doc_id"), 7L) === 3)
            .select(col("doc_id")))
        val updated = docs
          .filter(Corpus.hashBucket(col("doc_id"), 5L) === 1)
          .withColumn("nc", col("nc") + 500L)
        val inserted = docs
          .filter(Corpus.hashBucket(col("doc_id"), 13L) === 6)
          .select((-col("doc_id") - 1L).as("doc_id"),
            lit("synthetic").as("source"), lit(7L).as("nc"))
        TimeTravel.commitUpsert(s, dir, "doc_id",
          updated.unionByName(inserted), files = 2)
        TimeTravel.compact(s, dir, Seq("doc_id"), files = 2): Unit
      }
      TimeTravel.changeFeedByKey(s, dir, 1L, 5L, "doc_id")
        .orderBy(col("version"), col("doc_id"))
    }),

    // Incremental materialized view (r13): the aggregate that never
    // recomputes. Built at version 2, then the source takes a delete and
    // an upsert; ONE refresh reads only the files those two commits
    // touched (the receipt's file count is spec-asserted — here the
    // ORACLE asserts the harder half: the merged content equals a full
    // recompute of the final membership, including groups whose counts
    // moved both ways and the brand-new synthetic group).
    "q133_matview" -> ((s, d) => {
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_ttmv_${Integer.toHexString(d.hashCode)}").getPath
      val view = dir + "_view"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(dir, dir + "_lineage", dir + "_commit_ledger", view).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("source"),
          coalesce(col("n_chars"), lit(0L)).cast("long").as("nc"))
      Stages.timed("q133_matview", "commits_create") {
        (0 to 1).foreach(i => TimeTravel.commitAppend(
          docs.filter(Corpus.hashBucket(col("doc_id"), 2L) === i),
          dir, Seq("doc_id"), files = 2))
        MatView.create(s, dir, view, Seq("source"), Seq("nc")): Unit
      }
      Stages.timed("q133_matview", "mutate_refresh") {
        TimeTravel.commitDelete(s, dir, "doc_id",
          docs.filter(Corpus.hashBucket(col("doc_id"), 7L) === 3)
            .select(col("doc_id")))
        val updated = docs
          .filter(Corpus.hashBucket(col("doc_id"), 5L) === 2)
          .withColumn("nc", col("nc") + 1000L)
        val inserted = docs
          .filter(Corpus.hashBucket(col("doc_id"), 11L) === 4)
          .select((-col("doc_id") - 1L).as("doc_id"),
            lit("synthetic").as("source"), lit(7L).as("nc"))
        TimeTravel.commitUpsert(s, dir, "doc_id",
          updated.unionByName(inserted), files = 2)
        MatView.refresh(s, view): Unit
      }
      MatView.read(s, view)
        .select(col("source"), col("n_rows"), col("sum_nc"))
        .orderBy(col("source"))
    }),

    // Feed-maintained derived index (r13): the claim behind the feed's
    // pre-images — a CONTENT-keyed consumer (here the exact-dedup digest
    // index) stays current from the feed ALONE, never re-reading the
    // table. Per version: tombstone the pre-image text of every
    // delete/update, append the post-image text of every insert/update.
    // Texts are made per-doc-unique (id-prefixed) so index membership
    // at the end is exactly the live rows' text set — any leak (a
    // missed tombstone, a missed append, an un-revived re-insert, or a
    // pre-image read from the wrong side) breaks the digest-set hash.
    "q134_feed_index" -> ((s, d) => {
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_ttfi_${Integer.toHexString(d.hashCode)}").getPath
      val idx = dir + "_digest_index"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(dir, dir + "_lineage", dir + "_commit_ledger", idx,
        idx + "_tombstones").foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          concat(col("doc_id").cast("string"), lit(":"),
            coalesce(col("text"), lit(""))).as("body"))
      Stages.timed("q134_feed_index", "commits_save") {
        (0 to 1).foreach(i => TimeTravel.commitAppend(
          docs.filter(Corpus.hashBucket(col("doc_id"), 2L) === i),
          dir, Seq("doc_id"), files = 2))
        Dedup.saveDigestIndex(TimeTravel.readAsOf(s, dir, 2L), idx, "body")
      }
      Stages.timed("q134_feed_index", "mutate") {
        TimeTravel.commitDelete(s, dir, "doc_id",
          docs.filter(Corpus.hashBucket(col("doc_id"), 7L) === 3)
            .select(col("doc_id")))
        val updated = docs
          .filter(Corpus.hashBucket(col("doc_id"), 5L) === 2)
          .withColumn("body", concat(col("body"), lit(" u")))
        val inserted = docs
          .filter(Corpus.hashBucket(col("doc_id"), 11L) === 4)
          .select((-col("doc_id") - 1L).as("doc_id"),
            concat(lit("syn:"), col("doc_id").cast("string")).as("body"))
        TimeTravel.commitUpsert(s, dir, "doc_id",
          updated.unionByName(inserted), files = 2): Unit
      }
      Stages.timed("q134_feed_index", "feed_maintain") {
        (3L to 4L).foreach { v =>
          val f = TimeTravel.changeFeed(s, dir, v - 1, v, "doc_id")
          // tombstones BEFORE appends within a version: an update's old
          // text dies, its new text lives — and a re-appended text
          // revives (appendDigestIndex clears its tombstone)
          Dedup.deleteFromDigestIndex(
            f.filter(col("change").isin("deleted", "updated"))
              .select(col("pre.body").as("body")), idx, "body")
          Dedup.appendDigestIndex(
            f.filter(col("change").isin("inserted", "updated"))
              .select(col("body")), idx, "body")
        }
      }
      Dedup.loadDigestIndex(s, idx)
        .select(col("digest")).distinct().orderBy(col("digest"))
    }),

    // The full pretraining data build in ONE plan (r13): exact dedup →
    // decontamination → per-domain quality gate → mixture fill →
    // sequence packing, each stage the already-gated operator (q18, q38,
    // q121, q120, q54), composed end to end the way a user actually runs
    // them. The result is the pack manifest a training job consumes —
    // per (source, pack): docs, tokens, final position. The oracle
    // recomposes every stage in SQL from the same proven formulations,
    // so a drift ANYWHERE in the chain (a survivor lost to the dedup
    // join, a probe gram missed, a gate tie broken differently, a fill
    // prefix off by one row, a pack boundary misplaced) breaks the hash.
    "q135_pipeline" -> ((s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
      val survivors = docs.join(
        Dedup.exact(docs, "doc_id", "text").select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      val clean = Corpus.decontaminate(survivors,
        docs.filter(col("doc_id") < 5), "doc_id", "text", n = 3)
      val gated = Corpus.keepTopByGroup(clean, "source", "doc_id",
        "n_chars", fraction = 0.4)
      val filled = Corpus.tokenBudgetFill(
        gated.select("doc_id", "source", "text"), "source", "doc_id",
        "text", Seq("src0" -> 300L, "src1" -> 10000000L, "src2" -> 250L))
      val packed = Corpus.packSequences(filled, "source", "doc_id",
        "n_tokens", budget = 128L)
      packed.groupBy(col("source"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          max(col("pack_pos")).cast("long").as("last_pos"))
        .orderBy(col("source"), col("pack_id"))
    }),

    // Metadata-only column stats at any version (r13): exact
    // min/max/null-count/row-count from the LINEAGE alone — zero data
    // files read — because every commit records fresh stats for the
    // generation it writes. Two columns × two versions (before/after a
    // versioned delete): the delete's survivor rewrite must refresh the
    // rewritten files' stats, or the v3 extremes/nulls drift from the
    // membership recompute and break the hash.
    "q136_tt_stats" -> ((s, d) => {
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_ttst_${Integer.toHexString(d.hashCode)}").getPath
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(dir, dir + "_lineage", dir + "_commit_ledger").foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("source"), col("n_chars"))
      Stages.timed("q136_tt_stats", "commits_delete") {
        (0 to 1).foreach(i => TimeTravel.commitAppend(
          docs.filter(Corpus.hashBucket(col("doc_id"), 2L) === i),
          dir, Seq("doc_id", "n_chars"), files = 2))
        TimeTravel.commitDelete(s, dir, "doc_id",
          docs.filter(Corpus.hashBucket(col("doc_id"), 7L) === 3)
            .select(col("doc_id"))): Unit
      }
      (2L to 3L).flatMap(v => Seq("doc_id", "n_chars").map(c =>
          TimeTravel.columnStats(s, dir, v, c)
            .withColumn("as_of", lit(v))))
        .reduce(_ unionByName _)
        .select(col("as_of"), col("col_name"), col("min_v"), col("max_v"),
          col("n_nulls"), col("n_rows"))
        .orderBy(col("as_of"), col("col_name"))
    }),

    // Tombstone lifecycle on the MinHash band index (r13): the q83
    // flagger flow with deletes — history ids %5 tombstoned (replayed —
    // idempotent), the %10 subset revived by re-append (same content:
    // the idempotence anti-join declines duplicate band rows and the
    // tombstone clears), the index compacted (physically removing the
    // still-tombstoned rows, dropping the sidecar), then the batch half
    // probed and exact-verified at >= 0.8. The oracle is q83's true
    // cross-pair set with the effectively-deleted neighbors excluded —
    // a probe still surfacing a deleted id, a failed revive, or a
    // compaction dropping a live row all break the hash.
    "q137_tombstone_minhash" -> ((s, d) => {
      val doc = t(s, d, "documents")
      val cut = cachedCount(s, d, "documents") / 2
      val idxPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_mhdel_${Integer.toHexString(d.hashCode)}").getPath
      val hist = doc.filter(col("doc_id") < cut)
      Stages.timed("q137_tombstone_minhash", "build_save") {
        Dedup.saveMinhashIndex(hist, idxPath, "doc_id", "text",
          shingleN = 3, numHashes = 32, bands = 16, maxBucket = 512)
      }
      val del = hist.filter(col("doc_id") % 5 === 0).select(col("doc_id"))
      Stages.timed("q137_tombstone_minhash", "delete_replay_revive") {
        Dedup.deleteFromMinhashIndex(del, idxPath, "doc_id")
        Dedup.deleteFromMinhashIndex(del, idxPath, "doc_id") // idempotent
        Dedup.appendMinhashIndex(hist.filter(col("doc_id") % 10 === 0),
          idxPath, "doc_id", "text")
      }
      Stages.timed("q137_tombstone_minhash", "compact") {
        Dedup.compactMinhashIndex(s, idxPath)
      }
      val cand = Dedup.flagAgainstIndex(doc.filter(col("doc_id") >= cut),
          idxPath, "doc_id", "text")
        .filter(col("est_jaccard") >= 0.4)
        .select(col("doc_id").as("id1"), col("neighbor_id").as("id2"))
      Dedup.ngramJaccard(cand, doc, "doc_id", "text", n = 3)
        .filter(col("jaccard") >= 0.8)
        .select(col("id1").as("doc_id"), col("id2").as("neighbor_id"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("doc_id"), col("neighbor_id"))
    }),

    // Tombstone lifecycle on the SimHash index (r13): q85's incremental
    // flow with deletes — the same %5-tombstone / %10-revive / compact
    // script as q137, on the pigeonhole-exact fingerprint index. Revive
    // re-appends the SAME text, so the r12 content-change guard admits
    // it and the idempotence anti-join declines the duplicate rows. The
    // oracle is q85's exact pair set with effectively-deleted
    // index-side ids excluded.
    "q138_tombstone_simhash" -> ((s, d) => {
      val doc = t(s, d, "documents")
      val cut = cachedCount(s, d, "documents") / 2
      val idxPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_shdel_${Integer.toHexString(d.hashCode)}").getPath
      val hist = doc.filter(col("doc_id") < cut)
      Stages.timed("q138_tombstone_simhash", "build_save") {
        Dedup.saveSimhashIndex(hist, idxPath, "doc_id", "text",
          portable = true)
      }
      val del = hist.filter(col("doc_id") % 5 === 0).select(col("doc_id"))
      Stages.timed("q138_tombstone_simhash", "delete_replay_revive") {
        Dedup.deleteFromSimhashIndex(del, idxPath, "doc_id")
        Dedup.deleteFromSimhashIndex(del, idxPath, "doc_id") // idempotent
        Dedup.appendSimhashIndex(hist.filter(col("doc_id") % 10 === 0),
          idxPath, "doc_id", "text")
      }
      Stages.timed("q138_tombstone_simhash", "compact") {
        Dedup.compactSimhashIndex(s, idxPath)
      }
      Dedup.incrementalSimhashPairs(doc.filter(col("doc_id") >= cut),
          idxPath, "doc_id", "text",
          maxHamming = 3, blocks = 4, maxBucket = 1 << 20)
        .orderBy(col("id1"), col("id2"))
    }),

    // Tombstone lifecycle on the LSH vector index (r13): q90's
    // build/append flow, then the q137 tombstone script on vector ids
    // (%5 deleted + replayed, %10 revived by same-embedding re-append,
    // compacted away), and the probe re-run. The oracle is q90's full
    // portable-plane re-derivation with effectively-deleted ids
    // excluded from the candidate neighbors.
    "q139_tombstone_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val idxPath = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_lshdel_${Integer.toHexString(d.hashCode)}").getPath
      Stages.timed("q139_tombstone_lsh", "build_append") {
        Similarity.saveLshIndex(emb.filter(col("vec_id") >= 250), idxPath,
          "vec_id", "embedding", bits = 8, prefixBits = 4, tables = 2,
          portableDim = 64)
        Similarity.appendLshIndex(emb.filter(col("vec_id") < 250),
          idxPath, "vec_id", "embedding"): Unit
      }
      val del = emb.filter(col("vec_id") % 5 === 0).select(col("vec_id"))
      Stages.timed("q139_tombstone_lsh", "delete_replay_revive") {
        Similarity.deleteFromLshIndex(del, idxPath, "vec_id")
        Similarity.deleteFromLshIndex(del, idxPath, "vec_id") // idempotent
        Similarity.appendLshIndex(emb.filter(col("vec_id") % 10 === 0),
          idxPath, "vec_id", "embedding"): Unit
      }
      Stages.timed("q139_tombstone_lsh", "compact") {
        Similarity.compactLshIndex(s, idxPath, "vec_id")
      }
      Similarity.lshSearch(s, idxPath, emb.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, multiProbe = true,
          maxBucket = Int.MaxValue)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cos"), 6).as("cos"), col("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Size-aware incremental compaction under the oracle (r14): one big
    // generation + four streaming-style dribble commits, then
    // compactSmall packs ONLY the sub-target files (target = the
    // largest live file's size, so the packing threshold is derived
    // from the table, not hand-fed per SF). The read after the pack is
    // the gate: a row lost or duplicated by the rewrite breaks the
    // hash, and the oracle is the layout-invariant full-table rollup.
    "q140_small_compaction" -> ((s, d) => {
      val root = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_smallc_${Integer.toHexString(d.hashCode)}").getPath
      val fsys = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(root, root + "_lineage", root + "_commit_ledger").foreach(p =>
        fsys.delete(new org.apache.hadoop.fs.Path(p), true))
      val li = t(s, d, "lineitem")
      Stages.timed("q140_small_compaction", "base_commit") {
        TimeTravel.commitAppend(li.filter(col("l_orderkey") % 2 === 0),
          root, Seq("l_partkey"), files = 2): Unit
      }
      Stages.timed("q140_small_compaction", "dribble_commits") {
        Seq(1, 3, 5, 7).foreach(k => TimeTravel.commitAppend(
          li.filter(pmod(col("l_orderkey"), lit(8)) === k),
          root, Seq("l_partkey"), files = 1): Unit)
      }
      Stages.timed("q140_small_compaction", "compact_small") {
        val maxLen = fsys.listStatus(new org.apache.hadoop.fs.Path(root))
          .filter(_.isFile).map(_.getLen).max
        TimeTravel.compactSmall(s, root, Seq("l_partkey"),
          targetBytes = maxLen): Unit
      }
      TimeTravel.read(s, root)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),

    // q134's feed-maintained digest index with the maintenance run as a
    // STRUCTURED STREAMING job (streamChanges) instead of a driver
    // loop — same mutations, same recipe (tombstone pre-images, append
    // post-images), same oracle membership; the stream's checkpoint is
    // the cursor and the index faces' replay idempotence absorbs the
    // at-least-once epochs.
    "q141_stream_feed_index" -> ((s, d) => {
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_ttsfi_${Integer.toHexString(d.hashCode)}").getPath
      val idx = dir + "_digest_index"
      val cp = dir + "_cp"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(dir, dir + "_lineage", dir + "_commit_ledger", idx,
        idx + "_tombstones", cp).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          concat(col("doc_id").cast("string"), lit(":"),
            coalesce(col("text"), lit(""))).as("body"))
      Stages.timed("q141_stream_feed_index", "commits_save") {
        (0 to 1).foreach(i => TimeTravel.commitAppend(
          docs.filter(Corpus.hashBucket(col("doc_id"), 2L) === i),
          dir, Seq("doc_id"), files = 2))
        Dedup.saveDigestIndex(TimeTravel.readAsOf(s, dir, 2L), idx, "body")
      }
      Stages.timed("q141_stream_feed_index", "mutate") {
        TimeTravel.commitDelete(s, dir, "doc_id",
          docs.filter(Corpus.hashBucket(col("doc_id"), 7L) === 3)
            .select(col("doc_id")))
        val updated = docs
          .filter(Corpus.hashBucket(col("doc_id"), 5L) === 2)
          .withColumn("body", concat(col("body"), lit(" u")))
        val inserted = docs
          .filter(Corpus.hashBucket(col("doc_id"), 11L) === 4)
          .select((-col("doc_id") - 1L).as("doc_id"),
            concat(lit("syn:"), col("doc_id").cast("string")).as("body"))
        TimeTravel.commitUpsert(s, dir, "doc_id",
          updated.unionByName(inserted), files = 2): Unit
      }
      Stages.timed("q141_stream_feed_index", "stream_maintain") {
        val q = TimeTravel.streamChanges(s, dir, "doc_id", cp,
          startAfter = 2L) { (f, _) =>
          Dedup.deleteFromDigestIndex(
            f.filter(col("change").isin("deleted", "updated"))
              .select(col("pre.body").as("body")), idx, "body")
          Dedup.appendDigestIndex(
            f.filter(col("change").isin("inserted", "updated"))
              .select(col("body")), idx, "body")
        }
        q.processAllAvailable(); q.stop()
      }
      Dedup.loadDigestIndex(s, idx)
        .select(col("digest")).distinct().orderBy(col("digest"))
    }),

    // Cross-lake replication (r14): a replica bootstrapped from NOTHING
    // and maintained from the change feed alone through q134's mutation
    // script, as a streaming query. The gate reads the REPLICA; the
    // oracle re-derives the source's final rows from the hash splits —
    // a missed delete, a stale update, or a dropped insert anywhere in
    // the feed→apply chain breaks the hash.
    "q142_replication" -> ((s, d) => {
      val src = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_ttrepl_${Integer.toHexString(d.hashCode)}").getPath
      val dst = src + "_replica"
      val cp = src + "_cp"
      val fs = new org.apache.hadoop.fs.Path(src)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(src, src + "_lineage", src + "_commit_ledger",
        dst, dst + "_lineage", dst + "_commit_ledger", cp).foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          concat(col("doc_id").cast("string"), lit(":"),
            coalesce(col("text"), lit(""))).as("body"))
      Stages.timed("q142_replication", "commits_mutate") {
        (0 to 1).foreach(i => TimeTravel.commitAppend(
          docs.filter(Corpus.hashBucket(col("doc_id"), 2L) === i),
          src, Seq("doc_id"), files = 2))
        TimeTravel.commitDelete(s, src, "doc_id",
          docs.filter(Corpus.hashBucket(col("doc_id"), 7L) === 3)
            .select(col("doc_id")))
        val updated = docs
          .filter(Corpus.hashBucket(col("doc_id"), 5L) === 2)
          .withColumn("body", concat(col("body"), lit(" u")))
        val inserted = docs
          .filter(Corpus.hashBucket(col("doc_id"), 11L) === 4)
          .select((-col("doc_id") - 1L).as("doc_id"),
            concat(lit("syn:"), col("doc_id").cast("string")).as("body"))
        TimeTravel.commitUpsert(s, src, "doc_id",
          updated.unionByName(inserted), files = 2): Unit
      }
      Stages.timed("q142_replication", "replicate") {
        val q = TimeTravel.replicate(s, src, dst, "doc_id", cp)
        q.processAllAvailable(); q.stop()
      }
      TimeTravel.read(s, dst)
        .select(col("doc_id"), col("body"))
        .orderBy(col("doc_id"))
    }),

    // Duplicate-span EXCISION (r14): q63's detection turned into the
    // transform — every verbatim 5-gram run of ≥3 grams survives only
    // in its earliest document; later copies lose exactly the covered
    // tokens. The oracle rebuilds every document's surviving text
    // string-for-string, so an off-by-one anywhere in the run/coverage
    // arithmetic (or a token dropped/kept wrongly) breaks the hash.
    "q143_excise_spans" -> ((s, d) =>
      Dedup.exciseDuplicateSpans(t(s, d, "documents"), "doc_id", "text",
          n = 5, minSpanGrams = 3, maxOcc = 1000)
        .orderBy(col("doc_id"))),

    // SCD Type-2 dimension history (r14): four-step lifecycle — initial
    // load, changed+new merge, an IDENTICAL re-merge that must be a
    // VERSION-FREE no-op (a wrongly-burned version would shift the
    // delete's epoch stamp and break the hash), then a soft delete that
    // closes rows without erasing history. The oracle reconstructs every
    // history row's validity stamps from the hash splits alone.
    "q144_scd_history" -> ((s, d) => {
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_scd_${Integer.toHexString(d.hashCode)}").getPath
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(dir, dir + "_lineage", dir + "_commit_ledger").foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("source"),
          coalesce(col("n_chars"), lit(0L)).cast("long").as("nc"))
      Stages.timed("q144_scd_history", "initial_load") {
        Scd.merge(s, dir, "doc_id",
          docs.filter(Corpus.hashBucket(col("doc_id"), 4L) =!= 0),
          files = 2): Unit
      }
      val b2 = docs.filter(Corpus.hashBucket(col("doc_id"), 3L) === 0)
        .withColumn("nc", col("nc") + 1000L)
      Stages.timed("q144_scd_history", "merge_changed") {
        Scd.merge(s, dir, "doc_id", b2, files = 2): Unit
      }
      Stages.timed("q144_scd_history", "noop_remerge") {
        val v = Scd.merge(s, dir, "doc_id", b2, files = 2)
        require(v == 2L, s"q144: identical re-merge burned version $v")
      }
      Stages.timed("q144_scd_history", "soft_delete") {
        Scd.delete(s, dir, "doc_id",
          docs.filter(Corpus.hashBucket(col("doc_id"), 5L) === 0)
            .select(col("doc_id")), files = 2): Unit
      }
      Scd.history(s, dir)
        .select(col("doc_id"), col("source"), col("nc"),
          col(Scd.FromCol).as("valid_from"), col(Scd.ToCol).as("valid_to"))
        .orderBy(col("doc_id"), col("valid_from"))
    }),

    // Atomic REPLACE WHERE (r14): the backfill pattern — recompute one
    // hash-bucket region and swap it in ONE commit (a delete+append
    // pair would expose the emptied-region state). The oracle checks
    // BOTH sides of the swap: as-of 3 must still read the pre-swap
    // payloads, as-of 4 the recomputed region next to untouched
    // neighbours.
    "q145_replace_where" -> ((s, d) => {
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_ttrw_${Integer.toHexString(d.hashCode)}").getPath
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(dir, dir + "_lineage", dir + "_commit_ledger").foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("source"),
          coalesce(col("n_chars"), lit(0L)).cast("long").as("nc"))
      Stages.timed("q145_replace_where", "commits") {
        (0 to 2).foreach(i => TimeTravel.commitAppend(
          docs.filter(Corpus.hashBucket(col("doc_id"), 3L) === i),
          dir, Seq("doc_id"), files = 2))
      }
      Stages.timed("q145_replace_where", "replace") {
        TimeTravel.commitReplaceWhere(s, dir,
          Corpus.hashBucket(col("doc_id"), 4L) === 1,
          docs.filter(Corpus.hashBucket(col("doc_id"), 4L) === 1)
            .withColumn("nc", col("nc") + 5000L), files = 2): Unit
      }
      (3L to 4L).map(v =>
          TimeTravel.readAsOf(s, dir, v)
            .groupBy(col("source"))
            .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("sum_chars"))
            .withColumn("as_of", lit(v)))
        .reduce(_ unionByName _)
        .select(col("as_of"), col("source"), col("n_docs"),
          col("sum_chars"))
        .orderBy(col("as_of"), col("source"))
    }),

    // Snapshot group (r14): consistent reads ACROSS lake tables. Docs
    // and their per-source dim are mutated BETWEEN publishes; reading
    // both members at cut 1 AFTER the mutations must still return the
    // pre-mutation pair (pinning is what the hash proves — a group
    // that read member heads would leak the delete into cut 1), and
    // cut 2 the post-mutation pair, both sides consistent.
    "q146_snapshot_group" -> ((s, d) => {
      val base = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_grp_${Integer.toHexString(d.hashCode)}").getPath
      val (docsDir, dimDir, gDir) =
        (base + "_docs", base + "_dim", base + "_cut")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(docsDir, dimDir, gDir).foreach(p =>
        Seq(p, p + "_lineage", p + "_commit_ledger").foreach(q =>
          fs.delete(new org.apache.hadoop.fs.Path(q), true)))
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("source"),
          coalesce(col("n_chars"), lit(0L)).cast("long").as("nc"))
      def dimOf(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("source")).agg(count(lit(1)).as("dim_docs"))
      Stages.timed("q146_snapshot_group", "build_publish") {
        TimeTravel.commitAppend(docs, docsDir, Seq("doc_id"), files = 2)
        TimeTravel.commitAppend(dimOf(docs), dimDir, Seq("source"),
          files = 1)
        SnapshotGroup.publish(s, gDir,
          Map("docs" -> docsDir, "dim" -> dimDir)): Unit
      }
      Stages.timed("q146_snapshot_group", "mutate_publish") {
        TimeTravel.commitDelete(s, docsDir, "doc_id",
          docs.filter(Corpus.hashBucket(col("doc_id"), 7L) === 3)
            .select(col("doc_id")))
        TimeTravel.commitUpsert(s, dimDir, "source",
          dimOf(TimeTravel.read(s, docsDir)), files = 1)
        SnapshotGroup.publish(s, gDir,
          Map("docs" -> docsDir, "dim" -> dimDir)): Unit
      }
      // reads happen AFTER both members advanced — the cut must pin.
      // Null-safe dim join: a null source is a legal group on both
      // sides (the r14 null contract; plain equality would drop it)
      (1L to 2L).map { g =>
          val dAgg = SnapshotGroup.readMember(s, gDir, "docs", g)
            .groupBy(col("source"))
            .agg(count(lit(1)).as("n_docs"))
          val dm = SnapshotGroup.readMember(s, gDir, "dim", g)
          dAgg.join(dm, dAgg("source") <=> dm("source"))
            .select(dAgg("source").as("source"), col("n_docs"),
              col("dim_docs"))
            .withColumn("cut", lit(g))
        }
        .reduce(_ unionByName _)
        .select(col("cut"), col("source"), col("n_docs"),
          col("dim_docs"))
        .orderBy(col("cut"), col("source"))
    }),

    // Point-in-time join (r14): each fact row reads the dimension
    // attributes current AT its own epoch — q144's dimension lifecycle
    // (load, change, soft delete) joined by facts whose epochs span all
    // three versions. LEFT semantics under oracle: keys absent at the
    // epoch (never loaded, not yet changed in, or already deleted)
    // must read NULL, and the null-id fact row survives with null
    // attributes (the r14 null contract on the FACT side; the null-id
    // row never enters the dimension).
    "q147_pit_join" -> ((s, d) => {
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_pit_${Integer.toHexString(d.hashCode)}").getPath
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(dir, dir + "_lineage", dir + "_commit_ledger").foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val all = t(s, d, "documents")
      val docs = all.filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("source"),
          coalesce(col("n_chars"), lit(0L)).cast("long").as("nc"))
      Stages.timed("q147_pit_join", "dim_build") {
        Scd.merge(s, dir, "doc_id",
          docs.filter(Corpus.hashBucket(col("doc_id"), 4L) =!= 0),
          files = 2)
        Scd.merge(s, dir, "doc_id",
          docs.filter(Corpus.hashBucket(col("doc_id"), 3L) === 0)
            .withColumn("nc", col("nc") + 1000L), files = 2)
        Scd.delete(s, dir, "doc_id",
          docs.filter(Corpus.hashBucket(col("doc_id"), 5L) === 0)
            .select(col("doc_id")), files = 2): Unit
      }
      // facts keep null-id rows: the join's left side owns them. The
      // epoch bucket uses modulus 7 (coprime to the dim's 3/4/5
      // buckets) so every (epoch, membership) combination occurs —
      // h%9%3 would alias the change bucket and never read a v2 row
      val facts = all.select(col("doc_id"),
        (lit(1L) + Corpus.hashBucket(col("doc_id"), 7L) % 3)
          .as("epoch"))
      Scd.pitJoin(s, facts, dir, "doc_id", "epoch")
        .select(col("doc_id"), col("epoch"), col("nc").as("dim_nc"))
        .orderBy(col("doc_id"))
    }),

    // Versioned dashboard (r15 capstone): the §3.1 dashboard served AS
    // OF a snapshot-group cut — facts in a time-travel lake, the
    // dimension as SCD Type-2 history, ONE cut pinning both, the whole
    // read path torn-pair-free. Cut-1 rows are computed AFTER both
    // members advanced (facts lost a delete bucket, a tier bucket
    // re-tiered to t9): a head-reading dashboard would leak both and
    // break the hash. Null contracts: null-id facts never enter the
    // lake (keyed-write rule), null-source facts survive the LEFT join
    // with a null tier group.
    "q148_versioned_dashboard" -> ((s, d) => {
      val base = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_vdash_${Integer.toHexString(d.hashCode)}").getPath
      val (factsDir, dimDir, gDir) =
        (base + "_facts", base + "_dim", base + "_cut")
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(factsDir, dimDir, gDir).foreach(p =>
        Seq(p, p + "_lineage", p + "_commit_ledger").foreach(q =>
          fs.delete(new org.apache.hadoop.fs.Path(q), true)))
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("source"),
          coalesce(col("n_chars"), lit(0L)).cast("long").as("nc"))
      val dim1 = docs.select(col("source"))
        .filter(col("source").isNotNull).distinct()
        .withColumn("tier", concat(lit("t"),
          Corpus.hashBucket(col("source"), 3L).cast("string")))
      // q144-grade stage attribution (VERDICT r15 task 6): per-commit,
      // per-publish, per-pinned-read — so the next driver regression in
      // this 9-commit composition is attributable without a local rerun
      Stages.timed("q148_versioned_dashboard", "facts_build") {
        TimeTravel.commitAppend(docs, factsDir, Seq("doc_id"), files = 2): Unit
      }
      Stages.timed("q148_versioned_dashboard", "dim_build") {
        Scd.merge(s, dimDir, "source", dim1, files = 1): Unit
      }
      Stages.timed("q148_versioned_dashboard", "publish_cut1") {
        SnapshotGroup.publish(s, gDir,
          Map("facts" -> factsDir, "dim" -> dimDir)): Unit
      }
      Stages.timed("q148_versioned_dashboard", "facts_delete") {
        TimeTravel.commitDelete(s, factsDir, "doc_id",
          docs.filter(Corpus.hashBucket(col("doc_id"), 7L) === 3)
            .select(col("doc_id"))): Unit
      }
      Stages.timed("q148_versioned_dashboard", "dim_mutate") {
        Scd.merge(s, dimDir, "source",
          dim1.filter(Corpus.hashBucket(col("source"), 5L) === 0)
            .select(col("source")).withColumn("tier", lit("t9")),
          files = 1): Unit
      }
      Stages.timed("q148_versioned_dashboard", "publish_cut2") {
        SnapshotGroup.publish(s, gDir,
          Map("facts" -> factsDir, "dim" -> dimDir)): Unit
      }
      // pin resolution per cut is eager (group metadata); the rollup
      // frames stay lazy, so their evaluation is the final_read stage
      (1L to 2L).map(g =>
          Stages.timed("q148_versioned_dashboard", s"pin_cut$g") {
            graft.engine.VersionedDashboard.rollup(s, gDir, "facts",
              "dim", "source", by = "tier", sumCol = Some("nc"), cut = g)
              .withColumn("cut", lit(g))
          })
        .reduce(_ unionByName _)
        .select(col("cut"), col("tier"), col("n"), col("sum_nc"))
        .orderBy(col("cut"), col("tier"))
    }),

    // Lineage checkpoint lifecycle (r16): the log-structured fold under
    // live traffic. Auto-checkpoints every 2 commits while appends /
    // a delete / an upsert land, then an explicit fold + vacuumLineage
    // deletes EVERY per-commit segment file — and all four historical
    // versions must read back exactly from the checkpoint alone. A fold
    // that loses an action row, misorders versions, a vacuum that
    // reclaims an unfolded segment, or a replay guard that forgets a
    // folded batch id all break the hash.
    "q149_lineage_checkpoint" -> ((s, d) => {
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_ttckpt_${Integer.toHexString(d.hashCode)}").getPath
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      Seq(dir, dir + "_lineage", dir + "_commit_ledger").foreach(p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true))
      val docs = t(s, d, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("source"),
          coalesce(col("n_chars"), lit(0L)).cast("long").as("nc"))
      val hconf = s.sparkContext.hadoopConfiguration
      hconf.setInt(TimeTravel.checkpointIntervalKey, 2)
      try {
        Stages.timed("q149_lineage_checkpoint", "commits") {
          (0 to 2).foreach(i => TimeTravel.commitAppend(
            docs.filter(Corpus.hashBucket(col("doc_id"), 3L) === i),
            dir, Seq("doc_id"), files = 2))
          TimeTravel.commitDelete(s, dir, "doc_id",
            docs.filter(Corpus.hashBucket(col("doc_id"), 7L) === 3)
              .select(col("doc_id"))): Unit
        }
        Stages.timed("q149_lineage_checkpoint", "upsert") {
          TimeTravel.commitUpsert(s, dir, "doc_id",
            docs.filter(Corpus.hashBucket(col("doc_id"), 7L) === 5)
              .withColumn("nc", col("nc") + 1000L),
            files = 2, batchId = Some("q149_up")): Unit
        }
        Stages.timed("q149_lineage_checkpoint", "fold_vacuum") {
          TimeTravel.checkpointLineage(s, dir): Unit
          // graceMillis = 0: this session is the lake's only process —
          // the explicit per-call single-maintainer attestation
          require(TimeTravel.vacuumLineage(s, dir, graceMillis = 0) > 0,
            "q149: the fold left nothing to reclaim")
          val segs = fs.listStatus(new org.apache.hadoop.fs.Path(
              TimeTravel.lineagePath(dir)))
            .map(_.getPath.getName).filter(_.startsWith("segment_"))
          require(segs.isEmpty,
            s"q149: per-commit segments survived the vacuum: " +
              segs.toSeq.sorted.mkString(", "))
          // the replay guard must survive the fold too: drop the fast
          // ledger (the crash window where its record never landed) so
          // the replay can only be absorbed by the batch id stamped in
          // the lineage — which now lives ONLY in the checkpoint
          fs.delete(new org.apache.hadoop.fs.Path(
            dir + "_commit_ledger"), true)
          require(TimeTravel.commitUpsert(s, dir, "doc_id",
              docs.filter(Corpus.hashBucket(col("doc_id"), 7L) === 5)
                .withColumn("nc", col("nc") + 1000L),
              files = 2, batchId = Some("q149_up")) == 5L,
            "q149: a folded batch id no longer absorbed its replay")
        }
        (2L to 5L).map(v =>
            TimeTravel.readAsOf(s, dir, v)
              .groupBy(col("source"))
              .agg(count(lit(1)).as("n_docs"),
                sum(col("nc")).as("sum_chars"))
              .withColumn("as_of", lit(v)))
          .reduce(_ unionByName _)
          .select(col("as_of"), col("source"), col("n_docs"),
            col("sum_chars"))
          .orderBy(col("as_of"), col("source"))
      } finally hconf.unset(TimeTravel.checkpointIntervalKey)
    })
  )

  // --- q28 oracle: the engine's IVF build/search unrolled in SQL.
  // Bit-for-bit parity holds because every arithmetic step is mirrored:
  // sequential-double dot products (DuckDB list_sum is an in-order fold,
  // like the native kernel's loop), centroid means as decimal-EXACT sums
  // over double-cast values divided once in double then cast to FLOAT
  // (float32 rounding absorbs sub-1e-12 engine differences), and identical
  // (distance, cell) / (cos desc, id) tie-breaks.
  private def vdot(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a)), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def ivfAssignSql(vsrc: String, csrc: String): String =
    s"""SELECT id, v, cell FROM (
       |  SELECT vv.id, vv.v, c.cell,
       |    row_number() OVER (PARTITION BY vv.id ORDER BY
       |      ${vdot("c.cv", "c.cv")} - 2.0 * ${vdot("vv.v", "c.cv")}, c.cell) AS rn
       |  FROM $vsrc vv CROSS JOIN $csrc c
       |) WHERE rn = 1""".stripMargin

  private def ivfRecentroidSql(asrc: String, cprev: String): String =
    s"""SELECT cell, list(m ORDER BY pos) AS cv FROM (
       |  SELECT cell, g.i AS pos,
       |    CAST(CAST(SUM(CAST(CAST(v[g.i] AS DOUBLE) AS DECIMAL(25,12))) AS DOUBLE)
       |      / COUNT(*) AS FLOAT) AS m
       |  FROM $asrc CROSS JOIN generate_series(1, 64) g(i)
       |  GROUP BY cell, g.i
       |) GROUP BY cell
       |UNION ALL
       |SELECT cell, cv FROM $cprev WHERE cell NOT IN (SELECT DISTINCT cell FROM $asrc)"""
      .stripMargin

  private def q28OracleSql: String =
    s"""WITH v AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
       |q AS (SELECT id, v, sqrt(${vdot("v", "v")}) AS qn FROM v WHERE id < 5),
       |c0 AS (
       |  SELECT row_number() OVER (ORDER BY id) - 1 AS cell, v AS cv
       |  FROM (SELECT id, v FROM v ORDER BY id LIMIT 16)
       |),
       |a1 AS (${ivfAssignSql("v", "c0")}),
       |c1 AS (${ivfRecentroidSql("a1", "c0")}),
       |a2 AS (${ivfAssignSql("v", "c1")}),
       |c2 AS (${ivfRecentroidSql("a2", "c1")}),
       |a3 AS (${ivfAssignSql("v", "c2")}),
       |probes AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.id AS query_id, c.cell,
       |      row_number() OVER (PARTITION BY q.id ORDER BY
       |        ${vdot("c.cv", "c.cv")} - 2.0 * ${vdot("q.v", "c.cv")}, c.cell) AS pr
       |    FROM q CROSS JOIN c2 c
       |  ) WHERE pr <= 4
       |),
       |scored AS (
       |  SELECT p.query_id, a.id AS neighbor_id,
       |    CASE WHEN q.qn * sqrt(${vdot("a.v", "a.v")}) = 0.0 THEN 0.0
       |         ELSE ${vdot("q.v", "a.v")} / (q.qn * sqrt(${vdot("a.v", "a.v")})) END AS cos
       |  FROM probes p
       |  JOIN q ON q.id = p.query_id
       |  JOIN a3 a ON a.cell = p.cell AND a.id != p.query_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
      .replace("\n", " ")

  // q108: PQ's whole train→encode→search chain unrolled, the q28
  // discipline per SUBSPACE: init codebooks are slices of the first 8
  // vectors, one Lloyd iteration with decimal-exact recentroids, the
  // final assignment is the encoding, ADC sums the per-subspace LUT
  // terms decimal-exactly, and the 40-candidate shortlist is rescored
  // with the exact float cosine.
  private def q108OracleSql: String = pqOracleSql("", Nil)

  // q111: the q108 chain with codebooks trained on the HISTORY rows
  // only (the frozen-codebook append — batch rows are ENCODED against
  // c1 but never shaped it) and the tombstoned ids excluded from the
  // neighbor side. Engine-side append idempotence (the double append)
  // has no oracle analogue beyond the result itself: a duplicated
  // neighbor row would double-hit the ADC sum's group and break the
  // hash.
  private def q111OracleSql: String =
    pqOracleSql("WHERE id < 400", 100L to 104L)

  private def pqOracleSql(historyFilter: String,
                          excludeNeighbors: Seq[Long]): String = {
    val dsub = 16
    val excl =
      if (excludeNeighbors.isEmpty) ""
      else s" AND e.id NOT IN (${excludeNeighbors.mkString(", ")})"
    def sv(v: String, sub: String): String =
      s"list_transform(generate_series(1, $dsub), i -> $v[$sub*$dsub + i])"
    def sdot(v: String, sub: String, cv: String): String =
      s"list_sum(list_transform(generate_series(1, $dsub), " +
        s"i -> CAST($v[$sub*$dsub + i] AS DOUBLE) * CAST($cv[i] AS DOUBLE)))"
    def assignSql(vsrc: String, csrc: String): String =
      s"""SELECT id, sub, code, sv FROM (
         |  SELECT vv.id, b.sub, b.code, ${sv("vv.v", "b.sub")} AS sv,
         |    row_number() OVER (PARTITION BY vv.id, b.sub ORDER BY
         |      ${vdot("b.cv", "b.cv")}
         |        - 2.0 * ${sdot("vv.v", "b.sub", "b.cv")},
         |      b.code) AS rn
         |  FROM $vsrc vv CROSS JOIN $csrc b
         |) WHERE rn = 1""".stripMargin
    s"""WITH v AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
       |h AS (SELECT id, v FROM v $historyFilter),
       |q AS (SELECT id, v, sqrt(${vdot("v", "v")}) AS qn FROM v WHERE id < 5),
       |b0 AS (
       |  SELECT s.s AS sub, sd.code, ${sv("sd.v", "s.s")} AS cv
       |  FROM (SELECT row_number() OVER (ORDER BY id) - 1 AS code, v
       |        FROM (SELECT id, v FROM h ORDER BY id LIMIT 8)) sd
       |  CROSS JOIN generate_series(0, 3) s(s)
       |),
       |a1 AS (${assignSql("h", "b0")}),
       |c1 AS (
       |  SELECT sub, code, list(m ORDER BY pos) AS cv FROM (
       |    SELECT sub, code, g.i AS pos,
       |      CAST(CAST(SUM(CAST(CAST(sv[g.i] AS DOUBLE) AS DECIMAL(25,12))) AS DOUBLE)
       |        / COUNT(*) AS FLOAT) AS m
       |    FROM a1 CROSS JOIN generate_series(1, $dsub) g(i)
       |    GROUP BY sub, code, g.i
       |  ) GROUP BY sub, code
       |  UNION ALL
       |  SELECT b0.sub, b0.code, b0.cv FROM b0
       |  WHERE NOT EXISTS (SELECT 1 FROM a1
       |                    WHERE a1.sub = b0.sub AND a1.code = b0.code)
       |),
       |enc AS (${assignSql("v", "c1")}),
       |nrm AS (SELECT id, sqrt(${vdot("v", "v")}) AS nn FROM v),
       |lut AS (
       |  SELECT q.id AS query_id, q.qn, b.sub, b.code,
       |    ${sdot("q.v", "b.sub", "b.cv")} AS l
       |  FROM q CROSS JOIN c1 b
       |),
       |adc AS (
       |  SELECT l.query_id, e.id AS neighbor_id,
       |    CASE WHEN first(l.qn) * first(n.nn) = 0.0 THEN 0.0
       |         ELSE CAST(SUM(CAST(l.l AS DECIMAL(25,12))) AS DOUBLE)
       |              / (first(l.qn) * first(n.nn)) END AS cos_adc
       |  FROM enc e
       |  JOIN lut l ON l.sub = e.sub AND l.code = e.code
       |  JOIN nrm n ON n.id = e.id
       |  WHERE e.id != l.query_id$excl
       |  GROUP BY l.query_id, e.id
       |),
       |short AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY cos_adc DESC, neighbor_id) AS r
       |    FROM adc) WHERE r <= 40
       |),
       |resc AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    CASE WHEN q.qn * n.nn = 0.0 THEN 0.0
       |         ELSE ${vdot("q.v", "a.v")} / (q.qn * n.nn) END AS cos
       |  FROM short s
       |  JOIN q ON q.id = s.query_id
       |  JOIN v a ON a.id = s.neighbor_id
       |  JOIN nrm n ON n.id = s.neighbor_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM resc)
       |SELECT query_id, neighbor_id, round(cos, 6) AS cos,
       |CAST(rank AS INTEGER) AS rank
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank"""
      .stripMargin.replace("\n", " ")
  }

  // q113/q114: the BPE training loop, unrolled — one CTE pair per
  // merge decision. Symbols live as chr(1)-wrapped substrings of one
  // string per word, so merge application is DuckDB's literal
  // left-to-right replace, exactly the engine's; pair counts come from
  // the split symbol list zipped against its own tail. Runs on the
  // doc_id % 20 sub-corpus (matching the engine side — see q113's
  // comment). The two generate_series caps (64 chars/word, 200
  // symbols/word) are ASSERTED, not silent (ADVICE r9): `cap` errors
  // the whole oracle if any word exceeds 64 chars, and the 200-symbol
  // cap is implied by it (merges only shrink a word's symbol count, so
  // symbols ≤ chars ≤ 64 < 200).
  private val bpeMerges = 12

  // Every chained CTE is MATERIALIZED: wt(i+1) references wt(i) twice
  // (through p(i)→m(i) and directly), so inlining re-evaluates the
  // chain 2^merges times — the measured ~10-min-per-oracle cost of
  // VERDICT r10 was this exponential blowup (the word table itself is
  // tiny), and materialization makes the whole loop linear (seconds).
  private def bpeOracleCtes: String = {
    val c = "chr(1)"
    val init =
      s"""w0 AS MATERIALIZED (
         |  SELECT word, CAST(count(*) AS BIGINT) AS n FROM (
         |    SELECT unnest(string_split(text, ' ')) AS word
         |    FROM documents WHERE doc_id % 20 = 0)
         |  WHERE word <> '' GROUP BY word),
         |cap AS MATERIALIZED (
         |  SELECT CASE WHEN max(len(word)) > 64
         |    THEN error('bpe oracle: word exceeds the 64-char unroll cap')
         |    ELSE 64 END AS maxlen FROM w0),
         |wt0 AS MATERIALIZED (
         |  SELECT n,
         |    string_agg($c || substr(word, g.i, 1) || $c, '' ORDER BY g.i)
         |      AS w
         |  FROM w0 CROSS JOIN cap CROSS JOIN generate_series(1, 64) g(i)
         |  WHERE g.i <= len(word) AND len(word) <= cap.maxlen
         |  GROUP BY word, n)""".stripMargin
    val iters = (0 until bpeMerges).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT ts[g.j] AS l, ts[g.j + 1] AS r,
         |    CAST(SUM(n) AS BIGINT) AS c
         |  FROM (SELECT n, list_filter(string_split(w, $c),
         |          t -> t <> '') AS ts FROM wt$i)
         |  CROSS JOIN generate_series(1, 200) g(j)
         |  WHERE g.j < len(ts)
         |  GROUP BY 1, 2),
         |m$i AS MATERIALIZED (
         |  SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1),
         |wt${i + 1} AS MATERIALIZED (
         |  SELECT n, replace(w, $c || m.l || $c || $c || m.r || $c,
         |    $c || m.l || m.r || $c) AS w
         |  FROM wt$i CROSS JOIN m$i m)""".stripMargin
    }
    (init +: iters).mkString(",\n")
  }

  private def q113OracleSql: String =
    (s"""WITH $bpeOracleCtes
        |SELECT * FROM (""" +
      (0 until bpeMerges).map(i =>
        s"""SELECT CAST($i AS INTEGER) AS "rank", l AS "left", """ +
          s"""r AS "right", c AS pair_count FROM m$i""")
        .mkString(" UNION ALL ") +
      """) ORDER BY "rank"""").stripMargin.replace("\n", " ")

  private def q114OracleSql: String =
    s"""WITH $bpeOracleCtes
       |SELECT token, CAST(SUM(n) AS BIGINT) AS n FROM (
       |  SELECT n, unnest(list_filter(string_split(w, chr(1)),
       |    t -> t <> '')) AS token FROM wt$bpeMerges)
       |GROUP BY token ORDER BY token""".stripMargin.replace("\n", " ")

  // q117: BOTH trainings unrolled and composed — q28's cell k-means
  // (one Lloyd round), float residuals against the final centroids,
  // q108's per-subspace k-means over those residuals, then probes +
  // cell-dot correction + residual ADC + exact rescore.
  private def q117OracleSql: String = {
    val dsub = 16
    def sv(v: String, sub: String): String =
      s"list_transform(generate_series(1, $dsub), i -> $v[$sub*$dsub + i])"
    def sdot(v: String, sub: String, cv: String): String =
      s"list_sum(list_transform(generate_series(1, $dsub), " +
        s"i -> CAST($v[$sub*$dsub + i] AS DOUBLE) * CAST($cv[i] AS DOUBLE)))"
    def rAssignSql(csrc: String): String =
      s"""SELECT id, sub, code, sv FROM (
         |  SELECT vv.id, b.sub, b.code, ${sv("vv.rv", "b.sub")} AS sv,
         |    row_number() OVER (PARTITION BY vv.id, b.sub ORDER BY
         |      ${vdot("b.cv", "b.cv")}
         |        - 2.0 * ${sdot("vv.rv", "b.sub", "b.cv")},
         |      b.code) AS rn
         |  FROM res vv CROSS JOIN $csrc b
         |) WHERE rn = 1""".stripMargin
    s"""WITH v AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
       |q AS (SELECT id, v, sqrt(${vdot("v", "v")}) AS qn FROM v WHERE id < 5),
       |nrm AS (SELECT id, sqrt(${vdot("v", "v")}) AS nn FROM v),
       |c0 AS (
       |  SELECT row_number() OVER (ORDER BY id) - 1 AS cell, v AS cv
       |  FROM (SELECT id, v FROM v ORDER BY id LIMIT 8)
       |),
       |a1 AS (${ivfAssignSql("v", "c0")}),
       |c1 AS (${ivfRecentroidSql("a1", "c0")}),
       |a2 AS (${ivfAssignSql("v", "c1")}),
       |res AS (
       |  SELECT a.id, a.cell,
       |    list_transform(generate_series(1, 64),
       |      i -> CAST(a.v[i] - c.cv[i] AS FLOAT)) AS rv
       |  FROM a2 a JOIN c1 c ON c.cell = a.cell
       |),
       |rb0 AS (
       |  SELECT s.s AS sub, sd.code, ${sv("sd.rv", "s.s")} AS cv
       |  FROM (SELECT row_number() OVER (ORDER BY id) - 1 AS code, rv
       |        FROM (SELECT id, rv FROM res ORDER BY id LIMIT 8)) sd
       |  CROSS JOIN generate_series(0, 3) s(s)
       |),
       |ra1 AS (${rAssignSql("rb0")}),
       |rc1 AS (
       |  SELECT sub, code, list(m ORDER BY pos) AS cv FROM (
       |    SELECT sub, code, g.i AS pos,
       |      CAST(CAST(SUM(CAST(CAST(sv[g.i] AS DOUBLE) AS DECIMAL(25,12))) AS DOUBLE)
       |        / COUNT(*) AS FLOAT) AS m
       |    FROM ra1 CROSS JOIN generate_series(1, $dsub) g(i)
       |    GROUP BY sub, code, g.i
       |  ) GROUP BY sub, code
       |  UNION ALL
       |  SELECT rb0.sub, rb0.code, rb0.cv FROM rb0
       |  WHERE NOT EXISTS (SELECT 1 FROM ra1
       |                    WHERE ra1.sub = rb0.sub AND ra1.code = rb0.code)
       |),
       |renc AS (${rAssignSql("rc1")}),
       |probes AS (
       |  SELECT query_id, qn, cell, qc FROM (
       |    SELECT q.id AS query_id, q.qn, c.cell,
       |      ${vdot("q.v", "c.cv")} AS qc,
       |      row_number() OVER (PARTITION BY q.id ORDER BY
       |        ${vdot("c.cv", "c.cv")} - 2.0 * ${vdot("q.v", "c.cv")},
       |        c.cell) AS pr
       |    FROM q CROSS JOIN c1 c
       |  ) WHERE pr <= 4
       |),
       |lut AS (
       |  SELECT q.id AS query_id, b.sub, b.code,
       |    ${sdot("q.v", "b.sub", "b.cv")} AS l
       |  FROM q CROSS JOIN rc1 b
       |),
       |adc AS (
       |  SELECT p.query_id, e.id AS neighbor_id,
       |    CASE WHEN first(p.qn) * first(n.nn) = 0.0 THEN 0.0
       |         ELSE (first(p.qc)
       |               + CAST(SUM(CAST(l.l AS DECIMAL(25,12))) AS DOUBLE))
       |              / (first(p.qn) * first(n.nn)) END AS cos_adc
       |  FROM renc e
       |  JOIN res rs ON rs.id = e.id
       |  JOIN probes p ON p.cell = rs.cell
       |  JOIN lut l ON l.query_id = p.query_id AND l.sub = e.sub
       |    AND l.code = e.code
       |  JOIN nrm n ON n.id = e.id
       |  WHERE e.id != p.query_id
       |  GROUP BY p.query_id, e.id
       |),
       |short AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY cos_adc DESC, neighbor_id) AS r
       |    FROM adc) WHERE r <= 40
       |),
       |resc AS (
       |  SELECT s.query_id, s.neighbor_id,
       |    CASE WHEN q.qn * n.nn = 0.0 THEN 0.0
       |         ELSE ${vdot("q.v", "a.v")} / (q.qn * n.nn) END AS cos
       |  FROM short s
       |  JOIN q ON q.id = s.query_id
       |  JOIN v a ON a.id = s.neighbor_id
       |  JOIN nrm n ON n.id = s.neighbor_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM resc)
       |SELECT query_id, neighbor_id, round(cos, 6) AS cos,
       |CAST(rank AS INTEGER) AS rank
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank"""
      .stripMargin.replace("\n", " ")
  }

  // q89: q28's unrolled-k-means chain restricted to the history rows,
  // then the batch assigned against the FINAL centroids (the frozen-
  // centroid append), the union probed. Engine-side idempotence (the
  // double append) has no oracle analogue beyond the result itself: a
  // duplicated neighbor row would double-hit `scored` and break the hash.
  // q97 reuses the chain with the effectively-deleted ids excluded from
  // the neighbor side (tombstone lifecycle under the same arithmetic).
  private def q89OracleSql: String = ivfIncrementalOracleSql(Nil)

  private def ivfIncrementalOracleSql(excludeNeighbors: Seq[Long]): String = {
    val excl =
      if (excludeNeighbors.isEmpty) ""
      else s" AND a.id NOT IN (${excludeNeighbors.mkString(", ")})"
    ivfIncrementalOracleCore(excl)
  }

  private def ivfIncrementalOracleCore(neighborExtraPred: String): String =
    s"""WITH v AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
       |h AS (SELECT id, v FROM v WHERE id >= 250),
       |q AS (SELECT id, v, sqrt(${vdot("v", "v")}) AS qn FROM v WHERE id < 5),
       |c0 AS (
       |  SELECT row_number() OVER (ORDER BY id) - 1 AS cell, v AS cv
       |  FROM (SELECT id, v FROM h ORDER BY id LIMIT 16)
       |),
       |a1 AS (${ivfAssignSql("h", "c0")}),
       |c1 AS (${ivfRecentroidSql("a1", "c0")}),
       |a2 AS (${ivfAssignSql("h", "c1")}),
       |c2 AS (${ivfRecentroidSql("a2", "c1")}),
       |a3 AS (${ivfAssignSql("h", "c2")}),
       |b AS (SELECT id, v FROM v WHERE id < 250),
       |ab AS (${ivfAssignSql("b", "c2")}),
       |cells AS (SELECT * FROM a3 UNION ALL SELECT * FROM ab),
       |probes AS (
       |  SELECT query_id, cell FROM (
       |    SELECT q.id AS query_id, c.cell,
       |      row_number() OVER (PARTITION BY q.id ORDER BY
       |        ${vdot("c.cv", "c.cv")} - 2.0 * ${vdot("q.v", "c.cv")}, c.cell) AS pr
       |    FROM q CROSS JOIN c2 c
       |  ) WHERE pr <= 4
       |),
       |scored AS (
       |  SELECT p.query_id, a.id AS neighbor_id,
       |    CASE WHEN q.qn * sqrt(${vdot("a.v", "a.v")}) = 0.0 THEN 0.0
       |         ELSE ${vdot("q.v", "a.v")} / (q.qn * sqrt(${vdot("a.v", "a.v")})) END AS cos
       |  FROM probes p
       |  JOIN q ON q.id = p.query_id
       |  JOIN cells a ON a.cell = p.cell AND a.id != p.query_id$neighborExtraPred
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
      .replace("\n", " ")

  // --- q23b oracle: the portable-hyperplane LSH-ANN pipeline re-derived in
  // SQL end-to-end. The planes are pure md5 arithmetic (so DuckDB rebuilds
  // the same bits×dim matrix the Scala side materialized), the signatures
  // are in-order double folds (list_sum ≡ the zip_with/aggregate fold), and
  // the bucket-join + Hamming-1 multi-probe collapses to the pair predicate
  // ∃table: bit_count(sigA ⊕ sigB) ≤ 1 — equivalent because a query probes
  // exactly its own bucket and every bucket one flipped prefix bit away.
  private def q23bOracleSql: String = portableLshOracleSql("TRUE", 255)

  // Shared by q23b (all ids as queries, bucket = full 8-bit signature)
  // and q90 (the incremental index probe: queries restricted, bucket =
  // the 4-bit prefix → mask 15) — the index's persisted-vs-appended
  // split is invisible to the math: every signature is the same pure
  // function of (vector, pinned planes), so one SQL covers both flows.
  private def portableLshOracleSql(queryPred: String, mask: Int,
                                   neighborPred: String = "TRUE"): String =
    s"""WITH p AS (
       |  SELECT tt.t AS t, bb.b AS b,
       |    list_transform(generate_series(1, 64), i ->
       |      CAST(CAST('0x' || substr(md5(concat(tt.t, ':', bb.b, ':', i)), 1, 15) AS BIGINT) AS DOUBLE)
       |        / 576460752303423488.0 - 1.0) AS comp
       |  FROM generate_series(0, 1) tt(t) CROSS JOIN generate_series(0, 7) bb(b)
       |), s AS (
       |  SELECT e.vec_id, p.t,
       |    CAST(sum(CASE WHEN list_sum(list_transform(generate_series(1, 64),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * p.comp[i])) >= 0
       |      THEN CAST(1 AS BIGINT) << p.b ELSE 0 END) AS BIGINT) AS sig
       |  FROM embeddings e CROSS JOIN p GROUP BY e.vec_id, p.t
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
       |  FROM s a JOIN s b ON a.t = b.t AND a.vec_id != b.vec_id
       |  WHERE ($queryPred) AND bit_count(xor(a.sig & $mask, b.sig & $mask)) <= 1
       |    AND ($neighborPred)
       |), scored AS (
       |  SELECT c.query_id, c.neighbor_id,
       |    CASE WHEN sqrt(${vdot("qe.embedding", "qe.embedding")})
       |           * sqrt(${vdot("ne.embedding", "ne.embedding")}) = 0.0 THEN 0.0
       |         ELSE ${vdot("qe.embedding", "ne.embedding")}
       |           / (sqrt(${vdot("qe.embedding", "qe.embedding")})
       |            * sqrt(${vdot("ne.embedding", "ne.embedding")})) END AS cos
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ne ON ne.vec_id = c.neighbor_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, round(cos, 6) AS cos, CAST(rank AS INTEGER) AS rank
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
      .replace("\n", " ")

  // The true all-pairs word-3-gram Jaccard pair set over documents —
  // shared by q19 (pair listing) and q37 (the component step above it).
  // The pair table is an INVERTED-INDEX join, not all-pairs: ix
  // explodes each doc's (distinct) shingles, pairs sharing >= 1
  // shingle group to |intersection| = count(*), and |union| =
  // n_a + n_b - |intersection|. Pairs sharing NO shingle are absent —
  // their jaccard is 0, and every consumer (q19/q37/q80/q81/q83)
  // filters jaccard >= 0.8, so the output set is EXACT while the cost
  // drops from 125k list-intersections to the index join (measured
  // 13 s -> 0.03 s at sf0.01). All three CTEs are MATERIALIZED:
  // inlining re-evaluates them per reference — twice under e's UNION
  // ALL, and per ITERATION when the connected-components oracles walk
  // the edges recursively.
  // Effective digest-index membership after the q134/q141 mutation
  // script (delete bucket7=3, update bucket5=2, insert bucket11=4) —
  // shared by the driver-loop (q134) and streaming (q141) maintenance
  // faces, which must land the IDENTICAL index.
  private val feedIndexMembershipOracle: String =
    """WITH d AS (
      |  SELECT doc_id, coalesce(text, '') AS tx,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) % 7 AS del,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) % 5 AS u,
      |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) % 11 AS ins
      |  FROM documents WHERE doc_id IS NOT NULL
      |), final AS (
      |  SELECT CAST(doc_id AS VARCHAR) || ':' || tx AS body
      |  FROM d WHERE del <> 3 AND u <> 2
      |  UNION ALL
      |  SELECT CAST(doc_id AS VARCHAR) || ':' || tx || ' u'
      |  FROM d WHERE u = 2
      |  UNION ALL
      |  SELECT 'syn:' || CAST(doc_id AS VARCHAR) FROM d WHERE ins = 4
      |)
      |SELECT DISTINCT md5(body) AS digest FROM final
      |ORDER BY digest""".stripMargin.replace("\n", " ")

  private val q19PairsCte: String =
    """sh AS MATERIALIZED (
      |  SELECT doc_id,
      |  CASE WHEN len(toks) >= 3 THEN list_distinct(list_transform(
      |         generate_series(1, len(toks) - 2),
      |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
      |       WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
      |       ELSE [] END AS sh
      |  FROM (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks
      |        FROM documents)
      |), ix AS MATERIALIZED (
      |  SELECT doc_id, len(sh) AS n, unnest(sh) AS g FROM sh
      |), j AS MATERIALIZED (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2,
      |    CAST(count(*) AS DOUBLE)
      |      / (any_value(a.n) + any_value(b.n) - count(*)) AS jaccard
      |  FROM ix a JOIN ix b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |)""".stripMargin

  // q37 oracle: connected components as a RECURSIVE CTE — labels propagate
  // along the (bidirectional) >= 0.8 edge set until the UNION dedup stops
  // producing new (node, label) pairs; min reachable label = the component
  // representative the engine's min-label-propagation fixpoint computes.
  private def q37OracleSql: String =
    s"""WITH RECURSIVE $q19PairsCte,
       |e AS MATERIALIZED (
       |  SELECT id1 AS a, id2 AS b FROM j WHERE jaccard >= 0.8
       |  UNION ALL
       |  SELECT id2 AS a, id1 AS b FROM j WHERE jaccard >= 0.8
       |),
       |r(id, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.a, r.lbl FROM e JOIN r ON e.b = r.id
       |)
       |SELECT id AS doc_id, min(lbl) AS cluster FROM r GROUP BY id
       |ORDER BY doc_id""".stripMargin.replace("\n", " ")

  def oracleSql: Map[String, String] = ListMap(
    "q01_dim_lookup" ->
      """SELECT n_nationkey, n_name, r_name FROM nation
        |JOIN region ON n_regionkey = r_regionkey WHERE n_name = 'NATION_19'"""
        .stripMargin.replace("\n", " "),

    "q02_recent_listing" ->
      s"""SELECT o_orderkey, c_name, round(o_totalprice, 2) AS price,
         |strftime(o_orderdate, '%Y-%m-%d') AS order_date
         |$oracleOrdersOf
         |WHERE n_name = 'NATION_19' AND $oracleWindow
         |ORDER BY order_date DESC, o_orderkey LIMIT 10"""
        .stripMargin.replace("\n", " "),

    "q03_totals_conditional" ->
      s"""SELECT count(*) AS total_count,
         |CAST(coalesce(sum(CASE WHEN o_orderstatus IN ('O','P') THEN 1 ELSE 0 END), 0) AS BIGINT) AS active_count
         |$oracleOrdersOf WHERE n_name = 'NATION_19' AND $oracleWindow"""
        .stripMargin.replace("\n", " "),

    "q04_group_counts" ->
      s"""SELECT o_orderpriority, count(*) AS total_count,
         |CAST(sum(CASE WHEN o_orderstatus IN ('O','P') THEN 1 ELSE 0 END) AS BIGINT) AS active_count
         |$oracleOrdersOf WHERE n_name = 'NATION_19' AND $oracleWindow
         |GROUP BY o_orderpriority ORDER BY total_count DESC, o_orderpriority"""
        .stripMargin.replace("\n", " "),

    "q05_price_stats" ->
      s"""SELECT coalesce(quantile_cont(round(o_totalprice*100), 0.5)/100, 0.0) AS median_price,
         |coalesce(round(min(o_totalprice), 2), 0.0) AS min_price,
         |coalesce(round(max(o_totalprice), 2), 0.0) AS max_price,
         |count(*) AS num_sales
         |$oracleOrdersOf WHERE n_name = 'NATION_19' AND $oracleWindow"""
        .stripMargin.replace("\n", " "),

    "q05b_price_stats_empty" ->
      s"""SELECT coalesce(quantile_cont(round(o_totalprice*100), 0.5)/100, 0.0) AS median_price,
         |coalesce(round(min(o_totalprice), 2), 0.0) AS min_price,
         |coalesce(round(max(o_totalprice), 2), 0.0) AS max_price,
         |count(*) AS num_sales
         |$oracleOrdersOf WHERE n_name = 'NO SUCH NATION' AND $oracleWindow"""
        .stripMargin.replace("\n", " "),

    "q06_monthly_counts" ->
      s"""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         |count(*) AS n
         |$oracleOrdersOf WHERE n_name = 'NATION_19' AND $oracleWindow
         |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "),

    "q07_month_gap_fill" ->
      s"""WITH spine AS (
         |  SELECT strftime(m, '%Y-%m') AS month FROM
         |  (SELECT unnest(generate_series(TIMESTAMP '1996-01-01',
         |    TIMESTAMP '1996-12-31', INTERVAL 1 MONTH)) AS m)
         |), agg AS (
         |  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         |  count(*) AS n, quantile_cont(round(o_totalprice*100), 0.5)/100 AS median_price
         |  $oracleOrdersOf WHERE n_name = 'NATION_19' AND $oracleWindow GROUP BY 1
         |)
         |SELECT s.month, CAST(coalesce(a.n, 0) AS BIGINT) AS n, a.median_price
         |FROM spine s LEFT JOIN agg a USING (month) ORDER BY s.month"""
        .stripMargin.replace("\n", " "),

    "q08_topk_other" ->
      """WITH g AS (
        |  SELECT p_brand, count(*) AS total_count
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1
        |), r AS (
        |  SELECT p_brand, total_count,
        |  row_number() OVER (ORDER BY total_count DESC, p_brand) AS rn FROM g
        |)
        |SELECT CASE WHEN rn <= 5 THEN p_brand ELSE 'Other' END AS bucket,
        |CAST(sum(total_count) AS BIGINT) AS total_count
        |FROM r GROUP BY 1 ORDER BY min(rn)""".stripMargin.replace("\n", " "),

    "q09_compare" ->
      s"""SELECT n_name, count(*) AS total_count,
         |CAST(sum(CASE WHEN o_orderstatus IN ('O','P') THEN 1 ELSE 0 END) AS BIGINT) AS active_count,
         |quantile_cont(round(o_totalprice*100), 0.5)/100 AS median_price
         |$oracleOrdersOf
         |WHERE n_name IN ('NATION_19','NATION_11') AND $oracleWindow
         |GROUP BY n_name ORDER BY n_name""".stripMargin.replace("\n", " "),

    "q10_bookmarks" ->
      s"""SELECT n_name, count(*) AS total_count,
         |quantile_cont(round(o_totalprice*100), 0.5)/100 AS median_price
         |$oracleOrdersOf
         |WHERE n_name IN ('NATION_10','NATION_20','ATLANTIS')
         |GROUP BY n_name ORDER BY n_name""".stripMargin.replace("\n", " "),

    "q11_key_scalars" ->
      """SELECT c_custkey,
        |concat_ws('-', b, bl, lt) AS bbl,
        |concat(b, bl, lt) AS bbl10,
        |CAST(substr(concat(b, bl, lt), 1, 1) AS INTEGER) AS p_borough,
        |CAST(substr(concat(b, bl, lt), 2, 5) AS INTEGER) AS p_block,
        |CAST(substr(concat(b, bl, lt), 7, 4) AS INTEGER) AS p_lot
        |FROM (
        |  SELECT c_custkey,
        |  CAST(c_nationkey % 9 + 1 AS VARCHAR) AS b,
        |  lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0') AS bl,
        |  lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0') AS lt
        |  FROM customer
        |) ORDER BY c_custkey""".stripMargin.replace("\n", " "),

    "q12_validation_split" ->
      """SELECT is_valid, violation, count(*) AS n FROM (
        |  SELECT
        |  coalesce(o_totalprice > 0 AND o_orderdate <= TIMESTAMP '2000-12-31'
        |   AND o_orderstatus IN ('F','O','P'), FALSE) AS is_valid,
        |  CASE WHEN NOT o_totalprice > 0 THEN 'price_pos'
        |       WHEN NOT o_orderdate <= TIMESTAMP '2000-12-31' THEN 'date_bound'
        |       WHEN NOT o_orderstatus IN ('F','O','P') THEN 'status_domain'
        |       WHEN (o_totalprice > 0 AND o_orderdate <= TIMESTAMP '2000-12-31'
        |             AND o_orderstatus IN ('F','O','P')) IS NULL THEN 'null_check'
        |       ELSE '' END AS violation
        |  FROM orders
        |) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " "),

    "q13_pricing_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
        |count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " "),

    "q14_text_tokens" ->
      """SELECT doc_id,
        |CAST(len(regexp_extract_all(trim(text), '\S+')) AS BIGINT) AS ws_tokens,
        |CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS lex_tokens
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "q15_text_quality" ->
      """SELECT doc_id, word_count,
        |CASE WHEN word_count > 0 THEN CAST(n_chars_m AS DOUBLE) / word_count ELSE 0.0 END AS avg_word_len,
        |punct_ratio, stop_ratio,
        |least(CAST(word_count AS DOUBLE) / 100.0, 1.0) * 0.4
        |  + (1.0 - punct_ratio) * 0.3
        |  + least(stop_ratio * 5.0, 1.0) * 0.3 AS quality_score
        |FROM (
        |  SELECT doc_id, word_count, n_chars_m,
        |  CASE WHEN n_chars_m > 0 THEN CAST(punct_count AS DOUBLE) / n_chars_m ELSE 0.0 END AS punct_ratio,
        |  CASE WHEN word_count > 0 THEN CAST(stop_hits AS DOUBLE) / word_count ELSE 0.0 END AS stop_ratio
        |  FROM (
        |    SELECT doc_id,
        |    CAST(len(regexp_extract_all(trim(text), '\S+')) AS BIGINT) AS word_count,
        |    CAST(length(text) AS BIGINT) AS n_chars_m,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS punct_count,
        |    CAST(len(list_filter(
        |      list_transform(regexp_extract_all(trim(text), '\S+'), x -> lower(x)),
        |      x -> list_contains(['the','a','of','and','to','in','is','for','on','with'], x))) AS BIGINT) AS stop_hits
        |    FROM documents
        |  )
        |) ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "q16_lang_id" ->
      """SELECT doc_id,
        |CASE WHEN s_en > 0 AND s_en = best THEN 'en'
        |     WHEN s_de > 0 AND s_de = best THEN 'de'
        |     WHEN s_es > 0 AND s_es = best THEN 'es'
        |     WHEN s_fr > 0 AND s_fr = best THEN 'fr'
        |     ELSE 'und' END AS lang_pred
        |FROM (
        |  SELECT doc_id, s_en, s_de, s_es, s_fr,
        |  greatest(s_en, s_de, s_es, s_fr) AS best FROM (
        |    SELECT doc_id,
        |    len(list_intersect(toks, ['the','and','of','to','is'])) AS s_en,
        |    len(list_intersect(toks, ['der','die','und','das','ist'])) AS s_de,
        |    len(list_intersect(toks, ['el','los','que','y','una'])) AS s_es,
        |    len(list_intersect(toks, ['le','les','et','une','est'])) AS s_fr
        |    FROM (SELECT doc_id,
        |      list_transform(regexp_extract_all(trim(text), '\S+'), x -> lower(x)) AS toks
        |      FROM documents)
        |  )
        |) ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // Winnowing re-derived in SQL: md5 60-bit gram hashes (matching the
    // engine's signed-long minima), window-of-w minima, distinct
    "q17_fingerprints" ->
      """SELECT doc_id,
        |CASE WHEN tnull THEN NULL
        |     ELSE CAST(len(fps) AS BIGINT) END AS n_fingerprints,
        |CASE WHEN tnull THEN NULL ELSE list_min(fps) END AS min_fp
        |FROM (
        |  SELECT doc_id, tnull,
        |  CASE WHEN m <= 0 THEN CAST([] AS BIGINT[])
        |  ELSE list_distinct(list_transform(
        |    generate_series(1, greatest(m - 3, 1)),
        |    i -> list_min(list_slice(grams, i, i + 3)))) END AS fps
        |  FROM (
        |    SELECT doc_id, text IS NULL AS tnull, length(text) - 7 AS m,
        |    list_transform(generate_series(1, greatest(length(text) - 7, 0)),
        |      p -> CAST('0x' || substr(md5(substr(text, p, 8)), 1, 15) AS BIGINT)) AS grams
        |    FROM documents
        |  )
        |) ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "q18_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, md5(text) AS digest, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY doc_id"""
        .stripMargin.replace("\n", " "),

    // True >= 0.8 near-dup pair set, all-pairs — the engine must reproduce
    // it through LSH candidates + exact verification, so recall is checked
    "q19_minhash_lsh" ->
      s"""WITH $q19PairsCte
         |SELECT id1, id2, round(jaccard, 6) AS jaccard FROM j
         |WHERE jaccard >= 0.8 ORDER BY id1, id2""".stripMargin.replace("\n", " "),

    "q37_dedup_clusters" -> q37OracleSql,

    // null contract mirrored: decontamination verdicts are id-keyed, so
    // null-id docs are dropped at the gate's edge on both sides (an
    // anti-join can never REMOVE a null id — a contaminated one would leak)
    "q38_decontaminate" ->
      """WITH g AS (
        |  SELECT doc_id, lang,
        |  list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 0)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS gs
        |  FROM (SELECT doc_id, lang, regexp_extract_all(trim(text), '\S+') AS toks
        |        FROM documents WHERE doc_id IS NOT NULL)
        |), probe AS (
        |  SELECT DISTINCT unnest(gs) AS pg FROM g WHERE doc_id < 5
        |), contaminated AS (
        |  SELECT DISTINCT dg.doc_id FROM
        |    (SELECT doc_id, unnest(gs) AS gg FROM g) dg
        |    JOIN probe ON dg.gg = probe.pg
        |)
        |SELECT doc_id, lang FROM g
        |WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "q39_repetition" ->
      """WITH t3 AS (
        |  SELECT doc_id,
        |  CASE WHEN len(toks) >= 3 THEN list_transform(
        |         generate_series(1, len(toks) - 2),
        |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        |       ELSE [] END AS tris,
        |  CASE WHEN len(toks) > 0
        |       THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
        |       ELSE 0.0 END AS ttr
        |  FROM (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks
        |        FROM documents)
        |), c AS (
        |  SELECT doc_id, g, count(*) AS c
        |  FROM (SELECT doc_id, unnest(tris) AS g FROM t3) GROUP BY doc_id, g
        |), agg AS (
        |  SELECT doc_id, max(c) AS max_rep, sum(c) AS n_trigrams FROM c GROUP BY doc_id
        |)
        |SELECT t3.doc_id,
        |CAST(coalesce(agg.n_trigrams, 0) AS BIGINT) AS n_trigrams,
        |CAST(coalesce(agg.max_rep, 0) AS BIGINT) AS max_rep,
        |round(CASE WHEN coalesce(agg.n_trigrams, 0) > 0
        |  THEN CAST(agg.max_rep AS DOUBLE) / agg.n_trigrams ELSE 0.0 END, 6) AS rep_ratio,
        |round(t3.ttr, 6) AS ttr
        |FROM t3 LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""
        .stripMargin.replace("\n", " "),

    "q40_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, lower(unnest(regexp_extract_all(trim(text), '\S+'))) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
        |), dfx AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), n AS (SELECT count(*) AS n FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfx.df,
        |  CAST(tf.tf * (n.n + 1) AS DOUBLE) / (dfx.df + 1) AS score,
        |  row_number() OVER (PARTITION BY tf.doc_id ORDER BY
        |    CAST(tf.tf * (n.n + 1) AS DOUBLE) / (dfx.df + 1) DESC, tf.term) AS rank
        |  FROM tf JOIN dfx USING (term) CROSS JOIN n
        |)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tf, df,
        |round(score, 6) AS score
        |FROM s WHERE rank <= 3 ORDER BY doc_id, rank"""
        .stripMargin.replace("\n", " "),

    "q41_pii_redact" ->
      """WITH aug AS (
        |  SELECT doc_id, text || ' Contact user' || CAST(doc_id AS VARCHAR)
        |    || '@example.com or '
        |    || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-555-'
        |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        |  FROM documents
        |)
        |SELECT doc_id,
        |CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |CAST(len(regexp_extract_all(regexp_replace(text,
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |md5(regexp_replace(regexp_replace(text,
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_digest
        |FROM aug ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // Recomputes the MD5-profile SimHash bit-for-bit: token hash = first 8
    // bytes of md5(token) as UBIGINT; per-bit ±1 votes; bit 63 carries the
    // sign (HUGEINT intermediate, BIGINT result)
    "q20_simhash" ->
      """SELECT doc_id,
        |CASE WHEN tnull THEN NULL ELSE
        |CAST(list_sum(list_transform(generate_series(0, 63), j ->
        |  CASE WHEN list_sum(list_transform(hs, h ->
        |         CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
        |       THEN CASE WHEN j = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
        |                 ELSE CAST(1::BIGINT << j AS HUGEINT) END
        |       ELSE 0 END)) AS BIGINT) END AS simhash
        |FROM (
        |  SELECT doc_id, text IS NULL AS tnull,
        |    list_transform(regexp_extract_all(trim(text), '\S+'),
        |    t -> CAST('0x' || substr(md5(t), 1, 16) AS UBIGINT)) AS hs
        |  FROM documents
        |) ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "q21_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, source,
        |  list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 0)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh
        |  FROM (SELECT doc_id, source,
        |    regexp_extract_all(trim(text), '\S+') AS toks FROM documents)
        |), j AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0
        |    THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.sh, b.sh)))
        |    ELSE 0.0 END AS jaccard
        |  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id != b.doc_id
        |), r AS (
        |  SELECT id1, id2, jaccard,
        |  row_number() OVER (PARTITION BY id1 ORDER BY jaccard DESC, id2) AS rn
        |  FROM j
        |)
        |SELECT id1 AS doc_id, id2 AS best_id, jaccard FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "q22_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |p AS (
        |  SELECT query_id, e.vec_id AS neighbor_id,
        |  list_sum(list_transform(generate_series(1, len(qv)),
        |    i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
        |  / (sqrt(list_sum(list_transform(generate_series(1, len(qv)),
        |       i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
        |   * sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
        |       i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) AS cos_raw
        |  FROM q, embeddings e WHERE e.vec_id != query_id
        |), r AS (
        |  SELECT query_id, neighbor_id, cos_raw,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
        |  FROM p
        |)
        |SELECT query_id, neighbor_id, round(cos_raw, 6) AS cos, CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank"""
        .stripMargin.replace("\n", " "),

    "q24_event_rollup" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
        |count(*) AS n,
        |CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " "),

    "q25_embedding_neardups" ->
      """WITH p AS (
        |  SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
        |  list_sum(list_transform(generate_series(1, len(a.embedding)),
        |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |  / (sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)),
        |       i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
        |   * sqrt(list_sum(list_transform(generate_series(1, len(b.embedding)),
        |       i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))) AS cos
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id
        |)
        |SELECT label, count(*) AS n_pairs,
        |CAST(sum(CASE WHEN cos >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
        |round(max(cos), 6) AS max_cos
        |FROM p GROUP BY label ORDER BY label""".stripMargin.replace("\n", " "),

    "q26_corpus_pipeline" ->
      """WITH f AS (
        |  SELECT doc_id, text, lang,
        |  CAST(len(regexp_extract_all(trim(text), '\S+')) AS BIGINT) AS word_count,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS BIGINT) AS punct_count,
        |  CAST(len(list_filter(
        |    list_transform(regexp_extract_all(trim(text), '\S+'), x -> lower(x)),
        |    x -> list_contains(['the','a','of','and','to','in','is','for','on','with'], x))) AS BIGINT) AS stop_hits,
        |  CAST(length(text) AS BIGINT) AS n_chars_m
        |  FROM documents
        |), scored AS (
        |  SELECT doc_id, text, lang, word_count,
        |  least(CAST(word_count AS DOUBLE) / 100.0, 1.0) * 0.4
        |    + (1.0 - CASE WHEN n_chars_m > 0 THEN CAST(punct_count AS DOUBLE) / n_chars_m ELSE 0.0 END) * 0.3
        |    + least(CASE WHEN word_count > 0 THEN CAST(stop_hits AS DOUBLE) / word_count ELSE 0.0 END * 5.0, 1.0) * 0.3 AS quality_score
        |  FROM f
        |), kept AS (
        |  SELECT * FROM scored WHERE quality_score >= 0.5 AND word_count >= 20
        |), deduped AS (
        |  SELECT * FROM kept WHERE doc_id IN
        |    (SELECT min(doc_id) FROM kept GROUP BY md5(text))
        |)
        |SELECT lang, count(*) AS n_docs,
        |CAST(sum(word_count) AS BIGINT) AS total_tokens,
        |round(CAST(sum(CAST(quality_score AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6) AS avg_quality
        |FROM deduped GROUP BY lang ORDER BY lang""".stripMargin.replace("\n", " "),

    "q27_media_meta" ->
      """SELECT doc_id, 'image/fake' AS media_type,
        |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "q28_ivf_topk" -> q28OracleSql,

    // null contract mirrored: sample membership must be derivable from
    // the key, so null-key rows are dropped on both sides (a null hash
    // would otherwise sort engine-dependently and shift every rank)
    "q29_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |      % 1000000, doc_id) AS rn
        |  FROM documents WHERE doc_id IS NOT NULL
        |) WHERE rn <= 30 ORDER BY doc_id""".stripMargin.replace("\n", " "),

    "q30_vocab" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT lower(unnest(regexp_extract_all(trim(text), '\S+'))) AS token
        |  FROM documents
        |) GROUP BY token ORDER BY n DESC, token LIMIT 100"""
        .stripMargin.replace("\n", " "),

    "q31_chunks" ->
      """SELECT doc_id, CAST((s - 1) // 48 AS INTEGER) AS chunk_idx,
        |CAST(least(64, len(toks) - s + 1) AS INTEGER) AS n_tokens,
        |md5(array_to_string(list_slice(toks, s, s + 63), ' ')) AS chunk_digest
        |FROM (
        |  SELECT doc_id, toks, unnest(starts) AS s FROM (
        |    SELECT doc_id, toks,
        |    CASE WHEN len(toks) = 0 THEN []
        |         WHEN len(toks) <= 64 THEN [1]
        |         ELSE generate_series(1, ((len(toks) - 64 + 47) // 48) * 48 + 1, 48)
        |         END AS starts
        |    FROM (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks
        |          FROM documents)
        |  )
        |) ORDER BY doc_id, chunk_idx""".stripMargin.replace("\n", " "),

    "q32_asof" ->
      """WITH rollup AS (
        |  SELECT event_type,
        |  date_trunc('day', ts) + INTERVAL 1 DAY AS avail_ts,
        |  strftime(date_trunc('day', ts), '%Y-%m-%d') AS asof_day,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS asof_value
        |  FROM events GROUP BY 1, 2, 3
        |)
        |SELECT e.event_id, e.event_type, r.asof_day, r.asof_value
        |FROM events e ASOF LEFT JOIN rollup r
        |  ON e.event_type = r.event_type AND e.ts >= r.avail_ts
        |ORDER BY e.event_id""".stripMargin.replace("\n", " "),

    // gaps-and-islands: a session breaks where the gap STRICTLY exceeds
    // 2h (session_window merges an event exactly gap after the previous).
    // RANGE framing, not ROWS (r15, found by the x4 oracle gate): with
    // duplicate timestamps the ROWS running sum splits equal-ts PEERS
    // across the break depending on the tie order — nondeterministic
    // and wrong; RANGE gives every peer the same island, which is what
    // session_window computes
    "q33_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |  CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |          > INTERVAL 2 HOUR
        |       THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |), s AS (
        |  SELECT user_id, ts, value,
        |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    RANGE UNBOUNDED PRECEDING) AS sid
        |  FROM o
        |)
        |SELECT user_id,
        |strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        |count(*) AS n_events,
        |CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin.replace("\n", " "),

    "q34_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
        .stripMargin.replace("\n", " "),

    "q35_pivot" ->
      """SELECT o_orderpriority,
        |CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
        |CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
        |CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""
        .stripMargin.replace("\n", " "),

    "q23b_ann_portable" -> q23bOracleSql,

    "q42_range_join" ->
      """WITH ranges AS (
        |  SELECT g.r AS range_id, g.r * 10.0 AS lo, g.r * 10.0 + 15.0 AS hi
        |  FROM generate_series(0, 49) g(r)
        |), j AS (
        |  SELECT r.range_id, e.value FROM events e
        |  JOIN ranges r ON e.value >= r.lo AND e.value < r.hi
        |)
        |SELECT range_id, count(*) AS n,
        |CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM j GROUP BY range_id ORDER BY range_id"""
        .stripMargin.replace("\n", " "),

    // Each event lies in ALL 4 of the hopping windows starting at its
    // 6h-aligned slot minus 0..3 slides (width/slide = 4, epoch-aligned
    // like Spark's window()); make_timestamp keeps the oracle in plain
    // (zoneless) timestamps
    "q44_sliding_window" ->
      """WITH m AS (
        |  SELECT event_type, value,
        |  CAST(floor(epoch(ts) / 21600) AS BIGINT) * 21600 AS aligned
        |  FROM events
        |), w AS (
        |  SELECT event_type, value,
        |  make_timestamp((aligned - g.i * 21600) * 1000000) AS wstart
        |  FROM m CROSS JOIN generate_series(0, 3) g(i)
        |)
        |SELECT strftime(wstart, '%Y-%m-%d %H:%M') AS window_start, event_type,
        |count(*) AS n,
        |CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " "),

    // null contract mirrored (q29's): null-key rows drop BEFORE the
    // quota aggregate too — they neither consume a slot nor deflate the
    // min-stratum size; a null STRATUM stays (a real group)
    "q45_source_balance" ->
      """WITH d AS (SELECT doc_id, source FROM documents
        |           WHERE doc_id IS NOT NULL),
        |c AS (SELECT source, count(*) AS c FROM d GROUP BY 1),
        |m AS (SELECT min(c) AS m FROM c),
        |r AS (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY source ORDER BY
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |      % 1000000, doc_id) AS rn
        |  FROM d
        |)
        |SELECT doc_id, source FROM r, m WHERE rn <= m.m ORDER BY doc_id"""
        .stripMargin.replace("\n", " "),

    // The bloom prefilter only drops non-matching fact rows (FPs survive
    // to the exact join), so the oracle is the PLAIN inner join
    "q46_bloom_join" ->
      """SELECT p_brand, count(*) AS n,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 3 GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "),

    "q47_profile" -> (Seq(
        ("l_partkey", true), ("l_quantity", true), ("l_extendedprice", true),
        ("l_discount", true), ("l_returnflag", false))
      .map { case (c, num) =>
        val mn = if (num) s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        val mx = if (num) s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           |count(*) - count($c) AS n_nulls,
           |count(DISTINCT $c) AS n_distinct,
           |$mn AS min_value, $mx AS max_value FROM lineitem"""
          .stripMargin.replace("\n", " ")
      }.mkString(" UNION ALL ") + " ORDER BY column_name"),

    // Mirrors the engine's fixed double op order: w = (hi-lo)/20,
    // bin = least(floor((x-lo)/w), 19), bounds lo + id*w / lo + (id+1)*w
    "q48_histogram" ->
      """WITH mm AS (
        |  SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
        |         CAST(max(l_extendedprice) AS DOUBLE) AS hi
        |  FROM lineitem
        |), b AS (
        |  SELECT CASE WHEN hi = lo THEN 0
        |    ELSE least(CAST(floor((CAST(l_extendedprice AS DOUBLE) - lo)
        |      / ((hi - lo) / 20)) AS BIGINT), 19) END AS bin_id, lo, hi
        |  FROM lineitem, mm
        |)
        |SELECT bin_id, lo + bin_id * ((hi - lo) / 20) AS bin_lo,
        |lo + (bin_id + 1) * ((hi - lo) / 20) AS bin_hi, count(*) AS n
        |FROM b GROUP BY bin_id, lo, hi ORDER BY bin_id"""
        .stripMargin.replace("\n", " "),

    // Integer-only membership: hash(key) * wmax < ppm * weight
    "q49_weighted_sample" ->
      """WITH mx AS (SELECT CAST(max(n_chars) AS BIGINT) AS wmax FROM documents)
        |SELECT doc_id, n_chars FROM documents, mx
        |WHERE (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |  % 1000000) * wmax < 500000 * CAST(n_chars AS BIGINT)
        |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // Decimal-exact s1/s2 then double arithmetic in the engine's op order
    "q50_outliers" ->
      """WITH st AS (
        |  SELECT event_type, count(value) AS gn,
        |    CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1
        |)
        |SELECT event_id, e.event_type, value,
        |(value - s1 / gn) / sqrt((s2 - s1 * s1 / gn) / (gn - 1)) AS z
        |FROM events e JOIN st ON e.event_type = st.event_type
        |WHERE gn >= 2 AND (s2 - s1 * s1 / gn) / (gn - 1) > 0
        |AND abs((value - s1 / gn) / sqrt((s2 - s1 * s1 / gn) / (gn - 1))) > 3
        |ORDER BY event_id""".stripMargin.replace("\n", " "),

    "q51_cdc_compact" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id"""
        .stripMargin.replace("\n", " "),

    // struct-min pick ≡ first row under ORDER BY (second_ts, second_id)
    "q52_funnel" ->
      """SELECT user_id, first_id, first_ts, second_id, second_ts FROM (
        |  SELECT a.user_id, a.event_id AS first_id, a.ts AS first_ts,
        |    b.event_id AS second_id, b.ts AS second_ts,
        |    row_number() OVER (PARTITION BY a.user_id, a.event_id
        |      ORDER BY b.ts, b.event_id) AS rn
        |  FROM events a JOIN events b ON a.user_id = b.user_id
        |  WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        |    AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 3600 SECOND
        |) WHERE rn = 1 ORDER BY user_id, first_id"""
        .stripMargin.replace("\n", " "),

    // DECIMAL-exact frame sum, one double division — mirrors the engine
    "q53_rolling_mean" ->
      """SELECT event_id, user_id, value,
        |CAST(sum(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE)
        |  / count(value) OVER w AS roll_avg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin.replace("\n", " "),

    // Pack id = floor(exclusive-cumsum / budget) in (key-hash, key) order
    "q54_pack" ->
      """WITH h AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
        |      % 1000000 AS hk
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, lang, n_chars, hk,
        |    coalesce(sum(n_chars) OVER (PARTITION BY lang
        |      ORDER BY hk NULLS FIRST, doc_id NULLS FIRST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        |  FROM h
        |)
        |SELECT doc_id, lang, n_chars,
        |CAST(floor(pre / 10000) AS BIGINT) AS pack_id,
        |CAST(row_number() OVER (
        |  PARTITION BY lang, CAST(floor(pre / 10000) AS BIGINT)
        |  ORDER BY hk NULLS FIRST, doc_id NULLS FIRST) AS INTEGER)
        |  AS pack_pos
        |FROM c ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // The Morton spread unrolled: 4 shift/mask stages per dimension, then
    // even/odd interleave; norm = clamp(floor((x-lo)/(hi-lo)*65536))
    "q55_zorder_key" ->
      """WITH mm AS (
        |  SELECT CAST(min(value) AS DOUBLE) AS loa, CAST(max(value) AS DOUBLE) AS hia,
        |         CAST(min(user_id) AS DOUBLE) AS lob, CAST(max(user_id) AS DOUBLE) AS hib
        |  FROM events
        |), n AS (
        |  SELECT event_id,
        |    CASE WHEN hia = loa THEN 0 ELSE greatest(0, least(65535,
        |      CAST(floor((CAST(value AS DOUBLE) - loa) / (hia - loa) * 65536.0) AS BIGINT))) END AS a,
        |    CASE WHEN hib = lob THEN 0 ELSE greatest(0, least(65535,
        |      CAST(floor((CAST(user_id AS DOUBLE) - lob) / (hib - lob) * 65536.0) AS BIGINT))) END AS b
        |  FROM events, mm
        |), s1 AS (
        |  SELECT event_id, (a | (a << 8)) & 16711935 AS a, (b | (b << 8)) & 16711935 AS b FROM n
        |), s2 AS (
        |  SELECT event_id, (a | (a << 4)) & 252645135 AS a, (b | (b << 4)) & 252645135 AS b FROM s1
        |), s3 AS (
        |  SELECT event_id, (a | (a << 2)) & 858993459 AS a, (b | (b << 2)) & 858993459 AS b FROM s2
        |), s4 AS (
        |  SELECT event_id, (a | (a << 1)) & 1431655765 AS a, (b | (b << 1)) & 1431655765 AS b FROM s3
        |)
        |SELECT event_id, a | (b << 1) AS zkey FROM s4 ORDER BY event_id"""
        .stripMargin.replace("\n", " "),

    "q56_topk_per_group" ->
      """WITH agg AS (
        |  SELECT p_brand, p_partkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2
        |)
        |SELECT p_brand, p_partkey, sum_qty, rank_in_group FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY p_brand
        |    ORDER BY sum_qty DESC, p_partkey) AS INTEGER) AS rank_in_group
        |  FROM agg
        |) WHERE rank_in_group <= 3 ORDER BY p_brand, rank_in_group"""
        .stripMargin.replace("\n", " "),

    "q57_quartiles" ->
      """SELECT event_id, event_type, value,
        |CAST(ntile(4) OVER (PARTITION BY event_type
        |  ORDER BY value, event_id) AS INTEGER) AS segment
        |FROM events ORDER BY event_id""".stripMargin.replace("\n", " "),

    "q43_month_delta" ->
      s"""WITH agg AS (
         |  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         |  count(*) AS n
         |  $oracleOrdersOf WHERE n_name = 'NATION_19' AND $oracleWindow
         |  GROUP BY 1
         |)
         |SELECT a.month, a.n, p.n AS prev_n, a.n - p.n AS delta_n,
         |CASE WHEN p.n <> 0 THEN round(CAST(a.n - p.n AS DOUBLE) / p.n, 6) END AS pct_change
         |FROM agg a LEFT JOIN agg p
         |  ON p.month = strftime(CAST(a.month || '-01' AS DATE) - INTERVAL 1 MONTH, '%Y-%m')
         |ORDER BY a.month""".stripMargin.replace("\n", " "),

    "q36_stream_dedup_twin" ->
      """WITH d AS (
        |  SELECT event_id, ts, md5(concat_ws('|', user_id, event_type,
        |    CAST(floor(value * 1000000) AS BIGINT))) AS digest
        |  FROM events
        |), r AS (
        |  SELECT event_id, digest,
        |    row_number() OVER (PARTITION BY digest ORDER BY ts, event_id) AS rn
        |  FROM d
        |)
        |SELECT event_id, digest FROM r WHERE rn = 1 ORDER BY event_id"""
        .stripMargin.replace("\n", " "),

    // two latest-wins compaction cuts (the q51 shape), full-outer diffed;
    // only differing users survive, with both sides' values carried
    "q58_snapshot_diff" ->
      """WITH so AS (
        |  SELECT user_id, event_id, event_type, value FROM (
        |    SELECT user_id, event_id, event_type, value,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events WHERE ts < TIMESTAMP '2024-01-16'
        |  ) WHERE rn = 1 AND event_type <> 'error'
        |), sn AS (
        |  SELECT user_id, event_id, event_type, value FROM (
        |    SELECT user_id, event_id, event_type, value,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events
        |  ) WHERE rn = 1 AND event_type <> 'error'
        |)
        |SELECT * FROM (
        |  SELECT coalesce(o.user_id, n.user_id) AS user_id,
        |    o.event_id AS old_event_id, o.event_type AS old_event_type,
        |    o.value AS old_value,
        |    n.event_id AS new_event_id, n.event_type AS new_event_type,
        |    n.value AS new_value,
        |    CASE WHEN o.user_id IS NULL THEN 'added'
        |         WHEN n.user_id IS NULL THEN 'removed'
        |         WHEN o.event_id IS DISTINCT FROM n.event_id
        |           OR o.event_type IS DISTINCT FROM n.event_type
        |           OR o.value IS DISTINCT FROM n.value THEN 'changed'
        |    END AS change_type
        |  FROM so o FULL JOIN sn n ON o.user_id = n.user_id
        |) WHERE change_type IS NOT NULL ORDER BY user_id"""
        .stripMargin.replace("\n", " "),

    // integer calendar arithmetic (year*12+month) — no interval subtraction
    "q59_cohort" ->
      """WITH acts AS (
        |  SELECT DISTINCT o_custkey AS k,
        |    date_trunc('month', o_orderdate) AS m FROM orders
        |), coh AS (
        |  SELECT k, min(m) AS c FROM acts GROUP BY k
        |)
        |SELECT strftime(c, '%Y-%m') AS cohort_month,
        |  CAST((year(m) * 12 + month(m)) - (year(c) * 12 + month(c))
        |    AS INTEGER) AS month_offset,
        |  count(*) AS n_active
        |FROM acts JOIN coh USING (k)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " "),

    // nearest-rank bounds at ceil(n*pct/100) via integer arithmetic; the
    // clamped mean follows the repo's decimal-exact sum discipline
    "q60_winsorized" ->
      """WITH nn AS (
        |  SELECT event_type, value, event_id FROM events
        |  WHERE value IS NOT NULL
        |), r AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM nn
        |), b AS (
        |  SELECT event_type,
        |    min(CASE WHEN rn = greatest(CAST(floor((n * 5 + 99) / 100) AS BIGINT), 1)
        |      THEN value END) AS lo,
        |    min(CASE WHEN rn = greatest(CAST(floor((n * 95 + 99) / 100) AS BIGINT), 1)
        |      THEN value END) AS hi
        |  FROM r GROUP BY event_type
        |)
        |SELECT nn.event_type, count(*) AS n,
        |  min(b.lo) AS lo_bound, min(b.hi) AS hi_bound,
        |  CAST(sum(CAST(least(greatest(nn.value, b.lo), b.hi)
        |    AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS winsorized_mean
        |FROM nn JOIN b USING (event_type)
        |GROUP BY nn.event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " "),

    "q61_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""
        .stripMargin.replace("\n", " "),

    // exact integer cumsum windows, one double division at the end
    "q62_pareto" ->
      """SELECT doc_id, source, n_chars,
        |CAST(row_number() OVER (PARTITION BY source
        |  ORDER BY n_chars DESC, doc_id) AS INTEGER) AS rank_in_group,
        |CASE WHEN sum(n_chars) OVER (PARTITION BY source) > 0
        |  THEN CAST(sum(n_chars) OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |    / sum(n_chars) OVER (PARTITION BY source)
        |  ELSE 1.0 END AS cum_share
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // positional word-5-grams; stop-grams (occ > 1000) dropped on BOTH
    // sides (part of the operator's semantics); diagonal gaps-and-islands
    // finds maximal consecutive runs; longest run, earliest-start tiebreak
    "q63_dup_spans" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks
        |  FROM documents
        |), gr AS (
        |  SELECT doc_id, u['pos'] AS pos, u['gram'] AS gram FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
        |      i -> {'pos': i,
        |            'gram': concat_ws(' ', toks[i], toks[i+1], toks[i+2],
        |                              toks[i+3], toks[i+4])})) AS u
        |    FROM tok
        |  )
        |), rare AS (
        |  SELECT * FROM gr QUALIFY count(*) OVER (PARTITION BY gram) <= 1000
        |), hits AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.pos AS pos1, b.pos AS pos2
        |  FROM rare a JOIN rare b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |), runs AS (
        |  SELECT id1, id2, count(*) AS len, min(pos1) AS s1, min(pos2) AS s2
        |  FROM (
        |    SELECT id1, id2, pos1, pos2,
        |      pos1 - row_number() OVER (PARTITION BY id1, id2, pos1 - pos2
        |        ORDER BY pos1) AS run
        |    FROM hits
        |  ) GROUP BY id1, id2, pos1 - pos2, run
        |  HAVING count(*) >= 3
        |), best AS (
        |  SELECT id1, id2, len, s1, s2,
        |    row_number() OVER (PARTITION BY id1, id2
        |      ORDER BY len DESC, s1, s2) AS rn
        |  FROM runs
        |)
        |SELECT id1, id2, len + 4 AS span_tokens, s1 AS start1, s2 AS start2
        |FROM best WHERE rn = 1 ORDER BY id1, id2"""
        .stripMargin.replace("\n", " "),

    // q143: q63's gram/run derivation extended to COVERAGE and rebuild —
    // all qualifying runs (not each pair's longest), victim-side token
    // intervals, keep-first survivors re-joined by single spaces;
    // untouched docs stay byte-identical (the CASE keeps d.text)
    "q143_excise_spans" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks
        |  FROM documents WHERE doc_id IS NOT NULL
        |), gr AS (
        |  SELECT doc_id, u['pos'] AS pos, u['gram'] AS gram FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(toks) - 3),
        |      i -> {'pos': i,
        |            'gram': concat_ws(' ', toks[i], toks[i+1], toks[i+2],
        |                              toks[i+3], toks[i+4])})) AS u
        |    FROM tok
        |  )
        |), rare AS (
        |  SELECT * FROM gr QUALIFY count(*) OVER (PARTITION BY gram) <= 1000
        |), hits AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.pos AS pos1, b.pos AS pos2
        |  FROM rare a JOIN rare b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |), runs AS (
        |  SELECT id2, count(*) AS len, min(pos2) AS s2
        |  FROM (
        |    SELECT id1, id2, pos1, pos2,
        |      pos1 - row_number() OVER (PARTITION BY id1, id2, pos1 - pos2
        |        ORDER BY pos1) AS run
        |    FROM hits
        |  ) GROUP BY id1, id2, pos1 - pos2, run
        |  HAVING count(*) >= 3
        |), cov AS (
        |  SELECT DISTINCT id2 AS doc_id, g.g AS pos
        |  FROM runs CROSS JOIN unnest(generate_series(s2, s2 + len + 3)) g(g)
        |), aff AS (SELECT DISTINCT doc_id FROM cov
        |), ptok AS (
        |  SELECT doc_id, u['pos'] AS pos, u['tok'] AS tok FROM (
        |    SELECT t.doc_id, unnest(list_transform(range(1, len(toks) + 1),
        |      i -> {'pos': i, 'tok': toks[i]})) AS u
        |    FROM tok t JOIN aff USING (doc_id)
        |  )
        |), kept AS (
        |  SELECT p.doc_id,
        |    string_agg(p.tok, ' ' ORDER BY p.pos) AS text,
        |    count(*) AS n_kept
        |  FROM ptok p
        |  WHERE NOT EXISTS (SELECT 1 FROM cov c
        |                    WHERE c.doc_id = p.doc_id AND c.pos = p.pos)
        |  GROUP BY p.doc_id
        |)
        |SELECT t.doc_id,
        |  CASE WHEN a.doc_id IS NULL THEN d.text
        |       ELSE coalesce(k.text, '') END AS text,
        |  CAST(CASE WHEN a.doc_id IS NULL THEN 0
        |       ELSE len(t.toks) - coalesce(k.n_kept, 0) END AS BIGINT)
        |    AS n_dropped
        |FROM tok t
        |LEFT JOIN aff a USING (doc_id)
        |LEFT JOIN kept k USING (doc_id)
        |JOIN documents d USING (doc_id)
        |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // q144: every history row's validity stamps re-derived from the hash
    // splits — b1 rows (bucket4 != 0) open at 1 and close at 2 when the
    // b2 merge changes them (bucket3 = 0) or at 3 when the delete hits a
    // still-current row (bucket5 = 0); b2 rows open at 2 with nc+1000 and
    // close only at the delete. The engine's no-op re-merge is implicitly
    // verified: a burned version would stamp the delete at 4, not 3.
    "q144_scd_history" ->
      """WITH d AS (
        |  SELECT doc_id, source, CAST(coalesce(n_chars, 0) AS BIGINT) AS nc,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 4 AS b4,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 3 AS b3,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 5 AS b5
        |  FROM documents WHERE doc_id IS NOT NULL
        |)
        |SELECT doc_id, source, nc, CAST(1 AS BIGINT) AS valid_from,
        |  CAST(CASE WHEN b3 = 0 THEN 2 WHEN b5 = 0 THEN 3 END AS BIGINT)
        |    AS valid_to
        |FROM d WHERE b4 <> 0
        |UNION ALL
        |SELECT doc_id, source, nc + 1000, CAST(2 AS BIGINT),
        |  CAST(CASE WHEN b5 = 0 THEN 3 END AS BIGINT)
        |FROM d WHERE b3 = 0
        |ORDER BY doc_id, valid_from""".stripMargin.replace("\n", " "),

    // q145: both sides of the atomic swap from the hash splits — as-of
    // 3 the original payloads, as-of 4 the +5000 recomputed region
    "q145_replace_where" ->
      """WITH d AS (
        |  SELECT doc_id, source, CAST(coalesce(n_chars, 0) AS BIGINT) AS nc,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 4 AS b4
        |  FROM documents WHERE doc_id IS NOT NULL
        |), m AS (
        |  SELECT CAST(3 AS BIGINT) AS as_of, source, nc FROM d
        |  UNION ALL
        |  SELECT CAST(4 AS BIGINT), source,
        |    nc + CASE WHEN b4 = 1 THEN 5000 ELSE 0 END FROM d
        |)
        |SELECT as_of, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nc) AS BIGINT) AS sum_chars
        |FROM m GROUP BY as_of, source
        |ORDER BY as_of, source""".stripMargin.replace("\n", " "),

    // q146: both cuts from the hash split — cut 1 the full corpus on
    // BOTH members (despite the reads running after the delete), cut 2
    // the post-delete corpus on both; n_docs must equal dim_docs at
    // every cut or the group leaked a torn pair
    "q146_snapshot_group" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 7 AS del
        |  FROM documents WHERE doc_id IS NOT NULL
        |), m AS (
        |  SELECT CAST(1 AS BIGINT) AS cut, source FROM d
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), source FROM d WHERE del <> 3
        |)
        |SELECT cut, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS dim_docs
        |FROM m GROUP BY cut, source
        |ORDER BY cut, source""".stripMargin.replace("\n", " "),

    // q147: the validity window re-derived per (key, epoch) from the
    // hash splits — the v1 row lives [1, 2) when the change closes it
    // / [1, 3) when only the delete does / [1, ∞) otherwise; the v2
    // row lives [2, 3) or [2, ∞); anything outside its window reads
    // NULL, and the null-id fact row carries null epoch + null attrs
    "q147_pit_join" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(coalesce(n_chars, 0) AS BIGINT) AS nc,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 4 AS b4,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 3 AS b3,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 5 AS b5,
        |    1 + (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 7) % 3 AS e
        |  FROM documents
        |)
        |SELECT doc_id, CAST(e AS BIGINT) AS epoch,
        |  CAST(CASE
        |    WHEN doc_id IS NULL THEN NULL
        |    WHEN b4 <> 0 AND e < CASE WHEN b3 = 0 THEN 2
        |      WHEN b5 = 0 THEN 3 ELSE 99 END THEN nc
        |    WHEN b3 = 0 AND e >= 2 AND (b5 <> 0 OR e < 3)
        |      THEN nc + 1000
        |  END AS BIGINT) AS dim_nc
        |FROM d
        |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // q148: both cuts re-derived from the hash splits (the q146
    // pattern) — cut 1 the full fact set under the ORIGINAL tiers
    // despite the reads running after both mutations, cut 2 the
    // post-delete facts under the re-tiered dimension; null-source
    // facts group under a null tier (LEFT-join contract)
    "q148_versioned_dashboard" ->
      """WITH d AS (
        |  SELECT source, CAST(coalesce(n_chars, 0) AS BIGINT) AS nc,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 7 AS del,
        |    CASE WHEN source IS NULL THEN NULL
        |      ELSE 't' || CAST(CAST('0x' || substr(md5(source), 1, 15)
        |        AS BIGINT) % 3 AS VARCHAR) END AS tier1,
        |    CASE WHEN source IS NULL THEN NULL
        |      WHEN CAST('0x' || substr(md5(source), 1, 15)
        |        AS BIGINT) % 5 = 0 THEN 't9'
        |      ELSE 't' || CAST(CAST('0x' || substr(md5(source), 1, 15)
        |        AS BIGINT) % 3 AS VARCHAR) END AS tier2
        |  FROM documents WHERE doc_id IS NOT NULL
        |), m AS (
        |  SELECT CAST(1 AS BIGINT) AS cut, tier1 AS tier, nc FROM d
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), tier2, nc FROM d WHERE del <> 3
        |)
        |SELECT cut, tier, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(nc) AS BIGINT) AS sum_nc
        |FROM m GROUP BY cut, tier
        |ORDER BY cut, tier""".stripMargin.replace("\n", " "),

    // q149: the checkpointed lake's four versions re-derived from the
    // hash splits — v2 is the first two append buckets, v3 all three,
    // v4 drops the delete bucket, v5 additionally carries the upsert's
    // +1000 on its bucket. The fold/vacuum must be invisible here: the
    // oracle knows nothing about checkpoints, only version contents.
    "q149_lineage_checkpoint" ->
      """WITH d AS (
        |  SELECT source, CAST(coalesce(n_chars, 0) AS BIGINT) AS nc,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 3 AS b,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 7 AS del
        |  FROM documents WHERE doc_id IS NOT NULL
        |), vers(as_of) AS (
        |  VALUES (CAST(2 AS BIGINT)), (CAST(3 AS BIGINT)),
        |         (CAST(4 AS BIGINT)), (CAST(5 AS BIGINT))
        |), m AS (
        |  SELECT v.as_of, d.source,
        |    CASE WHEN v.as_of = 5 AND d.del = 5 THEN d.nc + 1000
        |         ELSE d.nc END AS nc
        |  FROM d CROSS JOIN vers v
        |  WHERE (v.as_of = 2 AND d.b < 2)
        |     OR (v.as_of = 3)
        |     OR (v.as_of >= 4 AND d.del <> 3)
        |)
        |SELECT as_of, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nc) AS BIGINT) AS sum_chars
        |FROM m GROUP BY as_of, source
        |ORDER BY as_of, source""".stripMargin.replace("\n", " "),

    // the oracle is the FULL RECOMPUTE the merge must equal bit-for-bit
    "q64_incremental" ->
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |count(*) AS n,
        |CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "),

    "q65_skew_profile" ->
      """WITH c AS (
        |  SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY 1
        |), t AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
        |    max(c) AS max_count
        |  FROM c
        |), tk AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS topk_count FROM (
        |    SELECT c FROM c ORDER BY c DESC, k LIMIT 10
        |  )
        |)
        |SELECT n_rows, n_keys, max_count,
        |  CAST(max_count AS DOUBLE) / n_rows AS max_share,
        |  topk_count,
        |  CAST(topk_count AS DOUBLE) / n_rows AS topk_share
        |FROM t, tk""".stripMargin.replace("\n", " "),

    // list(... ORDER BY ts, event_id)[1:5] ≡ the engine's lexicographic
    // (ts, event_id, type) struct sort + slice
    "q66_journeys" ->
      """SELECT user_id, count(*) AS n_events,
        |array_to_string(list(event_type ORDER BY ts, event_id)[1:5], '>')
        |  AS journey
        |FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |GROUP BY user_id ORDER BY user_id"""
        .stripMargin.replace("\n", " "),

    // list-comprehension pairing ≡ the engine's zip_with over the
    // 1-shifted slices; generate_series(1, n-1) is [] for n<2
    "q67_bigrams" ->
      """SELECT bigram, count(*) AS n FROM (
        |  SELECT unnest([lower(l[i]) || ' ' || lower(l[i+1])
        |    for i in generate_series(1, len(l)-1)]) AS bigram
        |  FROM (SELECT regexp_extract_all(trim(text), '\S+') AS l
        |        FROM documents)
        |) GROUP BY bigram ORDER BY n DESC, bigram LIMIT 100"""
        .stripMargin.replace("\n", " "),

    "q68_cooccur" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
        |), freq AS (
        |  SELECT i FROM items GROUP BY i HAVING count(*) >= 20
        |), pruned AS (
        |  SELECT b, i FROM items WHERE i IN (SELECT i FROM freq)
        |)
        |SELECT a.i AS i1, c.i AS i2, count(*) AS n_baskets
        |FROM pruned a JOIN pruned c ON a.b = c.b AND a.i < c.i
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY n_baskets DESC, i1, i2 LIMIT 100"""
        .stripMargin.replace("\n", " "),

    // the oracle is the naive all-pairs fuzzy filter the lossless
    // length-bucket blocking must exactly reproduce
    "q69_fuzzy_join" ->
      """WITH probes AS (
        |  SELECT p_partkey AS probe_key,
        |    substr(p_name, 1, 2) || substr(p_name, 4) AS probe
        |  FROM part WHERE p_partkey % 97 = 0
        |)
        |SELECT probe_key, probe, p_partkey AS match_key, p_name AS name,
        |  CAST(levenshtein(probe, p_name) AS INTEGER) AS dist
        |FROM probes, part WHERE levenshtein(probe, p_name) <= 2
        |ORDER BY probe_key, match_key"""
        .stripMargin.replace("\n", " "),

    // add-one-smoothed bigram ratios, mean over the SORTED ratio list —
    // list_sum(list_sort(...)) ≡ the engine's aggregate(array_sort(...))
    // in-order double fold; no logs anywhere (libm would diverge)
    "q70_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    [lower(x) for x in regexp_extract_all(trim(text), '\S+')] AS l
        |  FROM documents
        |), ucnt AS (
        |  SELECT u AS tok, count(*) AS c
        |  FROM (SELECT unnest(l) AS u FROM toks) GROUP BY 1
        |), v AS (
        |  SELECT count(*) AS nv FROM ucnt
        |), pairs AS (
        |  SELECT doc_id, s['p'] AS prefix, s['b'] AS bigram FROM (
        |    SELECT doc_id, unnest([{'p': l[i], 'b': l[i] || ' ' || l[i+1]}
        |      for i in generate_series(1, len(l)-1)]) AS s
        |    FROM toks)
        |), bcnt AS (
        |  SELECT bigram, count(*) AS bc FROM pairs GROUP BY 1
        |), ratios AS (
        |  SELECT doc_id, CAST(bc + 1 AS DOUBLE) / (uc.c + v.nv) AS r
        |  FROM pairs JOIN bcnt USING (bigram)
        |  JOIN ucnt uc ON pairs.prefix = uc.tok CROSS JOIN v
        |)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  list_sum(list_sort(list(r))) / count(*) AS lm_score
        |FROM ratios GROUP BY doc_id ORDER BY doc_id"""
        .stripMargin.replace("\n", " "),

    // capacity (64) >> distinct event types (5): the sketch never
    // decrements, so its output IS the exact count table
    "q71_heavy_hitters" ->
      """SELECT event_type AS item, count(*) AS n FROM events
        |WHERE event_type IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, item"""
        .stripMargin.replace("\n", " "),

    // the oracle is the naive all-pairs overlap the binned+dedup join
    // must exactly reproduce; epoch_us ≡ Spark unix_micros under UTC
    "q72_interval_join" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS lo,
        |    epoch_us(ts) + (event_id % 50 + 1) * 3600000000 AS hi
        |  FROM events
        |)
        |SELECT a.user_id, a.event_id AS left_id, b.event_id AS right_id,
        |  least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_us
        |FROM iv a JOIN iv b ON a.user_id = b.user_id
        |WHERE a.event_type = 'view' AND b.event_type = 'purchase'
        |  AND a.lo < b.hi AND b.lo < a.hi
        |ORDER BY 1, 2, 3"""
        .stripMargin.replace("\n", " "),

    // both iterations unrolled; teleport mirrors the engine's
    // `1.0 - damping` IEEE subtraction (NOT a 0.15 literal);
    // list_sum(list_sort(...)) ≡ the engine's sorted in-order fold
    "q73_pagerank" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
        |), freq AS (
        |  SELECT i FROM items GROUP BY i HAVING count(*) >= 20
        |), pruned AS (
        |  SELECT b, i FROM items WHERE i IN (SELECT i FROM freq)
        |), pairs AS (
        |  SELECT a.i AS i1, c.i AS i2 FROM pruned a JOIN pruned c
        |  ON a.b = c.b AND a.i < c.i GROUP BY 1, 2 HAVING count(*) >= 2
        |), edges AS (
        |  SELECT i1 AS s, i2 AS d FROM pairs
        |  UNION ALL SELECT i2, i1 FROM pairs
        |), deg AS (
        |  SELECT s, count(*) AS dg FROM edges GROUP BY 1
        |), pr1 AS (
        |  SELECT e.d AS v,
        |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) + CAST(0.85 AS DOUBLE)
        |      * list_sum(list_sort(list(CAST(1 AS DOUBLE) / dg))) AS pr
        |  FROM edges e JOIN deg ON e.s = deg.s GROUP BY e.d
        |), pr2 AS (
        |  SELECT e.d AS v,
        |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) + CAST(0.85 AS DOUBLE)
        |      * list_sum(list_sort(list(pr1.pr / deg.dg))) AS pr
        |  FROM edges e JOIN deg ON e.s = deg.s JOIN pr1 ON pr1.v = e.s
        |  GROUP BY e.d
        |)
        |SELECT v AS node, pr FROM pr2 ORDER BY v"""
        .stripMargin.replace("\n", " "),

    // sufficient statistics exact in decimal/bigint; slope & intercept
    // are each ONE double cast + divide, mirrored operation-for-operation
    "q74_trend" ->
      """WITH m AS (
        |  SELECT c.c_mktsegment AS segment,
        |    CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT)
        |      AS x,
        |    sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2
        |), s AS (
        |  SELECT segment, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM m GROUP BY 1
        |), sl AS (
        |  SELECT segment, n, sx, sy,
        |    CASE WHEN n * sxx - sx * sx <> 0 THEN
        |      CAST(n * sxy - sx * sy AS DOUBLE) /
        |      CAST(n * sxx - sx * sx AS DOUBLE) END AS slope
        |  FROM s
        |)
        |SELECT segment, n AS n_points, slope,
        |  CASE WHEN slope IS NOT NULL THEN
        |    (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) /
        |    CAST(n AS DOUBLE) END AS intercept
        |FROM sl ORDER BY segment"""
        .stripMargin.replace("\n", " "),

    // row_number over (ts, event_id) ≡ the engine's struct-min; revenue
    // folded sorted at both levels (per user, then per touch type)
    "q75_attribution" ->
      """WITH t AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS rn
        |  FROM events
        |), touch AS (
        |  SELECT user_id, event_type AS first_touch FROM t WHERE rn = 1
        |), conv AS (
        |  SELECT user_id, count(*) AS nc,
        |    list_sum(list_sort(list(value))) AS rev
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id
        |)
        |SELECT first_touch, count(*) AS n_users,
        |  CAST(sum(coalesce(nc, 0)) AS BIGINT) AS n_conversions,
        |  list_sum(list_sort(list(coalesce(rev, 0.0)))) AS revenue
        |FROM touch LEFT JOIN conv USING (user_id)
        |GROUP BY 1 ORDER BY first_touch"""
        .stripMargin.replace("\n", " "),

    // identical moment arithmetic to the engine: decimal-exact frame
    // sums cast to double, then mean/var/sqrt/divide one step each
    "q76_anomalies" ->
      """WITH w AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    count(l_extendedprice) OVER fr AS n,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) OVER fr
        |      AS DOUBLE) AS s1,
        |    CAST(sum(CAST(l_extendedprice * l_extendedprice
        |      AS DECIMAL(30,6))) OVER fr AS DOUBLE) AS s2
        |  FROM lineitem
        |  WINDOW fr AS (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |), z AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    (l_extendedprice - s1 / n)
        |      / sqrt((s2 - s1 * s1 / n) / (n - 1)) AS z
        |  FROM w WHERE n >= 2 AND (s2 - s1 * s1 / n) / (n - 1) > 0
        |)
        |SELECT * FROM z WHERE abs(z) > 2.5
        |ORDER BY l_suppkey, l_orderkey, l_linenumber"""
        .stripMargin.replace("\n", " "),

    // NOT coalesce(pred, FALSE) ≡ the engine's null-is-violation rule;
    // counts CAST to BIGINT (DuckDB integer sums are HUGEINT otherwise)
    "q77_quality_gate" ->
      """WITH t AS (
        |  SELECT count(*) AS n_rows,
        |    CAST(sum(CASE WHEN NOT coalesce(
        |      l_discount >= 0 AND l_discount <= 0.1, FALSE)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_discount,
        |    CAST(sum(CASE WHEN NOT coalesce(l_extendedprice > 0, FALSE)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_price,
        |    CAST(sum(CASE WHEN NOT coalesce(
        |      l_quantity >= 1 AND l_quantity <= 50, FALSE)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        |    CAST(sum(CASE WHEN NOT coalesce(
        |      l_tax >= 0 AND l_tax <= 0.08, FALSE)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_tax,
        |    CAST(sum(CASE WHEN NOT coalesce(
        |      l_returnflag IN ('A','N','R'), FALSE)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_flag
        |  FROM lineitem
        |)
        |SELECT 'discount_range' AS rule, n_rows, v_discount AS n_violations
        |  FROM t
        |UNION ALL SELECT 'price_positive', n_rows, v_price FROM t
        |UNION ALL SELECT 'qty_range', n_rows, v_qty FROM t
        |UNION ALL SELECT 'tax_range', n_rows, v_tax FROM t
        |UNION ALL SELECT 'flag_domain', n_rows, v_flag FROM t
        |ORDER BY rule"""
        .stripMargin.replace("\n", " "),

    // q78: within-block exact cosine (the q25 formula), >= 0.5 edge set,
    // then the q37-style recursive-CTE min-label fixpoint over ALL vec_ids
    "q78_semantic_clusters" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  list_sum(list_transform(generate_series(1, len(a.embedding)),
        |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |  / (sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)),
        |       i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
        |   * sqrt(list_sum(list_transform(generate_series(1, len(b.embedding)),
        |       i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))) AS cos
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id
        |), e AS (
        |  SELECT id1 AS a, id2 AS b FROM p WHERE cos >= 0.5
        |  UNION ALL
        |  SELECT id2 AS a, id1 AS b FROM p WHERE cos >= 0.5
        |), r(id, lbl) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT e.a, r.lbl FROM e JOIN r ON e.b = r.id
        |)
        |SELECT id AS vec_id, min(lbl) AS cluster FROM r GROUP BY id
        |ORDER BY vec_id""".stripMargin.replace("\n", " "),

    // q79: the hashBucket md5 arithmetic is SQL-portable by design —
    // same 15-hex-digit prefix, same modulus, same (hash, key) order
    "q79_shards" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS hv
        |  FROM documents
        |)
        |SELECT doc_id, CAST(hv % 8 AS INTEGER) AS shard_id,
        |  CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id)
        |    AS INTEGER) AS shard_pos
        |FROM h ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // q81: q37's recursive-CTE clusters, then survivors = rows whose id IS
    // the cluster min, carrying the absorbed-duplicate count
    // null contract mirrored (q122's treatment): null-id rows survive as
    // their own singleton "clusters" (cluster NULL, n_dropped 0) — the
    // engine's nullIdSingletons union branch
    "q81_dedup_survivors" ->
      s"""WITH RECURSIVE $q19PairsCte,
         |e AS MATERIALIZED (
         |  SELECT id1 AS a, id2 AS b FROM j WHERE jaccard >= 0.8
         |  UNION ALL
         |  SELECT id2 AS a, id1 AS b FROM j WHERE jaccard >= 0.8
         |),
         |r(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents WHERE doc_id IS NOT NULL
         |  UNION
         |  SELECT e.a, r.lbl FROM e JOIN r ON e.b = r.id
         |),
         |c AS (SELECT id AS doc_id, min(lbl) AS cluster FROM r GROUP BY id),
         |sz AS (SELECT cluster, count(*) AS szn FROM c GROUP BY cluster)
         |SELECT c.doc_id, c.cluster, CAST(sz.szn - 1 AS BIGINT) AS n_dropped,
         |  d.lang
         |FROM c JOIN sz USING (cluster) JOIN documents d USING (doc_id)
         |WHERE c.doc_id = c.cluster
         |UNION ALL
         |SELECT doc_id, CAST(NULL AS BIGINT) AS cluster,
         |  CAST(0 AS BIGINT) AS n_dropped, lang
         |FROM documents WHERE doc_id IS NULL
         |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // q82: batch survivors = texts history never saw, lowest batch id per
    // duplicate text (md5 hex agrees between engines, established by q36);
    // same engineered duplicate families as the engine side. Null digests
    // behave like values (q96's contract): the membership test and the
    // winner pick are IS NOT DISTINCT FROM, mirroring the engine's <=>
    // anti-join and its null-digest min-id group
    "q82_incremental_exact" ->
      """WITH cut AS (SELECT count(*) // 2 AS c FROM documents),
        |aug AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 7 = 3 THEN 'batch dup '
        |           || CAST(doc_id // c AS VARCHAR) || ' '
        |           || CAST(doc_id % 13 AS VARCHAR)
        |         WHEN doc_id % 7 = 5 THEN 'shared dup '
        |           || CAST(doc_id % 5 AS VARCHAR)
        |         ELSE text END AS text
        |  FROM documents, cut
        |), hist AS (
        |  SELECT DISTINCT md5(text) AS dg FROM aug, cut WHERE doc_id < c
        |), batch AS (
        |  SELECT doc_id, lang, md5(text) AS dg FROM aug, cut
        |  WHERE doc_id >= c
        |), fresh AS (
        |  SELECT b.* FROM batch b WHERE NOT EXISTS (
        |    SELECT 1 FROM hist WHERE hist.dg IS NOT DISTINCT FROM b.dg)
        |)
        |SELECT doc_id, lang FROM fresh f
        |WHERE doc_id = (SELECT min(doc_id) FROM fresh f2
        |                WHERE f2.dg IS NOT DISTINCT FROM f.dg)
        |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // q80: the true >= 0.8 pair set (q19's CTE) restricted to pairs that
    // touch the new batch (ids >= count/2) — id1 < id2, so "touches the
    // batch" is exactly id2 >= cut
    "q80_incremental_dedup" ->
      s"""WITH $q19PairsCte
         |SELECT id1, id2, round(jaccard, 6) AS jaccard FROM j
         |WHERE jaccard >= 0.8
         |  AND id2 >= (SELECT count(*) // 2 FROM documents)
         |ORDER BY id1, id2""".stripMargin.replace("\n", " "),

    // q83: true >= 0.8 pairs with one side in each half — the flagger's
    // batch→neighbor orientation puts the (larger) batch id first
    "q83_flag_index" ->
      s"""WITH $q19PairsCte
         |SELECT id2 AS doc_id, id1 AS neighbor_id,
         |  round(jaccard, 6) AS jaccard FROM j
         |WHERE jaccard >= 0.8
         |  AND id1 < (SELECT count(*) // 2 FROM documents)
         |  AND id2 >= (SELECT count(*) // 2 FROM documents)
         |ORDER BY doc_id, neighbor_id""".stripMargin.replace("\n", " "),

    // q84: ALL pairs within hamming 3 of the q20-portable fingerprint —
    // pigeonhole makes the engine's block-join recall exact, so the
    // brute-force form IS the oracle
    "q84_simhash_pairs" ->
      s"""WITH $portableSimhashFpCte
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY id1, id2""".stripMargin.replace("\n", " "),

    // q85: the same true pair set restricted to pairs touching the new
    // batch (id1 < id2, so "touches the batch" is exactly id2 >= cut —
    // the q80 trick)
    "q85_incremental_simhash" ->
      s"""WITH $portableSimhashFpCte
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |  AND b.doc_id >= (SELECT count(*) // 2 FROM documents)
         |ORDER BY id1, id2""".stripMargin.replace("\n", " "),

    // q86: the synthesizer's parameter derivations recomputed directly
    // (WAV: rate 8000+(id%5)*4000, 1+(id//2)%2 channels, (n%1000+1)
    // frames → floor(frames*1000/rate) ms, 44 header bytes; MP4:
    // 600*(id%120)+(id%7) units @ timescale 600, 1+id%3 traks,
    // 132+8*traks bytes). Integer division throughout (DuckDB //)
    "q86_container_meta" ->
      """SELECT doc_id,
        |CASE WHEN doc_id % 2 = 0 THEN 'audio/wav' ELSE 'video/mp4' END AS media_type,
        |CAST(CASE WHEN doc_id % 2 = 0 THEN 44
        |  ELSE 132 + 8 * (1 + doc_id % 3) END AS BIGINT) AS n_bytes,
        |CASE WHEN doc_id % 2 = 0
        |  THEN CAST(8000 + (doc_id % 5) * 4000 AS INTEGER) END AS sample_rate,
        |CASE WHEN doc_id % 2 = 0
        |  THEN CAST(1 + (doc_id // 2) % 2 AS INTEGER) END AS channels,
        |CAST(CASE WHEN doc_id % 2 = 0
        |  THEN ((coalesce(octet_length(encode(text)), 0) % 1000 + 1) * 1000)
        |    // (8000 + (doc_id % 5) * 4000)
        |  ELSE ((600 * (doc_id % 120) + doc_id % 7) * 1000) // 600
        |  END AS BIGINT) AS duration_ms,
        |CASE WHEN doc_id % 2 = 1
        |  THEN CAST(1 + doc_id % 3 AS INTEGER) END AS n_tracks
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // q87: the int8 quantization re-derived in SQL — max-abs scale in
    // double, floor(x*127/s + 0.5) rounding (spelled floor, not round(),
    // so both engines use identical IEEE ops), then integer-exact dot
    // products; only the final sqrt/divide is floating point
    "q87_quantized_topk" ->
      """WITH q8 AS (
        |  SELECT vec_id,
        |  CASE WHEN s > 0 THEN list_transform(embedding,
        |         x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / s + 0.5) AS BIGINT))
        |       ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q
        |  FROM (SELECT vec_id, embedding,
        |        list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s
        |        FROM embeddings)
        |), qq AS (SELECT vec_id AS query_id, q AS qv FROM q8 WHERE vec_id < 5),
        |p AS (
        |  SELECT query_id, c.vec_id AS neighbor_id,
        |  list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * c.q[i])) AS d,
        |  sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)) *
        |  sqrt(CAST(list_sum(list_transform(c.q, x -> x * x)) AS DOUBLE)) AS nn
        |  FROM qq, q8 c WHERE c.vec_id != query_id
        |), r AS (
        |  SELECT query_id, neighbor_id,
        |  CASE WHEN nn = 0 THEN 0.0 ELSE CAST(d AS DOUBLE) / nn END AS cos_raw,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY CASE WHEN nn = 0 THEN 0.0 ELSE CAST(d AS DOUBLE) / nn END DESC,
        |    neighbor_id) AS rank
        |  FROM p
        |)
        |SELECT query_id, neighbor_id, round(cos_raw, 6) AS cos,
        |CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank"""
        .stripMargin.replace("\n", " "),

    // q88: q87's quantized CTE chain cut at rank <= 40 (k=10 × factor 4),
    // then the float rescore — q22's exact-cosine formula over only the
    // candidate pairs — re-ranked to the final 10
    "q88_rescored_topk" ->
      """WITH q8 AS (
        |  SELECT vec_id,
        |  CASE WHEN s > 0 THEN list_transform(embedding,
        |         x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / s + 0.5) AS BIGINT))
        |       ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS q
        |  FROM (SELECT vec_id, embedding,
        |        list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS s
        |        FROM embeddings)
        |), qq AS (SELECT vec_id AS query_id, q AS qv FROM q8 WHERE vec_id < 5),
        |p AS (
        |  SELECT query_id, c.vec_id AS neighbor_id,
        |  list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * c.q[i])) AS d,
        |  sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE)) *
        |  sqrt(CAST(list_sum(list_transform(c.q, x -> x * x)) AS DOUBLE)) AS nn
        |  FROM qq, q8 c WHERE c.vec_id != query_id
        |), cand AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY CASE WHEN nn = 0 THEN 0.0 ELSE CAST(d AS DOUBLE) / nn END DESC,
        |      neighbor_id) AS crank
        |    FROM p
        |  ) WHERE crank <= 40
        |), resc AS (
        |  SELECT cand.query_id, cand.neighbor_id,
        |  list_sum(list_transform(generate_series(1, len(qe.embedding)),
        |    i -> CAST(qe.embedding[i] AS DOUBLE) * CAST(ne.embedding[i] AS DOUBLE)))
        |  / (sqrt(list_sum(list_transform(qe.embedding,
        |       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |   * sqrt(list_sum(list_transform(ne.embedding,
        |       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos_raw
        |  FROM cand
        |  JOIN embeddings qe ON qe.vec_id = cand.query_id
        |  JOIN embeddings ne ON ne.vec_id = cand.neighbor_id
        |), r AS (
        |  SELECT query_id, neighbor_id, cos_raw,
        |  row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_raw DESC, neighbor_id) AS rank
        |  FROM resc
        |)
        |SELECT query_id, neighbor_id, round(cos_raw, 6) AS cos,
        |CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 10 ORDER BY query_id, rank"""
        .stripMargin.replace("\n", " "),

    "q89_incremental_ivf" -> q89OracleSql,

    "q108_pq_search" -> q108OracleSql,

    "q111_incremental_pq" -> q111OracleSql,

    "q117_ivfpq_search" -> q117OracleSql,

    "q113_bpe_train" -> q113OracleSql,

    "q114_bpe_vocab" -> q114OracleSql,

    // q115: the same fixed-bounds bin arithmetic over the whole table
    // (both index halves together), same double op order for edges
    "q115_incremental_histogram" ->
      """WITH b AS (
        |  SELECT CASE WHEN v < 1000 THEN -1
        |              WHEN v > 100000 THEN 20
        |              ELSE LEAST(CAST(floor((v - 1000.0)
        |                / ((100000.0 - 1000.0) / 20)) AS BIGINT), 19)
        |         END AS bin_id
        |  FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS v
        |        FROM lineitem)
        |  WHERE v IS NOT NULL)
        |SELECT bin_id,
        |  1000.0 + bin_id * ((100000.0 - 1000.0) / 20) AS bin_lo,
        |  1000.0 + (bin_id + 1) * ((100000.0 - 1000.0) / 20) AS bin_hi,
        |  count(*) AS n
        |FROM b GROUP BY bin_id ORDER BY bin_id""".stripMargin
        .replace("\n", " "),

    // q116: the capped fold as a recursive walk — join iff BOTH the
    // inactivity gap and the running duration admit the event
    "q116_capped_sessions" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
        |  FROM events),
        |walk AS (
        |  SELECT user_id, ts, rn, ts AS ss FROM e WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.ts, e.rn,
        |    CASE WHEN e.ts - w.ts <= INTERVAL 6 HOUR
        |          AND e.ts - w.ss <= INTERVAL 12 HOUR
        |         THEN w.ss ELSE e.ts END
        |  FROM e JOIN walk w ON e.user_id = w.user_id
        |    AND e.rn = w.rn + 1)
        |SELECT user_id, ss AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events
        |FROM walk GROUP BY user_id, ss
        |ORDER BY user_id, session_start""".stripMargin
        .replace("\n", " "),

    // q112: the plain IN filter is the oracle for the bloom-probed
    // needle lookup
    "q112_point_lookup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem WHERE l_orderkey IN (3, 7, 500, 999, 1200)
        |ORDER BY 1, 2""".stripMargin.replace("\n", " "),

    // q110: the synthesized corpus rebuilt, line frequencies
    // re-derived, boilerplate anti-joined away, survivors re-stitched
    // in line order (empty docs keep an empty string)
    "q110_boilerplate" ->
      """WITH d2 AS (
        |  SELECT doc_id, concat_ws(chr(10), 'shared header', text,
        |    CASE WHEN doc_id % 2 = 0 THEN 'promo banner' END,
        |    'footer ' || (doc_id % 5)) AS text
        |  FROM documents),
        |p AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM d2),
        |l AS (SELECT doc_id, g.i AS pos, parts[g.i] AS line
        |      FROM p CROSS JOIN generate_series(1, 4) g(i)
        |      WHERE g.i <= len(parts)),
        |b AS (SELECT line FROM l WHERE trim(line) <> ''
        |      GROUP BY line HAVING count(DISTINCT doc_id) >= 5),
        |k AS (SELECT l.doc_id, l.pos, l.line FROM l ANTI JOIN b USING (line)),
        |r AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS kept
        |      FROM k GROUP BY doc_id)
        |SELECT d2.doc_id, coalesce(r.kept, '') AS text
        |FROM d2 LEFT JOIN r USING (doc_id)
        |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // q109: lag + running-sum session islands; break strictly BEYOND
    // the gap (touching windows merge). RANGE framing like q33 (r15):
    // equal-ts peers must share an island or ties split sessions
    // nondeterministically
    "q109_sessionize" ->
      """WITH m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL 6 HOUR THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      RANGE UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin.replace("\n", " "),

    "q90_incremental_lsh" -> portableLshOracleSql("a.vec_id < 5", 15),

    "q91_zorder_slice" ->
      """SELECT l_returnflag, count(*) AS n,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |  AND l_partkey BETWEEN 10 AND 59
        |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "),

    "q100_layout_delete" ->
      """SELECT l_returnflag, count(*) AS n,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |  AND l_orderkey % 10 <> 3
        |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "),

    // q101: the layout-invariant oracle for the PARTITIONED composed
    // path — the plain filtered scan with the partition predicate as an
    // ordinary WHERE clause
    "q101_partitioned_layout" ->
      """SELECT l_returnflag, count(*) AS n,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_returnflag BETWEEN 'N' AND 'R'
        |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |  AND l_partkey BETWEEN 10 AND 59
        |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "),

    // q102: the synthesizer's per-frame arithmetic regenerated directly
    // (timescale 600, 1+(id%7) frames, delta 100+(id%50), size(f) =
    // 100+(id*31+f*7)%400), bounded-series expansion per the q98 pattern
    "q102_mp4_samples" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 7 AS n FROM documents
        |           WHERE doc_id IS NOT NULL)
        |SELECT d.doc_id, CAST(f.f AS INTEGER) AS frame_idx,
        |  CAST(100 + (d.doc_id*31 + f.f*7) % 400 AS BIGINT) AS frame_bytes,
        |  CAST(100 + d.doc_id % 50 AS BIGINT) AS dur_units,
        |  CAST(600 AS BIGINT) AS timescale
        |FROM d CROSS JOIN generate_series(0, 6) f(f)
        |WHERE f.f < d.n
        |ORDER BY doc_id, frame_idx""".stripMargin.replace("\n", " "),

    // q103: the AVI synthesizer's header arithmetic (width 16+(id%5)*8,
    // height 16+(id%3)*8, 1+(id%6) frames, 33333+(id%10)*1000 µs/frame;
    // duration_ms = frames·µsPerFrame // 1000)
    "q103_avi_meta" ->
      """SELECT doc_id, 'video/avi' AS media_type,
        |  CAST(16 + (doc_id % 5) * 8 AS INTEGER) AS width,
        |  CAST(16 + (doc_id % 3) * 8 AS INTEGER) AS height,
        |  CAST(1 + doc_id % 6 AS INTEGER) AS n_frames,
        |  CAST((1 + doc_id % 6) * (33333 + (doc_id % 10) * 1000) // 1000
        |    AS BIGINT) AS duration_ms
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // q104: the layout-invariant oracle across the whole partitioned
    // write lifecycle — load + append must together hold every row,
    // compaction must move rows without losing any, and the takedown
    // subtracts exactly the partkey ∈ [10,14] ids
    "q104_partitioned_lifecycle" ->
      """SELECT l_returnflag, count(*) AS n,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_returnflag BETWEEN 'N' AND 'R'
        |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |  AND l_partkey BETWEEN 15 AND 79
        |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "),

    // q105: the plain join IS the oracle — the hot/cold split must be
    // invisible in the result
    "q105_skew_join" ->
      """SELECT p_brand, count(*) AS n,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "),

    // q106: each rule's counter re-derived as plain SQL under CHECK
    // null semantics (NULL never violates range/set/regex; NULL FKs
    // pass)
    "q106_validation" ->
      """WITH tot AS (SELECT count(*) AS n FROM lineitem)
        |SELECT rule, target, violations, tot.n AS total,
        |  violations = 0 AS pass
        |FROM (
        |  SELECT 'fk_exists' AS rule, 'l_orderkey' AS target,
        |    (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
        |       AND NOT EXISTS (SELECT 1 FROM orders o
        |                       WHERE o.o_orderkey = l.l_orderkey))
        |    AS violations
        |  UNION ALL
        |  SELECT 'in_range', 'l_extendedprice',
        |    (SELECT count(*) FROM lineitem WHERE l_extendedprice IS NOT NULL
        |       AND l_extendedprice NOT BETWEEN 0 AND 50000)
        |  UNION ALL
        |  SELECT 'in_range', 'l_quantity',
        |    (SELECT count(*) FROM lineitem WHERE l_quantity IS NOT NULL
        |       AND l_quantity NOT BETWEEN 1 AND 50)
        |  UNION ALL
        |  SELECT 'in_set', 'l_returnflag',
        |    (SELECT count(*) FROM lineitem WHERE l_returnflag IS NOT NULL
        |       AND l_returnflag NOT IN ('A','N','R'))
        |  UNION ALL
        |  SELECT 'matches', 'l_linestatus',
        |    (SELECT count(*) FROM lineitem WHERE l_linestatus IS NOT NULL
        |       AND NOT regexp_matches(l_linestatus, '^[OF]$'))
        |  UNION ALL
        |  SELECT 'not_null', 'l_orderkey',
        |    (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL)
        |  UNION ALL
        |  SELECT 'unique', 'l_orderkey,l_linenumber',
        |    (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM
        |      (SELECT count(*) AS c FROM lineitem
        |       GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1))
        |) r CROSS JOIN tot
        |ORDER BY rule, target""".stripMargin.replace("\n", " "),

    // q107: the split function re-derived from scratch — same md5
    // prefix, same hex parse, same floor(cum·2^32) thresholds
    // (0.8 → 3435973836, 0.9 → 3865470566)
    "q107_hash_split" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) AS bkt
        |  FROM documents WHERE doc_id IS NOT NULL)
        |SELECT CASE WHEN bkt < 3435973836 THEN 'train'
        |            WHEN bkt < 3865470566 THEN 'val'
        |            ELSE 'test' END AS split,
        |  lang, count(*) AS n
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
        .replace("\n", " "),

    "q92_layout_append" ->
      """SELECT l_returnflag, count(*) AS n,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
        |  AND l_partkey BETWEEN 10 AND 59
        |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "),

    // q70's count tables over the WHOLE documents table (== hist plus the
    // two appended batches), scoring only doc_id < 50 — scored docs are
    // inside the count corpus, so inner joins see every gram and the
    // engine's left-join smoothing never fires; bit-equality rides the
    // shared exact-integer division and sorted-fold mean.
    // null contract mirrored: the engine's hist/batchA/batchB slices
    // partition by doc_id % k, and null % k is null — a null-id doc falls
    // outside EVERY slice, so the model corpus is the non-null-id docs
    "q93_incremental_lm" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    [lower(x) for x in regexp_extract_all(trim(text), '\S+')] AS l
        |  FROM documents WHERE doc_id IS NOT NULL
        |), ucnt AS (
        |  SELECT u AS tok, count(*) AS c
        |  FROM (SELECT unnest(l) AS u FROM toks) GROUP BY 1
        |), v AS (
        |  SELECT count(*) AS nv FROM ucnt
        |), pairs AS (
        |  SELECT doc_id, s['p'] AS prefix, s['b'] AS bigram FROM (
        |    SELECT doc_id, unnest([{'p': l[i], 'b': l[i] || ' ' || l[i+1]}
        |      for i in generate_series(1, len(l)-1)]) AS s
        |    FROM toks)
        |), bcnt AS (
        |  SELECT bigram, count(*) AS bc FROM pairs GROUP BY 1
        |), ratios AS (
        |  SELECT doc_id, CAST(bc + 1 AS DOUBLE) / (uc.c + v.nv) AS r
        |  FROM pairs JOIN bcnt USING (bigram)
        |  JOIN ucnt uc ON pairs.prefix = uc.tok CROSS JOIN v
        |  WHERE doc_id < 50
        |)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  list_sum(list_sort(list(r))) / count(*) AS lm_score
        |FROM ratios GROUP BY doc_id ORDER BY doc_id"""
        .stripMargin.replace("\n", " "),

    // q71's exact regime carries to the merged segments: every slice
    // sketch is exact (cardinality <= capacity), sums of exacts are exact
    "q94_incremental_hh" ->
      """SELECT event_type AS item, count(*) AS n FROM events
        |WHERE event_type IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, item"""
        .stripMargin.replace("\n", " "),

    // q38's oracle verbatim: the persisted probe index must make the
    // SAME contamination decisions as the one-shot probe tokenize
    "q95_decontaminate_index" ->
      """WITH g AS (
        |  SELECT doc_id, lang,
        |  list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 0)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS gs
        |  FROM (SELECT doc_id, lang, regexp_extract_all(trim(text), '\S+') AS toks
        |        FROM documents WHERE doc_id IS NOT NULL)
        |), probe AS (
        |  SELECT DISTINCT unnest(gs) AS pg FROM g WHERE doc_id < 5
        |), contaminated AS (
        |  SELECT DISTINCT dg.doc_id FROM
        |    (SELECT doc_id, unnest(gs) AS gg FROM g) dg
        |    JOIN probe ON dg.gg = probe.pg
        |)
        |SELECT doc_id, lang FROM g
        |WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
        |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // Effective membership = history digests minus (deleted minus
    // revived), all set steps null-safe (md5(NULL) is NULL on both
    // engines; IS NOT DISTINCT FROM makes the null digest behave like a
    // value, matching the engine's <=> joins). Survivors then keep the
    // lowest doc_id per batch digest group — incrementalExact's min_by.
    "q96_tombstone_exact" ->
      """WITH histdg AS (
        |  SELECT DISTINCT md5(text) AS dg FROM documents WHERE doc_id % 3 <> 0
        |), del AS (
        |  SELECT DISTINCT md5(text) AS dg FROM documents
        |  WHERE doc_id % 3 <> 0 AND doc_id % 5 = 0
        |), rev AS (
        |  SELECT DISTINCT md5(text) AS dg FROM documents
        |  WHERE doc_id % 3 <> 0 AND doc_id % 10 = 0
        |), dmr AS (
        |  SELECT dg FROM del d WHERE NOT EXISTS (
        |    SELECT 1 FROM rev r WHERE r.dg IS NOT DISTINCT FROM d.dg)
        |), eff AS (
        |  SELECT dg FROM histdg h WHERE NOT EXISTS (
        |    SELECT 1 FROM dmr m WHERE m.dg IS NOT DISTINCT FROM h.dg)
        |), batch AS (
        |  SELECT doc_id, lang, md5(text) AS dg FROM documents
        |  WHERE doc_id % 3 = 0
        |), fresh AS (
        |  SELECT * FROM batch b WHERE NOT EXISTS (
        |    SELECT 1 FROM eff e WHERE e.dg IS NOT DISTINCT FROM b.dg)
        |)
        |SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY dg ORDER BY doc_id) AS rn
        |  FROM fresh
        |) WHERE rn = 1 ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // q89's chain with {11, 300, 301} excluded from the neighbor side:
    // 10 was deleted then revived (tombstone cleared), the others stay
    // deleted through the compaction
    "q97_tombstone_ivf" -> ivfIncrementalOracleSql(Seq(11L, 300L, 301L)),

    // layout-invariant like q91: the plain 3-predicate filter + agg
    "q99_zorder3" ->
      """SELECT l_returnflag, count(*) AS n,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |  AND l_partkey BETWEEN 10 AND 59
        |  AND l_suppkey BETWEEN 2 AND 5
        |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "),

    // The synthesized PCM samples regenerated in SQL (same integer
    // arithmetic as Multimodal.wavPcmBytes), statistics recomputed with
    // the decoder's exact steps: integer Σs² (DuckDB HUGEINT, exact;
    // < 2^53 so the double cast is too), one divide, one sqrt
    "q98_wav_features" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    (coalesce(octet_length(encode(text)), 0) % 200) + 1 AS n,
        |    8000 + (doc_id % 5) * 4000 AS rate,
        |    1 + (doc_id % 2) AS ch
        |  FROM documents WHERE doc_id IS NOT NULL
        |), s AS (
        |  SELECT d.doc_id, d.rate, d.n, c.c AS channel,
        |    ((d.doc_id * 7919 + f.f * 31 + c.c * 17) % 65536) - 32768 AS v
        |  FROM d
        |  CROSS JOIN generate_series(0, 199) f(f)
        |  CROSS JOIN generate_series(0, 1) c(c)
        |  WHERE f.f < d.n AND c.c < d.ch
        |)
        |SELECT doc_id, CAST(channel AS INTEGER) AS channel,
        |  CAST(rate AS INTEGER) AS sample_rate, CAST(n AS INTEGER) AS n_frames,
        |  round(sqrt(CAST(SUM(v * v) AS DOUBLE) / n), 6) AS rms,
        |  CAST(MAX(abs(v)) AS BIGINT) AS peak
        |FROM s GROUP BY doc_id, channel, rate, n
        |ORDER BY doc_id, channel""".stripMargin.replace("\n", " "),

    // q118: the MJPEG-in-MP4 synthesizer's arithmetic — frame count
    // 1+(id%5), frame f sized 20+2·((id·7+f·3)%40), filler byte i is
    // (id+f+i)%251 (max size 98, so the i-series cap of 97 is exact,
    // not a truncation) — regenerated straight in SQL; the engine side
    // must slice the identical bytes back out of mdat through the
    // stsc/stco/co64 walk to reproduce each frame's byte sum
    "q118_mjpeg_mp4" ->
      """WITH d AS (SELECT doc_id, 1 + doc_id % 5 AS n FROM documents
        |           WHERE doc_id IS NOT NULL),
        |f AS (
        |  SELECT d.doc_id, f.f AS frame_idx,
        |    20 + 2 * ((d.doc_id * 7 + f.f * 3) % 40) AS sz
        |  FROM d CROSS JOIN generate_series(0, 4) f(f) WHERE f.f < d.n)
        |SELECT doc_id, CAST(0 AS INTEGER) AS track_idx,
        |  CAST(frame_idx AS INTEGER) AS frame_idx,
        |  CAST(sz AS BIGINT) AS frame_bytes,
        |  CAST(SUM((doc_id + frame_idx + i.i) % 251) AS BIGINT) AS byte_sum
        |FROM f CROSS JOIN generate_series(0, 97) i(i) WHERE i.i < sz
        |GROUP BY doc_id, frame_idx, sz
        |ORDER BY doc_id, frame_idx""".stripMargin.replace("\n", " "),

    // q119: the t-digest median's rank must sit within the δ=100 bound
    // for every group — the oracle pins the VERDICT (like q23b's recall
    // contract), not the approximate estimate itself
    "q119_tdigest_rank" ->
      """SELECT l_returnflag, true AS within_bound
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin.replace("\n", " "),

    // q120: the engine computes running token totals via binned offsets
    // (skew-proof); the oracle is the NAIVE single-window cumsum over
    // the same deterministic (hash, id) order — any slip in the
    // bin/offset arithmetic diverges from it
    "q120_token_budget" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(coalesce(len(regexp_extract_all(trim(text), '\S+')), 0)
        |      AS BIGINT) AS n_tokens,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 1000000 AS h
        |  FROM documents WHERE doc_id IS NOT NULL
        |), b(source, budget) AS (
        |  VALUES ('src0', 5000), ('src1', 10000000), ('src2', 600)
        |), c AS (
        |  SELECT t.source, doc_id, n_tokens, budget,
        |    CAST(sum(n_tokens) OVER (PARTITION BY t.source
        |      ORDER BY h, doc_id) AS BIGINT) AS cum_tokens
        |  FROM t JOIN b USING (source)
        |)
        |SELECT source, doc_id, n_tokens, cum_tokens
        |FROM c WHERE cum_tokens <= budget
        |ORDER BY source, doc_id""".stripMargin.replace("\n", " "),

    // q121: dom_rank re-derived with a plain row_number window; the
    // budget is ceil(0.4 × the source's row count)
    "q121_domain_gate" ->
      """WITH d0 AS (
        |  SELECT * FROM documents
        |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
        |), n AS (
        |  SELECT source, count(*) AS cnt FROM d0 GROUP BY source
        |), r AS (
        |  SELECT d.source, d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars_k,
        |    CAST(row_number() OVER (PARTITION BY d.source
        |      ORDER BY CAST(d.n_chars AS DOUBLE) DESC, d.doc_id)
        |      AS BIGINT) AS dom_rank,
        |    n.cnt
        |  FROM d0 d JOIN n USING (source)
        |)
        |SELECT source, doc_id, n_chars_k, dom_rank
        |FROM r WHERE dom_rank <= CAST(ceil(0.4 * cnt) AS BIGINT)
        |ORDER BY source, doc_id""".stripMargin.replace("\n", " "),

    // q122: q81's exact ground-truth pipeline (all-pairs 3-gram Jaccard
    // → recursive-CTE components) with the survivor changed to the
    // per-cluster argmax of (n_chars desc, doc_id asc)
    "q122_dedup_best" ->
      """WITH RECURSIVE sh AS MATERIALIZED (
        |  SELECT doc_id,
        |  CASE WHEN len(toks) >= 3 THEN list_distinct(list_transform(
        |         generate_series(1, len(toks) - 2),
        |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
        |       WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        |       ELSE [] END AS sh
        |  FROM (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks
        |        FROM documents)
        |), ix AS MATERIALIZED (
        |  SELECT doc_id, len(sh) AS n, unnest(sh) AS g FROM sh
        |), j AS MATERIALIZED (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2,
        |    CAST(count(*) AS DOUBLE)
        |      / (any_value(a.n) + any_value(b.n) - count(*)) AS jaccard
        |  FROM ix a JOIN ix b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |), e AS MATERIALIZED (
        |  SELECT id1 AS a, id2 AS b FROM j WHERE jaccard >= 0.8
        |  UNION ALL
        |  SELECT id2 AS a, id1 AS b FROM j WHERE jaccard >= 0.8
        |), r(id, lbl) AS (
        |  SELECT doc_id, doc_id FROM documents WHERE doc_id IS NOT NULL
        |  UNION
        |  SELECT e.a, r.lbl FROM e JOIN r ON e.b = r.id
        |), c AS (SELECT id AS doc_id, min(lbl) AS cluster FROM r GROUP BY id),
        |sz AS (SELECT cluster, count(*) AS szn FROM c GROUP BY cluster),
        |m AS (
        |  SELECT c.doc_id, c.cluster, CAST(sz.szn - 1 AS BIGINT) AS n_dropped,
        |    CAST(d.n_chars AS BIGINT) AS kept_chars
        |  FROM c JOIN sz USING (cluster) JOIN documents d USING (doc_id)
        |  QUALIFY row_number() OVER (PARTITION BY c.cluster
        |    ORDER BY d.n_chars DESC NULLS LAST, c.doc_id) = 1
        |)
        |SELECT * FROM m
        |UNION ALL
        |SELECT doc_id, CAST(NULL AS BIGINT) AS cluster,
        |  CAST(0 AS BIGINT) AS n_dropped, CAST(n_chars AS BIGINT)
        |  AS kept_chars
        |FROM documents WHERE doc_id IS NULL
        |ORDER BY doc_id""".stripMargin.replace("\n", " "),

    // q123: epochs by DuckDB's integral // over the naive window totals;
    // remainder membership by the same (md5-hash, id) prefix as q120
    "q123_epoch_fill" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(coalesce(len(regexp_extract_all(trim(text), '\S+')), 0)
        |      AS BIGINT) AS n_tokens,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 1000000 AS h
        |  FROM documents WHERE doc_id IS NOT NULL
        |), b(source, budget) AS (
        |  VALUES ('src0', 5000), ('src1', 800), ('src2', 15000)
        |), c AS (
        |  SELECT t.source, doc_id, n_tokens, budget,
        |    sum(n_tokens) OVER (PARTITION BY t.source
        |      ORDER BY h, doc_id) AS cum,
        |    sum(n_tokens) OVER (PARTITION BY t.source) AS tot
        |  FROM t JOIN b USING (source)
        |), e AS (
        |  SELECT source, doc_id, n_tokens,
        |    (budget // tot) + CASE WHEN cum <= budget - (budget // tot) * tot
        |      THEN 1 ELSE 0 END AS n_copies
        |  FROM c WHERE tot > 0
        |)
        |SELECT source, doc_id, n_tokens, CAST(n_copies AS BIGINT) AS n_copies
        |FROM e WHERE n_copies > 0
        |ORDER BY source, doc_id""".stripMargin.replace("\n", " "),

    // q124: the q123 manifest unnested via generate_series, shuffle key
    // re-derived with the same md5 formula over 'key:copy_idx'
    "q124_epoch_expand" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(coalesce(len(regexp_extract_all(trim(text), '\S+')), 0)
        |      AS BIGINT) AS n_tokens,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 1000000 AS h
        |  FROM documents WHERE doc_id IS NOT NULL
        |), b(source, budget) AS (
        |  VALUES ('src0', 5000), ('src1', 800), ('src2', 15000)
        |), c AS (
        |  SELECT t.source, doc_id, n_tokens, budget,
        |    sum(n_tokens) OVER (PARTITION BY t.source
        |      ORDER BY h, doc_id) AS cum,
        |    sum(n_tokens) OVER (PARTITION BY t.source) AS tot
        |  FROM t JOIN b USING (source)
        |), e AS (
        |  SELECT doc_id,
        |    CAST((budget // tot) + CASE WHEN cum <= budget
        |      - (budget // tot) * tot THEN 1 ELSE 0 END AS BIGINT)
        |      AS n_copies
        |  FROM c WHERE tot > 0
        |)
        |SELECT doc_id, CAST(u.ci AS BIGINT) AS copy_idx,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
        |    || CAST(u.ci AS VARCHAR)), 1, 15) AS BIGINT) % 1000000000
        |    AS shuffle_key
        |FROM e, unnest(generate_series(1, n_copies)) AS u(ci)
        |WHERE n_copies > 0
        |ORDER BY doc_id, copy_idx""".stripMargin.replace("\n", " "),

    // q126: the byWeight fill re-derived with the naive window over the
    // weight column itself (null weights count 0)
    "q126_weight_fill" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(coalesce(n_chars, 0) AS BIGINT) AS fill_weight,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 1000000 AS h
        |  FROM documents WHERE doc_id IS NOT NULL
        |), b(source, budget) AS (
        |  VALUES ('src0', 5000), ('src1', 100000), ('src2', 900)
        |), c AS (
        |  SELECT t.source, doc_id, fill_weight, budget,
        |    CAST(sum(fill_weight) OVER (PARTITION BY t.source
        |      ORDER BY h, doc_id) AS BIGINT) AS cum_weight
        |  FROM t JOIN b USING (source)
        |)
        |SELECT source, doc_id, fill_weight, cum_weight
        |FROM c WHERE cum_weight <= budget
        |ORDER BY source, doc_id""".stripMargin.replace("\n", " "),

    // q127: the q124 per-copy derivation re-aggregated per shard
    "q127_training_manifest" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(coalesce(len(regexp_extract_all(trim(text), '\S+')), 0)
        |      AS BIGINT) AS n_tokens,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 1000000 AS h
        |  FROM documents WHERE doc_id IS NOT NULL
        |), b(source, budget) AS (
        |  VALUES ('src0', 5000), ('src1', 800), ('src2', 15000)
        |), c AS (
        |  SELECT t.source, doc_id, n_tokens, budget,
        |    sum(n_tokens) OVER (PARTITION BY t.source
        |      ORDER BY h, doc_id) AS cum,
        |    sum(n_tokens) OVER (PARTITION BY t.source) AS tot
        |  FROM t JOIN b USING (source)
        |), e AS (
        |  SELECT doc_id, n_tokens,
        |    CAST((budget // tot) + CASE WHEN cum <= budget
        |      - (budget // tot) * tot THEN 1 ELSE 0 END AS BIGINT)
        |      AS n_copies
        |  FROM c WHERE tot > 0
        |), x AS (
        |  SELECT doc_id, n_tokens,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
        |      || CAST(u.ci AS VARCHAR)), 1, 15) AS BIGINT) % 1000000000
        |      AS shuffle_key
        |  FROM e, unnest(generate_series(1, n_copies)) AS u(ci)
        |  WHERE n_copies > 0
        |)
        |SELECT shuffle_key % 8 AS shard,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
        |FROM x GROUP BY 1 ORDER BY shard""".stripMargin.replace("\n", " "),

    // q125: the q38 gram pipeline kept as PAIRS — distinct shared grams
    // per (doc, probe), counted on gram strings where the engine counts
    // 64-bit hashes
    "q125_contamination_report" ->
      """WITH g AS (
        |  SELECT doc_id,
        |  list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 0)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS gs
        |  FROM (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS toks
        |        FROM documents)
        |), d AS (SELECT doc_id, unnest(gs) AS gg FROM g),
        |p AS (SELECT doc_id AS probe_id, unnest(gs) AS pg FROM g
        |      WHERE doc_id < 5)
        |SELECT d.doc_id, p.probe_id,
        |  CAST(count(*) AS BIGINT) AS shared_grams
        |FROM d JOIN p ON d.gg = p.pg
        |GROUP BY d.doc_id, p.probe_id
        |ORDER BY d.doc_id, p.probe_id""".stripMargin.replace("\n", " "),

    // q128: each snapshot's membership re-derived from the hash splits
    // alone — v2 = first two commit buckets, v3 = all, v4/v5 = all minus
    // the versioned delete's bucket (v5 is the compaction: content
    // UNCHANGED by contract). The engine's lineage/file mechanics must
    // reproduce exactly this, or a remove leaked into history / a
    // too-early delete / an ingested orphan breaks the hash.
    "q128_time_travel" ->
      """WITH d AS (
        |  SELECT source, coalesce(n_chars, 0) AS nc,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 3 AS b,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 7 AS del
        |  FROM documents WHERE doc_id IS NOT NULL
        |), vers(as_of) AS (
        |  VALUES (CAST(2 AS BIGINT)), (CAST(3 AS BIGINT)),
        |         (CAST(4 AS BIGINT)), (CAST(5 AS BIGINT))
        |), m AS (
        |  SELECT v.as_of, d.source, d.nc FROM d CROSS JOIN vers v
        |  WHERE (v.as_of = 2 AND d.b < 2)
        |     OR (v.as_of = 3)
        |     OR (v.as_of >= 4 AND d.del <> 3)
        |)
        |SELECT as_of, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nc) AS BIGINT) AS sum_chars
        |FROM m GROUP BY as_of, source
        |ORDER BY as_of, source""".stripMargin.replace("\n", " "),

    // q129: the fractional spec floor-converted to absolute budgets IN
    // SQL — explicit DOUBLE casts so DuckDB floors the same IEEE product
    // the engine does (its default DECIMAL arithmetic would diverge for
    // fractions whose double product lands just below an integer) —
    // then the q120 naive-window form over those budgets.
    "q129_mixture_fill" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(coalesce(len(regexp_extract_all(trim(text), '\S+')), 0)
        |      AS BIGINT) AS n_tokens,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 1000000 AS h
        |  FROM documents WHERE doc_id IS NOT NULL
        |), b AS (
        |  SELECT source,
        |    CAST(floor(CAST(f AS DOUBLE) * 100000) AS BIGINT) AS budget
        |  FROM (VALUES ('src0', 0.005), ('src1', 0.9), ('src2', 0.006))
        |    s(source, f)
        |), c AS (
        |  SELECT t.source, doc_id, n_tokens, budget,
        |    CAST(sum(n_tokens) OVER (PARTITION BY t.source
        |      ORDER BY h, doc_id) AS BIGINT) AS cum_tokens
        |  FROM t JOIN b USING (source)
        |)
        |SELECT source, doc_id, n_tokens, cum_tokens
        |FROM c WHERE cum_tokens <= budget
        |ORDER BY source, doc_id""".stripMargin.replace("\n", " "),

    // q130: the deleted key set re-derived from the hash split — the
    // v2→v3 diff is exactly it disappearing, the v3→v4 (rollback) diff
    // exactly it reappearing
    "q130_tt_rollback_diff" ->
      """WITH del AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id IS NOT NULL
        |    AND CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 7 = 3
        |)
        |SELECT from_v, doc_id, change FROM (
        |  SELECT CAST(2 AS BIGINT) AS from_v, doc_id,
        |    'disappeared' AS change FROM del
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), doc_id, 'appeared' FROM del
        |)
        |ORDER BY from_v, doc_id""".stripMargin.replace("\n", " "),

    // q131: version 2's membership is every doc unchanged; version 3's
    // is every doc with the bucket-5→2 payload bump plus the synthetic
    // negative-id rows — whole-row MERGE re-derived from the hash
    // splits alone
    "q131_tt_upsert" ->
      """WITH d AS (
        |  SELECT doc_id, source, coalesce(n_chars, 0) AS nc,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 5 AS u,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 11 AS ins
        |  FROM documents WHERE doc_id IS NOT NULL
        |), m AS (
        |  SELECT CAST(2 AS BIGINT) AS as_of, source, nc FROM d
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), source,
        |    nc + CASE WHEN u = 2 THEN 1000 ELSE 0 END FROM d
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), 'synthetic', 7 FROM d WHERE ins = 4
        |)
        |SELECT as_of, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nc) AS BIGINT) AS sum_chars
        |FROM m GROUP BY as_of, source
        |ORDER BY as_of, source""".stripMargin.replace("\n", " "),

    // q132: the feed re-derived from the splits — v2 the second commit
    // bucket arriving, v3 the delete bucket leaving, v4 the upsert
    // (updates where the key survived v3, RE-inserts where it didn't,
    // synthetic inserts unconditionally), v5 (compaction) NOTHING
    "q132_tt_changes" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 2 AS b,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 7 AS del,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 5 AS u,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 13 AS ins
        |  FROM documents WHERE doc_id IS NOT NULL
        |), f AS (
        |  SELECT CAST(2 AS BIGINT) AS version, doc_id,
        |    'inserted' AS change FROM d WHERE b = 1
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), doc_id, 'deleted' FROM d WHERE del = 3
        |  UNION ALL
        |  SELECT CAST(4 AS BIGINT), doc_id,
        |    CASE WHEN del = 3 THEN 'inserted' ELSE 'updated' END
        |  FROM d WHERE u = 1
        |  UNION ALL
        |  SELECT CAST(4 AS BIGINT), -doc_id - 1, 'inserted'
        |  FROM d WHERE ins = 6
        |)
        |SELECT version, doc_id, change FROM f
        |ORDER BY version, doc_id""".stripMargin.replace("\n", " "),

    // q133: the incrementally-refreshed view must equal a FULL recompute
    // of the final membership — kept iff not deleted or re-upserted,
    // payload bumped for the upsert bucket, plus the synthetic group
    "q133_matview" ->
      """WITH d AS (
        |  SELECT doc_id, source, coalesce(n_chars, 0) AS nc,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 7 AS del,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 5 AS u,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 11 AS ins
        |  FROM documents WHERE doc_id IS NOT NULL
        |), final AS (
        |  SELECT source, nc + CASE WHEN u = 2 THEN 1000 ELSE 0 END AS nc
        |  FROM d WHERE del <> 3 OR u = 2
        |  UNION ALL
        |  SELECT 'synthetic', 7 FROM d WHERE ins = 4
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(nc) AS BIGINT) AS sum_nc
        |FROM final GROUP BY source
        |ORDER BY source""".stripMargin.replace("\n", " "),

    // q134: the feed-maintained digest index must equal the digest set
    // of the FINAL live membership (bodies are id-prefixed, hence
    // per-doc-unique, so content-keyed tombstones have no collateral):
    // kept originals, updated bodies, synthetic inserts — nothing else
    "q134_feed_index" -> feedIndexMembershipOracle,

    // q140: the layout-invariant rollup — base (even orderkeys) + the
    // four dribble commits (odd orderkeys: %8 ∈ {1,3,5,7}) = the whole
    // table; compactSmall must move rows without losing or duplicating
    // any, whatever it packed
    "q140_small_compaction" ->
      """SELECT l_returnflag, count(*) AS n,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
        .replace("\n", " "),

    // q141: the SAME final membership as q134 — the engine side only
    // changes HOW the feed drives the index (a streaming query instead
    // of a driver loop), which must be invisible to the result
    "q141_stream_feed_index" -> feedIndexMembershipOracle,

    // q142: the replica must hold exactly the source's final ROWS
    // (q134's mutation script re-derived row-wise, synthetic inserts
    // keyed at -doc_id-1)
    "q142_replication" ->
      """WITH d AS (
        |  SELECT doc_id, coalesce(text, '') AS tx,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 7 AS del,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 5 AS u,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 11 AS ins
        |  FROM documents WHERE doc_id IS NOT NULL
        |), final AS (
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) || ':' || tx AS body
        |  FROM d WHERE del <> 3 AND u <> 2
        |  UNION ALL
        |  SELECT doc_id, CAST(doc_id AS VARCHAR) || ':' || tx || ' u'
        |  FROM d WHERE u = 2
        |  UNION ALL
        |  SELECT -doc_id - 1, 'syn:' || CAST(doc_id AS VARCHAR)
        |  FROM d WHERE ins = 4
        |)
        |SELECT doc_id, body FROM final ORDER BY doc_id"""
        .stripMargin.replace("\n", " "),

    // q135: every stage recomposed from its own proven oracle form —
    // q18's md5 min-id dedup, q38's trigram-string decontamination
    // (probes from the ORIGINAL table, ids < 5), q121's ceil(0.4·cnt)
    // gate with (score desc, id) ties, q120/q129's hash-order window
    // fill, q54's exclusive-prefix pack boundaries — then the manifest
    // rollup
    "q135_pipeline" ->
      """WITH d0 AS (
        |  SELECT doc_id, source, text, n_chars FROM documents
        |  WHERE doc_id IS NOT NULL
        |), keep AS (
        |  SELECT min(doc_id) AS doc_id FROM d0 GROUP BY md5(text)
        |), d1 AS (
        |  SELECT d0.* FROM d0 JOIN keep USING (doc_id)
        |), g AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 0)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS gs
        |  FROM (SELECT doc_id, regexp_extract_all(trim(text), '\S+')
        |          AS toks FROM d1)
        |), pg AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(toks) - 2, 0)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS p
        |  FROM (SELECT regexp_extract_all(trim(text), '\S+') AS toks
        |        FROM d0 WHERE doc_id < 5)
        |), bad AS (
        |  SELECT DISTINCT dg.doc_id
        |  FROM (SELECT doc_id, unnest(gs) AS gg FROM g) dg
        |  JOIN pg ON dg.gg = pg.p
        |), d2 AS (
        |  SELECT * FROM d1
        |  WHERE doc_id NOT IN (SELECT doc_id FROM bad)
        |), cnt AS (
        |  SELECT source, count(*) AS c FROM d2
        |  WHERE n_chars IS NOT NULL GROUP BY source
        |), rnk AS (
        |  SELECT d.source, d.doc_id, d.text,
        |    row_number() OVER (PARTITION BY d.source
        |      ORDER BY CAST(d.n_chars AS DOUBLE) DESC, d.doc_id) AS rn,
        |    c.c
        |  FROM d2 d JOIN cnt c USING (source)
        |  WHERE d.n_chars IS NOT NULL
        |), d3 AS (
        |  SELECT source, doc_id, text FROM rnk
        |  WHERE rn <= CAST(ceil(0.4 * c) AS BIGINT)
        |), t AS (
        |  SELECT source, doc_id,
        |    CAST(coalesce(len(regexp_extract_all(trim(text), '\S+')), 0)
        |      AS BIGINT) AS n_tokens,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 1000000 AS h
        |  FROM d3
        |), b(source, budget) AS (
        |  VALUES ('src0', 300), ('src1', 10000000), ('src2', 250)
        |), f AS (
        |  SELECT t.source, doc_id, n_tokens, h, budget,
        |    sum(n_tokens) OVER (PARTITION BY t.source
        |      ORDER BY h, doc_id) AS cum
        |  FROM t JOIN b USING (source)
        |), m AS (
        |  SELECT source, doc_id, n_tokens, h FROM f WHERE cum <= budget
        |), p AS (
        |  SELECT source, doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre,
        |    h
        |  FROM m
        |), pk AS (
        |  SELECT source, n_tokens,
        |    CAST(floor(pre / 128) AS BIGINT) AS pack_id,
        |    row_number() OVER (PARTITION BY source,
        |      CAST(floor(pre / 128) AS BIGINT)
        |      ORDER BY h, doc_id) AS pack_pos
        |  FROM p
        |)
        |SELECT source, pack_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(max(pack_pos) AS BIGINT) AS last_pos
        |FROM pk GROUP BY source, pack_id
        |ORDER BY source, pack_id""".stripMargin.replace("\n", " "),

    // q136: the metadata stats must equal a full recompute of each
    // version's membership — v2 everything, v3 minus the delete bucket
    "q136_tt_stats" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 7 AS del
        |  FROM documents WHERE doc_id IS NOT NULL
        |), m AS (
        |  SELECT CAST(2 AS BIGINT) AS as_of, doc_id, n_chars FROM d
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), doc_id, n_chars FROM d WHERE del <> 3
        |), s AS (
        |  SELECT as_of, 'doc_id' AS col_name,
        |    CAST(min(doc_id) AS BIGINT) AS min_v,
        |    CAST(max(doc_id) AS BIGINT) AS max_v,
        |    CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_nulls,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM m GROUP BY as_of
        |  UNION ALL
        |  SELECT as_of, 'n_chars',
        |    CAST(min(n_chars) AS BIGINT), CAST(max(n_chars) AS BIGINT),
        |    CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(count(*) AS BIGINT)
        |  FROM m GROUP BY as_of
        |)
        |SELECT as_of, col_name, min_v, max_v, n_nulls, n_rows FROM s
        |ORDER BY as_of, col_name""".stripMargin.replace("\n", " "),

    // q137: q83's true cross-pair set minus pairs whose history-side
    // neighbor is effectively deleted (%5 tombstoned, %10 revived)
    "q137_tombstone_minhash" ->
      s"""WITH $q19PairsCte
         |SELECT id2 AS doc_id, id1 AS neighbor_id,
         |  round(jaccard, 6) AS jaccard FROM j
         |WHERE jaccard >= 0.8
         |  AND id1 < (SELECT count(*) // 2 FROM documents)
         |  AND id2 >= (SELECT count(*) // 2 FROM documents)
         |  AND NOT (id1 % 5 = 0 AND id1 % 10 <> 0)
         |ORDER BY doc_id, neighbor_id""".stripMargin.replace("\n", " "),

    // q138: q85's exact pair set minus pairs whose index-side id is
    // effectively deleted (%5 tombstoned, %10 revived; only history
    // ids < cut were ever tombstoned)
    "q138_tombstone_simhash" ->
      s"""WITH $portableSimhashFpCte
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |  AND b.doc_id >= (SELECT count(*) // 2 FROM documents)
         |  AND NOT (a.doc_id < (SELECT count(*) // 2 FROM documents)
         |    AND a.doc_id % 5 = 0 AND a.doc_id % 10 <> 0)
         |ORDER BY id1, id2""".stripMargin.replace("\n", " "),

    // q139: q90's portable-plane derivation with effectively-deleted
    // neighbors excluded from the candidate set
    "q139_tombstone_lsh" -> portableLshOracleSql("a.vec_id < 5", 15,
      neighborPred = "NOT (b.vec_id % 5 = 0 AND b.vec_id % 10 <> 0)")
  )

  // The q20-portable SimHash fingerprint, recomputed in DuckDB — shared
  // by the q84/q85 pair oracles (token hash = first 8 bytes of
  // md5(token); per-bit ±1 votes; bit 63 carries the sign)
  private val portableSimhashFpCte: String =
    """fp AS (
      |  SELECT doc_id,
      |  CAST(list_sum(list_transform(generate_series(0, 63), j ->
      |    CASE WHEN list_sum(list_transform(hs, h ->
      |           CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
      |         THEN CASE WHEN j = 63 THEN CAST(-9223372036854775808 AS HUGEINT)
      |                   ELSE CAST(1::BIGINT << j AS HUGEINT) END
      |         ELSE 0 END)) AS BIGINT) AS simhash
      |  FROM (
      |    SELECT doc_id, list_transform(regexp_extract_all(trim(text), '\S+'),
      |      t -> CAST('0x' || substr(md5(t), 1, 16) AS UBIGINT)) AS hs
      |    FROM documents
      |  )
      |)""".stripMargin
}
