package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{Multimodal, Sinks, TimeSeries}
import graft.streaming.EventRollup

class StreamingMultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("streaming rollup over the events files equals the batch rollup") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventRollup.startFileStream(spark, dir, streamDir.toString, "rollup_test",
      outputMode = "complete") // bounded input; complete = full rollup visible
    try {
      q.processAllAvailable()
      val streamed = spark.table("rollup_test")
        .orderBy("day", "event_type").collect()
      val batch = EventRollup.rollup(Tables.events(spark, dir), None)
        .orderBy("day", "event_type").collect()
      assert(streamed.length == batch.length && streamed.sameElements(batch))
    } finally q.stop()
  }

  test("streaming dedup: first occurrence survives across micro-batches, digests match batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val docs = input.toDS().toDF("doc_id", "text")
    val q = graft.streaming.StreamingDedup.dedup(docs, "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup").start()
    try {
      input.addData((0L, "alpha"), (1L, "beta"))
      q.processAllAvailable()
      input.addData((2L, "alpha"), (3L, "gamma")) // alpha dup, cross-batch
      q.processAllAvailable()
      val out = spark.table("sdedup").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.keySet == Set(0L, 1L, 3L)) // first occurrences only
      // same distinct-digest set as the batch operator
      val batch = graft.operators.Dedup.exact(
        Seq((0L, "alpha"), (1L, "beta"), (2L, "alpha"), (3L, "gamma"))
          .toDF("doc_id", "text"), "doc_id", "text")
      assert(batch.select("digest").collect().map(_.getString(0)).toSet ==
        spark.table("sdedup").select(md5($"text")).collect().map(_.getString(0)).toSet)
    } finally q.stop()
  }

  test("streaming dedup against history: persisted digests drop known docs, no state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // "history" = the persisted digest table of an already-ingested corpus
    val history = graft.operators.Dedup.exact(
      Seq((100L, "alpha"), (101L, "beta")).toDF("doc_id", "text"),
      "doc_id", "text").select("digest")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDS().toDF("doc_id", "text")
    // compose: history anti-join (stream-static, stateless) then
    // within-stream dedup (stateful)
    val q = graft.streaming.StreamingDedup.dedup(
        graft.streaming.StreamingDedup.againstHistory(docs, "text", history)
          .drop("digest"),
        "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup_hist").start()
    try {
      input.addData((0L, "alpha"), (1L, "gamma"), (2L, "gamma"))
      q.processAllAvailable()
      input.addData((3L, "beta"), (4L, "delta"), (5L, "gamma"))
      q.processAllAvailable()
      val out = spark.table("sdedup_hist").collect().map(_.getLong(0)).toSet
      // alpha/beta die against history; gamma keeps its first occurrence
      // only; delta is genuinely new
      assert(out == Set(1L, 4L))
    } finally q.stop()
  }

  test("streaming near-dup flagging against a persisted MinHash index: one row per pair, stateless") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_snd").toString
    val hist = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "red orange yellow green blue indigo violet")).toDF("doc_id", "text")
    graft.operators.Dedup.saveMinhashIndex(hist, tmp, "doc_id", "text",
      shingleN = 2, numHashes = 16, bands = 8)
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup.nearDupsAgainstIndex(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text", tmp)
      .writeStream.outputMode("append").format("memory")
      .queryName("snd").start()
    try {
      input.addData(
        (10L, "alpha beta gamma delta epsilon zeta eta theta"), // = doc 1
        (11L, "completely unrelated fresh content"))
      q.processAllAvailable()
      input.addData((12L, "one two three four five six seven eight nine")) // = doc 2
      q.processAllAvailable()
      val out = spark.table("snd").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // an identical doc agrees on EVERY band — one row proves the
      // first-agreeing-band dedup; est = 1.0 proves the signature ride
      assert(out.count(x => x._1 == 10L && x._2 == 1L) == 1)
      assert(out.count(x => x._1 == 12L && x._2 == 2L) == 1)
      assert(out.filter(x => x._1 == 10L || x._1 == 12L)
        .forall(_._3 == 1.0))
      assert(!out.exists(_._1 == 11L)) // fresh content flags nothing
    } finally q.stop()
  }

  test("foreachBatch near-dup flagging matches the continuous plan, per-batch cache released") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sndb").toString
    val hist = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "red orange yellow green blue indigo violet")).toDF("doc_id", "text")
    graft.operators.Dedup.saveMinhashIndex(hist, tmp, "doc_id", "text",
      shingleN = 2, numHashes = 16, bands = 8)
    spark.sharedState.cacheManager.clearCache() // clean slate for the leak check
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val q = graft.streaming.StreamingDedup.nearDupsEachBatch(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text", tmp) {
          (flags, _) =>
            got ++= flags.collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        }
      .start()
    try {
      input.addData(
        (10L, "alpha beta gamma delta epsilon zeta eta theta"), // = doc 1
        (11L, "completely unrelated fresh content"))
      q.processAllAvailable()
      input.addData((12L, "one two three four five six seven eight nine")) // = doc 2
      q.processAllAvailable()
      assert(got.count(x => x._1 == 10L && x._2 == 1L && x._3 == 1.0) == 1)
      assert(got.count(x => x._1 == 12L && x._2 == 2L && x._3 == 1.0) == 1)
      assert(!got.exists(_._1 == 11L))
      // same rows as the continuous-plan face run over the same docs
      val cont = graft.streaming.StreamingDedup.nearDupsAgainstIndex(
        Seq((10L, "alpha beta gamma delta epsilon zeta eta theta"),
          (11L, "completely unrelated fresh content"),
          (12L, "one two three four five six seven eight nine"))
          .toDF("doc_id", "text"), "doc_id", "text", tmp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got.toSet == cont)
      // the per-batch band cache was released after each sink call — a
      // continuous accumulation across micro-batches would leak at scale
      assert(spark.sharedState.cacheManager.isEmpty,
        "per-batch cache not released")
    } finally q.stop()
  }

  test("foreachBatch simhash flagging matches per-batch incremental calls, caches released") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_shndb").toString
    val hist = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      (3L, "red orange yellow green blue indigo violet")).toDF("doc_id", "text")
    graft.operators.Dedup.saveSimhashIndex(hist, tmp, "doc_id", "text")
    spark.sharedState.cacheManager.clearCache() // clean slate for the leak check
    val input = MemoryStream[(Long, String)]
    val batches = scala.collection.mutable.Map[Long, Set[(Long, Long, Long)]]()
    val q = graft.streaming.StreamingDedup.simhashNearDupsEachBatch(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text", tmp) {
          (pairs, id) =>
            batches(id) = pairs.collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        }
      .start()
    try {
      val b0 = Seq(
        (10L, "alpha beta gamma delta epsilon zeta eta theta"), // = doc 1
        (11L, "completely unrelated fresh content"),
        (12L, "alpha beta gamma delta epsilon zeta eta theta")) // = 1 & 10
      val b1 = Seq((13L, "one two three four five six seven eight nine")) // = doc 2
      input.addData(b0: _*)
      q.processAllAvailable()
      input.addData(b1: _*)
      q.processAllAvailable()
      // per-batch persisted frames (batch block table + internal miner's
      // band frame) were released after each sink call — checked BEFORE
      // the batch-API comparison below, whose public face legitimately
      // caches for the session
      assert(spark.sharedState.cacheManager.isEmpty,
        "per-batch caches not released")
      // each micro-batch produced exactly what the batch API produces for
      // that batch against the same (un-appended) index
      Seq(b0, b1).zipWithIndex.foreach { case (docs, id) =>
        val expect = graft.operators.Dedup.incrementalSimhashPairs(
            docs.toDF("doc_id", "text"), tmp, "doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(batches(id.toLong) == expect, s"batch $id mismatch")
      }
      assert(batches(0L).exists(p => p._1 == 1L && p._2 == 10L)) // vs history
      assert(batches(0L).exists(p => p._1 == 10L && p._2 == 12L)) // in-batch
      assert(!batches.values.flatten.exists(p => p._1 == 11L || p._2 == 11L))
      assert(batches(1L).exists(p => p._1 == 2L && p._2 == 13L))
      spark.sharedState.cacheManager.clearCache() // drop batch-API residue
    } finally q.stop()
  }

  test("streaming dedup within watermark: near-in-time dups collapse, state evicts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[(Timestamp, String)]
    val docs = input.toDS().toDF("ts", "text").withWatermark("ts", "10 minutes")
    val q = graft.streaming.StreamingDedup.dedup(docs, "text",
        withinWatermark = true)
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup_wm").start()
    try {
      input.addData((t("2024-01-01 10:00:00"), "doc"),
        (t("2024-01-01 10:05:00"), "doc")) // near-in-time duplicate
      q.processAllAvailable()
      assert(spark.table("sdedup_wm").count() == 1)
      // advance event time far past the horizon → digest state evicted
      input.addData((t("2024-01-01 12:00:00"), "other"))
      q.processAllAvailable()
      // the same content reappearing AFTER eviction is a new first
      // occurrence — bounded state trades exactly this for 100 TB viability
      input.addData((t("2024-01-01 12:01:00"), "doc"))
      q.processAllAvailable()
      assert(spark.table("sdedup_wm").filter($"text" === "doc").count() == 2)
    } finally q.stop()
  }

  test("streaming rollup append mode: watermark emits finalized windows, drops late rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDS().toDF("ts", "event_type", "value")
    val q = EventRollup.rollup(events, Some("1 day"))
      .writeStream.outputMode("append").format("memory")
      .queryName("rollup_append").start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      input.addData((t("2024-01-01 10:00:00"), "click", 1.0),
        (t("2024-01-01 11:00:00"), "click", 2.0))
      q.processAllAvailable()
      // watermark = max(ts) - 1d = Dec31 10:00 → Jan 1 window still open
      assert(spark.table("rollup_append").isEmpty)
      // advance time two days → Jan 1 window finalizes and emits
      input.addData((t("2024-01-03 01:00:00"), "view", 5.0))
      q.processAllAvailable()
      input.addData((t("2024-01-03 02:00:00"), "view", 1.0)) // nudge another batch
      q.processAllAvailable()
      val emitted = spark.table("rollup_append")
        .filter($"day" === "2024-01-01").collect()
      assert(emitted.length == 1 && emitted.head.getLong(2) == 2L)
      // a straggler behind the watermark must NOT create/alter output
      input.addData((t("2024-01-01 12:00:00"), "click", 99.0))
      q.processAllAvailable()
      assert(spark.table("rollup_append")
        .filter($"day" === "2024-01-01").count() == 1)
    } finally q.stop()
  }

  test("approx sketch variants track exact results at bench scale") {
    import graft.operators.Aggregates
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val approx = Aggregates.approxDistinct(li, Seq("l_returnflag"), "l_orderkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct("l_orderkey"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex).toDouble / ex < 0.15, s"$k: $ex vs ${approx(k)}")
    }
    val st = Aggregates.approxPriceStats(
      spark.read.parquet(s"$dir/orders.parquet"), "o_totalprice").head()
    val ex = Aggregates.priceStats(
      spark.read.parquet(s"$dir/orders.parquet"), "o_totalprice").head()
    assert(math.abs(st.getDouble(0) - ex.getDouble(0)) / ex.getDouble(0) < 0.05)
  }

  test("streaming dedup firstWins batch twin equals a streamed replay of the log") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    // a log with cross-batch content duplicates, replayed in ts order (the
    // order a log-backed stream delivers)
    val log = Seq(
      (1L, t("2024-01-01 10:00:00"), "alpha"),
      (2L, t("2024-01-01 10:01:00"), "beta"),
      (3L, t("2024-01-01 10:02:00"), "alpha"), // dup of 1
      (4L, t("2024-01-01 10:03:00"), "gamma"),
      (5L, t("2024-01-01 10:04:00"), "beta"))  // dup of 2
    val input = MemoryStream[(Long, Timestamp, String)]
    val stream = input.toDS().toDF("event_id", "ts", "text")
    val q = graft.streaming.StreamingDedup.dedup(stream, "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup_twin").start()
    try {
      input.addData(log.take(3): _*); q.processAllAvailable()
      input.addData(log.drop(3): _*); q.processAllAvailable()
      val streamed = spark.table("sdedup_twin")
        .select("event_id").collect().map(_.getLong(0)).toSet
      val batch = graft.streaming.StreamingDedup.firstWins(
          graft.streaming.StreamingDedup.withDigest(
            log.toDF("event_id", "ts", "text"), "text"),
          "digest", "ts", "event_id")
        .select("event_id").collect().map(_.getLong(0)).toSet
      assert(streamed == Set(1L, 2L, 4L))
      assert(batch == streamed) // the contract query's semantics = streaming's
    } finally q.stop()
  }

  test("streaming sessionization: watermark finalizes sessions that equal the batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    // user 1: two events 5 min apart (one session), then one 30 min later
    // (gap 10 min → a second session); user 2: one event
    val rows = Seq(
      (1L, t("2024-01-01 10:00:00"), 1.0),
      (1L, t("2024-01-01 10:05:00"), 2.0),
      (1L, t("2024-01-01 10:35:00"), 4.0),
      (2L, t("2024-01-01 10:00:00"), 8.0))
    val aggs = Seq(count(lit(1)).as("n_events"), sum($"value").as("sum_value"))
    val input = MemoryStream[(Long, Timestamp, Double)]
    val stream = input.toDS().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
    val q = graft.operators.TimeSeries.sessionize(stream, "user_id", "ts",
        "10 minutes", aggs)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_stream").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // advance event time far past the horizon → all sessions finalize
      input.addData((9L, t("2024-01-02 00:00:00"), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sessions_stream")
        .filter($"user_id" < 9)
        .select("user_id", "session_start", "n_events", "sum_value")
        .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
      val batch = graft.operators.TimeSeries.sessionize(
          rows.toDF("user_id", "ts", "value"), "user_id", "ts", "10 minutes", aggs)
        .select("user_id", "session_start", "n_events", "sum_value")
        .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
      assert(streamed.nonEmpty && streamed == batch)
      assert(streamed.map(r => (r.head, r(2))) ==
        Seq((1L, 2L), (1L, 1L), (2L, 1L))) // the expected session split
    } finally q.stop()
  }

  test("sliding windows run unchanged as a watermarked stream and equal batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val rows = Seq(
      (t("2024-01-01 07:00:00"), "a", 1.0),
      (t("2024-01-01 13:00:00"), "a", 2.0),
      (t("2024-01-01 14:00:00"), "b", 3.0))
    val agg = (df: org.apache.spark.sql.DataFrame) =>
      TimeSeries.sliding(df, "ts", "1 day", "6 hours", Seq("event_type"),
        Seq(count(lit(1)).as("n")))
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = agg(input.toDS().toDF("ts", "event_type", "value")
        .withWatermark("ts", "1 hour"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("sliding_stream").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("sliding_stream")
        .select("window_start", "event_type", "n").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = agg(rows.toDF("ts", "event_type", "value"))
        .select("window_start", "event_type", "n").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("funnel pair join runs as a watermarked stream-stream join, equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val rows = Seq(
      (1L, 10L, t("2024-01-01 10:00:00"), "click"),
      (1L, 11L, t("2024-01-01 10:30:00"), "purchase"),
      (1L, 12L, t("2024-01-01 12:00:00"), "purchase"), // outside 1 h
      (2L, 20L, t("2024-01-01 10:00:00"), "click"))
    val input = MemoryStream[(Long, Long, Timestamp, String)]
    val ev = input.toDS().toDF("user_id", "event_id", "ts", "event_type")
    // the raw pair join (before the earliest-pick agg) is the
    // stream-stream-joinable stage: both sides watermarked, interval
    // bounds in the join condition bound the state
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("first_id"), $"ts".as("first_ts"))
      .withWatermark("first_ts", "2 hours")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("second_id"),
        $"ts".as("second_ts"))
      .withWatermark("second_ts", "2 hours")
    val joined = clicks.join(purchases,
      expr("""user_id = p_user AND second_ts > first_ts
             AND second_ts <= first_ts + interval 1 hour"""))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("funnel_stream").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("funnel_stream")
        .select("first_id", "second_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == Set((10L, 11L)))
    } finally q.stop()
  }

  test("streaming heavy hitters: MG sketch over micro-batches equals batch counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // capacity above cardinality → exact regime, so streamed == groupBy
    val batch1 = (1 to 20).map(_ => "a") ++ (1 to 5).map(_ => "b")
    val batch2 = (1 to 10).map(_ => "a") ++ (1 to 7).map(_ => "c")
    val input = MemoryStream[String]
    val q = input.toDS()
      .select(new graft.functions.MisraGries(8).toColumn.name("m"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("hh_stream").start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("hh_stream")
        .select(explode($"m")).as[(String, Long)].collect().toMap
      assert(streamed == Map("a" -> 30L, "b" -> 5L, "c" -> 7L))
    } finally q.stop()
  }

  test("stream-static enrichment: streaming facts broadcast-join a static dim") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the standard enrichment shape at 100 TB: unbounded fact stream ⋈
    // small static dim — stateless per micro-batch, dim broadcast, no
    // stream-side shuffle and no watermark needed for an inner equi-join
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("cust_id", "tier")
    val input = MemoryStream[(Long, Long, Double)]
    val enriched = graft.operators.Joins.factDim(
      input.toDS().toDF("order_id", "cust_id", "amount"), dim, Seq("cust_id"))
    val q = enriched.writeStream.outputMode("append").format("memory")
      .queryName("enrich_stream").start()
    val rows = Seq((10L, 1L, 5.0), (11L, 2L, 7.0), (12L, 9L, 1.0),
      (13L, 1L, 2.0))
    try {
      input.addData(rows.take(3): _*)
      q.processAllAvailable()
      input.addData(rows.drop(3): _*) // a later micro-batch, same dim
      q.processAllAvailable()
      val got = spark.table("enrich_stream")
        .select("order_id", "tier").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      // streamed replay ≡ the batch operator on the full log (the same
      // contract every other streaming twin in this suite pins)
      val batch = graft.operators.Joins.factDim(
          rows.toDF("order_id", "cust_id", "amount"), dim, Seq("cust_id"))
        .select("order_id", "tier").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == batch && got.nonEmpty)
      // unknown cust 9 drops (inner); both batches enriched
      assert(got == Set((10L, "gold"), (11L, "basic"), (13L, "gold")))
    } finally q.stop()
  }

  test("header codec parses real PNG and JPEG header bytes") {
    import Multimodal.HeaderCodec
    // a real PNG header: signature + IHDR chunk for a 320×240 image
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(320) ++ be32(240) ++
      Array[Byte](8, 6, 0, 0, 0)
    assert(HeaderCodec.pngDims(png).contains((320, 240)))
    assert(HeaderCodec.sniff(png).contains(("image/png", 320, 240)))
    // a real JPEG header stream: SOI, APP0 (JFIF), then SOF0 with
    // height=240 / width=320 — the parser must WALK the APP0 segment
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    val jfif = Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
      "JFIF ".getBytes("US-ASCII") ++ Array[Byte](1, 1, 0, 0, 1, 0, 1, 0, 0)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++
      Array[Byte](8) ++ be16(240) ++ be16(320) ++ Array[Byte](3)
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++ jfif ++ sof0
    assert(HeaderCodec.jpegDims(jpeg).contains((320, 240)))
    assert(HeaderCodec.sniff(jpeg).contains(("image/jpeg", 320, 240)))
    // non-image payloads sniff to None, never throw
    assert(HeaderCodec.sniff("not an image".getBytes).isEmpty)
    assert(HeaderCodec.sniff(Array[Byte]()).isEmpty)
    assert(HeaderCodec.jpegDims(jpeg.take(6)).isEmpty) // truncated stream

    // Spark-side: detectMeta rewrites metadata from parsed headers,
    // leaves unrecognized payloads' metadata untouched
    import spark.implicits._
    val rows = Seq((1L, png), (2L, jpeg), (3L, "plain text".getBytes))
      .toDF("doc_id", "payload")
      .withColumn("meta", struct(
        lit("application/octet-stream").as("media_type"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        // caller-set and same-modality for images: the header walk can't
        // see a frame count, so the value must ride through the sniff
        lit(9).cast("int").as("n_frames")))
    val out = Multimodal.detectMeta(rows)
      .select(col("doc_id"), col("meta.media_type"), col("meta.width"),
        col("meta.height"), col("meta.n_frames"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out(1L) == (("image/png", Some(320), Some(240), Some(9))))
    assert(out(2L) == (("image/jpeg", Some(320), Some(240), Some(9))))
    assert(out(3L) == (("application/octet-stream", None, None, Some(9))))

    // and the codegen'd builtin PNG columns agree with the JVM parser
    val cols = rows.select(
      Multimodal.pngWidthCol(col("payload")).as("w"),
      Multimodal.pngHeightCol(col("payload")).as("h"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(cols.toSeq == Seq((Some(320), Some(240)), (None, None), (None, None)))
  }

  test("header codec parses real WAV and MP4 container bytes") {
    import Multimodal.HeaderCodec
    import spark.implicits._
    // hand-assembled RIFF/WAVE, 44-byte header: PCM, 2ch @ 22050 Hz,
    // 16-bit, data chunk declaring 88200 bytes = exactly 1000 ms
    def le32(v: Int) = Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    def le16(v: Int) = Array(v, v >> 8).map(_.toByte)
    val wav = "RIFF".getBytes ++ le32(36 + 88200) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(22050) ++
      le32(22050 * 4) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(88200)
    assert(HeaderCodec.wavMeta(wav).contains((22050, 2, 1000L)))
    assert(HeaderCodec.sniffMeta(wav).get ==
      HeaderCodec.MediaInfo("audio/wav", sampleRate = Some(22050),
        channels = Some(2), durationMs = Some(1000L)))
    // an extra LIST chunk before fmt must be walked over, odd size padded
    val list = "LIST".getBytes ++ le32(5) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    val wav2 = wav.take(12) ++ list ++ wav.drop(12)
    assert(HeaderCodec.wavMeta(wav2).contains((22050, 2, 1000L)))

    // hand-assembled ISO-BMFF: ftyp, then moov with mvhd v0 (timescale
    // 600, duration 1500 units = 2500 ms) and two empty trak boxes
    def be32(v: Int) = Array(v >> 24, v >> 16, v >> 8, v).map(_.toByte)
    val mvhd = be32(108) ++ "mvhd".getBytes ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(600) ++ be32(1500) ++ new Array[Byte](108 - 28)
    val traks = be32(8) ++ "trak".getBytes ++ be32(8) ++ "trak".getBytes
    val moov = be32(8 + mvhd.length + traks.length) ++ "moov".getBytes ++
      mvhd ++ traks
    val mp4 = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0) ++ moov
    assert(HeaderCodec.mp4Meta(mp4).contains((2500L, 2)))
    assert(HeaderCodec.sniffMeta(mp4).get ==
      HeaderCodec.MediaInfo("video/mp4", durationMs = Some(2500L),
        nTracks = Some(2)))
    // mvhd v1 (64-bit times): same timescale/duration, widened fields
    val mvhd1 = be32(120) ++ "mvhd".getBytes ++
      Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
      be32(600) ++ be32(0) ++ be32(1500) ++ new Array[Byte](120 - 40)
    val moov1 = be32(8 + mvhd1.length) ++ "moov".getBytes ++ mvhd1
    val mp41 = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0) ++ moov1
    assert(HeaderCodec.mp4Meta(mp41).contains((2500L, 0)))
    // trailing size-0 moov = "box extends to end of file" — legal for
    // the LAST top-level box (ISO/IEC 14496-12 §4.2); streaming muxers
    // that can't seek back to patch the size write exactly this
    val moov0 = be32(0) ++ "moov".getBytes ++ mvhd ++ traks
    val mp40 = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0) ++ moov0
    assert(HeaderCodec.mp4Meta(mp40).contains((2500L, 2)))

    // garbage, truncation, and wrong-type bytes decline, never throw
    assert(HeaderCodec.wavMeta("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(HeaderCodec.wavMeta(mp4).isEmpty)
    assert(HeaderCodec.mp4Meta(wav).isEmpty)
    assert(HeaderCodec.mp4Meta(mp4.take(20)).isEmpty)
    assert(HeaderCodec.sniffMeta(new Array[Byte](3)).isEmpty)

    // the synthesizer emits real containers the parser round-trips, and
    // detectMeta carries the fields into the meta struct by name
    val media = Multimodal.withContainerColumn(
      Seq((4L, "even doc text"), (7L, "odd doc text"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val out = Multimodal.detectMeta(media)
      .select("doc_id", "meta.media_type", "meta.sample_rate",
        "meta.channels", "meta.duration_ms", "meta.n_tracks")
      .collect().map(r => r.getLong(0) -> r).toMap
    val w = out(4L) // rate 8000+(4%5)*4000=24000, ch 1+(2%2)=1, 14 frames
    assert(w.getString(1) == "audio/wav" && w.getInt(2) == 24000 &&
      w.getInt(3) == 1 && w.getLong(4) == 14L * 1000 / 24000)
    val v = out(7L) // 600*7+0 units @600 = 7000ms... (7%120=7, 7%7=0)
    assert(v.getString(1) == "video/mp4" && v.isNullAt(2) &&
      v.getLong(4) == 7000L && v.getInt(5) == (1 + 7 % 3).toInt)
  }

  test("multimodal: media column carries bytes + typed metadata") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(20)
    val media = Multimodal.withMediaColumn(docs, "doc_id", "text")
    val r = media.select(col("doc_id"), col("meta.media_type"),
      col("meta.n_bytes"), octet_length(col("payload"))).collect()
    assert(r.length == 20)
    assert(r.forall(x => x.getString(1) == "image/fake"))
    assert(r.forall(x => x.getLong(2) == x.getInt(3).toLong)) // meta matches payload
  }

  test("multimodal: partition-wise feature extraction yields normalized histograms") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(50)
    val media = Multimodal.withMediaColumn(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length == 50)
    feats.foreach { r =>
      val f = r.getSeq[Double](3)
      assert(f.length == 16)
      assert(math.abs(f.sum - 1.0) < 1e-9) // normalized histogram
    }
  }

  test("multimodal: resize rewrites dims; frame sampling chunks payloads") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(5)
    val media = Multimodal.resize(
      Multimodal.withMediaColumn(docs, "doc_id", "text"), 224, 224)
    assert(media.select(col("meta.width")).collect().forall(_.getInt(0) == 224))
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 2)
    val counts = frames.groupBy("doc_id").count().collect()
    assert(counts.nonEmpty && frames.select(octet_length(col("frame")))
      .collect().forall(_.getInt(0) <= 32))
  }

  // ---- real PNG pixel decode ----

  /** Build a well-formed PNG from pre-filtered scanline bytes (test-side
    * encoder: real chunk CRCs, real zlib stream).
    */
  private def buildPng(w: Int, h: Int, colorType: Int,
                       filteredRows: Array[Byte],
                       plte: Option[Array[Byte]] = None): Array[Byte] = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val t = typ.getBytes("US-ASCII")
      crc.update(t); crc.update(data)
      java.nio.ByteBuffer.allocate(8 + data.length + 4)
        .putInt(data.length).put(t).put(data).putInt(crc.getValue.toInt)
        .array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filteredRows); deflater.finish()
    val buf = new Array[Byte](filteredRows.length * 2 + 64)
    val n = deflater.deflate(buf); deflater.end()
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    sig ++ chunk("IHDR", ihdr) ++
      plte.map(p => chunk("PLTE", p)).getOrElse(Array.empty[Byte]) ++
      chunk("IDAT", buf.take(n)) ++ chunk("IEND", Array.empty[Byte])
  }

  /** Forward-apply a PNG filter to one scanline (the inverse of what the
    * decoder reconstructs) — an independent reference implementation, so
    * the round-trip cross-checks the decoder's un-filter math.
    */
  private def filterRow(f: Int, row: Array[Int], prev: Array[Int],
                        ch: Int): Array[Byte] = {
    def a(x: Int) = if (x >= ch) row(x - ch) else 0
    def up(x: Int) = prev(x)
    def c(x: Int) = if (x >= ch) prev(x - ch) else 0
    val out = row.indices.map { x =>
      val v = f match {
        case 0 => row(x)
        case 1 => row(x) - a(x)
        case 2 => row(x) - up(x)
        case 3 => row(x) - ((a(x) + up(x)) >> 1)
        case 4 =>
          val p = a(x) + up(x) - c(x)
          val pa = math.abs(p - a(x)); val pb = math.abs(p - up(x))
          val pc = math.abs(p - c(x))
          row(x) - (if (pa <= pb && pa <= pc) a(x) else if (pb <= pc) up(x) else c(x))
      }
      (v & 0xff).toByte
    }
    (f.toByte +: out).toArray
  }

  test("png decode: every filter type reconstructs exact pixels (grayscale)") {
    import graft.operators.PngCodec
    // 4-wide, 5-high grayscale; one row per filter type 0..4, with values
    // chosen to exercise modular wraparound in Sub/Up/Average/Paeth
    val rows = Array(
      Array(250, 10, 200, 3),
      Array(7, 255, 0, 128),
      Array(128, 127, 129, 126),
      Array(0, 255, 0, 255),
      Array(42, 42, 42, 42))
    val zero = Array(0, 0, 0, 0)
    val filtered = rows.zipWithIndex.flatMap { case (r, y) =>
      filterRow(y, r, if (y == 0) zero else rows(y - 1), ch = 1)
    }
    val png = buildPng(4, 5, colorType = 0, filtered)
    val img = PngCodec.decode(png).get
    assert((img.width, img.height, img.channels) == ((4, 5, 1)))
    assert(img.samples.map(_ & 0xff).toSeq == rows.flatten.toSeq)
  }

  test("png decode: RGB, RGBA, gray+alpha and palette color types") {
    import graft.operators.PngCodec
    // RGB 2x2 with per-channel structure, Paeth-filtered second row
    val rgbRows = Array(Array(255, 0, 0, 0, 255, 0), Array(0, 0, 255, 10, 20, 30))
    val rgbF = filterRow(0, rgbRows(0), Array.fill(6)(0), 3) ++
      filterRow(4, rgbRows(1), rgbRows(0), 3)
    val rgb = PngCodec.decode(buildPng(2, 2, 2, rgbF)).get
    assert(rgb.channels == 3 && rgb.samples.map(_ & 0xff).toSeq == rgbRows.flatten.toSeq)

    // RGBA 2x1 (Sub filter exercises the 4-byte-back left reference)
    val rgbaRow = Array(100, 150, 200, 255, 110, 140, 190, 128)
    val rgba = PngCodec.decode(
      buildPng(2, 1, 6, filterRow(1, rgbaRow, Array.fill(8)(0), 4))).get
    assert(rgba.channels == 4 && rgba.samples.map(_ & 0xff).toSeq == rgbaRow.toSeq)

    // gray+alpha 2x1
    val gaRow = Array(77, 255, 99, 0)
    val ga = PngCodec.decode(
      buildPng(2, 1, 4, filterRow(0, gaRow, Array.fill(4)(0), 2))).get
    assert(ga.channels == 2 && ga.samples.map(_ & 0xff).toSeq == gaRow.toSeq)

    // palette: 2 entries (red, blue); pixels index them, decode expands RGB
    val plte = Array[Byte](255.toByte, 0, 0, 0, 0, 255.toByte)
    val palRow = Array(0, 1, 1, 0)
    val pal = PngCodec.decode(
      buildPng(4, 1, 3, filterRow(0, palRow, Array.fill(4)(0), 1), Some(plte))).get
    assert(pal.channels == 3)
    assert(pal.samples.map(_ & 0xff).toSeq ==
      Seq(255, 0, 0, 0, 0, 255, 0, 0, 255, 255, 0, 0))
  }

  test("png decode: cross-validated against the JDK's own PNG encoder") {
    import graft.operators.PngCodec
    // pixels chosen freely; javax.imageio encodes (its own filter
    // heuristics, its own zlib), our decoder must recover them exactly
    val (w, h) = (7, 5)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37 + y * 91) % 256 << 16) |
        ((x * 13 + y * 7) % 256 << 8) | ((x * 3 + y * 211) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val dec = PngCodec.decode(bos.toByteArray).get
    assert((dec.width, dec.height) == ((w, h)))
    for (y <- 0 until h; x <- 0 until w) {
      val expected = img.getRGB(x, y)
      val base = (y * w + x) * dec.channels
      val (r, g, b) = (dec.samples(base) & 0xff,
        dec.samples(base + 1) & 0xff, dec.samples(base + 2) & 0xff)
      assert(((expected >> 16) & 0xff) == r && ((expected >> 8) & 0xff) == g
        && (expected & 0xff) == b, s"pixel ($x,$y)")
    }
  }

  test("jpeg decode: real pixels from a real JPEG byte array; bombs and garbage decline") {
    import graft.operators.JpegCodec
    val (w, h) = (8, 6)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xc04020 else 0x204080)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val dec = JpegCodec.decode(bytes).get
    assert((dec.width, dec.height, dec.channels) == ((w, h, 3)))
    // exact agreement with the same JDK's reference read of the same
    // bytes (JPEG is only pinned per-JDK, unlike PngCodec — see scaladoc)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val p = ref.getRGB(x, y)
      val base = (y * w + x) * 3
      assert((dec.samples(base) & 0xff) == ((p >> 16) & 0xff)
        && (dec.samples(base + 1) & 0xff) == ((p >> 8) & 0xff)
        && (dec.samples(base + 2) & 0xff) == (p & 0xff), s"pixel ($x,$y)")
    }
    // flat color survives the lossy round-trip to within quantization —
    // the decode really is pixels, not a byte statistic
    val flat = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 16; x <- 0 until 16) flat.setRGB(x, y, 0xb45a1e)
    val fb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(flat, "jpg", fb)
    val fd = JpegCodec.decode(fb.toByteArray).get
    val maxDev = fd.samples.grouped(3).flatMap { px =>
      Seq(math.abs((px(0) & 0xff) - 0xb4), math.abs((px(1) & 0xff) - 0x5a),
        math.abs((px(2) & 0xff) - 0x1e))
    }.max
    assert(maxDev <= 8, s"flat-color deviation $maxDev")
    // decompression-bomb guard: SOFn dims checked BEFORE the reader
    // allocates; truncation and garbage decline instead of throwing
    assert(JpegCodec.decode(bytes, maxPixels = 10).isEmpty)
    assert(JpegCodec.decode(bytes.take(20)).isEmpty)
    assert(JpegCodec.decode("garbage".getBytes).isEmpty)
  }

  test("multimodal: extractFeatures uses real pixels for JPEG payloads") {
    import spark.implicits._
    // solid red: channel means ~(1, 0, 0, 1); all luminance mass in the
    // pure-red bin (Rec.709 red luma 54.2 → bin 2), ± JPEG quantization
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0xff0000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val media = Seq((1L, bos.toByteArray)).toDF("doc_id", "payload")
      .withColumn("meta", struct(
        lit("application/octet-stream").as("media_type"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("n_frames")))
    val feat = Multimodal.extractFeatures(spark, media).collect().head.getSeq[Double](3)
    assert(math.abs(feat(0) - 1.0) < 0.05 && feat(1) < 0.05 && feat(2) < 0.05)
    assert(math.abs(feat(3) - 1.0) < 1e-9) // opaque alpha
    assert((1 to 3).map(b => feat(4 + b)).sum > 0.95, feat) // luma near bin 2
  }

  test("png decode: refuses bombs, truncation, and exotic encodings") {
    import graft.operators.PngCodec
    val row = filterRow(0, Array(1, 2, 3, 4), Array.fill(4)(0), 1)
    val ok = buildPng(4, 1, 0, row)
    assert(PngCodec.decode(ok).isDefined)
    // decompression-bomb guard: dimensions above maxPixels refuse BEFORE
    // allocating (4 px image, absurdly low cap stands in for a real bomb)
    assert(PngCodec.decode(ok, maxPixels = 3).isEmpty)
    // truncated IDAT (cut mid-chunk)
    assert(PngCodec.decode(ok.dropRight(16)).isEmpty)
    // not a PNG at all
    assert(PngCodec.decode("garbage".getBytes).isEmpty)
    // 16-bit depth is out of scope and must decline, not mis-decode
    val deep = ok.clone(); deep(24) = 16.toByte // IHDR bit-depth byte
    assert(PngCodec.decode(deep).isEmpty)
    // a crafted chunk length near Int.MaxValue must not wrap the bounds
    // check into a crash — decline, don't throw
    val wrapped = ok.clone()
    wrapped(8) = 0x7f.toByte; wrapped(9) = 0xff.toByte // IHDR len field
    wrapped(10) = 0xff.toByte; wrapped(11) = 0xf0.toByte
    assert(PngCodec.decode(wrapped).isEmpty)
  }

  test("multimodal: extractFeatures uses real pixels for PNG payloads") {
    import graft.operators.PngCodec
    import spark.implicits._
    // 2x2 solid red RGB → means (1, 0, 0, 1); Rec.709 luminance of pure
    // red is 0.2126*255 = 54.213 → bin floor(54.213*12/256) = 2
    val red = Array(255, 0, 0, 255, 0, 0)
    val png = buildPng(2, 2, 2,
      filterRow(0, red, Array.fill(6)(0), 3) ++ filterRow(0, red, red, 3))
    val media = Seq((1L, png), (2L, "not a png".getBytes))
      .toDF("doc_id", "payload")
      .withColumn("meta", struct(
        lit("application/octet-stream").as("media_type"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("n_frames")))
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](3)).toMap
    val pngFeat = feats(1L)
    assert(pngFeat.take(4) == Seq(1.0, 0.0, 0.0, 1.0)) // channel means
    assert(pngFeat(4 + 2) == 1.0) // all 4 pixels in luminance bin 2
    assert(pngFeat.drop(4).sum == 1.0)
    // non-PNG payload keeps the byte-histogram fallback (sums to 1)
    assert(math.abs(feats(2L).sum - 1.0) < 1e-9)
  }

  test("streaming LM scoring: per-batch scores equal the batch API; " +
       "ledger makes score-and-learn appends exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Corpus
    val tmp = java.nio.file.Files.createTempDirectory("graft_slm").toString
    val hist = Seq((1L, "the cat sat"), (2L, "the cat sat"))
      .toDF("doc_id", "text")
    Corpus.saveLmStats(hist, tmp, "doc_id", "text")

    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val q = graft.streaming.StreamingScore.lmScoreEachBatch(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text", tmp) {
          (scores, batchId) =>
            got ++= scores.collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
            // score-and-learn, with a deliberate REPLAY of the same
            // batch id — the ledger must absorb it or counts double
            val batchDf = scores.sparkSession
              .table("graft_slm_current") // registered below per batch
            Corpus.appendLmStats(batchDf, tmp, "doc_id", "text",
              s"stream-$batchId")
            Corpus.appendLmStats(batchDf, tmp, "doc_id", "text",
              s"stream-$batchId"): Unit
        }
      .start()
    // the sink needs the raw batch rows to learn from; the simplest
    // spec-side channel is a temp view refreshed before each addData
    try {
      Seq((10L, "the cat sat")).toDF("doc_id", "text")
        .createOrReplaceTempView("graft_slm_current")
      input.addData((10L, "the cat sat"))
      q.processAllAvailable()
      // batch 0 scored against the PRE-append index: uc(the)=2, V=3:
      // r = (2+1)/(2+3) for both bigrams → 0.6
      assert(got.toSeq == Seq((10L, 2L, 0.6)))

      Seq((11L, "the cat sat")).toDF("doc_id", "text")
        .createOrReplaceTempView("graft_slm_current")
      input.addData((11L, "the cat sat"))
      q.processAllAvailable()
      // batch 1 sees batch 0's counts (uc(the)=3): r = (3+1)/(3+3)
      val second = got.toSeq.filter(_._1 == 11L)
      assert(second == Seq((11L, 2L, 4.0 / 6.0)))
    } finally q.stop()

    // exactly-once learning: despite double appends per batch, merged
    // counts equal one shot over hist + both batches
    val all = hist.unionByName(
      Seq((10L, "the cat sat"), (11L, "the cat sat")).toDF("doc_id", "text"))
    val fromIndex = Corpus.lmScoreAgainstStats(all, tmp, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val oneShot = Corpus.lmScore(all, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fromIndex == oneShot)
    spark.sharedState.cacheManager.clearCache() // lmScore's token frame
  }

  test("streaming decontamination: per-batch clean rows equal the batch " +
       "API against the persisted probe index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Corpus
    val path = java.nio.file.Files.createTempDirectory("graft_sprobe").toString
    val probes = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    Corpus.saveProbeGrams(probes, path, "text", n = 3)

    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[Long]()
    val q = graft.streaming.StreamingScore.decontaminateEachBatch(
        input.toDS().toDF("doc_id", "text"), "doc_id", "text", path) {
          (clean, _) => got ++= clean.select("doc_id").as[Long].collect()
        }
      .start()
    try {
      input.addData(
        (10L, "beta gamma delta epsilon"), // contaminated (shared trigram)
        (11L, "totally clean text here"))
      q.processAllAvailable()
      input.addData((12L, "alpha beta gamma delta")) // probe copy: dropped
      q.processAllAvailable()
      assert(got.sorted.toSeq == Seq(11L))
    } finally q.stop()
  }

  test("z-ordered streaming ingest: each batch lands clustered with an " +
       "incremental manifest; pruned reads see committed batches exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.Layout
    import graft.sources.Layout.ColRange
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zsink")
      .toString + "/data"
    val input = MemoryStream[(Long, Long, Long)]
    val q = graft.streaming.StreamingScore.zorderedSinkEachBatch(
        input.toDS().toDF("id", "x", "y"), dir, "x", "y", files = 2,
        dims = Seq("x", "y"))
      .start()
    try {
      val b1 = (0L until 50L).map(i => (i, i % 10, i / 10))
      val b2 = (50L until 100L).map(i => (i, 100L + i % 10, 100L + i / 10))
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()

      val manifest = spark.read.parquet(Layout.manifestPath(dir))
      assert(manifest.count() == 4) // 2 files per batch, statted once each
      assert(manifest.agg(org.apache.spark.sql.functions.sum("n_rows"))
        .head().getLong(0) == 100L)

      // a slice inside batch 1's value region: batch 2's files are
      // provably disjoint (x >= 100) and must be skipped
      val ranges = Seq(ColRange("x",
        org.apache.spark.sql.functions.lit(0L),
        org.apache.spark.sql.functions.lit(9L)))
      val (kept, total) = Layout.pruneFiles(spark, dir, ranges)
      assert(total == 4 && kept.size == 2, s"kept ${kept.size}/$total")
      val got = Layout.prunedRead(spark, dir, ranges)
        .select("id").as[Long].collect().sorted.toSeq
      assert(got == (0L until 50L).toSeq)
    } finally q.stop()
  }

  test("sinks: csv with reference headers round-trips; json writes rows") {
    import spark.implicits._
    val df = Seq(("Noise", 10L, 3L), ("Heat", 5L, 1L))
      .toDF("complaint_type_name", "total_count", "active_count")
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toString
    Sinks.writeCsv(df, s"$tmp/csv", Seq("Complaint Type", "Total Count", "Active Count"))
    val back = spark.read.option("header", "true").csv(s"$tmp/csv")
    assert(back.columns.toSeq == Seq("Complaint Type", "Total Count", "Active Count"))
    assert(back.count() == 2)
    Sinks.writeJson(df, s"$tmp/json")
    assert(spark.read.json(s"$tmp/json").count() == 2)
  }

  test("sinks: html table report — headers in order, escaped cells, " +
       "empty nulls, loud failure past the presentation-size cap") {
    import spark.implicits._
    val df = Seq(
      (Option("<b>Noise</b> & \"loud\""), Option(10L)),
      (Option.empty[String], Option(5L)))
      .toDF("Complaint Type", "Total Count")
    val tmp = java.nio.file.Files.createTempDirectory("graft_html").toString
    Sinks.writeHtml(df, s"$tmp/report.html", title = "Totals <2024>")
    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/report.html")), "UTF-8")
    assert(html.contains("<th>Complaint Type</th><th>Total Count</th>"),
      "header row must keep declared column order")
    assert(html.contains(
      "<td>&lt;b&gt;Noise&lt;/b&gt; &amp; &quot;loud&quot;</td>"),
      "cell values must be HTML-escaped")
    assert(html.contains("<td></td><td>5</td>"), "nulls render empty")
    assert(html.contains("<h1>Totals &lt;2024&gt;</h1>"))
    assert(!html.contains("<b>Noise"), "raw markup must never pass through")
    // presentation-size contract: too many rows fails loudly, never
    // truncates silently
    val big = spark.range(0, 50).toDF("n")
    val e = intercept[IllegalArgumentException] {
      Sinks.writeHtml(big, s"$tmp/big.html", maxRows = 10)
    }
    assert(e.getMessage.contains("presentation-sized"))
  }

  test("WavCodec: PCM decode exact on a hand-computed fixture; truncation, fallback, hostile bytes") {
    import Multimodal.{WavCodec, FakeCodec}
    import spark.implicits._
    // hand-assembled stereo PCM-16 @ 8000 Hz with 3 frames of known
    // samples; RMS/peak computed by hand per channel
    def le32(v: Int) = Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
    def le16(v: Int) = Array(v, v >> 8).map(_.toByte)
    val samples = Seq((100, -200), (300, 400), (-500, 32767)) // (c0, c1)
    val data = samples.flatMap { case (a, b) => le16(a & 0xffff) ++ le16(b & 0xffff) }.toArray
    val wav = "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(8000) ++
      le32(8000 * 4) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data
    val p = WavCodec.decode(wav).get
    assert(p.sampleRate == 8000 && p.channels == 2 && p.nFrames == 3)
    assert(p.sumSq(0) == 100L*100 + 300L*300 + 500L*500)
    assert(p.sumSq(1) == 200L*200 + 400L*400 + 32767L*32767)
    assert(p.peak.toSeq == Seq(500, 32767))
    val f = WavCodec.features(wav).get
    assert(f.take(3).toSeq == Seq(8000.0, 2.0, 3.0))
    assert(f(3) == math.sqrt(p.sumSq(0).toDouble / 3) && f(4) == 500.0)

    // truncated data chunk: declared 3 frames, only 2 present -> decode 2
    val trunc = wav.dropRight(4)
    assert(WavCodec.decode(trunc).get.nFrames == 2)

    // header-only WAV (q86's synthetic: declared data, zero payload) and
    // non-PCM bytes decline; extractFeatures falls back to FakeCodec
    assert(WavCodec.decode(Multimodal.wavBytes(4L, 10L)).isEmpty)
    assert(WavCodec.decode("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(WavCodec.decode(Array.empty[Byte]).isEmpty)
    val hdrOnly = Seq((4L, "abc")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.withContainerColumn(hdrOnly, "doc_id", "text"))
      .collect().head.getSeq[Double](3)
    assert(feats.toArray.sameElements(
      FakeCodec.features(Multimodal.wavBytes(4L, 3L))))

    // the synthesized PCM corpus round-trips: generator formula == decode
    val pcm = Multimodal.withPcmColumn(
      Seq((7L, "hello world")).toDF("doc_id", "text"), "doc_id", "text")
    val rows = Multimodal.wavChannelFeatures(pcm).orderBy("channel").collect()
    val n = ("hello world".getBytes.length % 200) + 1 // 12 frames
    assert(rows.length == 2) // id 7 -> stereo
    rows.zipWithIndex.foreach { case (r, c) =>
      val ss = (0 until n).map { fr =>
        val s = ((7L * 7919 + fr * 31 + c * 17) % 65536) - 32768; s * s
      }.sum
      assert(r.getInt(1) == c) // channel
      assert(r.getInt(2) == 8000 + (7 % 5) * 4000)
      assert(r.getInt(3) == n)
      assert(r.getDouble(4) == math.sqrt(ss.toDouble / n))
    }
  }
}
