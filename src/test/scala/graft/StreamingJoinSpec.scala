package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.StreamingJoin

class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val imps = Seq(
    (1L, ts("2024-01-01 10:00:00"), "ad_a"),
    (2L, ts("2024-01-01 10:05:00"), "ad_b"),
    (3L, ts("2024-01-01 10:10:00"), "ad_c") // never clicked
  )
  private val clicks = Seq(
    (1L, ts("2024-01-01 10:20:00"), "home"),   // 20 min later: in window
    (2L, ts("2024-01-01 12:00:00"), "search"), // 115 min later: outside
    (1L, ts("2024-01-01 09:00:00"), "early")   // BEFORE the impression
  )

  test("interval join keeps only pairs inside [ts, ts+within]; batch " +
       "and streaming agree row for row") {
    val li = imps.toDF("user_id", "ts", "ad")
    val ri = clicks.toDF("user_id", "ts", "page")
    val batch = StreamingJoin.within(li, "ts", "1 hour", ri, "ts",
        "1 hour", Seq("user_id"), "1 hour")
      .collect().map(_.toString).sorted.toSeq
    assert(batch.length == 1 && batch.head.contains("ad_a") &&
      batch.head.contains("home"))

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Timestamp, String)]
    val rIn = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingJoin.within(
        lIn.toDS().toDF("user_id", "ts", "ad"), "ts", "1 hour",
        rIn.toDS().toDF("user_id", "ts", "page"), "ts", "1 hour",
        Seq("user_id"), "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_test").start()
    try {
      lIn.addData(imps: _*)
      rIn.addData(clicks: _*)
      q.processAllAvailable()
      val streamed = spark.table("ssj_test")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("left outer: the unclicked impression is emitted with nulls " +
       "once the right watermark passes its window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Timestamp, String)]
    val rIn = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingJoin.within(
        lIn.toDS().toDF("user_id", "ts", "ad"), "ts", "10 minutes",
        rIn.toDS().toDF("user_id", "ts", "page"), "ts", "10 minutes",
        Seq("user_id"), "30 minutes", joinType = "left_outer")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_outer").start()
    try {
      lIn.addData((1L, ts("2024-01-01 10:00:00"), "ad_a"),
        (2L, ts("2024-01-01 10:00:00"), "ad_b")) // never clicked
      rIn.addData((1L, ts("2024-01-01 10:05:00"), "home"))
      q.processAllAvailable()
      // push BOTH watermarks far past the unmatched row's window
      lIn.addData((9L, ts("2024-01-01 23:00:00"), "late_l"))
      rIn.addData((9L, ts("2024-01-01 23:00:00"), "late_r"))
      q.processAllAvailable()
      lIn.addData((8L, ts("2024-01-01 23:50:00"), "later"))
      rIn.addData((8L, ts("2024-01-01 23:50:00"), "later"))
      q.processAllAvailable()
      val rows = spark.table("ssj_outer")
        .select($"user_id", $"ad", $"page").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
      // the matched pair is present...
      assert(rows.contains((1L, "ad_a", Some("home"))))
      // ...and the never-clicked impression was emitted with nulls
      // after its window could no longer match
      assert(rows.contains((2L, "ad_b", None)),
        s"unmatched left row must surface post-watermark: ${rows.toSeq}")
    } finally q.stop()
  }

  test("colliding right columns come back suffixed _r; key columns " +
       "collapse to one") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "x"))
      .toDF("k", "ts", "payload")
    val r = Seq((1L, ts("2024-01-01 10:01:00"), "y"))
      .toDF("k", "ts", "payload")
    val out = StreamingJoin.within(l, "ts", "1 hour", r, "ts", "1 hour",
      Seq("k"), "1 hour")
    assert(out.columns.toSeq ==
      Seq("k", "ts", "payload", "ts_r", "payload_r"))
    assert(out.count() == 1)
  }

  test("right and full outer are rejected with the flip-the-sides hint") {
    val df = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "ts")
    val e = intercept[IllegalArgumentException] {
      StreamingJoin.within(df, "ts", "1 hour", df, "ts", "1 hour",
        Seq("k"), "1 hour", joinType = "right_outer")
    }
    assert(e.getMessage.contains("flip"))
  }
}
