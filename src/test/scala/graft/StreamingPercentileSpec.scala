package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.TDigestSketch
import graft.streaming.StreamingPercentile

/** The streaming sketch rollup's contracts: batch equivalence on counts
  * and rank-bounded quantiles, cross-micro-batch sketch merging, and
  * the coarser-window re-merge of landed sketches (day → all-time)
  * without re-reading events.
  */
class StreamingPercentileSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streaming sketch rollup equals the batch rollup on counts; " +
       "quantiles of both sit within the rank bound of the exact group") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft_sperc")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = StreamingPercentile.startFileStream(spark, dir,
      streamDir.toString, "sperc_test", outputMode = "complete")
    try {
      q.processAllAvailable()
      val streamed = spark.table("sperc_test")
        .select("day", "event_type", "n", "p50")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val batch = StreamingPercentile
        .sketchRollup(Tables.events(spark, dir), None)
        .select("day", "event_type", "n", "p50")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(streamed.keySet == batch.keySet && streamed.nonEmpty)
      assert(streamed.forall { case (k, (n, _)) => batch(k)._1 == n },
        "counts must match exactly")

      // both plans' medians must sit within the digest's rank bound of
      // the group's exact values (merge order differs, so the two
      // estimates may differ — the rank contract is what holds)
      val ev = Tables.events(spark, dir)
        .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
            .as("day"), col("event_type"), col("value"))
        .collect()
        .groupBy(r => (r.getString(0), r.getString(1)))
        .view.mapValues(_.map(_.getDouble(2)).sorted).toMap
      for ((k, vals) <- ev; med <- Seq(streamed(k)._2, batch(k)._2)) {
        val rank = vals.count(_ <= med).toDouble / vals.length
        assert(math.abs(rank - 0.5) <= 0.03 + 1.0 / vals.length,
          s"$k: median $med has rank $rank over n=${vals.length}")
      }
    } finally q.stop()
  }

  test("sketches accumulate across micro-batches (state merges), and " +
       "landed window sketches re-merge to an all-time quantile " +
       "without re-reading events") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDS()
      .toDF("ts", "event_type", "value")
    val q = StreamingPercentile.sketchRollup(events, None, Seq(0.5))
      .writeStream.outputMode("complete").format("memory")
      .queryName("sperc_mb").start()
    try {
      def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:00:00")
      // batch 1: values 1..50; batch 2: 51..100 — same day window
      input.addData((1 to 50).map(i => (ts(i % 24), "a", i.toDouble)): _*)
      q.processAllAvailable()
      input.addData((51 to 100).map(i => (ts(i % 24), "a", i.toDouble)): _*)
      q.processAllAvailable()
      val row = spark.table("sperc_mb").collect()
      assert(row.length == 1 && row.head.getAs[Long]("n") == 100L,
        "one day window whose state merged both micro-batches")
      val p50 = row.head.getAs[Double]("p50")
      assert(p50 > 45 && p50 < 56,
        s"median of 1..100 must see BOTH batches (got $p50 — " +
          "~25 would mean batch 1's state was dropped, ~75 overwritten)")

      // the landed sketch re-merges: pretend two such day rows landed
      // in a lake; merging their sketch bytes answers the union
      val sk = row.head.getAs[Array[Byte]]("sketch")
      val merged = TDigestSketch.merge(Seq(sk, sk))
      val m = TDigestSketch.quantile(merged, 0.5)
      assert(m > 45 && m < 56, s"doubled corpus keeps the median: $m")
    } finally q.stop()
  }
}
