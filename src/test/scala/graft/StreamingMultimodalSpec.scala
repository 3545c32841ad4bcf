package graft

import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.{Multimodal, Sinks}
import graft.streaming.EventRollup

class StreamingMultimodalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("streaming rollup over the events files equals the batch rollup") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventRollup.startFileStream(spark, dir, streamDir.toString, "rollup_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("rollup_test")
        .orderBy("day", "event_type").collect()
      val batch = EventRollup.rollup(Tables.events(spark, dir), None)
        .orderBy("day", "event_type").collect()
      assert(streamed.length == batch.length && streamed.sameElements(batch))
    } finally q.stop()
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
}
