package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Layout
import graft.streaming.LakeSink

class LakeSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_lake_$tag").toFile
    d.deleteOnExit()
    new java.io.File(d, "root").getPath
  }

  test("streamed micro-batches land in their leaves; the composed " +
       "pruned read sees exactly the streamed rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = tmp("stream")
    val input = MemoryStream[(Long, String, Long)]
    val q = LakeSink.partitionedZOrdered(
        input.toDS().toDF("id", "k", "v"),
        root, "k", Seq("id", "v"), filesPerBatch = 2)
      .start()
    try {
      input.addData((1L, "a", 10L), (2L, "b", 20L))
      q.processAllAvailable()
      input.addData((3L, "a", 30L), (4L, "c", 40L)) // new leaf c
      q.processAllAvailable()
      val got = Layout.prunedReadPartitioned(spark, root, Seq.empty)
        .select(col("id"), col("k"), col("v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got == Set((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L),
        (4L, "c", 40L)))
      // manifests were refreshed per batch: nothing left to stat
      assert(Layout.updateManifestPartitioned(spark, root,
        Seq("id", "v")) == 0)
    } finally q.stop()
  }

  test("a redelivered batch id is a ledger no-op: zero new rows, zero " +
       "new files") {
    val root = tmp("replay")
    val b = Seq((1L, "a", 1L), (2L, "b", 2L)).toDF("id", "k", "v")
    assert(LakeSink.landBatch(b, "stream_0", root, "k", Seq("id", "v"),
      filesPerBatch = 2))
    val files = Layout.prunedReadPartitioned(spark, root, Seq.empty)
      .inputFiles.toSet
    // the replay: same batch id, same (or even different) data
    assert(!LakeSink.landBatch(b, "stream_0", root, "k", Seq("id", "v"),
      filesPerBatch = 2))
    assert(Layout.prunedReadPartitioned(spark, root, Seq.empty)
      .inputFiles.toSet == files)
    assert(spark.read.parquet(root).count() == 2)
    // a NEW batch id still lands
    assert(LakeSink.landBatch(
      Seq((3L, "a", 3L)).toDF("id", "k", "v"), "stream_1", root, "k",
      Seq("id", "v"), filesPerBatch = 1))
    assert(spark.read.parquet(root).count() == 3)
  }

  test("compaction cadence: the due batch compacts over-budget leaves " +
       "without changing rows") {
    val root = tmp("cadence")
    val rows = (1L to 12L).map(i => (i, "a", i)).toDF("id", "k", "v")
    (0 until 4).foreach { i =>
      LakeSink.landBatch(rows.filter(col("id") % 4 === i), s"stream_$i",
        root, "k", Seq("id", "v"), filesPerBatch = 2,
        compactNow = i == 3, filesPerLeaf = 1, maxFilesPerLeaf = 2)
    }
    val files = spark.read.parquet(root).inputFiles.length
    assert(files <= 2, s"the cadence compaction must have run: $files")
    assert(spark.read.parquet(root).select(sum(col("id"))).head()
      .getLong(0) == (1L to 12L).sum)
  }

  test("cdcUpsert: streamed updates MERGE by key; a redelivered batch " +
       "is an exact no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("cdc") + "/table"
    val input = MemoryStream[(Long, Long)]
    val q = LakeSink.cdcUpsert(input.toDS().toDF("id", "v"), dir,
        Seq("id", "v"), "id", files = 2)
      .start()
    try {
      input.addData((1L, 10L), (2L, 20L))
      q.processAllAvailable()
      input.addData((2L, 99L), (3L, 30L)) // update key 2, insert 3
      q.processAllAvailable()
      val got = spark.read.parquet(dir).orderBy("id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((1L, 10L), (2L, 99L), (3L, 30L)))
      // replay batch 1 by hand: ledger makes it a no-op
      assert(Layout.upsertByIds(spark, dir, Seq("id", "v"), "id",
        Seq((2L, 99L), (3L, 30L)).toDF("id", "v"), files = 2,
        batchId = Some("stream_1")) == 0)
      assert(spark.read.parquet(dir).count() == 3)
    } finally q.stop()
  }
}
