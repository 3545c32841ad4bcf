package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{MatView, TimeTravel}

/** The incremental-maintenance contract: every refresh must land the
  * view EXACTLY where a full recompute of the source's head would, while
  * reading only the files the delta window's commits touched. */
class MatViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_mv_$tag").toFile
    d.deleteOnExit()
    new java.io.File(d, "data").getPath
  }

  private def batch(b: Int): DataFrame =
    spark.range(b * 100L, b * 100L + 100)
      .select(col("id"), (col("id") % 5).as("grp"), (col("id") * 3).as("v"))

  /** The ground truth the view must equal: a full recompute at head. */
  private def recompute(dir: String): Set[(Long, Long, Long)] =
    TimeTravel.read(spark, dir)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        sum(coalesce(col("v"), lit(0))).as("sum_v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  private def viewRows(view: String): Set[(Long, Long, Long)] =
    MatView.read(spark, view)
      .collect().map(r => (r.getLong(r.fieldIndex("grp")),
        r.getLong(r.fieldIndex("n_rows")),
        r.getLong(r.fieldIndex("sum_v"))))
      .toSet

  test("refresh lands exactly where a full recompute would, across " +
      "append, delete, upsert, and compaction") {
    val dir = tmpDir("contract")
    val view = dir + "_view"
    TimeTravel.commitAppend(batch(0), dir, Seq("id"), files = 2)
    assert(MatView.create(spark, dir, view, Seq("grp"), Seq("v")) == 1L)
    assert(viewRows(view) == recompute(dir))
    // append
    TimeTravel.commitAppend(batch(1), dir, Seq("id"), files = 2)
    assert(MatView.refresh(spark, view).version == 2L)
    assert(viewRows(view) == recompute(dir))
    // delete (count and sum move down)
    TimeTravel.commitDelete(spark, dir, "id",
      spark.range(0L, 200L).filter(col("id") % 7 === 3).select(col("id")))
    MatView.refresh(spark, view)
    assert(viewRows(view) == recompute(dir))
    // upsert (update + insert in one commit)
    val updates = spark.range(40L, 50L)
      .select(col("id"), (col("id") % 5).as("grp"), lit(1000L).as("v"))
      .unionByName(spark.range(700L, 703L)
        .select(col("id"), (col("id") % 5).as("grp"), lit(-5L).as("v")))
    TimeTravel.commitUpsert(spark, dir, "id", updates, files = 2)
    MatView.refresh(spark, view)
    assert(viewRows(view) == recompute(dir))
    // compaction: every file moves, nothing changes — the refresh must
    // cancel to a no-op content-wise
    TimeTravel.compact(spark, dir, Seq("id"), files = 2)
    MatView.refresh(spark, view)
    assert(viewRows(view) == recompute(dir))
    // rollback: files re-added (+1) and removed (−1) by a metadata-only
    // commit follow the same delta algebra
    TimeTravel.rollback(spark, dir, 3L)
    MatView.refresh(spark, view)
    assert(viewRows(view) == recompute(dir))
    // catching up over SEVERAL commits in one refresh also lands exact
    val view2 = dir + "_view2"
    MatView.create(spark, dir, view2, Seq("grp"), Seq("v"))
    assert(viewRows(view2) == viewRows(view))
  }

  test("refresh equals a recompute after EVERY step of a randomized " +
      "append/delete/upsert/compact/rollback sequence") {
    val dir = tmpDir("random")
    val view = dir + "_view"
    val rnd = new scala.util.Random(29) // seeded: reproducible
    var nextId = 0L
    def freshRows(n: Int) = {
      val rows = spark.range(nextId, nextId + n)
        .select(col("id"), (col("id") % 5).as("grp"),
          (col("id") * 3).as("v"))
      nextId += n
      rows
    }
    TimeTravel.commitAppend(freshRows(60), dir, Seq("id"), files = 2)
    MatView.create(spark, dir, view, Seq("grp"), Seq("v"))
    (1 to 8).foreach { step =>
      rnd.nextInt(5) match {
        case 0 => TimeTravel.commitAppend(freshRows(30), dir, Seq("id"),
          files = 2)
        case 1 => TimeTravel.commitDelete(spark, dir, "id",
          spark.range(0L, nextId)
            .filter(col("id") % 11 === rnd.nextInt(11).toLong)
            .select(col("id")))
        case 2 =>
          val salt = rnd.nextInt(1000).toLong
          TimeTravel.commitUpsert(spark, dir, "id",
            spark.range(0L, nextId)
              .filter(col("id") % 7 === rnd.nextInt(7).toLong)
              .select(col("id"), (col("id") % 5).as("grp"),
                (col("id") + salt).as("v")), files = 2)
        case 3 => TimeTravel.compact(spark, dir, Seq("id"), files = 3)
        case 4 =>
          val latest = TimeTravel.latestVersion(spark, dir)
          TimeTravel.rollback(spark, dir, 1L + rnd.nextInt(latest.toInt))
      }
      MatView.refresh(spark, view)
      assert(viewRows(view) == recompute(dir),
        s"view diverged from recompute after random step $step")
    }
  }

  test("refresh reads only the touched files, and a no-op refresh " +
      "reads none") {
    val dir = tmpDir("touch")
    val view = dir + "_view"
    (0 to 4).foreach(i => TimeTravel.commitAppend(batch(i), dir,
      Seq("id"), files = 2)) // 10 live files
    MatView.create(spark, dir, view, Seq("grp"), Seq("v"))
    // one more commit of 2 files: the refresh must read 2, not 12
    TimeTravel.commitAppend(batch(5), dir, Seq("id"), files = 2)
    val st = MatView.refresh(spark, view)
    assert(st.version == 6L && st.filesRead == 2,
      s"expected a 2-file incremental read, got ${st.filesRead}")
    // nothing new: zero files
    val st2 = MatView.refresh(spark, view)
    assert(st2.version == 6L && st2.filesRead == 0)
    assert(viewRows(view) == recompute(dir))
  }

  test("groups emptied by deletes disappear; null keys merge as one " +
      "group; null sum values count as zero") {
    val dir = tmpDir("nulls")
    val view = dir + "_view"
    val rows = Seq[(java.lang.Long, java.lang.Long, java.lang.Long)](
      (1L, 10L, 5L), (2L, 10L, null), (3L, null, 7L), (4L, null, null),
      (5L, 20L, 1L))
      .toDF("id", "grp", "v")
    TimeTravel.commitAppend(rows, dir, Seq("id"), files = 1)
    MatView.create(spark, dir, view, Seq("grp"), Seq("v"))
    val initial = MatView.read(spark, view).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getLong(1), r.getLong(2))).toSet
    assert(initial == Set((10L, 2L, 5L), (-1L, 2L, 7L), (20L, 1L, 1L)))
    // delete BOTH null-group rows and one of grp 10's: the null group
    // must disappear (not linger at 0), grp 10 must drop to 1
    TimeTravel.commitDelete(spark, dir, "id",
      Seq(2L, 3L, 4L).toDF("id"))
    MatView.refresh(spark, view)
    val after = MatView.read(spark, view).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getLong(1), r.getLong(2))).toSet
    assert(after == Set((10L, 1L, 5L), (20L, 1L, 1L)))
  }

  test("refresh refuses a window behind the vacuum floor; create " +
      "rebuilds; stale guards are loud") {
    val dir = tmpDir("vacuum")
    val view = dir + "_view"
    TimeTravel.commitAppend(batch(0), dir, Seq("id"), files = 2)
    MatView.create(spark, dir, view, Seq("grp"), Seq("v"))
    TimeTravel.compact(spark, dir, Seq("id"), files = 1) // v2
    TimeTravel.vacuum(spark, dir, keepFrom = 2L) // v1's files reclaimed
    val e = intercept[IllegalArgumentException](MatView.refresh(spark, view))
    assert(e.getMessage.contains("vacuum floor"))
    // the documented recovery: rebuild
    assert(MatView.create(spark, dir, view, Seq("grp"), Seq("v")) >= 2L)
    assert(viewRows(view) == recompute(dir))
    // unknown view path is loud
    val e2 = intercept[IllegalArgumentException](
      MatView.asOfVersion(spark, tmpDir("missing") + "_nope"))
    assert(e2.getMessage.contains("_HEAD"))
  }

  test("streamed micro-batches keep the view current: streamingSink + " +
      "per-epoch refresh equals a full recompute after every epoch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("stream")
    val view = dir + "_view"
    // seed the table and the view, then tail the stream into both
    TimeTravel.commitAppend(batch(0), dir, Seq("id"), files = 2)
    MatView.create(spark, dir, view, Seq("grp"), Seq("v"))
    val input = MemoryStream[(Long, Long, Long)]
    val sink = TimeTravel.streamingSink(dir, Seq("id"), files = 2)
    val q = input.toDS().toDF("id", "grp", "v")
      .writeStream.foreachBatch { (b: DataFrame, epoch: Long) =>
        sink(b, epoch)
        MatView.refresh(spark, view): Unit
      }.start()
    try {
      input.addData((1000L, 1L, 5L), (1001L, 2L, 6L))
      q.processAllAvailable()
      assert(viewRows(view) == recompute(dir))
      input.addData((1002L, 1L, 7L))
      q.processAllAvailable()
      assert(viewRows(view) == recompute(dir))
    } finally q.stop()
  }

  test("a crashed refresh is invisible: the pointer still serves the " +
      "old snapshot, and the retry completes") {
    val dir = tmpDir("crash")
    val view = dir + "_view"
    TimeTravel.commitAppend(batch(0), dir, Seq("id"), files = 2)
    MatView.create(spark, dir, view, Seq("grp"), Seq("v"))
    val before = viewRows(view)
    TimeTravel.commitAppend(batch(1), dir, Seq("id"), files = 2)
    // simulate the crash window: a half-written NEW snapshot exists but
    // the pointer was never swapped
    val fs = new org.apache.hadoop.fs.Path(view)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = new org.apache.hadoop.fs.Path(view + "/snap_v2")
    fs.mkdirs(stale)
    assert(viewRows(view) == before, "pointer must ignore the residue")
    // the retry overwrites the residue and completes
    assert(MatView.refresh(spark, view).version == 2L)
    assert(viewRows(view) == recompute(dir))
  }

  test("refresh crosses a type-widening boundary: the delta window " +
      "spans int and long generations of the summed column and still " +
      "lands exactly where a recompute would") {
    val dir = tmpDir("widen")
    val view = dir + "_view"
    // v1: v is INT
    TimeTravel.commitAppend(
      spark.range(0L, 100L).select(col("id"), (col("id") % 4).as("grp"),
        (col("id") % 50).cast("int").as("v")),
      dir, Seq("id"), files = 2)
    assert(MatView.create(spark, dir, view, Seq("grp"), Seq("v")) == 1L)
    // v2 widens v to LONG (beyond int range); v3 deletes some narrow
    // rows — the (1, 3] delta window reads files of BOTH widths
    TimeTravel.commitAppend(
      spark.range(100L, 120L).select(col("id"), (col("id") % 4).as("grp"),
        (col("id") + 5000000000L).as("v")),
      dir, Seq("id"), files = 1)
    TimeTravel.commitDelete(spark, dir, "id",
      spark.range(0L, 100L).filter(col("id") % 10 === 3).select(col("id")))
    val st = MatView.refresh(spark, view)
    assert(st.version == 3L)
    val got = MatView.read(spark, view)
      .select(col("grp"), col("n_rows"), col("sum_v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = TimeTravel.read(spark, dir)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        sum(coalesce(col("v"), lit(0L))).as("sum_v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.exists(_._3 > 5000000000L))
  }
}
