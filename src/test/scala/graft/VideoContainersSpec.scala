package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, VideoContainers}

class VideoContainersSpec extends SparkSpec {
  import spark.implicits._

  // ---- MP4 per-sample tables ---------------------------------------

  test("mp4 sample tables round-trip the synthesizer's arithmetic") {
    Seq(0L, 1L, 6L, 13L, 97L).foreach { id =>
      val b = Multimodal.mp4SampleBytes(id)
      val tracks = VideoContainers.mp4SampleTables(b)
      assert(tracks.isDefined && tracks.get.length == 1, s"id=$id")
      val t = tracks.get.head
      val n = (1 + id % 7).toInt
      assert(t.timescale == 600L, s"id=$id")
      assert(t.sizes.length == n && t.deltas.length == n, s"id=$id")
      assert(t.deltas.forall(_ == 100 + id % 50), s"id=$id")
      (0 until n).foreach { f =>
        assert(t.sizes(f) == 100 + (id * 31 + f * 7) % 400, s"id=$id f=$f")
      }
    }
  }

  test("mp4 sample parse never throws on hostile bytes") {
    assert(VideoContainers.mp4SampleTables(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoContainers.mp4SampleTables(Array.fill[Byte](64)(0)).isEmpty)
    // a structurally valid mp4 with no sample tables: [] not None-crash
    val noTables = Multimodal.mp4Bytes(3L) // metadata-only moov (q86 shape)
    assert(VideoContainers.mp4SampleTables(noTables).contains(Seq.empty))
    // a declared sample count far past the payload: the track declines
    val b = Multimodal.mp4SampleBytes(5L)
    // stts entry_count lives 12 bytes into the stts box; find and forge it
    val idx = {
      var i = -1
      var j = 0
      while (i < 0 && j + 4 <= b.length) {
        if (b(j) == 's' && b(j + 1) == 't' && b(j + 2) == 't' && b(j + 3) == 's')
          i = j
        j += 1
      }
      i
    }
    assert(idx > 0)
    // overwrite sample_count of the first run with a huge value
    b(idx + 8) = 0x7f.toByte; b(idx + 9) = 0xff.toByte
    b(idx + 10) = 0xff.toByte; b(idx + 11) = 0xff.toByte
    val forged = VideoContainers.mp4SampleTables(b)
    assert(forged.isDefined && forged.get.isEmpty,
      "an absurd declared sample count must drop the track, not allocate")
  }

  test("mp4FrameTable emits one row per (doc, frame) with exact fields") {
    val docs = Seq(0L, 3L, 10L).toDF("doc_id")
    val rows = Multimodal.mp4FrameTable(
        Multimodal.withMp4SampleColumn(docs, "doc_id"))
      .orderBy("doc_id", "frame_idx")
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getLong(4)))
    val want = Seq(0L, 3L, 10L).flatMap { id =>
      (0 until (1 + id % 7).toInt).map { f =>
        (id, f, 100 + (id * 31 + f * 7) % 400, 100 + id % 50)
      }
    }
    assert(rows.toSeq == want)
  }

  // ---- AVI container + MJPEG frame decode --------------------------

  test("aviBytes round-trips through decode: header facts and exact " +
       "frame payloads") {
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7),
      Array.tabulate[Byte](11)(_.toByte)) // odd length → padded chunk
    val b = VideoContainers.aviBytes(frames, 320, 240, 40000L)
    val avi = VideoContainers.decode(b)
    assert(avi.isDefined)
    val a = avi.get
    assert(a.width == 320 && a.height == 240 && a.usPerFrame == 40000L)
    assert(a.nFramesDeclared == 3 && a.frames.length == 3)
    a.frames.zip(frames).foreach { case (got, want) =>
      assert(got.toSeq == want.toSeq) // padding byte excluded
    }
  }

  test("avi decode never throws and reports frames actually present " +
       "on a truncated file") {
    assert(VideoContainers.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoContainers.decode("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    val frames = Seq.tabulate(4)(i => Array.fill[Byte](20)(i.toByte))
    val full = VideoContainers.aviBytes(frames, 64, 48, 33333L)
    // cut mid-way through the movi list: the declared count stays 4,
    // the walk finds fewer whole chunks
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length - 50)
    val avi = VideoContainers.decode(cut)
    assert(avi.isDefined)
    assert(avi.get.nFramesDeclared == 4 && avi.get.frames.length < 4)
  }

  /** JDK-encoded JPEG of a solid color — same-JVM encoder/decoder pair,
    * the exactness contract JpegCodecSpec documents. */
  private def solidJpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    bos.toByteArray
  }

  test("aviFrameFeatures decodes real MJPEG frames to real pixels") {
    // two docs × two solid-color frames each; solid frames decode to
    // near-uniform pixels (JPEG is lossy — tolerance, not equality)
    val mk = (id: Long) => VideoContainers.aviBytes(
      Seq(solidJpeg(32, 24, 0xc00000), solidJpeg(32, 24, 0x00c000)),
      32, 24, 33333L)
    val media = Seq((1L, mk(1L)), (2L, mk(2L))).toDF("doc_id", "payload")
    val rows = Multimodal.aviFrameFeatures(media)
      .orderBy("doc_id", "frame_idx").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getInt(2) == 32 && r.getInt(3) == 24)
      val feat = r.getSeq[Double](4)
      assert(feat.length == 16)
      val (rMean, gMean) = (feat(0), feat(1))
      if (r.getInt(1) == 0) { // red frame
        assert(math.abs(rMean - 0xc0 / 255.0) < 0.02 && gMean < 0.05,
          s"red frame means off: r=$rMean g=$gMean")
      } else { // green frame
        assert(math.abs(gMean - 0xc0 / 255.0) < 0.02 && rMean < 0.05,
          s"green frame means off: r=$rMean g=$gMean")
      }
    }
    // a corrupt frame chunk is skipped, not fatal, and not fabricated
    val broken = VideoContainers.aviBytes(
      Seq(solidJpeg(32, 24, 0xc00000), Array[Byte](9, 9, 9)), 32, 24, 33333L)
    val got = Multimodal.aviFrameFeatures(
        Seq((7L, broken)).toDF("doc_id", "payload"))
      .collect()
    assert(got.length == 1 && got.head.getInt(1) == 0)
  }

  test("detectMeta sniffs AVI containers: walked frame count, not the " +
       "header's claim") {
    val docs = Seq(0L, 4L, 11L).toDF("doc_id").withColumn("text", lit("x"))
    val meta = Multimodal.detectMeta(
        Multimodal.withAviColumn(docs, "doc_id"))
      .select(col("doc_id"), col("meta.media_type"), col("meta.width"),
        col("meta.height"), col("meta.n_frames"), col("meta.duration_ms"))
      .orderBy("doc_id").collect()
    meta.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "video/avi")
      assert(r.getInt(2) == 16 + (id % 5) * 8)
      assert(r.getInt(3) == 16 + (id % 3) * 8)
      assert(r.getInt(4) == 1 + id % 6)
      assert(r.getLong(5) ==
        (1 + id % 6) * (33333 + (id % 10) * 1000) / 1000)
    }
  }
}
