package graft

import org.apache.spark.sql.functions._

import graft.operators.{JpegCodec, Multimodal, VideoContainers}

class VideoContainersSpec extends SparkSpec {
  import spark.implicits._

  /** First index of a fourcc tag in b (the box body starts 4 bytes
    * later), -1 if absent. */
  private def tagIndex(b: Array[Byte], tag: String): Int = {
    val t = tag.getBytes("US-ASCII")
    var j = 0
    while (j + 4 <= b.length) {
      if (b(j) == t(0) && b(j + 1) == t(1) && b(j + 2) == t(2) &&
          b(j + 3) == t(3)) return j
      j += 1
    }
    -1
  }

  private def patchInt(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  private def patchLong(b: Array[Byte], i: Int, v: Long): Unit = {
    patchInt(b, i, (v >>> 32).toInt); patchInt(b, i + 4, v.toInt)
  }

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

  // ---- MJPEG-in-MP4: sample location + decode ----------------------

  test("mp4MjpegBytes round-trips through mp4LocatedTracks / " +
       "mp4MjpegFrames byte-exactly, stco and co64 alike, and each " +
       "slice decodes to real pixels") {
    val frames = Seq(solidJpeg(32, 24, 0xc00000),
      solidJpeg(32, 24, 0x00c000), solidJpeg(32, 24, 0x0000c0))
    Seq(false, true).foreach { co64 =>
      val b = VideoContainers.mp4MjpegBytes(frames, 600, 100,
        chunkSizes = Seq(2, 1), useCo64 = co64)
      val tracks = VideoContainers.mp4LocatedTracks(b)
      assert(tracks.isDefined && tracks.get.length == 1, s"co64=$co64")
      val t = tracks.get.head
      assert(t.codec == "jpeg" && t.timescale == 600L, s"co64=$co64")
      assert(t.sizes.map(_.toInt) == frames.map(_.length), s"co64=$co64")
      val got = VideoContainers.mp4MjpegFrames(b)
      assert(got.length == 3, s"co64=$co64")
      got.zip(frames).zipWithIndex.foreach { case (((trk, f, bytes), want), i) =>
        assert(trk == 0 && f == i && bytes.toSeq == want.toSeq,
          s"co64=$co64 frame=$i")
        val img = JpegCodec.decode(bytes)
        assert(img.exists(x => x.width == 32 && x.height == 24),
          s"co64=$co64 frame=$i must decode to pixels")
      }
    }
  }

  test("stsc multi-run expansion maps every sample to its chunk: " +
       "distinct per-chunk counts, distinct frame sizes, byte-exact " +
       "slices") {
    // chunks of (1, 2, 3) samples → three stsc runs; frame sizes all
    // differ, so any run mis-expansion shifts an offset and breaks the
    // content equality below
    val frames = (0 until 6).map(i =>
      Array.tabulate[Byte](10 + 3 * i)(j => (i * 16 + j).toByte))
    val b = VideoContainers.mp4MjpegBytes(frames, 90000, 3000,
      chunkSizes = Seq(1, 2, 3))
    val t = VideoContainers.mp4LocatedTracks(b).get.head
    assert(t.offsets.length == 6 && t.sizes.map(_.toInt) == frames.map(_.length))
    VideoContainers.mp4MjpegFrames(b).zip(frames).foreach {
      case ((_, _, bytes), want) => assert(bytes.toSeq == want.toSeq)
    }
  }

  test("a forged stsz size past the payload drops that sample and the " +
       "rest of its chunk chain, never throws") {
    val frames = (0 until 4).map(i => Array.fill[Byte](40)((i + 1).toByte))
    val b = VideoContainers.mp4MjpegBytes(frames, 600, 100)
    val p = tagIndex(b, "stsz")
    assert(p > 0)
    // stsz body: version/flags, const, count, then sizes — frame 1's
    // entry sits at body+16
    patchInt(b, p + 4 + 16, 0x7fffffff)
    val t = VideoContainers.mp4LocatedTracks(b).get.head
    assert(t.offsets.length == 1,
      "only the frame before the forged size is locatable")
    val got = VideoContainers.mp4MjpegFrames(b)
    assert(got.length == 1 && got.head._3.toSeq == frames.head.toSeq)
  }

  test("a hostile co64 offset near 2^63 cannot overflow past the " +
       "bounds check (ADVICE r10)") {
    val frames = (0 until 2).map(i => Array.fill[Byte](40)((i + 1).toByte))
    val b = VideoContainers.mp4MjpegBytes(frames, 600, 100,
      useCo64 = true)
    val p = tagIndex(b, "co64")
    assert(p > 0)
    // co64 body: version/flags, count, then u64 offsets — patch the
    // one chunk offset so offset + size wraps Long if added naively
    patchLong(b, p + 4 + 8, 0x7ffffffffffffff0L)
    val t = VideoContainers.mp4LocatedTracks(b).get.head
    assert(t.offsets.isEmpty, "no sample may locate past the payload")
    assert(VideoContainers.mp4MjpegFrames(b).isEmpty)
  }

  test("a forged stsz sample count past the allocation ceiling drops " +
       "the track, not the JVM") {
    val frames = Seq(Array.fill[Byte](24)(7.toByte))
    val b = VideoContainers.mp4MjpegBytes(frames, 600, 100)
    val p = tagIndex(b, "stsz")
    patchInt(b, p + 4 + 8, 0x7fffffff) // sample count at body+8
    val tracks = VideoContainers.mp4LocatedTracks(b)
    assert(tracks.isDefined && tracks.get.isEmpty)
    assert(VideoContainers.mp4MjpegFrames(b).isEmpty)
    // and plain hostile payloads: None / empty, never a throw
    assert(VideoContainers.mp4LocatedTracks(Array[Byte](1, 2, 3)).isEmpty)
    assert(VideoContainers.mp4MjpegFrames(Array.fill[Byte](64)(0)).isEmpty)
  }

  test("mjpegMp4FrameTable reproduces the q118 synthesizer arithmetic " +
       "frame for frame") {
    val ids = Seq(0L, 1L, 4L, 7L)
    val rows = Multimodal.mjpegMp4FrameTable(
        Multimodal.withMjpegMp4Column(ids.toDF("doc_id"), "doc_id"))
      .orderBy("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    val want = ids.flatMap { id =>
      (0 until (1 + id % 5).toInt).map { f =>
        val sz = (20 + 2 * ((id * 7 + f * 3) % 40)).toInt
        val sum = (0 until sz).map(i => (id + f + i) % 251).sum
        (id, 0, f, sz.toLong, sum)
      }
    }
    assert(rows.toSeq == want)
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
