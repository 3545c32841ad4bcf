package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct, and per-batch "decode" /
  * feature-extraction runs partition-wise (the Scala analogue of
  * `mapInPandas`: one iterator of rows per partition, vectorizable by the
  * worker library).
  *
  * IMAGE payloads get REAL pixel decode: PNG via [[PngCodec]] (IDAT
  * inflate + scanline un-filtering from the public spec, bit-exact) and
  * JPEG via [[JpegCodec]] (the JDK's bundled `javax.imageio` baseline
  * reader — still zero dependencies beyond the JDK), so
  * [[extractFeatures]] emits genuine channel means and a luminance
  * histogram for both. Audio/video codec steps are STUBBED (no such
  * libraries in this environment) behind [[FakeCodec]], a deterministic
  * stand-in — the Spark-side contract (schema, partitioning, batch
  * iteration, output shape) is real and tested. Swap [[FakeCodec]] for
  * a JNI/ffmpeg binding in production; nothing else changes.
  */
object Multimodal {

  /** Media metadata the pipeline carries next to the bytes. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Feature row produced by the partition-wise extractor. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(DoubleType))))

  /** STUB codec for NON-IMAGE payloads: deterministic pseudo-decode of a
    * binary payload (PNG decodes through [[PngCodec]], JPEG through
    * [[JpegCodec]] — both real pixels). A real implementation would JNI
    * into an audio/video library here (`???`-equivalent); this fake
    * derives stable per-byte statistics so the pipeline is testable
    * end-to-end.
    */
  object FakeCodec {
    /** "Decode" = 16-bin byte histogram normalized to a unit feature. */
    def features(bytes: Array[Byte]): Array[Double] = {
      val hist = new Array[Double](16)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) >> 4) += 1.0
        i += 1
      }
      val n = math.max(bytes.length, 1).toDouble
      hist.map(_ / n)
    }

    /** Stub dimensions: derived deterministically from content length. */
    def dims(bytes: Array[Byte]): (Int, Int) =
      (64 + (bytes.length % 64), 64 + ((bytes.length / 64) % 64))
  }

  /** REAL header codec for the two public image container formats a
    * training pipeline meets first — pure JVM byte parsing, no image
    * library (decode-to-pixels stays stubbed; dimensions/type live in the
    * headers and need no codec):
    *
    *  - PNG (RFC 2083): 8-byte signature, then the IHDR chunk is mandated
    *    first — width/height are the two big-endian u32s at offsets 16/20.
    *  - JPEG (ITU-T T.81): marker-segment walk from SOI (FFD8) to the
    *    first frame header SOFn (FFC0..FFCF minus C4/C8/CC), which carries
    *    height/width as big-endian u16s at segment offsets 3/5.
    */
  object HeaderCodec {
    private val pngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def u16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

    private def u32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

    def isPng(b: Array[Byte]): Boolean =
      b.length >= 24 && pngSig.indices.forall(i => b(i) == pngSig(i))

    /** (width, height) from the IHDR chunk, or None if not a PNG. */
    def pngDims(b: Array[Byte]): Option[(Int, Int)] =
      if (!isPng(b)) None
      else Some((u32(b, 16).toInt, u32(b, 20).toInt))

    def isJpeg(b: Array[Byte]): Boolean =
      b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

    /** (width, height) from the first SOFn segment, or None if not a JPEG
      * or the stream is truncated before its frame header.
      */
    def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
      if (!isJpeg(b)) return None
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // lost marker sync
        val m = b(i + 1) & 0xff
        if (m == 0xff) { i += 1 } // fill bytes before a marker
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) { i += 2 } // bare markers
        else {
          val len = u16(b, i + 2)
          if (len < 2) return None
          val sof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (sof) {
            return if (i + 8 < b.length)
              Some((u16(b, i + 7), u16(b, i + 5))) else None
          }
          i += 2 + len
        }
      }
      None
    }

    /** Sniff (media_type, width, height) from payload bytes. */
    def sniff(b: Array[Byte]): Option[(String, Int, Int)] =
      pngDims(b).map { case (w, h) => ("image/png", w, h) }
        .orElse(jpegDims(b).map { case (w, h) => ("image/jpeg", w, h) })
  }

  /** PNG dimensions as pure BUILT-IN columns (codegen'd, no JVM codec in
    * the row loop): the IHDR width/height u32s via substring+hex+conv.
    * NULL for non-PNG payloads. The fixed-offset layout is what makes the
    * no-UDF formulation possible; JPEG's variable-length marker walk goes
    * through [[detectMeta]]'s partition-wise parser instead.
    */
  def pngWidthCol(payload: Column): Column =
    when(isPngCol(payload),
      conv(hex(substring(payload, 17, 4)), 16, 10).cast("int"))
  def pngHeightCol(payload: Column): Column =
    when(isPngCol(payload),
      conv(hex(substring(payload, 21, 4)), 16, 10).cast("int"))
  private def isPngCol(payload: Column): Column =
    octet_length(payload) >= 24 &&
      hex(substring(payload, 1, 8)) === lit("89504E470D0A1A0A")

  /** Partition-wise header sniff: rewrites `meta` with the real media type
    * and dimensions parsed from the payload's header bytes (PNG/JPEG),
    * keeping the prior metadata for unrecognized payloads. mapPartitions
    * for the same reason as [[extractFeatures]]: one parser context per
    * partition, rows stream through it.
    */
  def detectMeta(media: DataFrame): DataFrame = {
    val schema = media.schema
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val pi = schema.fieldIndex("payload")
    val mi = schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](pi)
        HeaderCodec.sniff(bytes) match {
          case Some((mt, w, h)) =>
            val vals = r.toSeq.toArray
            vals(mi) = Row(mt, bytes.length.toLong, w, h,
              r.getAs[Row](mi).getAs[Any]("n_frames"))
            Row.fromSeq(vals.toSeq)
          case None => r
        }
      }
    }(enc)
  }

  /** Attach a binary payload column + metadata struct. For the driver
    * testdata we synthesize the payload from the text bytes (UTF-8) —
    * real ingestion reads files via `binaryFile` format.
    */
  def withMediaColumn(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = encode(col(textCol), "utf-8")
    df.select(col(idCol).cast("long").as("doc_id"), payload.as("payload"))
      .withColumn("meta", struct(
        lit("image/fake").as("media_type"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("n_frames")))
  }

  /** Partition-wise decode + feature extraction (mapPartitions — one
    * codec context per partition, amortized across its rows, matching how
    * a Pandas-UDF batch would run).
    *
    * Image payloads are sniffed by content (never trust the metadata
    * column of an untrusted corpus) and decoded to real pixels — PNG via
    * [[PngCodec]], JPEG via [[JpegCodec]]; their feature vector is
    * [[PngCodec.pixelFeatures]] (4 channel means + a 12-bin luminance
    * histogram — 16 dims). Everything else falls back to [[FakeCodec]]'s
    * 16-bin byte histogram, so the output column has one fixed shape
    * either way.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select(col("doc_id"), col("payload"), col("meta.media_type"))
      .mapPartitions { rows =>
        // per-partition "codec init" would happen here
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          val feature = PngCodec.decode(bytes)
            .orElse(JpegCodec.decode(bytes)) match {
            case Some(img) => PngCodec.pixelFeatures(img)
            case None => FakeCodec.features(bytes)
          }
          Row(r.getAs[Long]("doc_id"), r.getAs[String]("media_type"),
            bytes.length.toLong, feature)
        }
      }(enc)
  }

  /** "Resize" stub: rewrites metadata to target dims, payload untouched
    * (a real impl transforms bytes; the plan shape is identical).
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.media_type").as("media_type"),
      col("meta.n_bytes").as("n_bytes"),
      lit(w).as("width"), lit(h).as("height"),
      col("meta.n_frames").as("n_frames")))

  /** Frame sampling stub for video-like payloads: emits every `stride`-th
    * chunk of the payload as a frame row (explode BEFORE feature
    * extraction so frames parallelize independently of their video).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest((octet_length(col("payload")) / (frameBytes * stride)) - 1, lit(0))
            .cast("int"))))
      .withColumn("frame",
        col("payload").substr((col("frame_idx") * frameBytes * stride + 1).cast("int"),
          lit(frameBytes)))
      .select(col("doc_id"), col("frame_idx"), col("frame"))
}
