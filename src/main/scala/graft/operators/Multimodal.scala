package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct, and per-batch "decode" /
  * feature-extraction runs partition-wise (the Scala analogue of
  * `mapInPandas`: one iterator of rows per partition, vectorizable by the
  * worker library).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment) behind [[FakeCodec]], a deterministic stand-in — the
  * Spark-side contract (schema, partitioning, batch iteration, output
  * shape) is real and tested. Swap [[FakeCodec]] for a JNI/OpenCV/ffmpeg
  * binding in production; nothing else changes.
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

  /** STUB codec: deterministic pseudo-decode of a binary payload.
    * Real implementation would JNI into an image/audio library here
    * (`???`-equivalent); this fake derives stable per-byte statistics so
    * the pipeline is testable end-to-end.
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
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select(col("doc_id"), col("payload"), col("meta.media_type"))
      .mapPartitions { rows =>
        // per-partition "codec init" would happen here
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("doc_id"), r.getAs[String]("media_type"),
            bytes.length.toLong, FakeCodec.features(bytes))
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
