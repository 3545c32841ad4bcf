package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.{TDigestQuantile, TDigestSketch}

/** Streaming percentile rollup: per (tumbling day window, event_type) a
  * MERGEABLE t-digest of the value distribution, plus read-out quantile
  * columns — the streaming face of the bounded-memory A4 path.
  *
  * Exact streaming percentiles are impossible with bounded state (the
  * buffer is the whole window's value set); the t-digest rides Spark's
  * streaming aggregation exactly like any TypedImperativeAggregate
  * (`percentile_approx`-style): per-micro-batch partial digests merge
  * into the state store's buffer, so state per open window is ONE
  * constant-size sketch, evicted by the watermark like any windowed agg.
  * The emitted `sketch` column is the same serialized form
  * [[TDigestSketch.mergeAgg]] and `tdigest_quantile` consume, so a
  * lake-landed stream of window sketches can be re-merged into coarser
  * windows (day → month) without ever re-reading the raw events.
  *
  * Correctness: batch equivalence (StreamingPercentileSpec) — the same
  * input through the streaming plan and the batch plan must agree on
  * counts exactly and on quantiles within the digest's rank bound
  * (merge ORDER differs between the two plans, so sketch BYTES may
  * differ; the rank contract is what the sketch promises).
  */
object StreamingPercentile {

  /** The rollup transform, applicable to a batch OR streaming frame.
    * `qs` become `pNN` read-out columns; the sketch itself stays in the
    * output as the persistable/re-mergeable artifact.
    */
  def sketchRollup(events: DataFrame, watermark: Option[String],
                   qs: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    require(qs.nonEmpty && qs == qs.distinct &&
      qs.forall(q => q >= 0 && q <= 1),
      s"qs must be distinct quantiles in [0,1], got $qs")
    // pNN names must be HONEST: q=0.125 rounding to "p13" would label
    // the 12.5th percentile as the 13th — refuse non-integer-percent
    // quantiles instead of mislabeling them
    qs.foreach { q =>
      require((q * 100) == math.rint(q * 100),
        s"quantile $q is not an integer percent — the pNN column name " +
          "would misstate it; pick a percent-aligned quantile or read " +
          "arbitrary quantiles from the sketch with tdigest_quantile")
    }
    val names = qs.map(q => f"p${math.round(q * 100)}%02d")
    require(names == names.distinct,
      s"quantiles $qs collide after pNN rounding: $names")
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    val agg = src
      .groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
      .agg(TDigestSketch.sketchAgg(col("value")).as("sketch"),
        count(lit(1)).as("n"))
    val withQs = qs.zip(names).foldLeft(agg) { case (df, (q, nm)) =>
      df.withColumn(nm, org.apache.spark.sql.GraftInternal.column(
        TDigestQuantile(
          org.apache.spark.sql.GraftInternal.expression(col("sketch")),
          Literal(q))))
    }
    withQs.select(
      (date_format(col("win.start"), "yyyy-MM-dd").as("day") +:
        col("event_type") +: col("n") +:
        names.map(col) :+ col("sketch")): _*)
  }

  /** Streaming driver over a parquet file directory, like
    * [[EventRollup.startFileStream]] — same append-vs-complete
    * output-mode contract.
    */
  def startFileStream(spark: SparkSession, sfDir: String, streamDir: String,
                      queryName: String, watermark: String = "1 day",
                      outputMode: String = "append",
                      qs: Seq[Double] = Seq(0.5, 0.95)): StreamingQuery = {
    val raw = graft.engine.Tables.eventsRaw(spark, sfDir)
    val stream = graft.engine.Tables.eventsFromRaw(
      spark.readStream.schema(raw.schema).parquet(streamDir))
    sketchRollup(stream, Some(watermark), qs)
      .writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
