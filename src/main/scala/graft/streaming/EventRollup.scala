package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Structured-Streaming twin of the batch event rollup (SparkEntry
  * q24_event_rollup): tumbling daily windows per event type with a
  * watermark for late data.
  *
  * The reference is strictly request/response batch (SURVEY.md §2.7); this
  * is the extension-surface streaming path. Correctness is established by
  * batch equivalence (EventRollupSpec): the same input must produce the
  * same rollup through the streaming plan as through the batch plan.
  *
  * Scale: state is bounded by (watermark horizon ÷ day) × |event_type| —
  * the watermark lets Spark drop window state once `ts` passes
  * window end + horizon.
  */
object EventRollup {

  /** The rollup transform, applicable to a batch OR streaming frame.
    *
    * POISON-RECORD note (r12 review): the decimal(18,6) sum cast is
    * exact and oracle-mirrored, and under the ANSI default it THROWS
    * on |value| ≥ 1e12 — in a streaming deployment one such record
    * fails its micro-batch on every restart (an unskippable poison
    * record). That loudness is deliberate (silently nulling value mass
    * out of a revenue rollup is worse); a stream ingesting untrusted
    * magnitudes should bound them upstream (`Ingest.validateSplit`
    * range rules — the quarantine exists for exactly this) rather than
    * weaken the rollup's arithmetic.
    */
  def rollup(events: DataFrame, watermark: Option[String]): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(window(col("ts"), "1 day").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(date_format(col("win.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Run the rollup as a streaming query over parquet files, landing
    * complete-mode results in an in-memory table `queryName`. The caller
    * drives it with `processAllAvailable()`.
    */
  /** `streamDir` must be a DIRECTORY of events parquet files (the file
    * source tails directories; new files appearing there become new
    * micro-batches). Schema comes from the batch raw reader over `sfDir`.
    *
    * `outputMode`: "append" is the production mode — the watermark evicts
    * window state once it passes, so state stays bounded. "complete"
    * (used by the batch-equivalence test) re-emits every window each
    * batch and NEVER evicts state regardless of the watermark — only use
    * it on bounded inputs.
    */
  def startFileStream(spark: SparkSession, sfDir: String, streamDir: String,
                      queryName: String, watermark: String = "1 day",
                      outputMode: String = "append"): StreamingQuery = {
    val raw = graft.engine.Tables.eventsRaw(spark, sfDir)
    val stream = graft.engine.Tables.eventsFromRaw(
      spark.readStream.schema(raw.schema).parquet(streamDir))
    rollup(stream, Some(watermark))
      .writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
