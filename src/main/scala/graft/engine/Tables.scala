package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md) and the
  * session defaults the engine expects.
  *
  * Scale notes (100 TB design point): every loader is a plain parquet scan so
  * Catalyst's vectorized reader, predicate pushdown and column pruning apply
  * unchanged on a real cluster; dimension tables (`region`, `nation`,
  * `supplier`, `part`) are small and are broadcast by the optimizer (we keep
  * them under `spark.sql.autoBroadcastJoinThreshold`). Fact tables
  * (`lineitem`, `orders`, `events`) would be laid out partitioned by month of
  * their date column in production — the queries in [[graft.SparkEntry]] all
  * filter on those columns so partition pruning kicks in.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(path(sfDir, name))

  /** The events table's `ts` encoding has varied across test-data
    * generations — INT64 TIMESTAMP(NANOS) (which Spark's vectorized
    * reader refuses; read as raw nanos and converted) and, since the
    * round-7 regeneration, plain TIMESTAMP(MICROS) NTZ.
    * [[eventsFromRaw]] normalizes whichever this directory holds to a
    * microsecond UTC TimestampType.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    eventsFromRaw(eventsRaw(spark, sfDir))

  /** Raw events frame: `ts` exactly as the file encodes it — LongType
    * nanos for TIMESTAMP(NANOS) generations (via `nanosAsLong`),
    * TIMESTAMP_NTZ for TIMESTAMP(MICROS) ones (the conf is a no-op
    * there). Also the schema to use for a streaming file source on
    * these files.
    *
    * `nanosAsLong` is a session-level SQL conf (there is no per-read
    * option); the nanos→long mapping is captured when the DataFrame is
    * created, so the prior value is restored immediately after the read —
    * a later TIMESTAMP(NANOS) parquet read elsewhere in the session still
    * errors loudly instead of silently returning LongType.
    *
    * The set/restore is synchronized on the session so two concurrent
    * `eventsRaw` calls can't interleave (one restoring over the other's
    * set); a concurrent parquet ANALYSIS on another thread of the same
    * session could still observe the flipped conf during the read — use a
    * dedicated `spark.newSession()` if that matters. Restoring before
    * EXECUTION is safe because the nanos→long decision is captured in the
    * schema at analysis time; neither the vectorized reader nor
    * ParquetRowConverter re-validates TIMESTAMP(NANOS) against the conf at
    * scan time (verified against Spark 4.1.2 internals — an implementation
    * detail, so re-verify on major upgrades).
    */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame =
    spark.synchronized {
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prior = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try spark.read.parquet(path(sfDir, "events"))
      finally prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

  /** Normalize `ts` to a microsecond TimestampType, whatever the file
    * encodes (the driver has shipped both INT64 TIMESTAMP(NANOS) and
    * plain TIMESTAMP(MICROS) generations of the events table):
    *
    *  - LongType (nanos read via `nanosAsLong`): integral `div` — `/`
    *    would promote the ~1.7e18 epoch-nanos to double, whose 256 ns
    *    spacing at that magnitude can shift a midnight-exact event into
    *    the previous microsecond (and day bucket);
    *  - TIMESTAMP_NTZ (micros, isAdjustedToUTC=false): cast, which under
    *    the project-wide UTC session interprets the wall time as UTC —
    *    the same micros value, now zone-tagged like the nanos path;
    *  - TimestampType: already the target.
    */
  def eventsFromRaw(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        // FLOOR division (r12): `div` truncates toward zero, shifting
        // a pre-epoch (negative) nanos value one microsecond LATE —
        // the bucket-shift class the integral division was chosen to
        // prevent. Exact floor for both signs, pure integer ops.
        raw.withColumn("ts", timestamp_micros(
          expr("CASE WHEN ts >= 0 THEN ts div 1000 " +
            "ELSE (ts - 999) div 1000 END")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other")
    }
  }

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Session tuned for local[N] testing but with settings that transfer to a
    * cluster: AQE on (runtime shuffle coalescing + skew-join handling),
    * shuffle partitions sized to cores rather than the 200 default.
    */
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // nanosAsLong is NOT set here: eventsRaw scopes it to its own read
      // and restores the prior value, so unexpected TIMESTAMP(NANOS)
      // files elsewhere still error loudly
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
