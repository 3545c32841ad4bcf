package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KeyCodec

/** Address → BBL resolution. The reference calls the NYC Geoclient HTTP
  * API per request (webserver/server.py:74-115) — a driver-side external
  * boundary, not a distributed operator. At scale the same capability is a
  * broadcast mapping-dimension join: a (normalized address → BBL) table
  * built offline, joined to incoming addresses.
  */
object Geocode {

  /** Reference's address normalization: concat house/street/borough parts
    * and trim (webserver/server.py:153-ish usage; C8 in SURVEY.md §2.6).
    */
  def normalizeAddress(parts: Column*): Column =
    upper(trim(regexp_replace(concat_ws(" ", parts: _*), "\\s+", " ")))

  /** Resolve addresses through a mapping dimension (left join — unresolved
    * addresses keep null BBL components, the reference's geocode-miss
    * path). The mapping side is broadcast: it is the small side by
    * construction.
    */
  def resolve(addresses: DataFrame, addrCol: String, mapping: DataFrame,
              mappingAddrCol: String, bbl10Col: String): DataFrame = {
    val m = broadcast(mapping.select(
      col(mappingAddrCol).as("__addr_key"), col(bbl10Col).as("__bbl10")))
    val (b, bl, lt) = KeyCodec.parseBbl10(col("__bbl10"))
    addresses
      .withColumn("__addr_key", normalizeAddress(col(addrCol)))
      .join(m, Seq("__addr_key"), "left")
      .withColumn("borough_code", b)
      .withColumn("block_code", bl)
      .withColumn("lot_code", lt)
      // gate on PARSE SUCCESS, not mere presence (r12): a malformed
      // bbl10 parses to null components, and concat_ws skips nulls —
      // the row would get bbl = "" (reads as resolved) with every key
      // column null. All-components-valid is the resolved contract.
      .withColumn("bbl",
        when(b.isNotNull && bl.isNotNull && lt.isNotNull,
          KeyCodec.formatBbl(b, bl, lt)))
      .drop("__addr_key", "__bbl10")
  }

  /** The LIVE-connector shape around [[resolve]]: a rate-limited,
    * cache-backed lookup against an external per-address geocode API (the
    * reference's Geoclient boundary, webserver/server.py:74-115).
    *
    * Design, and why each piece sits where it does:
    *
    *  - **The resolver runs on the DRIVER, never in a UDF.** An external
    *    per-request API inside an executor-side UDF would be called from
    *    every task with no global rate control, re-called on task retry
    *    and speculative duplicates, and would stall a whole stage on the
    *    API's latency. The driver loop is the single place a global
    *    QPS budget and at-most-once-per-key semantics can be enforced.
    *  - **Only distinct cache MISSES reach the API**, capped at
    *    `maxLookups` per batch — the driver collect is bounded by
    *    construction, and an address flood degrades to "some rows stay
    *    unresolved this batch" (they retry next batch), never to an
    *    unbounded driver loop.
    *  - **The cache is a plain parquet table** of (addr_key, bbl10) —
    *    appended after each batch, broadcast-joined like any mapping dim.
    *    Misses the API could not resolve are cached as null bbl10 so a
    *    dead address is not re-queried every batch. Existence is probed
    *    through the Hadoop FileSystem API for the path's scheme, so the
    *    cache can live on HDFS/S3, not just the local filesystem.
    *  - **At-most-once-per-key holds for SERIALIZED batches only**: the
    *    read-miss-append sequence is not atomic, so two CONCURRENT
    *    invocations sharing a cache path can both miss and double-query
    *    a key (the append itself stays consistent — parquet appends are
    *    additive and duplicate cache rows resolve identically). Run
    *    batches against one cache path sequentially.
    *  - **`resolver` is injected** (`normalized address => Option[bbl10]`;
    *    return None for API misses — cached as a permanent negative).
    *    The production implementation wraps an HTTP client with auth +
    *    retry; this sandbox has no egress, so specs inject a
    *    deterministic fake — the connector mechanics (dedup, cap,
    *    pacing, cache round-trip, quarantine) are what this class owns
    *    and tests.
    *  - **A resolver THROW quarantines the key, never aborts the batch**
    *    (the failure half the reference hits live: an unguarded failed
    *    geocode raises out of the request, webserver/server.py:461,468).
    *    A transient per-key failure (timeout, 5xx) must not take down a
    *    whole ingestion batch, and must NOT be cached either — a cached
    *    failure would never heal. The key is recorded in a sibling
    *    quarantine table (`<cachePath>_quarantine`: addr_key, error),
    *    its rows resolve as null THIS batch, and because it never
    *    entered the cache it is retried as a fresh miss next batch —
    *    fail → retry → converge. A failure storm degrades to "all keys
    *    quarantined, nothing cached", never a job abort.
    *
    * Returns the input resolved through the UPDATED cache via
    * [[resolve]]. Deterministic given the resolver and cache contents.
    */
  def resolveWithCache(addresses: DataFrame, addrCol: String,
                       cachePath: String, resolver: String => Option[String],
                       maxLookups: Int = 1000,
                       maxQps: Double = 10.0): DataFrame = {
    require(maxLookups >= 0 && maxQps > 0,
      "resolveWithCache needs maxLookups >= 0 and maxQps > 0")
    val spark = addresses.sparkSession
    val cacheSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("addr_key",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bbl10",
        org.apache.spark.sql.types.StringType)))
    // scheme-aware existence probe: java.io.File would read any
    // HDFS/S3/file:-URI cache as permanently absent (cache never
    // consulted, every key re-queried every batch)
    val hadoopPath = new org.apache.hadoop.fs.Path(cachePath)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def loadCache(): DataFrame =
      if (fs.exists(hadoopPath)) spark.read.parquet(cachePath)
      else spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), cacheSchema)
    val cache = loadCache()
    // distinct normalized misses, bounded BEFORE the driver collect
    val misses = addresses
      .select(normalizeAddress(col(addrCol)).as("addr_key"))
      .filter(col("addr_key").isNotNull && col("addr_key") =!= "")
      .distinct()
      .join(broadcast(cache.select(col("addr_key"))), Seq("addr_key"),
        "left_anti")
      .orderBy(col("addr_key")) // deterministic batch under the cap
      .limit(maxLookups)
      .collect().map(_.getString(0))
    if (misses.nonEmpty) {
      val minIntervalNanos = (1e9 / maxQps).toLong
      var nextAllowed = System.nanoTime()
      val failures =
        scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      val resolved = misses.flatMap { addr =>
        val wait = nextAllowed - System.nanoTime()
        if (wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
        // a failed attempt consumed an API call — it pays the QPS
        // budget like a success
        nextAllowed = System.nanoTime() + minIntervalNanos
        try Some(org.apache.spark.sql.Row(addr, resolver(addr).orNull))
        catch {
          case scala.util.control.NonFatal(e) =>
            failures += org.apache.spark.sql.Row(addr,
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
            None
        }
      }
      if (resolved.nonEmpty)
        spark.createDataFrame(
            java.util.Arrays.asList(resolved: _*), cacheSchema)
          .write.mode("append").parquet(cachePath)
      if (failures.nonEmpty)
        spark.createDataFrame(
            java.util.Arrays.asList(failures.toSeq: _*), quarantineSchema)
          .write.mode("append").parquet(quarantinePath(cachePath))
    }
    // duplicate cache keys happen (two concurrent invocations both
    // missing the same key append one row each — the documented race);
    // without the dedup every later batch would emit each such
    // address's rows TWICE through the join, forever
    resolve(addresses, addrCol,
      loadCache().dropDuplicates("addr_key"), "addr_key", "bbl10")
  }

  private def quarantinePath(cachePath: String): String =
    cachePath.stripSuffix("/") + "_quarantine"

  private val quarantineSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("addr_key",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("error",
      org.apache.spark.sql.types.StringType)))

  /** The quarantine record beside a cache: every (addr_key, error) a
    * resolver throw produced, append-per-batch — the ops view of what
    * keeps failing. A key appearing here and later in the cache HEALED
    * (its retry converged); empty when the cache has never seen a
    * resolver failure. */
  def quarantine(spark: org.apache.spark.sql.SparkSession,
                 cachePath: String): DataFrame = {
    val p = quarantinePath(cachePath)
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(p)))
      spark.read.parquet(p)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), quarantineSchema)
  }
}
