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
    *    return None for API misses, throw for transport errors — a throw
    *    aborts the batch before the cache is written). The production
    *    implementation wraps an HTTP client with auth + retry; this
    *    sandbox has no egress, so specs inject a deterministic fake —
    *    the connector mechanics (dedup, cap, pacing, cache round-trip)
    *    are what this class owns and tests.
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
      val resolved = misses.map { addr =>
        val wait = nextAllowed - System.nanoTime()
        if (wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
        nextAllowed = System.nanoTime() + minIntervalNanos
        org.apache.spark.sql.Row(addr, resolver(addr).orNull)
      }
      spark.createDataFrame(
          java.util.Arrays.asList(resolved: _*), cacheSchema)
        .write.mode("append").parquet(cachePath)
    }
    // duplicate cache keys happen (two concurrent invocations both
    // missing the same key append one row each — the documented race);
    // without the dedup every later batch would emit each such
    // address's rows TWICE through the join, forever
    resolve(addresses, addrCol,
      loadCache().dropDuplicates("addr_key"), "addr_key", "bbl10")
  }
}
