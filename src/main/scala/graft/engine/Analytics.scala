package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** The reference's three entry flows (SURVEY.md §3) as pure transforms over
  * NYC-shaped frames — what a user of the reference would call instead of
  * its Flask routes. Column names follow schema.sql; date window bounds are
  * optional exactly like the reference's dynamically-built predicates
  * (webserver/server.py:156-167).
  *
  * Scale shape: each flow scans each fact table ONCE per request (the
  * reference issues 4-5 sequential SQL queries, webserver/server.py:130-256)
  * and `compare`/`bookmarks` handle all keys in a single pass instead of
  * re-running the stack per key (server.py:456-473, 561-580).
  */
object Analytics {

  /** Reference status domain + active subset (schema.sql:73,
    * webserver/server.py:172).
    */
  val ActiveStatuses: Seq[String] = Seq("Open", "Pending", "In Progress")

  case class Window(start: Option[String], end: Option[String])
  object Window {
    /** Reference default dashboard window (webserver/server.py:392-395). */
    val default: Window = Window(Some("2024-01-01"), Some("2024-12-31"))
    val allTime: Window = Window(None, None)
  }

  private def windowed(df: DataFrame, dateCol: String, w: Window): DataFrame =
    Filters.dateWindow(df, dateCol, w.start, w.end)

  /** Geo point lookup: natural key → geographic_id row; empty frame = the
    * reference's 404 (webserver/server.py:135-149).
    */
  def geoLookup(geo: DataFrame, borough: Int, block: Int, lot: Int): DataFrame =
    Filters.naturalKey(geo, Map(
      "borough_code" -> borough, "block_code" -> block, "lot_code" -> lot))

  /** §3.1 dashboard, service-request side: totals + per-complaint-type
    * breakdown + top-5+Other chart reduction, one fact scan
    * (webserver/server.py:170-200, 411-419).
    */
  def requestTotals(sr: DataFrame, geoId: Long, w: Window): DataFrame =
    Aggregates.totals(
      windowed(sr.filter(col("geographic_id") === geoId), "created_date", w),
      "status", ActiveStatuses)

  def requestsByType(sr: DataFrame, complaintTypes: DataFrame, geoId: Long,
                     w: Window): DataFrame =
    // LEFT join + Unknown bucket (r12): the reference's DB enforces
    // the FK, this engine does not — an inner join silently dropped
    // requests whose type id misses the dimension, breaking the
    // by-type-sums-to-total invariant one step above topNPlusOther's
    // carefully preserved grand total. On FK-clean data the two joins
    // are row-identical.
    Aggregates.groupCounts(
      windowed(sr.filter(col("geographic_id") === geoId), "created_date", w)
        .join(broadcast(complaintTypes), Seq("complaint_type_id"), "left")
        .withColumn("complaint_type_name",
          coalesce(col("complaint_type_name"), lit("Unknown"))),
      "complaint_type_name", "status", ActiveStatuses)

  def complaintChart(byType: DataFrame): DataFrame =
    TopK.topNPlusOther(byType, "complaint_type_name", 5)

  /** §3.1 dashboard, sales side: detail listing (date-desc) + stats with
    * the empty→0 contract (webserver/server.py:203-240).
    */
  def salesListing(sale: DataFrame, property: DataFrame, geoId: Long,
                   w: Window, limit: Int = 10): DataFrame =
    windowed(
      sale.join(property.filter(col("geographic_id") === geoId), Seq("property_id")),
      "sale_date", w)
      .select(col("property_address"), col("apartment_number"),
        col("sale_price"), col("sale_date"))
      .orderBy(col("sale_date").desc, col("sale_price").desc)
      .limit(limit)

  def salesStats(sale: DataFrame, property: DataFrame, geoId: Long,
                 w: Window): DataFrame =
    Aggregates.priceStats(
      windowed(
        sale.join(property.filter(col("geographic_id") === geoId), Seq("property_id")),
        "sale_date", w),
      "sale_price")

  /** The full §3.1 dashboard as one call — every frame the reference's
    * `/analytics/<bbl>` route assembles from 4–5 sequential SQL queries
    * (webserver/server.py:383-432), here as lazily-planned transforms over
    * at most one scan per fact table.
    */
  case class Dashboard(geoId: Long, requestTotals: DataFrame,
                       requestsByType: DataFrame, complaintChart: DataFrame,
                       salesListing: DataFrame, salesStats: DataFrame)

  /** Returns None for an unknown BBL (the reference's 404,
    * server.py:148-149).
    */
  def dashboard(geo: DataFrame, sr: DataFrame, complaintTypes: DataFrame,
                sale: DataFrame, property: DataFrame,
                borough: Int, block: Int, lot: Int,
                w: Window = Window.default): Option[Dashboard] =
    // select the key column by NAME before the 1-row collect: a caller's
    // geo frame with a different column order must not yield a wrong id
    geoLookup(geo, borough, block, lot).select(col("geographic_id"))
      .collect().headOption.map { row =>
      val geoId = row.getAs[Long]("geographic_id")
      val byType = requestsByType(sr, complaintTypes, geoId, w)
      Dashboard(geoId,
        requestTotals(sr, geoId, w),
        byType,
        complaintChart(byType),
        salesListing(sale, property, geoId, w),
        salesStats(sale, property, geoId, w))
    }

  /** §3.2 trends: month-bucketed series with spine gap fill — zero-filled
    * counts, null medians for empty months (webserver/server.py:259-342).
    * Requires both bounds (the reference always defaults them, :482-483).
    */
  def requestTrend(spark: SparkSession, sr: DataFrame, geoId: Long,
                   start: String, end: String): DataFrame = {
    val agg = TimeSeries.monthly(
      windowed(sr.filter(col("geographic_id") === geoId), "created_date",
        Window(Some(start), Some(end))),
      "created_date", Seq(count(lit(1)).as("count")))
    TimeSeries.gapFill(TimeSeries.monthSpine(spark, start, end), agg, Seq("count"))
  }

  def salesTrend(spark: SparkSession, sale: DataFrame, property: DataFrame,
                 geoId: Long, start: String, end: String): DataFrame = {
    val agg = TimeSeries.monthly(
      windowed(
        sale.join(property.filter(col("geographic_id") === geoId), Seq("property_id")),
        "sale_date", Window(Some(start), Some(end))),
      "sale_date",
      Seq(Aggregates.exactMedianMoney(col("sale_price")).as("median_price"),
        count(lit(1)).as("count")))
    TimeSeries.gapFill(TimeSeries.monthSpine(spark, start, end), agg, Seq("count"))
  }

  /** §3.3 compare — N geographic keys, one pass over each fact
    * (vs the reference's full re-run per key, webserver/server.py:456-473).
    */
  def compareRequests(sr: DataFrame, geoIds: Seq[Long], w: Window): DataFrame =
    Compare.sideBySide(windowed(sr, "created_date", w), "geographic_id",
      geoIds,
      Seq(count(lit(1)).as("total_count"),
        sum(when(col("status").isin(ActiveStatuses: _*), 1L).otherwise(0L))
          .as("active_count")))

  /** §3.3 compare by natural keys, resolution included. The reference uses
    * its geocode result UNGUARDED — an unknown address raises mid-request
    * (webserver/server.py:461-468) — and `parse_bbl` misses 404 similarly.
    * The engine pins the graceful contract instead: keys are resolved in
    * ONE dimension scan and unresolved ones are simply absent from the
    * result (both unknown → empty frame), the same silent-absence rule as
    * [[bookmarkSummaries]].
    */
  def compareByKeys(geo: DataFrame, sr: DataFrame, keys: Seq[(Int, Int, Int)],
                    w: Window = Window.default): DataFrame = {
    val keyPred = keys.map { case (b, bl, lt) =>
      col("borough_code") === b && col("block_code") === bl && col("lot_code") === lt
    }.reduceOption(_ || _).getOrElse(lit(false))
    val ids = geo.filter(keyPred).select(col("geographic_id"))
      .collect().map(_.getAs[Long]("geographic_id")).toSeq
    compareRequests(sr, ids, w)
  }

  /** T2 bookmarks fan-out: saved keys, all-time window
    * (webserver/server.py:561-580). Unknown keys are silently absent.
    */
  def bookmarkSummaries(sr: DataFrame, geoIds: Seq[Long]): DataFrame =
    compareRequests(sr, geoIds, Window.allTime)
}
