package graft.engine

import java.sql.Date
import org.apache.spark.sql.{DataFrame, SparkSession}

/** NYC-domain micro-fixtures per FIXTURES.md §B — tiny frames matching the
  * reference's schema.sql shapes, exercising the semantic corners with
  * known answers.
  */
object NycFixtures {
  private def d(s: String): Date = Date.valueOf(s)

  /** Two real BBLs + one with zero facts (the 404/empty path). */
  def geo(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (101L, "Manhattan", 1, 42, 7),
      (102L, "Brooklyn", 3, 100, 55),
      (103L, "Queens", 4, 999, 1)
    ).toDF("geographic_id", "borough_name", "borough_code", "block_code", "lot_code")
  }

  /** All 5 statuses; ≥7 complaint types on BBL 101 (forces top-5+Other);
    * March 2024 fully empty inside the window (gap-fill corner).
    */
  def serviceRequests(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val base = Seq(
      // (id, geo, typeId, created, status)
      (1, 101L, 1, "2024-01-05", "Open"),
      (2, 101L, 1, "2024-01-06", "Closed"),
      (3, 101L, 1, "2024-01-07", "Open"),
      (4, 101L, 2, "2024-01-08", "Pending"),
      (5, 101L, 2, "2024-02-01", "In Progress"),
      (6, 101L, 3, "2024-02-02", "Cancelled"),
      (7, 101L, 3, "2024-02-03", "Closed"),
      (8, 101L, 4, "2024-04-01", "Open"),
      (9, 101L, 4, "2024-04-02", "Closed"),
      (10, 101L, 5, "2024-04-03", "Open"),
      (11, 101L, 6, "2024-05-01", "Closed"),
      (12, 101L, 7, "2024-05-02", "Open"),
      (13, 101L, 8, "2024-05-03", "Closed"),
      // BBL 102: small
      (14, 102L, 1, "2024-01-15", "Open"),
      (15, 102L, 2, "2024-06-15", "Closed"),
      // outside default window
      (16, 101L, 1, "2023-12-31", "Open"),
      (17, 101L, 1, "2025-01-01", "Open"))
    base.map { case (id, g, t, dt, st) => (id, g, t, d(dt), st) }
      .toDF("service_request_id", "geographic_id", "complaint_type_id",
        "created_date", "status")
  }

  def complaintTypes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (1 to 8).map(i => (i, s"Type_$i"))
      .toDF("complaint_type_id", "complaint_type_name")
  }

  def properties(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (201, 101L, "1 Main St", "1A"),
      (202, 101L, "1 Main St", "2B"),
      (203, 102L, "9 Ocean Ave", ""))
      .toDF("property_id", "geographic_id", "property_address", "apartment_number")
  }

  /** BBL 101: 4 sales in-window (even count → interpolated median); BBL 102
    * zero sales in 2024 (empty stats → zeros); Feb empty for sales trend.
    */
  def sales(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (301, 201, 100000.00, "2024-01-10"),
      (302, 201, 250000.50, "2024-01-20"),
      (303, 202, 300000.00, "2024-03-15"),
      (304, 202, 175000.25, "2024-04-01"),
      (305, 203, 999999.00, "2023-06-01") // out of default window
    ).map { case (id, p, pr, dt) => (id, p, pr, d(dt)) }
      .toDF("sale_id", "property_id", "sale_price", "sale_date")
  }
}
