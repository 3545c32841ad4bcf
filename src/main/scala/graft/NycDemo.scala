package graft

import graft.engine.{Analytics, NycFixtures, Tables}
import graft.engine.Analytics.Window

/** Runnable walkthrough of the reference-equivalent API surface — the flows
  * a user of the reference (its Flask routes, SURVEY.md §3) would call:
  * dashboard (analytics/<bbl>), trends, compare, bookmarks.
  *
  * `sbt "runMain graft.NycDemo"`
  */
object NycDemo {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session(master = "local[4]", shufflePartitions = 4)
    val geo = NycFixtures.geo(spark)
    val sr = NycFixtures.serviceRequests(spark)
    val ct = NycFixtures.complaintTypes(spark)
    val prop = NycFixtures.properties(spark)
    val sale = NycFixtures.sales(spark)
    val w = Window.default

    println("== geo lookup (1,42,7) — GET /analytics/1-42-7")
    geo.show(false)
    val geoId = Analytics.geoLookup(geo, 1, 42, 7)
      .select(org.apache.spark.sql.functions.col("geographic_id"))
      .collect().headOption.map(_.getAs[Long]("geographic_id"))
      .getOrElse(sys.error("404: unknown BBL"))

    println(s"== dashboard for geographic_id=$geoId, window $w")
    Analytics.requestTotals(sr, geoId, w).show(false)
    Analytics.requestsByType(sr, ct, geoId, w).show(false)
    Analytics.complaintChart(Analytics.requestsByType(sr, ct, geoId, w)).show(false)
    Analytics.salesListing(sale, prop, geoId, w).show(false)
    Analytics.salesStats(sale, prop, geoId, w).show(false)

    println("== trends — GET /trends/1-42-7")
    Analytics.requestTrend(spark, sr, geoId, "2024-01-01", "2024-06-30").show(false)
    Analytics.salesTrend(spark, sale, prop, geoId, "2024-01-01", "2024-04-30").show(false)

    println("== compare — POST /compare (101 vs 102, one pass)")
    Analytics.compareRequests(sr, Seq(101L, 102L), w).show(false)

    println("== compare by natural keys (one unknown → gracefully absent)")
    Analytics.compareByKeys(geo, sr, Seq((1, 42, 7), (9, 9, 9)), w).show(false)

    println("== bookmarks — GET /bookmarks (all-time, unknown key skipped)")
    Analytics.bookmarkSummaries(sr, Seq(101L, 102L, 999L)).show(false)

    println("== bookmark toggle state (session list semantics)")
    val toggled = Seq("1-42-7", "3-100-55", "1-42-7")
      .foldLeft(Seq.empty[String])(graft.engine.Bookmarks.toggle)
    println(s"after toggles: $toggled")

    println("== geocode via mapping-dim join — POST /search")
    import spark.implicits._
    val mapping = Seq(("1 MAIN ST", "1000420007")).toDF("addr", "bbl10")
    graft.engine.Geocode.resolve(
      Seq("1 Main  St", "5 Nowhere Rd").toDF("address"),
      "address", mapping, "addr", "bbl10").show(false)

    println("== ingest format matrix: JSONL in -> validate -> ORC out")
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    import graft.sources.Ingest
    val tmp = java.nio.file.Files.createTempDirectory("graft_demo_fmt")
    java.nio.file.Files.writeString(tmp.resolve("sales.jsonl"),
      "{\"sale_id\": 1, \"sale_price\": 100.5}\n{\"sale_id\": 2, \"sale_price\": -7.0}\n")
    val raw = Ingest.readJsonl(spark, s"$tmp/sales.jsonl",
      StructType(Seq(StructField("sale_id", LongType),
        StructField("sale_price", DoubleType))))
    val (ok, bad) = Ingest.validateSplit(raw,
      Seq("price_pos" -> (col("sale_price") > 0)))
    Ingest.writeOrc(ok, s"$tmp/orc")
    Ingest.readOrc(spark, s"$tmp/orc").show(false)
    bad.show(false)

    println("== custom expressions from SQL (GraftExtensions)")
    GraftExtensions.register(spark)
    spark.sql(
      """SELECT simhash64(array('spark','engine')) AS simhash,
        |size(minhash_signature(array('spark','engine'), 32)) AS sig_len,
        |size(winnow_fingerprints('the quick brown fox jumps', 8, 4)) AS n_fp"""
        .stripMargin).show(false)

    spark.stop()
  }
}
