package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

import graft.engine.Tables
import graft.operators._

/** Driver contract — one named query per implemented operator from
  * SURVEY.md §2, each with equivalent DuckDB oracle SQL.
  *
  * The reference's domain roles map onto the driver tables per FIXTURES.md:
  * `nation`/`region` play `Geographic_Area` (dimension point lookup),
  * `orders ⋈ customer` plays `Sale ⋈ Property` (priced dated fact ⋈ dim,
  * `o_orderstatus` plays `status` with active set {'O','P'} standing in for
  * {'Open','Pending','In Progress'}, reference webserver/server.py:172), and
  * `lineitem ⋈ part` plays `Service_Request ⋈ Complaint_Type`.
  */
object SparkEntry {

  // Default analysis window — plays the reference's default 2024 dashboard
  // window (webserver/server.py:392-395) over the driver data's date range.
  private val W0 = "1996-01-01"
  private val W1 = "1996-12-31"
  private val ACTIVE = Seq("O", "P")

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** `orders ⋈ customer ⋈ nation` restricted to a nation-name key set —
    * the "resolve key once, scan facts once" shape (SURVEY.md §3.1). The
    * nation dim is broadcast; customer joins under AQE's choice.
    */
  private def ordersOf(spark: SparkSession, dir: String, nations: Seq[String],
                       windowed: Boolean): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = broadcast(t(spark, dir, "nation").filter(col("n_name").isin(nations: _*)))
    val fact =
      if (windowed) Filters.dateWindow(o, "o_orderdate", Some(W0), Some(W1)) else o
    fact
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
  }

  private val oracleOrdersOf =
    """FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey""".stripMargin.replace("\n", " ")
  private val oracleWindow =
    "o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'"

  /** Flagship: the analytics-dashboard group-by (reference
    * webserver/server.py:183-200) on sf0.001. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_group_counts")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(

    // S1+F1+J1: dimension natural-key point lookup (server.py:135-144)
    "q01_dim_lookup" -> ((s, d) => {
      Filters.naturalKey(t(s, d, "nation"), Map("n_name" -> "NATION_19"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
    }),

    // S2+F2+F3+P1+O2+O5: windowed fact listing, date-desc, top-10
    // (server.py:203-218 + analytics.html:252)
    "q02_recent_listing" -> ((s, d) => {
      ordersOf(s, d, Seq("NATION_19"), windowed = true)
        .select(col("o_orderkey"), col("c_name"),
          round(col("o_totalprice"), 2).as("price"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy(col("order_date").desc, col("o_orderkey"))
        .limit(10)
    }),

    // A1+A2+F4: global count + conditional active count (server.py:170-180)
    "q03_totals_conditional" -> ((s, d) =>
      Aggregates.totals(ordersOf(s, d, Seq("NATION_19"), windowed = true),
        "o_orderstatus", ACTIVE)),

    // A3+O1: per-group counts, count-desc + name tiebreak (server.py:183-200)
    "q04_group_counts" -> ((s, d) =>
      Aggregates.groupCounts(ordersOf(s, d, Seq("NATION_19"), windowed = true),
        "o_orderpriority", "o_orderstatus", ACTIVE)),

    // A4+A5+A8+A9: exact median/min/max with empty→0 (server.py:221-240)
    "q05_price_stats" -> ((s, d) =>
      Aggregates.priceStats(ordersOf(s, d, Seq("NATION_19"), windowed = true),
        "o_totalprice")),

    // A9 corner: empty input still yields one row of zeros (server.py:237-240)
    "q05b_price_stats_empty" -> ((s, d) =>
      Aggregates.priceStats(
        ordersOf(s, d, Seq("NO SUCH NATION"), windowed = true), "o_totalprice")),

    // A6+C1+C3: calendar-month rollup (server.py:281-289)
    "q06_monthly_counts" -> ((s, d) =>
      TimeSeries.monthly(ordersOf(s, d, Seq("NATION_19"), windowed = true),
        "o_orderdate", Seq(count(lit(1)).as("n")))),

    // J3+C5: month-spine gap fill, zero counts / null medians
    // (server.py:319-341)
    "q07_month_gap_fill" -> ((s, d) => {
      val agg = TimeSeries.monthly(
        ordersOf(s, d, Seq("NATION_19"), windowed = true), "o_orderdate",
        Seq(count(lit(1)).as("n"),
          Aggregates.exactMedianMoney(col("o_totalprice")).as("median_price")))
      TimeSeries.gapFill(TimeSeries.monthSpine(s, W0, W1), agg, Seq("n"))
    }),

    // A7+O4: top-5 + "Other" residual over lineitem ⋈ part brands
    // (server.py:411-419)
    "q08_topk_other" -> ((s, d) => {
      val li = Filters.dateWindow(t(s, d, "lineitem"), "l_shipdate", Some(W0), Some(W1))
      val grouped = li
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("total_count"))
      TopK.topNPlusOther(grouped, "p_brand", 5)
    }),

    // J4: two-key compare in one fact pass (server.py:456-473)
    "q09_compare" -> ((s, d) =>
      Compare.sideBySide(
        ordersOf(s, d, Seq("NATION_19", "NATION_11"), windowed = true),
        "n_name", Seq("NATION_19", "NATION_11"),
        Seq(count(lit(1)).as("total_count"),
          sum(when(col("o_orderstatus").isin(ACTIVE: _*), 1L).otherwise(0L))
            .as("active_count"),
          Aggregates.exactMedianMoney(col("o_totalprice")).as("median_price")))),

    // T2: bookmark fan-out as one IN-list pass, all-time window, unknown
    // keys silently absent (server.py:561-580)
    "q10_bookmarks" -> ((s, d) =>
      Compare.sideBySide(
        ordersOf(s, d, Seq("NATION_10", "NATION_20", "ATLANTIS"), windowed = false),
        "n_name", Seq("NATION_10", "NATION_20", "ATLANTIS"),
        Seq(count(lit(1)).as("total_count"),
          Aggregates.exactMedianMoney(col("o_totalprice")).as("median_price")))),

    // C6+C7+C8: BBL-style fixed-width format + parse round trip
    // (server.py:104-127)
    "q11_key_scalars" -> ((s, d) => {
      val c = t(s, d, "customer")
      val borough = (col("c_nationkey") % 9 + 1).cast("int")
      val block = (col("c_custkey") % 100000).cast("int")
      val lot = ((col("c_custkey") * 7) % 10000).cast("int")
      c.select(col("c_custkey"),
          concat_ws("-", borough, lpad(block.cast("string"), 5, "0"),
            lpad(lot.cast("string"), 4, "0")).as("bbl"),
          concat(borough.cast("string"), lpad(block.cast("string"), 5, "0"),
            lpad(lot.cast("string"), 4, "0")).as("bbl10"))
        .withColumn("p_borough", substring(col("bbl10"), 1, 1).cast("int"))
        .withColumn("p_block", substring(col("bbl10"), 2, 5).cast("int"))
        .withColumn("p_lot", substring(col("bbl10"), 7, 4).cast("int"))
        .orderBy(col("c_custkey"))
    }),

    // F5: check-constraint validation split with violation tagging
    // (schema.sql:31-35,43-44,70-73)
    "q12_validation_split" -> ((s, d) => {
      val checks = Seq(
        "price_pos" -> (col("o_totalprice") > 0),
        "date_bound" -> (col("o_orderdate") <= to_timestamp(lit("2000-12-31"))),
        "status_domain" -> col("o_orderstatus").isin("F", "O", "P"))
      Filters.validate(t(s, d, "orders"), checks)
        .groupBy(col("is_valid"), coalesce(col("violation"), lit("")).as("violation"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("is_valid"), col("violation"))
    }),

    // A1-A3 at fact scale: pricing rollup with decimal-exact sums so the
    // result is bit-deterministic across engines and partitionings
    "q13_pricing_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"),
          round(sum(col("l_discount").cast("decimal(18,6)")).cast("double")
            / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  )

  def oracleSql: Map[String, String] = ListMap(
    "q01_dim_lookup" ->
      """SELECT n_nationkey, n_name, r_name FROM nation
        |JOIN region ON n_regionkey = r_regionkey WHERE n_name = 'NATION_19'"""
        .stripMargin.replace("\n", " "),

    "q02_recent_listing" ->
      s"""SELECT o_orderkey, c_name, round(o_totalprice, 2) AS price,
         |strftime(o_orderdate, '%Y-%m-%d') AS order_date
         |$oracleOrdersOf
         |WHERE n_name = 'NATION_19' AND $oracleWindow
         |ORDER BY order_date DESC, o_orderkey LIMIT 10"""
        .stripMargin.replace("\n", " "),

    "q03_totals_conditional" ->
      s"""SELECT count(*) AS total_count,
         |CAST(coalesce(sum(CASE WHEN o_orderstatus IN ('O','P') THEN 1 ELSE 0 END), 0) AS BIGINT) AS active_count
         |$oracleOrdersOf WHERE n_name = 'NATION_19' AND $oracleWindow"""
        .stripMargin.replace("\n", " "),

    "q04_group_counts" ->
      s"""SELECT o_orderpriority, count(*) AS total_count,
         |CAST(sum(CASE WHEN o_orderstatus IN ('O','P') THEN 1 ELSE 0 END) AS BIGINT) AS active_count
         |$oracleOrdersOf WHERE n_name = 'NATION_19' AND $oracleWindow
         |GROUP BY o_orderpriority ORDER BY total_count DESC, o_orderpriority"""
        .stripMargin.replace("\n", " "),

    "q05_price_stats" ->
      s"""SELECT coalesce(quantile_cont(round(o_totalprice*100), 0.5)/100, 0.0) AS median_price,
         |coalesce(round(min(o_totalprice), 2), 0.0) AS min_price,
         |coalesce(round(max(o_totalprice), 2), 0.0) AS max_price,
         |count(*) AS num_sales
         |$oracleOrdersOf WHERE n_name = 'NATION_19' AND $oracleWindow"""
        .stripMargin.replace("\n", " "),

    "q05b_price_stats_empty" ->
      s"""SELECT coalesce(quantile_cont(round(o_totalprice*100), 0.5)/100, 0.0) AS median_price,
         |coalesce(round(min(o_totalprice), 2), 0.0) AS min_price,
         |coalesce(round(max(o_totalprice), 2), 0.0) AS max_price,
         |count(*) AS num_sales
         |$oracleOrdersOf WHERE n_name = 'NO SUCH NATION' AND $oracleWindow"""
        .stripMargin.replace("\n", " "),

    "q06_monthly_counts" ->
      s"""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         |count(*) AS n
         |$oracleOrdersOf WHERE n_name = 'NATION_19' AND $oracleWindow
         |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "),

    "q07_month_gap_fill" ->
      s"""WITH spine AS (
         |  SELECT strftime(m, '%Y-%m') AS month FROM
         |  (SELECT unnest(generate_series(TIMESTAMP '1996-01-01',
         |    TIMESTAMP '1996-12-31', INTERVAL 1 MONTH)) AS m)
         |), agg AS (
         |  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         |  count(*) AS n, quantile_cont(round(o_totalprice*100), 0.5)/100 AS median_price
         |  $oracleOrdersOf WHERE n_name = 'NATION_19' AND $oracleWindow GROUP BY 1
         |)
         |SELECT s.month, CAST(coalesce(a.n, 0) AS BIGINT) AS n, a.median_price
         |FROM spine s LEFT JOIN agg a USING (month) ORDER BY s.month"""
        .stripMargin.replace("\n", " "),

    "q08_topk_other" ->
      """WITH g AS (
        |  SELECT p_brand, count(*) AS total_count
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1
        |), r AS (
        |  SELECT p_brand, total_count,
        |  row_number() OVER (ORDER BY total_count DESC, p_brand) AS rn FROM g
        |)
        |SELECT CASE WHEN rn <= 5 THEN p_brand ELSE 'Other' END AS bucket,
        |CAST(sum(total_count) AS BIGINT) AS total_count
        |FROM r GROUP BY 1 ORDER BY min(rn)""".stripMargin.replace("\n", " "),

    "q09_compare" ->
      s"""SELECT n_name, count(*) AS total_count,
         |CAST(sum(CASE WHEN o_orderstatus IN ('O','P') THEN 1 ELSE 0 END) AS BIGINT) AS active_count,
         |quantile_cont(round(o_totalprice*100), 0.5)/100 AS median_price
         |$oracleOrdersOf
         |WHERE n_name IN ('NATION_19','NATION_11') AND $oracleWindow
         |GROUP BY n_name ORDER BY n_name""".stripMargin.replace("\n", " "),

    "q10_bookmarks" ->
      s"""SELECT n_name, count(*) AS total_count,
         |quantile_cont(round(o_totalprice*100), 0.5)/100 AS median_price
         |$oracleOrdersOf
         |WHERE n_name IN ('NATION_10','NATION_20','ATLANTIS')
         |GROUP BY n_name ORDER BY n_name""".stripMargin.replace("\n", " "),

    "q11_key_scalars" ->
      """SELECT c_custkey,
        |concat_ws('-', b, bl, lt) AS bbl,
        |concat(b, bl, lt) AS bbl10,
        |CAST(substr(concat(b, bl, lt), 1, 1) AS INTEGER) AS p_borough,
        |CAST(substr(concat(b, bl, lt), 2, 5) AS INTEGER) AS p_block,
        |CAST(substr(concat(b, bl, lt), 7, 4) AS INTEGER) AS p_lot
        |FROM (
        |  SELECT c_custkey,
        |  CAST(c_nationkey % 9 + 1 AS VARCHAR) AS b,
        |  lpad(CAST(c_custkey % 100000 AS VARCHAR), 5, '0') AS bl,
        |  lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0') AS lt
        |  FROM customer
        |) ORDER BY c_custkey""".stripMargin.replace("\n", " "),

    "q12_validation_split" ->
      """SELECT is_valid, violation, count(*) AS n FROM (
        |  SELECT
        |  (o_totalprice > 0 AND o_orderdate <= TIMESTAMP '2000-12-31'
        |   AND o_orderstatus IN ('F','O','P')) AS is_valid,
        |  CASE WHEN NOT o_totalprice > 0 THEN 'price_pos'
        |       WHEN NOT o_orderdate <= TIMESTAMP '2000-12-31' THEN 'date_bound'
        |       WHEN NOT o_orderstatus IN ('F','O','P') THEN 'status_domain'
        |       ELSE '' END AS violation
        |  FROM orders
        |) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " "),

    "q13_pricing_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
        |count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")
  )
}
