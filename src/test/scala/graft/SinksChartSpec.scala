package graft

import org.apache.spark.sql.functions._

import graft.operators.Sinks

/** The static-SVG chart face (the engine-side render of the reference's
  * Chart.js dashboards — analytics.html pie + trend lines): geometry
  * sanity, escaping, and the loud presentation contracts.
  */
class SinksChartSpec extends SparkSpec {
  import spark.implicits._

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)), "UTF-8")

  test("pieSvg: one path per positive slice, angles sum to the circle, " +
       "degenerate single-slice renders a full circle, bad input loud") {
    val svg = Sinks.pieSvg(Seq("a" -> 1.0, "b" -> 1.0, "c" -> 2.0))
    assert(svg.count(_ == 'A') == 3, "three arc paths")
    // the 50% slice ("c") must use the small-arc flag 0 at exactly pi,
    // and a >50% slice the large flag
    val large = Sinks.pieSvg(Seq("big" -> 3.0, "small" -> 1.0))
    assert(large.contains(" 1 1 "), "270-degree slice takes large-arc=1")
    val full = Sinks.pieSvg(Seq("all" -> 5.0, "none" -> 0.0))
    assert(full.contains("<circle") && !full.contains("<path"),
      "a whole-circle slice renders as a circle, not a zero-length arc")
    intercept[IllegalArgumentException] {
      Sinks.pieSvg(Seq("neg" -> -1.0))
    }
    intercept[IllegalArgumentException] {
      Sinks.pieSvg(Seq("zero" -> 0.0))
    }
    // an infinite slice satisfies >= 0 and == its infinite total, so an
    // unchecked path would draw it as 100% of the pie while the legend
    // lists the rest — refuse like lineSvg does
    intercept[IllegalArgumentException] {
      Sinks.pieSvg(Seq("inf" -> Double.PositiveInfinity, "b" -> 5.0))
    }
  }

  test("lineSvg: one polyline per series, points within the plot box, " +
       "labels escaped, gaps and ragged series loud") {
    val xs = Seq("2024-01", "2024-<02>", "2024-03")
    val svg = Sinks.lineSvg(xs,
      Seq("sales & fees" -> Seq(1.0, 5.0, 3.0), "b" -> Seq(2.0, 2.0, 2.0)))
    assert(svg.count(_ == '\n') > 0)
    assert("<polyline".r.findAllIn(svg).size == 2)
    assert(svg.contains("2024-&lt;02&gt;"), "x labels escaped")
    assert(!svg.contains("<02>"), "raw markup never passes through")
    // constant series: the padded y-range keeps it mid-box, not NaN
    assert(!svg.contains("NaN"))
    intercept[IllegalArgumentException] {
      Sinks.lineSvg(xs, Seq("short" -> Seq(1.0, 2.0)))
    }
    intercept[IllegalArgumentException] {
      Sinks.lineSvg(xs, Seq("gap" -> Seq(1.0, Double.NaN, 3.0)))
    }
    intercept[IllegalArgumentException] {
      Sinks.lineSvg(Seq("one"), Seq("a" -> Seq(1.0)))
    }
  }

  test("writeChartHtml: pie (the q08 top-5+Other shape) and line (the " +
       "q06 monthly shape) embed escaped SVG + legend + the data table; " +
       "nulls and oversize loud") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_chart").toString
    val pie = Seq(("Noise <residential>", 120L), ("Heat & hot water", 80L),
      ("Other", 40L)).toDF("Complaint Type", "Total Count")
    Sinks.writeChartHtml(pie, s"$tmp/pie.html", "pie",
      "Complaint Type", Seq("Total Count"), title = "Top complaints")
    val ph = read(s"$tmp/pie.html")
    assert(ph.contains("<svg") && ph.count(_ == 'A') >= 3)
    assert(ph.contains("Noise &lt;residential&gt;"), "legend escaped")
    assert(ph.contains("Heat &amp; hot water"))
    assert(!ph.contains("Noise <residential>"), "no raw markup anywhere")
    assert(ph.contains("<td>120</td>"), "the data table rides along")

    val line = Seq(("2024-01", 10L, 1L), ("2024-02", 12L, 2L),
      ("2024-03", 9L, 3L)).toDF("month", "requests", "sales")
    Sinks.writeChartHtml(line, s"$tmp/line.html", "line",
      "month", Seq("requests", "sales"))
    val lh = read(s"$tmp/line.html")
    assert("<polyline".r.findAllIn(lh).size == 2, "one polyline per series")
    assert(lh.contains("2024-02"), "x labels present")
    assert(lh.contains("requests") && lh.contains("sales"),
      "series legend from column names")

    val withNull = Seq(("a", Some(1L)), ("b", None))
      .toDF("month", "requests")
    val e = intercept[IllegalArgumentException] {
      Sinks.writeChartHtml(withNull, s"$tmp/bad.html", "line",
        "month", Seq("requests"))
    }
    assert(e.getMessage.contains("gap-fill"),
      "charts refuse holes loudly instead of drawing a lie")
    intercept[IllegalArgumentException] {
      Sinks.writeChartHtml(
        spark.range(0, 50).select(col("id").cast("string").as("x"),
          col("id").as("y")),
        s"$tmp/big.html", "line", "x", Seq("y"), maxRows = 10)
    }
    intercept[IllegalArgumentException] {
      Sinks.writeChartHtml(pie, s"$tmp/two.html", "pie",
        "Complaint Type", Seq("Total Count", "Total Count"))
    }
  }

  test("the q08 frame itself renders: top-5+Other from sf0.001 events " +
       "through the pie face end-to-end") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val top = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("event_type")).limit(5)
    val tmp = java.nio.file.Files.createTempDirectory("graft_chart").toString
    Sinks.writeChartHtml(top, s"$tmp/q08.html", "pie", "event_type", Seq("n"))
    val h = read(s"$tmp/q08.html")
    assert(h.contains("<svg") && h.contains("</table>"))
  }
}
