package graft.operators

import org.apache.spark.sql.DataFrame

/** Result sinks matching the reference's export surface (SURVEY.md §2.1
  * K1/K2/K3): CSV with headers in declared column order
  * (reference: webserver/server.py:519-535), JSON rows (server.py:495),
  * and a static HTML table report (the engine-side face of the
  * reference's template tier — server.py:425-431 hands query rows to
  * Jinja tables in templates/analytics.html; the interactive web/chart
  * layer stays out of engine scope, the TABLE rendering does not).
  *
  * Column order is preserved by selecting explicitly before write; headers
  * come from column names, so callers alias to the reference's display
  * names (e.g. "Complaint Type", "Total Count").
  */
object Sinks {

  def writeCsv(df: DataFrame, path: String, headers: Seq[String] = Nil): DataFrame = {
    val out = if (headers.isEmpty) df
      else df.toDF(headers: _*)
    out.write.mode("overwrite").option("header", "true").csv(path)
    out
  }

  def writeJson(df: DataFrame, path: String): DataFrame = {
    df.write.mode("overwrite").json(path)
    df
  }

  /** Render `df` as one self-contained static HTML file: a `<table>`
    * with a header row from the column names (declared order) and one
    * `<tr>` per data row, every cell HTML-escaped, nulls rendered
    * empty. An HTML report is a PRESENTATION artifact and therefore
    * driver-sized BY CONTRACT: the row count is checked against
    * `maxRows` with a loud failure, never a silent truncation —
    * aggregate or limit upstream, exactly as the reference's dashboard
    * queries do before templating. Returns `df` for chaining like the
    * other sinks.
    */
  def writeHtml(df: DataFrame, path: String, title: String = "",
                maxRows: Int = 10000): DataFrame = {
    require(maxRows > 0, s"maxRows must be positive, got $maxRows")
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"writeHtml is for presentation-sized results: got more than " +
        s"$maxRows rows — aggregate or limit upstream, or raise maxRows")
    def esc(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case '\'' => "&#39;"
      case c => c.toString
    }
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html>\n<html>\n<head>\n<meta charset=\"utf-8\"/>\n"
    sb ++= s"<title>${esc(title)}</title>\n</head>\n<body>\n"
    if (title.nonEmpty) sb ++= s"<h1>${esc(title)}</h1>\n"
    sb ++= "<table>\n<thead>\n<tr>"
    df.columns.foreach(c => sb ++= s"<th>${esc(c)}</th>")
    sb ++= "</tr>\n</thead>\n<tbody>\n"
    rows.foreach { r =>
      sb ++= "<tr>"
      (0 until r.length).foreach { i =>
        val v = if (r.isNullAt(i)) "" else esc(String.valueOf(r.get(i)))
        sb ++= s"<td>$v</td>"
      }
      sb ++= "</tr>\n"
    }
    sb ++= "</tbody>\n</table>\n</body>\n</html>\n"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    df
  }
}
