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

  private def esc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case '\'' => "&#39;"
    case c => c.toString
  }

  /** Categorical palette (Tableau 10 — a public standard choice),
    * cycled when a chart has more series/slices than colors.
    */
  private val palette = Vector(
    "#4e79a7", "#f28e2b", "#e15759", "#76b7b2", "#59a14f",
    "#edc949", "#b07aa1", "#ff9da7", "#9c755f", "#bab0ac")

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

  // --- chart faces (VERDICT r11 item 8) ------------------------------
  //
  // The reference's most visible surface is its Chart.js dashboards:
  // a top-5+Other complaint pie (templates/analytics.html:313-365) and
  // two monthly line charts (:367-434). The engine renders the same
  // shapes as STATIC inline SVG — no script tier, no external assets,
  // one self-contained file — because a query engine's deliverable is
  // the rendered artifact, not a web app. All text is escaped with the
  // same entity set as the table face (SVG is XML; the same five
  // entities are the dangerous ones).

  /** Pie-chart SVG for (label, value) slices — the reference's
    * complaint-type pie shape (feed it q08's top-5+Other frame).
    * Values must be non-negative with a positive total: a pie of
    * negatives or of nothing is a caller bug, refused loudly.
    */
  def pieSvg(slices: Seq[(String, Double)], size: Int = 360): String = {
    require(slices.nonEmpty, "pieSvg: no slices")
    slices.foreach { case (l, v) =>
      require(!v.isNaN && !v.isInfinite && v >= 0,
        s"pieSvg: negative/NaN/infinite slice '$l' ($v)") }
    val total = slices.map(_._2).sum
    require(total > 0, "pieSvg: slice total must be positive")
    val c = size / 2.0
    val r = c * 0.92
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$size" """ +
      s"""height="$size" viewBox="0 0 $size $size" role="img">"""
    sb ++= "\n"
    // a slice spanning the whole circle degenerates to a zero-length
    // arc path — draw the circle directly
    val whole = slices.indexWhere(_._2 == total)
    if (whole >= 0) {
      sb ++= s"""<circle cx="$c" cy="$c" r="$r" """ +
        s"""fill="${palette(whole % palette.size)}"/>""" + "\n"
    } else {
      var angle = -math.Pi / 2 // noon start, clockwise, like Chart.js
      slices.zipWithIndex.foreach { case ((_, v), i) =>
        if (v > 0) {
          val sweep = v / total * 2 * math.Pi
          val x1 = c + r * math.cos(angle)
          val y1 = c + r * math.sin(angle)
          val x2 = c + r * math.cos(angle + sweep)
          val y2 = c + r * math.sin(angle + sweep)
          val large = if (sweep > math.Pi) 1 else 0
          sb ++= f"""<path d="M $c%.2f $c%.2f L $x1%.2f $y1%.2f """ +
            f"""A $r%.2f $r%.2f 0 $large 1 $x2%.2f $y2%.2f Z" """ +
            s"""fill="${palette(i % palette.size)}"/>""" + "\n"
          angle += sweep
        }
      }
    }
    sb ++= "</svg>"
    sb.toString
  }

  /** Multi-series line-chart SVG — the reference's monthly-trend shape
    * (feed it q06/q07's month series). `xs` are the shared x labels;
    * each series must be exactly `xs.length` finite points (a gap is a
    * caller bug at presentation time — gap-fill upstream, the engine
    * has an operator for exactly that).
    */
  def lineSvg(xs: Seq[String], series: Seq[(String, Seq[Double])],
              width: Int = 640, height: Int = 320): String = {
    require(xs.size >= 2, "lineSvg: need at least two x points")
    require(series.nonEmpty, "lineSvg: no series")
    series.foreach { case (n, ys) =>
      require(ys.size == xs.size,
        s"lineSvg: series '$n' has ${ys.size} points for ${xs.size} labels")
      require(ys.forall(y => !y.isNaN && !y.isInfinite),
        s"lineSvg: series '$n' has non-finite points — gap-fill upstream")
    }
    val (l, rM, t, b) = (52.0, 12.0, 12.0, 28.0)
    val pw = width - l - rM
    val ph = height - t - b
    val all = series.flatMap(_._2)
    val (lo0, hi0) = (all.min, all.max)
    val (lo, hi) = if (lo0 == hi0) (lo0 - 1, hi0 + 1) else (lo0, hi0)
    def px(i: Int): Double = l + pw * i / (xs.size - 1)
    def py(v: Double): Double = t + ph * (1 - (v - lo) / (hi - lo))
    def fmt(v: Double): String =
      if (v == v.floor && math.abs(v) < 1e15) v.toLong.toString
      else f"$v%.2f"
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" """ +
      s"""height="$height" viewBox="0 0 $width $height" role="img">"""
    sb ++= "\n"
    // frame + 4 horizontal gridlines with y labels
    (0 to 4).foreach { g =>
      val v = lo + (hi - lo) * g / 4
      val y = py(v)
      sb ++= f"""<line x1="$l%.1f" y1="$y%.1f" x2="${l + pw}%.1f" """ +
        f"""y2="$y%.1f" stroke="#ddd"/>""" + "\n"
      sb ++= f"""<text x="${l - 6}%.1f" y="${y + 4}%.1f" """ +
        s"""text-anchor="end" font-size="11">${esc(fmt(v))}</text>""" + "\n"
    }
    // x labels: first, middle, last (escaped)
    Seq(0, xs.size / 2, xs.size - 1).distinct.foreach { i =>
      sb ++= f"""<text x="${px(i)}%.1f" y="${height - 8}" """ +
        s"""text-anchor="middle" font-size="11">${esc(xs(i))}</text>""" + "\n"
    }
    series.zipWithIndex.foreach { case ((_, ys), si) =>
      val pts = ys.zipWithIndex
        .map { case (v, i) => f"${px(i)}%.2f,${py(v)}%.2f" }
        .mkString(" ")
      sb ++= s"""<polyline points="$pts" fill="none" """ +
        s"""stroke="${palette(si % palette.size)}" stroke-width="2"/>""" +
        "\n"
    }
    sb ++= "</svg>"
    sb.toString
  }

  /** Chart + table in one self-contained HTML file — the dashboard
    * face. `kind` is `"pie"` (labelCol + ONE value column; the q08
    * top-5+Other shape) or `"line"` (labelCol as x, one series per
    * value column; the q06/q07 monthly-trend shape). The data table
    * renders underneath, so the artifact carries its own numbers like
    * the reference pages do. Presentation-sized by the same loud
    * contract as [[writeHtml]] — charts of unaggregated facts are a
    * caller bug.
    */
  def writeChartHtml(df: DataFrame, path: String, kind: String,
                     labelCol: String, valueCols: Seq[String],
                     title: String = "", maxRows: Int = 1000): DataFrame = {
    require(Seq("pie", "line").contains(kind),
      s"writeChartHtml kind must be pie|line, got '$kind'")
    require(valueCols.nonEmpty, "writeChartHtml: no value columns")
    require(kind != "pie" || valueCols.size == 1,
      "a pie chart takes exactly one value column")
    require(maxRows > 0, s"maxRows must be positive, got $maxRows")
    val proj = df.selectExpr(
      (labelCol +: valueCols).map(c => s"`$c`"): _*)
    val rows = proj.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"writeChartHtml is for presentation-sized results: got more " +
        s"than $maxRows rows — aggregate or limit upstream")
    val labels = rows.map(r =>
      if (r.isNullAt(0)) "" else String.valueOf(r.get(0))).toSeq
    def num(r: org.apache.spark.sql.Row, i: Int): Double = {
      require(!r.isNullAt(i),
        s"writeChartHtml: null in value column '${valueCols(i - 1)}' — " +
          "charts need complete series; gap-fill or filter upstream")
      r.get(i) match {
        case n: Number => n.doubleValue()
        case other => throw new IllegalArgumentException(
          s"writeChartHtml: non-numeric value '$other' in " +
            s"'${valueCols(i - 1)}'")
      }
    }
    val svg = kind match {
      case "pie" =>
        pieSvg(labels.zip(rows.map(num(_, 1)).toSeq))
      case _ =>
        lineSvg(labels, valueCols.zipWithIndex.map { case (c, si) =>
          c -> rows.map(num(_, si + 1)).toSeq })
    }
    val legendItems = kind match {
      case "pie" => labels
      case _ => valueCols
    }
    val legend = legendItems.zipWithIndex.map { case (lb, i) =>
      s"""<li><span style="display:inline-block;width:12px;""" +
        s"""height:12px;background:${palette(i % palette.size)}">""" +
        s"""</span> ${esc(lb)}</li>"""
    }.mkString("\n")
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html>\n<html>\n<head>\n<meta charset=\"utf-8\"/>\n"
    sb ++= s"<title>${esc(title)}</title>\n</head>\n<body>\n"
    if (title.nonEmpty) sb ++= s"<h1>${esc(title)}</h1>\n"
    sb ++= svg
    sb ++= s"\n<ul class=\"legend\">\n$legend\n</ul>\n"
    sb ++= "<table>\n<thead>\n<tr>"
    proj.columns.foreach(c => sb ++= s"<th>${esc(c)}</th>")
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
