package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Native XLSX ingest — no external library. An .xlsx file is a ZIP
  * (ECMA-376 / ISO 29500 "Office Open XML") whose sheet data lives in
  * `xl/worksheets/sheetN.xml` with cell strings interned in
  * `xl/sharedStrings.xml`; both are parsed here with `java.util.zip` +
  * the JDK SAX parser (doctypes disabled — no XXE surface).
  *
  * Scale shape: files are read through Spark's `binaryFile` source — one
  * task per file, so a drop of thousands of workbook files parses across
  * the cluster; per-file cost is the file's own size (an .xlsx is
  * size-capped by its format at ~1M rows, so a single file never needs
  * intra-file parallelism). Values surface as raw strings positioned by
  * cell reference; [[read]] applies an EXPLICIT schema by column position
  * (same no-inference rule as [[Ingest.readCsv]]) so a 100 TB backfill
  * never pays an inference pass and malformed cells become nulls for the
  * quarantine split. Date cells carry Excel serial numbers (the format
  * stores no timezone or type beyond a style index); convert with
  * [[dateFromSerial]] after the typed read.
  *
  * Reference consumed .xlsx drops via its gitignored ETL
  * (reference .gitignore:4); this closes the one ingest format the engine
  * previously documented out of scope.
  */
object Xlsx {

  /** 0-based column index of an A1-style cell reference ("BC12" → 54). */
  def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def saxParser(): javax.xml.parsers.SAXParser = {
    val f = javax.xml.parsers.SAXParserFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setNamespaceAware(false)
    f.newSAXParser()
  }

  private def zipEntry(bytes: Array[Byte], name: String): Option[Array[Byte]] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == name) return Some(zin.readAllBytes())
        e = zin.getNextEntry
      }
      None
    } finally zin.close()
  }

  /** The shared-string table, rich-text runs flattened (an `<si>` may hold
    * one `<t>` or several `<r><t>` runs — all concatenate).
    */
  /** The element's local name with any namespace prefix stripped: the
    * parser runs namespace-UNaware (qName only), and valid OOXML
    * producers may prefix every element (`<x:row>`) — exact-qName
    * matching then parsed such a workbook to ZERO rows with no error,
    * the silent loss the file sentinel exists to prevent.
    */
  private def localName(q: String): String = {
    val i = q.indexOf(':')
    if (i >= 0) q.substring(i + 1) else q
  }

  private def sharedStrings(bytes: Array[Byte]): IndexedSeq[String] =
    zipEntry(bytes, "xl/sharedStrings.xml") match {
      case None => IndexedSeq.empty
      case Some(xml) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        val cur = new java.lang.StringBuilder
        saxParser().parse(new java.io.ByteArrayInputStream(xml),
          new org.xml.sax.helpers.DefaultHandler {
            var inT = false
            override def startElement(u: String, l: String, q: String,
                                      a: org.xml.sax.Attributes): Unit = {
              if (localName(q) == "si") cur.setLength(0)
              if (localName(q) == "t") inT = true
            }
            override def characters(ch: Array[Char], s: Int, n: Int): Unit =
              if (inT) cur.append(ch, s, n)
            override def endElement(u: String, l: String, q: String): Unit = {
              if (localName(q) == "t") inT = false
              if (localName(q) == "si") out += cur.toString
            }
          })
        out.toIndexedSeq
    }

  /** Parse one worksheet to rows of cell strings, positioned by cell
    * reference (absent cells → null; rows keep their sheet order). Cell
    * types handled: shared string (`t="s"`), inline/formula string
    * (`t="inlineStr"` / `t="str"`), boolean (`t="b"` → "true"/"false"),
    * and the default numeric `<v>` verbatim.
    */
  def parseSheet(bytes: Array[Byte], sheetIdx: Int = 1): Vector[Vector[String]] = {
    val xml = zipEntry(bytes, s"xl/worksheets/sheet$sheetIdx.xml").getOrElse(
      throw new IllegalArgumentException(s"no sheet $sheetIdx in workbook"))
    val sst = sharedStrings(bytes)
    val rows = scala.collection.mutable.ArrayBuffer[Vector[String]]()
    val row = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    saxParser().parse(new java.io.ByteArrayInputStream(xml),
      new org.xml.sax.helpers.DefaultHandler {
        var cellCol = -1      // from r="D7"; -1 = unset (then cursor + 1)
        var cursor = -1       // last filled column in this row
        var cellType = ""
        var inV = false; var inIsT = false
        val v = new java.lang.StringBuilder
        override def startElement(u: String, l: String, q: String,
                                  a: org.xml.sax.Attributes): Unit = localName(q) match {
          case "row" => row.clear(); cursor = -1
          case "c" =>
            cellCol = Option(a.getValue("r")).map(colIndex).getOrElse(-1)
            cellType = Option(a.getValue("t")).getOrElse("")
            v.setLength(0)
          case "v" => inV = true
          case "t" => inIsT = true // inside <is> inline string
          case _ => ()
        }
        override def characters(ch: Array[Char], s: Int, n: Int): Unit =
          if (inV || inIsT) v.append(ch, s, n)
        override def endElement(u: String, l: String, q: String): Unit = localName(q) match {
          case "v" => inV = false
          case "t" => inIsT = false
          case "c" =>
            val col = if (cellCol >= 0) cellCol else cursor + 1
            cursor = col
            val raw = v.toString
            val value = cellType match {
              case "s" =>
                // toIntOption, not toInt: a styled-but-cleared shared-
                // string cell (<c t="s"/> with no/empty <v>) is a null
                // cell, not a NumberFormatException that quarantines
                // the WHOLE workbook through the file-level sentinel
                raw.trim.toIntOption
                  .filter(i => i >= 0 && i < sst.length)
                  .map(sst).orNull
              case "b" => if (raw.trim == "1") "true" else "false"
              case _ => if (raw.isEmpty) null else raw
            }
            if (value != null) row += ((col, value))
          case "row" =>
            // a row that produced NO cells (formatting-only: height or
            // style attributes, no values) is skipped instead of
            // emitted empty — an appended empty entry consumed a row
            // index and silently shifted the header/data split by one
            if (row.nonEmpty) {
              val width = row.map(_._1).max + 1
              val arr = Array.fill[String](width)(null)
              row.foreach { case (c, s) => arr(c) = s }
              rows += arr.toVector
            }
          case _ => ()
        }
      })
    rows.toVector
  }

  /** All sheet rows of every .xlsx under `path`, one task per file:
    * (src_file, row_idx, cells array<string>). The parse runs inside
    * `mapPartitions` on the binaryFile rows — executors do the unzip/XML
    * work, the driver never sees file bytes.
    *
    * A file that fails to parse (truncated zip, malformed XML, missing
    * sheet) emits ONE sentinel row `(src_file, -1, null)` instead of
    * aborting the job — on a backfill of thousands of workbook drops one
    * corrupt file must not kill the load, and the sentinel makes the
    * failure VISIBLE for quarantine ([[badFiles]]) rather than silently
    * skipped. [[read]] excludes sentinels from the typed output.
    */
  def readRows(spark: SparkSession, path: String, sheetIdx: Int = 1): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType.fromDDL(
      "src_file string, row_idx int, cells array<string>"))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx")
      .load(path)
      .select(col("path"), col("content"))
      .mapPartitions { files =>
        files.flatMap { f =>
          val p = f.getString(0)
          try {
            parseSheet(f.getAs[Array[Byte]](1), sheetIdx).zipWithIndex.map {
              case (cells, i) => org.apache.spark.sql.Row(p, i, cells)
            }
          } catch {
            case scala.util.control.NonFatal(_) =>
              Seq(org.apache.spark.sql.Row(p, -1, null))
          }
        }
      }(enc)
  }

  /** Files [[readRows]] could not parse — route to quarantine/re-fetch. */
  def badFiles(rows: DataFrame): DataFrame =
    rows.filter(col("row_idx") === -1).select(col("src_file")).distinct()

  /** Typed read: apply an EXPLICIT schema by column position (field i ←
    * cell i), casting the raw strings; a cell that fails its cast becomes
    * null, so [[Ingest.validateSplit]] quarantines the row instead of the
    * load aborting. `header = true` skips each file's first row.
    */
  def read(spark: SparkSession, path: String, schema: StructType,
           header: Boolean = true, sheetIdx: Int = 1): DataFrame = {
    val rows = readRows(spark, path, sheetIdx)
    val body = rows.filter(col("row_idx") >= (if (header) 1 else 0))
    body.select(schema.fields.zipWithIndex.map { case (f, i) =>
      // try_cast, not cast: under ANSI semantics a malformed cell would
      // abort the whole load; null-on-failure is what feeds the quarantine
      // try_element_at like the try_cast next to it: rows are built
      // only to their last non-empty cell, so a short row's missing
      // trailing subscripts must null out, not abort the load under
      // the ANSI default
      try_element_at(col("cells"), lit(i + 1)).try_cast(f.dataType)
        .as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Excel serial date → date: day `n` counted from 1899-12-30 (the
    * 1900 epoch including Excel's historic leap-year-1900 offset that
    * makes serial 60 a real date for every file written since).
    */
  def dateFromSerial(serial: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    date_add(to_date(lit("1899-12-30")), serial.cast("int"))
}
