package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{Ingest, Xlsx}

class XlsxSpec extends SparkSpec {

  /** Write a real .xlsx (zip of ECMA-376 XML parts) to `path`. */
  private def writeXlsx(path: java.nio.file.Path, sheetXml: String,
                        shared: Seq[String]): Unit = {
    val zo = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(path))
    def put(name: String, content: String): Unit = {
      zo.putNextEntry(new java.util.zip.ZipEntry(name))
      zo.write(content.getBytes("UTF-8")); zo.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |</Types>""".stripMargin)
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"/></sheets></workbook>""")
    if (shared.nonEmpty)
      put("xl/sharedStrings.xml",
        s"""<?xml version="1.0"?><sst count="${shared.size}" uniqueCount="${shared.size}">""" +
          shared.map(s => s"<si><t>$s</t></si>").mkString + "</sst>")
    put("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet><sheetData>$sheetXml</sheetData></worksheet>""")
    zo.close()
  }

  test("xlsx: cell types, shared/inline strings, column gaps, rich runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx")
    // header + two data rows: shared string, number, gap to column D,
    // inline string, boolean, missing-r cell (cursor+1 per spec)
    val sheet =
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>4</v></c><c r="B2"><v>42.5</v></c><c r="D2" t="inlineStr"><is><t>inline!</t></is></c></row>
        |<row r="3"><c r="A3" t="s"><v>5</v></c><c><v>7</v></c><c r="C3" t="b"><v>1</v></c></row>"""
        .stripMargin.replace("\n", "")
    writeXlsx(dir.resolve("t.xlsx"), sheet,
      Seq("name", "amount", "flag", "note", "alpha", "beta"))
    val rows = Xlsx.readRows(spark, dir.toString).orderBy("row_idx").collect()
    assert(rows.length == 3)
    assert(rows(0).getSeq[String](2) == Seq("name", "amount", "flag", "note"))
    // gap: C2 absent → null; D2 inline string
    assert(rows(1).getSeq[String](2) == Seq("alpha", "42.5", null, "inline!"))
    // missing r= lands at cursor+1 (B3); boolean renders true/false
    assert(rows(2).getSeq[String](2) == Seq("beta", "7", "true"))

    // rich-text runs concatenate
    val rich = java.nio.file.Files.createTempDirectory("graft_xlsx_rich")
    val zo = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(rich.resolve("r.xlsx")))
    def put(name: String, content: String): Unit = {
      zo.putNextEntry(new java.util.zip.ZipEntry(name))
      zo.write(content.getBytes("UTF-8")); zo.closeEntry()
    }
    put("xl/sharedStrings.xml",
      """<sst><si><r><t>Hello </t></r><r><t>World</t></r></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c></row></sheetData></worksheet>""")
    zo.close()
    assert(Xlsx.parseSheet(
      java.nio.file.Files.readAllBytes(rich.resolve("r.xlsx"))) ==
      Vector(Vector("Hello World")))
  }

  test("xlsx: typed read with explicit schema, quarantine on bad cells, serial dates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx2")
    val sheet =
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>19.99</v></c><c r="C2"><v>45292</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>4</v></c><c r="B3" t="s"><v>5</v></c><c r="C3"><v>45293</v></c></row>"""
        .stripMargin.replace("\n", "")
    writeXlsx(dir.resolve("d.xlsx"), sheet,
      Seq("item", "price", "sold_on", "widget", "gadget", "not-a-price"))
    val schema = StructType.fromDDL("item string, price double, sold_serial int")
    val typed = Xlsx.read(spark, dir.toString, schema)
      .withColumn("sold_on", Xlsx.dateFromSerial(col("sold_serial")))
    val (ok, bad) = Ingest.validateSplit(typed,
      Seq("price_present" -> col("price").isNotNull))
    val okRows = ok.orderBy("item").collect()
    assert(okRows.length == 1 && okRows(0).getString(0) == "widget" &&
      okRows(0).getDouble(1) == 19.99 &&
      okRows(0).getAs[java.sql.Date]("sold_on").toString == "2024-01-01")
    val badRows = bad.collect()
    assert(badRows.length == 1 &&
      badRows(0).getAs[String]("violation") == "price_present")
    // multi-file scale path: a second workbook lands in the same frame
    writeXlsx(dir.resolve("d2.xlsx"), sheet,
      Seq("item", "price", "sold_on", "other", "gadget", "x"))
    assert(Xlsx.read(spark, dir.toString, schema).count() == 4)
    assert(Xlsx.readRows(spark, dir.toString)
      .select("src_file").distinct().count() == 2)

    // a corrupt workbook must not abort the backfill: it surfaces as a
    // quarantinable sentinel and the typed read still lands the good files
    java.nio.file.Files.write(dir.resolve("corrupt.xlsx"),
      "this is not a zip archive".getBytes("UTF-8"))
    val rows = Xlsx.readRows(spark, dir.toString)
    val badNames = Xlsx.badFiles(rows).collect().map(_.getString(0))
    assert(badNames.length == 1 && badNames.head.endsWith("corrupt.xlsx"))
    assert(Xlsx.read(spark, dir.toString, schema).count() == 4) // unchanged
  }

  // --- r12 review hardening ------------------------------------------

  test("xlsx: namespace-prefixed elements parse (not zero rows), " +
       "formatting-only rows don't shift the header, cleared shared-" +
       "string cells null out, short rows read under ANSI") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_r12")
    // a valid producer style: every element prefixed, plus a
    // formatting-only first row, a cleared shared-string cell, and a
    // data row shorter than the schema
    val zo = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(dir.resolve("p.xlsx")))
    def put(name: String, content: String): Unit = {
      zo.putNextEntry(new java.util.zip.ZipEntry(name))
      zo.write(content.getBytes("UTF-8")); zo.closeEntry()
    }
    put("xl/sharedStrings.xml",
      """<x:sst xmlns:x="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><x:si><x:t>item</x:t></x:si><x:si><x:t>pen</x:t></x:si></x:sst>""")
    put("xl/worksheets/sheet1.xml",
      """<x:worksheet xmlns:x="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><x:sheetData>""" +
        """<x:row r="1" ht="20"/>""" + // formatting-only: no cells
        """<x:row r="2"><x:c r="A2" t="s"><x:v>0</x:v></x:c><x:c r="B2"><x:v>9</x:v></x:c></x:row>""" +
        """<x:row r="3"><x:c r="A3" t="s"><x:v>1</x:v></x:c><x:c r="B3"><x:v>2.5</x:v></x:c></x:row>""" +
        """<x:row r="4"><x:c r="A4" t="s"/></x:row>""" + // cleared ss cell, short row
        """</x:sheetData></x:worksheet>""")
    zo.close()
    val parsed = Xlsx.parseSheet(
      java.nio.file.Files.readAllBytes(dir.resolve("p.xlsx")))
    assert(parsed.nonEmpty,
      "prefixed OOXML used to parse to ZERO rows silently")
    assert(parsed(0) == Vector("item", "9"),
      "the formatting-only row must not consume an index — the header " +
        s"is the first CELL-BEARING row (got ${parsed(0)})")
    // the cleared shared-string cell is a null cell, not a
    // NumberFormatException that quarantines the whole workbook
    assert(parsed.length == 2,
      s"row 4's only cell is null-valued, no cells, skipped ($parsed)")
    // typed read under the session's ANSI default: header skipped, the
    // short row's missing trailing subscript nulls out, no abort
    val schema = StructType(Seq(StructField("item", StringType),
      StructField("price", DoubleType)))
    val got = Xlsx.read(spark, dir.toString, schema).orderBy("item")
      .collect()
    assert(got.length == 1 && got(0).getString(0) == "pen" &&
      got(0).getDouble(1) == 2.5)
  }
}
