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
}
