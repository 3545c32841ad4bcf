package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BBL (Borough-Block-Lot) codec — the reference's key scalar functions as
  * pure `Column` expressions (codegen-friendly, no UDFs).
  *
  * Reference: fixed-width parse of the Geoclient 10-char BBL at
  * webserver/server.py:104-106, dash-separated parse with invalid→None at
  * server.py:118-127, format at server.py:109.
  */
object KeyCodec {

  /** `b-bbbbb-llll` display form (reference: webserver/server.py:109). */
  def formatBbl(borough: Column, block: Column, lot: Column): Column =
    concat_ws("-", borough.cast("string"),
      lpad(block.cast("string"), 5, "0"), lpad(lot.cast("string"), 4, "0"))

  /** 10-char fixed-width form `bBBBBBLLLL` (Geoclient wire format). */
  def formatBbl10(borough: Column, block: Column, lot: Column): Column =
    concat(borough.cast("string"),
      lpad(block.cast("string"), 5, "0"), lpad(lot.cast("string"), 4, "0"))

  /** Fixed-width parse `[0] [1:6] [6:10]` (reference:
    * webserver/server.py:104-106). Malformed input → null components
    * (cast of non-numeric yields null, mirroring try/except → None).
    */
  def parseBbl10(bbl10: Column): (Column, Column, Column) = {
    val ok = bbl10.rlike("^[0-9]{10}$")
    (when(ok, substring(bbl10, 1, 1).cast("int")),
     when(ok, substring(bbl10, 2, 5).cast("int")),
     when(ok, substring(bbl10, 7, 4).cast("int")))
  }

  /** Dash-separated parse with the reference's invalid→null contract
    * (webserver/server.py:118-127: wrong arity or non-numeric → None).
    */
  def parseBbl(bbl: Column): (Column, Column, Column) = {
    val parts = split(bbl, "-")
    val ok = size(parts) === 3 &&
      element_at(parts, 1).rlike("^[0-9]+$") &&
      element_at(parts, 2).rlike("^[0-9]+$") &&
      element_at(parts, 3).rlike("^[0-9]+$")
    (when(ok, element_at(parts, 1).cast("int")),
     when(ok, element_at(parts, 2).cast("int")),
     when(ok, element_at(parts, 3).cast("int")))
  }
}
