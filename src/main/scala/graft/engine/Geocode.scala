package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KeyCodec

/** Address → BBL resolution. The reference calls the NYC Geoclient HTTP
  * API per request (webserver/server.py:74-115) — a driver-side external
  * boundary, not a distributed operator. At scale the same capability is a
  * broadcast mapping-dimension join: a (normalized address → BBL) table
  * built offline, joined to incoming addresses.
  */
object Geocode {

  /** Reference's address normalization: concat house/street/borough parts
    * and trim (webserver/server.py:153-ish usage; C8 in SURVEY.md §2.6).
    */
  def normalizeAddress(parts: Column*): Column =
    upper(trim(regexp_replace(concat_ws(" ", parts: _*), "\\s+", " ")))

  /** Resolve addresses through a mapping dimension (left join — unresolved
    * addresses keep null BBL components, the reference's geocode-miss
    * path). The mapping side is broadcast: it is the small side by
    * construction.
    */
  def resolve(addresses: DataFrame, addrCol: String, mapping: DataFrame,
              mappingAddrCol: String, bbl10Col: String): DataFrame = {
    val m = broadcast(mapping.select(
      col(mappingAddrCol).as("__addr_key"), col(bbl10Col).as("__bbl10")))
    val (b, bl, lt) = KeyCodec.parseBbl10(col("__bbl10"))
    addresses
      .withColumn("__addr_key", normalizeAddress(col(addrCol)))
      .join(m, Seq("__addr_key"), "left")
      .withColumn("borough_code", b)
      .withColumn("block_code", bl)
      .withColumn("lot_code", lt)
      .withColumn("bbl",
        when(col("__bbl10").isNotNull,
          KeyCodec.formatBbl(b, bl, lt)))
      .drop("__addr_key", "__bbl10")
  }
}
