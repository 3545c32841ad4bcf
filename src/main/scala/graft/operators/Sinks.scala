package graft.operators

import org.apache.spark.sql.DataFrame

/** Result sinks matching the reference's export surface (SURVEY.md §2.1
  * K1/K2): CSV with headers in declared column order
  * (reference: webserver/server.py:519-535) and JSON rows
  * (server.py:495).
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
}
