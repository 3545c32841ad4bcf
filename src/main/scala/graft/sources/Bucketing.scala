package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the co-located-join tool for 100 TB: write both
  * sides of a recurring join bucketed (and sorted) by the join key into
  * the warehouse, and Spark's bucketed scan joins them with NO shuffle
  * exchange (sort-merge over pre-bucketed files).
  *
  * The reference's recurring joins (`Sale ⋈ Property`,
  * `Service_Request ⋈ Complaint_Type`, webserver/server.py:186-187,205-206)
  * are exactly this shape: same keys every request.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // an in-memory catalog forgets tables across JVMs but their warehouse
    // directories persist — clear both so overwrite is really overwrite.
    // The stale location is resolved by the CATALOG, never derived as
    // warehouse/<table> by string concatenation (r12): under a
    // non-default database that string named a DIFFERENT table's
    // directory (deleting unrelated data) while the real stale
    // directory survived; qualified names ("db.t") mis-mapped the same
    // way. defaultTablePath applies the catalog's own layout rules
    // (current database, .db suffix, name escaping).
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
