package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.operators.Filters

/** Ingestion stage — the reference's gitignored ETL (`clean_csv_files.py`,
  * reference .gitignore:1-6): raw CSV → typed, validated, quarantined,
  * columnar.
  *
  * Scale shape: schema is explicit (no inference pass over 100 TB), bad
  * rows are tagged not dropped (one scan, quarantine is a filter on the
  * output), and the parquet write can be partitioned by a date-derived
  * column so downstream date-window queries prune partitions.
  */
object Ingest {

  /** Read a headered CSV with an explicit schema; malformed rows are kept
    * (PERMISSIVE) with nulls so validation can quarantine them.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** JSON-lines ingest with explicit schema (same no-inference rule);
    * PERMISSIVE pinned so malformed lines become all-null rows for the
    * quarantine instead of silently vanishing.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("mode", "PERMISSIVE").schema(schema).json(path)

  /** ORC ingest — columnar like parquet; schema from the file. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  /** Validate + split: returns (valid, quarantine) over one tagged scan
    * (reference CHECK constraints, schema.sql:31-35,43-44,70-73).
    */
  def validateSplit(df: DataFrame, checks: Seq[(String, Column)])
      : (DataFrame, DataFrame) = {
    val tagged = Filters.validate(df, checks)
    (tagged.filter(col("is_valid")).drop("is_valid", "violation"),
     tagged.filter(!col("is_valid")).drop("is_valid"))
  }

  /** Land as parquet, optionally partitioned (e.g. by month bucket) for
    * downstream partition pruning.
    */
  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }
}
