package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file layout — the data-skipping tool for
  * multi-dimensional predicates at 100 TB. Sorting files by ONE column
  * gives parquet min/max pruning on that column and nothing else; sorting
  * by the interleaved bits of TWO columns gives useful min/max bounds on
  * BOTH, so a box predicate (x range AND y range) skips most files on
  * either dimension. All pure built-in bitwise expressions (codegen'd, no
  * UDFs) and SQL-portable, so the key an engine writes is reproducible by
  * any other.
  */
object Layout {

  /** Spread the low 16 bits of `v` to even bit positions (0,2,4,…,30) —
    * the classic Morton bit-twiddle as a chain of shift/mask built-ins.
    */
  private def spread16(v: Column): Column = {
    val m1 = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two 16-bit values (a in even bits, b in odd):
    * a 32-bit z-curve key. Inputs must already be in [0, 65535].
    */
  def mortonKey(a16: Column, b16: Column): Column =
    spread16(a16).bitwiseOR(shiftleft(spread16(b16), 1))

  /** Normalize a numeric column to a 16-bit rank over its [min, max]
    * (supplied by the caller — at scale these come from table stats or an
    * in-plan 1-row aggregate): `floor((x-lo)/(hi-lo)*65536)` clamped to
    * [0, 65535]. Fixed double op order, engine-reproducible. A degenerate
    * range (hi == lo) maps everything to 0.
    */
  def norm16(x: Column, lo: Column, hi: Column): Column =
    when(hi === lo, lit(0L)).otherwise(
      greatest(lit(0L), least(lit(65535L),
        floor((x.cast("double") - lo) / (hi - lo) * 65536.0).cast("long"))))

  /** The z-order key for two numeric columns with in-plan bounds: one
    * 1-row min/max aggregate broadcast into the scan, then pure bitwise
    * arithmetic. Column name `zkey`.
    */
  def withZKey(df: DataFrame, colA: String, colB: String): DataFrame = {
    val mm = df.agg(
      min(col(colA)).cast("double").as("__loa"),
      max(col(colA)).cast("double").as("__hia"),
      min(col(colB)).cast("double").as("__lob"),
      max(col(colB)).cast("double").as("__hib"))
    df.crossJoin(broadcast(mm))
      .withColumn("zkey", mortonKey(
        norm16(col(colA), col("__loa"), col("__hia")),
        norm16(col(colB), col("__lob"), col("__hib"))))
      .drop("__loa", "__hia", "__lob", "__hib")
  }

  /** Write `df` as `files` parquet files laid out along the z-curve of
    * (colA, colB): range-partition by zkey (contiguous curve segments per
    * file) and sort within each file, so every file's parquet min/max
    * covers a compact box in BOTH dimensions. The key itself is dropped
    * from the files — it is a layout device, not data.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    files: Int): Unit =
    withZKey(df, colA, colB)
      .repartitionByRange(files, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .drop("zkey")
      .write.mode("overwrite").parquet(path)
}
