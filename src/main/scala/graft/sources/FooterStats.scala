package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Per-file stats derived from parquet FOOTERS instead of a second full
  * scan of data the writer just produced (r17, guide §1.2/§6): the
  * writer already recorded min/max/null-count/row-count per column
  * chunk, and a commit/manifest needs exactly those per file. Footer
  * reads are metadata-sized driver work, bounded by files-per-batch.
  *
  * EXACTNESS CONTRACT: these stats surface to oracle-checked results
  * (lineage `columnStats`, manifest rows), so only types whose footer
  * stats provably equal the scan-derived aggregate are taken —
  * integer family (exact), date (exact int32 days), string (exact
  * unsigned-lexicographic UTF8 order — the same order Spark's min/max
  * use on UTF8String — absent when the writer truncated);
  * float/double (NaN poisons parquet's min/max where Spark's
  * aggregates order NaN last; ±0.0 normalization differs) and
  * everything else REFUSE, as does any file whose footer lacks a
  * needed stat — the caller then runs the old scan, which is always
  * exact. Only ever called on files THIS Spark version just wrote, so
  * comparator semantics are the writer's own.
  */
private[sources] object FooterStats {

  /** Signal: a footer lacks a stat the batch needs — the caller falls
    * back to the scan-derived aggregate (never wrong, one extra batch
    * pass). */
  private object Unavailable extends Exception(null, null, false, false)

  /** The per-file stats frame for `files` (displayName → path), shaped
    * exactly like `groupBy(file_name).agg(count(*) as n_rows,
    * Layout.statsAggs(schema, dims))`: columns `file_name, n_rows,
    * then min_/max_/nulls_ per dim in dims order`. Files with ZERO
    * rows produce no row (the aggregate's shape — callers that need
    * synthetic empty rows add them, as the manifest writer does).
    * None whenever any needed stat is absent or of an unsupported
    * type. */
  def statsDf(spark: SparkSession,
              files: Seq[(String, org.apache.hadoop.fs.Path)],
              schema: StructType,
              dims: Seq[String]): Option[DataFrame] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import scala.jdk.CollectionConverters._
    // per dim: the stat column's recorded type ([[Layout.statsAggs]]'s
    // widening — int family records long; everything else native)
    val specs: Seq[(String, DataType, DataType)] = dims.map { c =>
      val dt = schema.fields.find(_.name == c).map(_.dataType)
        .getOrElse(return None)
      dt match {
        case ByteType | ShortType | IntegerType | LongType =>
          (c, dt, LongType)
        case DateType => (c, dt, DateType)
        case StringType => (c, dt, StringType)
        case _ => return None
      }
    }
    val conf = spark.sessionState.newHadoopConf()
    def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    try {
      val rows = files.flatMap { case (display, path) =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(path, conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks.asScala.toSeq
          val nRows = blocks.map(_.getRowCount).sum
          if (nRows == 0L) None // no group row — the aggregate's shape
          else {
            val vals = specs.flatMap { case (c, srcT, outT) =>
              var nulls = 0L
              var minB: Any = null // bound in the PHYSICAL domain
              var maxB: Any = null
              blocks.foreach { b =>
                val cc = b.getColumns.asScala
                  .find(_.getPath.toDotString == c)
                  .getOrElse(throw Unavailable)
                val phys = cc.getPrimitiveType.getPrimitiveTypeName
                val expect = srcT match {
                  case ByteType | ShortType | IntegerType | DateType =>
                    PrimitiveTypeName.INT32
                  case LongType => PrimitiveTypeName.INT64
                  case _ => PrimitiveTypeName.BINARY
                }
                if (phys != expect) throw Unavailable
                val st = cc.getStatistics
                if (st == null || st.isEmpty || !st.isNumNullsSet)
                  throw Unavailable
                nulls += st.getNumNulls
                if (st.hasNonNullValue) {
                  (st.genericGetMin, st.genericGetMax) match {
                    case (lo: java.lang.Integer, hi: java.lang.Integer) =>
                      if (minB == null ||
                          lo < minB.asInstanceOf[Int]) minB = lo.intValue()
                      if (maxB == null ||
                          hi > maxB.asInstanceOf[Int]) maxB = hi.intValue()
                    case (lo: java.lang.Long, hi: java.lang.Long) =>
                      if (minB == null ||
                          lo < minB.asInstanceOf[Long]) minB = lo.longValue()
                      if (maxB == null ||
                          hi > maxB.asInstanceOf[Long]) maxB = hi.longValue()
                    case (lo: org.apache.parquet.io.api.Binary,
                          hi: org.apache.parquet.io.api.Binary) =>
                      val (lb, hb) = (lo.getBytes, hi.getBytes)
                      // defense against writer-side stat truncation
                      // (disabled by default; bound it anyway — a
                      // truncated bound is not the exact value the
                      // scan aggregate records)
                      if (lb.length >= 1024 || hb.length >= 1024)
                        throw Unavailable
                      if (minB == null ||
                          cmpBytes(lb, minB.asInstanceOf[Array[Byte]]) < 0)
                        minB = lb
                      if (maxB == null ||
                          cmpBytes(hb, maxB.asInstanceOf[Array[Byte]]) > 0)
                        maxB = hb
                    case _ => throw Unavailable
                  }
                }
              }
              def ext(v: Any): Any =
                if (v == null) null
                else outT match {
                  case LongType => v match {
                    case i: Int => java.lang.Long.valueOf(i.toLong)
                    case l: Long => java.lang.Long.valueOf(l)
                  }
                  case DateType =>
                    org.apache.spark.sql.catalyst.util.DateTimeUtils
                      .toJavaDate(v.asInstanceOf[Int])
                  case _ => new String(v.asInstanceOf[Array[Byte]],
                    java.nio.charset.StandardCharsets.UTF_8)
                }
              Seq(ext(minB), ext(maxB), java.lang.Long.valueOf(nulls))
            }
            Some(Row.fromSeq(
              display +: java.lang.Long.valueOf(nRows) +: vals))
          }
        } finally reader.close()
      }
      val fields = StructField("file_name", StringType, nullable = true) +:
        StructField("n_rows", LongType, nullable = false) +:
        specs.flatMap { case (c, _, outT) => Seq(
          StructField(s"min_$c", outT, nullable = true),
          StructField(s"max_$c", outT, nullable = true),
          StructField(s"nulls_$c", LongType, nullable = true)) }
      Some(spark.createDataFrame(java.util.Arrays.asList(rows: _*),
        StructType(fields)))
    } catch {
      case Unavailable => None
    }
  }
}
