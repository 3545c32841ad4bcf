package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregates over a [[TimeTravel]]
  * table — the consumer that makes the lake's version lineage pay rent.
  *
  * At 100 TB the dashboard aggregate (`GROUP BY source → count, sums`)
  * cannot be recomputed per refresh: a day's commits touch a few hundred
  * files of a few million. A [[TimeTravel]] commit already names exactly
  * which files it added and removed, and count/sum aggregates form an
  * abelian group (every row's contribution is ±its value, order-free), so
  * the view at the new head is EXACTLY the old view plus the aggregate of
  * the touched files' rows signed by their action: +1 per add, −1 per
  * remove. A file rewritten untouched (compaction, a delete's survivors)
  * contributes zero by cancellation — the refresh never needs to know WHY
  * a file moved. Refresh cost is therefore proportional to the data the
  * commits touched, never to the table.
  *
  * Aggregates supported: `n_rows` (always) and `sum_<c>` per requested
  * column, summing `coalesce(c, 0)` — the null-as-zero contract keeps
  * subtraction exact (a null contribution must subtract as the same
  * number it added as; means are `sum/n_rows` at read time). min/max are
  * deliberately NOT offered: they are not groups (a deleted row's min has
  * no inverse), so an "incremental" min would be a silent full recompute.
  * Integer sums are exact under any regrouping; float sums reassociate —
  * same caveat as every distributed sum, documented not hidden.
  *
  * Storage/swap discipline (crash-safe like [[Layout]]'s staged swaps):
  * the view lives under its own directory as immutable snapshots
  * `snap_v<srcVersion>` plus a tiny `_HEAD` pointer file naming the
  * current one; a refresh writes the NEW snapshot completely, then swaps
  * the pointer, then reclaims stale snapshots. A crash anywhere leaves
  * either the old pointer (old snapshot intact — retry) or the new one
  * (refresh complete); a half-written snapshot is invisible because the
  * pointer never names it.
  */
object MatView {

  /** Refresh receipt: the source version the view now reflects and how
    * many data files the refresh actually read — the number that should
    * track the commits' touch set, not the table. */
  final case class RefreshStats(version: Long, filesRead: Int)

  private final case class Meta(srcPath: String, keys: Seq[String],
                                sumCols: Seq[String])

  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)

  private def fsOf(spark: SparkSession, p: String) =
    hp(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // NOT underscore-prefixed: Spark's file index treats `_`-led names as
  // hidden, so a `_meta` parquet dir reads only through an undocumented
  // root-path exemption (and WARNs every time). The view dir is never
  // read by glob — MatView.read targets one snapshot — so a plain name
  // costs nothing and keeps the read on documented behavior.
  private def metaPath(viewPath: String): String =
    viewPath.stripSuffix("/") + "/view_meta"

  private def headPath(viewPath: String): String =
    viewPath.stripSuffix("/") + "/_HEAD"

  private def snapPath(viewPath: String, v: Long): String =
    viewPath.stripSuffix("/") + s"/snap_v$v"

  private def writeHead(spark: SparkSession, viewPath: String,
                        v: Long): Unit = {
    val out = fsOf(spark, viewPath).create(hp(headPath(viewPath)), true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The source version the view currently reflects. */
  def asOfVersion(spark: SparkSession, viewPath: String): Long = {
    val fs = fsOf(spark, viewPath)
    require(fs.exists(hp(headPath(viewPath))),
      s"MatView: no view at $viewPath (missing _HEAD) — create() first")
    TimeTravel.readVersionFile(fs, hp(headPath(viewPath)))
  }

  private def readMeta(spark: SparkSession, viewPath: String): Meta = {
    val r = spark.read.parquet(metaPath(viewPath)).head()
    def csv(s: String) =
      s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    Meta(r.getAs[String]("src_path"),
      csv(r.getAs[String]("key_cols")), csv(r.getAs[String]("sum_cols")))
  }

  /** The group-by the view maintains, applied to any frame — create and
    * refresh MUST aggregate identically or the delta algebra drifts. */
  private def aggregate(df: DataFrame, keys: Seq[String],
                        sumCols: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.map(c =>
          sum(coalesce(col(c), lit(0))).as(s"sum_$c")): _*)

  /** Build (or rebuild) the view as one full aggregate of the source's
    * CURRENT version and record that version. The one table-sized pass
    * the view's lifetime needs; everything after is [[refresh]].
    */
  def create(spark: SparkSession, srcPath: String, viewPath: String,
             keys: Seq[String], sumCols: Seq[String]): Long = {
    require(keys.nonEmpty, "MatView.create: at least one key column")
    val head = TimeTravel.latestVersion(spark, srcPath)
    require(head >= 1, s"MatView.create: no committed table at $srcPath")
    val full = TimeTravel.readAsOf(spark, srcPath, head)
    (keys ++ sumCols).foreach(c => require(full.columns.contains(c),
      s"MatView.create: column $c not in the source's current schema " +
        s"(${full.columns.mkString(", ")})"))
    // collision guards (case-insensitive, like Spark's resolution): a
    // key named like a view output column would shadow it; a source
    // column named like refresh's scratch would mis-join the delta
    val outReserved = ("n_rows" +: sumCols.map(c => s"sum_$c"))
      .map(_.toLowerCase)
    val keyClash = keys.map(_.toLowerCase).intersect(outReserved)
    require(keyClash.isEmpty,
      s"MatView.create: key column(s) ${keyClash.mkString(", ")} " +
        "collide with the view's own output columns — rename first")
    val scratch = (Seq("file_name", "__sign", "__dn") ++
      sumCols.map(c => s"__ds_$c")).map(_.toLowerCase)
    val srcClash = full.columns.map(_.toLowerCase).toSeq.intersect(scratch)
    require(srcClash.isEmpty,
      s"MatView.create: source column(s) ${srcClash.mkString(", ")} " +
        "collide with refresh's delta scratch — rename first")
    aggregate(full, keys, sumCols)
      .write.mode("overwrite").parquet(snapPath(viewPath, head))
    import spark.implicits._
    Seq((srcPath, keys.mkString(","), sumCols.mkString(",")))
      .toDF("src_path", "key_cols", "sum_cols")
      .coalesce(1).write.mode("overwrite").parquet(metaPath(viewPath))
    writeHead(spark, viewPath, head)
    gcSnapshots(spark, viewPath, keep = head)
    head
  }

  /** Advance the view to the source's current head by aggregating ONLY
    * the files the commits in `(asOf, head]` touched, signed +1 per add
    * and −1 per remove, merged into the old snapshot by key. Loud when
    * the window reaches behind a vacuum (the removed files' rows are
    * unrecoverable — rebuild with [[create]]); a no-op returns
    * immediately. Crash-safe per the object doc's pointer swap.
    */
  def refresh(spark: SparkSession, viewPath: String): RefreshStats = {
    val m = readMeta(spark, viewPath)
    val v0 = asOfVersion(spark, viewPath)
    val head = TimeTravel.latestVersion(spark, m.srcPath)
    require(head >= v0,
      s"MatView.refresh: view is at $v0 but source head is $head — the " +
        "source table was recreated; rebuild the view with create()")
    if (head == v0) return RefreshStats(v0, 0)
    val floor = TimeTravel.earliestReadable(spark, m.srcPath)
    require(v0 >= floor,
      s"MatView.refresh: the view's base version $v0 is behind the " +
        s"vacuum floor $floor — the delta window's removed files are " +
        "gone; rebuild with create()")
    val l = TimeTravel.readLineage(spark, m.srcPath)
    val acts = l.filter(col("version") > v0 && col("version") <= head &&
        col("action").isin("add", "remove"))
      .select(col("file_name"),
        when(col("action") === "add", lit(1L)).otherwise(lit(-1L))
          .as("__sign"))
    val files = acts.select(col("file_name")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val old = spark.read.parquet(snapPath(viewPath, v0))
    val merged =
      if (files.isEmpty) old // metadata-only commits (e.g. a vacuum)
      else {
        // one read of the touched files; a file that entered AND left
        // within the window joins both its +1 and −1 rows and cancels.
        // Widened read, not raw mergeSchema: the delta window may span
        // a TYPE-WIDENING commit (int→long), where mergeSchema throws
        // but the recorded commit schemas give one decodable target
        val rows = TimeTravel
          .readFilesWidened(spark, m.srcPath, files)
          .withColumn("file_name",
            element_at(split(input_file_name(), "/"), -1))
          .join(broadcast(acts), Seq("file_name"))
        val delta = rows.groupBy(m.keys.map(col): _*)
          .agg(sum(col("__sign")).as("__dn"),
            m.sumCols.map(c =>
              sum(col("__sign") * coalesce(col(c), lit(0)))
                .as(s"__ds_$c")): _*)
        // null-safe key equality: a null group key is a group like any
        // other and must merge, not duplicate
        val o = old.alias("o")
        val d = delta.alias("d")
        val cond = m.keys.map(k => col(s"o.$k") <=> col(s"d.$k"))
          .reduce(_ && _)
        o.join(d, cond, "full_outer")
          .select(
            m.keys.map(k => coalesce(col(s"o.$k"), col(s"d.$k")).as(k)) ++
              Seq((coalesce(col("o.n_rows"), lit(0L)) +
                coalesce(col("d.__dn"), lit(0L))).as("n_rows")) ++
              m.sumCols.map(c =>
                (coalesce(col(s"o.sum_$c"), lit(0L)) +
                  coalesce(col(s"d.__ds_$c"), lit(0L))).as(s"sum_$c")): _*)
          .filter(col("n_rows") > 0) // emptied groups disappear, as a
                                     // recompute would have them
      }
    merged.write.mode("overwrite").parquet(snapPath(viewPath, head))
    writeHead(spark, viewPath, head)
    gcSnapshots(spark, viewPath, keep = head)
    RefreshStats(head, files.size)
  }

  /** The view's current content: keys, `n_rows`, `sum_<c>`… */
  def read(spark: SparkSession, viewPath: String): DataFrame =
    spark.read.parquet(
      snapPath(viewPath, asOfVersion(spark, viewPath)))

  /** Reclaim snapshots the pointer no longer names (prior heads, plus
    * any half-written residue of a crashed refresh). */
  private def gcSnapshots(spark: SparkSession, viewPath: String,
                          keep: Long): Unit = {
    val fs = fsOf(spark, viewPath)
    Option(fs.globStatus(hp(viewPath.stripSuffix("/") + "/snap_v*")))
      .toSeq.flatten
      .filterNot(_.getPath.getName == s"snap_v$keep")
      .foreach(f => fs.delete(f.getPath, true))
  }
}
