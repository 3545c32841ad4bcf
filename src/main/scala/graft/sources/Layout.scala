package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, StringType, TimestampNTZType, TimestampType}

/** Z-order (Morton-curve) file layout — the data-skipping tool for
  * multi-dimensional predicates at 100 TB. Sorting files by ONE column
  * gives parquet min/max pruning on that column and nothing else; sorting
  * by the interleaved bits of N columns gives useful min/max bounds on
  * ALL of them, so a box predicate skips most files on any clustered
  * dimension (the typical lake layout clusters 2–3: date, key, source).
  * All pure built-in bitwise expressions (codegen'd, no UDFs) and
  * SQL-portable, so the key an engine writes is reproducible by any
  * other.
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

  /** N-way Morton interleave: dim d's bit i lands at key position
    * i·n + d, so equal-prefix key ranges are boxes in ALL n dimensions
    * — the generalization a lake layout clustered on (date, source,
    * language) needs. Inputs must already be `bits`-bit ranks
    * ([[normBits]]). The 2-dim/16-bit case routes through the
    * [[spread16]] twiddle (identical value, ~an eighth of the
    * expression nodes); the general case is the definitional per-bit
    * shift/mask/or chain — still pure built-ins, still codegen'd.
    */
  def mortonKeyN(parts: Seq[Column], bits: Int): Column = {
    val n = parts.size
    require(n >= 1 && n * bits <= 62,
      s"$n dims × $bits bits exceeds a positive Long key")
    if (n == 1) parts.head
    else if (n == 2 && bits == 16) mortonKey(parts(0), parts(1))
    else {
      val terms = for {
        (p, d) <- parts.zipWithIndex
        i <- 0 until bits
      } yield shiftleft(
        shiftrightunsigned(p, i).bitwiseAND(lit(1L)), i * n + d)
      terms.reduce(_.bitwiseOR(_))
    }
  }

  /** Bits per dimension for an n-way key: 16 where it fits (the 2-dim
    * legacy resolution), else the largest width keeping the whole key
    * in a positive Long — 3 dims keep 16, 4 dims drop to 15, etc.
    * Resolution only shapes skip RATES, never results (the manifest
    * records actual file min/max).
    */
  private def bitsFor(n: Int): Int = math.min(16, 62 / n)

  /** Normalize a numeric column to a 16-bit rank over its [min, max]
    * (supplied by the caller — at scale these come from table stats or an
    * in-plan 1-row aggregate): `floor((x-lo)/(hi-lo)*65536)` clamped to
    * [0, 65535]. Fixed double op order, engine-reproducible. A degenerate
    * range (hi == lo) maps everything to 0.
    */
  def norm16(x: Column, lo: Column, hi: Column): Column =
    normBits(x, lo, hi, 16)

  /** [[norm16]] at any width: `floor((x-lo)/(hi-lo)·2^bits)` clamped to
    * [0, 2^bits − 1]. */
  def normBits(x: Column, lo: Column, hi: Column, bits: Int): Column =
    when(hi === lo, lit(0L)).otherwise(
      greatest(lit(0L), least(lit((1L << bits) - 1),
        floor((x.cast("double") - lo) / (hi - lo) * (1L << bits).toDouble)
          .cast("long"))))

  /** Orderable double image of a STRING clustering column: strip the
    * batch's common prefix, then read the next 6 characters' first 6
    * UTF-8 bytes as an unsigned big-endian integer (48 bits — exact in
    * a double's 53-bit mantissa). Stripping is what makes the image
    * discriminate on real key shapes — URL keys share `https://host/`,
    * UUID-with-namespace keys share the namespace — and it is sound
    * because every value between the batch min and max (byte-wise
    * string order) shares THEIR common prefix. The suffix image is
    * monotonic in Spark's own string order (UTF8String compares bytes
    * unsigned, lexicographically; a short string zero-pads BELOW its
    * extensions), so min/max string stats and the prefix-image curve
    * agree — which is what lets string-keyed tables at lake scale
    * z-cluster and stat-skip like numeric ones. Keys identical through
    * prefix+6 collapse to one curve cell: clustering LOOSENS, the
    * in-file sort still separates them, correctness never moves (the
    * z-key is a layout device). Cost: ONE batch-sized min/max
    * aggregate per string dim at write time — read paths never pay it.
    */
  private def stringImage(df: DataFrame, c: String): Column = {
    val r = df.agg(min(col(c)), max(col(c))).head()
    val skip =
      if (r.isNullAt(0)) 0
      else {
        val (lo, hi) = (r.getString(0), r.getString(1))
        val n = lo.zip(hi).takeWhile { case (a, b) => a == b }.length
        // never split a surrogate pair: a dangling high surrogate is
        // not a whole character, so it cannot be part of a CHARACTER
        // prefix shared by every value
        if (n > 0 && Character.isHighSurrogate(lo.charAt(n - 1))) n - 1
        else n
      }
    // substring bounds the encode to ≤6 chars (≤24 bytes); the hex cut
    // takes exactly the first 6 BYTES, zero-padded; conv() reads the
    // unsigned value (the md5-bucket arithmetic Corpus.hashBucket
    // proved bit-portable)
    conv(rpad(substring(hex(encode(substring(col(c), skip + 1, 6),
      "UTF-8")), 1, 12), 12, "0"), 16, 10).cast("double")
  }

  /** Orderable double image of a clustering column: numerics cast,
    * dates to epoch days, timestamps to epoch micros (NTZ interpreted in
    * the project-wide UTC session), strings via [[stringImage]]'s
    * common-prefix-stripped 6-byte form. Types without range semantics
    * are rejected loudly — a silent null image would z-cluster nothing.
    */
  private def ord(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case _: NumericType  => col(c).cast("double")
      case DateType        => unix_date(col(c)).cast("double")
      case TimestampType   => unix_micros(col(c)).cast("double")
      case TimestampNTZType =>
        unix_micros(col(c).cast(TimestampType)).cast("double")
      case StringType      => stringImage(df, c)
      case other => throw new IllegalArgumentException(
        s"z-order dimension '$c' has unordered type $other; " +
          "cluster on numeric, date, timestamp, or string columns")
    }

  /** The z-order key for N orderable columns with in-plan bounds: one
    * 1-row min/max aggregate broadcast into the scan, then pure bitwise
    * arithmetic. Column name `zkey`.
    */
  def withZKey(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty && dims.distinct.size == dims.size,
      s"z-order dims must be distinct and non-empty: $dims")
    val bits = bitsFor(dims.size)
    val ords = dims.map(c => ord(df, c))
    val aggs = ords.zipWithIndex.flatMap { case (o, i) =>
      Seq(min(o).as(s"__zlo$i"), max(o).as(s"__zhi$i")) }
    val mm = df.agg(aggs.head, aggs.tail: _*)
    df.crossJoin(broadcast(mm))
      .withColumn("zkey", mortonKeyN(
        ords.zipWithIndex.map { case (o, i) =>
          normBits(o, col(s"__zlo$i"), col(s"__zhi$i"), bits) }, bits))
      .drop(ords.indices.flatMap(i => Seq(s"__zlo$i", s"__zhi$i")): _*)
  }

  /** Two-column [[withZKey]] (the common date+key case). */
  def withZKey(df: DataFrame, colA: String, colB: String): DataFrame =
    withZKey(df, Seq(colA, colB))

  /** Write `df` as `files` parquet files laid out along the z-curve of
    * `dims`: range-partition by zkey (contiguous curve segments per
    * file) and sort within each file, so every file's parquet min/max
    * covers a compact box in EVERY clustered dimension. The key itself
    * is dropped from the files — it is a layout device, not data.
    *
    * `bloomFor` columns additionally get parquet BLOOM FILTERS — the
    * point-lookup complement to range stats: min/max prunes boxes, but
    * an equality probe on a HIGH-CARDINALITY column not clustered
    * tightly enough (or not clustered at all) still opens every
    * surviving row group; a bloom filter answers "definitely absent"
    * per row group from a few KB of footer metadata, so a needle query
    * on 100 TB touches only the row groups that can hold the needle.
    * Costs a few KB per column per row group; spend it on the id-like
    * columns takedowns and lookups probe. Parquet itself DROPS the
    * bloom for any column chunk that ends up fully dictionary-encoded
    * — the dictionary is already an exact membership filter there, so
    * the footer carries one screening structure or the other, never
    * neither (LayoutSpec pins both regimes). `options` passes through
    * further parquet writer tuning (dictionary, page sizes, ndv
    * hints).
    */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[String],
                    files: Int, bloomFor: Seq[String] = Nil,
                    options: Map[String, String] = Map.empty): Unit =
    bloomOpts(
      withZKey(df, dims)
        .repartitionByRange(files, col("zkey"))
        .sortWithinPartitions(col("zkey"))
        .drop("zkey")
        .write.mode("overwrite"), bloomFor)
      .options(options)
      .parquet(path)

  private def bloomOpts(w: org.apache.spark.sql.DataFrameWriter[
      org.apache.spark.sql.Row], cols: Seq[String]) =
    cols.foldLeft(w)((w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true"))

  /** Two-column [[writeZOrdered]]. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    files: Int): Unit =
    writeZOrdered(df, path, Seq(colA, colB), files)

  // --- file-stats manifest + manifest-pruned reads ------------------
  //
  // The read-side half of the layout story: a Delta-style per-file
  // min/max/null-count table, built in one column-pruned scan after the
  // write, lets a reader skip whole FILES before Spark even lists them
  // into a scan — the level above parquet's own row-group stats (which
  // still apply inside every file that survives, the two compose). The
  // manifest is file-count-sized, never data-sized: at 100 TB it is a
  // few MB where the data is a few hundred thousand files.

  /** Inclusive range predicate on one clustered column, used both to
    * prune the manifest and to filter the surviving rows. */
  final case class ColRange(colName: String, lo: Column, hi: Column)

  /** Manifest location: a SIBLING directory, never inside the data path
    * (a reader globbing the data must not ingest stats rows). */
  def manifestPath(dataPath: String): String =
    dataPath.stripSuffix("/") + "_manifest"

  /** Manifests are PER-FLAT-DIRECTORY (ADVICE r7): the listing that
    * matches manifest rows to data files is non-recursive, so a
    * partitioned landing path (date=… subdirectories) must carry one
    * manifest per leaf directory, never one at the root — a root
    * manifest would see no files and prune everything. Enforced loudly
    * everywhere the listing happens.
    */
  private def requireFlatDir(fs: org.apache.hadoop.fs.FileSystem,
                             hp: org.apache.hadoop.fs.Path): Unit = {
    val subdirs = fs.listStatus(hp).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
    require(subdirs.isEmpty,
      s"manifests are per-flat-directory, but $hp contains " +
        s"subdirectories ${subdirs.mkString(", ")} — build one manifest " +
        "per leaf partition directory instead")
  }

  /** Manifest/lineage stat values at STABLE wide types (integral
    * min/max recorded as long, float as double): a later commit may
    * WIDEN the dimension's type (TimeTravel's evolution contract), and
    * a lineage whose `min_x` segments disagree int-vs-long would break
    * its own mergeSchema read. Widening the recorded value is lossless
    * and range comparisons coerce, so skip rates are unchanged. The
    * cast target comes from the batch's OWN schema (`schema`); a dim
    * absent from it (stats-less commit) keeps the old behavior.
    */
  private[sources] def statsAggs(
      schema: org.apache.spark.sql.types.StructType,
      dims: Seq[String]): Seq[Column] = {
    import org.apache.spark.sql.types._
    dims.flatMap { c =>
      val castTo: Option[String] =
        schema.fields.find(_.name == c).map(_.dataType).flatMap {
          case ByteType | ShortType | IntegerType => Some("long")
          case FloatType => Some("double")
          case _ => None
        }
      def w(x: Column) = castTo.fold(x)(x.cast)
      Seq(w(min(col(c))).as(s"min_$c"), w(max(col(c))).as(s"max_$c"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    }
  }

  /** The folded manifest: schema + collected rows + the listing
    * fingerprint that proves them current — the symmetric cache to
    * [[TimeTravel]]'s lineage snapshot (r17, VERDICT r16 #1: every
    * manifest consultation used to re-list AND re-read manifest parquet
    * per call; pruning / point lookup / delete screens / compaction all
    * paid footer sweeps the lineage side stopped paying in r16). A
    * manifest is file-count-sized by construction — one row per data
    * file — so the driver holds the same metadata Delta's snapshot
    * does; the 256-entry clear-all bounds cached TABLE count. */
  private final case class ManifestSnap(fingerprint: String,
      schema: org.apache.spark.sql.types.StructType,
      rows: Array[org.apache.spark.sql.Row])

  private val manifestSnapCache =
    new java.util.concurrent.ConcurrentHashMap[String, ManifestSnap]()

  /** Test/measurement seam, like [[TimeTravel.invalidateLineageCache]]:
    * drop every cached manifest snapshot so the next consultation pays
    * the cold path. Correctness never depends on it — the listing
    * fingerprint (per-file name:len:mtime plus file count and the
    * directory's own mtime, the delete-and-recreate discriminators)
    * already invalidates stale entries. */
  private[graft] def invalidateManifestCache(): Unit =
    manifestSnapCache.clear()

  /** Load (or reuse) one manifest directory's snapshot. One listing
    * decides staleness — every writer here appends a new part file or
    * staged-swaps the directory, both of which move the fingerprint —
    * and a hit costs ZERO Spark jobs (LayoutSpec pins this). A miss
    * reads with mergeSchema (rows appended across a dims change carry
    * different stat columns), falling back to a widening fold when
    * mergeSchema REFUSES — a manifest holding legacy int-typed
    * min_/max_ rows beside the stable-wide long ones ([[statsAggs]]'s
    * r15 change) must stay readable, not strand the table behind its
    * own cache (ADVICE r15). The fold reads each part's footer and
    * widens through [[TimeTravel.widenMerge]]'s safe lattice; values
    * then decode natively under the wide target. */
  private def manifestSnap(spark: SparkSession, mp: String): ManifestSnap = {
    val hp = new org.apache.hadoop.fs.Path(mp)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(hp)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    val dirM = fs.getFileStatus(hp).getModificationTime
    val fp = (s"n=${files.length}:dir=$dirM" +: files.toSeq.map(f =>
      s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}"))
      .mkString("|")
    val cached = manifestSnapCache.get(mp)
    if (cached != null && cached.fingerprint == fp) return cached
    val paths = files.map(_.getPath.toString).toSeq
    val df =
      if (paths.isEmpty)
        // no parquet parts (a directory holding only _SUCCESS, or an
        // interrupted swap): surface the same no-schema error a direct
        // directory read always gave, never cache it
        spark.read.parquet(mp)
      else
        try spark.read.option("mergeSchema", "true").parquet(paths: _*)
        catch {
          case _: org.apache.spark.SparkException =>
            val target = paths.map(p => spark.read.parquet(p).schema)
              .reduce((a, b) => TimeTravel.widenMerge(a, b,
                s"manifest of $mp"))
            spark.read.schema(target).parquet(paths: _*)
        }
    val snap = ManifestSnap(fp, df.schema, df.collect())
    if (manifestSnapCache.size > 256) manifestSnapCache.clear()
    manifestSnapCache.put(mp, snap)
    snap
  }

  /** Every manifest consultation's read — a LocalRelation over the
    * snapshot's driver-held rows, so downstream prune filters, candidate
    * joins, and staleness anti-joins cost local jobs, never parquet
    * re-reads. No checkpoint-fold counterpart is needed here: the
    * manifest's fold IS [[compactManifest]], and unlike the lineage it
    * keeps no history — one row per live file, ever. */
  private[graft] def readManifestMerged(spark: SparkSession,
                                        mp: String): DataFrame = {
    val s = manifestSnap(spark, mp)
    spark.createDataFrame(java.util.Arrays.asList(s.rows: _*), s.schema)
  }

  /** Union of several manifests' snapshots under one merged schema:
    * unionByName null-fills columns a branch lacks (rows appended
    * before a dims change) and Spark's set-operation coercion widens
    * int/long stat splits across branches — the same result shape the
    * old whole-family mergeSchema read produced, now per-path cached. */
  private[sources] def readManifestsMerged(spark: SparkSession,
                                           mps: Seq[String]): DataFrame =
    mps.map(readManifestMerged(spark, _))
      .reduce((a, b) => a.unionByName(b, allowMissingColumns = true))

  /** Build the file-level stats manifest for `dims`: one row per data
    * file with row count and per-dimension min/max/null-count. */
  def writeManifest(spark: SparkSession, dataPath: String,
                    dims: Seq[String]): Unit = {
    val hp = new org.apache.hadoop.fs.Path(dataPath)
    requireFlatDir(hp.getFileSystem(spark.sparkContext.hadoopConfiguration),
      hp)
    val base = spark.read.parquet(dataPath)
    base
      .groupBy(input_file_name().as("file_name"))
      .agg(count(lit(1)).as("n_rows"), statsAggs(base.schema, dims): _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestPath(dataPath))
  }

  /** Files whose per-dimension [min, max] intersects every requested
    * range, plus the total file count for skip-rate evidence. Files
    * holding nulls in a ranged dimension are conservatively kept (stats
    * cannot prove their rows miss; the row filter still excludes them).
    * The collects are bounded by SURVIVORS — the kept files a caller is
    * about to read plus one batch's unmanifested files — never by the
    * manifest's total row count and never by data rows.
    *
    * STALENESS GUARD (ADVICE r7): the manifest is NOT the source of
    * truth — the data directory is. Data files present in the directory
    * but absent from the manifest (a batch landed whose
    * [[updateManifest]] hasn't run, an external writer) are
    * conservatively KEPT UNPRUNED: a stale manifest may only cost skip
    * rate, never rows. The guard is one directory listing — the same
    * file-count-sized call updateManifest makes — so pruning cost stays
    * metadata-sized.
    */
  def pruneFiles(spark: SparkSession, dataPath: String,
                 ranges: Seq[ColRange]): (Seq[String], Long) =
    pruneFilesAt(spark, dataPath, manifestPath(dataPath), ranges)

  /** The conservative per-file stats KEEP predicate for one range — the
    * single source of truth for flat AND partitioned pruned reads
    * (their semantics must stay byte-identical): keep when [min, max]
    * intersects, when the file holds nulls in the dimension (stats
    * cannot prove its rows miss), or when the manifest row predates the
    * dimension joining the stats schema (`nulls_<col> IS NULL` — an
    * authentic row's null counter is never null).
    */
  private[sources] def rangeKeep(r: ColRange): Column =
    col(s"max_${r.colName}") >= r.lo && col(s"min_${r.colName}") <= r.hi ||
      col(s"nulls_${r.colName}") > 0 ||
      col(s"nulls_${r.colName}").isNull

  /** The doomed-id candidate condition for deletes (manifest row side
    * vs a `__del` id column) — shared by the flat delete and the
    * partitioned leaf pre-pruning, which must agree or a leaf the
    * pre-prune skips could hold a row the per-leaf delete would have
    * caught: a file can hold id x iff min<=x<=max; null ids live only
    * in files whose null count says so; a pre-dims-change row cannot be
    * proven id-free.
    */
  private def idCandidateCond(idCol: String): Column =
    (col("__del") >= col(s"min_$idCol") &&
      col("__del") <= col(s"max_$idCol")) ||
      (col("__del").isNull && col(s"nulls_$idCol") > 0) ||
      col(s"nulls_$idCol").isNull

  /** Directory exists and holds at least one entry — the collision test
    * for crash-recovery scratch: an EMPTY leftover directory (mkdirs
    * raced, or everything already recovered out of it) blocks nothing.
    */
  private def nonEmptyDir(fs: org.apache.hadoop.fs.FileSystem,
                          p: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(p) && fs.listStatus(p).nonEmpty

  private def pruneFilesAt(spark: SparkSession, dataPath: String,
                           mpStr: String,
                           ranges: Seq[ColRange]): (Seq[String], Long) = {
    val hp = new org.apache.hadoop.fs.Path(dataPath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireFlatDir(fs, hp)
    val listed = fs.listStatus(hp).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
    // no manifest yet: the staleness stance, taken whole — every file
    // is conservatively unmanifested, the read degrades to a full scan
    // (the partitioned path and lookupByIds already did this; the flat
    // path used to throw PATH_NOT_FOUND, contradicting its own guard)
    if (!fs.exists(new org.apache.hadoop.fs.Path(mpStr)))
      return (listed.map(_.toString).toSeq.sorted, listed.length.toLong)
    // mergeSchema + the nulls_<col> IS NULL keep: manifest rows
    // appended before a dims change lack the newer stat columns, and
    // those files must stay unpruned, never silently dropped under a
    // first-file schema (same discriminator as leafManifests — an
    // authentic row's nulls counter is never null)
    val m = readManifestMerged(spark, mpStr)
    val kept = ranges.foldLeft(m)((df, r) => df.filter(rangeKeep(r)))
    // staleness guard via the anti-join survivor helper: only the files
    // the manifest has NEVER seen (one batch's worth) reach the driver,
    // never the full manifest name set (VERDICT r10 — the last
    // table-file-count-scaling collect in the layout layer)
    val fresh =
      unmanifestedNames(m, listed.map(_.getName).toIndexedSeq)
    // kept files resolve through the LISTING by base name, never the
    // manifest's file_name URI verbatim: input_file_name percent-encodes
    // a data PATH with URI-encodable characters ('/data/events 2024' →
    // 'events%202024'), which spark.read cannot resolve against the raw
    // directory — the same hazard the partitioned path already names
    val keptNames = kept
      .select(element_at(split(col("file_name"), "/"), -1))
      .collect().map(_.getString(0)).toSet
    val files = listed
      .filter(p => keptNames.contains(p.getName) || fresh.contains(p.getName))
      .map(_.toString).toSeq.sorted
    (files, m.count() + listed.count(p => fresh.contains(p.getName)))
  }

  /** Append `df` to an existing z-ordered table as `files` new parquet
    * files, clustered within the BATCH's own bounds. Pruning correctness
    * never depends on clustering quality — the manifest records each
    * file's ACTUAL min/max — so bounds drift between batches only
    * loosens skip rates, never results. Exactly-once is the ingestion
    * layer's job: this is a file-level append (a blindly retried batch
    * writes duplicate ROWS, unlike the id-keyed index appends); route
    * at-least-once sources through [[graft.operators.Dedup]] first.
    */
  def appendZOrdered(df: DataFrame, path: String, dims: Seq[String],
                     files: Int, bloomFor: Seq[String] = Nil): Unit =
    bloomOpts(
      withZKey(df, dims)
        .repartitionByRange(files, col("zkey"))
        .sortWithinPartitions(col("zkey"))
        .drop("zkey")
        .write.mode("append"), bloomFor)
      .parquet(path)

  /** Needle lookup: rows whose `idCol` equals one of the literal `ids`.
    * Three pruning levels compose: when `idCol` is a manifest dimension
    * the per-file [min, max] drops whole files first (staleness-
    * conservative, like every pruned read here); the pushed `IN` then
    * drives parquet row-group skipping via min/max stats inside each
    * surviving file; and when the table was written with `bloomFor`
    * the column, row groups whose stats can't disprove the needle are
    * still skipped by the bloom filter — the level that matters for a
    * high-cardinality probe column the z-order doesn't cluster.
    * `ids` are driver literals by design (a needle query's ids ARE
    * metadata; a large id FRAME is [[deleteByIds]]/join territory).
    */
  def lookupByIds(spark: SparkSession, dataPath: String, idCol: String,
                  ids: Seq[Any]): DataFrame = {
    require(ids.nonEmpty && ids.size <= 10000,
      s"lookupByIds wants a bounded literal needle set, got ${ids.size}")
    val mp = new org.apache.hadoop.fs.Path(manifestPath(dataPath))
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // mergeSchema everywhere the manifest is consulted: under a dims
    // change only SOME manifest segments carry the idCol stats, and a
    // first-file schema would either hide them (losing pruning) or
    // null them out (silently pruning files whose rows it cannot
    // prove absent — missed needles). Rows lacking the stats keep
    // their files via the nulls_<col> IS NULL discriminator.
    // read the manifest ONCE: mergeSchema infers by sweeping every
    // segment's footer, so probing hasStats on one read and pruning on
    // another paid that sweep twice per lookup
    val mOpt =
      if (!fs.exists(mp)) None
      else Some(readManifestMerged(spark, manifestPath(dataPath)))
    val base = mOpt.filter(_.columns.contains(s"min_$idCol")) match {
      case None => spark.read.parquet(dataPath)
      case Some(m) =>
        val hit = ids.map(i =>
          col(s"min_$idCol") <= lit(i) && col(s"max_$idCol") >= lit(i))
          .reduce(_ || _) || col(s"nulls_$idCol") > 0 ||
          col(s"nulls_$idCol").isNull
        val kept = m.filter(hit).select(col("file_name")).collect()
          .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName)
          .toSet
        val hp = new org.apache.hadoop.fs.Path(dataPath)
        requireFlatDir(fs, hp)
        val listed = fs.listStatus(hp).map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
        // files the manifest has never statted must be read (staleness-
        // conservative); computed as an anti-join so only the survivors
        // — not the whole manifest's name set — reach the driver
        val fresh = unmanifestedNames(m, listed.map(_.getName).toIndexedSeq)
        val files = listed
          .filter(p => kept.contains(p.getName) || fresh.contains(p.getName))
          .map(_.toString).toSeq.sorted
        if (files.isEmpty) spark.read.parquet(dataPath).limit(0)
        else spark.read.parquet(files: _*)
    }
    base.filter(col(idCol).isin(ids: _*))
  }

  /** Two-column [[appendZOrdered]]. */
  def appendZOrdered(df: DataFrame, path: String, colA: String,
                     colB: String, files: Int): Unit =
    appendZOrdered(df, path, Seq(colA, colB), files)

  /** Incremental manifest update: stat ONLY data files not yet in the
    * manifest and append their rows — cost is O(new files' rows), never
    * a rescan of the table (the point at 100 TB, where the base is the
    * whole lake and a batch is one day). Files are matched by NAME
    * (globally unique `part-…-uuid` parquet names), which survives the
    * `file:/` vs `file:///` URI-form split between Hadoop listings and
    * `input_file_name`. Returns how many new files were statted; 0 is
    * the idempotent no-op (calling twice appends nothing). Creates the
    * manifest when none exists.
    */
  def updateManifest(spark: SparkSession, dataPath: String,
                     dims: Seq[String]): Int =
    updateManifestAt(spark, dataPath, manifestPath(dataPath), dims)

  private def updateManifestAt(spark: SparkSession, dataPath: String,
                               mp: String, dims: Seq[String]): Int = {
    val hp = new org.apache.hadoop.fs.Path(dataPath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireFlatDir(fs, hp)
    val dataFiles = fs.listStatus(hp).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
    val freshNames: Set[String] =
      if (!fs.exists(new org.apache.hadoop.fs.Path(mp)))
        dataFiles.map(_.getName).toSet
      else unmanifestedNames(readManifestMerged(spark, mp),
        dataFiles.map(_.getName).toIndexedSeq)
    val fresh = dataFiles.filter(p => freshNames.contains(p.getName))
    if (fresh.isEmpty) return 0
    appendStatsSegment(spark, mp, fresh.map(_.toString).toIndexedSeq, dims)
    fresh.length
  }

  /** Stat `files` and append their rows to the manifest at `mp` — the
    * one segment writer both the flat and partitioned refreshers use.
    *
    * ZERO-ROW files (an all-doomed delete's staged survivor, an empty
    * appended batch, an external writer's schema-only file) produce no
    * group row from the stats aggregation, so they would stay
    * unmanifested FOREVER — every subsequent refresh re-stats them and
    * appends another empty segment, breaking the documented "0 is the
    * idempotent no-op". Their rows are SYNTHESIZED: n_rows=0, typed-null
    * min/max (a null bound never satisfies a range keep — exactly
    * right, the file has no rows), and ZERO null-counts (null counters
    * are the schema-drift discriminator; a synthetic row must read as
    * authentic).
    */
  private def appendStatsSegment(spark: SparkSession, mp: String,
                                 files: Seq[String],
                                 dims: Seq[String]): Unit = {
    // Footer-derived stats first (r17, [[FooterStats]]): the files
    // being statted were just written by this engine, so re-scanning
    // their data to re-derive what their footers already record paid a
    // second full pass per manifest refresh. The recorded `file_name`
    // must be BYTE-IDENTICAL to what `input_file_name()` would have
    // recorded — `Path.toUri.toString` is exactly the URI string the
    // scan publishes — so the footer path refuses any path whose URI
    // form contains percent-escapes (an encoding round-trip this
    // module documents as hazardous) and falls back to the aggregate.
    val footer: Option[DataFrame] = {
      val pairs = files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        (p.toUri.toString, p)
      }
      if (pairs.exists(x => x._1.contains('%') || f2raw(x._1) != x._1))
        None
      else FooterStats.statsDf(spark, pairs,
        spark.read.parquet(files: _*).schema, dims)
    }
    val stats = footer.getOrElse {
      // localCheckpoint: the scan-derived stats frame is consumed twice
      // (the write and the statted-name probe) and must not recompute
      // between them
      val base = spark.read.parquet(files: _*)
      base
        .groupBy(input_file_name().as("file_name"))
        .agg(count(lit(1)).as("n_rows"), statsAggs(base.schema, dims): _*)
        .localCheckpoint()
    }
    if (stats.limit(1).head(1).nonEmpty)
      stats.coalesce(1).write.mode("append").parquet(mp)
    val statted = stats
      .select(element_at(split(col("file_name"), "/"), -1))
      .collect().map(_.getString(0)).toSet
    val empties = files.filterNot(f =>
      statted.contains(new org.apache.hadoop.fs.Path(f).getName))
    if (empties.nonEmpty) {
      import spark.implicits._
      val base = empties.map(f => (f, 0L)).toDF("file_name", "n_rows")
      val withStats = dims.foldLeft(base) { (df, d) =>
        // typed nulls: parquet cannot write NullType columns, and the
        // synthetic segment must merge with authentic ones
        df.withColumn(s"min_$d",
            lit(null).cast(stats.schema(s"min_$d").dataType))
          .withColumn(s"max_$d",
            lit(null).cast(stats.schema(s"max_$d").dataType))
          .withColumn(s"nulls_$d", lit(0L))
      }
      withStats.coalesce(1).write.mode("append").parquet(mp)
    }
  }

  /** Identity marker for the footer path's encoding guard: the URI
    * string must survive a Path round-trip unchanged, or the recorded
    * name could diverge from `input_file_name()`'s form. */
  private def f2raw(uri: String): String =
    new org.apache.hadoop.fs.Path(uri).toUri.toString

  /** Rewrite a many-file manifest (one file per [[updateManifest]] call)
    * down to one, preserving rows exactly — the same staged-write + swap
    * as the dedup index compactions, safe against concurrent readers of
    * the old files. Quiesce WRITERS first (an update landing mid-compact
    * is lost with the old directory).
    */
  def compactManifest(spark: SparkSession, dataPath: String): Unit = {
    val mp = manifestPath(dataPath)
    graft.operators.Lifecycle.stagedSwap(spark, mp) { staged =>
      // mergeSchema like every manifest consultation: segments written
      // across a dims change carry different stat columns, and a
      // first-file-schema rewrite would PERMANENTLY drop the others'
      // stats (pruned reads on the lost dimension then throw and the
      // stats are unrecoverable short of a full re-stat)
      readManifestMerged(spark, mp).coalesce(1)
        .write.mode("overwrite").parquet(staged)
    }
  }

  // --- targeted row deletes (manifest-pruned file rewrite) ----------
  //
  // The data-file half of the delete story the five index families got
  // in round 8 (takedown / license retraction — routine in
  // training-data pipelines; the reference models deletes via FK
  // cascade actions, schema.sql:60-64). An index tombstone hides rows
  // a PROBE would surface; the lake table itself still holds the bytes
  // until they are physically rewritten. At 100 TB a whole-table
  // rewrite for a thousand-row takedown is absurd — the manifest's
  // per-file min/max on the id dimension bounds the rewrite to the
  // files that can actually hold a doomed id, exactly the way Delta's
  // stats-pruned DELETE works.

  /** Physically remove rows whose `idCol` value appears in `ids` from a
    * z-ordered table, rewriting ONLY the files whose manifest id range
    * (or presence of null ids, for null deletions — matched null-safely
    * throughout) intersects the delete set. `idCol` must be one of the
    * manifest `dims` — that is what makes the rewrite targeted; pruning
    * on a column without file stats would silently mean "rewrite
    * everything".
    *
    * Staleness-conservative, mirroring [[pruneFiles]]'s guard in the
    * direction a DELETE needs: data files absent from the manifest
    * (landed batch, external writer) are always rewrite candidates — a
    * stale manifest may cost rewrite work, never retain a doomed row.
    * With no manifest at all, every file is a candidate (the honest
    * degenerate case).
    *
    * Idempotent: a replayed delete finds no matching rows in the
    * candidate files and returns 0 without writing anything. Returns
    * the number of files rewritten otherwise.
    *
    * Commit discipline: surviving rows are staged as new z-clustered
    * files NEXT TO the table, then promoted with the retire-first
    * rename rule ([[graft.operators.Dedup.swapTable]]'s, per file):
    * candidates rename into a retired directory, staged files rename
    * in, retired/staged directories drop, manifest reconciles. Quiesce
    * readers and writers across the call, like every index compaction
    * here; a crash mid-commit leaves the originals intact under
    * `<path>_delete_retired` and is recovered by [[reconcileManifest]]
    * once the files are restored or the promotion finished by hand.
    */
  def deleteByIds(spark: SparkSession, dataPath: String, dims: Seq[String],
                  idCol: String, ids: DataFrame): Int =
    deleteRetaining(spark, dataPath, dims, idCol, ids, vault = None)

  /** [[deleteByIds]] with a retention hook: when `vault` is set, the
    * rewritten (pre-delete) original files are MOVED there instead of
    * dropped, so the bytes a delete retires stay readable until the
    * caller drops the vault — the safety net [[upsertByIds]] uses to
    * close its delete→append crash window, and the storage primitive a
    * snapshot/time-travel layer would build on. File names are globally
    * unique (`part-…-uuid`), so the vault is a flat name-keyed store
    * that never collides across deletes. The vault receives files only
    * AFTER the rewrite is promoted; a crash mid-commit leaves them
    * under `<path>_delete_retired` exactly as [[deleteByIds]] documents.
    * A missing data directory deletes nothing and returns 0.
    */
  private[graft] def deleteRetaining(spark: SparkSession, dataPath: String,
                                       dims: Seq[String], idCol: String,
                                       ids: DataFrame,
                                       vault: Option[String]): Int =
    deleteRetainingAt(spark, dataPath, manifestPath(dataPath),
      dataPath.stripSuffix("/") + "_deleting",
      dataPath.stripSuffix("/") + "_delete_retired",
      dims, idCol, ids, vault)

  /** [[deleteRetaining]] with every side location explicit — the flat
    * table passes its sibling-directory defaults; a partitioned leaf
    * passes its `root/_manifests/<leaf>` manifest and stages under the
    * root's underscore-prefixed scratch area (a sibling of a `k=v`
    * leaf would itself parse as a partition directory to any
    * concurrent partition discovery).
    */
  private def deleteRetainingAt(spark: SparkSession, dataPath: String,
                                mpStr: String, stagedStr: String,
                                retiredStr: String, dims: Seq[String],
                                idCol: String, ids: DataFrame,
                                vault: Option[String]): Int = {
    require(dims.contains(idCol),
      s"delete column '$idCol' is not a manifest dimension $dims — " +
        "file pruning needs its per-file stats; cluster and manifest " +
        "on the delete key")
    val hp = new org.apache.hadoop.fs.Path(dataPath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) return 0
    requireFlatDir(fs, hp)
    val dataFiles = fs.listStatus(hp).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    if (dataFiles.isEmpty) return 0
    val idv = ids.select(col(idCol).as("__del")).distinct()
    val mp = new org.apache.hadoop.fs.Path(mpStr)
    val (candidateNames, freshNames) =
      if (!fs.exists(mp)) (Set.empty[String], dataFiles.map(_.getName).toSet)
      else {
        val m = readManifestMerged(spark, mpStr)
        // a file can hold id x iff min<=x<=max; null ids live only in
        // files whose null count says so; a pre-dims-change manifest
        // row (nulls_<idCol> IS NULL — see pruneFilesAt) cannot be
        // proven id-free, so its file stays a candidate
        val cand = m.join(broadcast(idv), idCandidateCond(idCol),
            "left_semi")
          .select(col("file_name")).collect()
          .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName)
          .toSet
        // unmanifested files may hold any id: anti-join survivors only,
        // never the full manifest name set on the driver
        val fresh = unmanifestedNames(m, dataFiles.map(_.getName).toIndexedSeq)
        (cand, fresh)
      }
    val candidates = dataFiles.filter(p =>
      candidateNames.contains(p.getName) || freshNames.contains(p.getName))
    if (candidates.isEmpty) return 0
    val candDf = spark.read.parquet(candidates.map(_.toString).toIndexedSeq: _*)
    val doomed = candDf.join(idv, col(idCol) <=> col("__del"), "left_semi")
    if (doomed.limit(1).head(1).isEmpty) return 0 // replayed delete
    val surviving = candDf.join(idv, col(idCol) <=> col("__del"), "left_anti")
    val staged = stagedStr
    val sp = new org.apache.hadoop.fs.Path(staged)
    val retired = new org.apache.hadoop.fs.Path(retiredStr)
    // CRASH-RESIDUE COLLISION (the stagedSwap contract, not the old
    // silent clobber): a NON-EMPTY retired directory is a previous
    // delete that crashed mid-promotion — those files may be the ONLY
    // copies of their rows, and deleting them here would be permanent,
    // silent row loss. A non-empty staged directory is a previous
    // delete's survivors (or a live concurrent writer). Both fail
    // loudly; the live table is intact in every branch.
    if (nonEmptyDir(fs, retired))
      throw new IllegalStateException(
        s"retired directory $retiredStr is not empty: a previous delete " +
          s"crashed mid-promotion on $dataPath and those files may be " +
          "the only copies of their rows. Rename them back into the " +
          "data directory, run reconcileManifest, and retry. Nothing " +
          "was touched.")
    if (nonEmptyDir(fs, sp))
      throw new IllegalStateException(
        s"staged directory $stagedStr is not empty: either a concurrent " +
          s"writer is mid-delete on $dataPath (writers must be " +
          "serialized per table) or a previous delete crashed before " +
          "its promotion. The live table is intact; after confirming " +
          s"no other writer is running, delete $stagedStr and retry.")
    fs.delete(sp, true)
    // re-cluster the surviving subset along the table's own curve —
    // the manifest records actual min/max, so subset bounds only shape
    // skip rates, never results (same contract as appendZOrdered)
    withZKey(surviving, dims)
      .repartitionByRange(math.max(1, candidates.length), col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .drop("zkey")
      .write.mode("overwrite").parquet(staged)
    fs.mkdirs(retired) // empty-or-absent: the collision check above ran
    candidates.foreach { p =>
      require(fs.rename(p, new org.apache.hadoop.fs.Path(retired, p.getName)),
        s"delete: could not retire $p — table unchanged so far; " +
          s"restore any files already under $retired and retry")
    }
    fs.listStatus(sp).map(_.getPath).filter(_.getName.endsWith(".parquet"))
      .foreach { p =>
        require(fs.rename(p, new org.apache.hadoop.fs.Path(hp, p.getName)),
          s"delete: could not promote $p — originals intact under " +
            s"$retired; rename them back to recover")
      }
    fs.delete(sp, true)
    vault match {
      case None => fs.delete(retired, true)
      case Some(v) =>
        val vp = new org.apache.hadoop.fs.Path(v)
        fs.mkdirs(vp)
        fs.listStatus(retired).map(_.getPath).foreach { p =>
          require(fs.rename(p, new org.apache.hadoop.fs.Path(vp, p.getName)),
            s"delete: could not vault $p — the table is already " +
              s"promoted; move the remaining files under $retired to $v " +
              "by hand to keep old snapshots readable")
        }
        fs.delete(retired, true)
    }
    if (fs.exists(mp)) reconcileManifestAt(spark, dataPath, mpStr, dims): Unit
    candidates.length
  }

  /** Keyed upsert (MERGE): replace every row whose `idCol` value appears
    * in `updates` with the update batch's rows for that key, and insert
    * rows for keys the table has never seen — the CDC apply step a lake
    * table needs (the reference's row updates are SQL UPDATEs through
    * its app layer, `server.py` write paths; here they arrive as a
    * batch). Semantics are per-KEY, not per-row: all existing rows for
    * a matched key are removed, then the batch's rows for it land — so
    * a key's row count may change, which is exactly what replacing an
    * order's line set means.
    *
    * Cost model is the point: the delete half rewrites ONLY the files
    * whose manifest id range can hold a matched key ([[deleteByIds]]'s
    * pruning), the insert half is a plain clustered append — at 100 TB
    * an upsert touching one day's keys rewrites a few files, never the
    * table. The manifest is reconciled (delete) and incrementally
    * updated (append) so pruned reads stay exact. A data path that does
    * not exist yet degrades to a pure insert (the first-batch MERGE
    * needs no pre-created directory).
    *
    * SOURCE DETERMINISM (ADVICE r8): `updates` is MATERIALIZED
    * (localCheckpoint — computed once, lineage cut) before the delete
    * half runs, so a non-deterministic source (sample/limit, a mutating
    * external table) or an `updates` derived from reading `dataPath`
    * itself cannot diverge between the key-set the delete sees and the
    * rows the append lands — the same reason Delta materializes its
    * MERGE source.
    *
    * CRASH WINDOW (ADVICE r8): the two halves are not one atomic
    * commit, so the delete routes through the retention vault
    * (`<path>_upsert_vault`): the pre-delete originals of every
    * rewritten file sit there until the append AND manifest update have
    * landed, and only then is the vault dropped. Recovery after a crash
    * between the halves is therefore never lossy — replay the SAME
    * upsert batch with `resumeVault = true` and it converges (the
    * delete half finds nothing, the append lands, the vault drops); if
    * the batch itself is unrecoverable, the pre-upsert rows for the
    * matched keys are intact in the vault (copy them back into the
    * table and [[reconcileManifest]]). A non-empty vault BLOCKS any
    * other upsert loudly (r12): the vaulted files may be the only
    * copies of their rows, so only the explicit resume — or manual
    * recovery — may clear them, never an unrelated batch's cleanup.
    *
    * REPLAY (VERDICT r8): pass `batchId` to make replays exact no-ops
    * via the applied-batch [[graft.operators.Ledger]] at
    * `<path>_upsert_ledger` — a recorded id returns 0 without reading
    * anything but the ledger's pushed-down point filter. The id is
    * recorded only after the vault drops, so a crashed run replays in
    * full (converging, per the paragraph above). Without a `batchId`, a
    * replayed upsert still converges to the same table state but
    * rewrites files each time. Returns the number of files the delete
    * half rewrote (0 for a ledger-skipped replay).
    */
  def upsertByIds(spark: SparkSession, dataPath: String, dims: Seq[String],
                  idCol: String, updates: DataFrame, files: Int,
                  batchId: Option[String] = None,
                  resumeVault: Boolean = false): Int = {
    val hp = new org.apache.hadoop.fs.Path(dataPath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ledger = dataPath.stripSuffix("/") + "_upsert_ledger"
    batchId.foreach { id =>
      if (!fs.exists(new org.apache.hadoop.fs.Path(ledger)))
        graft.operators.Ledger.init(spark, ledger)
      else if (graft.operators.Ledger.contains(spark, ledger, id)) return 0
    }
    val mat = updates.localCheckpoint()
    val vault = dataPath.stripSuffix("/") + "_upsert_vault"
    // VAULT COLLISION: a non-empty vault is a previous upsert that
    // crashed between its halves — its files are the pre-delete
    // originals of keys whose replacement rows never landed, i.e. the
    // only copies. The old behavior let ANY next upsert succeed and
    // drop them silently. Now: replaying the SAME batch (the documented
    // converging recovery) passes `resumeVault = true` — the replay
    // absorbs the crash and the vault drops with it; a DIFFERENT batch
    // fails loudly instead of destroying another run's recovery copies.
    if (!resumeVault && nonEmptyDir(fs, new org.apache.hadoop.fs.Path(vault)))
      throw new IllegalStateException(
        s"upsert vault $vault is not empty: a previous upsert crashed " +
          s"between its delete and append halves on $dataPath. Replay " +
          "THAT batch with resumeVault = true (it converges and clears " +
          "the vault), or copy the vaulted files back into the table " +
          "and reconcileManifest. Nothing was touched.")
    val rewritten =
      if (!fs.exists(hp)) 0
      else deleteRetaining(spark, dataPath, dims, idCol,
        mat.select(col(idCol)), vault = Some(vault))
    appendZOrdered(mat, dataPath, dims, files)
    updateManifest(spark, dataPath, dims): Unit
    fs.delete(new org.apache.hadoop.fs.Path(vault), true): Unit
    batchId.foreach(graft.operators.Ledger.record(spark, ledger, _))
    rewritten
  }

  /** The manifest rows whose file still exists in the directory,
    * expressed as a JOIN against a frame of present base names — never
    * an `isin` literal list (VERDICT r8): at 100-TB file counts
    * (10⁵–10⁶ files) a driver-built In-expression with one literal per
    * kept file is a planner and driver-memory hazard, while a
    * LocalRelation of the same names broadcasts like any small dim.
    * The base name is computed in-plan (`file_name` is a full URI whose
    * `file:/` vs `file:///` form varies between Hadoop listings and
    * `input_file_name`; the name is the stable key).
    */
  private[graft] def keepRowsPlan(m: DataFrame,
                                    present: Seq[String]): DataFrame = {
    val spark = m.sparkSession
    import spark.implicits._
    val presentDf = present.toDF("__present_name")
    m.withColumn("__base", element_at(split(col("file_name"), "/"), -1))
      .join(broadcast(presentDf), col("__base") === col("__present_name"),
        "left_semi")
      .drop("__base")
  }

  /** The listed base names the manifest has never seen, as an anti-join
    * against the manifest's in-plan base names — never a driver-side
    * collect of the FULL manifest name set (VERDICT r9: `lookupByIds` /
    * `updateManifest` / delete's known-file discovery all collected every
    * manifest row's name to subtract it from the listing; at 100-TB file
    * counts that set is 10⁵–10⁶ strings of driver memory scaling with
    * TABLE size, while the survivors — one batch's unmanifested files —
    * stay bounded). The listing side is already driver-resident (it came
    * from `fs.listStatus`), so only the manifest side needed to move
    * into the plan; the collect here returns survivors only.
    */
  private[graft] def unmanifestedNamesPlan(m: DataFrame,
                                           listed: Seq[String]): DataFrame = {
    val spark = m.sparkSession
    import spark.implicits._
    listed.toDF("__listed_name")
      .join(m.select(
          element_at(split(col("file_name"), "/"), -1).as("__base")),
        col("__listed_name") === col("__base"), "left_anti")
  }

  private def unmanifestedNames(m: DataFrame, listed: Seq[String]): Set[String] =
    unmanifestedNamesPlan(m, listed).collect().map(_.getString(0)).toSet

  // ---- partitioned-table helpers: ONE global pass over every leaf's
  // manifest instead of per-leaf Spark jobs (r11: updateManifest /
  // prunedRead / delete each ran 1-4 jobs per leaf even for untouched
  // leaves, so any operation on a 1000-partition table paid minutes of
  // serial no-op work; these make the job count O(touched), with
  // driver-resident listings — one RPC per leaf — as the only
  // per-leaf cost, the same accepted cost as the flat listing path).

  /** Union frame of the given leaves' manifests, each row tagged with
    * its leaf name (`__leaf`, the `k=v` path component of file_name,
    * URI-DECODED — input_file_name records percent-encoded URIs while
    * fs listings return raw directory names, so 'k=a b' on disk
    * appears as 'k=a%20b' in file_name; one decode makes the two
    * comparable for every encodable character, including Hive's own
    * %-escapes, which the URI layer double-encodes).
    *
    * Read with mergeSchema: manifests appended across a dims change
    * carry different stat columns, and the default first-file schema
    * would silently null-out (or drop) the others' stats. Under the
    * merged schema an old-schema row reads NULL for a missing stat's
    * `nulls_<col>` counter — which an authentic row can never be
    * (counts are never null) — so consumers use `nulls_<col> IS NULL`
    * as the schema-drift discriminator and treat such files
    * conservatively (kept in reads, processed in deletes): stale stat
    * schemas may only cost skip rate, never rows.
    */
  private def leafManifests(spark: SparkSession, root: String,
                            ls: Seq[String]): DataFrame =
    readManifestsMerged(spark,
        ls.map(l => partitionManifestPath(root, l)))
      .withColumn("__leaf",
        uriDecode(element_at(split(col("file_name"), "/"), -2)))

  /** Decode ONLY `%XX` escapes of a URI path component — never `+`.
    *
    * `url_decode` follows `java.net.URLDecoder` (form-encoding)
    * semantics, where a literal `+` decodes to a space; but the
    * strings decoded here are URI PATH components from
    * `input_file_name`, whose encoder (Hadoop `Path` → `java.net.URI`)
    * never escapes `+`. A partition value containing `+` (directory
    * `part=a+b`) would therefore decode to `a b` and never match its
    * raw fs-listing name — silently re-statting the leaf's files on
    * every manifest refresh and appending duplicate manifest rows
    * unboundedly (ADVICE r11). Pre-escaping `+` as `%2B` makes
    * `url_decode` an exact %XX-only decoder.
    */
  private def uriDecode(c: Column): Column =
    url_decode(regexp_replace(c, "\\+", "%2B"))

  /** Driver-side twin of [[uriDecode]]: %XX-only decode of a
    * Hive-escaped directory value or URI path component — never '+'.
    * The one place the load-bearing invariant ("the Hive and URI path
    * encoders never write '+' for space, so a literal '+' must survive
    * decoding") lives for driver-side strings; keep every string-side
    * decode on this helper so a future escaping fix lands once.
    */
  private[graft] def decodePathComponent(s: String): String =
    try java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")
    catch { case _: IllegalArgumentException => s }

  /** (leaf, basename, fullPath) of every data file under the given
    * leaves; each leaf's flat-dir invariant checked like every flat
    * listing here. */
  private def listLeafFiles(fs: org.apache.hadoop.fs.FileSystem,
                            root: String, ls: Seq[String])
      : Seq[(String, String, String)] =
    ls.flatMap { leaf =>
      val lp = new org.apache.hadoop.fs.Path(
        root.stripSuffix("/") + "/" + leaf)
      requireFlatDir(fs, lp)
      fs.listStatus(lp).map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
        .map(p => (leaf, p.getName, p.toString))
    }

  /** The listed (leaf, basename, path) triples whose leaf's manifest
    * has never seen them — one global anti-join on (leaf, basename)
    * against a [[leafManifests]] frame (whose `__leaf` is already
    * URI-decoded to match raw listing names); only the survivors reach
    * the driver. */
  private def unmanifestedLeafFiles(m: DataFrame,
      listed: Seq[(String, String, String)])
      : Seq[(String, String, String)] = {
    if (listed.isEmpty) return Nil
    val spark = m.sparkSession
    import spark.implicits._
    val byKey = listed.map(t => (t._1, t._2) -> t._3).toMap
    listed.map(t => (t._1, t._2)).toDF("__lleaf", "__lname")
      .join(m.select(col("__leaf").as("__mleaf"),
          uriDecode(element_at(split(col("file_name"), "/"), -1))
            .as("__mname")),
        col("__lleaf") === col("__mleaf") &&
          col("__lname") === col("__mname"),
        "left_anti")
      .collect().map(r => (r.getString(0), r.getString(1),
        byKey((r.getString(0), r.getString(1)))))
  }

  /** Reconcile the manifest with the data directory in BOTH directions:
    * drop rows whose file no longer exists (a [[deleteByIds]] rewrite,
    * an external compaction) and stat files the manifest has never seen
    * ([[updateManifest]]'s incremental path). Idempotent; file-count-
    * sized in the listing, with the keep/drop decision evaluated as a
    * join plan ([[keepRowsPlan]]) rather than a collected literal set;
    * O(new files' rows) in data read. Returns (rows dropped, files
    * newly statted). This is also the crash-recovery command for an
    * interrupted delete commit: once the directory holds the files you
    * mean to keep, one call makes the manifest agree with it.
    */
  def reconcileManifest(spark: SparkSession, dataPath: String,
                        dims: Seq[String]): (Int, Int) =
    reconcileManifestAt(spark, dataPath, manifestPath(dataPath), dims)

  private def reconcileManifestAt(spark: SparkSession, dataPath: String,
                                  mp: String, dims: Seq[String]): (Int, Int) = {
    val hp = new org.apache.hadoop.fs.Path(dataPath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireFlatDir(fs, hp)
    val present = fs.listStatus(hp).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq
    var dropped = 0
    if (fs.exists(new org.apache.hadoop.fs.Path(mp))) {
      // mergeSchema on BOTH reads: the staged rewrite replaces the whole
      // manifest, so a first-file-schema read here would permanently
      // drop every stat column the arbitrarily-chosen first segment
      // lacks (the exact loss mergeSchema exists to prevent — and this
      // path runs automatically inside every delete)
      val m = readManifestMerged(spark, mp)
      val total = m.count()
      val kept = keepRowsPlan(m, present).count()
      dropped = (total - kept).toInt
      if (dropped > 0) {
        graft.operators.Lifecycle.stagedSwap(spark, mp) { staged =>
          keepRowsPlan(readManifestMerged(spark, mp), present)
            .coalesce(1)
            .write.mode("overwrite").parquet(staged)
        }
      }
    }
    (dropped, updateManifestAt(spark, dataPath, mp, dims))
  }

  /** Manifest-pruned read: open only files that can hold matching rows,
    * then apply the real range filters (which also push to the parquet
    * scan, so surviving files keep pruning at ROW-GROUP granularity).
    * Row-identical to a full scan with the same filters under ANY
    * layout; the layout only decides how much gets skipped.
    */
  def prunedRead(spark: SparkSession, dataPath: String,
                 ranges: Seq[ColRange]): DataFrame = {
    val (files, _) = pruneFiles(spark, dataPath, ranges)
    val base =
      if (files.isEmpty) spark.read.parquet(dataPath).limit(0)
      else spark.read.parquet(files: _*)
    ranges.foldLeft(base) { (df, r) =>
      df.filter(col(r.colName) >= r.lo && col(r.colName) <= r.hi)
    }
  }

  // --- partitioned-table composition (VERDICT r8) -------------------
  //
  // The z-order/manifest story composed with the hive-style
  // date-partitioned landing layout a 100-TB lake actually uses: one
  // flat-directory manifest PER LEAF partition (the per-flat-directory
  // contract above, now a feature instead of a restriction), kept
  // together under `<root>/_manifests/<leaf>` — an underscore-prefixed
  // directory, so a plain `spark.read.parquet(root)` of the data is
  // oblivious to it. A read then prunes at THREE granularities in
  // order: partition directories (driver-side, partition-count-sized),
  // then each surviving leaf's file manifest (file-count-sized), then
  // parquet row-group stats inside the surviving files — each level
  // strictly cheaper than the data it saves the next level from
  // touching.

  /** Root-relative home of a leaf's manifest. Underscore-prefixed so
    * parquet readers of `root` skip it as metadata (the `_delta_log`
    * convention). */
  def partitionManifestPath(root: String, leafName: String): String =
    root.stripSuffix("/") + "/_manifests/" + leafName

  /** The `k=v` leaf directories of a one-level hive-partitioned root:
    * (leafName, partitionColumn, rawValue). Loud on mixed partition
    * keys or non-partition subdirectories — silently treating a stray
    * directory as a partition would corrupt every read.
    */
  private def leaves(fs: org.apache.hadoop.fs.FileSystem,
                     root: org.apache.hadoop.fs.Path): Seq[(String, String, String)] = {
    val ds = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
      .toSeq.sorted
    val parsed = ds.map { n =>
      val i = n.indexOf('=')
      require(i > 0,
        s"$root is not a one-level hive-partitioned table: " +
          s"subdirectory '$n' is not k=v-shaped")
      (n, n.substring(0, i), n.substring(i + 1))
    }
    require(parsed.map(_._2).distinct.size <= 1,
      s"mixed partition keys under $root: ${parsed.map(_._2).distinct}")
    parsed
  }

  /** Write `df` hive-partitioned by `partCol` with each leaf's files
    * z-clustered on `dims` (which must not include the partition column
    * — hive layout stores it in the path, not the files): one global
    * z-key pass, then a range partitioning on (partition, curve) so
    * each task writes one contiguous curve segment of one partition.
    * `files` is the TOTAL file budget, spread across leaves
    * proportionally to their rows by the range partitioner.
    */
  def writeZOrderedPartitioned(df: DataFrame, root: String, partCol: String,
                               dims: Seq[String], files: Int): Unit = {
    require(!dims.contains(partCol),
      s"partition column '$partCol' cannot be a z-order dim: hive " +
        "layout stores it in the directory name, not the data files")
    withZKey(df, dims)
      .repartitionByRange(files, col(partCol), col("zkey"))
      .sortWithinPartitions(col(partCol), col("zkey"))
      .drop("zkey")
      .write.partitionBy(partCol).mode("overwrite").parquet(root)
  }

  /** Incrementally refresh every leaf's manifest ([[updateManifest]]
    * semantics per leaf: stat only unseen files, 0 for an untouched
    * leaf). Creates manifests for new leaves — so one call after any
    * append, whatever partitions it landed in, keeps the whole table
    * pruned-readable. Returns total files newly statted. Unseen-file
    * discovery is ONE global anti-join over every leaf's manifest
    * (r11), so untouched leaves cost a listing RPC, never a Spark job
    * — job count scales with TOUCHED leaves, not table partitions.
    */
  /** Run independent per-leaf work from a small driver thread pool
    * (guide §2.6 — overlap independent jobs): per-leaf operations are
    * disjoint by construction (each touches only its own leaf
    * directory, its own manifest, and its own scratch area under the
    * root's underscore prefix), and Spark's scheduler overlaps jobs
    * submitted from several driver threads, back-filling executors a
    * serial loop would leave idle through every leaf's job tail. At a
    * 1000-leaf table the serial loop is the difference between minutes
    * and the slowest touched leaf. Pool size: `graft.layout.leaf.
    * parallelism` in the Hadoop conf (default 4 — 2-4 in-flight jobs
    * fill the tail without fighting for executors). Results keep item
    * order. EVERY task completes before this returns — on failure the
    * remaining leaves still finish (the same partial progress a serial
    * loop's earlier iterations already committed), THEN the first
    * item's failure rethrows with its original exception: returning
    * with work in flight would let a caller's recovery retry race this
    * call's own leftovers on the same leaf. */
  private def parLeaves[A, B](spark: SparkSession, items: Seq[A])
                             (f: A => B): Seq[B] = {
    val n = math.min(
      math.max(1, spark.sparkContext.hadoopConfiguration
        .getInt("graft.layout.leaf.parallelism", 4)),
      items.size)
    if (n <= 1) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
      try {
        val futs = items.map(a =>
          pool.submit(new java.util.concurrent.Callable[B] {
            def call(): B = f(a)
          }))
        val results: Seq[Either[Throwable, B]] = futs.map(fu =>
          try Right(fu.get())
          catch {
            case e: java.util.concurrent.ExecutionException =>
              Left(e.getCause)
          })
        results.collectFirst { case Left(t) => throw t }
        results.map(_.toOption.get)
      } finally pool.shutdown()
    }
  }

  def updateManifestPartitioned(spark: SparkSession, root: String,
                                dims: Seq[String]): Int = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = leaves(fs, rp).map(_._1)
    if (all.isEmpty) return 0
    val (withM, withoutM) = all.partition(l =>
      fs.exists(new org.apache.hadoop.fs.Path(
        partitionManifestPath(root, l))))
    val fresh = listLeafFiles(fs, root, withoutM) ++ (
      if (withM.isEmpty) Nil
      else unmanifestedLeafFiles(leafManifests(spark, root, withM),
        listLeafFiles(fs, root, withM)))
    parLeaves(spark, fresh.groupBy(_._1).toSeq.sortBy(_._1)) {
      case (leaf, fl) =>
        appendStatsSegment(spark, partitionManifestPath(root, leaf),
          fl.map(_._3), dims)
    }: Unit
    fresh.length
  }

  /** Manifest-pruned read over a one-level hive-partitioned table.
    * `ranges` may mix predicates on the PARTITION column (drives leaf
    * selection, evaluated with Spark's own comparison semantics over
    * the discovered partition type) and on manifest `dims` (drives
    * per-file pruning inside each surviving leaf). Row-identical to
    * `spark.read.parquet(root)` under the same filters for ANY layout:
    * leaf selection is conservative (an unparseable / escaped /
    * `__HIVE_DEFAULT_PARTITION__` value keeps its leaf and lets the
    * row filter decide), a leaf with no manifest yet keeps all its
    * files (the [[pruneFiles]] staleness stance, lifted a level), and
    * every range is re-applied as a row filter at the end.
    */
  def prunedReadPartitioned(spark: SparkSession, root: String,
                            ranges: Seq[ColRange]): DataFrame = {
    import spark.implicits._
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ls = leaves(fs, rp)
    val all = spark.read.parquet(root) // schema incl. discovered partCol
    def empty = all.limit(0)
    if (ls.isEmpty) return ranges.foldLeft(empty) { (df, r) =>
      df.filter(col(r.colName) >= r.lo && col(r.colName) <= r.hi) }
    val partCol = ls.head._2
    val (pRanges, dRanges) = ranges.partition(_.colName == partCol)
    val partType = all.schema(partCol).dataType
    // leaf selection IN A PLAN, not driver string compares: the raw
    // `k=v` values cast through Spark's own rules to the discovered
    // partition type, so "2024-01-07" under a date partition and "42"
    // under an int partition compare exactly as the row filter will.
    // try-cast: a value Spark cannot parse stays null → kept.
    val keptLeaves: Seq[String] =
      if (pRanges.isEmpty) ls.map(_._1)
      else {
        // [[decodePathComponent]]: URLDecoder's form-encoding
        // '+'-to-space rule would turn partition value 'a+b' into
        // 'a b' and mis-evaluate the leaf-selection range (wrong
        // exclusion = silently dropped rows)
        val lf = ls.map { case (leaf, _, raw) =>
          (leaf, decodePathComponent(raw))
        }.toDF("__leaf", "__raw")
          .withColumn("__pv",
            when(col("__raw") === "__HIVE_DEFAULT_PARTITION__", lit(null))
              .otherwise(expr(s"try_cast(__raw AS ${partType.sql})")))
        pRanges.foldLeft(lf) { (df, r) =>
          df.filter(col("__pv").isNull ||
            (col("__pv") >= r.lo && col("__pv") <= r.hi))
        }.select(col("__leaf")).collect().map(_.getString(0)).toSeq
      }
    // file pruning over the SURVIVING leaves in one global pass (r11:
    // the per-leaf pruneFilesAt loop ran ~3 Spark jobs per leaf, so a
    // read without a partition predicate on a 1000-partition table
    // paid thousands of serial jobs): same per-file stats test, same
    // conservative keep of files a manifest has never seen, 2 jobs
    // total; manifest-less leaves keep all their files as before.
    val (withM, withoutM) = keptLeaves.partition(l =>
      fs.exists(new org.apache.hadoop.fs.Path(
        partitionManifestPath(root, l))))
    val files = (if (withM.isEmpty) Seq.empty[String]
      else {
        val m = leafManifests(spark, root, withM)
        val listedM = listLeafFiles(fs, root, withM)
        // kept files resolve through the LISTING's raw paths, not the
        // manifest's file_name strings — input_file_name records
        // URI-encoded paths ('part=a%20b'), which spark.read cannot
        // resolve against the raw directory; the (leaf, basename)
        // pair, both sides decoded, is the stable join key.
        // nulls_<col> IS NULL = a manifest row written before this dim
        // joined the stats schema (see leafManifests): its file cannot
        // be proven to miss, so it is kept — never silently pruned
        val byKey = listedM.map(t => (t._1, t._2) -> t._3).toMap
        val kept = dRanges.foldLeft(m)((df, r) => df.filter(rangeKeep(r)))
          .select(col("__leaf"),
            uriDecode(element_at(split(col("file_name"), "/"), -1)))
          .collect()
          .flatMap(r => byKey.get((r.getString(0), r.getString(1))))
          .toSeq
        kept ++ unmanifestedLeafFiles(m, listedM).map(_._3)
      }) ++ listLeafFiles(fs, root, withoutM).map(_._3)
    val base =
      if (files.isEmpty) empty
      else spark.read.option("basePath", root).parquet(files: _*)
    ranges.foldLeft(base) { (df, r) =>
      df.filter(col(r.colName) >= r.lo && col(r.colName) <= r.hi)
    }
  }

  // --- partitioned-table WRITE lifecycle ----------------------------
  //
  // The ingestion half of the composition above: a 100-TB lake is not
  // written once — batches land daily, small files accumulate, old
  // partitions age out, and takedowns cut across every partition. Each
  // of those is a per-LEAF application of the flat-directory machinery
  // (append, compact, delete), with all scratch space under
  // underscore-prefixed root subdirectories — a staged directory
  // SIBLING to a `k=v` leaf would itself parse as a partition to any
  // concurrent partition discovery, so nothing transient may ever live
  // next to a leaf.

  /** Append a batch to a hive-partitioned z-ordered table: one global
    * z-key pass over the batch, a range partitioning on (partition,
    * curve) so each task writes contiguous curve segments of one
    * partition, and the hive writer routes files into their `k=v`
    * leaves — whatever partitions the batch touches, including ones
    * the table has never seen. `files` budgets the BATCH's file count
    * (spread across its leaves by rows), not the table's. Clustering
    * uses the batch's own dim bounds, same contract as
    * [[appendZOrdered]]: the per-leaf manifests record actual file
    * min/max, so bounds drift between batches only loosens skip rates,
    * never results. Run [[updateManifestPartitioned]] after (one call,
    * 0-cost for untouched leaves) to keep pruned reads at full skip
    * rate; until then the new files are conservatively unpruned.
    * File-level append: exactly-once is the ingestion layer's job,
    * like [[appendZOrdered]].
    */
  def appendZOrderedPartitioned(df: DataFrame, root: String,
                                partCol: String, dims: Seq[String],
                                files: Int): Unit = {
    require(!dims.contains(partCol),
      s"partition column '$partCol' cannot be a z-order dim: hive " +
        "layout stores it in the directory name, not the data files")
    withZKey(df, dims)
      .repartitionByRange(files, col(partCol), col("zkey"))
      .sortWithinPartitions(col(partCol), col("zkey"))
      .drop("zkey")
      .write.partitionBy(partCol).mode("append").parquet(root)
  }

  /** Re-cluster every leaf holding more than `maxFilesPerLeaf` files
    * down to `filesPerLeaf` z-ordered files — the small-files
    * compaction a daily-append table needs (each append adds files per
    * leaf; a year of daily batches is 365× the file count the same
    * rows deserve, and file COUNT is what degrades listing, manifest,
    * and scan-planning cost at 100 TB). Untouched leaves cost one
    * directory listing, nothing else.
    *
    * Per-leaf commit discipline is [[deleteByIds]]'s retire-first
    * promotion, staged under `root/_compact/<leaf>__staged` /
    * `__retired`: originals rename out only after the replacement is
    * fully written, a crash mid-promotion leaves them recoverable
    * under `__retired`, and a pre-existing staged directory fails
    * loudly ([[graft.operators.Lifecycle.stagedSwap]]'s collision
    * contract). The leaf manifest is reconciled after each promoted
    * leaf, so pruned reads stay exact. Quiesce readers and writers of
    * the compacted leaves across the call. Returns the number of
    * leaves compacted.
    */
  def compactPartitioned(spark: SparkSession, root: String,
                         dims: Seq[String], filesPerLeaf: Int,
                         maxFilesPerLeaf: Int): Int = {
    require(filesPerLeaf >= 1 && maxFilesPerLeaf >= filesPerLeaf,
      s"need maxFilesPerLeaf >= filesPerLeaf >= 1, " +
        s"got $maxFilesPerLeaf / $filesPerLeaf")
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    parLeaves(spark, leaves(fs, rp)) { case (leaf, _, _) =>
      val leafDir = root.stripSuffix("/") + "/" + leaf
      val lp = new org.apache.hadoop.fs.Path(leafDir)
      val scratch = root.stripSuffix("/") + "/_compact/" + leaf
      val sp = new org.apache.hadoop.fs.Path(scratch + "__staged")
      val retired = new org.apache.hadoop.fs.Path(scratch + "__retired")
      // residue checks run BEFORE the over-budget short-circuit: a
      // compaction that crashed after retiring every original leaves
      // the leaf EMPTY (0 files > max is false), and the old order
      // skipped the leaf as "under budget" — reads then silently
      // returned zero rows for the partition and the residue was never
      // surfaced. A non-empty retired dir may hold the only copies.
      if (nonEmptyDir(fs, retired))
        throw new IllegalStateException(
          s"retired directory $retired is not empty: a previous " +
            s"compaction crashed mid-promotion on $leafDir and those " +
            "files may be the only copies of their rows. Rename them " +
            s"back into $leafDir (and delete any staged files under " +
            s"$sp), then retry. Nothing was touched.")
      if (fs.exists(sp))
        throw new IllegalStateException(
          s"staged directory $sp already exists: either a concurrent " +
            s"compaction is mid-rewrite on $leafDir (writers must be " +
            "serialized per table) or a previous one crashed before " +
            s"its promotion. The leaf at $leafDir is intact. After " +
            s"confirming no other writer is running, delete $sp and " +
            "retry.")
      val originals = fs.listStatus(lp).map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
      originals.length > maxFilesPerLeaf && {
        withZKey(spark.read.parquet(leafDir), dims)
          .repartitionByRange(filesPerLeaf, col("zkey"))
          .sortWithinPartitions(col("zkey"))
          .drop("zkey")
          .write.mode("overwrite").parquet(sp.toString)
        fs.mkdirs(retired)
        originals.foreach { p =>
          require(fs.rename(p, new org.apache.hadoop.fs.Path(retired,
              p.getName)),
            s"compact: could not retire $p — leaf unchanged so far; " +
              s"restore any files already under $retired and retry")
        }
        fs.listStatus(sp).map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
          .foreach { p =>
            require(fs.rename(p, new org.apache.hadoop.fs.Path(lp,
                p.getName)),
              s"compact: could not promote $p — originals intact under " +
                s"$retired; rename them back to recover")
          }
        fs.delete(sp, true)
        fs.delete(retired, true)
        reconcileManifestAt(spark, leafDir,
          partitionManifestPath(root, leaf), dims): Unit
        true
      }
    }.count(identity)
  }

  /** Maintenance dry-run: per-leaf census of a partitioned table —
    * file and byte counts plus whether the leaf carries a manifest —
    * so an operator (or a scheduler) can decide which leaves a
    * [[compactPartitioned]] pass would touch WITHOUT reading any data:
    * the whole census is directory listings. Returns
    * `(leaf, files, bytes, has_manifest)` ordered by leaf.
    */
  def leafCensus(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    leaves(fs, rp).map { case (leaf, _, _) =>
      val st = fs.listStatus(new org.apache.hadoop.fs.Path(
          root.stripSuffix("/") + "/" + leaf))
        .filter(_.getPath.getName.endsWith(".parquet"))
      (leaf, st.length, st.map(_.getLen).sum,
        fs.exists(new org.apache.hadoop.fs.Path(
          partitionManifestPath(root, leaf))))
    }.sortBy(_._1)
      .toDF("leaf", "files", "bytes", "has_manifest")
  }

  /** Drop one partition outright — the retention path (age out a date,
    * retract a source): the leaf directory and its manifest go
    * together, so a recreated partition of the same name starts with a
    * clean manifest instead of inheriting stale rows. O(1) in data
    * (two directory deletes). Returns false (and touches nothing) when
    * the leaf does not exist. The name must be `k=v`-shaped — passing
    * a bare value would silently delete nothing forever.
    */
  def dropPartition(spark: SparkSession, root: String,
                    leafName: String): Boolean = {
    require(leafName.indexOf('=') > 0,
      s"'$leafName' is not a k=v partition directory name")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lp = new org.apache.hadoop.fs.Path(
      root.stripSuffix("/") + "/" + leafName)
    val existed = fs.exists(lp)
    if (existed) {
      require(fs.delete(lp, true), s"dropPartition: could not delete $lp")
      fs.delete(new org.apache.hadoop.fs.Path(
        partitionManifestPath(root, leafName)), true): Unit
    }
    existed
  }

  /** Physically remove rows whose `idCol` appears in `ids` from EVERY
    * partition of a hive-partitioned z-ordered table — the takedown
    * that cuts across dates ([[deleteByIds]] per leaf, manifest-pruned
    * inside each). A leaf whose manifest id ranges exclude the whole
    * delete set does no data read at all, so at 1000 partitions a
    * takedown of one day's ids costs one manifest probe per leaf and
    * rewrites only where doomed rows can live. Scratch space lives
    * under `root/_delete/<leaf>__staged` / `__retired` (never sibling
    * to a leaf). Idempotent per leaf; returns total files rewritten.
    */
  def deleteByIdsPartitioned(spark: SparkSession, root: String,
                             dims: Seq[String], idCol: String,
                             ids: DataFrame): Int = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rp)) return 0
    // computed once, lineage cut: the per-leaf loop must see one
    // consistent delete set even from a non-deterministic source
    val idv = ids.localCheckpoint()
    val all = leaves(fs, rp)
    if (all.isEmpty) return 0
    // LEAF PRE-PRUNING: even a no-op leaf costs its own manifest read
    // + candidate join + staleness anti-join (3–4 Spark jobs) inside
    // deleteRetainingAt, so a takedown touching one leaf of a
    // 1000-partition table would pay ~minutes of serial no-op work.
    // ONE union read over every leaf manifest decides which leaves can
    // possibly hold a doomed id (per-file [min,max]/null stats — the
    // same test the per-leaf path applies), in two Spark jobs total.
    // Conservative set, never row-losing: a leaf is processed if its
    // stats hit, if it has NO manifest, or if its directory holds any
    // file the manifest has never seen (a stale manifest may only cost
    // skipped pruning, never a missed delete — the same invariant as
    // pruned reads). The listing side is driver-resident (it came from
    // fs.listStatus, as in updateManifest); only survivor LEAF names
    // are collected.
    val rootStr = root.stripSuffix("/")
    val withManifest = all.map(_._1).filter(leaf =>
      fs.exists(new org.apache.hadoop.fs.Path(
        partitionManifestPath(root, leaf))))
    val noManifest = all.map(_._1).toSet -- withManifest
    val (hitLeaves, staleLeaves) =
      if (withManifest.isEmpty) (Set.empty[String], Set.empty[String])
      else {
        val m = leafManifests(spark, root, withManifest)
        val del = idv.select(col(idCol).as("__del")).distinct()
        // nulls_<idCol> IS NULL = a pre-dims-change manifest row (see
        // leafManifests): its file cannot be proven id-free, so its
        // leaf is processed — deleteRetainingAt then fails loudly on
        // the stats its own pruning requires, exactly as the old
        // per-leaf path did, instead of silently missing a takedown
        val hits = m.join(broadcast(del), idCandidateCond(idCol),
            "left_semi")
          .select(col("__leaf"))
          .distinct().collect().map(_.getString(0)).toSet
        val stale = unmanifestedLeafFiles(m,
          listLeafFiles(fs, root, withManifest)).map(_._1).toSet
        (hits, stale)
      }
    parLeaves(spark, all.map(_._1)
        .filter(l => noManifest(l) || hitLeaves(l) || staleLeaves(l))) {
      leaf =>
        val scratch = rootStr + "/_delete/" + leaf
        deleteRetainingAt(spark, rootStr + "/" + leaf,
          partitionManifestPath(root, leaf),
          scratch + "__staged", scratch + "__retired",
          dims, idCol, idv, vault = None)
    }.sum
  }
}
