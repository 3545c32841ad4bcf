package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column
  * (`ArrayType(FloatType)`).
  *
  * Scale design: the query side is small (a handful of probe vectors or a
  * per-bucket slice) and is ALWAYS broadcast; the corpus side streams.
  * Brute force is the exactness baseline; the LSH-bucketed variant bounds
  * each comparison set by bucket population, so cost is
  * O(corpus × signatureBits) + O(bucket² ) instead of O(corpus × queries)
  * at full dimension.
  */
object Similarity {

  /** Brute-force top-k cosine neighbors for each query row. Exact — use as
    * the recall oracle for the ANN variants. `queries` must be small (it is
    * broadcast and each corpus partition scans it).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    // norms are per-ROW (computed once each side), so the per-pair work is
    // a single native dot product
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorOps.norm(col(vecCol)).as("qn")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"),
      VectorOps.norm(col(vecCol)).as("nn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val nn = col("qn") * col("nn")
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", when(nn === 0.0, 0.0)
        .otherwise(VectorOps.dot(col("qv"), col("nv")) / nn))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Attach an int8-quantized copy of `vecCol` (array<tinyint>, symmetric
    * max-abs scale — see [[graft.functions.NativeKernels.quantize8]]).
    * The 100 TB lever: quantize ONCE at ingest and persist `qCol` in
    * parquet — 1 byte/dim instead of 4 cuts every downstream scan,
    * shuffle, and cache of the embedding 4×; the per-vector scales cancel
    * in cosine, so quantized search never needs the original floats.
    */
  def quantizeEmbeddings(df: DataFrame, vecCol: String,
                         qCol: String = "q8"): DataFrame =
    df.withColumn(qCol, graft.functions.HashFunctions.quantize8(col(vecCol)))

  /** Top-k cosine neighbors over int8-quantized vectors: the
    * [[bruteForceTopK]] join shape with 4× lighter rows and an exact
    * integer dot product in the hot loop (cosine of the dequantized
    * vectors — the quantization scales cancel). Same deterministic
    * (cos desc, neighbor_id) tie-break; recall vs the float baseline is
    * floor-asserted in SimilaritySpec.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    import graft.functions.HashFunctions.{dotII, quantize8}
    // self-dot norms are PER-ROW quantities: compute them on each side
    // before the |corpus|×|queries| join (like bruteForceTopK/lshTopK),
    // not per PAIR — inside the join each pair would re-run both
    // self-dots, tripling the O(dim) work of the hot loop this function
    // exists to make cheap. Same integer-exact arithmetic, same IEEE
    // sqrt/multiply, so results are bit-identical either way.
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      quantize8(col(vecCol)).as("qv"))
      .withColumn("qn", sqrt(dotII(col("qv"), col("qv")).cast("double"))))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      quantize8(col(vecCol)).as("nv"))
      .withColumn("cn", sqrt(dotII(col("nv"), col("nv")).cast("double")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val nn = col("qn") * col("cn")
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", when(nn === 0.0, 0.0)
        .otherwise(dotII(col("qv"), col("nv")).cast("double") / nn))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Two-stage retrieval — the production ANN idiom: a cheap int8
    * candidate scan ([[quantizedTopK]], k·candidateFactor per query) then
    * an EXACT float rescore of only the candidates. At 100 TB the first
    * stage reads 1 byte/dim across the corpus; stage 2 streams the float
    * corpus past a BROADCAST of the tiny candidate id set (k·factor·
    * |queries| pairs), so per-row work on non-candidates is one hash
    * probe — norm and dot arithmetic run only on the matched candidate
    * rows, after the join. Both stages are deterministic portable
    * arithmetic, so the composed pipeline stays oracle-checkable end to
    * end.
    *
    * Recall: a true top-k neighbor is missed only if quantization noise
    * pushes it below rank k·factor — SimilaritySpec floors the composed
    * recall@10 above plain quantized search.
    */
  def rescoredTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, candidateFactor: Int = 4): DataFrame = {
    require(candidateFactor >= 1)
    val cand = quantizedTopK(corpus, queries, idCol, vecCol, k * candidateFactor)
      .select(col("query_id"), col("neighbor_id"))
    exactRescore(corpus, queries, idCol, vecCol, cand, k)
  }

  /** Stage 2 of every two-stage retrieval here: exact float cosine over
    * ONLY the proposed `cand` (query_id, neighbor_id) pairs, top-k per
    * query under the family tie-break. The candidate ids are the build
    * side — the corpus with its wide float column must stream, never
    * broadcast or hash-build; per-row work on non-candidates is one
    * hash probe.
    */
  def exactRescore(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, cand: DataFrame, k: Int): DataFrame = {
    val qf = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), VectorOps.norm(col(vecCol)).as("qn")))
    val cf = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
    val nn = col("qn") * col("nn")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(cand.select(col("query_id"), col("neighbor_id")))
      .join(cf, Seq("neighbor_id"))
      .withColumn("nn", VectorOps.norm(col("nv")))
      .join(qf, Seq("query_id"))
      .withColumn("cos", when(nn === 0.0, 0.0)
        .otherwise(VectorOps.dot(col("qv"), col("nv")) / nn))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Random-hyperplane LSH signature: `bits` sign bits of plane·vector,
    * packed into a long (native expression; plane components are
    * deterministic fmix64-derived pseudo-randoms — no RNG state, stable
    * across runs and clusters). Vectors close in cosine agree on most bits.
    * `seed` selects an independent plane family for OR-amplification.
    */
  def hyperplaneSignature(vec: Column, bits: Int, seed: Long = 0L): Column =
    graft.functions.HashFunctions.hyperplaneSignature(vec, bits, seed)

  /** MD5-derived plane component for the ORACLE-PORTABLE hyperplane family:
    * uniform in [-1, 1), a pure function of (seed, bit, 1-based dim index) —
    * any engine with md5() recomputes it bit-for-bit
    * (`CAST('0x' || substr(md5(seed || ':' || b || ':' || i), 1, 15) AS
    * BIGINT) / 2^59 - 1`). Slower to evaluate than the fmix64 family
    * [[hyperplaneSignature]] uses (the planes are materialized as literal
    * arrays, the dots as HOF folds), so it's the verification profile, not
    * the default.
    */
  def portablePlaneComponent(seed: Long, bit: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$seed:$bit:$i".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16).toDouble /
      576460752303423488.0 - 1.0 // 2^59
  }

  /** Portable hyperplane signature over a `dim`-dimensional float vector:
    * same sign-bit packing as [[hyperplaneSignature]], but plane components
    * come from [[portablePlaneComponent]] and each dot is a left-to-right
    * double fold (`zip_with` + `aggregate` — the same accumulation order as
    * a sequential SQL `list_sum`), so the signature integer is reproducible
    * in any engine. Signature shape: (Column, bits, seed) — drop-in for
    * [[lshTopK]]'s `signatureFn`.
    */
  def portableSignature(dim: Int)(vec: Column, bits: Int, seed: Long): Column =
    (0 until bits).map { b =>
      val comp = (1 to dim).map(i => portablePlaneComponent(seed, b, i))
      val dot = aggregate(
        zip_with(vec, typedlit(comp), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0.0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF (inverted-file) ANN: k-means-partition the corpus into cells,
    * search only the `nProbe` cells nearest each query.
    *
    * Deterministic throughout: centroids initialize from the lowest-id
    * vectors and Lloyd iterations are exact averages — no RNG. The
    * assignment pass is a broadcast crossJoin (corpus × K centroids) with
    * a min_by reduction, fully distributed; only the K×dim centroid
    * matrix ever reaches the driver (the legitimate small-result collect).
    *
    * Scale: search cost per query drops from O(corpus) to
    * O(corpus × nProbe / nCells) after an O(corpus × nCells × iters)
    * one-off build — the classic IVF trade. Recall < 1 by design; measure
    * against [[bruteForceTopK]].
    */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
                nCells: Int, iters: Int = 2): (DataFrame, Array[(Int, Array[Float])]) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // The build evaluates the corpus 2×iters+2 times (init + one assignment
    // per Lloyd iteration + the final assignment); persist it once so every
    // pass after the first reads the materialized (id, v) projection instead
    // of re-running the corpus lineage — on a 100 TB corpus each avoided
    // re-evaluation is a full re-scan (and re-decode of whatever produced
    // the frame). MEMORY_AND_DISK: an index build must not OOM-abort when
    // the projection outgrows the storage pool.
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var centroids: Array[(Int, Array[Float])] = base.orderBy(col("id")).limit(nCells)
      .select(col("v")).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](0).toArray) }

    def assigned(): DataFrame = {
      // |v-c|² = |v|² - 2·v·c + |c|² ; |v|² is constant per row so argmin
      // only needs the native dot + the per-centroid square — no
      // interpreted element-wise HOF in the corpus × K crossJoin
      val cdf = broadcast(centroids.toSeq.toDF("cell", "cv")
        .withColumn("c2", VectorOps.dot(col("cv"), col("cv"))))
      base.crossJoin(cdf)
        .withColumn("d", col("c2") - lit(2.0) * VectorOps.dot(col("v"), col("cv")))
        .groupBy(col("id"))
        .agg(min_by(col("cell"), struct(col("d"), col("cell"))).as("cell"),
          first(col("v")).as("v"))
    }

    var it = 0
    while (it < iters) {
      // distributed element-wise mean per cell; K×dim numbers to the driver
      val sums = assigned()
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        // decimal-EXACT sum (partition order can't perturb it), then one
        // double division — a formulation any engine reproduces bit-for-bit
        // (decimal avg's internal division rounding is engine-specific)
        .agg((sum(col("x").cast("double").cast("decimal(25,12)")).cast("double")
          / count(lit(1))).as("m"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      centroids = centroids.map { case (cell, old) =>
        byCell.get(cell) match {
          case Some(rows) =>
            val m = old.clone()
            rows.foreach(r => m(r.getInt(1)) = r.getDouble(2).toFloat)
            (cell, m)
          case None => (cell, old) // empty cell keeps its centroid
        }
      }
      it += 1
    }
    // Materialize the final assignment before releasing base: the returned
    // frame is consumed lazily (ivfSearch, saveIvfIndex) and must not
    // re-trigger the corpus lineage after unpersist. The assignment is
    // id+vector+cell — the same order of magnitude as base itself, the
    // natural thing to keep cached (it IS the index).
    val cells = assigned()
      .select(col("id").as(idCol), col("v").as(vecCol), col("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cells.count()
    base.unpersist(blocking = false)
    (cells, centroids)
  }

  /** Search a prebuilt IVF index: `cells` is [[ivfAssign]]'s frame (or the
    * same frame read back from parquet via [[loadIvfIndex]] — the build is
    * a one-off you persist, not a per-query cost) and `centroids` its
    * centroid matrix. Probes the `nProbe` nearest cells per query.
    */
  def ivfSearch(cells: DataFrame, centroids: Array[(Int, Array[Float])],
                queries: DataFrame, idCol: String, vecCol: String, k: Int,
                nProbe: Int = 4): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val cdf = broadcast(centroids.toSeq.toDF("cell", "cv")
      .withColumn("c2", VectorOps.dot(col("cv"), col("cv"))))
    // nProbe nearest cells per query (same |q|²-free distance identity)
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        VectorOps.norm(col(vecCol)).as("qn"))
      .crossJoin(cdf)
      .withColumn("d", col("c2") - lit(2.0) * VectorOps.dot(col("qv"), col("cv")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d"), col("cell"))))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    val c = cells.select(col("cell"), col(idCol).as("neighbor_id"),
      col(vecCol).as("nv"), VectorOps.norm(col(vecCol)).as("nn"))
    val nn = col("qn") * col("nn")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(probes).join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", when(nn === 0.0, 0.0)
        .otherwise(VectorOps.dot(col("qv"), col("nv")) / nn))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Persist an IVF index: cell assignments as (partitioned-by-cell)
    * parquet plus the K×dim centroid matrix as a tiny parquet table. Cell
    * partitioning means a search touches only the probed cells' files —
    * partition pruning does the nProbe/nCells cost cut at the storage
    * layer too.
    */
  def saveIvfIndex(cells: DataFrame, centroids: Array[(Int, Array[Float])],
                   path: String): Unit = {
    val spark = cells.sparkSession
    import spark.implicits._
    cells.write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
    centroids.toSeq.toDF("cell", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    // a fresh index must not inherit a previous incarnation's deletes
    Tombstones.drop(spark, s"$path/tombstones")
  }

  /** Load a persisted IVF index. Only the K×dim centroid matrix is
    * collected to the driver; cell assignments stay distributed.
    * Tombstoned ids ([[deleteFromIvfIndex]]) are anti-joined away — the
    * sidecar is self-describing (its single column carries the index's
    * id column name), so the load needs no idCol argument.
    */
  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String): (DataFrame, Array[(Int, Array[Float])]) =
    (Tombstones.applySelfTo(spark.read.parquet(s"$path/cells"),
      s"$path/tombstones"), readIvfCentroids(spark, path))

  /** Delete vectors from a persisted IVF index by id: searches over a
    * freshly [[loadIvfIndex]]-ed frame stop returning them immediately;
    * [[compactIvfIndex]] removes the rows physically and drops the
    * sidecar. Re-appending a deleted id revives it (the append clears
    * its tombstone; its persisted cell row was never rewritten).
    * Centroids are untouched — deletion is a membership operation, not
    * a retrain.
    */
  def deleteFromIvfIndex(ids: DataFrame, path: String, idCol: String): Unit =
    Tombstones.add(ids.select(col(idCol)), idCol, s"$path/tombstones")

  /** The one place the persisted centroid layout is interpreted —
    * load and append both go through here.
    */
  private[graft] def readIvfCentroids(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Array[(Int, Array[Float])] =
    spark.read.parquet(s"$path/centroids")
      .select(col("cell"), col("cv")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** Grow a persisted IVF index with a new batch against FROZEN
    * centroids — the incremental member of the IVF family, mirroring
    * the dedup indexes' append contract ([[graft.operators.Dedup]]):
    * history VECTORS are never re-read and centroids never retrain (only
    * the K×dim matrix comes to the driver; retraining is a deliberate
    * rebuild, not an append side effect). Idempotent: already-indexed
    * ids are anti-joined away with the history side range-pruned to the
    * batch's id span — O(overlap), not O(history ids) — and each
    * appended file is written id-sorted so future appends can prune it
    * too. Cell `partitionBy` on the appended files keeps search-time
    * partition pruning intact. Serialized appends per path.
    *
    * Drift is the operator's honest limit: vectors assigned under
    * frozen centroids degrade recall as the distribution moves —
    * measure with the spec's recall floor and rebuild (or
    * [[compactIvfIndex]] + retrain) on a quiet moment.
    */
  def appendIvfIndex(newRows: DataFrame, path: String, idCol: String,
                     vecCol: String): Unit = {
    // append-after-delete revives (see [[Tombstones]]): the cleared
    // id's persisted cell row becomes live again, and the idempotence
    // anti-join inside ivfAppendRows declines to duplicate it
    Tombstones.clear(newRows.select(col(idCol)), idCol,
      s"$path/tombstones")
    ivfAppendRows(newRows, path, idCol, vecCol)
      .sortWithinPartitions(col(idCol))
      .write.mode("append").partitionBy("cell").parquet(s"$path/cells")
  }

  private[graft] def ivfAppendRows(newRows: DataFrame, path: String,
                                   idCol: String, vecCol: String): DataFrame = {
    val spark = newRows.sparkSession
    import spark.implicits._
    val centroids = readIvfCentroids(spark, path)
    val cdf = broadcast(centroids.toSeq.toDF("cell", "cv")
      .withColumn("c2", VectorOps.dot(col("cv"), col("cv"))))
    // null ids can never anti-join away (null keys match nothing), so a
    // null-id row would re-append on every retry — drop them up front
    val batch = newRows.select(col(idCol), col(vecCol))
      .filter(col(idCol).isNotNull).dropDuplicates(idCol)
    Lifecycle.freshByIdRange(batch, newRows, idCol,
        spark.read.parquet(s"$path/cells").select(col(idCol)), idCol)
      .crossJoin(cdf)
      .withColumn("d", col("c2") - lit(2.0) * VectorOps.dot(col(vecCol), col("cv")))
      .groupBy(col(idCol))
      .agg(min_by(col("cell"), struct(col("d"), col("cell"))).as("cell"),
        first(col(vecCol)).as(vecCol))
      .select(col(idCol), col(vecCol), col("cell"))
  }

  /** Rewrite the cell table as one compact layout: still `partitionBy`
    * cell (search-time partition pruning), id-range-partitioned and
    * id-sorted within each task (append-time range pruning skips whole
    * files again after many small appends), duplicate ids a legacy
    * index may carry collapsed deterministically. Centroids are
    * untouched — compaction is a storage operation, not a retrain.
    * Same quiet-moment contract and staged swap as the dedup
    * compactions; search and append results are identical before and
    * after.
    */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String, idCol: String,
                      targetRowsPerRange: Long = 1L << 22): Unit = {
    val cells = Tombstones.applyTo(
      spark.read.parquet(s"$path/cells"), idCol, s"$path/tombstones")
    val others = cells.columns.filter(c => c != idCol && c != "cell").toSeq
    // ONE row wins per id, picked by a TOTAL order (cell, payload):
    // min_by keyed on cell alone ties when a legacy duplicate id holds
    // two rows in the SAME cell with different payloads, and a tied
    // min_by picks whichever row an executor saw first — two compaction
    // runs could emit different vectors, violating the determinism
    // contract above. Keying on the payload too breaks every tie the
    // same way on every run, and keeps all output columns from the
    // SAME winning row (never a mix).
    val payload = struct(others.map(col): _*)
    val dedup = cells
      .groupBy(col(idCol))
      .agg(min(col("cell")).as("cell"),
        min_by(payload, struct(col("cell"), payload)).as("__pick"))
      .select((col(idCol) +: col("cell") +:
        others.map(c => col(s"__pick.$c").as(c))): _*)
    // output files ≈ ranges × touched cells per range: size the id
    // ranges explicitly (same rule as compactLshIndex) — the default
    // shuffle.partitions count of tiny ranges, multiplied by the cell
    // dirs, would FRAGMENT the table this op exists to compact
    val n = dedup.count()
    val ranges = math.max(1L,
      (n + targetRowsPerRange - 1) / targetRowsPerRange).toInt
    Lifecycle.stagedSwap(spark, s"$path/cells") { staged =>
      dedup
        .repartitionByRange(ranges, col(idCol))
        .sortWithinPartitions(col(idCol))
        .write.mode("overwrite").partitionBy("cell").parquet(staged)
    }
    Tombstones.drop(spark, s"$path/tombstones")
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
              iters: Int = 2): DataFrame = {
    val (cells, centroids) = ivfAssign(corpus, idCol, vecCol, nCells, iters)
    ivfSearch(cells, centroids, queries, idCol, vecCol, k, nProbe)
  }

  /** Persist an LSH-ANN index: the signature table written as parquet
    * PARTITIONED BY (table, bucket), plus a one-row meta table pinning the
    * signature family parameters. Like [[saveIvfIndex]], this makes the
    * signature pass a one-off build: a probe-time search reads ONLY the
    * probed buckets' directories (partition pruning does the
    * bucket-fraction cost cut at the storage layer).
    */
  /** The plane family a persisted LSH index is stamped with:
    * `portableDim = 0` → the fast engine-local [[hyperplaneSignature]];
    * `> 0` → [[portableSignature]] over that dimensionality, bit-for-bit
    * recomputable by an external engine (the q23b family) — which makes
    * every probe of the index oracle-checkable.
    */
  private def lshSigFn(portableDim: Int): (Column, Int, Long) => Column =
    if (portableDim > 0) portableSignature(portableDim)
    else (v, b, s) => hyperplaneSignature(v, b, s)

  private def lshBucketRows(df: DataFrame, idCol: String, vecCol: String,
                            bits: Int, prefixBits: Int, tables: Int,
                            portableDim: Int): DataFrame =
    lshBucketRowsFn(df, idCol, vecCol, bits, prefixBits, tables,
      lshSigFn(portableDim))

  /** One corpus pass to the (id, vector, norm, tbl, bucket) signature
    * rows — the single construction site for both the persisted-index
    * writer ([[saveLshIndex]] via [[lshBucketRows]]) and the in-session
    * self-search ([[lshTopK]]): the two had drifted into verbatim
    * copies, and the signature-row shape is load-bearing for every
    * probe, so a fix must land once.
    */
  private def lshBucketRowsFn(df: DataFrame, idCol: String, vecCol: String,
                              bits: Int, prefixBits: Int, tables: Int,
                              sig: (Column, Int, Long) => Column): DataFrame = {
    val mask = (1L << prefixBits) - 1
    val tb = explode(array((0 until tables).map(t =>
      struct(lit(t).as("tbl"),
        sig(col(vecCol), bits, t.toLong).bitwiseAND(mask)
          .as("bucket"))): _*))
    df.select(col(idCol), col(vecCol), VectorOps.norm(col(vecCol)).as("nrm"),
        tb.as("tb"))
      .select(col(idCol), col(vecCol), col("nrm"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
  }

  def saveLshIndex(corpus: DataFrame, path: String, idCol: String,
                   vecCol: String, bits: Int = 16, prefixBits: Int = 8,
                   tables: Int = 1, portableDim: Int = 0): Unit = {
    // bits <= 62, same bound lshTopK enforces: at 63 the signature packs
    // the sign bit (negative bucket values) and at 64 the prefix mask
    // (1L << 64) wraps to 0, silently flattening EVERY row into bucket 0
    // — a persisted index with no probe-time pruning and no error
    require(prefixBits >= 1 && prefixBits <= bits && bits <= 62 &&
      tables >= 1,
      s"need 1 <= prefixBits <= bits <= 62 and tables >= 1, got " +
        s"bits=$bits prefixBits=$prefixBits tables=$tables")
    val spark = corpus.sparkSession
    import spark.implicits._
    lshBucketRows(corpus, idCol, vecCol, bits, prefixBits, tables, portableDim)
      .write.mode("overwrite").partitionBy("tbl", "bucket")
      .parquet(s"$path/sig")
    Seq((bits, prefixBits, tables, portableDim))
      .toDF("bits", "prefix_bits", "tables", "portable_dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    // a fresh index must not inherit a previous incarnation's deletes
    Tombstones.drop(spark, s"$path/tombstones")
  }

  private def readLshMeta(spark: org.apache.spark.sql.SparkSession,
                          path: String): (Int, Int, Int, Int) = {
    val df = spark.read.parquet(s"$path/meta")
    val m = df.head()
    // pre-portable indexes lack the column; they were written with the
    // engine-local family, which portable_dim = 0 states exactly
    val pd = if (df.columns.contains("portable_dim"))
      m.getAs[Int]("portable_dim") else 0
    (m.getAs[Int]("bits"), m.getAs[Int]("prefix_bits"),
      m.getAs[Int]("tables"), pd)
  }

  /** Grow a persisted LSH index with a new batch under the index's
    * PINNED plane family and bucket geometry (meta decides — an append
    * can't fork the signature scheme). Same incremental contract as
    * [[appendIvfIndex]]: idempotent via an id anti-join range-pruned to
    * the batch's id span, against ONE table's partition of the signature
    * rows (every id appears in every table, so table 0 is a complete id
    * census at 1/tables of the rows); appended files are id-sorted for
    * future pruning; (tbl, bucket) `partitionBy` keeps probe-time
    * partition pruning intact. Serialized appends per path.
    */
  def appendLshIndex(newRows: DataFrame, path: String, idCol: String,
                     vecCol: String): Unit = {
    // append-after-delete revives; see [[Tombstones]] and appendIvfIndex
    Tombstones.clear(newRows.select(col(idCol)), idCol,
      s"$path/tombstones")
    lshAppendRows(newRows, path, idCol, vecCol)
      .sortWithinPartitions(col(idCol))
      .write.mode("append").partitionBy("tbl", "bucket").parquet(s"$path/sig")
  }

  /** Delete vectors from a persisted LSH index by id: [[lshSearch]]
    * stops returning them immediately (and their bucket-cap slots free
    * up at once — the search filters before its cap window);
    * [[compactLshIndex]] removes the signature rows physically and
    * drops the sidecar. Re-appending a deleted id revives it.
    */
  def deleteFromLshIndex(ids: DataFrame, path: String, idCol: String): Unit =
    Tombstones.add(ids.select(col(idCol)), idCol, s"$path/tombstones")

  private[graft] def lshAppendRows(newRows: DataFrame, path: String,
                                   idCol: String, vecCol: String): DataFrame = {
    val spark = newRows.sparkSession
    val (bits, pb, tables, pd) = readLshMeta(spark, path)
    // same null-id rule as ivfAppendRows: a null id defeats the
    // idempotence anti-join, so it never enters the index
    val batch = newRows.select(col(idCol), col(vecCol))
      .filter(col(idCol).isNotNull).dropDuplicates(idCol)
    val indexIds = spark.read.parquet(s"$path/sig")
      .filter(col("tbl") === 0).select(col(idCol))
    lshBucketRows(
      Lifecycle.freshByIdRange(batch, newRows, idCol, indexIds, idCol),
      idCol, vecCol, bits, pb, tables, pd)
  }

  /** Rewrite the signature table compactly after many small appends:
    * still (tbl, bucket)-partitioned, id-range-clustered and id-sorted
    * within tasks so append-time range pruning skips whole files again;
    * duplicate (id, tbl) rows a legacy index may carry collapse. Meta is
    * untouched. Same staged swap and quiet-moment contract as the other
    * index compactions.
    */
  def compactLshIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String, idCol: String,
                      targetRowsPerRange: Long = 1L << 22): Unit = {
    val sig = Tombstones.applyTo(spark.read.parquet(s"$path/sig"), idCol,
        s"$path/tombstones")
      .dropDuplicates(idCol, "tbl")
    // output files ≈ ranges × touched buckets per range: size the id
    // ranges explicitly — the default shuffle.partitions count of tiny
    // ranges, multiplied by high-cardinality bucket dirs, would FRAGMENT
    // the table this op exists to compact
    val n = sig.count()
    val ranges = math.max(1L,
      (n + targetRowsPerRange - 1) / targetRowsPerRange).toInt
    Lifecycle.stagedSwap(spark, s"$path/sig") { staged =>
      sig.repartitionByRange(ranges, col(idCol))
        .sortWithinPartitions(col(idCol))
        .write.mode("overwrite").partitionBy("tbl", "bucket").parquet(staged)
    }
    Tombstones.drop(spark, s"$path/tombstones")
  }

  /** Probe a persisted LSH index for a SMALL query set (the per-request
    * ANN shape, vs [[lshTopK]]'s all-corpus self-search): query signatures
    * come from the meta-pinned plane family, the probed (table, bucket)
    * set is collected driver-side (bounded by |queries| × tables ×
    * (1 + prefixBits) — tiny by contract) and turned into STATIC
    * partition filters, so the scan touches only probed bucket
    * directories. Same neighbor-side `maxBucket` cap as [[lshTopK]].
    */
  def lshSearch(spark: org.apache.spark.sql.SparkSession, path: String,
                queries: DataFrame, idCol: String, vecCol: String, k: Int,
                multiProbe: Boolean = true, maxBucket: Int = 4096,
                maxProbes: Int = 65536): DataFrame = {
    val (bits, pb, tables, pd) = readLshMeta(spark, path)
    val mask = (1L << pb) - 1
    val sigFn = lshSigFn(pd)
    val perTable = (0 until tables).map { t =>
      val sig = sigFn(col(vecCol), bits, t.toLong).bitwiseAND(mask)
      val buckets =
        if (!multiProbe) array(sig)
        else array(sig +: (0 until pb).map(i => sig.bitwiseXOR(lit(1L << i))): _*)
      struct(lit(t).as("tbl"), buckets.as("buckets"))
    }
    // a null query vector yields null signatures and therefore null
    // probe buckets; unguarded, the primitive getLong on the collected
    // probe rows NPEs and the whole search dies. Such a query can match
    // nothing — drop it, like the family's other members tolerate nulls
    val q = queries
      .filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        VectorOps.norm(col(vecCol)).as("qn"), explode(array(perTable: _*)).as("tb"))
      .select(col("query_id"), col("qv"), col("qn"),
        col("tb.tbl").as("tbl"), explode(col("tb.buckets")).as("bucket"))
    // The probe list rides to the driver to become static partition
    // filters — enforce the "SMALL query set" contract instead of
    // assuming it: |queries| × tables × (1 + prefixBits) distinct
    // buckets. The default cap of 65536 static filters is already an
    // absurd plan; beyond it a caller should batch queries or join
    // against the index directly rather than melt the driver.
    val probed = q.select(col("tbl"), col("bucket")).distinct()
      .limit(maxProbes + 1).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    require(probed.length <= maxProbes,
      s"lshSearch probe set exceeds $maxProbes buckets — the query frame " +
        "is too large for driver-side partition pruning; batch the " +
        "queries or join the persisted index as a table instead")
    if (probed.isEmpty) { // empty query frame: empty result, not a crash
      // neighbor_id comes from the INDEX's id column in the non-empty
      // path — type it from the index parquet schema, not the query
      // frame, or the two paths' schemas disagree when the id types do
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          queries.schema(idCol).dataType),
        org.apache.spark.sql.types.StructField("neighbor_id",
          spark.read.parquet(s"$path/sig").schema(idCol).dataType),
        org.apache.spark.sql.types.StructField("cos",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.IntegerType)))
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    }
    val cond = probed.groupBy(_._1).map { case (t, ps) =>
      col("tbl") === t && col("bucket").isin(ps.map(_._2).toSeq: _*)
    }.reduce(_ || _)
    // tombstones filtered BEFORE the cap window: a deleted id both
    // stops matching and frees its bucket-cap slot at search time
    val idx = Tombstones.applyTo(
      spark.read.parquet(s"$path/sig").filter(cond),
      idCol, s"$path/tombstones")
      .withColumn("bucket", col("bucket").cast("long"))
    val capW = Window.partitionBy(col("tbl"), col("bucket")).orderBy(col(idCol))
    val r = idx.withColumn("__bn", row_number().over(capW))
      .filter(col("__bn") <= maxBucket)
      .select(col("tbl"), col("bucket"), col(idCol).as("neighbor_id"),
        col(vecCol).as("nv"), col("nrm").as("nn"))
    val nn = col("qn") * col("nn")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(r, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", when(nn === 0.0, 0.0)
        .otherwise(VectorOps.dot(col("qv"), col("nv")) / nn))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(first(col("cos")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** ANN via LSH buckets: group vectors by signature prefix, search only
    * within the bucket. Returns per-query top-k among same-bucket rows —
    * recall < 1 by design; compare against [[bruteForceTopK]] to measure.
    *
    * Scale controls (all VERDICT-r1 findings):
    *  - `prefixBits = 0` (default) auto-scales with corpus size so bucket
    *    population stays near `targetBucketSize` instead of growing
    *    linearly with the corpus (a fixed prefix caps the bucket COUNT,
    *    making the bucket² join quadratic again at 100×);
    *  - `maxBucket` caps the NEIGHBOR side of every bucket (lowest ids —
    *    deterministic), so a degenerate flood of near-identical vectors
    *    costs bucket × maxBucket, never bucket²; for exactly-identical
    *    vectors the cap is lossless (ties rank by neighbor id anyway);
    *  - `tables > 1` is OR-amplification: independent plane families
    *    (seeded [[hyperplaneSignature]]) propose buckets in parallel and a
    *    pair missed by one family is caught by another — recall rises at
    *    linear (× tables) cost.
    *  - `multiProbe` additionally probes, for each QUERY, every bucket at
    *    Hamming distance 1 from its own (one flipped prefix bit) — the
    *    standard multi-probe LSH trick: a near neighbor that disagrees on
    *    exactly one cut plane is still found. Query-side only, so cost is
    *    ×(1 + probes) on the probe join, while the corpus is still
    *    bucketed once.
    *  - `probeBudget` bounds the multi-probe fan-out (r16, the measured
    *    ×40 knee): auto prefix bits grow log(n) to hold bucket size
    *    near the target, so UNBOUNDED Hamming-1 probing makes the probe
    *    join cost n × log(n) × bucket — superlinear precisely when the
    *    corpus grows. A fixed budget (lowest `probeBudget` prefix bits)
    *    keeps the candidate volume n × (1 + budget) × target — linear —
    *    while small corpora (pb ≤ budget) probe exactly as before.
    *    Recall per unprobed bit degrades gracefully: each prefix bit is
    *    an independent hyperplane, so coverage of the Hamming-1 shell
    *    is budget/pb, not a cliff. The budget applies ONLY to the
    *    auto-sized prefix: an explicitly supplied `prefixBits` probes
    *    its full Hamming-1 shell (the caller chose that fan-out; capping
    *    it silently would change top-k sets behind stable call sites —
    *    ADVICE r16).
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
              bits: Int = 16, prefixBits: Int = 0, tables: Int = 1,
              maxBucket: Int = 4096, targetBucketSize: Int = 64,
              corpusCount: Option[Long] = None,
              multiProbe: Boolean = false,
              probeBudget: Int = 8,
              signatureFn: (Column, Int, Long) => Column = hyperplaneSignature(_, _, _)): DataFrame = {
    require(tables >= 1 && bits <= 62 && maxBucket >= 1 && probeBudget >= 1)
    val pb =
      if (prefixBits > 0) prefixBits
      else {
        // auto mode needs the corpus size; without corpusCount this runs a
        // real count() JOB at call time (cheap for a parquet scan — row
        // group stats — but a full evaluation for a derived frame). Pass
        // corpusCount when the frame is expensive or only the plan is
        // wanted.
        val n = corpusCount.getOrElse(corpus.count()).max(1L)
        math.ceil(math.log(math.max(n.toDouble / targetBucketSize, 2.0))
          / math.log(2.0)).toInt.max(4).min(bits)
      }
    // PERSISTED signature table ([[lshBucketRowsFn]] — one corpus pass):
    // both the bucketed corpus side (cap window) and the probe side
    // derive from it, and column pruning would otherwise re-run the
    // corpus-wide signature pass once per side. At scale this is the
    // LSH index you'd materialize anyway — corpus × tables rows of
    // (id, vector, norm, bucket). Session-lifetime cache: see Dedup's
    // CACHE LIFETIME CONTRACT (clearCache between corpora).
    val sig = lshBucketRowsFn(corpus, idCol, vecCol, bits, pb, tables,
        signatureFn)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capW = Window.partitionBy(col("tbl"), col("bucket")).orderBy(col(idCol))
    val r = sig.withColumn("__bn", row_number().over(capW))
      .filter(col("__bn") <= maxBucket)
      .select(col("tbl"), col("bucket"), col(idCol).as("neighbor_id"),
        col(vecCol).as("nv"), col("nrm").as("nn"))
    // query side: own bucket, plus (multi-probe) every bucket one flipped
    // prefix bit away — a near neighbor that disagrees on exactly one cut
    // plane is still found; query-side only, the corpus is bucketed once
    // explicit prefixBits ⇒ the caller sized the shell: probe all pb bits
    // (the budget exists to bound the AUTO log(n) growth, not to shrink a
    // hand-chosen fan-out). Auto pb ⇒ bounded by the budget.
    val probeBits = if (prefixBits > 0) pb else math.min(pb, probeBudget)
    val probeBuckets =
      if (!multiProbe) array(col("bucket"))
      else array(col("bucket") +:
        (0 until probeBits)
          .map(i => col("bucket").bitwiseXOR(lit(1L << i))): _*)
    val l = sig.select(col("tbl"), explode(probeBuckets).as("bucket"),
      col(idCol).as("query_id"), col(vecCol).as("qv"), col("nrm").as("qn"))
    val nn = col("qn") * col("nn")
    val joined = l.join(r, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", when(nn === 0.0, 0.0)
        .otherwise(VectorOps.dot(col("qv"), col("nv")) / nn))
    // tables may propose the same pair more than once → one row per pair
    // before ranking (single-table buckets are disjoint per query: skip)
    val cands =
      if (tables == 1) joined
      else joined.groupBy(col("query_id"), col("neighbor_id"))
        .agg(first(col("cos")).as("cos"), min(col("bucket")).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("neighbor_id"), col("cos"),
        col("rank"))
  }

  // --- product quantization (Jégou, Douze, Schmid, TPAMI 2011) ------
  //
  // The compression axis the int8 path only starts: split each vector
  // into M subspaces, k-means each subspace independently, and store a
  // vector as M small code ints — 64 floats (256 B) become 4 ints that
  // fit a single word, a 16–64× scan/shuffle reduction. Search is
  // asymmetric distance computation (ADC): the query stays full-
  // precision, each (subspace, code) inner product is computed ONCE
  // into a lookup table of M×K entries per query, and scoring a corpus
  // row is M table lookups + one divide by its stored true norm. All
  // portable arithmetic (the same sequential-fold dots and decimal-
  // exact sums as the IVF family), so train → encode → search is
  // oracle-checkable end to end.

  /** One trained codebook entry: (subspace, code, centroid of the
    * subspace's slice). */
  type PqBooks = Array[(Int, Int, Array[Float])]

  private def pqBooksDf(spark: org.apache.spark.sql.SparkSession,
                        books: PqBooks): DataFrame = {
    import spark.implicits._
    broadcast(books.toSeq.toDF("sub", "code", "cv")
      .withColumn("c2", VectorOps.dot(col("cv"), col("cv"))))
  }

  /** Per-(row, subspace) nearest code under the |sv−c|² = |c|² − 2·sv·c
    * identity (|sv|² is constant per row), ties to the smaller code.
    * `base` must carry (id, v, n); emits (id, sub, code, sv, n).
    */
  private def pqAssign(base: DataFrame, books: PqBooks,
                       dsub: Int): DataFrame =
    base.crossJoin(pqBooksDf(base.sparkSession, books))
      .withColumn("sv", slice(col("v"), col("sub") * dsub + 1, lit(dsub)))
      .withColumn("d",
        col("c2") - lit(2.0) * VectorOps.dot(col("sv"), col("cv")))
      .groupBy(col("id"), col("sub"))
      .agg(min_by(col("code"), struct(col("d"), col("code"))).as("code"),
        first(col("sv")).as("sv"), first(col("n")).as("n"))

  /** Train M×K codebooks with deterministic Lloyd iterations —
    * [[ivfAssign]]'s recipe per subspace: init code j of every subspace
    * from the j-th corpus vector in id order, decimal-EXACT centroid
    * means (partition order cannot perturb them), empty codes keep
    * their centroid. The training crossJoin is corpus × (m·k) rows of
    * broadcast codebook — the standard PQ encode cost, with each
    * distance over dsub dims, not the full dimension.
    */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
              m: Int, k: Int, iters: Int = 1): PqBooks = {
    val spark = corpus.sparkSession
    // skip the persist when the CALLER's frame is already cached (e.g.
    // ivfPqBuild hands in its persisted residual corpus): this cheap
    // projection then reads the existing cache, instead of pinning a
    // second corpus-sized MEMORY_AND_DISK copy of the same rows for the
    // whole training loop — double storage-pool pressure at scale
    val callerCached =
      corpus.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val baseRaw = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorOps.norm(col(vecCol)).as("n"))
    val base = if (callerCached) baseRaw
      else baseRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dim = base.select(size(col("v"))).head().getInt(0)
    require(m >= 1 && dim % m == 0,
      s"PQ needs dim divisible by m: dim=$dim, m=$m")
    val dsub = dim / m
    val seed = base.orderBy(col("id")).limit(k)
      .select(col("v")).collect().map(_.getSeq[Float](0).toArray)
    require(seed.length == k, s"PQ k=$k exceeds corpus size ${seed.length}")
    var books: PqBooks = (for {
      s <- 0 until m; j <- seed.indices
    } yield (s, j, seed(j).slice(s * dsub, (s + 1) * dsub))).toArray
    var it = 0
    while (it < iters) {
      val sums = pqAssign(base, books, dsub)
        .select(col("sub"), col("code"),
          posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg((sum(col("x").cast("double").cast("decimal(25,12)"))
          .cast("double") / count(lit(1))).as("mean"))
        .collect()
      val byKey = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
      books = books.map { case (s, c, old) =>
        byKey.get((s, c)) match {
          case Some(rows) =>
            val nv = old.clone()
            rows.foreach(r => nv(r.getInt(2)) = r.getDouble(3).toFloat)
            (s, c, nv)
          case None => (s, c, old)
        }
      }
      it += 1
    }
    if (!callerCached) base.unpersist(blocking = false)
    books
  }

  /** Encode a corpus against trained codebooks: one row per input id
    * with `codes` (the M nearest-code ints, subspace order) and `norm`
    * (the EXACT float norm, kept so ADC cosine divides by truth — norm
    * error is the avoidable half of PQ's approximation). This frame is
    * the index: M ints + a double per vector, persist it where the
    * float corpus would not fit.
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
               books: PqBooks): DataFrame = {
    val dsub = books.head._3.length
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorOps.norm(col(vecCol)).as("n"))
    pqAssign(base, books, dsub)
      .groupBy(col("id"))
      .agg(
        transform(array_sort(collect_list(struct(col("sub"), col("code")))),
          x => x("code")).as("codes"),
        first(col("n")).as("norm"))
  }

  /** ADC top-k: build each query's M×K inner-product lookup table once
    * (a broadcast of |queries|·m·k rows), explode each corpus row's M
    * codes, join on (sub, code), and sum the M looked-up terms
    * decimal-exactly into the approximate inner product; cosine
    * divides by the stored true norm. Returns (query_id, neighbor_id,
    * cos_adc, rank) with the family's (score desc, id) tie-break.
    */
  def pqAdcTopK(codes: DataFrame, books: PqBooks, queries: DataFrame,
                idCol: String, vecCol: String, k: Int,
                codesIdCol: String = "id"): DataFrame = {
    val dsub = books.head._3.length
    val lut = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
          VectorOps.norm(col(vecCol)).as("qn"))
        .crossJoin(pqBooksDf(queries.sparkSession, books))
        .select(col("query_id"), col("qn"), col("sub"), col("code"),
          VectorOps.dot(
            slice(col("qv"), col("sub") * dsub + 1, lit(dsub)),
            col("cv")).as("lut")))
    // codesIdCol: a [[pqEncode]] frame carries "id", but [[loadPqIndex]]
    // returns the codes under the caller's own id column name — the
    // documented load-then-search path must not need a rename ritual
    val ex = codes.select(col(codesIdCol).as("neighbor_id"), col("norm"),
      posexplode(col("codes")).as(Seq("sub", "code")))
    val nn = col("qn") * col("norm")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_adc").desc, col("neighbor_id"))
    ex.join(lut, Seq("sub", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("lut").cast("decimal(25,12)")).cast("double").as("ip"),
        first(col("qn")).as("qn"), first(col("norm")).as("norm"))
      .withColumn("cos_adc",
        when(nn === 0.0, 0.0).otherwise(col("ip") / nn))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_adc"),
        col("rank"))
  }

  /** Persist a PQ index: the codes table (id-sorted — future appends
    * range-prune against it) under `path/codes` with the caller's id
    * column name (the tombstone sidecar is self-describing, like the
    * other five families), the M×K codebooks under `path/books`. A
    * fresh save drops any previous incarnation's tombstones.
    */
  def savePqIndex(enc: DataFrame, books: PqBooks, path: String,
                  idCol: String): Unit = {
    val spark = enc.sparkSession
    import spark.implicits._
    enc.select(col("id").as(idCol), col("codes"), col("norm"))
      .sortWithinPartitions(col(idCol))
      .write.mode("overwrite").parquet(s"$path/codes")
    books.toSeq.toDF("sub", "code", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/books")
    Tombstones.drop(spark, s"$path/tombstones")
  }

  /** Load a persisted PQ index: codes with tombstoned ids anti-joined
    * away, plus the codebooks (M×K×dsub floats — driver-sized by
    * construction). */
  def loadPqIndex(spark: org.apache.spark.sql.SparkSession,
                  path: String): (DataFrame, PqBooks) =
    (Tombstones.applySelfTo(spark.read.parquet(s"$path/codes"),
      s"$path/tombstones"), readPqBooks(spark, path))

  /** The one place the persisted codebook layout is interpreted (the
    * analogue of readIvfCentroids) — [[appendPqIndex]] needs ONLY the
    * books, and routing it through [[loadPqIndex]] built and discarded
    * the tombstone-filtered codes frame each append.
    */
  private def readPqBooks(spark: org.apache.spark.sql.SparkSession,
                          path: String): PqBooks =
    spark.read.parquet(s"$path/books")
      .select(col("sub"), col("code"), col("cv")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .sortBy(b => (b._1, b._2))

  /** Grow a persisted PQ index with a new batch against FROZEN
    * codebooks — the same incremental contract as [[appendIvfIndex]]:
    * history vectors are never re-read, codebooks never retrain (a
    * retrain is a deliberate rebuild), already-indexed ids anti-join
    * away with the history side range-pruned to the batch's id span,
    * appended files are id-sorted so future appends prune them too,
    * and an append revives any tombstoned batch id. Drift under frozen
    * codebooks degrades recall exactly as IVF's doc describes —
    * rebuild on a quiet moment when the distribution moves.
    */
  def appendPqIndex(newRows: DataFrame, path: String, idCol: String,
                    vecCol: String): Unit = {
    val spark = newRows.sparkSession
    Tombstones.clear(newRows.select(col(idCol)), idCol,
      s"$path/tombstones")
    val books = readPqBooks(spark, path)
    val batch = newRows.select(col(idCol), col(vecCol))
      .filter(col(idCol).isNotNull).dropDuplicates(idCol)
    val fresh = Lifecycle.freshByIdRange(batch, newRows, idCol,
      spark.read.parquet(s"$path/codes").select(col(idCol)), idCol)
    pqEncode(fresh, idCol, vecCol, books)
      .select(col("id").as(idCol), col("codes"), col("norm"))
      .sortWithinPartitions(col(idCol))
      .write.mode("append").parquet(s"$path/codes")
  }

  /** Tombstone ids out of a persisted PQ index: searches over a fresh
    * [[loadPqIndex]] stop returning them immediately;
    * [[compactPqIndex]] removes the rows physically. Codebooks are
    * untouched — deletion is membership, not a retrain. */
  def deleteFromPqIndex(ids: DataFrame, path: String, idCol: String): Unit =
    Tombstones.add(ids.select(col(idCol)), idCol, s"$path/tombstones")

  /** Apply tombstones physically and collapse duplicate ids a legacy
    * index may carry, rewriting the codes table id-range-partitioned
    * and id-sorted (append-time range pruning skips whole files again
    * after many small appends). Same staged swap and quiet-moment
    * contract as every compaction here. */
  def compactPqIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String, idCol: String,
                     targetRowsPerRange: Long = 1L << 22): Unit = {
    val codes = Tombstones.applyTo(
      spark.read.parquet(s"$path/codes"), idCol, s"$path/tombstones")
    // total-order key (norm, codes): min_by on norm alone ties when a
    // duplicate id carries equal norms with different codes, and a tied
    // pick is executor-order nondeterministic (same fix as
    // compactIvfIndex's)
    val dedup = codes.groupBy(col(idCol))
      .agg(min_by(struct(col("codes"), col("norm")),
        struct(col("norm"), col("codes"))).as("r"))
      .select(col(idCol), col("r.codes").as("codes"), col("r.norm").as("norm"))
    val n = dedup.count()
    val ranges = math.max(1L,
      (n + targetRowsPerRange - 1) / targetRowsPerRange).toInt
    Lifecycle.stagedSwap(spark, s"$path/codes") { staged =>
      dedup.repartitionByRange(ranges, col(idCol))
        .sortWithinPartitions(col(idCol))
        .write.mode("overwrite").parquet(staged)
    }
    Tombstones.drop(spark, s"$path/tombstones")
  }

  // --- IVF-PQ: coarse cells + PQ on residuals ----------------------
  //
  // The two index families composed the way production ANN engines
  // ship them: IVF's cells bound WHICH rows a query scores (partition
  // pruning) and PQ compresses WHAT each scored row costs (M code
  // ints per vector) — but the codes quantize the RESIDUAL v − c(v)
  // rather than the vector, because residuals concentrate near zero
  // and the same codebook budget spends itself on a far smaller
  // volume. Scoring decomposes exactly: q·v ≈ q·c + q·r̂, where q·c
  // is one dot per PROBED CELL (nProbe terms, not per-row) and q·r̂
  // is the plain M-lookup ADC sum — so the per-row cost is identical
  // to flat PQ while touching only the probed cells' rows.

  /** Build: one frozen-centroid IVF pass (`cellIters` Lloyd rounds),
    * per-row float residuals against the final centroids, PQ trained
    * on the residuals, residual codes per row with the ORIGINAL
    * vector's norm (the cosine denominator must be truth, like flat
    * PQ's). Returns (codes frame `(id, cell, codes, norm)`, cell
    * centroids, residual codebooks).
    */
  def ivfPqBuild(corpus: DataFrame, idCol: String, vecCol: String,
                 nCells: Int, m: Int, kCodes: Int, cellIters: Int = 1,
                 pqIters: Int = 1)
      : (DataFrame, Array[(Int, Array[Float])], PqBooks) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (cells, cents) =
      ivfAssign(corpus, idCol, vecCol, nCells, iters = cellIters)
    val cdf = broadcast(cents.toSeq.toDF("cell", "ccv"))
    // float32 subtraction — the arithmetic any engine reproduces
    val res = cells.join(cdf, Seq("cell"))
      .select(col(idCol).as("id"),
        zip_with(col(vecCol), col("ccv"), (a, b) => a - b).as("rv"),
        VectorOps.norm(col(vecCol)).as("n"), col("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    res.count()
    cells.unpersist(blocking = false)
    val books = pqTrain(res, "id", "rv", m, kCodes, pqIters)
    val dsub = books.head._3.length
    val enc = pqAssign(res.select(col("id"), col("rv").as("v"),
        col("n")), books, dsub)
      .groupBy(col("id"))
      .agg(
        transform(array_sort(collect_list(struct(col("sub"), col("code")))),
          x => x("code")).as("codes"),
        first(col("n")).as("norm"))
      .join(res.select(col("id"), col("cell")), Seq("id"))
      .select(col("id"), col("cell"), col("codes"), col("norm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    enc.count()
    res.unpersist(blocking = false)
    (enc, cents, books)
  }

  /** Search: nProbe nearest cells per query (the |q|²-free identity),
    * one residual LUT per query (cell-independent — that is what the
    * residual decomposition buys), one q·c term per probed cell, ADC
    * over ONLY the probed cells' code rows, cosine against the stored
    * true norms. Same (score desc, id) tie-break as every family.
    */
  def ivfPqSearch(enc: DataFrame, cents: Array[(Int, Array[Float])],
                  books: PqBooks, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int, nProbe: Int = 4): DataFrame = {
    val spark = enc.sparkSession
    import spark.implicits._
    val dsub = books.head._3.length
    val cdf = broadcast(cents.toSeq.toDF("cell", "ccv")
      .withColumn("c2", VectorOps.dot(col("ccv"), col("ccv"))))
    val qf = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorOps.norm(col(vecCol)).as("qn"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("d"), col("cell"))
    val probes = broadcast(qf.crossJoin(cdf)
      .withColumn("d",
        col("c2") - lit(2.0) * VectorOps.dot(col("qv"), col("ccv")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qn"), col("cell"),
        VectorOps.dot(col("qv"), col("ccv")).as("qc")))
    val lut = broadcast(qf
      .crossJoin(pqBooksDf(spark, books))
      .select(col("query_id"), col("sub"), col("code"),
        VectorOps.dot(
          slice(col("qv"), col("sub") * dsub + 1, lit(dsub)),
          col("cv")).as("lut")))
    val ex = enc.select(col("id").as("neighbor_id"), col("cell"),
      col("norm"), posexplode(col("codes")).as(Seq("sub", "code")))
    val nn = col("qn") * col("norm")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_adc").desc, col("neighbor_id"))
    ex.join(probes, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .join(lut, Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("lut").cast("decimal(25,12)")).cast("double").as("rdot"),
        first(col("qc")).as("qc"), first(col("qn")).as("qn"),
        first(col("norm")).as("norm"))
      .withColumn("cos_adc",
        when(nn === 0.0, 0.0).otherwise((col("qc") + col("rdot")) / nn))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_adc"),
        col("rank"))
  }

  /** The production two-stage: ADC over the compressed index proposes
    * k·candidateFactor candidates per query, then ONLY those rows are
    * rescored with the exact float cosine — the [[rescoredTopK]] shape
    * with PQ's 16–64× cheaper first stage. Composed recall is floored
    * in SimilaritySpec against the brute-force truth.
    */
  def pqRescoredTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int, m: Int, kCodes: Int,
                     iters: Int = 1, candidateFactor: Int = 4): DataFrame = {
    require(candidateFactor >= 1)
    val books = pqTrain(corpus, idCol, vecCol, m, kCodes, iters)
    val enc = pqEncode(corpus, idCol, vecCol, books)
    val cand = pqAdcTopK(enc, books, queries, idCol, vecCol,
      k * candidateFactor)
    exactRescore(corpus, queries, idCol, vecCol, cand, k)
  }
}
