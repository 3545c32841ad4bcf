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

  /** Random-hyperplane LSH signature: `bits` sign bits of plane·vector,
    * packed into a long (native expression; plane components are
    * deterministic fmix64-derived pseudo-randoms — no RNG state, stable
    * across runs and clusters). Vectors close in cosine agree on most bits.
    */
  def hyperplaneSignature(vec: Column, bits: Int): Column =
    graft.functions.HashFunctions.hyperplaneSignature(vec, bits)

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
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
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
        // decimal-exact mean: partition order can't perturb the centroids
        .agg(avg(col("x").cast("decimal(25,12)")).cast("double").as("m"))
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
    (assigned().select(col("id").as(idCol), col("v").as(vecCol), col("cell")),
      centroids)
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 4,
              iters: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (cells, centroids) = ivfAssign(corpus, idCol, vecCol, nCells, iters)
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

  /** ANN via LSH buckets: group vectors by signature prefix, search only
    * within the bucket. Returns per-query top-k among same-bucket rows —
    * recall < 1 by design; compare against [[bruteForceTopK]] to measure.
    * `prefixBits` trades recall (fewer bits → bigger buckets) for cost.
    */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
              bits: Int = 16, prefixBits: Int = 8): DataFrame = {
    val mask = (1L << prefixBits) - 1
    val sig = corpus.select(col(idCol), col(vecCol),
      VectorOps.norm(col(vecCol)).as("nrm"),
      (hyperplaneSignature(col(vecCol), bits).bitwiseAND(mask)).as("bucket"))
    val l = sig.select(col("bucket"), col(idCol).as("query_id"),
      col(vecCol).as("qv"), col("nrm").as("qn"))
    val r = sig.select(col("bucket"), col(idCol).as("neighbor_id"),
      col(vecCol).as("nv"), col("nrm").as("nn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val nn = col("qn") * col("nn")
    l.join(r, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", when(nn === 0.0, 0.0)
        .otherwise(VectorOps.dot(col("qv"), col("nv")) / nn))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("neighbor_id"), col("cos"),
        col("rank"))
  }
}
