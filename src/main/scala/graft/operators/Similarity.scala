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
