package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `ArrayType(FloatType)` columns using only
  * codegen'd built-ins (`zip_with` + `aggregate`) — no UDF boxing, and the
  * left-fold accumulation order makes results bit-deterministic regardless
  * of partitioning.
  *
  * All math is promoted to double before multiply/accumulate so results
  * match engines that compute in double (and don't drift with float
  * accumulation order).
  */
object VectorOps {

  /** Native single-loop dot product (array<float> inputs; left-to-right
    * double accumulation — same fold order as the HOF form and as a
    * sequential list sum, so values are identical across formulations).
    */
  def dot(a: Column, b: Column): Column = HashFunctions.dotFF(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 for zero-norm inputs (instead of NaN). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }

  /** Squared L2 distance (cheaper than sqrt for nearest-neighbor ranking). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, x) => acc + x)
}
