package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splits — the train/val/test assignment a
  * training pipeline must be able to RE-DERIVE years later from the
  * id alone. `sample()`/`randomSplit()` are seed-and-partitioning
  * dependent (a repartition or a Spark upgrade reshuffles membership);
  * here membership is a pure function of the id string, so any engine
  * (this one, a SQL warehouse, a Python loader) computes the same
  * split for the same id, appends never move existing ids between
  * splits, and the whole thing is stateless built-in expressions — no
  * shuffle, no UDF, no stored assignment table to keep consistent at
  * 100 TB.
  *
  * Mechanics: the first 8 hex digits of md5(id) — md5(salt ':' id)
  * when salted — read as a
  * uniform 32-bit bucket; split boundaries are cumulative-weight
  * thresholds on that bucket. Boundary monotonicity is the quiet
  * win: growing a split's weight only MOVES the boundary, so ids
  * never swap between two untouched splits when ratios are retuned.
  * md5 here is a uniformity device, not cryptography.
  */
object Splits {

  /** The 32-bit assignment bucket for `idCol` (in [0, 2^32)): hex
    * parse of the md5 prefix, SQL-portable (`conv` ≡ any engine's
    * hex-to-int). `salt` namespaces independent assignments — two
    * different salts give independent splits of the same corpus.
    */
  def bucket32(idCol: Column, salt: String): Column = {
    // DELIMITED salt (r12): bare concatenation made prefix-related
    // (salt, id) pairs collide — md5("v1" ++ "2abc") == md5("v" ++
    // "12abc") — so two "independent" salted assignments could be
    // correlated. ':' is banned FROM SALTS (ids may contain anything:
    // with a colon-free salt the first ':' unambiguously ends it).
    // The unsalted form stays md5(id) — the published portable formula
    // and the q107 oracle's.
    require(!salt.contains(":"),
      s"salt '$salt' contains ':' — the salt delimiter; pick another")
    val keyed =
      if (salt.isEmpty) idCol.cast("string")
      else concat(lit(salt + ":"), idCol.cast("string"))
    conv(substring(md5(keyed), 1, 8), 16, 10).cast("long")
  }

  /** Add a `split` column assigning each row to one of `weights`'
    * named fractions (e.g. `Seq("train" -> 0.8, "val" -> 0.1,
    * "test" -> 0.1)`). Weights must be positive and sum to 1 (±1e-9).
    * Assignment is exhaustive and exclusive by construction; expected
    * sizes are proportional with binomial deviation (a few ‰ at 1M
    * rows). NULL ids are rejected loudly — a silent null bucket would
    * put every null row in the first split.
    */
  def assignSplit(df: DataFrame, idCol: String,
                  weights: Seq[(String, Double)],
                  salt: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"split weights must be positive: $weights")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1: $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"split names must be distinct: ${weights.map(_._1)}")
    val b = bucket32(col(idCol), salt)
    // cumulative thresholds as exact longs on the 2^32 scale — the
    // same integers any SQL re-derivation will inline
    val bounds = weights.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(c * 4294967296.0).toLong)
    val assigned = weights.map(_._1).zip(bounds).init
      .foldRight(lit(weights.last._1)) { case ((name, hi), rest) =>
        when(b < hi, name).otherwise(rest)
      }
    df.withColumn("split",
      when(col(idCol).isNull, raise_error(
        lit(s"assignSplit: NULL $idCol — split membership must be " +
          "derivable from the id"))).otherwise(assigned))
  }

  /** Add a `fold` column in [0, k): the bucket mod k — deterministic
    * k-fold cross-validation with the same id-function guarantees as
    * [[assignSplit]]. Use a different `salt` than the split's so folds
    * are independent of the train/test boundary. */
  def assignFold(df: DataFrame, idCol: String, k: Int,
                 salt: String = "fold"): DataFrame = {
    require(k >= 2, s"k-fold needs k >= 2, got $k")
    df.withColumn("fold",
      when(col(idCol).isNull, raise_error(
        lit(s"assignFold: NULL $idCol"))).otherwise(
        (bucket32(col(idCol), salt) % k).cast("int")))
  }
}
