package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{HyperplaneSignature, MinHashSignature, NgramHashes, NgramHashesAll, SimHash64, WinnowFingerprints}

/** SparkSessionExtensions entry point — registers the engine's custom
  * expressions as SQL functions, so the full surface is reachable from
  * `spark.sql(...)` as well as the Column API:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or: spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT simhash64(tokens), minhash_signature(tokens, 32) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in COUNT(DISTINCT) → HLL++ sketch rewrite (plans package)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite)
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => WinnowFingerprints(text, 8, 4)
        case Seq(text, k, w) =>
          WinnowFingerprints(text, intArg(k, "k"), intArg(w, "w"))
        case _ => throw new IllegalArgumentException(
          "winnow_fingerprints(text[, k, w])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens) => MinHashSignature(tokens, 32)
        case Seq(tokens, n) => MinHashSignature(tokens, intArg(n, "numHashes"))
        case _ => throw new IllegalArgumentException(
          "minhash_signature(tokens[, numHashes])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens) => SimHash64(tokens)
        case _ => throw new IllegalArgumentException("simhash64(tokens)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("ngram_hashes"),
      new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens, n) => NgramHashes(tokens, intArg(n, "n"))
        case _ => throw new IllegalArgumentException("ngram_hashes(tokens, n)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("ngram_hashes_all"),
      new ExpressionInfo(classOf[NgramHashesAll].getName, "ngram_hashes_all"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens, n) => NgramHashesAll(tokens, intArg(n, "n"))
        case _ => throw new IllegalArgumentException("ngram_hashes_all(tokens, n)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_signature"),
      new ExpressionInfo(classOf[HyperplaneSignature].getName, "hyperplane_signature"),
      (args: Seq[Expression]) => args match {
        case Seq(vec, bits) => HyperplaneSignature(vec, intArg(bits, "bits"), 0L)
        case Seq(vec, bits, seed) =>
          HyperplaneSignature(vec, intArg(bits, "bits"), intArg(seed, "seed").toLong)
        case _ => throw new IllegalArgumentException(
          "hyperplane_signature(vec, bits[, seed])")
      }))
  }
}

object GraftExtensions {

  private[graft] def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  /** Register the same functions on an ALREADY-RUNNING session (extensions
    * configs only apply at session construction).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("winnow_fingerprints", {
      case Seq(text) => WinnowFingerprints(text, 8, 4)
      case Seq(text, k, w) => WinnowFingerprints(text, intArg(k, "k"), intArg(w, "w"))
      case _ => throw new IllegalArgumentException("winnow_fingerprints(text[, k, w])")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature", {
      case Seq(tokens) => MinHashSignature(tokens, 32)
      case Seq(tokens, n) => MinHashSignature(tokens, intArg(n, "numHashes"))
      case _ => throw new IllegalArgumentException("minhash_signature(tokens[, numHashes])")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("simhash64", {
      case Seq(tokens) => SimHash64(tokens)
      case _ => throw new IllegalArgumentException("simhash64(tokens)")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("ngram_hashes", {
      case Seq(tokens, n) => NgramHashes(tokens, intArg(n, "n"))
      case _ => throw new IllegalArgumentException("ngram_hashes(tokens, n)")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("ngram_hashes_all", {
      case Seq(tokens, n) => NgramHashesAll(tokens, intArg(n, "n"))
      case _ => throw new IllegalArgumentException("ngram_hashes_all(tokens, n)")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("hyperplane_signature", {
      case Seq(vec, bits) => HyperplaneSignature(vec, intArg(bits, "bits"), 0L)
      case Seq(vec, bits, seed) =>
        HyperplaneSignature(vec, intArg(bits, "bits"), intArg(seed, "seed").toLong)
      case _ => throw new IllegalArgumentException("hyperplane_signature(vec, bits[, seed])")
    }, "scala_udf")
  }
}
