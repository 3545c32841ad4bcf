package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** `tdigest_quantile(sketch, q)` — read a quantile out of a serialized
  * [[TDigestSketch]] sketch column. The SQL-face reader for sketches
  * persisted by `graft_tdigest_sketch` / merged by
  * `graft_tdigest_merge`, so the whole persist-merge-read lifecycle is
  * reachable from SQL text alone.
  *
  * Eval-only (CodegenFallback): sketch decode runs once per GROUP's
  * result row, never per data row — codegen would buy nothing on a
  * frame that is already aggregate-sized. Null sketch or null q →
  * null, like every Spark reader of an absent value.
  */
case class TDigestQuantile(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] =
    Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "tdigest_quantile"

  override protected def nullSafeEval(sketch: Any, q: Any): Any = {
    val qd = q.asInstanceOf[Double]
    require(qd >= 0 && qd <= 1,
      s"tdigest_quantile: q=$qd outside [0,1]")
    TDigestSketch.quantile(sketch.asInstanceOf[Array[Byte]], qd)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TDigestQuantile =
    copy(left = newLeft, right = newRight)
}
