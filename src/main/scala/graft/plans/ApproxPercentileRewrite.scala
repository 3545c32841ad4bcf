package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Opt-in optimizer rule: rewrite exact `percentile` / `PERCENTILE_CONT`
  * aggregates into the bounded-memory Greenwald–Khanna sketch
  * (`ApproximatePercentile`, i.e. `percentile_approx`) when
  * `spark.graft.approxPercentile.enabled=true` (off by default).
  *
  * The 100 TB rationale (SURVEY §7.5, the A4 hazard): exact `Percentile`
  * buffers EVERY distinct (value, count) pair of a group in an in-memory
  * map before interpolating — per-group memory proportional to group
  * cardinality, which at full-corpus scale is the one aggregate in the
  * reference surface (`PERCENTILE_CONT(0.5)`, reference
  * `webserver/server.py:222-231`) that can OOM an executor on a skewed
  * group. The sketch holds a CONSTANT number of quantile summaries per
  * group (controlled by `spark.graft.approxPercentile.accuracy`, default
  * 10000 ≈ 1/10000 rank error) and merges associatively, so the same
  * query runs map-side partial aggregation with bounded buffers.
  * Flipping a config — not editing every query — is the right control
  * surface when a workload moves from a sample to the full corpus; the
  * exact form stays the oracle anchor at test scale.
  *
  * Semantics note: the sketch returns an OBSERVED value at the target
  * rank (within the accuracy bound) rather than Percentile's linear
  * interpolation between the two straddling values — the documented
  * `percentile_approx` contract. The child is cast to double so the
  * rewritten aggregate keeps Percentile's DoubleType (resp.
  * array<double>) result type and the surrounding plan resolves
  * unchanged.
  *
  * Left untouched: weighted percentiles (frequency ≠ 1 — the sketch has
  * no frequency arm), descending form (`reverse = true`), DISTINCT
  * percentiles, and non-deterministic children. For a mergeable sketch
  * VALUE (persist / union across batches, not just one query's answer),
  * see [[graft.functions.TDigestSketch]] — this rule is the
  * query-shaped face, the t-digest is the index-shaped one.
  */
object ApproxPercentileRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approxPercentile.enabled"
  val AccuracyKey = "spark.graft.approxPercentile.accuracy"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    val accuracy = conf.getConfString(AccuracyKey, "10000").toInt
    plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(
                Percentile(child, pct, Literal(1L, _), _, _, false),
                mode, false, filter, _)
              if child.deterministic && pct.foldable =>
            val dChild =
              if (child.dataType == DoubleType) child
              else Cast(child, DoubleType)
            AggregateExpression(
              new ApproximatePercentile(dChild, pct,
                Literal(accuracy)),
              mode, isDistinct = false, filter = filter,
              resultId = ae.resultId)
        }
    }
  }
}
