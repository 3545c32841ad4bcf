package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in optimizer rule: rewrite exact `COUNT(DISTINCT x)` into the
  * HyperLogLog++ sketch aggregate when
  * `spark.graft.approxDistinct.enabled=true` (off by default).
  *
  * The 100 TB rationale: an exact distinct count expands into an extra
  * shuffle round (`Expand` + two-phase aggregate over the distinct keys),
  * with memory proportional to the number of distinct values per group.
  * The sketch is one constant-memory pass. Flipping a config — instead of
  * editing every query — is the right control surface when an analyst
  * workload moves from a sample to the full corpus.
  *
  * Runs via `SparkSessionExtensions.injectOptimizerRule` (operator
  * optimization batch, before `RewriteDistinctAggregates` expands the
  * distinct), so the pattern below still sees `isDistinct = true`.
  * Multi-argument COUNT(DISTINCT a, b) and filtered aggregates are left
  * untouched.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.approxDistinct.enabled"
  val RsdKey = "spark.graft.approxDistinct.rsd"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    val rsd = conf.getConfString(RsdKey, "0.05").toDouble
    plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _)
              if child.deterministic =>
            AggregateExpression(
              HyperLogLogPlusPlus(child, rsd), Complete, isDistinct = false,
              filter = None, resultId = ae.resultId)
        }
    }
  }
}
