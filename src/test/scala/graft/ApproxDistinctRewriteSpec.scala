package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer-rule tier: a session built with GraftExtensions rewrites
  * COUNT(DISTINCT) into HLL++ under the config flag, leaves it exact
  * otherwise.
  */
class ApproxDistinctRewriteSpec extends AnyFunSuite {

  test("flag on: COUNT(DISTINCT) plans as HLL++ sketch; flag off: exact") {
    // base session must exist first (shared context); then build a session
    // WITH extensions on the same context
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val li = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct("l_orderkey").as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      s.conf.set(graft.plans.ApproxDistinctRewrite.ConfKey, "true")
      val approxDf = li.groupBy("l_returnflag")
        .agg(countDistinct("l_orderkey").as("d"))
      val plan = approxDf.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"),
        s"expected HLL++ rewrite in plan:\n$plan")
      val approx = approxDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (k, ex) =>
        assert(math.abs(approx(k) - ex).toDouble / ex < 0.15, s"$k: $ex vs ${approx(k)}")
      }

      s.conf.set(graft.plans.ApproxDistinctRewrite.ConfKey, "false")
      val exactPlan = li.groupBy("l_returnflag")
        .agg(countDistinct("l_orderkey")).queryExecution.optimizedPlan.toString
      assert(!exactPlan.contains("approx_count_distinct"))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
