package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TDigestSketch

/** Measurement utility for the A4 percentile hazard (BASELINE.md): the
  * same median query in its three forms —
  *
  *  1. exact `percentile` (per-group buffer of every distinct value —
  *     the oracle anchor and the 100 TB hazard),
  *  2. the [[graft.plans.ApproxPercentileRewrite]] flag (GK sketch,
  *     constant buffers, same query text),
  *  3. the [[TDigestSketch.percentileAgg]] mergeable sketch,
  *
  * on the hazard-shaped grouping: FEW groups × MILLIONS of rows each
  * (sf0.1 lineitem by l_returnflag — 3 groups of ~2.4 M values), where
  * the exact form's per-group buffers are largest. min-of-2 per form,
  * cache cleared between reps, like Bench.
  */
object PercentileBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count() // file-cache warmup

    // clock stops BEFORE the cache clear (like Bench / BenchCurve) —
    // teardown time inside the interval would skew the small approx
    // numbers proportionally most, distorting exactly the ratios this
    // file exists to record
    def timeMin(f: => Unit): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        dt
      }.min

    def run(tag: String)(f: => Unit): Unit =
      println(f"$tag%-12s ${timeMin(f)}%.2f s")

    def base = li.groupBy("l_returnflag")
    val noop = (df: org.apache.spark.sql.DataFrame) =>
      df.write.format("noop").mode("overwrite").save()

    run("exact") {
      noop(base.agg(expr("percentile(l_extendedprice, 0.5)").as("med")))
    }
    spark.conf.set(graft.plans.ApproxPercentileRewrite.ConfKey, "true")
    run("rewrite_gk") {
      noop(base.agg(expr("percentile(l_extendedprice, 0.5)").as("med")))
    }
    spark.conf.set(graft.plans.ApproxPercentileRewrite.ConfKey, "false")
    run("tdigest") {
      noop(base.agg(
        TDigestSketch.percentileAgg(col("l_extendedprice"), 0.5).as("med")))
    }
    // accuracy cross-check at this scale, printed for the record
    val ex = base.agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    spark.conf.set(graft.plans.ApproxPercentileRewrite.ConfKey, "true")
    val gk = base.agg(expr("percentile(l_extendedprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    spark.conf.set(graft.plans.ApproxPercentileRewrite.ConfKey, "false")
    val td = base.agg(
        TDigestSketch.percentileAgg(col("l_extendedprice"), 0.5).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ex.foreach { case (k, v) =>
      println(f"$k gk_rel_err=${math.abs(gk(k) - v) / v}%.2e " +
        f"td_rel_err=${math.abs(td(k) - v) / v}%.2e")
    }
  }
}
