package graft

import org.apache.spark.sql.SparkSession

/** Developer utility: time a subset of SparkEntry queries by name.
  *
  * `sbt "runMain graft.BenchOne q37_dedup_clusters q19_minhash_lsh"` —
  * same session config and noop-sink methodology as [[Bench]], but only
  * the named queries, with per-rep times printed (not just the min) so
  * cold-vs-warm and ambient-noise effects are visible while iterating.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    graft.engine.Tables.all.foreach { n =>
      try graft.engine.Tables.load(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[benchone] no such query: $name")
        case Some(fn) =>
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val dt = (System.nanoTime() - t0) / 1e9
            spark.sharedState.cacheManager.clearCache()
            dt
          }
          val fp =
            try PlanFingerprint.of(fn(spark, sfDir))
            catch { case e: Throwable => s"error:${e.getClass.getSimpleName}" }
          spark.sharedState.cacheManager.clearCache()
          println(f"$name%-28s ${times.map(t => f"$t%.2f").mkString(" ")}  min=${times.min}%.2f  plan=$fp")
      }
    }
    spark.stop()
  }
}
