package graft

/** Writes each named query's `explain("formatted")` to
  * `<outDir>/<query>_<tag>.txt` — the committed plan evidence an
  * optimization round pairs with its bench numbers (plans/rNN/).
  *
  * `sbt "runMain graft.PlanDump <outDir> <tag> [sfDir] [queryName...]"`
  * — no names = every declared query. Lifecycle queries execute their
  * eager stages while the frame is built; the dumped plan is the
  * returned (final-read) frame's, which is what the bench times after
  * the stage map accounts for the eager work.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <tag> [sfDir] [q...]")
    val outDir = args(0)
    val tag = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    val names = if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq
    val spark = graft.engine.Tables.session("local[4]", 4)
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => System.err.println(s"[plandump] no such query: $n")
        case Some(fn) =>
          val plan =
            try fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            catch { case e: Throwable => s"ERROR: ${e.getMessage}" }
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"),
            plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          spark.sharedState.cacheManager.clearCache()
          println(s"[plandump] $n -> $outDir/${n}_$tag.txt")
      }
    }
    spark.stop()
  }
}
