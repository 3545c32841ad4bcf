package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.TimeTravel

/** Decade measurement for [[TimeTravel.compactSmall]] (not driver-run;
  * feeds BASELINE.md): the claim that matters at 100 TB is that the
  * pack's cost tracks the SMALL bytes, not the table — so this main
  * builds three lakes whose BIG generation grows ×1/×4/×10 while the
  * streaming-style dribble (four single-file commits) stays constant,
  * and times `compactSmall` on each. Flat pack time across the decade
  * plus a constant small-file byte count is the honest receipt; a
  * full [[TimeTravel.compact]] is timed alongside as the
  * table-proportional contrast. One JSON line on stdout, like Bench.
  *
  * Usage: `runMain graft.CompactionCurve [baseRows]` (default 200k).
  */
object CompactionCurve {

  def main(args: Array[String]): Unit = {
    val baseRows = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rows(lo: Long, hi: Long) =
      spark.range(lo, hi).select(col("id"), (col("id") % 97).as("grp"),
        (col("id") * 3).as("v"))

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val out = Seq(1, 4, 10).map { n =>
      val root = new java.io.File(
        Files.createTempDirectory(s"graft_cc_x$n").toFile, "data").getPath
      val big = baseRows * n
      // the big generation: 8 at-size files
      TimeTravel.commitAppend(rows(0L, big), root, Seq("id"), files = 8)
      // the constant dribble: four tiny single-file commits
      (0 until 4).foreach { i =>
        TimeTravel.commitAppend(
          rows(big + i * 5000L, big + (i + 1) * 5000L),
          root, Seq("id"), files = 1): Unit
      }
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // target sized to discriminate: 2× the largest DRIBBLE file (the
      // lineage names versions 2..5's files), so only the dribble packs
      // and the receipt isolates the small-file cost
      val dribbleNames = TimeTravel.readLineage(spark, root)
        .filter(col("version") > 1 && col("action") === "add")
        .select("file_name").collect().map(_.getString(0)).toSet
      val lens = fs.listStatus(new org.apache.hadoop.fs.Path(root))
        .filter(_.isFile)
        .map(f => f.getPath.getName -> f.getLen)
      val target = lens.filter(f => dribbleNames(f._1)).map(_._2).max * 2
      val smallBytes = lens.map(_._2).filter(_ < target).sum
      val (_, dtSmall) = timed {
        TimeTravel.compactSmall(spark, root, Seq("id"), target)
      }
      // contrast: the table-proportional full rewrite
      val (_, dtFull) = timed {
        TimeTravel.compact(spark, root, Seq("id"), files = 8)
      }
      val head = TimeTravel.read(spark, root).count()
      require(head == big + 20000L, s"row loss at x$n: $head")
      f"""{"x":$n,"big_rows":$big,"small_bytes":$smallBytes,""" +
        f""""compact_small_sec":$dtSmall%.3f,"full_compact_sec":$dtFull%.3f}"""
    }
    println(s"""{"metric":"compaction_curve","base_rows":$baseRows,""" +
      s""""points":[${out.mkString(",")}]}""")
    spark.stop()
  }
}
