package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}

import graft.sources.Layout

/** Driver-memory ceiling measurement for partitioned-manifest handling
  * (VERDICT r11 task 5): the per-leaf manifest design keeps every
  * PER-LEAF list small, but [[Layout.prunedReadPartitioned]] still
  * materializes driver-side, per call: the full leaf listing, the
  * listed (leaf, basename, path) triples of every surviving leaf, the
  * kept-file collect, and the final `spark.read.parquet(files: _*)`
  * path array. This main builds a synthetic table at census scale —
  * default 1000 leaves × 100 files = 100k files — and measures wall
  * time and retained heap for [[Layout.leafCensus]] and for wide/narrow
  * pruned reads, so the ceiling is a measured slope (bytes and seconds
  * per file) instead of a guess.
  *
  * Context for reading the numbers: plain `spark.read.parquet(root)`
  * on the same table ALSO builds a driver-resident InMemoryFileIndex
  * of all 100k FileStatus objects — the engine's extra driver state is
  * the same order of magnitude as what any Spark read already holds,
  * not a new class of cost.
  *
  * Setup is fabricated for speed, with production-shaped artifacts:
  * data files are byte-copies of one real 1-row parquet file (valid
  * footers — the final read in prunedReadPartitioned infers schema
  * from them), and manifests are built in ONE partitioned Spark write
  * (then renamed under `_manifests/`) with the exact writer schema
  * (`file_name` as a `file:` URI, `n_rows`, `min_/max_/nulls_id`),
  * each file claiming a distinct id so stats pruning has real
  * selectivity. Emits one JSON line; BASELINE.md records it.
  *
  * Usage: `runMain graft.ManifestCeiling [nLeaves] [filesPerLeaf]`
  */
object ManifestCeiling {

  private def heapUsed(): Long = {
    (1 to 3).foreach(_ => System.gc())
    Thread.sleep(300)
    val rt = Runtime.getRuntime
    rt.totalMemory() - rt.freeMemory()
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }


  def main(args: Array[String]): Unit = {
    val nLeaves = if (args.length > 0) args(0).toInt else 1000
    val perLeaf = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = Files.createTempDirectory("graft_ceiling").toFile
    val root = new java.io.File(base, "data").getPath
    try {
      // seed: one real 1-row parquet file
      val seedDir = new java.io.File(base, "seed").getPath
      spark.range(1).selectExpr("id", "id AS v").coalesce(1)
        .write.parquet(seedDir)
      val seed = new java.io.File(seedDir).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath

      val (_, copySec) = timed {
        var l = 0
        while (l < nLeaves) {
          val leafDir = Paths.get(root, s"part=$l")
          Files.createDirectories(leafDir)
          var j = 0
          while (j < perLeaf) {
            Files.copy(seed, leafDir.resolve(s"part-$l-$j.parquet"),
              StandardCopyOption.REPLACE_EXISTING)
            j += 1
          }
          l += 1
        }
      }

      // manifests: one partitioned write, then rename under _manifests/
      val (_, manifestSec) = timed {
        val rows = for {
          l <- 0 until nLeaves; j <- 0 until perLeaf
        } yield {
          val idv = l.toLong * perLeaf + j
          (s"part=$l", s"file:$root/part=$l/part-$l-$j.parquet",
            1L, idv, idv, 0L)
        }
        val mtmp = new java.io.File(base, "mtmp").getPath
        rows.toDF("__leaf", "file_name", "n_rows",
            "min_id", "max_id", "nulls_id")
          .repartition(8, col("__leaf"))
          .write.partitionBy("__leaf").parquet(mtmp)
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        new java.io.File(mtmp).listFiles().filter(_.isDirectory)
          .foreach { d =>
            val leaf = Layout.decodePathComponent(d.getName.substring(
              d.getName.indexOf('=') + 1))
            val dst = new org.apache.hadoop.fs.Path(
              Layout.partitionManifestPath(root, leaf))
            fs.mkdirs(dst.getParent)
            require(fs.rename(new org.apache.hadoop.fs.Path(d.getPath),
              dst), s"rename ${d.getPath} -> $dst")
          }
      }

      val h0 = heapUsed()

      val (censusRows, censusSec) = timed {
        Layout.leafCensus(spark, root).collect()
      }
      require(censusRows.length == nLeaves &&
        censusRows.forall(_.getInt(1) == perLeaf),
        "census must see every leaf with every file")

      // wide: a dim range keeping ~half of all files (the enumeration
      // collects are full-size regardless of selectivity — byKey maps
      // every listed file of every surviving leaf)
      val total = nLeaves.toLong * perLeaf
      val (dfWide, wideSec) = timed {
        Layout.prunedReadPartitioned(spark, root, Seq(
          Layout.ColRange("id", lit(0L), lit(total / 2 - 1))))
      }
      val (wideFiles, wideEnumSec) = timed(dfWide.inputFiles.length)
      val h1 = heapUsed() // dfWide (and its file-index) still referenced

      // narrow: stats keep exactly one file; count proves the read is
      // real end-to-end (the seed row id=0 lives in the kept file)
      val (dfNarrow, narrowSec) = timed {
        Layout.prunedReadPartitioned(spark, root, Seq(
          Layout.ColRange("id", lit(0L), lit(0L))))
      }
      val narrowFiles = dfNarrow.inputFiles.length
      val narrowCount = dfNarrow.count()

      // deterministic accounting, independent of GC noise: the chars
      // the driver holds if it lists every file path once
      val pathChars = (0 until nLeaves).map { l =>
        (0 until perLeaf).map(j =>
          s"$root/part=$l/part-$l-$j.parquet".length.toLong).sum
      }.sum

      println(
        s"""{"metric":"manifest_ceiling","nLeaves":$nLeaves,""" +
        s""""filesPerLeaf":$perLeaf,"setup_copy_sec":${f"$copySec%.1f"},""" +
        s""""setup_manifest_sec":${f"$manifestSec%.1f"},""" +
        s""""census_sec":${f"$censusSec%.2f"},""" +
        s""""pruned_wide_sec":${f"$wideSec%.2f"},""" +
        s""""wide_files":$wideFiles,""" +
        s""""wide_enum_sec":${f"$wideEnumSec%.2f"},""" +
        s""""pruned_narrow_sec":${f"$narrowSec%.2f"},""" +
        s""""narrow_files":$narrowFiles,"narrow_rows":$narrowCount,""" +
        s""""heap_before_mb":${h0 / (1 << 20)},""" +
        s""""heap_after_mb":${h1 / (1 << 20)},""" +
        s""""path_mchars":${pathChars / 1000000.0}}""")
      require(dfWide != null)
    } finally {
      // 100k-file temp tree: reclaim it
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(base)
    }
  }
}
