package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Scd

/** Decade measurement for [[graft.sources.Scd]] (not driver-run; feeds
  * BASELINE.md): the claim that matters for a long-lived dimension is
  * that a merge's cost tracks the BATCH and the CURRENT table, not the
  * accumulated history — the `__closed`-first clustering plus the
  * `__closed = 0` stat screen is what buys it. Three dimensions share
  * one current size (`baseKeys` keys) while their closed history grows
  * ×1/×4/×10 (full-table merge epochs); on each we time (a) a merge
  * changing a fixed 5% key slice, (b) the identical no-op re-merge
  * (pure change-detection cost), and (c) a `current()` count. Flat
  * times across the decade are the receipt; `history()` row counts
  * prove the decade actually grew. One JSON line on stdout, like Bench.
  *
  * Usage: `runMain graft.ScdCurve [baseKeys]` (default 200k).
  */
object ScdCurve {

  def main(args: Array[String]): Unit = {
    val baseKeys = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def dim(epoch: Long) =
      spark.range(0L, baseKeys).select(col("id").as("k"),
        (col("id") % 97).as("grp"), (col("id") * 31 + epoch).as("v"))

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val out = Seq(1, 4, 10).map { n =>
      val root = new java.io.File(
        Files.createTempDirectory(s"graft_scd_x$n").toFile, "data").getPath
      // history = n × current: epoch 0 loads, epochs 1..n-1 change
      // EVERY key (each closes the full current generation)
      (0L until n.toLong).foreach(e =>
        Scd.merge(spark, root, "k", dim(e), files = 8))
      val historyRows = Scd.history(spark, root).count()
      // the measured merge: a fixed 5% slice changes payload
      val slice = dim(999L).filter(col("k") < baseKeys / 20)
      val (vMerge, tMerge) =
        timed(Scd.merge(spark, root, "k", slice, files = 2))
      // pure change detection: the identical batch must be version-free
      val (vNoop, tNoop) = timed(Scd.merge(spark, root, "k", slice,
        files = 2))
      require(vNoop == vMerge,
        s"no-op re-merge burned a version ($vMerge -> $vNoop) — the " +
          "published noop_merge_s would measure a real commit")
      val (nCur, tCur) = timed(Scd.current(spark, root).count())
      require(nCur == baseKeys, s"current must stay $baseKeys, got $nCur")
      (n, historyRows, tMerge, tNoop, vNoop, tCur)
    }

    val fields = out.map { case (n, h, tm, tn, _, tc) =>
      s""""x$n":{"history_rows":$h,"merge_s":${f"$tm%.2f"},""" +
        s""""noop_merge_s":${f"$tn%.2f"},"current_count_s":${f"$tc%.2f"}}"""
    }
    println(s"""{"metric":"scd_decade","base_keys":$baseKeys,""" +
      fields.mkString(",") + "}")
    spark.stop()
  }
}
