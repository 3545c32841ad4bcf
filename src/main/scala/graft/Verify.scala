package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Ordering is deliberate (VERDICT r9: `CORRECTNESS_r09.json` arrived `{}`
  * despite a 118/118-green engine): `oracle_sql.json` is written FIRST —
  * it needs nothing from the dumps — so a timeout/kill mid-dump leaves the
  * checker a complete oracle file and partial credit for every query that
  * finished, never an empty round. Each result is written with Spark's
  * natural parallelism (no `.coalesce(1)`: the checker globs `*.parquet`,
  * and the single-file squeeze serialized every write through one task),
  * and one stderr progress line per completed query timestamps the dump.
  *
  * SPARK_GRAFT_VERIFY_BUDGET_SEC: a wall-clock budget, DEFAULT 1200 s
  * (the full sf0.01 dump measures ~134 s at local[16], so the default is
  * ~9× headroom — it exists to self-bound a pathological run without any
  * env setup, per VERDICT r10). Once exceeded, remaining queries are
  * SKIPPED (loud stderr line each) but the run still exits 0 with a
  * complete artifact for everything attempted — partial credit must never
  * round down to `{}`. Queries are attempted in ascending measured-cost
  * order (cheapest first, from the committed r9 bench) so a tight budget
  * still covers the bulk of the suite. Set 0/negative or
  * off/none/unlimited/disable to disable; any other non-numeric value
  * fails loudly at startup (a typo silently coerced to the default could
  * quietly skip the lifecycle tail).
  *
  * Extra args after (sfDir, outDir) restrict the dump to the named
  * queries — a dev-loop convenience (single-query oracle checks via
  * tools/check_oracle.py) that leaves the driver's two-arg call
  * untouched; oracle_sql.json is filtered to the same subset so the
  * checker only compares what was dumped.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), names) = args.splitAt(2)
    val only: String => Boolean =
      if (names.isEmpty) _ => true else names.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // strict parse, loud failure AT STARTUP (before any Spark work):
    // a typo'd budget silently coerced to the default could quietly
    // skip the lifecycle tail on a slow run — misconfiguration must
    // error, and erroring in the first second is the loud version
    val budgetSec: Option[Double] =
      sys.env.get("SPARK_GRAFT_VERIFY_BUDGET_SEC") match {
        case None => Some(1200.0)
        case Some(s) if Set("off", "none", "unlimited", "disable")
          .contains(s.trim.toLowerCase) => None
        case Some(s) => scala.util.Try(s.trim.toDouble).toOption match {
          case Some(v) if v > 0 => Some(v)
          case Some(_)          => None // 0/negative = explicit disable
          case None => throw new IllegalArgumentException(
            s"SPARK_GRAFT_VERIFY_BUDGET_SEC='$s' is not a number — " +
              "use seconds, 0/negative to disable, or off/none/unlimited")
        }
      }
    // SPARK_GRAFT_TZ: the sixth oracle axis (r17) — run the whole gate
    // under a DST session zone (e.g. America/New_York) against an
    // oracle pinned to the same zone (check_oracle.py GRAFT_ORACLE_TZ).
    // Default stays the project-wide UTC pin.
    val tz = sys.env.getOrElse("SPARK_GRAFT_TZ", "UTC")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", tz)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(e => only(e._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    System.err.println(s"[verify] oracle_sql.json written (${json.length} bytes)")
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9
    // Cheapest-first under a budget: queries the r9 bench measured as
    // sub-second dump in seconds; the multi-stage lifecycle queries (the
    // 3–8 s tail) go last so a kill costs the fewest artifacts.
    val ordered = SparkEntry.queries.toSeq.filter(q => only(q._1))
      .sortBy { case (name, _) => VerifyCost.of(name) }
    val total = ordered.size
    var done = 0
    ordered.foreach { case (name, fn) =>
      if (budgetSec.exists(elapsed > _)) {
        System.err.println(
          f"[verify] SKIP $name (budget ${budgetSec.get}%.0fs exceeded at $elapsed%.1fs)")
      } else {
        val tq = System.nanoTime()
        try {
          fn(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/$name")
          done += 1
          val dt = (System.nanoTime() - tq) / 1e9
          System.err.println(
            f"[verify] $done/$total $name ok ($dt%.2fs, t=$elapsed%.1fs)")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        }
      }
    }
    System.err.println(f"[verify] complete: $done/$total dumped in $elapsed%.1fs")
    spark.stop()
  }
}

/** Ascending-cost ordering for Verify's budget mode: measured sf0.1 wall
  * times from the committed r9 bench (`bench_out.json`), bucketed. Unknown
  * (new) queries sort between the cheap bulk and the lifecycle tail so
  * they are attempted before the known-expensive queries but never starve
  * the measured-cheap ones.
  */
private object VerifyCost {
  // Queries the r9 bench put over 2 s at sf0.1 — the lifecycle/index tail.
  private val expensive: Map[String, Double] = Map(
    "q104_partitioned_lifecycle" -> 8.4, "q97_tombstone_ivf" -> 6.0,
    "q89_incremental_ivf" -> 4.3, "q100_layout_delete" -> 4.0,
    "q90_incremental_lsh" -> 3.3, "q111_incremental_pq" -> 3.2,
    "q81_dedup_survivors" -> 3.1, "q80_incremental_dedup" -> 3.0,
    "q117_ivfpq_search" -> 2.9, "q92_layout_append" -> 2.8,
    "q68_cooccur" -> 2.8, "q69_fuzzy_join" -> 2.7, "q73_pagerank" -> 2.6,
    "q93_incremental_lm" -> 2.5, "q101_partitioned_layout" -> 2.4,
    "q99_zorder3" -> 2.3, "q112_point_lookup" -> 2.1, "q91_zorder_slice" -> 2.1)
  // The r9 bench measured q01..q117; a query numbered beyond that (or
  // not q-numbered at all) is NEW and unmeasured, so it takes a middle
  // cost — attempted after every measured-cheap query but before the
  // lifecycle tail (ADVICE r10: returning 1.0 for unknowns let them tie
  // with, and displace, measured-cheap queries under a tight budget).
  private val MeasuredMax = 117
  private def qNum(name: String): Option[Int] =
    "^q(\\d+)".r.findFirstMatchIn(name).map(_.group(1).toInt)
  def of(name: String): Double =
    expensive.getOrElse(name,
      if (qNum(name).exists(_ <= MeasuredMax)) 1.0 else 1.5)
}
