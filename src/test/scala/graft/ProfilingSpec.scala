package graft

import org.apache.spark.sql.functions._
import graft.operators.Profiling

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, nulls, exact distincts, numeric-only min/max") {
    val df = Seq(
      (Some(1), Some("a")), (Some(2), Some("a")), (Some(2), None),
      (None, Some("b"))
    ).toDF("x", "s")
    val p = Profiling.profile(df, Seq("x", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    val x = p("x")
    assert(x.getLong(1) == 4 && x.getLong(2) == 1 && x.getLong(3) == 2)
    assert(x.getDouble(4) == 1.0 && x.getDouble(5) == 2.0)
    val s = p("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.isNullAt(4) && s.isNullAt(5)) // non-numeric: no min/max
  }

  test("histogram: exact edges, max clamped into last bin, empty bins absent") {
    val df = (0 to 100).map(_.toDouble).toDF("v") // lo=0, hi=100, w=10
    val h = Profiling.histogram(df, "v", bins = 10).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(h.keySet == (0L to 9L).toSet)
    assert(h(0L) == ((0.0, 10.0, 10L)))  // 0..9
    assert(h(9L) == ((90.0, 100.0, 11L))) // 90..100: v=100 clamps into bin 9
    // sparse input: only the occupied bins appear
    val sparse = Seq(0.0, 95.0).toDF("v")
    val hs = Profiling.histogram(sparse, "v", bins = 10).collect()
    assert(hs.map(_.getLong(0)).toSet == Set(0L, 9L))
  }

  test("histogram: single-valued column degenerates to one bucket 0") {
    val df = Seq(7.0, 7.0, 7.0).toDF("v")
    val h = Profiling.histogram(df, "v", bins = 5).collect()
    assert(h.length == 1 && h.head.getLong(0) == 0L && h.head.getLong(3) == 3L)
  }

  test("segments: quartiles per group, earlier tiles absorb remainders") {
    val df = (1 to 10).map(i => ("g", i.toLong, i.toDouble))
      .toDF("grp", "id", "value")
    val seg = Profiling.segments(df, "grp", Seq(col("value"), col("id")), 4)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    // 10 rows / 4 tiles → sizes 3,3,2,2
    assert(seg == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 2, 6L -> 2,
      7L -> 3, 8L -> 3, 9L -> 4, 10L -> 4))
  }

  test("outliers: null values join neither the moments nor the output") {
    val df = (Seq(("g", 1L, Some(10.0)), ("g", 2L, Some(12.0)),
      ("g", 3L, Some(11.0)), ("g", 4L, None), ("g", 5L, Some(14.0)),
      ("g", 6L, Some(100.0)))).toDF("grp", "id", "value")
    val out = Profiling.outliers(df, "grp", "value", sigmas = 1.5).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(6L)) // the null row is inert
  }

  test("winsorized stats: nearest-rank data-value bounds, clamp, null exclusion") {
    // group "g": 1..20 (+ a null row, which must be inert).
    // loRank = (20*5+99) div 100 = 1 → lo=1; hiRank = (20*95+99) div 100 = 19
    // → hi=19; only the 20 clamps (to 19): mean = (1+..+19 + 19)/20 = 10.45
    val rows = (1 to 20).map(i => ("g", i.toLong, Some(i.toDouble))) :+
      (("g", 99L, Option.empty[Double]))
    val df = rows.toDF("grp", "id", "value")
    val w = Profiling.winsorizedStats(df, "grp", "value", "id", 5, 95).collect()
    assert(w.length == 1)
    val r = w.head
    assert(r.getLong(1) == 20)          // null row excluded from n
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 19.0)
    assert(math.abs(r.getDouble(4) - 10.45) < 1e-12)
  }

  test("key skew: hot-key and top-k concentration from one pass") {
    // 10 rows on "hot", 1 each on 5 cold keys → 15 rows, 6 keys
    val rows = (1 to 10).map(_ => "hot") ++ (1 to 5).map(i => s"cold$i")
    val df = rows.toDF("k")
    val r = Profiling.keySkew(df, "k", topK = 2).collect().head
    assert(r.getLong(0) == 15 && r.getLong(1) == 6 && r.getLong(2) == 10)
    assert(math.abs(r.getDouble(3) - 10.0 / 15) < 1e-15)
    assert(r.getLong(4) == 11) // hot(10) + cold1(1): count desc, key tiebreak
    assert(math.abs(r.getDouble(5) - 11.0 / 15) < 1e-15)
  }

  test("key skew: per-key counts computed once (reused exchange)") {
    // totals and the top-k sum both consume the per-key count aggregate;
    // the ReuseExchange rule must share that subtree or the fact table is
    // scanned twice. Static check with AQE off (same rationale as the
    // duplicate-spans guard in ScaleTechniquesSpec).
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = (1 to 100).map(i => i % 7).toDF("k")
      val plan = Profiling.keySkew(df, "k", topK = 3)
        .queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"),
        s"per-key count exchange not shared:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("heavy hitters: exact when cardinality <= capacity, incl. across merges") {
    val rows = (1 to 50).map(_ => "a") ++ (1 to 30).map(_ => "b") ++
      (1 to 20).map(_ => "c")
    val df = spark.sparkContext.parallelize(rows, 8).toDF("v") // force merges
    val got = Profiling.heavyHitters(df, "v", capacity = 10).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 50L), ("b", 30L), ("c", 20L)))
  }

  test("heavy hitters: MG bound holds under overflow — hot items surface, undercount <= n/(k+1)") {
    // 1000 rows: "hot" 400, "warm" 200, 400 singletons; capacity 4
    val rows = (1 to 400).map(_ => "hot") ++ (1 to 200).map(_ => "warm") ++
      (1 to 400).map(i => s"one$i")
    val df = spark.sparkContext.parallelize(rows, 8).toDF("v")
    val got = Profiling.heavyHitters(df, "v", capacity = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 1000L; val err = n / 5 // n/(k+1) = 200
    // any item with true count > n/(k+1) MUST be present
    assert(got.contains("hot"), s"hot missing from $got")
    assert(got("hot") <= 400 && got("hot") >= 400 - err)
    for ((item, est) <- got) {
      val truth = item match {
        case "hot" => 400L; case "warm" => 200L; case _ => 1L
      }
      assert(est <= truth && est >= truth - err,
        s"$item estimate $est outside [${truth - err}, $truth]")
    }
  }

  test("heavy hitters: nulls are skipped, not counted") {
    val df = Seq(Some("x"), None, Some("x"), None, Some("y"))
      .toDF("v")
    val got = Profiling.heavyHitters(df, "v", capacity = 8).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("x", 2L), ("y", 1L)))
  }

  test("checkConstraints: per-rule violation counts, null predicate = violation") {
    val df = Seq(
      (Some(5), Some("ok")), (Some(-1), Some("ok")), // -1 violates positive
      (None, Some("ok")),                            // null → violation
      (Some(3), None)                                // passes positive
    ).toDF("x", "s")
    val r = Profiling.checkConstraints(df, Seq(
        "x_positive" -> (col("x") > 0),
        "s_present" -> col("s").isNotNull))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r("x_positive") == ((4L, 2L))) // -1 and the null x
    assert(r("s_present") == ((4L, 1L)))
  }

  test("winsorized stats: tiny group degenerates to its own value, no crash") {
    val df = Seq(("t", 1L, 42.0)).toDF("grp", "id", "value")
    val r = Profiling.winsorizedStats(df, "grp", "value", "id", 5, 95)
      .collect().head
    // n=1: both ranks collapse to 1 → lo=hi=42 → mean 42
    assert(r.getLong(1) == 1 && r.getDouble(2) == 42.0 &&
      r.getDouble(3) == 42.0 && r.getDouble(4) == 42.0)
  }

  test("outliers: flags the 3-sigma point; tiny and constant groups yield none") {
    // group "g": 29 values at ~10 plus one at 1000 — a clear outlier;
    // group "tiny": 1 row; group "flat": zero variance
    val rows = (1 to 29).map(i => ("g", i.toLong, 10.0 + (i % 3))) ++
      Seq(("g", 99L, 1000.0), ("tiny", 100L, 5.0),
        ("flat", 101L, 2.0), ("flat", 102L, 2.0))
    val df = rows.toDF("grp", "id", "value")
    val out = Profiling.outliers(df, "grp", "value", sigmas = 3.0).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(99L))
    assert(math.abs(out.head.getDouble(3)) > 3.0)
  }

  test("incremental heavy hitters: merged segments exact under capacity, " +
       "ledger blocks replays, compaction preserves output") {
    val path = java.nio.file.Files.createTempDirectory("graft_hh").toString
    val a = Seq("x", "x", "y").toDF("v")
    val b = Seq("x", "z", "z", "z").toDF("v")
    Profiling.saveHhSketch(a, path, "v", capacity = 8)
    assert(Profiling.appendHhSketch(b, path, "b1"))
    assert(!Profiling.appendHhSketch(b, path, "b1")) // replay: skipped
    def merged() = Profiling.mergedHeavyHitters(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    // cardinality 3 <= capacity 8: exact counts, ordered n desc then item
    assert(merged() == Seq("x" -> 3L, "z" -> 3L, "y" -> 1L))
    val segs = () => new java.io.File(s"$path/segments").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(segs() >= 2)
    Profiling.compactHhSketch(spark, path)
    assert(segs() == 1)
    assert(merged() == Seq("x" -> 3L, "z" -> 3L, "y" -> 1L))
    // appends after compaction keep merging
    assert(Profiling.appendHhSketch(Seq("y", "y").toDF("v"), path, "b2"))
    assert(merged() == Seq("x" -> 3L, "y" -> 3L, "z" -> 3L))
  }

  test("incremental heavy hitters: overflow truncation keeps the MG bound") {
    val path = java.nio.file.Files.createTempDirectory("graft_hh_of").toString
    // two segments whose UNION overflows capacity 2: hot survives the
    // (k+1)-th-largest subtraction with the merged undercount bound
    val a = ((1 to 50).map(_ => "hot") ++ (1 to 10).map(i => s"a$i")).toDF("v")
    val b = ((1 to 30).map(_ => "hot") ++ (1 to 10).map(i => s"b$i")).toDF("v")
    Profiling.saveHhSketch(a, path, "v", capacity = 2)
    Profiling.appendHhSketch(b, path, "b1")
    val got = Profiling.mergedHeavyHitters(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size <= 2)
    // n = 100 rows total, k = 2 → undercount <= n/(k+1) ≈ 33 per stage;
    // two sketch stages + one merge truncation still must surface an
    // 80-count item and report <= truth
    assert(got.contains("hot"), s"hot missing from $got")
    assert(got("hot") <= 80L && got("hot") >= 80L - 67L, s"hot=$got")
  }

  test("incremental histogram: build + ledgered appends sum to the " +
       "one-shot counts; under/overflow visible; compaction lossless; " +
       "replays are no-ops") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_histidx").toString + "/idx"
    // values straddling the [10, 50] bounds with 4 bins of width 10
    val all = Seq(5.0, 10.0, 12.0, 22.0, 35.0, 47.0, 50.0, 61.0, 9.9)
    val (h1, h2) = all.splitAt(5)
    Profiling.saveHistogramIndex(h1.toDF("v"), path, "v",
      bins = 4, lo = 10.0, hi = 50.0)
    assert(Profiling.appendHistogramIndex(h2.toDF("v"), path, "b1"))
    assert(!Profiling.appendHistogramIndex(h2.toDF("v"), path, "b1"),
      "a recorded batch id must be a no-op")
    def merged() = Profiling.mergedHistogramIndex(spark, path)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val m = merged()
    assert(m(-1L)._3 == 2L)          // 5.0, 9.9 underflow
    assert(m(0L) == ((10.0, 20.0, 2L)))  // 10, 12
    assert(m(1L)._3 == 1L)           // 22
    assert(m(2L)._3 == 1L)           // 35
    assert(m(3L) == ((40.0, 50.0, 2L)))  // 47 and the hi edge 50
    assert(m(4L)._3 == 1L)           // 61 overflow
    assert(m.values.map(_._3).sum == all.size)
    // nulls are excluded, not binned
    assert(Profiling.appendHistogramIndex(
      Seq(Option.empty[Double], Some(11.0)).toDF("v"), path, "b2"))
    assert(merged()(0L)._3 == 3L)
    // compaction: one segment file, identical merged output
    val before = merged()
    Profiling.compactHistogramIndex(spark, path)
    assert(merged() == before)
    assert(new java.io.File(s"$path/segments").listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
    // the ledger survives compaction: b1 still refuses
    assert(!Profiling.appendHistogramIndex(h2.toDF("v"), path, "b1"))
  }

  // --- r12 review hardening ------------------------------------------

  test("histogram: nulls are excluded (no phantom top-bin rows); " +
       "bins < 1 loud") {
    val df = Seq(Some(0.0), Some(5.0), Some(10.0), None, None)
      .toDF("v")
    val bins = Profiling.histogram(df, "v", 10).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(bins.values.sum == 3L,
      "exactly the non-null rows are binned — least() skipping null " +
        "operands used to drop every null into the LAST bin")
    assert(bins.getOrElse(9L, 0L) == 1L, "only the true max in the top bin")
    intercept[IllegalArgumentException] {
      Profiling.histogram(df, "v", 0)
    }
  }

  test("profile: a dot-bearing column name resolves (indexed internal " +
       "agg names, like checkConstraints)") {
    val df = Seq((1, "a"), (2, "b")).toDF("price.usd", "s")
    val p = Profiling.profile(df, Seq("price.usd", "s")).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(p("price.usd") == 2L && p("s") == 2L)
  }

  test("outliers: values past the decimal-exact square bound fail " +
       "LOUDLY instead of silently zeroing the variance") {
    val big = Seq(("g", 1.7e15), ("g", 1.8e15), ("g", 1.9e15))
      .toDF("grp", "v")
    val e = intercept[Exception] {
      Profiling.outliers(big, "grp", "v", 3.0).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // under the session's ANSI default the decimal cast itself throws
    // (NUMERIC_VALUE_OUT_OF_RANGE); the in-plan guard covers non-ANSI
    // deployments, where the cast nulls silently — either way the
    // invariant is LOUD failure, never a silent wrong answer
    assert(msgs(e).exists(m => m.contains("overflowed") ||
        m.contains("NUMERIC_VALUE_OUT_OF_RANGE")),
      s"expected a loud overflow failure, got: ${msgs(e).mkString(" | ")}")
    // sane magnitudes keep working
    val ok = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 100.0))
      .toDF("grp", "v")
    assert(Profiling.outliers(ok, "grp", "v", 1.0).count() == 1L)
  }

  test("appendHhSketch is crash-idempotent: a crashed promotion's " +
       "partial segment is re-landed once, never doubled") {
    val path = java.nio.file.Files.createTempDirectory("graft_hh_cr")
      .toString
    Profiling.saveHhSketch(Seq("x", "y").toDF("v"), path, "v", 8)
    // simulate the crash: batch b9's segment file LANDED but the
    // ledger record never happened — the exact window the old plain
    // mode("append") turned into a double count on retry
    val tag = "b9".getBytes("UTF-8").map("%02x".format(_)).mkString
    val seg = new java.io.File(s"$path/segments").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(seg.toPath,
      new java.io.File(s"$path/segments", s"batch_${tag}_0.parquet").toPath)
    // the compaction refuses the unrecorded residue loudly
    val e = intercept[IllegalArgumentException] {
      Profiling.compactHhSketch(spark, path)
    }
    assert(e.getMessage.contains("UNRECORDED"))
    // the retry converges: pre-delete removes the partial, the batch
    // lands exactly once
    assert(Profiling.appendHhSketch(Seq("z").toDF("v"), path, "b9"))
    val m = Profiling.mergedHeavyHitters(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("x" -> 1L, "y" -> 1L, "z" -> 1L),
      s"single application expected, got $m")
    // recorded: compaction now proceeds
    Profiling.compactHhSketch(spark, path)
    assert(Profiling.mergedHeavyHitters(spark, path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == m)
  }
}
