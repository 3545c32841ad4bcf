package graft

import org.apache.spark.sql.functions._

import graft.operators.{Affinity, Changelog, Graph, Incremental, Joins, Presentation, TimeSeries, TopK}

class RelationalHelpersSpec extends SparkSpec {
  import spark.implicits._

  test("referentialSplit: orphans vs survivors (J5 anti/semi join)") {
    val parent = Seq(1L, 2L).toDF("geographic_id")
    val child = Seq((10, 1L), (11, 2L), (12, 99L)).toDF("sr_id", "geographic_id")
    val (orphans, survivors) = Joins.referentialSplit(
      child, parent, "geographic_id", "geographic_id")
    assert(orphans.select("sr_id").collect().map(_.getInt(0)).toSeq == Seq(12))
    assert(survivors.select("sr_id").collect().map(_.getInt(0)).sorted.toSeq == Seq(10, 11))
  }

  test("asofJoin: most recent right row per key, inclusive ties, null before first") {
    val left = Seq(
      (1L, "a", 10L), (2L, "a", 25L), (3L, "a", 30L), // 30 ties a right row
      (4L, "b", 5L),                                   // before any b right
      (5L, "b", 50L)
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("a", 20L, "a@20"), ("a", 30L, "a@30"),
      ("b", 40L, "b@40")
    ).toDF("k", "rts", "snap")
    val r = Joins.asofJoin(left, right, keys = Seq("k"),
        leftTs = "ts", rightTs = "rts", payload = Seq("snap"))
      .select("id", "snap").collect()
      .map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    assert(r(1L) == None)          // before first right row
    assert(r(2L) == Some("a@20"))
    assert(r(3L) == Some("a@30"))  // equal timestamps: inclusive
    assert(r(4L) == None)
    assert(r(5L) == Some("b@40"))
    // left columns survive untouched
    val cols = Joins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("snap")).columns
    assert(cols.contains("id") && cols.contains("ts") && cols.contains("snap"))
  }

  test("asofJoin: latest snapshot wins ATOMICALLY — null fields do not resurrect older values") {
    val left = Seq((1L, "k", 25L)).toDF("id", "k", "ts")
    val right = Seq(
      ("k", 10L, Some("old-a"), Some("old-b")),
      ("k", 20L, Option.empty[String], Some("new-b")) // latest: a is NULL
    ).toDF("k", "rts", "a", "b")
    val r = Joins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("a", "b")).head()
    // per-column filling would give (old-a, new-b) — a row that never existed
    assert(r.getAs[String]("a") == null && r.getAs[String]("b") == "new-b")
  }

  test("asofJoin: NULL join keys follow SQL equality (no null-to-null match)") {
    val left = Seq((1L, Option.empty[String], 25L), (2L, Some("k"), 25L))
      .toDF("id", "k", "ts")
    val right = Seq((Option.empty[String], 10L, "null-snap"), (Some("k"), 10L, "k-snap"))
      .toDF("k", "rts", "snap")
    val r = Joins.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("snap"))
      .collect().map(x => x.getAs[Long]("id") -> Option(x.getAs[String]("snap"))).toMap
    assert(r(1L) == None)           // null-key left matches nothing
    assert(r(2L) == Some("k-snap")) // and never the null-key right row
    // colliding payload names fail fast with a clear message
    val ex = intercept[IllegalArgumentException] {
      Joins.asofJoin(left, right.withColumnRenamed("snap", "ts"),
        Seq("k"), "ts", "rts", Seq("ts"))
    }
    assert(ex.getMessage.contains("collide"))
  }

  test("sessionize: inclusive gap merge, strict-exceed break, per-key isolation") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 1.0),
      (1L, t("2024-01-01 10:30:00"), 2.0), // exactly gap later → merges
      (1L, t("2024-01-01 11:00:01"), 3.0), // 1s past gap → new session
      (2L, t("2024-01-01 10:05:00"), 9.0)  // other key never merges in
    ).toDF("user_id", "ts", "value")
    val r = TimeSeries.sessionize(ev, "user_id", "ts", "30 minutes",
        Seq(count(lit(1)).as("n"), sum(col("value")).as("v")))
      .orderBy("user_id", "session_start").collect()
      .map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("n"), x.getAs[Double]("v")))
    assert(r.toSeq == Seq((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 9.0)))
  }

  test("factDim broadcast join keeps fact rows with matching dims") {
    val fact = Seq((1, 100), (2, 200), (3, 999)).toDF("k", "v")
    val dim = Seq((1, "a"), (2, "b")).toDF("k", "name")
    val joined = Joins.factDim(fact, dim, Seq("k"))
    assert(joined.count() == 2)
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("binned range join: bounds exact, multi-cell ranges, no nested-loop join") {
    import spark.implicits._
    val points = Seq((1L, 0.0), (2L, 4.999), (3L, 5.0), (4L, 17.0), (5L, 25.0))
      .toDF("pid", "p")
    val ranges = Seq((10L, 0.0, 5.0), (11L, 3.0, 20.0), (12L, 24.9, 25.1))
      .toDF("rid", "lo", "hi")
    val r = Joins.rangeJoinBinned(points, "p", ranges, "lo", "hi", binWidth = 2.0)
      .select("pid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // p=0.0 in [0,5); p=4.999 in [0,5) and [3,20); p=5.0 EXCLUDED from
    // [0,5) (hi exclusive) but in [3,20); p=17 spans range 11's 9th cell;
    // p=25 only in the short [24.9, 25.1)
    assert(r == Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L), (4L, 11L),
      (5L, 12L)))
    // equals the predicate-join reference result on the same data
    val ref = points.join(ranges, $"p" >= $"lo" && $"p" < $"hi")
      .select("pid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r == ref)
    // and the plan is an equi-join, not the nested-loop the raw predicate gets
    val binned = Joins.rangeJoinBinned(points, "p", ranges, "lo", "hi", 2.0)
      .queryExecution.executedPlan.toString
    assert(!binned.contains("BroadcastNestedLoopJoin") &&
      !binned.contains("CartesianProduct"), s"range join fell back:\n$binned")
  }

  test("bloom-pruned join ≡ plain join; probe filter in the plan; empty dim safe") {
    import spark.implicits._
    // spark.range, not a LocalRelation — ConvertToLocalRelation would
    // otherwise evaluate the probe filter at optimize time and the plan
    // assertion below would see nothing
    val fact = spark.range(1, 501)
      .select(col("id").as("fk"), concat(lit("f"), col("id")).as("payload"))
    val dim = Seq((3L, "a"), (7L, "b"), (400L, "c")).toDF("dk", "name")
    val pruned = Joins.bloomPrunedJoin(fact, dim, "fk", "dk", expectedDimKeys = 100L)
    val plain = fact.join(dim, col("fk") === col("dk"))
    assert(pruned.orderBy("fk").collect().toSeq ==
      plain.orderBy("fk").collect().toSeq)
    // the bloom probe must sit on the fact side as a scan filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    // empty build side: nothing can match, and no NPE from a null filter
    val none = Joins.bloomPrunedJoin(fact, dim.filter(col("dk") < 0L), "fk", "dk")
    assert(none.count() == 0)
    // fact and dim sharing the key NAME must not throw ambiguous-reference
    val sameName = Joins.bloomPrunedJoin(
      fact.withColumnRenamed("fk", "k"), dim.withColumnRenamed("dk", "k"),
      "k", "k")
    assert(sameName.count() == 3)
  }

  test("sliding windows: each event lands in width/slide hopping windows") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = Seq(
      (Timestamp.valueOf("2024-01-01 07:00:00"), "a", 1.0),
      (Timestamp.valueOf("2024-01-01 13:00:00"), "a", 2.0))
      .toDF("ts", "event_type", "value")
    val r = TimeSeries.sliding(ev, "ts", "1 day", "6 hours", Seq("event_type"),
        Seq(count(lit(1)).as("n")))
      .orderBy("window_start").collect()
      .map(x => (x.getTimestamp(2).toString, x.getLong(1)))
    // event 1 (07:00) in windows starting 12:00/18:00 Dec 31 + 00:00/06:00
    // Jan 1; event 2 (13:00) in 18:00 Dec 31 + 00:00/06:00/12:00 Jan 1 —
    // three shared windows hold both
    assert(r.map(_._2).sum == 8) // 2 events × 4 windows each
    assert(r.count(_._2 == 2L) == 3)
    assert(r.head._1.startsWith("2023-12-31 12:00"))
  }

  test("changelog compact: latest wins, delete removes, later upsert resurrects") {
    import spark.implicits._
    val log = Seq(
      (1L, 1L, "U", "a"), (1L, 2L, "U", "b"),              // plain latest-wins
      (2L, 1L, "U", "x"), (2L, 2L, "D", "-"),              // delete beats upsert
      (3L, 1L, "U", "p"), (3L, 2L, "D", "-"), (3L, 3L, "U", "q"), // resurrect
      (4L, 1L, "D", "-")                                    // delete-only key
    ).toDF("k", "v", "op", "payload")
    val snap = Changelog.compact(log, Seq("k"), Seq("v"), col("op") === "D")
      .select("k", "payload").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(snap == Map(1L -> "b", 3L -> "q"))
  }

  test("funnel: earliest second-event within the window, strict after, per key") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 10L, t("2024-01-01 10:00:00"), "click"),
      (1L, 11L, t("2024-01-01 10:00:00"), "purchase"), // same instant: NOT after
      (1L, 12L, t("2024-01-01 10:30:00"), "purchase"), // earliest valid
      (1L, 13L, t("2024-01-01 10:45:00"), "purchase"), // later, ignored
      (1L, 14L, t("2024-01-01 11:00:01"), "purchase"), // for click 15 only
      (1L, 15L, t("2024-01-01 10:59:59"), "click"),
      (2L, 20L, t("2024-01-01 10:00:00"), "click"),    // converts at bound
      (2L, 21L, t("2024-01-01 11:00:00"), "purchase"), // exactly +1h: inclusive
      (3L, 30L, t("2024-01-01 10:00:00"), "click"),    // cross-user: no match
      (4L, 40L, t("2024-01-01 10:01:00"), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val r = TimeSeries.funnelPairs(ev, "user_id", "event_id", "ts",
        "event_type", "click", "purchase", 3600L)
      .collect().map(x => (x.getLong(1), x.getLong(3))).toMap
    assert(r == Map(10L -> 12L, 15L -> 14L, 20L -> 21L))
  }

  test("rolling mean: last-N frame per key, short head frames, exact values") {
    import spark.implicits._
    val df = Seq(
      ("u", 1L, 1.0), ("u", 2L, 2.0), ("u", 3L, 6.0), ("u", 4L, 11.0),
      ("v", 5L, 100.0)
    ).toDF("k", "id", "value")
    val r = TimeSeries.rollingMean(df, Seq("k"), Seq("id"), "value", window = 3)
      .collect().map(x => x.getLong(1) -> x.getDouble(3)).toMap
    assert(r == Map(1L -> 1.0, 2L -> 1.5, 3L -> 3.0, 4L -> (19.0 / 3.0),
      5L -> 100.0))
  }

  test("top-k per group ranks inside each group with deterministic tiebreak") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 9.0), ("a", 2L, 9.0), ("a", 3L, 5.0), ("a", 4L, 1.0),
      ("b", 5L, 2.0)
    ).toDF("g", "id", "score")
    val r = TopK.perGroup(df, Seq("g"), Seq(col("score").desc, col("id")), 2)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getInt(3)))
    assert(r.toSet == Set(("a", 1L, 1), ("a", 2L, 2), ("b", 5L, 1)))
  }

  test("month delta: previous-month join, gap and zero semantics") {
    import spark.implicits._
    // gap: 2024-03 missing → 2024-04 has no previous; zero: prev n=0 → null pct
    val agg = Seq(("2024-01", 10L), ("2024-02", 0L), ("2024-04", 8L))
      .toDF("month", "n")
    val r = TimeSeries.withMonthDelta(agg, "n").orderBy("month").collect()
      .map(x => (x.getString(0), x.getLong(1), Option(x.get(2)), Option(x.get(3)),
        Option(x.get(4))))
    assert(r(0) == (("2024-01", 10L, None, None, None)))            // first month
    assert(r(1) == (("2024-02", 0L, Some(10L), Some(-10L), Some(-1.0)))) // -100%
    assert(r(2) == (("2024-04", 8L, None, None, None)))             // gap month
  }

  test("snapshot diff: added/removed/changed only, both sides carried") {
    val oldS = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "tag", "v")
    val newS = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "d", 40.0))
      .toDF("k", "tag", "v")
    val d = Changelog.diffSnapshots(oldS, newS, Seq("k"), Seq("tag", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("change_type")))
      .toMap
    // key 2 is unchanged → absent; 1 removed, 3 changed (v differs), 4 added
    assert(d == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    val row3 = Changelog.diffSnapshots(oldS, newS, Seq("k"), Seq("tag", "v"))
      .filter(col("k") === 3L).collect().head
    assert(row3.getDouble(row3.fieldIndex("old_v")) == 30.0 &&
      row3.getDouble(row3.fieldIndex("new_v")) == 31.0)
  }

  test("snapshot diff: null payloads compare null-safe (null==null is unchanged)") {
    val oldS = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("k", "tag")
    val newS = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "tag")
    val d = Changelog.diffSnapshots(oldS, newS, Seq("k"), Seq("tag")).collect()
    // key 1: null → null is NOT a change; key 2: "x" → null is
    assert(d.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("cohort retention: first-activity month buckets, integer offsets") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      ("u1", ts("2024-01-05 00:00:00")), ("u1", ts("2024-01-20 00:00:00")),
      ("u1", ts("2024-02-03 00:00:00")),
      ("u2", ts("2024-01-09 00:00:00")), ("u2", ts("2024-03-01 00:00:00")),
      ("u3", ts("2024-02-11 00:00:00"))
    ).toDF("user", "ts")
    val r = TimeSeries.cohortRetention(ev, "user", "ts").collect()
      .map(x => (x.getString(0), x.getInt(1)) -> x.getLong(2)).toMap
    // duplicate same-month activity collapses (u1 twice in Jan counts once)
    assert(r == Map(
      ("2024-01", 0) -> 2L, ("2024-01", 1) -> 1L, ("2024-01", 2) -> 1L,
      ("2024-02", 0) -> 1L))
  }

  test("incremental merge: additive aggregates equal the full recompute") {
    val base = Seq(("a", 2L, BigDecimal("10.50")), ("b", 1L, BigDecimal("3.00")))
      .toDF("k", "n", "s")
    val delta = Seq(("b", 3L, BigDecimal("0.25")), ("c", 1L, BigDecimal("7.00")))
      .toDF("k", "n", "s")
    val m = Incremental.mergeAdditive(base, delta, Seq("k"), Seq("n", "s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1),
        r.getDecimal(2).stripTrailingZeros)).toMap
    assert(m("a") == ((2L, BigDecimal("10.5").bigDecimal.stripTrailingZeros)))
    assert(m("b") == ((4L, BigDecimal("3.25").bigDecimal.stripTrailingZeros)))
    assert(m("c") == ((1L, BigDecimal("7").bigDecimal.stripTrailingZeros)))
  }

  test("journeys: first-N path in (ts, tie) order, full count kept") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      ("u1", ts("2024-01-01 10:00:00"), 2L, "view"),
      ("u1", ts("2024-01-01 10:00:00"), 1L, "click"), // ts tie → id order
      ("u1", ts("2024-01-01 11:00:00"), 3L, "purchase"),
      ("u1", ts("2024-01-01 12:00:00"), 4L, "view"),
      ("u2", ts("2024-01-01 09:00:00"), 5L, "signup")
    ).toDF("user", "ts", "event_id", "event_type")
    val j = TimeSeries.journeys(ev, "user", "ts", "event_id", "event_type", 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(j("u1") == ((4L, "click>view>purchase"))) // 4 events, 3 steps kept
    assert(j("u2") == ((1L, "signup")))
  }

  test("cooccurrence: A-priori pruning, basket-keyed pairs, canonical order") {
    val baskets = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (3L, "b"), // duplicate item in basket: once
      (4L, "c"), (4L, "d")
    ).toDF("basket", "item")
    // a:3, b:3, c:2, d:1 baskets; minItemSupport=2 drops d (and with it
    // the only c-d pair); pair (a,b):3, (a,c):1, (b,c):1; minPair=2 → a-b
    val r = Affinity.cooccurrence(baskets, "basket", "item",
        minItemSupport = 2, minPairSupport = 2, k = 10)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    assert(r.toSeq == Seq(("a", "b", 3L)))
  }

  test("cooccurrence: pair self-join sides share one exchange (reused)") {
    // both sides of the basket-keyed self-join come from the same pruned
    // (basket, item) frame; the ReuseExchange rule must share its shuffle
    // or the distinct+prune lineage runs once per side. AQE off, same
    // rationale as the keySkew / duplicate-spans guards.
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"))
        .toDF("basket", "item")
      val plan = Affinity.cooccurrence(df, "basket", "item", 1, 1, 10)
        .queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange"),
        s"pruned-items exchange not shared across the self-join:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("incremental merge: null grouping keys merge null-safely") {
    val base = Seq((Option("a"), 2L), (Option.empty[String], 5L)).toDF("k", "n")
    val delta = Seq((Option.empty[String], 3L), (Option("c"), 1L)).toDF("k", "n")
    val m = Incremental.mergeAdditive(base, delta, Seq("k"), Seq("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // the null group must merge to ONE row (5+3), matching the recompute
    assert(m == Map(Option("a") -> 2L, None -> 8L, Option("c") -> 1L))
  }

  test("journeys: null-ts / null-type events are inert (excluded up front)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      ("u1", Option(ts("2024-01-01 10:00:00")), 1L, Option("a")),
      ("u1", Option(ts("2024-01-01 11:00:00")), 2L, Option.empty[String]),
      ("u1", Option.empty[java.sql.Timestamp], 3L, Option("b")),
      ("u1", Option(ts("2024-01-01 12:00:00")), 4L, Option("c"))
    ).toDF("user", "ts", "event_id", "event_type")
    val j = TimeSeries.journeys(ev, "user", "ts", "event_id", "event_type", 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    // nulls neither occupy step slots nor count: 2 valid events, path a>c
    assert(j("u1") == ((2L, "a>c")))
  }

  test("fuzzyJoin equals the naive all-pairs filter, without a cartesian") {
    val left = Seq((1L, "kitten"), (2L, "ab"), (3L, "zzzzzzz"))
      .toDF("lid", "lname")
    val right = Seq((10L, "sitting"), (11L, "kitten"), (12L, "abcd"),
      (13L, "b"), (14L, "unrelatedlongstring")).toDF("rid", "rname")
    val got = Joins.fuzzyJoin(left, right, "lname", "rname", maxDist = 2)
      .select("lid", "rid", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // kitten-sitting does NOT qualify (dist 3); length-crossing matches
    // (ab→abcd dist 2, ab→b dist 1) must survive the bucket blocking
    assert(got == Set((1L, 11L, 0), (2L, 12L, 2), (2L, 13L, 1)))
    val plan = Joins.fuzzyJoin(left, right, "lname", "rname", maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzyJoin degraded to all-pairs:\n$plan")
  }

  test("intervalOverlapJoin: exact overlap set, one row per pair, no nested loop") {
    val l = Seq((1L, 10L, 0.0, 100.0), (1L, 11L, 200.0, 210.0),
      (2L, 20L, 0.0, 50.0)).toDF("k", "lid", "llo", "lhi")
    val r = Seq((1L, 90L, 50.0, 250.0), (1L, 91L, 99.0, 100.5),
      (2L, 92L, 50.0, 60.0), // touches 20's hi — half-open, no overlap
      (3L, 93L, 0.0, 1000.0)).toDF("k", "rid", "rlo", "rhi")
    // tiny binWidth (5) forces every interval across MANY cells — the
    // overlap-start dedup must still emit each pair exactly once
    val got = Joins.intervalOverlapJoin(l, r, Seq("k"),
        "llo", "lhi", "rlo", "rhi", binWidth = 5.0)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.length == got.distinct.length, s"duplicate pairs: ${got.toSeq}")
    assert(got.toSet == Set((10L, 90L), (10L, 91L), (11L, 90L)))
    val plan = Joins.intervalOverlapJoin(l, r, Seq("k"),
        "llo", "lhi", "rlo", "rhi", binWidth = 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degraded to all-pairs:\n$plan")
  }

  test("pageRank: hand-computed star graph, mass conserved, deterministic") {
    // symmetrized star a-b, a-c: deg a=2, b=c=1; uniform init 1.0
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"))
      .toDF("s", "d")
    val pr1 = Graph.pageRank(edges, "s", "d", iters = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr1("a") - 1.85) < 1e-12)   // 0.15 + 0.85*(1 + 1)
    assert(math.abs(pr1("b") - 0.575) < 1e-12)  // 0.15 + 0.85*(1/2)
    assert(math.abs(pr1("c") - 0.575) < 1e-12)
    assert(math.abs(pr1.values.sum - 3.0) < 1e-12) // no dangling: mass kept
    val pr2 = Graph.pageRank(edges, "s", "d", iters = 2).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr2("a") - 1.1275) < 1e-12)  // 0.15 + 0.85*2*0.575
    assert(math.abs(pr2("b") - 0.93625) < 1e-12) // 0.15 + 0.85*(1.85/2)
    // determinism: a second evaluation returns bit-identical doubles
    val again = Graph.pageRank(edges, "s", "d", iters = 2).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(again == pr2)
  }

  test("pageRank: directed chains keep source-only nodes feeding later iterations") {
    // a→b→c: a has no in-edges (bare teleport every round) but must keep
    // contributing to b in iteration 2; c is dangling (no out-edges)
    val edges = Seq(("a", "b"), ("b", "c")).toDF("s", "d")
    val pr2 = Graph.pageRank(edges, "s", "d", iters = 2).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr2.keySet == Set("a", "b", "c")) // every node, incl. no-in-edge a
    assert(math.abs(pr2("a") - 0.15) < 1e-12)
    assert(math.abs(pr2("b") - (0.15 + 0.85 * 0.15)) < 1e-12) // a's pr1=0.15
    assert(math.abs(pr2("c") - (0.15 + 0.85 * 1.0)) < 1e-12)  // b's pr1=1.0
  }

  test("trendSlope: exact OLS line per group; zero-variance group yields nulls") {
    val df = Seq(
      ("up", 1L, BigDecimal("1.00")), ("up", 2L, BigDecimal("3.00")),
      ("up", 3L, BigDecimal("5.00")),
      ("flat", 5L, BigDecimal("7.00")), ("flat", 5L, BigDecimal("9.00"))
    ).toDF("g", "x", "y")
    val r = TimeSeries.trendSlope(df, Seq("g"), "x", "y").collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("up").getLong(1) == 3)
    assert(math.abs(r("up").getDouble(2) - 2.0) < 1e-12)  // y = 2x - 1
    assert(math.abs(r("up").getDouble(3) - (-1.0)) < 1e-12)
    assert(r("flat").isNullAt(2) && r("flat").isNullAt(3)) // no x variance
  }

  test("first-touch attribution: conversions credit the acquiring event type") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      ("u1", ts("2024-01-01 09:00:00"), 1L, "click", 0.0),
      ("u1", ts("2024-01-01 10:00:00"), 2L, "purchase", 5.0),
      ("u1", ts("2024-01-02 10:00:00"), 3L, "purchase", 2.0),
      ("u2", ts("2024-01-01 08:00:00"), 4L, "view", 0.0),
      ("u3", ts("2024-01-01 07:00:00"), 5L, "purchase", 3.0)
    ).toDF("user", "ts", "event_id", "event_type", "value")
    val r = TimeSeries.firstTouchAttribution(ev, "user", "ts", "event_id",
        "event_type", "value", "purchase")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r("click") == ((1L, 2L, 7.0)))    // u1: both purchases credited
    assert(r("view") == ((1L, 0L, 0.0)))     // u2: acquired, never converted
    assert(r("purchase") == ((1L, 1L, 3.0))) // u3: self-acquiring conversion
  }

  test("rollingZscore: trailing-frame anomaly flagged; short/constant frames silent") {
    val rows = Seq(("k", 1L, 10.0), ("k", 2L, 10.0), ("k", 3L, 10.0),
      ("k", 4L, 10.0), ("k", 5L, 100.0))
    val df = rows.toDF("g", "seq", "v")
    val r = TimeSeries.rollingZscore(df, Seq("g"), Seq("seq"), "v",
        window = 5, sigmas = 1.5)
      .select("seq", "z").collect().map(x => (x.getLong(0), x.getDouble(1)))
    // rows 1-4: frame constant (var 0) or single row → silent; row 5:
    // frame [10,10,10,10,100], mean 28, sample var 1620, z = 72/√1620
    assert(r.length == 1 && r.head._1 == 5L)
    assert(math.abs(r.head._2 - 72.0 / math.sqrt(1620.0)) < 1e-12)
  }

  test("presentation: thousands formatting and address prefill (C10/C11)") {
    val df = Seq((1234567.891, "123 Main St, Apt 4B"),
      (1000.0, "9 Ocean Ave")).toDF("n", "addr")
    val r = df.select(Presentation.thousands(col("n")),
      Presentation.addressPrefill(col("addr"))).collect()
    assert(r(0).getString(0) == "1,234,568" && r(0).getString(1) == "Main St")
    assert(r(1).getString(0) == "1,000" && r(1).getString(1) == "Ocean Ave")
  }

  // --- r12 review hardening ------------------------------------------

  test("Changelog.compact: a winning row with a NULL delete flag is " +
       "kept, never silently dropped as if deleted") {
    // the documented base-union-changes merge: base rows carry no op
    val rows = Seq(
      (1L, Some("upsert"), 2, "new"),  // later version wins
      (1L, None, 1, "base"),
      (2L, None, 1, "base-only"),      // null op wins its key
      (3L, Some("delete"), 2, "gone"),
      (3L, None, 1, "base")
    ).toDF("k", "op", "v", "payload")
    val out = Changelog.compact(rows, Seq("k"), Seq("v"),
        col("op") === "delete")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "new", 2L -> "base-only"),
      s"null-op winners must survive (got $out) — !null filtered as " +
        "false used to vanish key 2")
  }

  test("binned/salted joins guard reserved and ambiguous columns like " +
       "their siblings; bloom join emits ONE key column on the " +
       "same-name case") {
    import graft.operators.{Joins, Skew}
    val pts = Seq((5.0, "p")).toDF("x", "tag")
    val rng = Seq((0.0, 10.0, "r")).toDF("lo", "hi", "tag")
    val e1 = intercept[IllegalArgumentException] {
      Joins.rangeJoinBinned(pts, "x", rng, "lo", "hi", 5.0)
    }
    assert(e1.getMessage.contains("ambiguous"))
    val e2 = intercept[IllegalArgumentException] {
      Joins.rangeJoinBinned(pts.withColumn("__cell", lit(1)), "x",
        rng.drop("tag"), "lo", "hi", 5.0)
    }
    assert(e2.getMessage.contains("__cell"))

    val fact = Seq((1L, 10.0)).toDF("k", "v")
    val dim = Seq((1L, "d")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact.withColumn("__salt", lit(0)), dim, "k", 4)
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim.withColumnRenamed("name", "v"), "k", 4)
    }

    val bj = Joins.bloomPrunedJoin(fact, dim, "k", "k")
    assert(bj.columns.count(_ == "k") == 1,
      "same-name keys must collapse to one column like the plain join")
    assert(bj.select("k", "v", "name").count() == 1,
      "downstream references resolve unambiguously")
  }

  test("withMonthDelta chains for two value columns without " +
       "overwriting the first percentage") {
    val agg = Seq(("2024-01", 10L, 100L), ("2024-02", 20L, 50L))
      .toDF("month", "a", "b")
    val out = TimeSeries.withMonthDelta(
      TimeSeries.withMonthDelta(agg, "a"), "b")
    assert(out.columns.contains("pct_change_a") &&
      out.columns.contains("pct_change_b"))
    val feb = out.filter(col("month") === "2024-02").head()
    assert(feb.getAs[Double]("pct_change_a") == 1.0 &&
      feb.getAs[Double]("pct_change_b") == -0.5)
  }
}
