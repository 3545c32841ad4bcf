package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  /** A fact with two mega-keys (1000× the median) plus a uniform tail
    * and some null keys — the shape AQE's skew stats would flag.
    */
  private def skewedFact(): DataFrame = {
    val hotRows = spark.range(2000)
      .select((col("id") % 2 + 1).as("k"), col("id").as("v"))
    val coldRows = spark.range(100)
      .select((col("id") + 10).as("k"), (col("id") + 5000).as("v"))
    val nullRows = Seq((Option.empty[Long], 9001L), (Option.empty[Long], 9002L))
      .toDF("k", "v")
    hotRows.unionByName(coldRows).unionByName(nullRows)
  }

  private def dim(): DataFrame =
    spark.range(60).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("joinSkewed is row-identical to the plain join, inner and left, " +
       "nulls included, for right, wrong, and empty hot sets") {
    val f = skewedFact()
    val d = dim()
    for (jt <- Seq("inner", "left")) {
      val plain = canon(f.join(d, Seq("k"), jt))
      // the true hot keys
      assert(canon(SkewJoin.joinSkewed(f, d, "k",
        SkewJoin.hotKeys(f, "k", 2), jt)) == plain)
      // a wrong guess: cold keys declared hot
      assert(canon(SkewJoin.joinSkewed(f, d, "k",
        Seq(17L, 55L, 999L).toDF("k"), jt)) == plain)
      // empty hot set: pure shuffle path
      assert(canon(SkewJoin.joinSkewed(f, d, "k",
        spark.emptyDataset[Long].toDF("k"), jt)) == plain)
    }
  }

  test("hotKeys finds the mega-keys, honors minCount, and never " +
       "reports null") {
    val hot = SkewJoin.hotKeys(skewedFact(), "k", topN = 2, minCount = 100L)
      .collect().map(_.getLong(0)).toSet
    assert(hot == Set(1L, 2L))
    // every key has >= 1 row; minCount=2 excludes the singleton tail
    val all = SkewJoin.hotKeys(skewedFact(), "k", topN = 1000,
      minCount = 2L).collect().map(_.getLong(0)).toSet
    assert(all == Set(1L, 2L), "tail keys hold 1 row each")
  }

  test("the hot branch is a broadcast hash join and the cold branch " +
       "keeps the shuffle path") {
    // disable size-based auto-broadcast: at real scale the dim exceeds
    // the threshold, and the point is that the EXPLICIT hint routes the
    // hot branch while the cold branch shuffles
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val f = skewedFact()
      val joined = SkewJoin.joinSkewed(f, dim(), "k",
        SkewJoin.hotKeys(f, "k", 2))
      joined.write.format("noop").mode("overwrite").save()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"hot branch must broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin") ||
             plan.contains("ShuffledHashJoin"),
        s"cold branch must keep the shuffle join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("joinSkewedAuto detects the mega-keys from the fact itself") {
    val f = skewedFact()
    val plain = canon(f.join(dim(), Seq("k"), "inner"))
    assert(canon(SkewJoin.joinSkewedAuto(f, dim(), "k",
      topN = 8, minShare = 0.05)) == plain)
  }

  test("joinSkewedAuto persists the fact: one snapshot feeds detection " +
       "and both branches (ADVICE r9 determinism)") {
    // earlier tests may have cached the same logical plan — start clean
    spark.sharedState.cacheManager.clearCache()
    val f = skewedFact()
    assert(f.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    val out = SkewJoin.joinSkewedAuto(f, dim(), "k",
      topN = 8, minShare = 0.05)
    assert(f.storageLevel ==
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
      "the fact must be pinned while the returned frame is live")
    assert(canon(out) == canon(f.join(dim(), Seq("k"), "inner")))
    f.unpersist()
  }

  test("right and full outer joins are rejected loudly") {
    for (jt <- Seq("right", "right_outer", "full", "full_outer")) {
      val e = intercept[IllegalArgumentException] {
        SkewJoin.joinSkewed(skewedFact(), dim(), "k",
          Seq(1L).toDF("k"), jt)
      }
      assert(e.getMessage.contains("inner and left"))
    }
  }
}
