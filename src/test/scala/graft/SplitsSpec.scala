package graft

import org.apache.spark.sql.functions._

import graft.operators.Splits

class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private val W = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def ids(n: Int) = spark.range(n).select(col("id"))

  private def membership(df: org.apache.spark.sql.DataFrame,
                         w: Seq[(String, Double)]): Map[Long, String] =
    Splits.assignSplit(df, "id", w)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("assignment is a pure function of the id: row order and " +
       "partitioning never move a row") {
    val base = membership(ids(2000), W)
    val shuffled = membership(
      ids(2000).repartition(13, col("id")).orderBy(rand(7)), W)
    assert(base == shuffled)
  }

  test("splits are exhaustive, exclusive, and roughly proportional") {
    val counts = Splits.assignSplit(ids(20000), "id", W)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 20000L)
    val trainFrac = counts("train") / 20000.0
    assert(math.abs(trainFrac - 0.8) < 0.02,
      s"train fraction $trainFrac drifts from 0.8")
  }

  test("boundary monotonicity: retuning train/val leaves every test " +
       "row in test, and train only GAINS ids (from val)") {
    val before = membership(ids(5000), W)
    val after = membership(ids(5000),
      Seq("train" -> 0.85, "val" -> 0.05, "test" -> 0.1))
    assert(before.filter(_._2 == "test") ==
      after.filter(_._2 == "test"),
      "the untouched test split must not churn")
    val trainBefore = before.filter(_._2 == "train").keySet
    val trainAfter = after.filter(_._2 == "train").keySet
    assert(trainBefore.subsetOf(trainAfter))
    assert((trainAfter -- trainBefore)
      .forall(id => before(id) == "val"),
      "train's new ids must all come from the shrunk val split")
  }

  test("different salts give independent assignments; same salt is " +
       "stable") {
    val a = membership(ids(3000), W)
    val b = Splits.assignSplit(ids(3000), "id", W, salt = "v2")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val moved = a.count { case (id, s) => b(id) != s }
    assert(moved > 0, "a new salt must reshuffle membership")
    assert(membership(ids(3000), W) == a)
  }

  test("k-fold covers [0,k) deterministically and is independent of " +
       "the split boundary") {
    val folds = Splits.assignFold(ids(5000), "id", 5)
    val seen = folds.select("fold").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(seen == Set(0, 1, 2, 3, 4))
    // joint distribution: every (split, fold) cell populated — fold is
    // not a refinement of split
    val cells = Splits.assignFold(
        Splits.assignSplit(ids(5000), "id", W), "id", 5)
      .groupBy("split", "fold").count().count()
    assert(cells == 15L)
  }

  test("NULL ids fail loudly; bad weights are rejected") {
    val e = intercept[Exception] {
      Splits.assignSplit(Seq(Option.empty[Long], Some(1L)).toDF("id"),
        "id", W).collect()
    }
    assert(e.getMessage.contains("NULL"))
    intercept[IllegalArgumentException] {
      Splits.assignSplit(ids(5), "id", Seq("a" -> 0.5, "b" -> 0.6))
    }
    intercept[IllegalArgumentException] {
      Splits.assignSplit(ids(5), "id", Seq("a" -> 0.5, "a" -> 0.5))
    }
  }

  test("the split expression stays codegen'd built-ins — no UDF, no " +
       "shuffle in the plan") {
    val plan = Splits.assignSplit(ids(100), "id", W)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"split must be built-in expressions:\n$plan")
  }
}
