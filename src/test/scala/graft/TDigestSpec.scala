package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TDigestSketch
import graft.plans.ApproxPercentileRewrite

/** The bounded-memory percentile tier (the A4 100 TB hazard):
  *
  *  - TDigestSketch: rank-error bounds, merge associativity (the
  *    per-shard persisted-sketch story), null skipping, serialization
  *    round-trip.
  *  - ApproxPercentileRewrite: flag on → the plan carries the GK sketch
  *    (`percentile_approx`), no exact Percentile buffer; flag off →
  *    exact, untouched. Weighted/descending forms left exact.
  */
class TDigestSpec extends SparkSpec {

  /** Deterministic skewed sample: exp of a uniform grid — long right
    * tail, nothing random. Shuffled order via a multiplicative-hash
    * permutation so the digest never sees sorted input (its worst
    * case is adversarial order, its best is sorted; a permuted feed is
    * the honest middle).
    */
  private def skewed(n: Int): IndexedSeq[Double] =
    (0 until n).map { i =>
      val j = (i * 2654435761L % n + n) % n
      math.exp(6.0 * j / n)
    }

  private def rankOf(xs: IndexedSeq[Double], v: Double): Double =
    xs.count(_ <= v).toDouble / xs.size

  test("rank error: |rank(estimate) - q| bounded by ~4q(1-q)/δ, " +
       "tails near-exact, δ=100") {
    val xs = skewed(200000)
    val d = new TDigestSketch.Digest(100.0)
    xs.foreach(d.add)
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = d.quantile(q)
      val err = math.abs(rankOf(xs, est) - q)
      val bound = math.max(0.003, 6.0 * q * (1 - q) / 100.0)
      assert(err <= bound, s"q=$q est=$est rank err $err > $bound")
    }
    // exact endpoints: the digest tracks true min/max
    assert(d.quantile(0.0) == xs.min && d.quantile(1.0) == xs.max)
    // the sketch is CONSTANT-size: centroid count is O(δ), not O(n)
    d.compress()
    assert(d.centM.length < 200,
      s"δ=100 must bound centroids (~<2δ), got ${d.centM.length}")
  }

  test("merge of per-shard sketches answers like one sketch over the " +
       "union (the persisted-shard story), and round-trips bytes") {
    val xs = skewed(120000)
    val shards = xs.grouped(10000).toSeq
    val sketches = shards.map { part =>
      val d = new TDigestSketch.Digest(100.0)
      part.foreach(d.add)
      d.serialize()
    }
    val merged = TDigestSketch.merge(sketches)
    for (q <- Seq(0.05, 0.5, 0.95)) {
      val est = TDigestSketch.quantile(merged, q)
      val err = math.abs(rankOf(xs, est) - q)
      assert(err <= 0.02, s"merged q=$q rank err $err")
    }
    // round-trip is lossless
    val again = TDigestSketch.deserialize(merged).serialize()
    assert(java.util.Arrays.equals(merged, again))
  }

  test("column faces: percentileAgg tracks exact percentile per group; " +
       "sketchAgg + mergeAgg across batches equals one-shot; nulls skip") {
    val s = spark
    import s.implicits._
    val xs = skewed(50000)
    val df = xs.zipWithIndex
      .map { case (v, i) => (i % 5, if (i % 997 == 0) None else Some(v)) }
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(TDigestSketch.percentileAgg(col("v"), 0.5).as("med"),
        expr("percentile(v, 0.5)").as("exact"),
        count("v").as("n"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == 5)
    got.foreach { case (g, med, exact) =>
      // compare in rank space via the group's own values
      val vals = df.filter(col("g") === g && col("v").isNotNull)
        .select("v").as[Double].collect().toIndexedSeq
      assert(math.abs(rankOf(vals, med) - 0.5) <= 0.02,
        s"group $g: t-digest median $med vs exact $exact")
    }

    // incremental: sketch two halves in separate jobs, merge the
    // persisted bytes, read the quantile — no re-read of batch 1
    val halves = Seq(df.filter(col("g") < 2), df.filter(col("g") >= 2))
    val perBatch = halves.map(_.agg(
        TDigestSketch.sketchAgg(col("v")).as("sk"))
      .collect().head.getAs[Array[Byte]](0))
    val mergedDf = perBatch.toDF("sk")
      .agg(TDigestSketch.mergeAgg(col("sk")).as("sk"))
      .collect().head.getAs[Array[Byte]](0)
    val allVals = df.filter(col("v").isNotNull)
      .select("v").as[Double].collect().toIndexedSeq
    val est = TDigestSketch.quantile(mergedDf, 0.5)
    assert(math.abs(rankOf(allVals, est) - 0.5) <= 0.02)
  }

  test("rewrite flag on: percentile plans as percentile_approx " +
       "(bounded buffers); flag off: exact; weighted/desc stay exact") {
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val li = s.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      def medianDf = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.5)").as("med"))
      val exact = medianDf.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap

      s.conf.set(ApproxPercentileRewrite.ConfKey, "true")
      val approxDf = medianDf
      val plan = approxDf.queryExecution.optimizedPlan.toString
      assert(plan.contains("percentile_approx"),
        s"expected GK-sketch rewrite in plan:\n$plan")
      assert(!plan.contains("percentile(l_extendedprice"),
        s"exact Percentile must be gone:\n$plan")
      approxDf.collect().foreach { r =>
        val ex = exact(r.getString(0))
        assert(math.abs(r.getDouble(1) - ex) / ex < 0.02,
          s"${r.getString(0)}: $ex vs ${r.getDouble(1)}")
      }
      // PERCENTILE_CONT — the reference's exact surface
      // (server.py:222-231) — resolves to Percentile and rewrites too
      li.createOrReplaceTempView("td_li")
      val contPlan = s.sql(
        """SELECT l_returnflag,
          |  percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)
          |FROM td_li GROUP BY l_returnflag""".stripMargin)
        .queryExecution.optimizedPlan.toString
      assert(contPlan.contains("percentile_approx"), contPlan)

      // weighted percentile has no sketch arm: must stay exact
      val weighted = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.5, l_linenumber)"))
        .queryExecution.optimizedPlan.toString
      assert(!weighted.contains("percentile_approx"), weighted)

      s.conf.set(ApproxPercentileRewrite.ConfKey, "false")
      val off = medianDf.queryExecution.optimizedPlan.toString
      assert(!off.contains("percentile_approx"), off)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
