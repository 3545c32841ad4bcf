package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the enrichment shape
  * (impression ⋈ click within an interval) that completes the
  * streaming surface next to the stream-static joins StreamingDedup
  * already uses. The time bound is what makes this runnable at all:
  * an unbounded stream-stream equi-join would buffer both sides
  * forever, while the interval plus both watermarks lets Spark drop a
  * buffered row once the other stream's watermark passes the last
  * instant it could still match (state per side ≈ watermark horizon +
  * interval, independent of stream length).
  *
  * One transform, both execution modes: on batch frames the same plan
  * is an ordinary range-condition join, which is how the spec pins
  * streaming output row-identical to the batch twin.
  */
object StreamingJoin {

  /** Inner (default) or left-outer join of `left` and `right` on
    * `keys`, keeping pairs where `right.rightTs` lies within
    * `[left.leftTs, left.leftTs + within]`. Right-side columns whose
    * names collide with a left column come back suffixed `_r` (the
    * join keys collapse to the left copy). For `left_outer`, an
    * unmatched left row is emitted with null right columns — on a
    * stream only once the right watermark passes its match window
    * (that is the correctness condition, not a latency bug).
    */
  def within(left: DataFrame, leftTs: String, leftWm: String,
             right: DataFrame, rightTs: String, rightWm: String,
             keys: Seq[String], within: String,
             joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "stream-stream join needs equality keys")
    val jt = joinType.toLowerCase.replace("outer", "").stripSuffix("_")
    require(jt == "inner" || jt == "left",
      s"within supports inner and left outer, not '$joinType' " +
        "(right/full need the mirrored interval reasoning — flip the " +
        "sides instead)")
    val l = left.withWatermark(leftTs, leftWm)
    val leftCols = left.columns.toSet
    val clash = right.columns.filter(leftCols.contains)
    // the _r de-collision suffix must not itself collide: left holding
    // BOTH v and v_r while right holds v would emit two v_r columns —
    // every downstream by-name reference then throws, and parquet
    // writers emit duplicate field names
    val resuffixed = clash.map(c => s"${c}_r")
      .filter(n => leftCols.contains(n) || right.columns.contains(n))
    require(resuffixed.isEmpty,
      s"within: the _r collision suffix collides again for " +
        s"${resuffixed.mkString(", ")} — rename those columns first")
    val r = clash.foldLeft(
        right.withWatermark(rightTs, rightWm))(
        (df, c) => df.withColumnRenamed(c, s"${c}_r"))
    def rname(c: String) = if (clash.contains(c)) s"${c}_r" else c
    val cond = keys.map(k => l(k) === r(rname(k))).reduce(_ && _) &&
      r(rname(rightTs)) >= l(leftTs) &&
      r(rname(rightTs)) <= l(leftTs) + expr(s"INTERVAL $within")
    // keys exist on both sides by contract, so their right copies are
    // always the suffixed names created just above
    l.join(r, cond, joinType).drop(keys.map(_ + "_r"): _*)
  }
}
