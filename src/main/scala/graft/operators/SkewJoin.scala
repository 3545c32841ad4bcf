package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-aware equi-join: split the fact on a known hot-key set, join
  * the hot rows against a broadcast of the dim's hot slice (no shuffle
  * at all for the rows that would have formed the hotspot), and leave
  * the cold rows on the ordinary shuffle path. At 100 TB the failure
  * mode this kills is the one AQE's skew-split only mitigates: a
  * handful of keys holding 1000× the median row count pin their entire
  * row sets onto single shuffle partitions — AQE can split the
  * oversized partition into chunks, but every chunk still ships the
  * hot rows across the network; routing them through a broadcast hash
  * join ships only the dim's hot slice instead.
  *
  * The semantics are EXACTLY the plain join's for any hot set —
  * including an empty or wrongly-guessed one (each fact row lands in
  * exactly one branch and meets exactly the dim rows it would have met)
  * — so hot-key detection tunes performance, never results. The price
  * is a second scan of the fact (one per branch): columnar,
  * filter-pushed, and cheap next to the shuffle it replaces; callers
  * joining an already-materialized hot fact can persist it first.
  *
  * The reference's one fact⋈dim join shape (`server.py:282-302`,
  * violations per building joined to the building dim) hits exactly
  * this at city scale: a handful of mega-buildings hold orders of
  * magnitude more violation rows than the median BBL.
  *
  * Relation to [[Skew.saltedJoin]] (the third tool next to AQE's
  * runtime skew-split; BASELINE.md measures all three): salting
  * spreads EVERY row across n replicas of the dim — no hot-key
  * knowledge needed, but the whole dim is replicated n× and every
  * fact row pays the salt hash. The hot-key split here is surgical:
  * only the known-hot rows change route (to a broadcast of just the
  * dim's hot slice), the cold path is untouched, and it supports
  * left-outer. Know your hot keys → split; don't → salt or let AQE
  * split at runtime.
  */
object SkewJoin {

  /** The exact hot-key frame: keys of `df` with at least `minCount`
    * rows, heaviest `topN` of them. The groupBy count is itself
    * skew-tolerant — map-side partial aggregation collapses a hot
    * key's rows to one row per partition before the shuffle, so the
    * count table's shuffle is keys × partitions, never row-sized.
    * When even the distinct-key count table is too big, feed
    * [[joinSkewed]] from the [[graft.functions.MisraGries]] sketch
    * instead — any over-approximate hot set is safe (semantics are
    * hot-set-invariant), a missed key only costs skew.
    */
  def hotKeys(df: DataFrame, key: String, topN: Int,
              minCount: Long = 2L): DataFrame =
    df.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount)
      .orderBy(col("__cnt").desc, col(key))
      .limit(topN)
      .select(col(key))

  /** Equi-join `fact ⋈ dim` on `key` with the rows of `hot`'s keys
    * routed through a broadcast hash join. `hot` is a one-column frame
    * of key values (any extra columns are dropped; values are
    * deduplicated) — small by construction, it broadcasts into every
    * branch. Supported join types: `inner` and `left`/`left_outer`
    * (a fact row sits in exactly one branch, so per-row outer
    * semantics survive the split); right/full outer would need
    * dim-side match bookkeeping across branches and are rejected
    * loudly. Null fact keys ride the cold branch and behave exactly
    * as the plain join's (no match; preserved under left outer).
    *
    * DETERMINISM REQUIREMENT: the hot and cold branches are
    * independent re-evaluations of `fact` (left_semi + left_anti), so
    * the exactly-one-branch contract relies on the fact lineage being
    * deterministic. A non-deterministic lineage — sampling, limit over
    * ties, uuid/rand columns, a source mutating between jobs — can
    * double-count or drop rows across the branches; persist() such a
    * frame first. ([[joinSkewedAuto]] persists internally, since it
    * adds further full evaluations for detection.)
    */
  def joinSkewed(fact: DataFrame, dim: DataFrame, key: String,
                 hot: DataFrame, joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace("outer", "").stripSuffix("_")
    require(jt == "inner" || jt == "left",
      s"joinSkewed supports inner and left outer joins, not '$joinType': " +
        "right/full outer need dim-row match bookkeeping across the " +
        "hot/cold branches")
    val hotSet = broadcast(hot.select(col(key)).distinct())
    val factHot = fact.join(hotSet, Seq(key), "left_semi")
    val factCold = fact.join(hotSet, Seq(key), "left_anti")
    val dimHot = dim.join(hotSet, Seq(key), "left_semi")
    factHot.join(broadcast(dimHot), Seq(key), joinType)
      .unionByName(factCold.join(dim, Seq(key), joinType))
  }

  /** [[joinSkewed]] with the hot set detected from the fact itself:
    * keys holding at least `minShare` of the fact's rows (estimated
    * exactly via the skew-tolerant count above). One extra
    * metadata-sized job; at 1000 executors the detection aggregate is
    * the cheap part of any join big enough to need this.
    *
    * With `persistFact` (the default) the fact is PERSISTED
    * (memory-and-disk): detection (count + hotKeys) plus the hot/cold
    * branches make four evaluations of the same lineage, and
    * persisting both saves the recomputation and pins one snapshot so
    * a non-deterministic lineage can't route a row into zero or two
    * branches (ADVICE r9). The count() detection needs anyway
    * materializes the cache. The cache must outlive this call — the
    * returned frame's branches read it at THEIR evaluation time — so
    * it is deliberately not unpersisted here; call `fact.unpersist()`
    * after consuming the result if the executor memory matters. Pass
    * `persistFact = false` when the fact's lineage is already a
    * deterministic snapshot AND the caller has no handle to unpersist
    * — the SQL face does (its named tables are file/catalog-backed),
    * since a long-lived SQL session would otherwise pin one cached
    * copy per distinct fact plan forever.
    */
  def joinSkewedAuto(fact: DataFrame, dim: DataFrame, key: String,
                     topN: Int = 64, minShare: Double = 0.001,
                     joinType: String = "inner",
                     persistFact: Boolean = true): DataFrame = {
    require(minShare > 0.0 && minShare <= 1.0,
      s"minShare must be in (0, 1], got $minShare")
    val cached =
      if (persistFact)
        fact.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else fact
    val n = cached.count()
    val floor = math.max(2L, math.ceil(n * minShare).toLong)
    joinSkewed(cached, dim, key, hotKeys(cached, key, topN, floor),
      joinType)
  }
}
