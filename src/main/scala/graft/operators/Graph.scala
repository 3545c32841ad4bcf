package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge frames. The repo's other graph op —
  * connected components for dedup clustering — lives in
  * [[Dedup.nearDupClusters]]; this object holds the rank/centrality side.
  */
object Graph {

  /** PageRank by power iteration, simple form (uniform init = 1, per-node
    * teleport `1-damping`, no dangling redistribution — symmetrize the
    * edge set and every node has out-edges, which the contract query
    * does). Returns (node, pr) for every node with in-edges.
    *
    * Determinism contract (what makes an iterative double algorithm
    * oracle-checkable at all): each node's incoming contributions are
    * summed by an in-order fold over the SORTED contribution list — same
    * trick as the LM scorer — so the result is independent of partitioning
    * and row arrival order, and any engine reproducing the formula
    * reproduces the doubles bit-for-bit. The teleport constant is computed
    * as `1.0 - damping` in IEEE doubles; mirror exactly that expression in
    * an oracle (not a rounded literal — `1 - 0.85` is NOT the double
    * nearest 0.15).
    *
    * Scale shape per iteration: one equi-join of edges to the rank frame
    * (shuffle on source) and one hash aggregate on destination. The edge
    * frame is persisted — it feeds degree computation plus every
    * iteration, and its upstream lineage (e.g. pair mining) must not
    * re-run per step. Iterations beyond a handful should localCheckpoint
    * the rank frame to keep the plan from doubling (the connected-
    * components rule); at 2 contract iterations plain lineage is fine.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "pageRank requires at least one iteration")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("__s")).agg(count(lit(1)).as("__dg"))
    def step(pr: DataFrame): DataFrame =
      e.join(deg, "__s").join(pr, col("__s") === col("__v"))
        .select(col("__d"), (col("__pr") / col("__dg")).as("__c"))
        .groupBy(col("__d"))
        .agg((lit(1.0 - damping) + lit(damping) *
          aggregate(array_sort(collect_list(col("__c"))), lit(0.0),
            (acc, x) => acc + x)).as("pr"))
        .select(col("__d").as("__v"), col("pr").as("__pr"))
    val init = deg.select(col("__s").as("__v"), lit(1.0).as("__pr"))
    (1 to iters).foldLeft(init)((pr, _) => step(pr))
      .select(col("__v").as("node"), col("__pr").as("pr"))
  }
}
