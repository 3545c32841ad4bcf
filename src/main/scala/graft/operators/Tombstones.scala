package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Id-tombstone sidecar shared by the five persisted index families
  * (digest, MinHash, SimHash, IVF, LSH) — the delete path the reference
  * models with FK cascade actions (`schema.sql:60-64`) re-expressed for
  * append-only parquet indexes. Removing a document (takedown, license
  * retraction — routine in training-data pipelines) must not require a
  * full index rebuild, so deletion is LOGICAL first, PHYSICAL later:
  *
  *  - `deleteFrom*Index` appends the doc's key to a tiny sidecar table
  *    next to the index (deletion-count-sized, never data-sized);
  *  - every PROBE anti-joins its index-side rows against the sidecar,
  *    so deleted docs stop matching immediately;
  *  - the family's `compact*Index` applies the sidecar during its
  *    rewrite (rows physically removed) and then drops it — after
  *    compaction the anti-join is a no-op on an absent sidecar.
  *
  * Append-after-delete REVIVES: each family's append first clears its
  * batch's keys from the sidecar. The index's physical rows for a
  * revived id are usually still present (the idempotence anti-join will
  * not duplicate them), so clearing the tombstone is the whole revival.
  *
  * Delete is idempotent by VALUE (incoming keys are anti-joined against
  * the current sidecar before the append, so a replayed delete writes
  * nothing) and serialized per index path like every writer in the
  * families.
  *
  * SNAPSHOT SEMANTICS, same as every index read here: the sidecar's
  * existence and file listing are resolved when a probe FRAME is
  * constructed, not per action — a held frame does not see later
  * deletes; re-construct probes after mutating, exactly as after an
  * append or compaction. The existence check is the one structural
  * eager read (a path probe, no cluster job).
  *
  * NOT offered for the count-based families (LM stats, heavy-hitter
  * sketches): their segments are additive AGGREGATES — a doc's
  * contribution is not recoverable from the index, so deletion there is
  * a rebuild (or a deliberate negative-segment append), not a sidecar.
  *
  * Capacity interaction: a bucket-capped family (MinHash) counts only
  * LIVE rows toward its bucket caps at append time (the append's cap
  * accounting anti-joins the sidecar) — a delete frees both PROBE
  * results and cap SLOTS immediately; compaction later restores the
  * physical bucket to the cap by removing the tombstoned rows.
  */
private[graft] object Tombstones {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, tombPath: String): Boolean =
    fs(spark, tombPath).exists(new org.apache.hadoop.fs.Path(tombPath))

  /** Append `keys`' distinct non-already-tombstoned values (single
    * column `keyCol`, written under that name — the sidecar is
    * self-describing). Creates the sidecar on first delete.
    */
  def add(keys: DataFrame, keyCol: String, tombPath: String): Unit = {
    val spark = keys.sparkSession
    val incoming = keys.select(col(keyCol)).distinct()
    val fresh =
      if (!exists(spark, tombPath)) incoming
      else incoming.join(
        spark.read.parquet(tombPath).select(col(keyCol).as("__tomb")),
        col(keyCol) <=> col("__tomb"), "left_anti")
    fresh.write.mode("append").parquet(tombPath)
  }

  /** Remove `keys` from the sidecar (append-path revival). Reads the
    * sidecar only when it exists, rewrites it only when a key actually
    * matches — the common no-deletes append pays one path probe.
    * Staged-swap rewrite, same promotion rule as the index compactions.
    */
  def clear(keys: DataFrame, keyCol: String, tombPath: String): Unit = {
    val spark = keys.sparkSession
    if (!exists(spark, tombPath)) return
    val tomb = spark.read.parquet(tombPath)
    val ks = keys.select(col(keyCol).as("__clr")).distinct()
    val hit = tomb.join(ks, col(keyCol) <=> col("__clr"), "left_semi")
      .limit(1).head(1).nonEmpty
    if (!hit) return
    Lifecycle.stagedSwap(spark, tombPath) { staged =>
      tomb.join(ks, col(keyCol) <=> col("__clr"), "left_anti")
        .write.mode("overwrite").parquet(staged)
    }
  }

  /** Anti-join `df` against the sidecar on `joinCol` <=> sidecar key
    * (null-safe: the digest family tombstones a null digest for deleted
    * null-text docs). Identity when no sidecar exists — the structural
    * existence probe documented above.
    */
  def applyTo(df: DataFrame, joinCol: String, tombPath: String): DataFrame = {
    val spark = df.sparkSession
    if (!exists(spark, tombPath)) df
    else {
      val tomb = spark.read.parquet(tombPath)
      df.join(tomb.select(col(tomb.columns(0)).as("__tomb")),
        col(joinCol) <=> col("__tomb"), "left_anti")
    }
  }

  /** [[applyTo]] joining on the column the sidecar itself names — for
    * readers that do not carry the index's id column name (IVF load).
    * The sidecar is single-column by construction, written by the
    * family's delete function under the index's own id column name.
    */
  def applySelfTo(df: DataFrame, tombPath: String): DataFrame = {
    val spark = df.sparkSession
    if (!exists(spark, tombPath)) df
    else applyTo(df, spark.read.parquet(tombPath).columns(0), tombPath)
  }

  /** Drop the sidecar after a compaction physically applied it. A crash
    * between the compaction's swap and this delete leaves a harmless
    * sidecar whose anti-joins match nothing.
    */
  def drop(spark: SparkSession, tombPath: String): Unit = {
    fs(spark, tombPath)
      .delete(new org.apache.hadoop.fs.Path(tombPath), true): Unit
  }
}
