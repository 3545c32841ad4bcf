package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-consistent reads ACROSS lake tables — the multi-table
  * transaction face. One [[TimeTravel]] table is atomic on its own;
  * a pipeline step that writes documents AND their derived index (or a
  * fact table and its dimension) has no single commit point, so a
  * reader can observe table A advanced and table B not. A snapshot
  * group closes that window the lakehouse way: writers commit member
  * tables normally (each commit atomic), then PUBLISH one group
  * version pinning the `(table → version)` cut; readers who resolve
  * versions through the group see every member at the SAME published
  * cut, never a torn pair. A crash after some member commits but
  * before the publish leaves the group head at the previous cut —
  * the half-written state is invisible to group readers and the
  * writer re-derives, exactly the lineage-is-truth discipline every
  * face here follows.
  *
  * Mechanics: a group IS a lake whose lineage rows are
  * `(version, table_name, data_path, table_version)` — the publish
  * rides [[TimeTravel.appendLineage]]'s create-if-absent single-file
  * arbiter (one winner per group version, losers refuse loudly,
  * `commit_ts` recorded), `latestVersion` and the store-capability
  * probe come along for free, and a cut is metadata: publishing costs
  * one row per member, reading costs nothing beyond the member's own
  * [[TimeTravel.readAsOf]].
  *
  * Retention: a member vacuum below a pinned version breaks that
  * cut's reads (readAsOf refuses loudly at the member floor, so the
  * break is visible, never silent corruption). [[memberFloor]] gives
  * the vacuum bound that keeps every retained cut readable.
  */
object SnapshotGroup {

  /** Publish the CURRENT head of every member as the next group
    * version. Members are read under the names the cut will serve
    * them by; a member with no committed version refuses (an empty
    * table has no snapshot to pin). Returns the group version. */
  def publish(spark: SparkSession, groupPath: String,
              tables: Map[String, String]): Long = {
    require(tables.nonEmpty, "SnapshotGroup.publish: no member tables")
    val pins = tables.toSeq.sortBy(_._1).map { case (name, path) =>
      val v = TimeTravel.latestVersion(spark, path)
      require(v >= 1,
        s"SnapshotGroup.publish: member '$name' at $path has no " +
          "committed version — publish after its first commit")
      (name, path, v)
    }
    publishVersions(spark, groupPath, pins)
  }

  /** Publish an EXPLICIT cut (e.g. re-pinning historical versions, or
    * a coordinator that captured versions at its own moment). Same
    * arbiter; refuses on a lost race like every commit here. Every
    * pin is validated against its member's head AT PUBLISH TIME — a
    * typo'd version must refuse here, not surface later as a
    * readMember failure on a cut readers already trust. */
  def publishVersions(spark: SparkSession, groupPath: String,
                      pins: Seq[(String, String, Long)]): Long = {
    require(pins.nonEmpty, "SnapshotGroup.publishVersions: empty cut")
    require(pins.map(_._1).distinct.size == pins.size,
      "SnapshotGroup.publishVersions: duplicate member names in one cut")
    pins.foreach { case (name, path, v) =>
      val head = TimeTravel.latestVersion(spark, path)
      require(v >= 1 && v <= head,
        s"SnapshotGroup.publishVersions: pin $v for member '$name' " +
          s"at $path is outside its readable range [1, $head] — a " +
          "published cut must be readable the moment it lands")
    }
    val g = TimeTravel.latestVersion(spark, groupPath) + 1
    import spark.implicits._
    val seg = pins.map { case (name, path, v) => (g, name, path, v) }
      .toDF("version", "table_name", "data_path", "table_version")
    TimeTravel.appendLineage(spark, groupPath, seg, g)
    g
  }

  /** The transaction runner: run member writes, THEN publish the cut.
    * `body` commits member tables normally (each commit atomic on its
    * own); only when it returns does the group version land, so a
    * throw anywhere inside leaves group readers on the previous
    * consistent cut — the crash-window discipline as a face. Returns
    * the published group version. No rollback of member commits is
    * attempted (lineage is truth; a re-derived transaction supersedes
    * them at the next cut). */
  def transact(spark: SparkSession, groupPath: String,
               tables: Map[String, String])(body: => Unit): Long = {
    body
    publish(spark, groupPath, tables)
  }

  /** Highest published group version; 0 before the first publish. */
  def latest(spark: SparkSession, groupPath: String): Long =
    TimeTravel.latestVersion(spark, groupPath)

  private def segments(spark: SparkSession,
                       groupPath: String): DataFrame =
    TimeTravel.readLineage(spark, groupPath)

  /** The pinned cut at group version `g` (default: the head):
    * member name → (data path, pinned table version). */
  def cut(spark: SparkSession, groupPath: String,
          groupVersion: Long = -1L): Map[String, (String, Long)] = {
    val head = latest(spark, groupPath)
    require(head >= 1, s"SnapshotGroup.cut: no published cut at $groupPath")
    val g = if (groupVersion < 0) head else groupVersion
    require(g >= 1 && g <= head,
      s"SnapshotGroup.cut: group version $g outside [1, $head]")
    val rows = segments(spark, groupPath)
      .filter(col("version") === g)
      .select(col("table_name"), col("data_path"), col("table_version"))
      .collect()
    rows.map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
  }

  /** Member `name` AT the cut — every group reader calling this for
    * every member sees one consistent multi-table snapshot, whatever
    * the members' heads have moved to since. */
  def readMember(spark: SparkSession, groupPath: String, name: String,
                 groupVersion: Long = -1L): DataFrame = {
    val c = cut(spark, groupPath, groupVersion)
    val (path, v) = c.getOrElse(name, throw new IllegalArgumentException(
      s"SnapshotGroup.readMember: no member '$name' in the cut " +
        s"(members: ${c.keys.toSeq.sorted.mkString(", ")})"))
    TimeTravel.readAsOf(spark, path, v)
  }

  /** The group version a wall-clock instant maps to — the cut the
    * world saw at 14:00 (every publish records `commit_ts` in its
    * segment, like every lake commit). Compose with [[readMember]]
    * for timestamped consistent reads. Refuses an instant before the
    * first publish. */
  def versionAt(spark: SparkSession, groupPath: String,
                tsMillis: Long): Long = {
    require(latest(spark, groupPath) >= 1,
      s"SnapshotGroup.versionAt: no published cut at $groupPath")
    // no null-commit_ts escape: appendLineage stamps every segment, so
    // a null here is a foreign/corrupt row — excluding it is the
    // conservative direction (it can only make an instant map EARLIER,
    // never onto a cut the world hadn't seen)
    val r = segments(spark, groupPath)
      .filter(col("commit_ts") <= tsMillis)
      .agg(max(col("version"))).head()
    require(!r.isNullAt(0),
      s"SnapshotGroup.versionAt: $tsMillis predates every publish at " +
        s"$groupPath (earliest is visible in history())")
    r.getLong(0)
  }

  /** All published cuts, one row per (group version, member):
    * `(version, table_name, data_path, table_version, commit_ts)`. */
  def history(spark: SparkSession, groupPath: String): DataFrame = {
    require(latest(spark, groupPath) >= 1,
      s"SnapshotGroup.history: no published cut at $groupPath")
    segments(spark, groupPath)
      .select(col("version"), col("table_name"), col("data_path"),
        col("table_version"), col("commit_ts"))
      .orderBy(col("version"), col("table_name"))
  }

  /** The LOWEST table version any retained cut pins for `name` — the
    * `keepFrom` bound that keeps every published cut readable: vacuum
    * the member with `keepFrom <= memberFloor` and no group reader
    * can hit a reclaimed file. */
  def memberFloor(spark: SparkSession, groupPath: String,
                  name: String): Long = {
    require(latest(spark, groupPath) >= 1,
      s"SnapshotGroup.memberFloor: no published cut at $groupPath")
    val r = segments(spark, groupPath)
      .filter(col("table_name") === name)
      .agg(min(col("table_version"))).head()
    require(!r.isNullAt(0),
      s"SnapshotGroup.memberFloor: no member '$name' in any cut")
    r.getLong(0)
  }
}
