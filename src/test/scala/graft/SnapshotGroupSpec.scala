package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{SnapshotGroup, TimeTravel}

class SnapshotGroupSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_grp_$tag").toFile
    d.deleteOnExit()
    new java.io.File(d, "t").getPath
  }

  private def facts(n: Long): DataFrame =
    spark.range(0L, n).select(col("id"), (col("id") * 2).as("v"))

  private def dims(n: Long): DataFrame =
    spark.range(0L, n).select(col("id"), concat(lit("d"), col("id")).as("nm"))

  test("group readers see one consistent cut: a member advancing " +
      "between publishes is invisible until the NEXT publish") {
    val (fDir, dDir, gDir) = (tmpDir("f1"), tmpDir("d1"), tmpDir("g1"))
    TimeTravel.commitAppend(facts(100L), fDir, Seq("id"), files = 2)
    TimeTravel.commitAppend(dims(10L), dDir, Seq("id"), files = 1)
    val g1 = SnapshotGroup.publish(spark, gDir,
      Map("facts" -> fDir, "dims" -> dDir))
    assert(g1 == 1L)
    // the torn window: facts advances, dims does not, NO publish yet
    TimeTravel.commitAppend(facts(100L).withColumn("id", col("id") + 100L),
      fDir, Seq("id"), files = 2)
    assert(SnapshotGroup.readMember(spark, gDir, "facts").count() == 100L)
    assert(SnapshotGroup.readMember(spark, gDir, "dims").count() == 10L)
    // member heads move on; group readers do not
    assert(TimeTravel.read(spark, fDir).count() == 200L)
    val g2 = SnapshotGroup.publish(spark, gDir,
      Map("facts" -> fDir, "dims" -> dDir))
    assert(g2 == 2L)
    assert(SnapshotGroup.readMember(spark, gDir, "facts").count() == 200L)
    // historical cuts stay addressable
    assert(SnapshotGroup.readMember(spark, gDir, "facts", g1)
      .count() == 100L)
    assert(SnapshotGroup.cut(spark, gDir, g1)("facts")._2 == 1L)
    assert(SnapshotGroup.history(spark, gDir).count() == 4L)
  }

  test("a writer crash between member commits leaves group readers on " +
      "the previous consistent pair — the half-written state is " +
      "invisible") {
    val (aDir, bDir, gDir) = (tmpDir("a2"), tmpDir("b2"), tmpDir("g2"))
    TimeTravel.commitAppend(facts(50L), aDir, Seq("id"), files = 1)
    TimeTravel.commitAppend(dims(5L), bDir, Seq("id"), files = 1)
    SnapshotGroup.publish(spark, gDir, Map("a" -> aDir, "b" -> bDir))
    // the 'transaction': writes A, crashes before writing B + publish
    TimeTravel.commitDelete(spark, aDir, "id",
      spark.range(0L, 25L).toDF("id"))
    // group readers: still the published pair, counts consistent
    assert(SnapshotGroup.readMember(spark, gDir, "a").count() == 50L)
    assert(SnapshotGroup.readMember(spark, gDir, "b").count() == 5L)
    // the re-derived transaction completes and publishes: both move
    TimeTravel.commitAppend(dims(5L).withColumn("id", col("id") + 5L),
      bDir, Seq("id"), files = 1)
    SnapshotGroup.publish(spark, gDir, Map("a" -> aDir, "b" -> bDir))
    assert(SnapshotGroup.readMember(spark, gDir, "a").count() == 25L)
    assert(SnapshotGroup.readMember(spark, gDir, "b").count() == 10L)
  }

  test("memberFloor bounds vacuum: at the floor every retained cut " +
      "still reads; beyond a pinned version the break is LOUD") {
    val (aDir, gDir) = (tmpDir("a3"), tmpDir("g3"))
    TimeTravel.commitAppend(facts(40L), aDir, Seq("id"), files = 1)
    SnapshotGroup.publish(spark, gDir, Map("a" -> aDir)) // pins v1
    TimeTravel.commitAppend(facts(40L).withColumn("id", col("id") + 40L),
      aDir, Seq("id"), files = 1)
    TimeTravel.compact(spark, aDir, Seq("id"), files = 1) // v3
    SnapshotGroup.publish(spark, gDir, Map("a" -> aDir)) // pins v3
    assert(SnapshotGroup.memberFloor(spark, gDir, "a") == 1L)
    // vacuum AT the floor: both cuts still read
    TimeTravel.vacuum(spark, aDir, keepFrom = 1L)
    assert(SnapshotGroup.readMember(spark, gDir, "a", 1L).count() == 40L)
    assert(SnapshotGroup.readMember(spark, gDir, "a", 2L).count() == 80L)
    // vacuum past the floor: cut 1 now refuses loudly (readAsOf's own
    // floor guard), never silent corruption
    TimeTravel.vacuum(spark, aDir, keepFrom = 3L)
    intercept[IllegalArgumentException] {
      SnapshotGroup.readMember(spark, gDir, "a", 1L).count()
    }
    assert(SnapshotGroup.readMember(spark, gDir, "a", 2L).count() == 80L)
  }

  test("transact: the cut publishes only when the body completes — a " +
      "throw leaves group readers on the previous cut") {
    val (aDir, gDir) = (tmpDir("a5"), tmpDir("g5"))
    TimeTravel.commitAppend(facts(10L), aDir, Seq("id"), files = 1)
    SnapshotGroup.publish(spark, gDir, Map("a" -> aDir))
    intercept[RuntimeException] {
      SnapshotGroup.transact(spark, gDir, Map("a" -> aDir)) {
        TimeTravel.commitAppend(
          facts(10L).withColumn("id", col("id") + 10L),
          aDir, Seq("id"), files = 1)
        throw new RuntimeException("writer crashed mid-transaction")
      }
    }
    // the member head moved, the GROUP did not
    assert(TimeTravel.read(spark, aDir).count() == 20L)
    assert(SnapshotGroup.readMember(spark, gDir, "a").count() == 10L)
    // the re-derived transaction completes and the cut advances
    val g = SnapshotGroup.transact(spark, gDir, Map("a" -> aDir)) {
      TimeTravel.commitAppend(
        facts(10L).withColumn("id", col("id") + 20L),
        aDir, Seq("id"), files = 1): Unit
    }
    assert(g == 2L)
    assert(SnapshotGroup.readMember(spark, gDir, "a").count() == 30L)
  }

  test("versionAt maps a wall-clock instant to the cut the world saw " +
      "then") {
    val (aDir, gDir) = (tmpDir("a6"), tmpDir("g6"))
    TimeTravel.commitAppend(facts(10L), aDir, Seq("id"), files = 1)
    SnapshotGroup.publish(spark, gDir, Map("a" -> aDir))
    Thread.sleep(10)
    val between = System.currentTimeMillis()
    Thread.sleep(10)
    TimeTravel.commitAppend(facts(5L).withColumn("id", col("id") + 10L),
      aDir, Seq("id"), files = 1)
    SnapshotGroup.publish(spark, gDir, Map("a" -> aDir))
    assert(SnapshotGroup.versionAt(spark, gDir, between) == 1L)
    val g = SnapshotGroup.versionAt(spark, gDir,
      System.currentTimeMillis())
    assert(g == 2L)
    assert(SnapshotGroup.readMember(spark, gDir, "a",
      SnapshotGroup.versionAt(spark, gDir, between)).count() == 10L)
    intercept[IllegalArgumentException] {
      SnapshotGroup.versionAt(spark, gDir, 1L)
    }
  }

  test("guards: empty/unversioned/duplicate cuts and unknown members " +
      "refuse loudly; racing publishes get one winner") {
    val (aDir, gDir) = (tmpDir("a4"), tmpDir("g4"))
    intercept[IllegalArgumentException] {
      SnapshotGroup.publish(spark, gDir, Map.empty)
    }
    val un = intercept[IllegalArgumentException] {
      SnapshotGroup.publish(spark, gDir, Map("a" -> aDir))
    }
    assert(un.getMessage.contains("no committed version"))
    TimeTravel.commitAppend(facts(10L), aDir, Seq("id"), files = 1)
    intercept[IllegalArgumentException] {
      SnapshotGroup.publishVersions(spark, gDir,
        Seq(("a", aDir, 1L), ("a", aDir, 1L)))
    }
    SnapshotGroup.publish(spark, gDir, Map("a" -> aDir))
    val unknown = intercept[IllegalArgumentException] {
      SnapshotGroup.readMember(spark, gDir, "nope")
    }
    assert(unknown.getMessage.contains("no member"))
    // publishes ride the commit arbiter: a second segment racing to an
    // already-won group version gets the typed refusal, and the head
    // is unmoved
    val head = SnapshotGroup.latest(spark, gDir)
    intercept[graft.sources.CommitRaceLost] {
      graft.sources.TimeTravel.appendLineage(spark, gDir,
        Seq((head, "a", aDir, 1L))
          .toDF("version", "table_name", "data_path", "table_version"),
        head)
    }
    assert(SnapshotGroup.latest(spark, gDir) == head)
  }

  test("publishVersions validates every pin at publish time: a version " +
      "past the member's head (or below 1) refuses and NO cut lands") {
    val (aDir, gDir) = (tmpDir("a5"), tmpDir("g5"))
    TimeTravel.commitAppend(facts(10L), aDir, Seq("id"), files = 1) // v1
    val over = intercept[IllegalArgumentException] {
      SnapshotGroup.publishVersions(spark, gDir, Seq(("a", aDir, 7L)))
    }
    assert(over.getMessage.contains("outside its readable range [1, 1]"))
    intercept[IllegalArgumentException] {
      SnapshotGroup.publishVersions(spark, gDir, Seq(("a", aDir, 0L)))
    }
    // the typo'd publishes left no group behind; a valid pin lands at 1
    assert(SnapshotGroup.latest(spark, gDir) == 0L)
    assert(SnapshotGroup.publishVersions(spark, gDir,
      Seq(("a", aDir, 1L))) == 1L)
    assert(SnapshotGroup.readMember(spark, gDir, "a").count() == 10L)
  }

  test("a pinned cut crosses a member's type-widening boundary: the " +
      "old cut keeps the narrow type, the new cut reads narrow files " +
      "under the widened target") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val root = tmpDir("widen")
    val aDir = s"$root/a"
    val gDir = s"$root/group"
    TimeTravel.commitAppend(
      spark.range(0L, 30L).select(col("id"),
        (col("id") % 7).cast("int").as("x")),
      aDir, Seq("id"), files = 1) // member v1: x int
    val g1 = SnapshotGroup.publish(spark, gDir, Map("a" -> aDir))
    // the member widens AFTER the cut pinned v1
    TimeTravel.commitAppend(
      spark.range(30L, 40L).select(col("id"),
        (col("id") + 6000000000L).as("x")),
      aDir, Seq("id"), files = 1) // member v2: x long
    val g2 = SnapshotGroup.publish(spark, gDir, Map("a" -> aDir))
    val oldCut = SnapshotGroup.readMember(spark, gDir, "a", g1)
    assert(oldCut.schema("x").dataType == IntegerType &&
      oldCut.count() == 30L)
    val newCut = SnapshotGroup.readMember(spark, gDir, "a", g2)
    assert(newCut.schema("x").dataType == LongType &&
      newCut.count() == 40L)
    // the narrow-era rows decode exactly under the widened target
    assert(newCut.filter(col("id") === 13L).select(col("x"))
      .head().getLong(0) == 6L)
    assert(newCut.filter(col("x") >= 6000000000L).count() == 10L)
  }
}
