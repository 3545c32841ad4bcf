package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

/** Plan-level regression gate: every contract query's statically-chosen
  * physical plan, reduced to a structural signature (see
  * [[PlanFingerprint]]) and diffed against a committed snapshot.
  *
  * Wall-clock on this VM is noise-dominated (BASELINE.md: identical plans
  * reading 0.3 s and 5.4 s run-to-run), so the regression signal is the
  * PLAN: if a change flips a broadcast to a sort-merge join, drops a
  * pushed filter, or adds a shuffle, this spec fails with the exact query
  * names and the first structural divergence — an explicit diff instead
  * of a timing guess. The snapshot stores full signatures (not hashes),
  * so an intended change also shows up reviewably in `git diff`.
  *
  * When a signature change is INTENDED (a query or operator was
  * deliberately restructured), regenerate the snapshot and commit it.
  * Regeneration is APPEND-ONLY by policy (round 7): the common regen
  * adds entries for new queries and drops removed ones, and REFUSES to
  * rewrite an existing query's signature — a changed plan must be named
  * explicitly, so every rewrite is a reviewed, per-query decision that
  * shows up in `git diff` next to the code that caused it:
  *
  *   SPARK_GRAFT_REGEN_PLANS=1 sbt "testOnly graft.PlanFingerprintSpec"
  *     append-only: new queries in, removed queries out, changes refused
  *   SPARK_GRAFT_REGEN_PLANS=q08_topk_other,q37_dedup_clusters ...
  *     additionally allow exactly these queries' signatures to change
  *   SPARK_GRAFT_REGEN_PLANS=all ...
  *     full rewrite — exceptional (fingerprint-format changes only),
  *     note it in BASELINE.md's snapshot changelog
  *
  * The snapshot is pinned to (sf0.001, the shared test session's config);
  * signatures only compare within one environment — static broadcast
  * selection reads size statistics, so other SFs may legitimately differ.
  */
class PlanFingerprintSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private val snapshot = Paths.get("src/test/resources/plan_fingerprints_sf0.001.txt")

  /** Snapshot lines are `name<TAB>signature`. A malformed line (stray
    * merge marker, hand edit) fails with the offending text, not a bare
    * MatchError from a destructuring split.
    */
  private def readSnapshot(): Map[String, String] =
    Files.readAllLines(snapshot).asScala
      .filter(_.nonEmpty)
      .map { l =>
        val i = l.indexOf('\t')
        assert(i > 0, s"malformed snapshot line (expected name<TAB>signature): $l")
        l.substring(0, i) -> l.substring(i + 1)
      }.toMap

  private def firstDivergence(a: String, b: String): String = {
    val i = a.zip(b).indexWhere { case (x, y) => x != y }
    val at = if (i < 0) math.min(a.length, b.length) else i
    val from = math.max(0, at - 40)
    s"...${a.slice(from, at + 60)}... vs ...${b.slice(from, at + 60)}..."
  }

  test("contract query plans match the committed fingerprint snapshot") {
    assume(Files.isDirectory(Paths.get(sfDir)), s"testdata missing: $sfDir")
    val actual = PlanFingerprint.all(spark, sfDir, SparkEntry.queries)
    spark.sharedState.cacheManager.clearCache()
    val rendered = actual.toSeq.sortBy(_._1)
      .map { case (n, s) => s"$n\t$s" }.mkString("", "\n", "\n")

    if (sys.env.contains("SPARK_GRAFT_REGEN_PLANS")) {
      // append-only policy (see class scaladoc): rewriting an EXISTING
      // query's signature requires naming it in the env value (or
      // `all`); a bare `1` only appends new queries / drops removed ones
      val mode = sys.env("SPARK_GRAFT_REGEN_PLANS")
      val mayChange: String => Boolean =
        if (mode == "all") _ => true
        else mode.split(",").map(_.trim).filter(_.nonEmpty).toSet
          .filterNot(_ == "1")
      if (Files.exists(snapshot)) {
        val existing = readSnapshot()
        val blocked = actual.collect {
          case (n, s) if existing.get(n).exists(_ != s) && !mayChange(n) => n
        }.toSeq.sorted
        assert(blocked.isEmpty,
          "append-only snapshot policy: these queries' committed " +
            "signatures would change — if the plan changes are intended, " +
            "re-run with SPARK_GRAFT_REGEN_PLANS=" +
            blocked.mkString(",") + " (reviewed per query), never a " +
            "blanket rewrite:\n" + blocked.mkString("\n"))
      }
      Files.createDirectories(snapshot.getParent)
      Files.write(snapshot, rendered.getBytes(StandardCharsets.UTF_8))
      info(s"snapshot regenerated: $snapshot (${actual.size} queries)")
    } else {
      assert(Files.exists(snapshot),
        s"no committed snapshot at $snapshot — generate one with " +
          "SPARK_GRAFT_REGEN_PLANS=1 sbt 'testOnly graft.PlanFingerprintSpec'")
      val expected = readSnapshot()
      val changed = actual.collect {
        case (n, s) if expected.get(n).exists(_ != s) =>
          s"$n: ${firstDivergence(expected(n), s)}"
      }
      val added = (actual.keySet -- expected.keySet).toSeq.sorted
      val removed = (expected.keySet -- actual.keySet).toSeq.sorted
      val problems =
        changed.toSeq.sorted.map("PLAN CHANGED  " + _) ++
          added.map(n => s"NEW QUERY (no snapshot entry)  $n") ++
          removed.map(n => s"QUERY REMOVED  $n")
      assert(problems.isEmpty,
        "plan fingerprint drift — if intended, regenerate with " +
          "SPARK_GRAFT_REGEN_PLANS=1 sbt 'testOnly graft.PlanFingerprintSpec':\n" +
          problems.mkString("\n"))
      val broken = actual.filter(_._2.startsWith("error:"))
      assert(broken.isEmpty, s"queries failing at construction: $broken")
    }
  }

  test("signatures see through persisted lineage, grouping-set arity, native expressions") {
    assume(Files.exists(snapshot), "snapshot not generated yet")
    val sigs = readSnapshot()

    // persisted-lineage blind spot (VERDICT r4): q19 (corpus LSH pass)
    // and q80 (incremental probe of a persisted index) both end at
    // ngramJaccard's cached pair frame — the signature must reach the
    // BUILD lineage behind the cache, where they differ completely
    assert(sigs("q19_minhash_lsh") != sigs("q80_incremental_dedup"))
    assert(sigs("q19_minhash_lsh").contains("InMemoryScan["),
      "cached build lineage absent from the signature")

    // rollup (n+1 grouping sets) vs cube (2^n): Expand arity
    assert(sigs("q34_rollup") != sigs("q61_cube"))

    // one-scan document projections differing only in the native
    // expressions they evaluate must not collapse to one signature
    val oneScan = Seq("q14_text_tokens", "q16_lang_id", "q17_fingerprints",
      "q20_simhash", "q27_media_meta").map(sigs)
    assert(oneScan.distinct.size == oneScan.size,
      s"native-expression queries collapsed: $oneScan")
  }
}
