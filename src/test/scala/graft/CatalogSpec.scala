package graft

import org.scalatest.funsuite.AnyFunSuite

/** The generated SQL-surface catalog cannot drift:
  *
  *  - totality: every registered function has a contract anchor and a
  *    probed usage signature (a blank usage means a builder lost its
  *    catch-all rejection, a blank anchor means a new function skipped
  *    the map);
  *  - anchors resolve: `qNN` anchors are real `SparkEntry.queries` keys
  *    (so the oracle gate actually covers them), suite anchors are real
  *    spec files;
  *  - the committed `docs/SQL_SURFACE.md` is byte-identical to what the
  *    generator renders at this HEAD (edit the registration, re-run
  *    `runMain graft.CatalogDoc` — never the markdown).
  */
class CatalogSpec extends AnyFunSuite {

  private lazy val entries = GraftExtensions.catalog

  test("every registered function has a usage signature and a contract " +
       "anchor; the anchor map carries no orphans") {
    assert(entries.nonEmpty)
    val blankUsage = entries.filter(_.usage.isEmpty).map(_.name)
    assert(blankUsage.isEmpty,
      s"builders without a probed usage signature: $blankUsage")
    val blankAnchor = entries.filter(_.contract.isEmpty).map(_.name)
    assert(blankAnchor.isEmpty,
      s"functions missing a contractAnchors entry: $blankAnchor")
    // usage strings must actually name their function (a copy-paste of
    // another function's signature would silently mis-document)
    val misnamed = entries.filterNot(e => e.usage.contains(e.name))
    assert(misnamed.isEmpty,
      s"usage does not mention the function itself: " +
        misnamed.map(e => s"${e.name} -> '${e.usage}'"))
    val orphans = GraftExtensions.contractAnchors.keySet --
      entries.map(_.name).toSet
    assert(orphans.isEmpty, s"anchors for unregistered functions: $orphans")
  }

  test("query anchors are live SparkEntry.queries keys; suite anchors " +
       "are real spec files") {
    val qKeys = SparkEntry.queries.keySet
    val (qAnchors, suiteAnchors) =
      entries.map(_.contract).distinct.partition(_.startsWith("q"))
    val deadQ = qAnchors.filterNot(qKeys.contains)
    assert(deadQ.isEmpty, s"anchors naming no queries entry: $deadQ")
    val deadSuite = suiteAnchors.filterNot(sn =>
      new java.io.File(s"src/test/scala/graft/$sn.scala").isFile)
    assert(deadSuite.isEmpty, s"anchors naming no spec file: $deadSuite")
  }

  test("graft_catalog('all') serves the same entries from SQL text, " +
       "filters by kind, lists itself, and refuses unknown kinds") {
    val spark = SparkSpec.session
    GraftExtensions.register(spark)
    val all = spark.sql("SELECT * FROM graft_catalog('all')").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(all == entries.map(e => (e.name, e.kind)).toSet)
    assert(all.contains(("graft_catalog", "table")), "must list itself")
    val scalars = spark.sql(
      "SELECT function FROM graft_catalog('scalar')").collect()
      .map(_.getString(0)).toSet
    assert(scalars == entries.filter(_.kind == "scalar").map(_.name).toSet)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_catalog('everything')").collect()
    }
    assert(e.getMessage.contains("all|scalar|table"))
  }

  test("docs/SQL_SURFACE.md matches the generator byte-for-byte") {
    val f = new java.io.File("docs/SQL_SURFACE.md")
    assert(f.isFile,
      "docs/SQL_SURFACE.md missing — run `sbt \"runMain graft.CatalogDoc\"`")
    val committed = new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    assert(committed == CatalogDoc.render,
      "docs/SQL_SURFACE.md is stale — regenerate with " +
        "`sbt \"runMain graft.CatalogDoc\"`")
  }

  test("every SparkEntry.queries key has a SURVEY.md coverage-map " +
       "mention (the map is the coverage contract — a gated query " +
       "with no row is invisible coverage)") {
    val survey = new java.io.File("SURVEY.md")
    assert(survey.isFile, "SURVEY.md missing at the repo root")
    val text = new String(
      java.nio.file.Files.readAllBytes(survey.toPath), "UTF-8")
    // SURVEY anchors queries by short id (q01, q05b, q147) — extract
    // every word-bounded qNN[b] token once, then diff the full key set
    val anchored = raw"\bq\d+b?\b".r.findAllIn(text).toSet
    val missing = SparkEntry.queries.keySet
      .map(k => k -> raw"^q\d+b?".r.findFirstIn(k).getOrElse(k))
      .filterNot { case (_, short) => anchored.contains(short) }
    assert(missing.isEmpty,
      s"queries with NO SURVEY.md anchor (add a coverage-map row): " +
        missing.map(_._1).toSeq.sorted.mkString(", "))
  }
}
