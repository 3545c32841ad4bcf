package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Corpus, Dedup, Multimodal}

/** Pins the r14 null contracts at the OPERATOR level (the null-bearing
  * fixture gate — FIXTURES.md §C — pins them end-to-end against the
  * oracles; this spec keeps each contract local and named, so a drift
  * points at the operator, not at a 141-query sweep).
  *
  * The contracts:
  *  - id-keyed results (top-neighbor, decontamination verdicts, media
  *    synthesizers) DROP null-id rows — an anti-join can never remove a
  *    null id, and a result keyed by id cannot name one;
  *  - deterministic sampling DROPS null-KEY rows (membership must be
  *    derivable from the key) while a null STRATUM is a real group;
  *  - corpus dedup keeps null-id rows as singleton clusters
  *    (established r12 behavior, unchanged);
  *  - null digests behave like values (q96's <=> contract, unchanged).
  */
class NullContractsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (Option(1L), Option("alpha beta gamma delta"), Option("src0")),
    (Option(2L), Option("alpha beta gamma delta"), Option("src0")),
    (Option(3L), Option("epsilon zeta eta theta"), Option("src0")),
    (Option.empty[Long], Option("alpha beta gamma delta"), Option("src0")),
    (Option(4L), Option.empty[String], Option("src0")),
    (Option(5L), Option("iota kappa lambda mu"), Option.empty[String]))
    .toDF("doc_id", "text", "source")

  test("ngramJaccardTopNeighbor drops null-id rows; null-text rows with " +
      "a real id take the zero fallback") {
    val r = Dedup.ngramJaccardTopNeighbor(docs, "doc_id", "text", "source")
      .collect()
    assert(!r.exists(_.isNullAt(0)), "null-id row leaked into a keyed result")
    val byId = r.map(x => x.getLong(0) -> x).toMap
    assert(byId.contains(4L) && byId(4L).getDouble(2) == 0.0)
  }

  test("stratifiedSample and balanceStrata drop null-KEY rows and keep " +
      "a null STRATUM as a real group") {
    val s = Corpus.stratifiedSample(docs, "source", "doc_id", quota = 10)
      .collect()
    assert(!s.exists(_.isNullAt(0)), "null key consumed a sample slot")
    // doc 5 (null source) survives as the null stratum
    assert(s.exists(r => !r.isNullAt(0) && r.getLong(0) == 5L))
    val b = Corpus.balanceStrata(docs, "source", "doc_id").collect()
    assert(!b.exists(_.isNullAt(0)))
    // the null-key row must not deflate the min-stratum size: src0 has
    // FOUR rows but only three with keys; null stratum has one → min 1
    assert(b.count(r => r.getAs[String]("source") == "src0") == 1)
  }

  test("decontaminate (and the index face) drop null-id docs — a " +
      "contaminated null id would otherwise leak through the gate") {
    val probes = Seq((9L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val r = Corpus.decontaminate(docs, probes, "doc_id", "text", n = 3)
      .collect()
    // docs 1/2 are contaminated (drop), the null-id doc shares the SAME
    // contaminated text — dropping it at the edge is what keeps the
    // gate sound
    assert(!r.exists(_.isNullAt(0)), "contaminated null-id doc leaked")
    assert(r.map(_.getLong(0)).toSet == Set(3L, 4L, 5L))
  }

  test("media synthesizers drop null-id rows (every byte derives from " +
      "the id)") {
    val c = Multimodal.withContainerColumn(docs, "doc_id", "text")
    val p = Multimodal.withPcmColumn(docs, "doc_id", "text")
    val m = Multimodal.withMp4SampleColumn(docs, "doc_id")
    val a = Multimodal.withAviColumn(docs, "doc_id")
    val j = Multimodal.withMjpegMp4Column(docs, "doc_id")
    Seq(c, p, m, a, j).foreach { df =>
      val rows = df.select("doc_id").collect()
      assert(rows.length == 5 && !rows.exists(_.isNullAt(0)))
    }
  }

  test("dedupCorpus still keeps null-id rows as singleton clusters " +
      "(unchanged r12 contract)") {
    val r = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.8,
      maxBucket = 64).collect()
    val nullRows = r.filter(_.isNullAt(r.head.fieldIndex("doc_id")))
    assert(nullRows.length == 1 &&
      nullRows.head.getLong(nullRows.head.fieldIndex("n_dropped")) == 0L)
  }
}
