package graft

/** Prints formatted physical plans for the headline queries — the
  * "is this the plan you'd want at 100 TB" audit: pushed filters, pruned
  * read schemas, broadcast joins on dims, wide WholeStageCodegen spans.
  *
  * `sbt "runMain graft.PlanAudit [sfDir] [queryName...]"`
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q03_totals_conditional", "q08_topk_other", "q13_pricing_rollup",
        "q19_minhash_lsh", "q21_ngram_jaccard", "q22_cosine_topk",
        "q25_embedding_neardups", "q26_corpus_pipeline", "q23_ann_lsh",
        "q30_vocab", "q31_chunks", "q38_decontaminate", "q40_tfidf",
        "q58_snapshot_diff", "q63_dup_spans",
        "q78_semantic_clusters", "q80_incremental_dedup",
        // round-9 headliners: the hot/cold split join, the one-pass
        // validation aggregate, PQ and IVF-PQ search, sessionization
        "q105_skew_join", "q106_validation", "q108_pq_search",
        "q109_sessionize", "q117_ivfpq_search",
        // round-11: BPE training's per-round count pass feeds a
        // chunked argmax; MJPEG-in-MP4 location is a mapPartitions
        // binary parse whose scan must prune to doc_id only
        "q113_bpe_train", "q118_mjpeg_mp4")
    val spark = graft.engine.Tables.session("local[4]", 4)
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
