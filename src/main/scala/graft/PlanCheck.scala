package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality inspector: prints formatted physical plans for
  * representative queries so scan pruning (ReadSchema), pushed filters,
  * join strategies (BHJ vs SMJ), and whole-stage-codegen spans can be
  * audited. Run: `sbt "runMain graft.PlanCheck [names...]"`.
  */
object PlanCheck {

  /** The pinned plan-contract rows. Manual audits (`runMain
    * graft.PlanCheck`) print these; PlanGuardSpec (r20, VERDICT r19
    * #1) ASSERTS their contracts inside `sbt test`, so a refactor or
    * Spark upgrade that silently flips one to a SortMergeJoin/UDF/
    * cartesian fails the suite instead of waiting for the
    * end-of-round human audit. */
  val PinnedRows: Seq[String] =
    Seq("p6_filter_range", "j1_left_join", "j3_broadcast_dim_join",
        "a1_groupby_count", "o2_multisort_limit", "x_dedup_ngram_jaccard",
        "x_sim_cosine_topk", "x_events_asof", "x_events_range_count",
        "x_sim_lsh_ann", "x_sample_hash", "x_text_contamination",
        "x_sample_weighted", "x_stats_key_skew", "j11_full_outer",
        "x_cdc_snapshot_diff", "x_events_attribution",
        // the 5 most expensive gate queries (BENCH_r08) — audit these
        // first when a round's bench regresses
        "x_pipeline_curation", "x_dedup_clusters", "x_graph_pagerank",
        "x_corpus_split_safe", "q0_spine",
        // r9 additions: the prefix-filtered exact join + the
        // one-shuffle corpus profiles
        "x_dedup_jaccard_prefix", "x_corpus_oov_rate",
        "x_corpus_length_buckets", "x_corpus_drift", "x_dedup_keep_best",
        // r9 linkage family: deletion-neighborhood fuzzy join +
        // inverted-index tf-cosine
        "x_link_edit_names", "x_link_tf_cosine",
        "x_corpus_ngram_lm", "x_corpus_diversity",
        // r9: LM-familiarity scoring join + denseId-backed shuffle
        "x_corpus_lm_score", "x_corpus_shuffle",
        // r9: contrastive-mining and label-outlier TopK paths
        "x_sim_hard_negatives", "x_sim_centroid_outliers",
        "x_eval_retrieval", "x_dedup_span_scrub",
        // r9: partition-local Gram accumulation (shuffle = P x d^2/2,
        // row-count independent) + scan-only winnowing fingerprints
        "x_sim_gram", "x_text_winnowing",
        // r9 second batch: broadcast-vocab importance scoring, one-pass
        // profiling, wedge-bounded link prediction, salted skew join
        "x_corpus_importance", "x_profile_checks", "x_profile_summary",
        "x_graph_common_neighbors", "x_join_salted",
        // r9 third batch: bounded k-core peel, session-path analytics,
        // ingest-quality baseline (the streaming drift monitor's
        // static side)
        "x_graph_kcore", "x_events_path_bigrams", "x_events_path_topk",
        "x_quality_baseline",
        // r11: artifact-loaded triangle count (scan -> wedge join, no
        // similarity subtree) — audit that the load side stays pruned
        "x_graph_triangles_indexed",
        // r13: PQ family — audit that the code-scan side never reads
        // the embedding column (ReadSchema on codes only) and the
        // IVFADC probe join partition-prunes on cell
        "x_sim_pq_topk", "x_sim_ivfpq_ann", "x_sim_pq_rerank",
        // r13: vocabulary-hoisted BPE encode (merge chain on the
        // distinct-word table, broadcast back — corpus side one scan)
        "x_corpus_bpe_encode",
        // r14: footer-answered stats — both legs must show
        // PushedAggregation (V2 default) and empty ReadSchema-ish
        // footer scans, not data-page scans
        "x_profile_footer_stats",
        // r14: BM25 family — audit that every probe join broadcasts
        // (query terms / df / stats are all quantizer-sized) and the
        // indexed probe's scan carries the static pb PartitionFilters;
        // RM3's second pass must show the same shape twice
        "x_text_bm25", "x_text_bm25_indexed", "x_text_bm25_rm3",
        "x_text_hybrid_rrf", "x_graph_ppr",
        "x_text_bm25_grown", "x_sim_ann_grown",
        // r15: as-of snapshot probe — same static-pruned shape as the
        // grown probe, df re-derived from the gen-pruned hits (one
        // extra partial agg, still broadcast-only joins)
        "x_text_bm25_asof",
        // r17: the bloom prefilter must probe through the codegen'd
        // bloom_might_contain expression (no scala-UDF boundary), and
        // the grown dedup rows must keep their static-pruned
        // broadcast-probe shape through the sidecar/store reworks
        "x_text_contamination_bloom", "x_dedup_incremental_grown",
        "x_dedup_clusters_incremental",
        // r18: host-speed calibration row — one codegen'd fold over
        // the lineitem scan + a 4-value partial agg; any join/extra
        // exchange appearing here means the row no longer measures
        // pure host CPU
        "x_calibration_fold",
        // r19: maintain-lifecycle row — the serve plan must keep the
        // grown probe's broadcast-only shape with the tombstone reads
        // (snapshot ∪ tail) feeding BROADCAST anti-joins/corrections,
        // never a shuffled join on the takedown set
        "x_text_bm25_maintained")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.core.GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else PinnedRows
    names.foreach { n =>
      println(s"\n########## $n ##########")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
