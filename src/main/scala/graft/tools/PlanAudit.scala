package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans for the headline queries and flag
  * scale anti-patterns (cartesian products, nested-loop joins,
  * filter-pushdown misses). Not library code. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q_filter", "q_join_multi", "q_asof_join", "q_asof_right",
        "q_window_rank", "q_dedup_minhash", "q_dedup_ngram", "q_dedup_embed",
        "q_dedup_simhash", "q_embed_ann", "q_embed_knn", "q_multimodal_decode",
        // round-3 additions
        "q_decontaminate", "q_sample_hash", "q_sample_stratified", "q_pack",
        "q_chunk", "q_text_repetition", "q_delta_scan", "q_iceberg_scan",
        "q_multimodal_wav",
        // round-3 continuation additions
        "q_bpe_roundtrip", "q_text_lm", "q_dedup_semantic", "q_shuffle",
        "q_url_filter", "q_decontaminate_bloom", "q_mix_tokens",
        "q_multimodal_avi", "q_delta_roundtrip", "q_iceberg_roundtrip",
        "q_pipeline_prepare", "q_profile_sketch", "q_text_gopher",
        // round-4 additions
        "q_cube", "q_rollup", "q_grouping_sets", "q_range_rule",
        "q_dedup_paragraph", "q_text_lm_filter", "q_split_corpus",
        "q_asof_full", "q_union_all", "q_unnest_longer",
        // round-4 continuation additions
        "q_tpch_q3", "q_tpch_q5", "q_tpch_q10", "q_embed_quant",
        "q_dedup_spans", "q_text_lm_backoff", "q_vocab_topk",
        "q_zorder", "q_url_etld",
        // round-4 continuation: the completed TPC-H suite
        "q_tpch_q1", "q_tpch_q2a", "q_tpch_q4a", "q_tpch_q6", "q_tpch_q7",
        "q_tpch_q8", "q_tpch_q9a", "q_tpch_q11a", "q_tpch_q12a",
        "q_tpch_q13", "q_tpch_q14", "q_tpch_q15", "q_tpch_q16a",
        "q_tpch_q17", "q_tpch_q19", "q_tpch_q20a", "q_tpch_q21a",
        "q_tpch_q22a",
        // round-4 continuation: media near-dup signatures
        "q_image_phash", "q_image_dups", "q_audio_fp", "q_video_phash",
        // round-4 resumed: full Gopher repetition roll-up, distributed
        // WARC parse, DSIR scoring, perplexity buckets (near-dup ingest
        // audited via its spec — it writes temp Delta state per run)
        "q_rep_gopher", "q_warc", "q_dsir", "q_ppl_bucket", "q_html_extract",
        "q_pipeline_crawl", "q_robots", "q_url_canon", "q_asof_tolerance",
        // round-4 cont.: graph ranks (iterative — audits the FINAL
        // round's plan shape), PQ encode+ADC, prefix similarity join,
        // harmonic centrality (rollup_incr audited via RollupSpec —
        // it writes temp Delta state per run)
        "q_pagerank", "q_harmonic", "q_embed_pq", "q_simjoin",
        // round-5 additions: JDBC round trip (partitioned scan — the
        // PlanLint single-partition detector covers the dev-time
        // check), NB langid inference + lang-keyed profile, event
        // analytics, temperature mixing, shard export, objectives
        "q_jdbc_scan", "q_text_langid2", "q_langid_profile",
        "q_sessionize_batch", "q_funnel", "q_funnel_report",
        "q_retention", "q_mix_temperature", "q_token_shards",
        "q_span_corrupt", "q_fim", "q_text_badwords", "q_embed_maxsim",
        "q_pipeline_objectives", "q_delta_zorder", "q_delta_skip",
        "q_pipeline_multilingual", "q_embed_recall")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // a BroadcastNestedLoopJoin against a ONE-ROW side is the correct
    // plan for scalar-context joins (TPC-H scalar thresholds, the
    // broadcast weight/model rows) — not a scale risk; the audit
    // reports it as `1row-bnlj` instead of a red flag
    val oneRowBnlj = Set("q_tpch_q11a", "q_tpch_q20a", "q_tpch_q22a", "q_dsir",
      "q_pagerank") // dangling-mass share: one-row aggregate broadcast
    names.foreach { n =>
      graft.SparkEntry.queries.get(n).foreach { fn =>
        val df = fn(spark, sf)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" ->
            (plan.contains("BroadcastNestedLoopJoin") && !oneRowBnlj(n)),
          "1row-bnlj" ->
            (plan.contains("BroadcastNestedLoopJoin") && oneRowBnlj(n)),
          "PushedFilters_missing" ->
            (plan.contains("PushedFilters: []") && n.startsWith("q_filter")))
          .collect { case (f, true) => f }
        val nExchange = "Exchange".r.findAllIn(plan).length
        val nWscg = "WholeStageCodegen".r.findAllIn(plan).length
        println(s"### $n exchanges=$nExchange wscg=$nWscg flags=${flags.mkString(",")}")
        if (sys.env.contains("PLAN_AUDIT_FULL")) println(plan)
      }
    }
    spark.stop()
  }
}
