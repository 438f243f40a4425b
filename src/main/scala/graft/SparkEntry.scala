package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every key in `queries` has a matching entry in `oracleSql` unless the
  * operator is not SQL-expressible (then the driver records a rows-only
  * check). Column names/aliases match between the two by construction.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q2TopRevenue(Tables(spark, "/root/testdata/sf0.001"))

  private def q(f: Tables => DataFrame): (SparkSession, String) => DataFrame =
    (spark, dir) => f(Tables(spark, dir))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q(Relational.q1PricingSummary),
    "q2_top_revenue"     -> q(Relational.q2TopRevenue),
    "q3_rollup_acctbal"  -> q(Relational.q3RollupAcctbal),
    "q4_semi_join"       -> q(Relational.q4SemiJoin),
    "q5_anti_join"       -> q(Relational.q5AntiJoin),
    "q6_window_topn"     -> q(Relational.q6WindowTopN),
    "q7_distinct_agg"    -> q(Relational.q7DistinctAgg),
    "q8_running_window"  -> q(Relational.q8RunningWindow),
    "q9_sessionize"      -> q(Relational.q9Sessionize),
    "q10_json_extract"   -> q(Relational.q10JsonExtract),
    "q11_scalar_subquery" -> q(Relational.q11ScalarSubquery),
    "q12_set_ops"        -> q(Relational.q12SetOps),
    "q13_pivot"          -> q(Relational.q13Pivot),
    "q14_quantiles"      -> q(Relational.q14Quantiles(_)),
    "q14_quantiles_approx" -> q(Relational.q14Quantiles(_, approx = true)),
    "q15_cube"           -> q(Relational.q15Cube),
    "q16_sketches"       -> q(Relational.q16Sketches),
    "q17_asof_join"      -> q(Relational.q17AsofJoin),
    "q18_range_join"     -> q(Relational.q18RangeJoin),
    "q19_kmv_sketch"     -> q(Relational.q19KmvSketch),
    "q20_salted_join"    -> q(Relational.q20SaltedJoin(_)),
    "q21_bottomk_quantiles" -> q(Relational.q21BottomkQuantiles(_)),
    "q22_cms_freq"       -> q(Relational.q22CmsFreq(_)),
    "q23_table_profile"  -> q(Relational.q23TableProfile(_)),
    "q23_profile_approx" -> q(Relational.q23TableProfile(_, approx = true)),
    "q24_gap_fill"       -> q(Relational.q24GapFill(_)),
    "q25_grouping_sets"  -> q(Relational.q25GroupingSets),
    "r1_classify_files"  -> q(Ingest.r1ClassifyFiles),
    "r2_frontmatter"     -> q(Ingest.r2Frontmatter),
    "r3_strip_fence"     -> q(Ingest.r3StripFence),
    "r4_chunk_sliding"   -> q(Ingest.r4ChunkSliding(_)),
    "r12_notebook_cells" -> q(Ingest.r12NotebookCells),
    "r16_llm_rewrite"    -> q(Ingest.r16LlmRewrite(_)),
    "r21_zip_ingest"     -> q(Ingest.r21ZipIngest),
    "r5_tokenize_tf"     -> q(Search.r5TokenizeTf),
    "r6_doc_freq"        -> q(Search.r6DocFreq),
    "r7_tfidf_search"    -> q(Search.r7TfidfSearch),
    "r8_bm25_search"     -> q(Search.r8Bm25Search),
    "r9_filter_boost_search" -> q(Search.r9FilterBoostSearch),
    "r13_search_query_string" -> q(Search.r13SearchQueryString),
    "r18_hybrid_rrf"     -> q(Search.r18HybridRrf(_)),
    "r19_search_eval"    -> q(Search.r19SearchEval(_)),
    "r15_vocab_build"    -> q(Search.r15VocabBuild(_)),
    "r17_bpe_train"      -> q(Search.r17BpeTrain(_)),
    "t14_bpe_encode"     -> q(Search.t14BpeEncode(_)),
    "r10_eval_pass_rates" -> q(EvalMetrics.r10EvalPassRates),
    "r11_eval_sample"     -> q(EvalMetrics.r11EvalSample(_)),
    "r14_conversation_stats" -> q(EvalMetrics.r14ConversationStats),
    "d1_dedup_exact"      -> q(Dedup.d1DedupExact),
    "d2_ngram_jaccard"    -> q(Dedup.d2NgramJaccard(_)),
    "d3_minhash_lsh"      -> q(Dedup.d3MinhashLsh(_)),
    "d4_simhash"          -> q(Dedup.d4Simhash(_)),
    "d5_embedding_neardup" -> q(Dedup.d5EmbeddingNeardup(_)),
    "d10_group_split"     -> q(Dedup.d10GroupSplit(_)),
    "d11_overlap_scrub"   -> q(Dedup.d11OverlapScrub(_)),
    "d6_dedup_groups"     -> q(Dedup.d6DedupGroups(_)),
    "d7_decontaminate"    -> q(Dedup.d7Decontaminate(_)),
    "d12_bloom_decontaminate" -> q(Dedup.d12BloomDecontaminate(_)),
    "d13_dedup_keep_best" -> q(Dedup.d13DedupKeepBest(_)),
    "d14_selfrep_scrub"  -> q(Dedup.d14SelfrepScrub(_)),
    "d8_line_dedup"       -> q(Dedup.d8LineDedup(_)),
    "d9_semdedup"         -> q(Dedup.d9Semdedup(_)),
    "t1_langid"           -> q(TextAnalysis.t1Langid),
    "t2_quality_score"    -> q(TextAnalysis.t2QualityScore),
    "t3_token_count"      -> q(TextAnalysis.t3TokenCount),
    "t4_fingerprint"      -> q(TextAnalysis.t4Fingerprint),
    "t5_pii_scrub"        -> q(TextAnalysis.t5PiiScrub),
    "t6_sequence_pack"    -> q(TextAnalysis.t6SequencePack(_)),
    "t7_mixture_sample"   -> q(TextAnalysis.t7MixtureSample),
    "t8_repetition"       -> q(TextAnalysis.t8Repetition),
    "t9_gopher_filters"   -> q(TextAnalysis.t9GopherFilters),
    "t10_bigram_counts"   -> q(TextAnalysis.t10BigramCounts(_)),
    "t11_tokenizer_encode" -> q(TextAnalysis.t11TokenizerEncode(_)),
    "t12_span_corruption"  -> q(TextAnalysis.t12SpanCorruption(_)),
    "t13_perplexity"       -> q(TextAnalysis.t13Perplexity),
    "t15_shuffle_shard"    -> q(TextAnalysis.t15ShuffleShard(_)),
    "t16_ccnet_buckets"    -> q(TextAnalysis.t16CcnetBuckets),
    "t17_mixture_weights"  -> q(TextAnalysis.t17MixtureWeights(_)),
    "t18_dsir_select"      -> q(TextAnalysis.t18DsirSelect(_)),
    "s1_ann_bruteforce"   -> q(Ann.s1AnnBruteforce(_)),
    "s2_ann_lsh"          -> q(Ann.s2AnnLsh(_)),
    "s3_ann_ivf"          -> q(Ann.s3AnnIvf(_)),
    "s5_pq_encode"        -> q(Ann.s5PqEncode(_)),
    "st11_stream_pq_encode" -> q(graft.streaming.Streams.st11StreamPqEncode(_)),
    "st12_stream_overlap_scrub" -> q(graft.streaming.Streams.st12StreamOverlapScrub(_)),
    "s6_pq_search"        -> q(Ann.s6PqSearch(_)),
    "s4_knn_join"         -> q(Ann.s4KnnJoin(_)),
    "s7_mmr_rerank"       -> q(Ann.s7MmrRerank(_)),
    "s8_ann_recall"       -> q(Ann.s8AnnRecall(_)),
    "s9_ivfpq_search"     -> q(Ann.s9IvfPqSearch(_)),
    "s10_pq_residual"     -> q(Ann.s10PqResidual(_)),
    "s11_ivfpq_rerank"    -> q(Ann.s11IvfPqRerank(_)),
    "s12_sq_encode"       -> q(Ann.s12SqEncode(_)),
    "s13_sq_search"       -> q(Ann.s13SqSearch(_)),
    "s14_ivfsq_search"    -> q(Ann.s14IvfSqSearch(_)),
    "s15_sq_perlist"      -> q(Ann.s15SqPerList(_)),
    "s16_ivfsq_perlist_search" -> q(Ann.s16IvfSqPerlistSearch(_)),
    "s17_bq_search"       -> q(Ann.s17BqSearch(_)),
    "s18_mrl_search"      -> q(Ann.s18MrlSearch(_)),
    "s19_filtered_ann"    -> q(Ann.s19FilteredAnn(_)),
    "s20_funnel_search"   -> q(Ann.s20FunnelSearch(_)),
    "st17_ann_recall_maintain" ->
      q(graft.streaming.Streams.st17AnnRecallMaintain(_)),
    "r20_rm3_expand"      -> q(Search.r20Rm3Expand(_)),
    "e1_embed_batch"      -> q(Embed.e1EmbedBatch(_)),
    "p1_curation_funnel"  -> q(Pipeline.p1CurationFunnel(_)),
    "p2_rag_ingest"       -> q(Pipeline.p2RagIngest(_)),
    "p3_rag_serve"        -> q(Pipeline.p3RagServe(_)),
    "r19_staged_eval"     -> q(Pipeline.r19StagedEval(_)),
    "p3_dense_sq8"        -> q(Pipeline.p3DenseSq8(_)),
    "p3_dense_pq"         -> q(Pipeline.p3DensePq(_)),
    "p3_dense_rerank"     -> q(Pipeline.p3DenseRerank(_)),
    "p3_dense_pq_rerank"  -> q(Pipeline.p3DensePqRerank(_)),
    "p5_index_remove"     -> q(Pipeline.p5IndexRemove(_)),
    "p4_context_pack"     -> q(Pipeline.p4ContextPack(_)),
    "m6_patch_budget"     -> q(Multimodal.m6PatchBudget(_)),
    "m1_binary_meta"      -> q(Multimodal.m1BinaryMeta),
    "m2_feature_stub"     -> q(Multimodal.m2FeatureStub(_)),
    "m4_paired_sample"    -> q(Multimodal.m4PairedSample(_)),
    "m5_binary_dedup"     -> q(Multimodal.m5BinaryDedup(_)),
    "m3_frame_sample"     -> q(Multimodal.m3FrameSample(_)),
    "io1_jsonl_roundtrip" -> q(graft.sources.Io.io1JsonlRoundtrip),
    "io2_csv_roundtrip"   -> q(graft.sources.Io.io2CsvRoundtrip),
    "io3_partitioned_prune" -> q(graft.sources.Io.io3PartitionedPrune),
    "io4_upsert_merge"    -> q(graft.sources.Io.io4UpsertMerge),
    "io5_compaction"      -> q(graft.sources.Io.io5Compaction(_)),
    "io6_schema_evolution" -> q(graft.sources.Io.io6SchemaEvolution),
    "io8_change_feed"     -> q(graft.sources.Io.io8ChangeFeed),
    "io7_time_travel"     -> q(graft.sources.Io.io7TimeTravel),
    "io9_zorder"          -> q(graft.sources.Io.io9Zorder),
    "io10_stats_manifest" -> q(graft.sources.Io.io10StatsManifest),
    "io11_vacuum"         -> q(graft.sources.Io.io11Vacuum),
    "io12_optimize_compact" -> q(graft.sources.Io.io12OptimizeCompact(_)),
    "io13_shallow_clone"  -> q(graft.sources.Io.io13ShallowClone),
    "io14_check_constraint" -> q(graft.sources.Io.io14CheckConstraint),
    "io15_expectations"   -> q(graft.sources.Io.io15Expectations),
    "io16_quarantine_replay" -> q(graft.sources.Io.io16QuarantineReplay),
    "io17_restore"        -> q(graft.sources.Io.io17Restore),
    "st1_stream_windowed" -> q(graft.streaming.Streams.st1StreamWindowed),
    "st2_stream_sessionize" -> q(graft.streaming.Streams.st2StreamSessionize),
    "st3_stream_late_append" -> q(graft.streaming.Streams.st3StreamLateAppend),
    "st4_stream_dedup"    -> q(graft.streaming.Streams.st4StreamDedup(_)),
    "st5_stream_embed_dedup" -> q(graft.streaming.Streams.st5StreamEmbedDedup(_)),
    "st6_stream_stream_join" -> q(graft.streaming.Streams.st6StreamStreamJoin),
    "st7_stream_pack"     -> q(graft.streaming.Streams.st7StreamPack(_)),
    "st8_stream_line_dedup" -> q(graft.streaming.Streams.st8StreamLineDedup(_)),
    "st9_stream_decontaminate" -> q(graft.streaming.Streams.st9StreamDecontaminate(_)),
    "st10_stream_file_sink" -> q(graft.streaming.Streams.st10StreamFileSink),
    "st13_stream_group_maintain" -> q(graft.streaming.Streams.st13StreamGroupMaintain(_)),
    "st14_stream_index_maintain" -> q(graft.streaming.Streams.st14StreamIndexMaintain),
    "st15_stream_ann_maintain" -> q(graft.streaming.Streams.st15StreamAnnMaintain(_)),
    "st20_ann_migrate"    -> q(graft.streaming.Streams.st20AnnMigrate(_)),
    "st16_stream_manifest_sink" -> q(graft.streaming.Streams.st16StreamManifestSink),
    "st18_stream_cdc_follow" -> q(graft.streaming.Streams.st18StreamCdcFollow),
    "st19_stream_expectations" -> q(graft.streaming.Streams.st19StreamExpectations),
    "st21_backfill_tail"  -> q(graft.streaming.Streams.st21BackfillThenTail),
    "st22_stream_curate"  -> q(graft.streaming.Streams.st22StreamCurate),
    "st23_stream_embed"   -> q(graft.streaming.Streams.st23StreamEmbed(_)),
    "st24_stream_zip_ingest" -> q(graft.streaming.Streams.st24StreamZipIngest),
    "st25_index_forget"   -> q(graft.streaming.Streams.st25IndexForget)
  )

  /** DuckDB-equivalent SQL per query key (same aliases, same float
    * policy). Keys absent here get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Ingest.oracle ++ Search.oracle ++
      EvalMetrics.oracle ++ Dedup.oracle ++ TextAnalysis.oracle ++
      Ann.oracle ++ Multimodal.oracle ++ graft.sources.Io.oracle ++
      graft.streaming.Streams.oracle ++ Pipeline.oracle ++ Embed.oracle ++
      Map(
        // the streaming twins equal their batch operators under
        // exactly-once arrivals — the batch oracles gate them verbatim
        "st22_stream_curate" -> Pipeline.oracle("p1_curation_funnel"),
        "st23_stream_embed"  -> Embed.oracle("e1_embed_batch"),
        // each archive lands exactly once across micro-batches, so
        // the accumulated walk report equals the batch walk — r21's
        // oracle verbatim
        "st24_stream_zip_ingest" -> Ingest.oracle("r21_zip_ingest"),
        // the forget stream's final towers equal a rebuild that never
        // saw the victims (set difference commutes; re-removal
        // no-ops), so the reduced-corpus serve gates it exactly
        "st25_index_forget" -> Pipeline.st25Sql)
}
