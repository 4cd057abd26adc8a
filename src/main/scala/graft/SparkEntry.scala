package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * k-NN + metadata join — the reference's core flow
    * (app.py:138-160: IndexFlatIP top-5 + metadata_list lookup).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("v_knn_meta")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. relational / OLAP core
    "q1_pricing"      -> (Relational.q1Pricing _),
    "q3_topn"         -> (Relational.q3TopN _),
    "q5_multijoin"    -> (Relational.q5MultiJoin _),
    "q10_returned"    -> (Relational.q10Returned _),
    "q_semijoin"      -> (Relational.qSemiJoin _),
    "q_antijoin"      -> (Relational.qAntiJoin _),
    "q_window_topk"   -> (Relational.qWindowTopK _),
    "q_running_sum"   -> (Relational.qRunningSum _),
    "q_events_hourly" -> (Relational.qEventsHourly _),
    "q_sessionize"    -> (Relational.qSessionize _),
    "q_distinct"      -> (Relational.qDistinct _),
    "q_approx_distinct" -> (Relational.qApproxDistinct _),
    "q_approx_distinct_err" -> (Relational.qApproxDistinctErr _),
    "q_freq_items"    -> (Relational.qFreqItemsErr _),
    "q_cms_err"       -> (Relational.qCmsErr _),
    "q_rollup"        -> (Relational.qRollup _),
    "q_cube"          -> (Relational.qCube _),
    "q_events_funnel" -> (Relational.qEventsFunnel _),
    "q_asof_join"     -> (OlapExtras.qAsofJoin _),
    "q_range_join"    -> (OlapExtras.qRangeJoin _),
    "q_pivot"         -> (OlapExtras.qPivot _),
    "q_percentiles"   -> (OlapExtras.qPercentiles _),
    "q_approx_quantiles" -> (OlapExtras.qApproxQuantiles _),
    "q_approx_quantiles_err" -> (OlapExtras.qApproxQuantilesErr _),
    "q_salted_agg"    -> (OlapExtras.qSaltedAgg _),
    "q_salted_join"   -> (OlapExtras.qSaltedJoin _),
    "q_grouping_sets" -> (OlapExtras.qGroupingSets _),
    "q_window_funcs"  -> (OlapExtras.qWindowFuncs _),
    "q_exists_subquery" -> (OlapExtras.qExistsSubquery _),
    "q_setops"        -> (OlapExtras.qSetops _),
    "q_json_extract"  -> (OlapExtras.qJsonExtract _),
    "q_histogram"     -> (OlapExtras.qHistogram _),
    "q_corr_stats"    -> (OlapExtras.qCorrStats _),
    "q_dedup_latest"  -> (OlapExtras.qDedupLatest _),
    "q_scd2"          -> (OlapExtras.qScd2 _),
    "q_window_range"  -> (OlapExtras.qWindowRange _),
    "q_multi_distinct" -> (OlapExtras.qMultiDistinct _),
    // B. vector search
    "v_norm"          -> (Knn.vNorm _),
    "v_knn_exact"     -> (Knn.vKnnExact _),
    "v_knn_meta"      -> (Knn.vKnnMeta _),
    "v_knn_classify"  -> (Knn.vKnnClassify _),
    "v_pairs_near"    -> (Knn.vPairsNear _),
    "v_ann_lsh"       -> (Knn.vAnnLsh _),
    "v_ivf"           -> (Knn.vIvf _),
    "v_ivf_store"     -> (Knn.vIvfStore _),
    "v_flat_store"    -> (Knn.vFlatStore _),
    "v_pq_store"      -> (Knn.vPqStore _),
    "v_centroid_label" -> (Knn.vCentroidLabel _),
    "v_range_search"  -> (Knn.vRangeSearch _),
    "v_knn_l2"        -> (Knn.vKnnL2 _),
    "v_mips"          -> (Knn.vMips _),
    "v_knn_custom"    -> (Knn.vKnnCustom _),
    "v_pq"            -> (Knn.vPq _),
    "v_opq"           -> (Knn.vOpq _),
    "v_opq_recall"    -> (Knn.vOpqRecall _),
    "v_matryoshka"    -> (Knn.vMatryoshka _),
    "v_matryoshka_recall" -> (Knn.vMatryoshkaRecall _),
    "v_bq"            -> (Knn.vBq _),
    "v_bq_recall"     -> (Knn.vBqRecall _),
    "v_bq_store"      -> (Knn.vBqStore _),
    "v_filtered_store" -> (Knn.vFilteredStore _),
    "v_opq_store"     -> (Knn.vOpqStore _),
    "v_ivf_pq"        -> (Knn.vIvfPq _),
    "v_recall"        -> (Knn.vRecall _),
    "v_ivf_recall"    -> (Knn.vIvfRecall _),
    "v_pq_recall"     -> (Knn.vPqRecall _),
    "v_ivf_pq_recall" -> (Knn.vIvfPqRecall _),
    "v_sql_surface"   -> (Knn.vSqlSurface _),
    "v_filtered_knn"  -> (Knn.vFilteredKnn _),
    "v_knn_per_label" -> (Knn.vKnnPerLabel _),
    "v_multiprobe"    -> (Knn.vMultiprobe _),
    "v_index_stats"   -> (Knn.vIndexStats _),
    "v_scalar_quant"  -> (Knn.vScalarQuant _),
    "v_rrf_fusion"    -> (Knn.vRrfFusion _),
    "v_refine"        -> (Knn.vRefine _),
    // C. dedup
    "d_exact"         -> (Dedup.dExact _),
    "d_minhash"       -> (Dedup.dMinhash _),
    "d_minhash_pairs" -> (Dedup.dMinhashPairs _),
    "d_simhash"       -> (Dedup.dSimhash _),
    "d_simhash_pairs" -> (Dedup.dSimhashPairs _),
    "d_jaccard"       -> (Dedup.dJaccard _),
    "d_embed_near"    -> (Dedup.dEmbedNear _),
    "d_ngram_jacc"    -> (Dedup.dNgramJacc _),
    "d_components"    -> (Dedup.dComponents _),
    "d_sample_stratified" -> (Dedup.dSampleStratified _),
    "d_cdc_chunks"    -> (Dedup.dCdcChunks _),
    "d_chunk_dedup"   -> (Dedup.dChunkDedup _),
    "d_pipeline"      -> (Dedup.dPipeline _),
    "d_bloom"         -> (Dedup.dBloom _),
    "d_span_dedup"    -> (Dedup.dSpanDedup _),
    "d_semdedup"      -> (Dedup.dSemdedup _),
    "d_source_cap"    -> (Dedup.dSourceCap _),
    // D. text analysis
    "t_tokens"        -> (TextAnalysis.tTokens _),
    "t_pack"          -> (TextAnalysis.tPack _),
    "t_decontaminate" -> (TextAnalysis.tDecontaminate _),
    "t_quality"       -> (TextAnalysis.tQuality _),
    "t_langid"        -> (TextAnalysis.tLangid _),
    "t_fingerprint"   -> (TextAnalysis.tFingerprint _),
    "t_ngrams"        -> (TextAnalysis.tNgrams _),
    "t_rep_ngrams"    -> (TextAnalysis.tRepNgrams _),
    "t_gopher_quality" -> (TextAnalysis.tGopherQuality _),
    "t_hash_embed"    -> (TextAnalysis.tHashEmbed _),
    "t_curation_pipeline" -> (TextAnalysis.tCurationPipeline _),
    "t_bpe_tokens"    -> (TextAnalysis.tBpeTokens _),
    "t_tfidf"         -> (TextAnalysis.tTfidf _),
    "t_pipeline"      -> (TextAnalysis.tPipeline _),
    "t_pii_redact"    -> (TextAnalysis.tPiiRedact _),
    "t_readability"   -> (TextAnalysis.tReadability _),
    "t_entropy"       -> (TextAnalysis.tEntropy _),
    "t_bigram_lm"     -> (TextAnalysis.tBigramLm _),
    "t_ppl_filter"    -> (TextAnalysis.tPplFilter _),
    // E. multimodal (stubs per SURVEY §2.E — no image libs in env)
    "m_bbox"          -> (ImagePipeline.mBbox _),
    "m_fake_embed"    -> (ImagePipeline.mFakeEmbed _),
    "m_clahe"         -> (ImagePipeline.mClahe _),
    "m_embed_scaffold" -> (BatchInference.mEmbedScaffold _),
    "m_detect"        -> (BatchInference.mDetect _),
    "m_pipeline"      -> (BatchInference.mPipeline _),
    "m_pipeline_ann"  -> (BatchInference.mPipelineAnn _),
    "m_decode_lut"    -> (ImageDecode.mDecodeLut _),
    "m_decode_blur"   -> (ImageDecode.mDecodeBlur _),
    "m_gamma_lut"     -> (ImagePipeline.mGammaLut _),
    "m_frame_sample"  -> (ImagePipeline.mFrameSample _),
    "m_clahe_hist"    -> (ImagePipeline.mClaheHist _),
    "m_gauss_blur"    -> (ImagePipeline.mGaussBlur _),
    "m_audio_energy"  -> (ImagePipeline.mAudioEnergy _),
    "m_phash"         -> (ImagePipeline.mPhash _),
    "m_phash_pairs"   -> (ImagePipeline.mPhashPairs _),
    "m_resize"        -> (ImagePipeline.mResize _),
    // F. streaming (batch-equivalent of the streaming window agg)
    "s_window_agg"    -> (graft.streaming.EventStreams.sWindowAggBatch _),
    "s_sliding_agg"   -> (graft.streaming.EventStreams.sSlidingAggBatch _),
    "s_interval_join" -> (graft.streaming.EventStreams.streamStreamJoinBatch _),
    // G. source/sink formats (round-trip fidelity, oracle vs parquet)
    "src_csv"         -> (graft.sources.Formats.srcCsv _),
    "src_json"        -> (graft.sources.Formats.srcJson _),
    "src_orc"         -> (graft.sources.Formats.srcOrc _),
    "src_bucketed"    -> (graft.sources.Formats.srcBucketedJoin _),
    "src_partitioned" -> (graft.sources.Formats.srcPartitioned _),
    "src_zorder"      -> (graft.sources.Formats.srcZorder _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (kmeans-iterative or
    * HLL-approximate ops) get the driver's weaker rows-only check.
    */
  def oracleSql: Map[String, String] = Oracles.all
}
