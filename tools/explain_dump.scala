val spark2 = org.apache.spark.sql.SparkSession.builder().master("local[4]").config("spark.sql.shuffle.partitions", "4").config("spark.ui.enabled", "false").getOrCreate()
spark2.sparkContext.setLogLevel("ERROR")
graft.plans.TopK.ensurePlanning(spark2)
val sf = "/root/testdata/sf0.001"
val names = Seq("s6_scan_project", "q1_agg", "join_broadcast_star", "w_row_number_topk", "w_topk_heap", "w_topk_global", "ns_dedup_exact", "ns_dsir_score", "t_cdc_upsert", "ns_paragraph_dedup", "ns_cosine_dup_pairs_banded", "ns_fuzzy_prefix_pairs", "ns_lm_perplexity", "ns_token_count_bpe", "ns_dedup_minhash_salted", "s_pivot_specs_wide", "ns_seq_packing_bpe", "ns_similarity_pq", "ns_similarity_ivfpq", "ns_similarity_ivfpq_res", "ns_quality_lr", "ns_dup_span_removal", "ns_dup_ngram_spans", "ns_char_entropy", "ns_domain_cap", "t_stream_left_outer", "l_snaplake_timetravel", "ns_cosine_dup_pairs", "l_snaplake_bloom")
names.foreach { n => println(s"@@@QUERY $n"); println(graft.SparkEntry.queries(n)(spark2, sf).queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)); spark2.catalog.clearCache() }
println("@@@DONE")
sys.exit(0)
