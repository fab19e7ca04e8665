// r16 optimization round: dump .explain("formatted") for the queries under
// study (sf0.1 by default — the bench SF, whose plan shapes the round's
// before/after claims cite). REPL-safe: every statement is one line
// (sbt console evaluates line by line — the multi-line builder chain
// breaks, the documented reason tools/explain_dump.scala is one-line).
// Usage: [env SPARK_GRAFT_EXPLAIN_OUT/_ONLY/_SF] sbt console < tools/explain_r16.scala
val spark2 = org.apache.spark.sql.SparkSession.builder().master("local[4]").config("spark.sql.shuffle.partitions", "4").config("spark.ui.enabled", "false").getOrCreate()
spark2.sparkContext.setLogLevel("ERROR")
graft.plans.TopK.ensurePlanning(spark2)
val sf = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SF", "/root/testdata/sf0.1")
val outDir = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_OUT", "/tmp/plans_r16")
new java.io.File(outDir).mkdirs()
val only = sys.env.get("SPARK_GRAFT_EXPLAIN_ONLY").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
val defaults = Seq("ns_similarity_pq", "ns_similarity_ivfpq", "ns_similarity_ivfpq_res", "ns_similarity_ivfpq_rerank", "ns_similarity_recall", "ns_similarity_rebuild", "ns_fuzzy_prefix_pairs", "ns_cosine_dup_pairs", "ns_cosine_dup_pairs_banded", "ns_dedup_jaccard", "ns_dedup_minhash", "ns_dedup_minhash_salted", "ns_dedup_containment", "ns_dedup_clusters", "ns_dedup_keep", "ns_dedup_best", "ns_dedup_soft", "ns_dedup_impact", "ns_dedup_cluster_sizes", "ns_near_dedup_replay", "ns_shard_seq_fill", "ns_shard_manifest", "ns_training_mix", "ns_dedup_threshold_sweep", "ns_dup_cross_source", "ns_curation_pipeline", "ns_bpe_train", "agg_countmin", "ns_token_budget_alloc")
val names = only.map(_.toSeq.sorted).getOrElse(defaults)
names.foreach { n => val txt = graft.SparkEntry.queries(n)(spark2, sf).queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode); java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/$n.txt"), txt.getBytes("UTF-8")); println(s"@@@WROTE $n"); spark2.catalog.clearCache() }
println("@@@DONE")
sys.exit(0)
