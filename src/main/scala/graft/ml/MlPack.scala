package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.QueryPack
import graft.functions.PolyFingerprint

/** North-star training-data-pipeline operators as driver-contract queries
  * (dedup, similarity search, text analysis, multimodal plumbing).
  * SQL-expressible ops carry DuckDB oracles; the probabilistic ones
  * (MinHash/LSH/SimHash) are deterministic under their fixed seeds and are
  * parity-tested against their exact counterparts in ScalaTest.
  */
object MlPack extends QueryPack {

  private val QueryVecIds: Seq[Long] = 0L to 7L

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: content-hash groups.
    "ns_dedup_exact" -> ((s, d) => {
      Dedup.exactDupGroups(Tables.documents(s, d))
        .orderBy(col("content_hash"))
    }),

    // Exact n-gram Jaccard near-dup pairs via the CAPPED inverted shingle
    // index (stop-shingle df cap, Dedup.ScoredDfCap): candidate volume per
    // shingle is bounded at C(cap,2) regardless of corpus size — the
    // 100-TB-safe form is the scored default, not a parity-tested spare.
    // Verification is exact array_intersect Jaccard over candidates that
    // share a RARE (df <= cap) shingle — equal to the exact pair set
    // whenever every qualifying pair shares one, which holds up to dup
    // clusters of cap size; pairs whose EVERY shared shingle is hot (a
    // >cap verbatim/near-verbatim cluster) are the cap's documented
    // misses, and the minhash tier is their recall path (identical
    // signatures bucket such clusters regardless of df — ScaleSpec pins
    // both sides of this division). The oracle replays the SAME cap
    // (jaccardCappedCtes), so scored parity holds on any data; ScaleSpec
    // pins corpus-common shingles out of the candidate exchange.
    "ns_dedup_jaccard" -> ((s, d) => {
      Dedup.jaccardPairsCapped(Tables.documents(s, d), 0.5, Dedup.ScoredDfCap)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // MinHash + LSH + exact verify. Exact-Jaccard verification makes the
    // output equal the exact pair set (band miss at j>=0.5 is a ~1e-8
    // event), so the ns_dedup_jaccard oracle SQL applies verbatim; MlSpec
    // additionally proves the identity in-process.
    "ns_dedup_minhash" -> ((s, d) => {
      Dedup.minhashDupPairs(Tables.documents(s, d), 0.5)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Same pipeline through the SKEW-HARDENED candidate generator
    // (Skew.saltedSelfJoinPairs over g=4 salt cells): the scored proof
    // that the hot-bucket escape hatch is output-identical end to end,
    // not just in ScaleSpec's synthetic fixture. Same oracle as
    // ns_dedup_minhash by the same argument.
    "ns_dedup_minhash_salted" -> ((s, d) => {
      Dedup.minhashDupPairsSalted(Tables.documents(s, d), 0.5, g = 4)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Duplicate clusters: connected components over the near-dup pair
    // graph (min-doc_id label per component) — the "pick one canonical
    // doc per duplicate set" step a dedup pipeline actually ships.
    // Pair input comes from the capped generator (same scale rationale
    // and same output as ns_dedup_jaccard).
    "ns_dedup_clusters" -> ((s, d) => {
      Dedup.dupClusters(
          Dedup.jaccardPairsCapped(Tables.documents(s, d), 0.5,
            Dedup.ScoredDfCap))
        .orderBy(col("doc_id"))
    }),

    // Per-source dedup IMPACT over the same cluster tier (r16): docs
    // and tokens the keep-min rule removes per source, next to the
    // source totals — the feedback number a mixture plan re-weights on
    // (duplicate-heavy source = boilerplate/syndication signal). See
    // Dedup.dedupImpact for the graph-sized broadcast shape.
    "ns_dedup_impact" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.dedupImpact(docs, Dedup.dupClusters(
        Dedup.jaccardPairsCapped(docs, 0.5, Dedup.ScoredDfCap)))
    }),

    // Duplicate-cluster size histogram over the same capped pair tier —
    // the dedup dashboard's shape statistic (pairs vs deep syndication
    // chains); size 1 = docs untouched by the near-dup graph.
    "ns_dedup_cluster_sizes" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.clusterSizeHistogram(docs,
        Dedup.dupClusters(
          Dedup.jaccardPairsCapped(docs, 0.5, Dedup.ScoredDfCap)))
    }),

    // Asymmetric CONTAINMENT dedup (quote-inclusion / sub-document
    // detection): |sh(a) ∩ sh(b)| / |sh(a)| ≥ 0.8 over ordered pairs —
    // a short doc fully embedded in a long one scores 1.0 here but
    // arbitrarily low Jaccard, so the symmetric tiers never see it.
    // Same capped inverted index and scale shape as ns_dedup_jaccard.
    "ns_dedup_containment" -> ((s, d) => {
      Dedup.containmentPairs(Tables.documents(s, d), 0.8, Dedup.ScoredDfCap)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Retention: full corpus minus non-canonical duplicate-cluster members.
    "ns_dedup_keep" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.keepCanonical(docs,
          Dedup.dupClusters(
            Dedup.jaccardPairsCapped(docs, 0.5, Dedup.ScoredDfCap)))
        .orderBy(col("doc_id"))
    }),

    // Quality-aware canonical per duplicate cluster: keep the member with
    // max n_chars (ties to lowest doc_id).
    "ns_dedup_best" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.keepBest(docs,
          Dedup.dupClusters(
            Dedup.jaccardPairsCapped(docs, 0.5, Dedup.ScoredDfCap)))
        .orderBy(col("cluster_id"))
    }),

    // Threshold sensitivity sweep: the 0.5-threshold exact-Jaccard pairs
    // banded by floor(jaccard*10)/10 in ONE pass — how many pairs a
    // stricter cutoff would keep, read off the same inverted-index join
    // instead of re-running per threshold (jaccard is round-6, so the
    // band boundary is ulp-safe in both engines).
    "ns_dedup_threshold_sweep" -> ((s, d) => {
      Dedup.jaccardPairsCapped(Tables.documents(s, d), 0.5, Dedup.ScoredDfCap)
        .groupBy((floor(col("jaccard") * 10) / 10).as("band"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("band"))
    }),

    // Per-source duplication inflation: raw vs distinct contents and the
    // multiplier — where the dedup budget should go.
    "ns_dup_inflation" -> ((s, d) => {
      Dedup.dupInflation(Tables.documents(s, d))
        .orderBy(col("source"))
    }),

    // Cross-source duplication matrix: near-dup pairs per unordered
    // source pair (syndication detection over the scored Jaccard tier).
    "ns_dup_cross_source" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.crossSourceDupMatrix(docs,
          Dedup.jaccardPairsCapped(docs, 0.5, Dedup.ScoredDfCap))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // Soft dedup: full corpus with 1/|cluster| training weights instead
    // of hard drops — every doc flows, duplicate clusters collectively
    // weigh one document.
    "ns_dedup_soft" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.softDedupWeights(docs,
          Dedup.dupClusters(
            Dedup.jaccardPairsCapped(docs, 0.5, Dedup.ScoredDfCap)))
        .orderBy(col("doc_id"))
    }),

    // Shingle novelty: fraction of each doc's distinct 5-gram shingles
    // first seen (min doc_id) in that doc — original vs assembled text.
    "ns_ngram_novelty" -> ((s, d) => {
      Dedup.shingleNovelty(Tables.documents(s, d))
        .orderBy(col("doc_id"))
    }),

    // Wave-sequential greedy admission — the batch twin of the streaming
    // near-dedup ingest ledger (NearDedupStreams): 3 arrival waves
    // (doc_id mod 3), admit iff no already-admitted near-dup, greedy
    // min-id within a wave. The oracle replays the identical sequential
    // greedy as a DuckDB recursive single-row fold over (wave, doc_id).
    "ns_near_dedup_replay" -> ((s, d) => {
      Dedup.sequentialAdmission(Tables.documents(s, d), 0.5, 3)
        .orderBy(col("doc_id"))
    }),

    // Incremental dedup: new-arrival batch (doc_id % 5 = 4) against the
    // already-ingested corpus — cross-set pairs only.
    "ns_incremental_dedup" -> ((s, d) => {
      Dedup.incrementalDupPairs(Tables.documents(s, d),
          col("doc_id") % 5 === 4, 0.5)
        .orderBy(col("new_id"), col("old_id"))
    }),

    // Paragraph-granularity dedup: 20-token chunk fingerprints, per-doc
    // duplicated-chunk fraction.
    "ns_paragraph_dedup" -> ((s, d) => {
      Corpus.paragraphDedup(Tables.documents(s, d), 20)
        .orderBy(col("doc_id"))
    }),

    // Sliding-window chunking for retrieval / context packing: 24-token
    // windows every 16 tokens (8-token overlap), content-fingerprinted.
    // Entirely map-side (explode + codegen projections, zero shuffle
    // before the canonical ORDER BY).
    "ns_chunk_overlap" -> ((s, d) => {
      Corpus.chunkSliding(Tables.documents(s, d), 24, 16)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // SimHash near-dup pairs (Hamming <= 3).
    "ns_dedup_simhash" -> ((s, d) => {
      Dedup.simhashDupPairs(Tables.documents(s, d), 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Brute-force cosine top-5 for 8 query vectors — the ANN baseline.
    "ns_similarity_topk" -> ((s, d) => {
      Similarity.bruteForceTopK(Tables.embeddings(s, d), QueryVecIds, 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // kNN label classification: majority vote over the exact top-5
    // neighborhood (ties to the lexicographically first label), scored
    // against the query's own label — the retrieval tier composed into
    // the classical kNN classifier, all vote logic in one per-query
    // aggregate over the 40-row top-k frame.
    "ns_knn_classify" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val votes = Similarity.bruteForceTopK(emb, QueryVecIds, 5)
        .join(emb.select(col("vec_id"), col("label")), "vec_id")
        .groupBy(col("query_id"), col("label"))
        .agg(count(lit(1)).as("votes"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("votes").desc, col("label"))
      votes.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("query_id"), col("label").as("predicted"), col("votes"))
        .join(emb.select(col("vec_id").as("query_id"),
          col("label").as("true_label")), "query_id")
        .withColumn("correct", col("predicted") === col("true_label"))
        .select(col("query_id"), col("predicted"), col("votes"),
          col("true_label"), col("correct"))
        .orderBy(col("query_id"))
    }),

    // Matryoshka (MRL) truncated retrieval: exact top-5 over the FIRST
    // 16 of 64 dims — the "cheap first-stage at 1/4 the bytes" path an
    // MRL-trained embedding ladder ships (cosine is scale-invariant, so
    // no renormalization step exists to get wrong). Same plan shape as
    // the brute-force tier; only the per-vector arithmetic shrinks 4x.
    "ns_embedding_truncate" -> ((s, d) => {
      val tr = Tables.embeddings(s, d)
        .select(col("vec_id"),
          slice(col("embedding").cast("array<double>"), 1, 16)
            .as("embedding"))
      Similarity.bruteForceTopK(tr, QueryVecIds, 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // LSH-bucketed approximate top-5 — the scale path. The sketch planes
    // are deterministic (fixed LCG), so the oracle SQL replays the exact
    // same pipeline in DuckDB with the plane signs embedded as literals.
    "ns_similarity_lsh" -> ((s, d) => {
      // 10-bit buckets suit the test-data corpus sizes (5e3-5e4 vectors);
      // a production corpus in the millions would use the 16-bit default.
      Similarity.lshTopK(Tables.embeddings(s, d), QueryVecIds, 5, nBits = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-Flat approximate top-5 — the inverted-file ANN tier. The coarse
    // quantizer is deterministic (nlist lowest-id corpus vectors), so the
    // whole pipeline replays in SQL and carries a full DuckDB oracle.
    "ns_similarity_ivf" -> ((s, d) => {
      Similarity.ivfTopK(Tables.embeddings(s, d), QueryVecIds, 5,
        nlist = 16, nprobe = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    // PQ-ADC approximate top-5 — the memory-compressed ANN tier: 8
    // subspaces × 16 centroids (4-byte codes vs 256-byte vectors),
    // asymmetric-distance scoring against the codes only. Deterministic
    // sample codebook + fixed-point partial dots make the full
    // encode/LUT/score pipeline replay exactly in DuckDB.
    "ns_similarity_pq" -> ((s, d) => {
      Similarity.pqTopK(Tables.embeddings(s, d), QueryVecIds, 5,
        m = 8, ksub = 16)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF-ADC approximate top-5 — the production composition (FAISS
    // IVFPQ, non-residual): probe 4 of 16 inverted lists, ADC-score only
    // their PQ codes. Both component tiers are deterministic, so the
    // composed pipeline replays fully in DuckDB.
    "ns_similarity_ivfpq" -> ((s, d) => {
      Similarity.ivfpqTopK(Tables.embeddings(s, d), QueryVecIds, 5,
        nlist = 16, nprobe = 4, m = 8, ksub = 16)
        .orderBy(col("query_id"), col("rank"))
    }),

    // RESIDUAL IVF-ADC approximate top-5 — the production refinement
    // (FAISS IVFPQ residual form) scored against the COMMITTED quantizer
    // (ResidualTable: L2-Lloyd centroids + residual codebook, trained
    // offline on the sf0.001 fixture, frozen as ×1e6 fixed-point). The
    // oracle replays assignment, residual, encode, LUT and the coarse
    // linearity split with the same frozen values as literals.
    "ns_similarity_ivfpq_res" -> ((s, d) => {
      Similarity.ivfpqTopKResidualFrozen(Tables.embeddings(s, d),
        QueryVecIds, 5, nprobe = 4)
        .orderBy(col("query_id"), col("rank"))
    }),

    // ADC-retrieve + exact-rerank (FAISS refine stage): IVF-PQ retrieves
    // 20 candidates in the compressed domain, only those 20 raw vectors
    // are fetched and re-scored with the exact cosine, final top-5 ranks
    // on the exact score. Every stage is deterministic, so the whole
    // two-phase stack replays in DuckDB.
    "ns_similarity_ivfpq_rerank" -> ((s, d) => {
      Similarity.ivfpqTopKReranked(Tables.embeddings(s, d), QueryVecIds, 5,
        rerankK = 20, nlist = 16, nprobe = 4, m = 8, ksub = 16)
        .orderBy(col("query_id"), col("rank"))
    }),

    // ANN index QUALITY as a scored row: recall@5 of the production
    // retrieve-and-rerank stack against the exact-cosine ground truth,
    // per query. Both stages are deterministic, so the recall is a
    // stable number the driver's oracle gates every round — a probe
    // misroute or codebook regression turns this row red before any
    // spec does (r8 verdict #7: recall was previously pinned only in
    // AnnStreamsSpec).
    "ns_similarity_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val truth = Similarity.bruteForceTopK(emb, QueryVecIds, 5)
        .select(col("query_id"), col("vec_id"))
      val approx = Similarity.ivfpqTopKReranked(emb, QueryVecIds, 5,
          rerankK = 20, nlist = 16, nprobe = 4, m = 8, ksub = 16)
        .select(col("query_id"), col("vec_id"), lit(1).as("hit"))
      truth.join(approx, Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).cast("bigint").as("n_hits"),
          QueryPack.r6(sum(coalesce(col("hit"), lit(0))) / lit(5.0))
            .as("recall_at_5"))
        .orderBy(col("query_id"))
    }),

    // The REBUILT (trained) index path as a scored row (r9 verdict #6):
    // ivfpqIndexTrained's Lloyd-refined coarse quantizer + Lloyd-trained
    // PQ codebook, probed and exact-reranked end-to-end. Trained
    // centroids are float means (summation-order last-bit noise), so the
    // row hashes margin-backed INVARIANTS, never raw scores: structural
    // completeness (every non-query vector encoded exactly once, m codes
    // each — a dropped or duplicated vector flips n_vectors/n_codes),
    // Lloyd's monotone-improvement guarantees (trained coarse SSE < raw
    // seed-anchor SSE; trained PQ SSE < sample-codebook SSE — measured
    // margins are ~2× on this corpus, far beyond float noise), and a
    // total-recall floor (≥4 truth hits across the 8 queries at
    // rerankK=20/nprobe=4; measured 8-17 across sf0.001/0.01/0.1, and
    // chance is ≪1 — a probe misroute or codebook regression zeroes it).
    "ns_similarity_rebuild" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // ONE decode of the embedding column feeds everything: training,
      // both distortion scans, the sample codebook, brute-force truth,
      // and the rerank — without the barrier each branch re-reads
      // parquet and re-casts per consumer (the NOTES §7 multi-branch
      // recompute hazard). embC re-presents the cached doubles under
      // the original schema so the emb-taking helpers scan the cache
      // too (their internal array<double> cast is a no-op on it —
      // values identical). CACHE-LIFETIME CONTRACT: released by the
      // harness's per-query clearCache; a library caller invoking this
      // query function directly owns the same clearCache-after-
      // materialize responsibility (the Fuzzy.fuzzyPairs contract).
      val allVecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")).persist()
      val embC = allVecs.select(col("vec_id"), col("v").as("embedding"))
      // 3+2 Lloyd rounds: the scored invariants need monotone
      // improvement over the seed/sample baselines (locked in from
      // round 1, margins still ~2x at these counts), not a converged
      // quantizer — the 5+3 defaults stay for real rebuilds; each extra
      // round is a full corpus pass this benchmark row doesn't need
      val index = Similarity.ivfpqIndexTrained(embC, QueryVecIds,
        coarseIters = 3, pqIters = 2, eager = true)
      val corpus = allVecs.filter(!col("vec_id").isin(QueryVecIds: _*))
      val structural = index.codes.agg(
        countDistinct(col("vec_id")).cast("bigint").as("n_vectors"),
        count(lit(1)).cast("bigint").as("n_codes"),
        (countDistinct(col("lid")) <= lit(16L)).as("n_lists_ok"))
      val seeds = Similarity.seedVectors(corpus, 16, "trained-vs-seed probe")
        .select(col("vec_id").as("lid"), col("v").as("lv"))
      val coarseImproved = Similarity.coarseDistortionDF(corpus, index.centroids)
        .select(col("coarse_sse").as("sse_tr"))
        .crossJoin(Similarity.coarseDistortionDF(corpus, broadcast(seeds))
          .select(col("coarse_sse").as("sse_seed")))
        .select((col("sse_tr") < col("sse_seed")).as("coarse_improved"))
      val pqImproved = Similarity
        .pqDistortionDF(embC, QueryVecIds, 8, 64, index.codebook)
        .select(col("pq_sse").as("pq_tr"))
        .crossJoin(Similarity.pqDistortionDF(embC, QueryVecIds, 8, 64,
            Similarity.pqSampleCodebook(embC, QueryVecIds, 8, 16, 64))
          .select(col("pq_sse").as("pq_smp")))
        .select((col("pq_tr") < col("pq_smp")).as("pq_improved"))
      val truth = Similarity.bruteForceTopK(embC, QueryVecIds, 5)
        .select(col("query_id"), col("vec_id"))
      val queries = allVecs.filter(col("vec_id").isin(QueryVecIds: _*))
      val cands = Similarity.ivfpqProbe(index, queries, 20, nprobe = 4)
        .select(col("query_id"), col("vec_id"))
      val approx = Similarity.exactRerank(cands, allVecs,
          queries.select(col("vec_id").as("query_id"), col("v").as("qv")), 5)
        .select(col("query_id"), col("vec_id"), lit(1).as("hit"))
      val recallOk = truth.join(approx, Seq("query_id", "vec_id"), "left")
        .agg((sum(coalesce(col("hit"), lit(0))) >= lit(4)).as("recall_total_ok"))
      structural.crossJoin(coarseImproved).crossJoin(pqImproved)
        .crossJoin(recallOk)
    }),

    // Embedding near-duplicate pairs via banded sign-LSH + exact cosine
    // verify. Banding makes candidate recall ~1-1e-11, verification makes
    // precision exact → output equals the brute-force pair set, which is
    // the oracle. τ=0.45 yields a non-trivial pair set on the test data
    // (max pairwise cosine ≈ 0.51).
    "ns_cosine_dup_pairs" -> ((s, d) => {
      Similarity.cosineDupPairs(Tables.embeddings(s, d), 0.45)
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // The BANDED 100 TB dedup path scored at a realistic dedup threshold
    // (τ=0.85). The raw test embeddings max out at pairwise cosine ~0.51,
    // so the corpus is augmented with deterministic zero-prefix twins
    // (cos ≈ 0.87 ± spread — the τ=0.85 cut keeps ~2/3 of twin pairs and
    // rejects the rest, so the threshold genuinely bites). 128 bands × 10
    // bits: recall per qualifying pair ≥ 1-(1-p(0.85)^10)^128 ≈ 1-2.5e-9
    // (equality with the brute-force oracle verified at sf0.001/0.01/0.1
    // against the fixed plane set, so the result is deterministic, not
    // probabilistic), random-pair candidate rate ~12%, verification
    // exact. Sketch cost is the dominant term at this corpus size —
    // 1280 plane dots/vector here vs 3072 for the 256×12 alternative
    // with its ~1e-11 miss bound.
    "ns_cosine_dup_pairs_banded" -> ((s, d) => {
      Similarity.cosineDupPairsBanded(
          Similarity.withNoisyTwins(Tables.embeddings(s, d)), 0.85,
          nBands = 128, rowsPerBand = 10)
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // Fuzzy near-identical prefix pairs (entity-resolution tier):
    // SymSpell deletion-neighborhood candidates + exact levenshtein ≤ 2
    // verify over 24-char document prefixes. The natural data has exact
    // dups but almost no 1-2-edit neighbors at small SF, so the corpus
    // is augmented with deterministic one-character typo twins (position
    // 10 → 'x'), making every edit distance 0/1/2 band non-empty —
    // recall is guaranteed by the deletion-neighborhood theorem, so
    // output equals the brute-force oracle exactly.
    "ns_fuzzy_prefix_pairs" -> ((s, d) => {
      val pref = Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 24).as("s"))
      // twin-id offset 1e8, not 1e5: the old margin was only 2x above
      // sf1's 50k max doc_id — a >=100k-doc corpus would alias twin ids
      // with real docs, making pair identities ambiguous (r13 review);
      // 1e8 matches the headroom class of the other augmentations
      val aug = pref.unionAll(pref.select(
        (col("doc_id") + lit(100000000L)).as("doc_id"),
        concat(substring(col("s"), 1, 9), lit("x"),
          substring(col("s"), 11, 14)).as("s")))
      Fuzzy.fuzzyPairs(aug, "doc_id", "s", maxEd = 2)
        .withColumnRenamed("id_a", "doc_a").withColumnRenamed("id_b", "doc_b")
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Per-label embedding norm stats.
    "ns_embedding_norms" -> ((s, d) => {
      Similarity.normStats(Tables.embeddings(s, d))
        .orderBy(col("label"))
    }),

    // Token counting (whitespace + BPE-ish regex).
    "ns_token_count" -> ((s, d) => {
      TextAnalysis.tokenCounts(Tables.documents(s, d))
        .orderBy(col("doc_id"))
    }),

    // The OTHER subword family: unigram-LM (SentencePiece-style)
    // Viterbi token counts under the committed UnigramTable, as a
    // codegen expression. The oracle replays the frozen tokenizer
    // per WORD (the corpus's closed 31-word vocabulary makes each
    // word's piece count a constant, derived from the same frozen
    // table at oracle-build time — an unseen word would inner-join
    // away and hash-mismatch, so drift is detected, not absorbed).
    "ns_token_count_unigram" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.Unigram.tokenCount(col("text"))
            .as("n_unigram_tokens"))
        .orderBy(col("doc_id"))
    }),

    // REAL token accounting: byte-level BPE under the committed
    // BpeTable merge table, as a codegen expression. The oracle replays
    // the identical 128 merges as chained replace() calls (see
    // Bpe.oracleReplaceChain), so this row scores the exact tokenizer,
    // not a regex approximation.
    "ns_token_count_bpe" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.Bpe.tokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    }),

    // Tokenizer FERTILITY (tokens per word) per language — the metric
    // a tokenizer evaluation actually reports: BPE token mass over
    // whitespace word mass from exact BIGINT sums, one double division
    // at the end. Scores the committed tokenizer against the corpus
    // slice-by-slice (a lang whose script the merges never saw shows
    // elevated fertility).
    "ns_tokenizer_fertility" -> ((s, d) => {
      Tables.documents(s, d).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(Corpus.wsTokenCount(col("text"))).as("n_ws_tokens"),
          sum(graft.functions.Bpe.tokenCount(col("text")).cast("long"))
            .as("n_bpe_tokens"))
        .select(col("lang"), col("n_docs"), col("n_ws_tokens"),
          col("n_bpe_tokens"),
          QueryPack.r6(col("n_bpe_tokens").cast("double")
            / col("n_ws_tokens").cast("double")).as("fertility"))
        .orderBy(col("lang"))
    }),

    // Distributed BPE VOCABULARY INDUCTION scored end-to-end (r14):
    // learn the first 12 merges — the tokenizer TRAINING step the
    // frozen BpeTable was produced by, run distributed (one pair-count
    // scan per greedy-prefix BATCH, not per merge; see
    // Bpe.trainBatched's safety proof). Trained on the FIXED-BUDGET
    // deterministic sample doc_id < 500: tokenizer induction on a
    // bounded sample IS the production shape (nobody trains merges on
    // 100 TB — GPT-2's BPE came from a corpus subset), and it keeps
    // the sequential DuckDB replay constant-cost at every gate SF
    // (full-corpus replay measured 5.5 min at sf0.1 alone — the
    // trainer itself handles any size; MlSpec runs it unsampled).
    // Output is the learned merge table (rank, a, b, n); n is the
    // sequential argmax's count at that rank (unchanged within a batch
    // by proof condition (1)), so the SEQUENTIAL replay — 12 rounds of
    // count-adjacent-pairs-with-overlaps, argmax with (n DESC, a, b)
    // ties, replace() merge — pins the batched trainer rank-for-rank.
    // The 12-row result is driver-built from the learned table (the
    // bounded-metadata collect class; training itself is distributed).
    // The sample is additionally pinned ASCII-only (octet_length =
    // char length) in BOTH engines (r15, ADVICE): the trainer counts
    // UTF-8 BYTE pairs while DuckDB's substr/length/unicode replay
    // counts CHARACTER pairs — identical iff every sampled doc is pure
    // ASCII. The filter is a no-op on the current corpus (verified:
    // zero rows dropped at every SF) but keeps the parity contract
    // true by construction if a regenerated corpus introduces
    // multi-byte text, instead of silently diverging.
    "ns_bpe_train" -> ((s, d) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val (m, _) = graft.functions.Bpe.trainWithCounts(
        Tables.documents(s, d).filter(col("doc_id") < 500 &&
            octet_length(col("text")) === length(col("text")))
          .select(col("text")), "text", nMerges = 12)
      val rows = m.zipWithIndex.map { case ((a, b, n), r) =>
        Row(r, a, b, n)
      }
      s.createDataFrame(java.util.Arrays.asList(rows: _*),
        StructType(Seq(StructField("rank", IntegerType),
          StructField("a", IntegerType), StructField("b", IntegerType),
          StructField("n", LongType))))
        .orderBy(col("rank"))
    }),

    // Model-based quality filtering: sigmoid of a FROZEN linear model
    // (TextAnalysis.QualityModel — versioned weights, the GPT-3-style
    // LR quality filter) over the quality features, with the keep
    // decision at 0.5. Map-side only; the oracle replays the identical
    // left-to-right logit fold.
    "ns_quality_lr" -> ((s, d) => {
      TextAnalysis.classifierScore(Tables.documents(s, d))
        .orderBy(col("doc_id"))
    }),

    // Shannon character entropy — low-entropy filler detector.
    "ns_char_entropy" -> ((s, d) => {
      TextAnalysis.charEntropy(Tables.documents(s, d))
        .orderBy(col("doc_id"))
    }),

    // Quality-score features.
    "ns_text_quality" -> ((s, d) => {
      TextAnalysis.qualityFeatures(Tables.documents(s, d))
        .orderBy(col("doc_id"))
    }),

    // Deterministic hash-rate Bernoulli sample: keep a doc iff its
    // md5-derived uniform falls under the rate — reproducible across
    // runs/partitionings (unlike df.sample), purely map-side, and the
    // standard way a 100 TB corpus is thinned without a shuffle.
    // Deterministic training-order shuffle + dataloader sharding: a
    // reproducible md5(doc_id:seed) permutation materialized as
    // (shard, position) for per-worker sequential reads. Per-shard
    // windows only — no global sort.
    "ns_train_order" -> ((s, d) => {
      Corpus.trainOrder(Tables.documents(s, d), seed = 42, nShards = 8)
        .orderBy(col("shard"), col("position"))
    }),

    // Quality-paced curriculum order (r15): frozen-LR score → tertile
    // phases (sketch cutpoints, rank-exact envelope machine-checked) →
    // per-(phase, shard) deterministic md5 shuffle — trainOrder with a
    // curriculum schedule on top. See Corpus.curriculumOrder.
    // Curriculum × mixture interaction (r16): per (phase, source), doc
    // and token counts — does the quality-paced schedule starve a
    // source in phase 1? Phases come from the SAME derivation
    // ns_curriculum_order ships (Corpus.phasedScores), so report and
    // schedule cannot disagree.
    "ns_curriculum_mix" -> ((s, d) => {
      Corpus.curriculumMix(Tables.documents(s, d))
    }),

    "ns_curriculum_order" -> ((s, d) => {
      Corpus.curriculumOrder(Tables.documents(s, d), seed = 42, nShards = 8)
        .orderBy(col("phase"), col("shard"), col("position"))
    }),

    "ns_sample_hash_rate" -> ((s, d) => {
      Tables.documents(s, d)
        .filter((Corpus.md5Key(col("doc_id").cast("string")) % 1000000L) <
          100000L)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic train/val/test split (80/10/10) by md5 bucket — the
    // reproducible-split op every training pipeline needs: assignment is
    // a pure function of doc_id, so re-runs, backfills, and engines all
    // agree, and no shuffle happens (map-side projection only).
    "ns_split_assign" -> ((s, d) => {
      val bucket = (Corpus.md5Key(col("doc_id").cast("string")) % 100L)
        .as("bucket")
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), bucket)
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test"))
        .orderBy(col("doc_id"))
    }),

    // Per-domain document cap — the crawl-pipeline guard against one
    // domain flooding the corpus: keep the 3 longest docs per source.
    // Runs through the custom bounded-heap TopKPerKeyExec (partial/final,
    // ≤ k rows per key per partition shuffled — never the corpus), so the
    // custom-plan ladder is exercised by the driver's oracle gate on a
    // second, ML-shaped surface beyond w_topk_heap.
    "ns_domain_cap" -> ((s, d) => {
      graft.plans.TopK.perKey(
          Tables.documents(s, d).select(col("source"), col("doc_id"), col("n_chars")),
          Seq("source"), Seq(("n_chars", false), ("doc_id", true)), 3)
        .orderBy(col("source"), col("doc_id"))
    }),

    // Stopword-profile language ID.
    "ns_lang_id" -> ((s, d) => {
      TextAnalysis.langId(Tables.documents(s, d))
        .orderBy(col("doc_id"))
    }),

    // Language-ID confusion matrix: labeled x predicted doc counts with
    // per-labeled-language recall share — the eval rollup of ns_lang_id.
    "ns_lang_confusion" -> ((s, d) => {
      val cells = TextAnalysis.langId(Tables.documents(s, d))
        .groupBy(col("labeled_lang"), col("predicted_lang"))
        .agg(count(lit(1)).as("n_docs"))
      val totals = cells.groupBy(col("labeled_lang"))
        .agg(sum(col("n_docs")).as("n_labeled"))
      cells.join(broadcast(totals), "labeled_lang")
        .select(col("labeled_lang"), col("predicted_lang"), col("n_docs"),
          (col("n_docs").cast("double") / col("n_labeled")).as("share"))
        .orderBy(col("labeled_lang"), col("predicted_lang"))
    }),

    // The r11 curation pipeline composed as ONE lazy plan: Gopher gate
    // AND CCNet head+middle buckets, exact-dedup keep among survivors,
    // per-source budget report (the trainingMix discipline for the
    // quality tier).
    "ns_curation_pipeline" -> ((s, d) => {
      Corpus.curationPipeline(Tables.documents(s, d))
        .orderBy(col("source"))
    }),

    // Top-3 TF-IDF terms per document.
    "ns_tfidf_top_terms" -> ((s, d) => {
      TextAnalysis.tfidfTopTerms(Tables.documents(s, d), 3)
        .orderBy(col("doc_id"), col("rank"))
    }),

    // Deterministic stratified sample: 5 docs per language in md5 order —
    // reproducible across engines/runs, unlike RNG-based sample().
    "ns_sample_stratified" -> ((s, d) => {
      Sampling.stratified(Tables.documents(s, d), col("lang"), col("doc_id"), 5)
        .select(col("lang"), col("sample_rank").as("rank"), col("doc_id"))
        .orderBy(col("lang"), col("rank"))
    }),

    // Eval-set contamination: training docs sharing verbatim 8-grams with
    // the held-out eval shard (every 10th doc) — the pre-training
    // decontamination check. Eval side broadcasts; corpus never shuffles.
    "ns_contamination" -> ((s, d) => {
      Corpus.contamination(Tables.documents(s, d), col("doc_id") % 10 === 0, 8)
        .orderBy(col("doc_id"))
    }),

    // Corpus coverage curve: sources ranked by token mass, kept until
    // the cumulative share first reaches 90% — the "which sources make
    // up the corpus" cut every mixture report draws. The window runs
    // over the per-source aggregate (one row per source), never the
    // corpus; the 0.9 threshold compares in INTEGER space
    // ((cum-nt)·10 < tot·9) so no double boundary exists to disagree on.
    "ns_source_coverage" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("nt").desc, col("source"))
      val run = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
      val per = Tables.documents(s, d).groupBy(col("source"))
        .agg(sum(Corpus.wsTokenCount(col("text"))).as("nt"))
      val tot = per.agg(sum(col("nt")).as("tot"))
      per.crossJoin(broadcast(tot))
        .withColumn("rank", row_number().over(w))
        .withColumn("cum", sum(col("nt")).over(run))
        .filter((col("cum") - col("nt")) * 10 < col("tot") * 9)
        .select(col("rank"), col("source"), col("nt"),
          QueryPack.r6(col("cum").cast("double") / col("tot")).as("cum_share"))
        .orderBy(col("rank"))
    }),

    // The END-TO-END training-mix pipeline as one scored plan (r8
    // verdict #8): quality gate → exact-dedup keep → decontamination →
    // domain cap (through the custom TopKPerKeyExec) → temperature
    // sample → split assign. Every component is individually green;
    // this row proves they COMPOSE without a driver-side seam.
    "ns_training_mix" -> ((s, d) => {
      Corpus.trainingMix(Tables.documents(s, d), domainCap = 50,
          exponent = 0.3)
        .orderBy(col("doc_id"))
    }),

    // Bigram-LM perplexity quality scoring (add-one smoothing, trained on
    // the corpus itself) — the CCNet/KenLM-style filter signal.
    "ns_lm_perplexity" -> ((s, d) => {
      TextAnalysis.lmPerplexity(Tables.documents(s, d))
        .orderBy(col("doc_id"))
    }),

    // CCNet-style per-language perplexity tertiles: head/middle/tail
    // buckets from sketch cutpoints (rank-exact at this scale, envelope
    // machine-checked), fixed-point bucket means.
    "ns_ppl_buckets" -> ((s, d) => {
      TextAnalysis.pplBuckets(Tables.documents(s, d))
        .orderBy(col("lang"), col("bucket"))
    }),

    // Exact duplicated 8-gram spans per document (substring-level dedup):
    // longest consecutive run of corpus-duplicated grams + totals.
    "ns_dup_ngram_spans" -> ((s, d) => {
      Dedup.dupNgramSpans(Tables.documents(s, d), 8)
        .orderBy(col("doc_id"))
    }),

    // Actionable span dedup: duplicated 8-gram spans CUT OUT of the
    // (normalized) text — the "remove the boilerplate, keep the doc"
    // op, vs ns_dup_ngram_spans which only localizes them.
    "ns_dup_span_removal" -> ((s, d) => {
      Dedup.removeDupSpans(Tables.documents(s, d), 8)
        .orderBy(col("doc_id"))
    }),

    // Sequence packing (concat-and-chunk at 512 tokens) via the scan-style
    // distributed prefix sum — no single-partition window over the corpus.
    "ns_seq_packing" -> ((s, d) => {
      Corpus.packSequences(Tables.documents(s, d), 512)
        .orderBy(col("doc_id"))
    }),

    // Sequence packing under the REAL token budget: same distributed
    // prefix-sum packing, but doc lengths come from the committed BPE
    // tokenizer instead of the whitespace approximation — the form a
    // training pipeline actually ships (a 512-BPE-token budget, not a
    // 512-word one; the whitespace count overestimates BPE length ~5x
    // on this corpus, so the two packings differ materially).
    "ns_seq_packing_bpe" -> ((s, d) => {
      Corpus.packSequencesBy(Tables.documents(s, d),
          graft.functions.Bpe.tokenCount(col("text")).cast("long"), 512)
        .orderBy(col("doc_id"))
    }),

    // Top-20 corpus vocabulary heavy hitters with document frequency.
    "ns_heavy_hitters" -> ((s, d) => {
      Corpus.heavyHitters(Tables.documents(s, d), 20)
        .orderBy(col("rank"))
    }),

    // Polynomial rolling-hash fingerprint — custom Catalyst Expression
    // with codegen (graft.functions.PolyFingerprint).
    "ns_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          PolyFingerprint.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))
    }),

    // Multimodal binary-column metadata (SQL-expressible surface; the
    // real decoders — javax.imageio, javax.sound.sampled, the ISO-BMFF
    // box parse — are spec-covered, DuckDB being unable to decode them).
    "ns_multimodal_meta" -> ((s, d) => {
      Multimodal.assets(Tables.documents(s, d))
        .select(col("asset_id"), col("modality"),
          length(col("bytes")).as("byte_len"),
          md5(col("bytes")).as("content_md5"))
        .orderBy(col("asset_id"))
    }),

    // The REAL image decode path as a scored row (r9 verdict #7): a
    // committed JPEG fixture (src/main/resources/graft/fixtures/
    // photo.jpg — javax.imageio's JPEG reader, the one committed-format
    // family the PNG/BMP spec fixtures didn't exercise) plus the two
    // corrupt-blob shapes (reader-returns-null garbage; a truncated
    // JPEG whose reader THROWS mid-parse), so the null-quarantine
    // convention — corrupt payloads become null-metadata rows that keep
    // flowing, never task failures — is oracle-checked, not only
    // spec-checked. The oracle can state everything as literals: the
    // fixture bytes are committed (byte_len/md5 are constants of the
    // repo) and JPEG dimensions/band-count are container facts every
    // compliant decoder agrees on (pixel MEANS are lossy-decoder-
    // dependent and stay spec-side). Fixture bytes ride createDataFrame
    // as a 4-row local table — the same driver-literal shape as the
    // codebook tables; the decode itself is the production map-side UDF.
    // REAL video-container decode at the correctness gate — completes
    // the multimodal trio (image/audio/video all oracle-scored): a
    // deterministic in-code ISO-BMFF tree (isom brand, 7.5 s movie at
    // timescale 1000, one 640x360 vide track + one soun track, moov in
    // the 64-bit largesize form) built from the spec'd byte layout, so
    // the oracle literals derive from ISO 14496-12, never from the
    // parser under test; plus the two corrupt shapes (unparseable
    // bytes; a truncated box tree).
    "ns_multimodal_video" -> ((s, _) => {
      import java.nio.ByteBuffer
      def u16(v: Int) = ByteBuffer.allocate(2).putShort(v.toShort).array()
      def u32(v: Long) = ByteBuffer.allocate(4).putInt(v.toInt).array()
      def u64(v: Long) = ByteBuffer.allocate(8).putLong(v).array()
      def fx(d: Double) = u32((d * 65536).toLong)
      def cc(str: String) = str.getBytes("ISO-8859-1")
      def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
        val content = parts.flatten.toArray
        u32(8L + content.length) ++ cc(typ) ++ content
      }
      def bigBox(typ: String, parts: Array[Byte]*): Array[Byte] = {
        val content = parts.flatten.toArray
        u32(1L) ++ cc(typ) ++ u64(16L + content.length) ++ content
      }
      val matrix = Array.fill(36)(0.toByte)
      def hdlr(handler: String) =
        box("hdlr", u32(0), u32(0), cc(handler), Array.fill(12)(0.toByte))
      def mvhdV0(timescale: Long, duration: Long) =
        box("mvhd", u32(0), u32(0), u32(0), u32(timescale), u32(duration),
          u32(0x00010000L), u16(0x0100), Array.fill(10)(0.toByte), matrix,
          Array.fill(24)(0.toByte), u32(2))
      def tkhdV0(w: Double, h: Double) =
        box("tkhd", u32(7), u32(0), u32(0), u32(1), u32(0), u32(0),
          u64(0), u16(0), u16(0), u16(0), u16(0), matrix, fx(w), fx(h))
      val ftyp = box("ftyp", cc("isom"), u32(0), cc("mp42"))
      val good = ftyp ++ bigBox("moov",
        mvhdV0(1000, 7500),
        box("trak", tkhdV0(640, 360), box("mdia", hdlr("vide"))),
        box("trak", tkhdV0(0, 0), box("mdia", hdlr("soun")))) ++
        box("mdat", cc("fake"))
      Multimodal.decodeVideoMeta(assetFrame(s, Seq(
          (1L, "video", good),
          (2L, "video", "not a movie at all".getBytes("UTF-8")),
          (3L, "video", good.dropRight(10)))))
        .select(col("asset_id"), col("byte_len"), col("major_brand"),
          col("timescale"), col("duration_units"), col("duration_sec"),
          col("width"), col("height"), col("n_tracks"),
          col("n_video_tracks"), col("n_audio_tracks"),
          col("major_brand").isNotNull.as("decoded"))
        .orderBy(col("asset_id"))
    }),

    // REAL audio decode at the correctness gate — the javax.sound twin
    // of ns_multimodal_decode: a deterministic in-code WAV (16-bit PCM
    // mono 8 kHz, 64-sample ramp i*100-3200 -> peak 3200, mean_abs
    // exactly 1600.0, duration 64/8000) plus the two corrupt shapes
    // (unparseable bytes; a header promising 64 frames over truncated
    // data — the mid-frame corruption branch). Oracle pins the PCM
    // stats and the null-quarantine rows as literals.
    "ns_multimodal_audio" -> ((s, _) => {
      def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
      def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
      val samples = (0 until 64).map(i => i * 100 - 3200)
      val pcm = samples.flatMap(le16).toArray
      def wav(data: Array[Byte], declaredLen: Int): Array[Byte] =
        "RIFF".getBytes ++ le32(36 + declaredLen) ++ "WAVE".getBytes ++
          "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
          le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
          "data".getBytes ++ le32(declaredLen) ++ data
      val good = wav(pcm, pcm.length)
      val truncated = wav(pcm.take(100), pcm.length) // header promises 128
      Multimodal.decodeAudioMeta(assetFrame(s, Seq(
          (1L, "audio", good),
          (2L, "audio", "not audio".getBytes("UTF-8")),
          (3L, "audio", truncated))))
        .select(col("asset_id"), col("byte_len"), col("sample_rate"),
          col("channels"), col("bits_per_sample"), col("n_frames"),
          col("duration_sec"), col("peak_amp"), col("mean_abs"),
          col("sample_rate").isNotNull.as("decoded"))
        .orderBy(col("asset_id"))
    }),

    "ns_multimodal_decode" -> ((s, _) => {
      val jpeg = {
        val in = getClass.getResourceAsStream("/graft/fixtures/photo.jpg")
        require(in != null, "missing committed fixture photo.jpg")
        try in.readAllBytes() finally in.close()
      }
      val truncated = jpeg.take(24) ++ Array.fill[Byte](40)(0x7F)
      Multimodal.decodeImageMeta(assetFrame(s, Seq(
          (1L, "image", jpeg),
          (2L, "image", "not an image".getBytes("UTF-8")),
          (3L, "image", truncated))))
        .select(col("asset_id"), col("byte_len"),
          col("width"), col("height"), col("channels"),
          col("width").isNotNull.as("decoded"))
        .orderBy(col("asset_id"))
    })
  )

  /** The (asset_id, modality, bytes) local fixture frame the three
    * decode queries commit their bytes through — ONE spelling of the
    * schema + row assembly (was hand-rolled per query; r13 review). */
  private def assetFrame(s: SparkSession,
      rows: Seq[(Long, String, Array[Byte])]): DataFrame = {
    val list = new java.util.ArrayList[org.apache.spark.sql.Row]()
    rows.foreach { case (id, m, b) =>
      list.add(org.apache.spark.sql.Row(id, m, b))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("asset_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("modality",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bytes",
        org.apache.spark.sql.types.BinaryType)))
    s.createDataFrame(list, schema)
  }

  /** ±1 plane-sign literals for the 10-bit LSH sketch, generated from the
    * same fixed-LCG stream the HyperplaneSketch expression uses — lets the
    * DuckDB oracle replay the sketch bit-for-bit (±1·x is exact in IEEE
    *754 and both engines accumulate the dot product sequentially).
    */
  private def planeValuesSql(nBits: Int, dim: Int): String =
    graft.functions.HyperplaneSketch.planeSigns(nBits, dim).zipWithIndex.map {
      case (row, b) =>
        row.map(s => if (s) "1" else "-1")
          .mkString(s"($b, CAST([", ",", "] AS DOUBLE[]))")
    }.mkString(",\n")

  /** Shared CTE chain producing `jp(doc_a, doc_b, jaccard)` — the exact
    * n-gram Jaccard pairs at threshold 0.5 — reused by the pair, minhash,
    * and cluster oracles. */
  private val jaccardCtes: String =
    """w AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
      |sh AS (SELECT doc_id, list_distinct([t[i]||' '||t[i+1]||' '||t[i+2]||' '||
      |         t[i+3]||' '||t[i+4] for i in range(1, len(t)-3)]) s
      |       FROM w WHERE len(t) >= 5),
      |tok AS (SELECT doc_id, unnest(s) g FROM sh),
      |sz AS (SELECT doc_id, len(s) n FROM sh),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      |      FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
      |      GROUP BY 1, 2),
      |jp AS (SELECT doc_a, doc_b,
      |         round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
      |       FROM p JOIN sz sa ON p.doc_a = sa.doc_id
      |              JOIN sz sb ON p.doc_b = sb.doc_id
      |       WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.5)""".stripMargin

  private val jaccardPairsOracle: String =
    s"WITH $jaccardCtes\nSELECT doc_a, doc_b, jaccard FROM jp ORDER BY doc_a, doc_b"

  /** The df-CAPPED sibling of [[jaccardCtes]], replaying
    * Dedup.cappedCandidates' semantics: candidate pairs must share at
    * least one shingle with 2 <= df <= ScoredDfCap; the Jaccard itself
    * is then computed over ALL shared shingles (the engine's exact
    * array_intersect verify). The capped-family oracles ride THIS
    * chain so scored parity holds on ANY data: with the exact chain, a
    * duplicate cluster wider than the cap — every shared shingle hot —
    * would be a phantom red even though the miss is the cap's
    * DOCUMENTED 100-TB trade (r13 review; the minhash tier is the
    * recall path for such clusters: verbatim copies carry identical
    * signatures and bucket together regardless of df, which is why
    * ns_dedup_minhash keeps the EXACT oracle). No committed dataset
    * trips the divergence (max shingle df: 4 at sf0.1, 61 at sf1), so
    * the swap changes no gate output — it removes the latent red. */
  private val jaccardCappedCtes: String =
    s"""w AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
      |sh AS (SELECT doc_id, list_distinct([t[i]||' '||t[i+1]||' '||t[i+2]||' '||
      |         t[i+3]||' '||t[i+4] for i in range(1, len(t)-3)]) s
      |       FROM w WHERE len(t) >= 5),
      |tok AS (SELECT doc_id, unnest(s) g FROM sh),
      |sz AS (SELECT doc_id, len(s) n FROM sh),
      |dft AS (SELECT g, count(*) AS df FROM tok GROUP BY g),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |         FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
      |         JOIN dft ON dft.g = a.g
      |         WHERE dft.df BETWEEN 2 AND ${graft.ml.Dedup.ScoredDfCap}),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      |      FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id < b.doc_id
      |      JOIN cand ON cand.doc_a = a.doc_id AND cand.doc_b = b.doc_id
      |      GROUP BY 1, 2),
      |jp AS (SELECT doc_a, doc_b,
      |         round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
      |       FROM p JOIN sz sa ON p.doc_a = sa.doc_id
      |              JOIN sz sb ON p.doc_b = sb.doc_id
      |       WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.5)""".stripMargin

  private val jaccardCappedPairsOracle: String =
    s"WITH $jaccardCappedCtes\nSELECT doc_a, doc_b, jaccard FROM jp ORDER BY doc_a, doc_b"

  /** Shared curriculum replay (r16): the ns_quality_lr logit fold,
    * exact ceil(q·n)-element tertile cutpoints in (lr_score, doc_id)
    * rank order, the DESCENDING phase rule, and the md5(doc_id:42)
    * shuffle key — down to `p` (doc_id, lr_score, phase, shuffle_key).
    * ONE spelling consumed by ns_curriculum_order's and
    * ns_curriculum_mix's oracles (mirroring Corpus.phasedScores on the
    * Spark side) so the phase rule cannot drift between the schedule
    * and its mixture report. */
  private val curriculumCtes: String =
    """f AS (SELECT doc_id, text,
      |    CAST(length(text) AS INT) AS n_chars,
      |    string_split_regex(trim(text), '\s+') AS toks,
      |    length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'))
      |      AS n_punct,
      |    length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper
      |  FROM documents),
      |g AS (SELECT doc_id,
      |    round(CAST(n_chars AS DOUBLE) / greatest(len(toks), 1), 6) AS cpt,
      |    round(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 6) AS punct,
      |    round(CAST(n_upper AS DOUBLE) / greatest(n_chars, 1), 6) AS upper_r,
      |    round(CAST(len(list_filter(toks, t -> t IN
      |      ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
      |      / greatest(len(toks), 1), 6) AS stop
      |  FROM f),
      |s AS (SELECT doc_id,
      |    round(1.0 / (1.0 + exp(-(-6.5 + 20.0*stop + 1.0*cpt
      |      + -12.0*punct + -8.0*upper_r))), 6) AS lr_score
      |  FROM g),
      |ranked AS (SELECT doc_id, lr_score,
      |    row_number() OVER (ORDER BY lr_score, doc_id) AS rn,
      |    count(*) OVER () AS cnt FROM s),
      |cuts AS (SELECT
      |    max(CASE WHEN rn = CAST(ceil(cnt * (1.0/3)) AS BIGINT)
      |        THEN lr_score END) AS c1,
      |    max(CASE WHEN rn = CAST(ceil(cnt * (2.0/3)) AS BIGINT)
      |        THEN lr_score END) AS c2
      |  FROM ranked),
      |p AS (SELECT doc_id, lr_score,
      |    1 + CAST(lr_score <= c.c2 AS INT) + CAST(lr_score <= c.c1 AS INT)
      |      AS phase,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8))
      |      ::UINTEGER AS BIGINT) AS shuffle_key
      |  FROM s CROSS JOIN cuts c)""".stripMargin

  /** Residual IVF-ADC oracle generated FROM the committed quantizer:
    * the frozen fixed-point tables render as fix/1e6 double literals
    * (Double.toString is shortest-round-trip, so DuckDB parses back the
    * exact same IEEE754 value the Spark path computes), and the CTE
    * chain mirrors Similarity.ivfpqTopKResidualFrozen stage for stage.
    */
  /** Shared ADC CTE chain for the IVF-PQ oracles — the IVF coarse
    * lists/probes composed with the PQ codebook/encode/LUT CTEs, probed
    * ADC scoring, and the per-query `ranked` CTE. Callers append either
    * the plain top-5 select (`ns_similarity_ivfpq`) or the exact-cosine
    * rerank continuation (`ns_similarity_ivfpq_rerank`). */
  private val ivfpqAdcCtes: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c0 AS (SELECT vec_id AS lid, v AS lv FROM e WHERE vec_id > 7
      |       ORDER BY vec_id LIMIT 16),
      |lists AS (SELECT vec_id, lid FROM (
      |    SELECT e.vec_id, c0.lid,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_cosine_similarity(e.v, c0.lv), 6) DESC, c0.lid)
      |        AS rk
      |    FROM e CROSS JOIN c0 WHERE e.vec_id > 7) t WHERE rk = 1),
      |probes AS (SELECT query_id, lid FROM (
      |    SELECT e.vec_id AS query_id, c0.lid,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_cosine_similarity(e.v, c0.lv), 6) DESC, c0.lid)
      |        AS rk
      |    FROM e CROSS JOIN c0 WHERE e.vec_id <= 7) t WHERE rk <= 4),
      |subs AS (SELECT CAST(gs AS INT) AS sub FROM generate_series(0, 7) t(gs)),
      |seed AS (SELECT vec_id, v FROM e WHERE vec_id > 7 ORDER BY vec_id LIMIT 16),
      |sr AS (SELECT v, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
      |       FROM seed),
      |cb AS (SELECT sub, cid, list_slice(v, sub*8 + 1, sub*8 + 8) AS cv
      |       FROM sr CROSS JOIN subs),
      |sv AS (SELECT vec_id, sub, list_slice(v, sub*8 + 1, sub*8 + 8) AS sv
      |       FROM e CROSS JOIN subs WHERE vec_id > 7),
      |enc AS (SELECT vec_id, sub, cid FROM (
      |    SELECT sv.vec_id, sv.sub, cb.cid,
      |      row_number() OVER (PARTITION BY sv.vec_id, sv.sub
      |        ORDER BY round(list_sum(list_transform(list_zip(sv.sv, cb.cv),
      |          z -> (z[1] - z[2]) * (z[1] - z[2]))), 6), cb.cid) AS rk
      |    FROM sv JOIN cb USING (sub)) t WHERE rk = 1),
      |qs AS (SELECT vec_id AS query_id, sub,
      |         list_slice(v, sub*8 + 1, sub*8 + 8) AS qsv
      |       FROM e CROSS JOIN subs WHERE vec_id <= 7),
      |lut AS (SELECT query_id, sub, cid,
      |      CAST(round(list_inner_product(qsv, cv) * 1e6) AS BIGINT) AS pfix
      |    FROM qs JOIN cb USING (sub)),
      |cands AS (SELECT probes.query_id, lists.vec_id
      |    FROM lists JOIN probes USING (lid)),
      |scored AS (SELECT c.query_id, c.vec_id,
      |      round(sum(l.pfix) / 1e6, 6) AS adc_dot
      |    FROM cands c JOIN enc ON c.vec_id = enc.vec_id
      |    JOIN lut l ON l.query_id = c.query_id
      |      AND l.sub = enc.sub AND l.cid = enc.cid
      |    GROUP BY c.query_id, c.vec_id),
      |ranked AS (SELECT query_id, vec_id, adc_dot,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY adc_dot DESC, vec_id) AS rank FROM scored)""".stripMargin

  private lazy val residualIvfpqOracle: String = {
    def sqlList(v: Seq[Double]): String = v.mkString("[", ", ", "]")
    val cent = ResidualTable.centroids
      .map { case (l, v) => s"($l, ${sqlList(v)})" }.mkString(",\n|    ")
    val cw = ResidualTable.codebook
      .map { case ((s, c), v) => s"($s, $c, ${sqlList(v)})" }
      .mkString(",\n|    ")
    val np = 4
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent(lid, lv) AS (VALUES
       |    $cent),
       |cb(sub, cid, cv) AS (VALUES
       |    $cw),
       |asg AS (SELECT vec_id, v, lid, lv FROM (
       |    SELECT e.vec_id, e.v, cent.lid, cent.lv,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY round(list_sum(list_transform(list_zip(e.v, cent.lv),
       |          z -> (z[1] - z[2]) * (z[1] - z[2]))), 6), cent.lid) AS rk
       |    FROM e CROSS JOIN cent WHERE e.vec_id > 7) t WHERE rk = 1),
       |res AS (SELECT vec_id, lid,
       |    list_transform(list_zip(v, lv), z -> z[1] - z[2]) AS r FROM asg),
       |subs AS (SELECT CAST(gs AS INT) AS sub FROM generate_series(0, 7) t(gs)),
       |sv AS (SELECT vec_id, sub, list_slice(r, sub*8 + 1, sub*8 + 8) AS sv
       |       FROM res CROSS JOIN subs),
       |enc AS (SELECT vec_id, sub, cid FROM (
       |    SELECT sv.vec_id, sv.sub, cb.cid,
       |      row_number() OVER (PARTITION BY sv.vec_id, sv.sub
       |        ORDER BY round(list_sum(list_transform(list_zip(sv.sv, cb.cv),
       |          z -> (z[1] - z[2]) * (z[1] - z[2]))), 6), cb.cid) AS rk
       |    FROM sv JOIN cb USING (sub)) t WHERE rk = 1),
       |probes AS (SELECT query_id, lid, coarse_fix FROM (
       |    SELECT e.vec_id AS query_id, cent.lid,
       |      CAST(round(list_inner_product(e.v, cent.lv) * 1e6) AS BIGINT)
       |        AS coarse_fix,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY round(list_sum(list_transform(list_zip(e.v, cent.lv),
       |          z -> (z[1] - z[2]) * (z[1] - z[2]))), 6), cent.lid) AS rk
       |    FROM e CROSS JOIN cent WHERE e.vec_id <= 7) t WHERE rk <= $np),
       |qs AS (SELECT vec_id AS query_id, sub,
       |         list_slice(v, sub*8 + 1, sub*8 + 8) AS qsv
       |       FROM e CROSS JOIN subs WHERE vec_id <= 7),
       |lut AS (SELECT query_id, sub, cid,
       |      CAST(round(list_inner_product(qsv, cv) * 1e6) AS BIGINT) AS pfix
       |    FROM qs JOIN cb USING (sub)),
       |cands AS (SELECT probes.query_id, asg.vec_id, probes.coarse_fix
       |    FROM asg JOIN probes USING (lid)),
       |scored AS (SELECT c.query_id, c.vec_id,
       |      round((c.coarse_fix + sum(l.pfix)) / 1e6, 6) AS adc_dot
       |    FROM cands c JOIN enc ON c.vec_id = enc.vec_id
       |    JOIN lut l ON l.query_id = c.query_id
       |      AND l.sub = enc.sub AND l.cid = enc.cid
       |    GROUP BY c.query_id, c.vec_id, c.coarse_fix),
       |ranked AS (SELECT query_id, vec_id, adc_dot,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_dot DESC, vec_id) AS rank FROM scored)
       |SELECT query_id, CAST(rank AS INT) AS rank, vec_id, adc_dot
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    // The minhash pipeline's exact-Jaccard verify makes its output equal
    // the exact pair set — same oracle as ns_dedup_jaccard.
    "ns_dedup_minhash" -> jaccardPairsOracle,
    "ns_dedup_minhash_salted" -> jaccardPairsOracle,

    // Same recursive component labeling as ns_dedup_keep, then max-
    // n_chars canonical per cluster.
    "ns_dedup_best" ->
      s"""WITH RECURSIVE $jaccardCappedCtes,
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
         |          UNION ALL SELECT doc_b, doc_a FROM jp),
         |reach AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges) t
         |          UNION
         |          SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
         |cl AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
         |m AS (SELECT cl.doc_id, cl.cluster_id, d.n_chars
         |      FROM cl JOIN documents d USING (doc_id)),
         |best AS (SELECT cluster_id, doc_id AS kept_id,
         |           n_chars AS kept_n_chars,
         |           row_number() OVER (PARTITION BY cluster_id
         |             ORDER BY n_chars DESC, doc_id) AS rk FROM m),
         |cnt AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
         |        FROM m GROUP BY 1)
         |SELECT b.cluster_id, kept_id, kept_n_chars, n_members
         |FROM best b JOIN cnt USING (cluster_id)
         |WHERE rk = 1 ORDER BY cluster_id""".stripMargin,

    // Sequential-greedy replay over the exact-jaccard pair graph: a
    // recursive SINGLE-ROW fold (one row per step, list accumulator)
    // walks the (wave, doc_id) order and admits a doc iff no neighbor
    // is already in the admitted list — the lexicographically-first MIS
    // the streaming admission rule defines, computed by an engine with
    // no notion of the Spark frontier loop. UNION ALL recursion is
    // legal because each step emits exactly one row. The fold walks
    // only EDGE-INCIDENT docs: an isolated doc has no neighbor in
    // either direction, so greedy always admits it and it never affects
    // another doc's decision — restricting the sequence preserves every
    // decision while cutting the recursion from |corpus| steps to
    // |incident docs| (the full-corpus fold was minutes at sf0.1).
    // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, so the
    // recursive step would otherwise re-evaluate the whole shingle
    // self-join behind `edges` on EVERY iteration (measured >300 s at
    // sf0.1; 2 s materialized).
    "ns_near_dedup_replay" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |edges AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM jp
         |          UNION ALL SELECT doc_b, doc_a FROM jp),
         |inc AS MATERIALIZED (SELECT DISTINCT u AS doc_id FROM edges),
         |seq AS MATERIALIZED (SELECT doc_id, doc_id % 3 AS wave,
         |          row_number() OVER (ORDER BY doc_id % 3, doc_id) AS rn
         |        FROM inc),
         |fold AS (
         |  SELECT CAST(0 AS BIGINT) AS rn, CAST([] AS BIGINT[]) AS adm
         |  UNION ALL
         |  SELECT s.rn,
         |    CASE WHEN EXISTS (SELECT 1 FROM edges e
         |                      WHERE e.v = s.doc_id
         |                        AND list_contains(f.adm, e.u))
         |         THEN f.adm ELSE list_append(f.adm, s.doc_id) END
         |  FROM fold f JOIN seq s ON s.rn = f.rn + 1),
         |final AS (SELECT adm FROM fold ORDER BY rn DESC LIMIT 1)
         |SELECT d.doc_id, d.doc_id % 3 AS wave FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM inc)
         |UNION ALL
         |SELECT s.doc_id, s.wave
         |FROM seq s, final f WHERE list_contains(f.adm, s.doc_id)
         |ORDER BY doc_id""".stripMargin,

    // Cross-set (batch vs corpus) variant of the jaccard CTE chain.
    "ns_incremental_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
        |sh AS (SELECT doc_id, list_distinct([t[i]||' '||t[i+1]||' '||t[i+2]||' '||
        |         t[i+3]||' '||t[i+4] for i in range(1, len(t)-3)]) s
        |       FROM w WHERE len(t) >= 5),
        |sz AS (SELECT doc_id, len(s) n FROM sh),
        |tn AS (SELECT doc_id AS new_id, unnest(s) g FROM sh WHERE doc_id % 5 = 4),
        |tc AS (SELECT doc_id AS old_id, unnest(s) g FROM sh WHERE doc_id % 5 <> 4),
        |p AS (SELECT new_id, old_id, count(*) AS i
        |      FROM tn JOIN tc USING (g) GROUP BY 1, 2)
        |SELECT new_id, old_id,
        |  round(i * 1.0 / (sn.n + sc.n - i), 6) AS jaccard
        |FROM p JOIN sz sn ON p.new_id = sn.doc_id
        |       JOIN sz sc ON p.old_id = sc.doc_id
        |WHERE round(i * 1.0 / (sn.n + sc.n - i), 6) >= 0.5
        |ORDER BY new_id, old_id""".stripMargin,

    // Paragraph dedup: fixed 20-token chunk md5 fingerprints; a chunk is
    // duplicated when 2+ distinct docs contain it verbatim.
    "ns_paragraph_dedup" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |ci AS (SELECT doc_id, t,
        |    unnest(range(0, ((len(t) - 1) // 20) + 1)) AS i FROM t),
        |ch AS (SELECT doc_id,
        |    md5(array_to_string(t[(i*20 + 1):(i*20 + 20)], ' ')) AS h FROM ci),
        |df AS (SELECT h, count(DISTINCT doc_id) AS ndocs FROM ch GROUP BY h),
        |pd AS (SELECT doc_id, count(*) AS n_chunks,
        |    sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS n_dup
        |  FROM ch JOIN df USING (h) GROUP BY doc_id)
        |SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
        |  CAST(n_dup AS BIGINT) AS n_dup_chunks,
        |  round(CAST(n_dup AS DOUBLE) / n_chunks, 6) AS dup_frac
        |FROM pd ORDER BY doc_id""".stripMargin,

    // Sliding chunk replay: start indices 0,16,32,… stopping at the
    // first start whose 24-token window reaches the doc's end
    // (ceil(max(n-24,0)/16) is the last index — no suffix-duplicate
    // tail chunks), 24-token inclusive-end slice, identical
    // md5-of-rejoined-slice.
    "ns_chunk_overlap" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |ci AS (SELECT doc_id, t,
        |    unnest(range(0, ((greatest(len(t) - 24, 0) + 15) // 16) + 1))
        |      AS i FROM t)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(least(24, len(t) - i * 16) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(t[(i*16 + 1):(i*16 + 24)], ' ')) AS chunk_hash
        |FROM ci ORDER BY doc_id, chunk_idx""".stripMargin,

    // Full simhash replay: per-token 64-bit hash is the md5 prefix (the
    // one hash both engines derive bit-identically — SimHash64's basis),
    // per-bit majority vote, then brute-force Hamming<=3 pairs. Valid as
    // an oracle for the banded Spark plan because 4x16-bit bands
    // pigeonhole-guarantee recall at distance <= 3.
    "ns_dedup_simhash" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents WHERE len(string_split(text, ' ')) > 0),
        |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h FROM toks),
        |bits AS (SELECT doc_id, b,
        |    sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN (SELECT unnest(range(64)) AS b) GROUP BY doc_id, b),
        |sh AS (SELECT doc_id,
        |    bit_or(CASE WHEN v > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END) AS s
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.s, b.s)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Brute-force pair oracle: valid because banded candidate generation
    // is recall-guaranteed (miss ~1e-11/pair) and verification is exact.
    "ns_cosine_dup_pairs" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.45
        |ORDER BY vec_a, vec_b""".stripMargin,

    // Same brute-force pair oracle over the twin-augmented corpus at the
    // realistic dedup threshold; valid for the banded path because banding
    // recall at 128×10 is ~1-2.5e-9 per qualifying pair (and equality was
    // verified at every SF against the fixed planes) and verification is
    // exact.
    "ns_cosine_dup_pairs_banded" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |aug AS (SELECT vec_id, v FROM e
         |  UNION ALL
         |  SELECT vec_id + 1000000,
         |    list_concat([${List.fill(16)("0.0").mkString(",")}], v[17:64]) FROM e)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
         |FROM aug a JOIN aug b ON a.vec_id < b.vec_id
         |WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.85
         |ORDER BY vec_a, vec_b""".stripMargin,

    // Brute-force pair oracle: valid because deletion-neighborhood
    // candidate generation is recall-guaranteed (theorem, not
    // probability) and verification is exact.
    "ns_fuzzy_prefix_pairs" ->
      """WITH p AS (SELECT doc_id, substr(text, 1, 24) AS s FROM documents),
        |aug AS (SELECT doc_id, s FROM p
        |  UNION ALL
        |  SELECT doc_id + 100000000,
        |    substr(s, 1, 9) || 'x' || substr(s, 11, 14) FROM p)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.s, b.s) AS INT) AS edit_dist
        |FROM aug a JOIN aug b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY doc_a, doc_b""".stripMargin,

    // Full replay of the LSH top-k pipeline: sketch from embedded ±1 plane
    // literals, 11 multiprobe buckets (identity + 10 single-bit flips),
    // bucket join, exact cosine, rank.
    "ns_similarity_lsh" ->
      s"""WITH pl AS (SELECT * FROM (VALUES
         |${planeValuesSql(10, 64)}) t(b, s)),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sk AS (SELECT e.vec_id,
         |         CAST(sum(CASE WHEN list_inner_product(pl.s, e.v) >= 0
         |                       THEN 1 << pl.b ELSE 0 END) AS BIGINT) AS bucket
         |       FROM e CROSS JOIN pl GROUP BY e.vec_id),
         |skv AS (SELECT e.vec_id, e.v, sk.bucket FROM e JOIN sk USING (vec_id)),
         |pr AS (SELECT unnest([0, 1, 2, 4, 8, 16, 32, 64, 128, 256, 512]) AS m),
         |q AS (SELECT skv.vec_id AS query_id, skv.v AS qv,
         |        xor(skv.bucket, CAST(pr.m AS BIGINT)) AS bucket
         |      FROM skv CROSS JOIN pr WHERE skv.vec_id <= 7),
         |c AS (SELECT vec_id, v, bucket FROM skv WHERE vec_id > 7),
         |scored AS (SELECT q.query_id, c.vec_id,
         |             round(list_cosine_similarity(q.qv, c.v), 6) AS cos_sim
         |           FROM c JOIN q USING (bucket)),
         |ranked AS (SELECT query_id, vec_id, cos_sim,
         |             row_number() OVER (PARTITION BY query_id
         |               ORDER BY cos_sim DESC, vec_id) AS rank
         |           FROM scored)
         |SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cos_sim
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // Full replay of the IVF pipeline: deterministic coarse centroids
    // (16 lowest-id corpus vectors), nearest-centroid assignment, 4-probe
    // query fan-out, exact cosine within probed lists, rank.
    "ns_similarity_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id > 7
        |       ORDER BY vec_id LIMIT 16),
        |asg AS (SELECT vec_id, v, cid FROM (
        |    SELECT e.vec_id, e.v, c0.cid,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(list_cosine_similarity(e.v, c0.cv), 6) DESC, c0.cid)
        |        AS rk
        |    FROM e CROSS JOIN c0 WHERE e.vec_id > 7) t WHERE rk = 1),
        |q AS (SELECT query_id, qv, cid FROM (
        |    SELECT e.vec_id AS query_id, e.v AS qv, c0.cid,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY round(list_cosine_similarity(e.v, c0.cv), 6) DESC, c0.cid)
        |        AS rk
        |    FROM e CROSS JOIN c0 WHERE e.vec_id <= 7) t WHERE rk <= 4),
        |scored AS (SELECT q.query_id, a.vec_id,
        |    round(list_cosine_similarity(q.qv, a.v), 6) AS cos_sim
        |  FROM asg a JOIN q USING (cid)),
        |ranked AS (SELECT query_id, vec_id, cos_sim,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cos_sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // Full PQ replay: deterministic sample codebook (subvectors of the 16
    // lowest-id corpus vectors), per-subspace nearest-centroid encoding
    // (sequential squared-L2 via list_zip, rounded + cid tie-break), ADC
    // lookup table with fixed-point partial dots, code-only scoring.
    "ns_similarity_pq" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |subs AS (SELECT CAST(gs AS INT) AS sub FROM generate_series(0, 7) t(gs)),
        |seed AS (SELECT vec_id, v FROM e WHERE vec_id > 7 ORDER BY vec_id LIMIT 16),
        |sr AS (SELECT v, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
        |       FROM seed),
        |cb AS (SELECT sub, cid, list_slice(v, sub*8 + 1, sub*8 + 8) AS cv
        |       FROM sr CROSS JOIN subs),
        |sv AS (SELECT vec_id, sub, list_slice(v, sub*8 + 1, sub*8 + 8) AS sv
        |       FROM e CROSS JOIN subs WHERE vec_id > 7),
        |enc AS (SELECT vec_id, sub, cid FROM (
        |    SELECT sv.vec_id, sv.sub, cb.cid,
        |      row_number() OVER (PARTITION BY sv.vec_id, sv.sub
        |        ORDER BY round(list_sum(list_transform(list_zip(sv.sv, cb.cv),
        |          z -> (z[1] - z[2]) * (z[1] - z[2]))), 6),
        |          cb.cid) AS rk
        |    FROM sv JOIN cb USING (sub)) t WHERE rk = 1),
        |qs AS (SELECT vec_id AS query_id, sub,
        |         list_slice(v, sub*8 + 1, sub*8 + 8) AS qsv
        |       FROM e CROSS JOIN subs WHERE vec_id <= 7),
        |lut AS (SELECT query_id, sub, cid,
        |      CAST(round(list_inner_product(qsv, cv) * 1e6) AS BIGINT) AS pfix
        |    FROM qs JOIN cb USING (sub)),
        |scored AS (SELECT query_id, vec_id, round(sum(pfix) / 1e6, 6) AS adc_dot
        |    FROM enc JOIN lut USING (sub, cid) GROUP BY query_id, vec_id),
        |ranked AS (SELECT query_id, vec_id, adc_dot,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY adc_dot DESC, vec_id) AS rank FROM scored)
        |SELECT query_id, CAST(rank AS INT) AS rank, vec_id, adc_dot
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // The IVF oracle's coarse/probe CTEs composed with the PQ oracle's
    // codebook/encode/LUT CTEs; scoring joins the probed lists.
    "ns_similarity_ivfpq" -> (ivfpqAdcCtes +
      """
        |SELECT query_id, CAST(rank AS INT) AS rank, vec_id, adc_dot
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),

    // The same ADC chain truncated at rank <= 20, then the exact-cosine
    // rerank: fetch only the candidates' raw vectors, re-score, re-rank.
    "ns_similarity_ivfpq_rerank" -> (ivfpqAdcCtes +
      """,
        |cand AS (SELECT query_id, vec_id FROM ranked WHERE rank <= 20),
        |ex AS (SELECT c.query_id, c.vec_id,
        |      round(list_cosine_similarity(q.v, t.v), 6) AS cos_sim
        |    FROM cand c JOIN e t ON t.vec_id = c.vec_id
        |    JOIN e q ON q.vec_id = c.query_id),
        |rr AS (SELECT query_id, vec_id, cos_sim,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, vec_id) AS rank FROM ex)
        |SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cos_sim
        |FROM rr WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),

    // The rerank oracle's chain continued two steps: exact-cosine truth
    // top-5, then per-query overlap — recall@5 of the production stack.
    "ns_similarity_recall" -> (ivfpqAdcCtes +
      """,
        |cand AS (SELECT query_id, vec_id FROM ranked WHERE rank <= 20),
        |ex AS (SELECT c.query_id, c.vec_id,
        |      round(list_cosine_similarity(q.v, t.v), 6) AS cos_sim
        |    FROM cand c JOIN e t ON t.vec_id = c.vec_id
        |    JOIN e q ON q.vec_id = c.query_id),
        |rr AS (SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, vec_id) AS rank FROM ex),
        |approx AS (SELECT query_id, vec_id FROM rr WHERE rank <= 5),
        |bscored AS (SELECT q.vec_id AS query_id, t.vec_id,
        |    round(list_cosine_similarity(q.v, t.v), 6) AS cos_sim
        |  FROM e t CROSS JOIN e q WHERE q.vec_id <= 7 AND t.vec_id > 7),
        |truth AS (SELECT query_id, vec_id FROM (
        |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, vec_id) AS rk FROM bscored) x
        |  WHERE rk <= 5)
        |SELECT t.query_id,
        |  CAST(count(a.vec_id) AS BIGINT) AS n_hits,
        |  round(count(a.vec_id) / 5.0, 6) + 0 AS recall_at_5
        |FROM truth t LEFT JOIN approx a
        |  ON a.query_id = t.query_id AND a.vec_id = t.vec_id
        |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin),

    // The rebuild row hashes invariants the oracle can state WITHOUT
    // replaying the (float-mean, summation-order-sensitive) Lloyd
    // training: exact structural counts from the corpus, and booleans
    // whose truth is guaranteed by Lloyd monotonicity / measured margin
    // (see the query comment). A regression in the trained path flips a
    // boolean or a count and the hash goes red.
    "ns_similarity_rebuild" ->
      """SELECT CAST(count(*) - 8 AS BIGINT) AS n_vectors,
        |  CAST((count(*) - 8) * 8 AS BIGINT) AS n_codes,
        |  TRUE AS n_lists_ok, TRUE AS coarse_improved,
        |  TRUE AS pq_improved, TRUE AS recall_total_ok
        |FROM embeddings""".stripMargin,

    // Residual IVF-ADC replay: the frozen quantizer (ResidualTable) as
    // VALUES literals — coordinates reconstructed as fix/1e6 exactly as
    // the Spark path does, so both engines score the identical tables.
    // Then: L2 coarse assignment (rounded-distance + lid tie-break),
    // residual subtraction, per-subspace residual encode, fixed-point
    // ADC LUT, and the linearity split <q, lv + cw> = coarse + residual.
    "ns_similarity_ivfpq_res" -> residualIvfpqOracle,

    "ns_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS representative_id,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,

    "ns_dedup_jaccard" -> jaccardCappedPairsOracle,

    // The Jaccard gram construction re-scored as ordered-pair
    // containment i / |sh(a)|. Candidates ride the SAME df cap as the
    // engine (cappedCandidates expanded to both orders) — see
    // jaccardCappedCtes for why the oracle must replay the cap.
    "ns_dedup_containment" ->
      s"""WITH $jaccardCappedCtes,
         |cando AS (SELECT doc_a, doc_b FROM cand
         |          UNION ALL SELECT doc_b, doc_a FROM cand),
         |po AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
         |      FROM tok a JOIN tok b ON a.g = b.g AND a.doc_id <> b.doc_id
         |      JOIN cando ON cando.doc_a = a.doc_id AND cando.doc_b = b.doc_id
         |      GROUP BY 1, 2)
         |SELECT doc_a, doc_b, round(i * 1.0 / sa.n, 6) AS containment
         |FROM po JOIN sz sa ON po.doc_a = sa.doc_id
         |WHERE round(i * 1.0 / sa.n, 6) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,

    // ns_similarity_topk's oracle over list_slice(v, 1, 16) — the MRL
    // truncated-retrieval tier.
    "ns_embedding_truncate" ->
      """WITH e AS (SELECT vec_id,
        |    list_slice(CAST(embedding AS DOUBLE[]), 1, 16) v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id <= 7),
        |c AS (SELECT vec_id, v FROM e WHERE vec_id > 7),
        |scored AS (SELECT q.query_id, c.vec_id,
        |    round(list_cosine_similarity(q.qv, c.v), 6) AS cos_sim
        |  FROM c CROSS JOIN q),
        |ranked AS (SELECT query_id, vec_id, cos_sim,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cos_sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // Connected components via transitive closure (WITH RECURSIVE) over
    // the same jaccard pair CTEs; cluster id = min reachable doc_id.
    "ns_dedup_clusters" ->
      s"""WITH RECURSIVE $jaccardCappedCtes,
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
         |          UNION ALL SELECT doc_b, doc_a FROM jp),
         |reach AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges) t
         |          UNION
         |          SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u)
         |SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u
         |ORDER BY doc_id""".stripMargin,

    // Impact replay: the same transitive closure, removed = members
    // minus the min-id representative, LEFT JOIN against per-doc
    // whitespace token counts, per-source rollup. count(rm.doc_id)
    // counts non-null matches = Spark's coalesce(sum(rm), 0).
    "ns_dedup_impact" ->
      s"""WITH RECURSIVE $jaccardCappedCtes,
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
         |          UNION ALL SELECT doc_b, doc_a FROM jp),
         |reach AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges) t
         |          UNION
         |          SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
         |cl AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
         |rm AS (SELECT doc_id FROM cl WHERE doc_id <> cluster_id),
         |dt AS (SELECT source, doc_id,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n
         |  FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n) AS BIGINT) AS tokens_total,
         |  CAST(count(rm.doc_id) AS BIGINT) AS n_removed,
         |  CAST(coalesce(sum(CASE WHEN rm.doc_id IS NOT NULL THEN n END), 0)
         |    AS BIGINT) AS tokens_removed
         |FROM dt LEFT JOIN rm ON dt.doc_id = rm.doc_id
         |GROUP BY source ORDER BY source""".stripMargin,

    // Same transitive closure rolled up twice: members per component,
    // then components per size; the size-1 branch is the corpus count
    // minus the graph-member count (mirrored > 0 filter both sides).
    "ns_dedup_cluster_sizes" ->
      s"""WITH RECURSIVE $jaccardCappedCtes,
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
         |          UNION ALL SELECT doc_b, doc_a FROM jp),
         |reach AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges) t
         |          UNION
         |          SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
         |cl AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
         |csz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM cl GROUP BY 1),
         |hist AS (SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
         |      FROM csz GROUP BY 1
         |      UNION ALL
         |      SELECT CAST(1 AS BIGINT),
         |        (SELECT CAST(count(*) AS BIGINT) FROM documents)
         |          - (SELECT CAST(count(*) AS BIGINT) FROM cl))
         |SELECT cluster_size, n_clusters FROM hist
         |WHERE n_clusters > 0 ORDER BY cluster_size""".stripMargin,

    // Same transitive closure; drop every member whose component min is
    // not itself, keep the rest of the corpus.
    "ns_dedup_keep" ->
      s"""WITH RECURSIVE $jaccardCappedCtes,
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
         |          UNION ALL SELECT doc_b, doc_a FROM jp),
         |reach AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges) t
         |          UNION
         |          SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
         |cl AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d
         |WHERE d.doc_id NOT IN
         |  (SELECT doc_id FROM cl WHERE doc_id <> cluster_id)
         |ORDER BY doc_id""".stripMargin,

    "ns_dedup_threshold_sweep" ->
      s"""WITH $jaccardCappedCtes
         |SELECT floor(jaccard * 10) / 10 AS band,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM jp GROUP BY 1 ORDER BY band""".stripMargin,

    "ns_dup_inflation" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
        |  round(CAST(count(*) AS DOUBLE) / count(DISTINCT md5(text)), 6)
        |    AS inflation,
        |  round(CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE)
        |    / count(*), 6) AS dup_frac
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // Matrix replay: the shared jaccard-pair CTEs joined to each side's
    // source, canonicalized unordered with least/greatest.
    "ns_dup_cross_source" ->
      s"""WITH $jaccardCappedCtes
         |SELECT least(da.source, db.source) AS source_a,
         |  greatest(da.source, db.source) AS source_b,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM jp
         |  JOIN documents da ON jp.doc_a = da.doc_id
         |  JOIN documents db ON jp.doc_b = db.doc_id
         |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,

    // Soft-dedup replay: the same transitive closure, cluster sizes, and
    // 1/|cluster| with non-members defaulting to a full weight of 1.
    "ns_dedup_soft" ->
      s"""WITH RECURSIVE $jaccardCappedCtes,
         |edges AS (SELECT doc_a AS u, doc_b AS v FROM jp
         |          UNION ALL SELECT doc_b, doc_a FROM jp),
         |reach AS (SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges) t
         |          UNION
         |          SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
         |cl AS (SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
         |csz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_n
         |        FROM cl GROUP BY cluster_id)
         |SELECT d.doc_id,
         |  coalesce(csz.cluster_n, CAST(1 AS BIGINT)) AS cluster_n,
         |  round(1.0 / coalesce(csz.cluster_n, CAST(1 AS BIGINT)), 6) AS weight
         |FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
         |  LEFT JOIN csz ON cl.cluster_id = csz.cluster_id
         |ORDER BY d.doc_id""".stripMargin,

    // Novelty replay over raw shingle strings (the engine groups
    // xxhash64 of the same strings — green rows prove no collision).
    "ns_ngram_novelty" ->
      s"""WITH $jaccardCtes,
         |own AS (SELECT g, min(doc_id) AS owner FROM tok GROUP BY g)
         |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN o.owner = t.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_novel,
         |  round(CAST(sum(CASE WHEN o.owner = t.doc_id THEN 1 ELSE 0 END)
         |          AS DOUBLE) / count(*), 6) AS novelty
         |FROM tok t JOIN own o USING (g)
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,

    "ns_tfidf_top_terms" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)),
        |    '\s+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM toks WHERE term <> '' GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (SELECT doc_id, term,
        |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (SELECT doc_id, term, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, CAST(rank AS INT) AS rank, term, tfidf
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // Same md5-prefix hash convention as ns_split_assign; per-shard
    // row_number replays the per-worker ordering exactly.
    "ns_train_order" ->
      """WITH k AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8))
        |      ::UINTEGER AS BIGINT) AS shuffle_key
        |  FROM documents),
        |s AS (SELECT doc_id, shuffle_key,
        |    CAST(shuffle_key % 8 AS INT) AS shard FROM k)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard
        |    ORDER BY shuffle_key, doc_id) AS INT) AS position, shuffle_key
        |FROM s ORDER BY shard, position""".stripMargin,

    // Curriculum replay: the ns_quality_lr logit fold, exact
    // ceil(q·n)-element tertile cutpoints in (lr_score, doc_id) rank
    // order (the sketch is rank-exact for n ≤ accuracy — the
    // ns_ppl_buckets device), DESCENDING phase rule mirrored
    // token-for-token (1 + (score ≤ c2) + (score ≤ c1)), and the
    // ns_train_order md5(doc_id:seed) shuffle within (phase, shard).
    "ns_curriculum_order" ->
      s"""WITH $curriculumCtes
        |SELECT doc_id, lr_score, phase, shard,
        |  CAST(row_number() OVER (PARTITION BY phase, shard
        |    ORDER BY shuffle_key, doc_id) AS INT) AS position
        |FROM (SELECT doc_id, lr_score, phase, shuffle_key,
        |        CAST(shuffle_key % 8 AS INT) AS shard FROM p)
        |ORDER BY phase, shard, position""".stripMargin,

    // Curriculum × mixture replay (r16): the shared curriculum chain
    // down to p (doc_id, phase), joined to per-doc source/whitespace
    // token counts, rolled up per (phase, source). count/sum promote —
    // cast back to BIGINT.
    "ns_curriculum_mix" ->
      s"""WITH $curriculumCtes,
        |dt AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n
        |  FROM documents)
        |SELECT phase, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_tokens
        |FROM p JOIN dt USING (doc_id)
        |GROUP BY 1, 2 ORDER BY phase, source""".stripMargin,

    "ns_sample_hash_rate" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UINTEGER
        |        % 1000000 < 100000
        |ORDER BY doc_id""".stripMargin,

    "ns_split_assign" ->
      """SELECT doc_id, source,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UINTEGER
        |    % 100 AS BIGINT) AS bucket,
        |  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UINTEGER
        |         % 100 < 80 THEN 'train'
        |       WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UINTEGER
        |         % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "ns_domain_cap" ->
      """SELECT source, doc_id, n_chars FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 3 ORDER BY source, doc_id""".stripMargin,

    "ns_sample_stratified" ->
      """WITH r AS (SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
        |  FROM documents)
        |SELECT lang, CAST(rank AS INT) AS rank, doc_id
        |FROM r WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,

    // ns_similarity_topk's ranked CTE joined to labels, majority vote
    // with (votes DESC, label) tie-break, scored against the query's
    // own label.
    "ns_knn_classify" ->
      """WITH e AS (SELECT vec_id, label,
        |       CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id <= 7),
        |c AS (SELECT vec_id, v FROM e WHERE vec_id > 7),
        |scored AS (SELECT q.query_id, c.vec_id,
        |    round(list_cosine_similarity(q.qv, c.v), 6) AS cos_sim
        |  FROM c CROSS JOIN q),
        |ranked AS (SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, vec_id) AS rank
        |  FROM scored),
        |votes AS (SELECT r.query_id, el.label,
        |    CAST(count(*) AS BIGINT) AS votes
        |  FROM ranked r JOIN e el ON el.vec_id = r.vec_id
        |  WHERE r.rank <= 5 GROUP BY 1, 2),
        |best AS (SELECT query_id, label AS predicted, votes FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY votes DESC, label) AS rk FROM votes) t
        |  WHERE rk = 1)
        |SELECT b.query_id, b.predicted, b.votes, t.label AS true_label,
        |  b.predicted = t.label AS correct
        |FROM best b JOIN e t ON t.vec_id = b.query_id
        |ORDER BY b.query_id""".stripMargin,

    "ns_similarity_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id <= 7),
        |c AS (SELECT vec_id, v FROM e WHERE vec_id > 7),
        |scored AS (SELECT q.query_id, c.vec_id,
        |    round(list_cosine_similarity(q.qv, c.v), 6) AS cos_sim
        |  FROM c CROSS JOIN q),
        |ranked AS (SELECT query_id, vec_id, cos_sim,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_sim DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT query_id, CAST(rank AS INT) AS rank, vec_id, cos_sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "ns_embedding_norms" ->
      """WITH e AS (SELECT label,
        |    sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
        |                            CAST(embedding AS DOUBLE[]))) AS norm
        |  FROM embeddings)
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  round(min(norm), 6) AS min_norm, round(max(norm), 6) AS max_norm
        |FROM e GROUP BY label ORDER BY label""".stripMargin,

    "ns_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+')) AS INT) AS n_re_tokens,
        |  CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS INT)
        |    AS n_distinct_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The frozen unigram tokenizer replayed per word: the corpus's
    // closed word vocabulary (identical across SFs by the generator's
    // construction) maps each word to its Viterbi piece count, derived
    // at oracle-build time from the SAME committed UnigramTable the
    // Spark expression encodes with. An out-of-vocabulary word would
    // fail the inner join and shift the sum — a detected mismatch, not
    // a silent one; empty docs come back as 0 through the left join.
    "ns_token_count_unigram" -> {
      val vals = Seq("a", "agg", "batch", "big", "column", "customer",
        "data", "dup", "fast", "filter", "group", "hash", "join", "key",
        "line", "merge", "order", "part", "query", "row", "scan", "slow",
        "small", "sort", "spark", "stream", "table", "the", "value",
        "vector", "window")
        .map(w => s"('$w', ${graft.functions.Unigram.encode(w).length})")
        .mkString(", ")
      s"""WITH w AS (SELECT doc_id,
         |    unnest(string_split_regex(text, '\\s+')) AS tok
         |  FROM documents),
         |c AS (SELECT doc_id, CAST(sum(m.n) AS INT) AS n
         |  FROM w JOIN (VALUES $vals) AS m(tok, n) ON w.tok = m.tok
         |  GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(c.n, 0) AS n_unigram_tokens
         |FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // The committed BpeTable merge list replayed literally: merge rank r
    // is one replace(s, chr(a)||chr(b), chr(256+r)) — left-to-right
    // non-overlapping, exactly one encoder pass — and the final token
    // count is the codepoint length of the symbol string (staged through
    // CTEs to stay under DuckDB's 128-deep expression-binding cap).
    // Valid because the corpus is ASCII (byte == codepoint); the Spark
    // side runs on true UTF-8 bytes.
    "ns_token_count_bpe" ->
      graft.functions.Bpe.oracleSql("documents", "doc_id", "text",
        "n_bpe_tokens"),

    // SEQUENTIAL BPE-training replay: 12 rounds, each counting adjacent
    // pairs WITH overlaps (substr(s, i, 2) over every position), taking
    // the (n DESC, pair) argmax — pair-string byte order is monotone in
    // the (a, b) codepoint order the trainer tie-breaks by — and
    // applying the merge as one left-to-right replace() pass. Pins the
    // BATCHED distributed trainer rank-for-rank and count-for-count
    // (the greedy-prefix safety proof says batching changes neither).
    "ns_bpe_train" -> {
      val rounds = 12
      // MATERIALIZED, not plain CTEs: DuckDB inlines CTE references, so
      // round r's tree would re-expand rounds 0..r-1 once per reference
      // — t_r twice per level makes the replay EXPONENTIAL in rounds
      // (measured: minutes for 12 rounds over 500 docs; materialized,
      // sub-second)
      // strlen (bytes) = length (chars) ⇔ pure ASCII — the byte-level
      // trainer and this character-level replay agree only there (r15)
      val sb = new StringBuilder("WITH s0 AS MATERIALIZED " +
        "(SELECT text AS s FROM documents WHERE doc_id < 500" +
        " AND strlen(text) = length(text))")
      for (r <- 0 until rounds) {
        sb.append(s""",
          |x$r AS (SELECT s, unnest(range(1, length(s))) AS i FROM s$r),
          |p$r AS (SELECT substr(s, CAST(i AS INT), 2) AS pr,
          |    CAST(count(*) AS BIGINT) AS n
          |  FROM x$r GROUP BY 1),
          |t$r AS MATERIALIZED (
          |  SELECT pr, n FROM p$r ORDER BY n DESC, pr LIMIT 1),
          |s${r + 1} AS MATERIALIZED (SELECT
          |    replace(s, (SELECT pr FROM t$r), chr(${256 + r})) AS s
          |  FROM s$r)""".stripMargin)
      }
      sb.append("\n" + (0 until rounds).map(r =>
        s"SELECT CAST($r AS INT) AS rank, " +
          s"unicode(substr(pr, 1, 1)) AS a, " +
          s"unicode(substr(pr, 2, 1)) AS b, n FROM t$r")
        .mkString("", "\nUNION ALL\n", "\nORDER BY rank"))
      sb.toString
    },

    // The BPE replace-chain CTEs rolled up per language.
    "ns_tokenizer_fertility" -> {
      val (ctes, last) = graft.functions.Bpe.oracleCtes(
        "documents", "doc_id", "text")
      s"""$ctes,
         |bp AS (SELECT doc_id, CAST(length(s) AS BIGINT) AS nb FROM $last),
         |ws AS (SELECT doc_id, lang,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
         |      AS nw
         |  FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(nw) AS BIGINT) AS n_ws_tokens,
         |  CAST(sum(nb) AS BIGINT) AS n_bpe_tokens,
         |  round(CAST(CAST(sum(nb) AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(sum(nw) AS BIGINT) AS DOUBLE), 6) + 0 AS fertility
         |FROM ws JOIN bp USING (doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin
    },

    // Same fixed-point contribution sum as ns_dsir_score: each char's
    // -p·ln(p) is rounded to 6 decimals, then summed as round(x*1e6)
    // BIGINTs — addition is associative in fixed point, so engine-side
    // aggregation order cannot shift an ulp.
    "ns_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents),
        |pc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
        |t AS (SELECT doc_id, c,
        |    sum(c) OVER (PARTITION BY doc_id) AS n_chars,
        |    count(*) OVER (PARTITION BY doc_id) AS n_distinct_chars
        |  FROM pc),
        |co AS (SELECT doc_id, n_chars, n_distinct_chars,
        |    round(-(CAST(c AS DOUBLE) / n_chars) *
        |      ln(CAST(c AS DOUBLE) / n_chars), 6) AS contrib
        |  FROM t)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |  CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars,
        |  round(CAST(sum(CAST(round(contrib * 1e6) AS BIGINT)) AS BIGINT)
        |    / 1e6, 6) AS char_entropy
        |FROM co GROUP BY doc_id, n_chars, n_distinct_chars
        |ORDER BY doc_id""".stripMargin,

    "ns_text_quality" ->
      """WITH f AS (SELECT doc_id, text,
        |    CAST(length(text) AS INT) AS n_chars,
        |    string_split_regex(trim(text), '\s+') AS toks,
        |    length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'))
        |      AS n_punct,
        |    length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
        |    length(text) - length(regexp_replace(text, '\s', '', 'g')) AS n_ws
        |  FROM documents)
        |SELECT doc_id, n_chars, CAST(len(toks) AS INT) AS n_tokens,
        |  round(CAST(n_chars AS DOUBLE) / greatest(len(toks), 1), 6) AS chars_per_token,
        |  round(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 6) AS punct_ratio,
        |  round(CAST(n_upper AS DOUBLE) / greatest(n_chars, 1), 6) AS upper_ratio,
        |  round(CAST(n_ws AS DOUBLE) / greatest(n_chars, 1), 6) AS ws_ratio,
        |  round(CAST(len(list_filter(toks, t -> t IN
        |    ('the','a','of','and','to','in','is','it'))) AS DOUBLE) / greatest(len(toks), 1), 6)
        |    AS stopword_ratio
        |FROM f ORDER BY doc_id""".stripMargin,

    // same feature CTE as ns_text_quality; logit folds left-to-right
    // over the rounded features exactly as the Spark expression does
    "ns_quality_lr" ->
      """WITH f AS (SELECT doc_id, text,
        |    CAST(length(text) AS INT) AS n_chars,
        |    string_split_regex(trim(text), '\s+') AS toks,
        |    length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'))
        |      AS n_punct,
        |    length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    round(CAST(n_chars AS DOUBLE) / greatest(len(toks), 1), 6) AS cpt,
        |    round(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 6) AS punct,
        |    round(CAST(n_upper AS DOUBLE) / greatest(n_chars, 1), 6) AS upper_r,
        |    round(CAST(len(list_filter(toks, t -> t IN
        |      ('the','a','of','and','to','in','is','it'))) AS DOUBLE) / greatest(len(toks), 1), 6)
        |      AS stop
        |  FROM f),
        |s AS (SELECT doc_id,
        |    round(1.0 / (1.0 + exp(-(-6.5 + 20.0*stop + 1.0*cpt
        |      + -12.0*punct + -8.0*upper_r))), 6) AS lr_score
        |  FROM g)
        |SELECT doc_id, lr_score, lr_score >= 0.5 AS keep
        |FROM s ORDER BY doc_id""".stripMargin,

    "ns_lang_id" ->
      """WITH t AS (SELECT doc_id, lang AS labeled_lang,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id, labeled_lang,
        |    CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it'))) AS INT) AS s_en,
        |    CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein','zu','mit'))) AS INT) AS s_de,
        |    CAST(len(list_filter(toks, x -> x IN ('el','la','de','que','y','en','un','es'))) AS INT) AS s_es,
        |    CAST(len(list_filter(toks, x -> x IN ('le','la','de','et','un','est','que','pour'))) AS INT) AS s_fr,
        |    CAST(len(list_filter(toks, x -> x IN ('的','是','了','在','我','有','和','不'))) AS INT) AS s_zh
        |  FROM t)
        |SELECT doc_id, labeled_lang,
        |  CASE
        |    WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |    WHEN s_de > 0 AND s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |    WHEN s_es > 0 AND s_es >= s_en AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |    WHEN s_fr > 0 AND s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
        |    WHEN s_zh > 0 AND s_zh >= s_en AND s_zh >= s_de AND s_zh >= s_es AND s_zh >= s_fr THEN 'zh'
        |    ELSE 'und' END AS predicted_lang,
        |  s_en, s_de, s_es, s_fr, s_zh
        |FROM s ORDER BY doc_id""".stripMargin,

    "ns_contamination" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
        |sh AS (SELECT doc_id, list_distinct([t[i]||' '||t[i+1]||' '||t[i+2]||' '||
        |         t[i+3]||' '||t[i+4]||' '||t[i+5]||' '||t[i+6]||' '||t[i+7]
        |         for i in range(1, len(t)-6)]) s
        |       FROM w WHERE len(t) >= 8),
        |ev AS (SELECT doc_id AS eval_id, unnest(s) g FROM sh WHERE doc_id % 10 = 0),
        |co AS (SELECT doc_id, unnest(s) g FROM sh WHERE doc_id % 10 <> 0)
        |SELECT co.doc_id,
        |  CAST(count(DISTINCT co.g) AS BIGINT) AS n_shared_ngrams,
        |  CAST(count(DISTINCT ev.eval_id) AS BIGINT) AS n_eval_docs
        |FROM co JOIN ev USING (g) GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "ns_source_coverage" ->
      """WITH per AS (SELECT source,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |      AS nt
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(nt) AS BIGINT) AS tot FROM per),
        |r AS (SELECT source, nt,
        |    row_number() OVER (ORDER BY nt DESC, source) AS rank,
        |    CAST(sum(nt) OVER (ORDER BY nt DESC, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM per)
        |SELECT CAST(rank AS INT) AS rank, source, nt,
        |  round(CAST(cum AS DOUBLE) / tot, 6) + 0 AS cum_share
        |FROM r CROSS JOIN tot
        |WHERE (cum - nt) * 10 < tot * 9
        |ORDER BY rank""".stripMargin,

    // Stagewise replay of Corpus.trainingMix: each CTE is the
    // corresponding component oracle scoped to the previous stage's
    // survivors (quality/median, exact-dedup min-id, the contamination
    // gram join, the windowed domain cap, the temperature threshold in
    // integer space, the md5 split buckets).
    "ns_training_mix" ->
      """WITH q AS (SELECT doc_id,
        |    round(CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> t IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE) /
        |      len(string_split_regex(trim(text), '\s+')), 6) AS sr
        |  FROM documents),
        |m AS (SELECT round(quantile_cont(sr, 0.5), 6) AS med FROM q),
        |s1 AS (SELECT d.doc_id, d.source, d.lang, d.n_chars, d.text
        |       FROM documents d JOIN q USING (doc_id) CROSS JOIN m
        |       WHERE q.sr > m.med),
        |s2 AS (SELECT s1.* FROM s1 JOIN (SELECT min(doc_id) AS doc_id
        |        FROM s1 GROUP BY md5(text)) r USING (doc_id)),
        |w AS (SELECT doc_id, string_split(text, ' ') t FROM documents),
        |sh AS (SELECT doc_id, list_distinct([t[i]||' '||t[i+1]||' '||t[i+2]||' '||
        |         t[i+3]||' '||t[i+4]||' '||t[i+5]||' '||t[i+6]||' '||t[i+7]
        |         for i in range(1, len(t)-6)]) s
        |       FROM w WHERE len(t) >= 8),
        |evg AS (SELECT DISTINCT unnest(s) g FROM sh WHERE doc_id % 10 = 0),
        |cont AS (SELECT DISTINCT co.doc_id FROM
        |    (SELECT doc_id, unnest(s) g FROM sh WHERE doc_id % 10 <> 0) co
        |    JOIN evg USING (g)),
        |s3 AS (SELECT doc_id, source, lang, n_chars,
        |         len(string_split_regex(trim(text), '\s+')) AS n_tokens
        |       FROM s2 WHERE doc_id % 10 <> 0
        |         AND doc_id NOT IN (SELECT doc_id FROM cont)),
        |s4 AS (SELECT doc_id, source, lang, n_tokens FROM (
        |        SELECT s3.*, row_number() OVER (PARTITION BY source
        |          ORDER BY n_chars DESC, doc_id) AS rk FROM s3) t
        |       WHERE rk <= 50),
        |per AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS nt
        |        FROM s4 GROUP BY source),
        |mn AS (SELECT min(nt) AS n_min FROM per),
        |kr AS (SELECT source,
        |         round(pow(CAST(n_min AS DOUBLE) / nt, 0.3), 6) AS keep_rate
        |       FROM per CROSS JOIN mn),
        |s5 AS (SELECT s4.* FROM s4 JOIN kr USING (source)
        |       WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UINTEGER
        |             % 1000000 < CAST(round(keep_rate * 1e6) AS BIGINT))
        |SELECT doc_id, source, lang,
        |  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8))::UINTEGER
        |         % 100 < 80 THEN 'train'
        |       WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8))::UINTEGER
        |         % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM s5 ORDER BY doc_id""".stripMargin,

    "ns_lm_perplexity" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(ws) AS w FROM t),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu FROM tok GROUP BY w),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM uni),
        |bg AS (SELECT doc_id, unnest(list_filter(list_zip(ws, ws[2:]),
        |    p -> p[2] IS NOT NULL)) AS p FROM t),
        |bgf AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bg),
        |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM bgf GROUP BY w1, w2),
        |scored AS (SELECT bgf.doc_id, -ln((bc.cb + 1.0) / (uni.cu + v.vocab)) AS nlp
        |  FROM bgf JOIN bc USING (w1, w2) JOIN uni ON bgf.w1 = uni.w CROSS JOIN v)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  round(avg(nlp), 6) AS avg_nlp, round(exp(avg(nlp)), 4) AS ppl
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // lang-id replay rolled up to the confusion matrix; share is one
    // division of exact longs (unrounded — bit-identical).
    "ns_lang_confusion" ->
      """WITH t AS (SELECT doc_id, lang AS labeled_lang,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id, labeled_lang,
        |    CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','it'))) AS INT) AS s_en,
        |    CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein','zu','mit'))) AS INT) AS s_de,
        |    CAST(len(list_filter(toks, x -> x IN ('el','la','de','que','y','en','un','es'))) AS INT) AS s_es,
        |    CAST(len(list_filter(toks, x -> x IN ('le','la','de','et','un','est','que','pour'))) AS INT) AS s_fr,
        |    CAST(len(list_filter(toks, x -> x IN ('的','是','了','在','我','有','和','不'))) AS INT) AS s_zh
        |  FROM t),
        |p AS (SELECT labeled_lang,
        |  CASE
        |    WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |    WHEN s_de > 0 AND s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |    WHEN s_es > 0 AND s_es >= s_en AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |    WHEN s_fr > 0 AND s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
        |    WHEN s_zh > 0 AND s_zh >= s_en AND s_zh >= s_de AND s_zh >= s_es AND s_zh >= s_fr THEN 'zh'
        |    ELSE 'und' END AS predicted_lang
        |  FROM s),
        |cells AS (SELECT labeled_lang, predicted_lang,
        |    CAST(count(*) AS BIGINT) AS n_docs FROM p GROUP BY 1, 2),
        |tot AS (SELECT labeled_lang, CAST(sum(n_docs) AS BIGINT) AS n_labeled
        |  FROM cells GROUP BY 1)
        |SELECT c.labeled_lang, c.predicted_lang, c.n_docs,
        |  c.n_docs * 1.0 / t.n_labeled AS share
        |FROM cells c JOIN tot t USING (labeled_lang)
        |ORDER BY c.labeled_lang, c.predicted_lang""".stripMargin,

    // the composed r11 pipeline: lm chain -> per-lang cutpoints ->
    // doc-level buckets, Gopher metrics -> pass filter, md5 min-id keep
    // among survivors, per-source rollup — each stage the committed
    // oracle shape of its scored standalone query.
    "ns_curation_pipeline" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(ws) AS w FROM t),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu FROM tok GROUP BY w),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM uni),
        |bg AS (SELECT doc_id, unnest(list_filter(list_zip(ws, ws[2:]),
        |    p -> p[2] IS NOT NULL)) AS p FROM t),
        |bgf AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bg),
        |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM bgf GROUP BY w1, w2),
        |scored AS (SELECT bgf.doc_id, -ln((bc.cb + 1.0) / (uni.cu + v.vocab)) AS nlp
        |  FROM bgf JOIN bc USING (w1, w2) JOIN uni ON bgf.w1 = uni.w CROSS JOIN v),
        |ppl AS (SELECT doc_id, round(exp(avg(nlp)), 4) AS ppl
        |  FROM scored GROUP BY doc_id),
        |wl AS (SELECT p.doc_id, d.lang, p.ppl
        |  FROM ppl p JOIN documents d USING (doc_id)),
        |ranked AS (SELECT lang, ppl,
        |    row_number() OVER (PARTITION BY lang ORDER BY ppl, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS cnt FROM wl),
        |cuts AS (SELECT lang,
        |    max(CASE WHEN rn = CAST(ceil(cnt * (1.0/3)) AS BIGINT)
        |        THEN ppl END) AS c1,
        |    max(CASE WHEN rn = CAST(ceil(cnt * (2.0/3)) AS BIGINT)
        |        THEN ppl END) AS c2
        |  FROM ranked GROUP BY lang),
        |bkt AS (SELECT wl.doc_id,
        |    1 + CAST(wl.ppl > c.c1 AS INT) + CAST(wl.ppl > c.c2 AS INT)
        |      AS bucket
        |  FROM wl JOIN cuts c USING (lang)),
        |gw AS (SELECT doc_id, source, string_split(text, ' ') w FROM documents),
        |gm AS (SELECT doc_id, source,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS char_sum,
        |    CAST(len(list_filter(w, x -> contains(x, '#')
        |        OR contains(x, '...'))) AS BIGINT) AS symbol_words,
        |    CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
        |      AS BIGINT) AS alpha_words,
        |    CAST(len(list_filter(w, x -> list_contains(
        |        ['the','be','to','of','and','that','have','with'],
        |        lower(x)))) AS BIGINT) AS stopword_hits
        |  FROM gw),
        |gp AS (SELECT doc_id, source, n_words FROM gm
        |  WHERE n_words BETWEEN 50 AND 100000
        |    AND char_sum * 1.0 / n_words BETWEEN 3.0 AND 10.0
        |    AND symbol_words * 1.0 / n_words <= 0.1
        |    AND alpha_words * 1.0 / n_words >= 0.8
        |    AND stopword_hits >= 2),
        |surv AS (SELECT gp.doc_id, gp.source, gp.n_words, md5(d.text) AS h
        |  FROM gp JOIN bkt USING (doc_id) JOIN documents d USING (doc_id)
        |  WHERE bkt.bucket <= 2),
        |canon AS (SELECT h, min(doc_id) AS doc_id FROM surv GROUP BY h)
        |SELECT s.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(s.n_words) AS BIGINT) AS n_tokens
        |FROM surv s JOIN canon USING (doc_id)
        |GROUP BY s.source ORDER BY s.source""".stripMargin,

    // lm replay extended with per-lang rank-exact tertile cutpoints
    // (ceil(q·n)-th order statistics — the w_ntile_approx convention)
    // and the fixed-point bucket mean.
    "ns_ppl_buckets" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(ws) AS w FROM t),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu FROM tok GROUP BY w),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM uni),
        |bg AS (SELECT doc_id, unnest(list_filter(list_zip(ws, ws[2:]),
        |    p -> p[2] IS NOT NULL)) AS p FROM t),
        |bgf AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bg),
        |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM bgf GROUP BY w1, w2),
        |scored AS (SELECT bgf.doc_id, -ln((bc.cb + 1.0) / (uni.cu + v.vocab)) AS nlp
        |  FROM bgf JOIN bc USING (w1, w2) JOIN uni ON bgf.w1 = uni.w CROSS JOIN v),
        |ppl AS (SELECT doc_id, round(exp(avg(nlp)), 4) AS ppl
        |  FROM scored GROUP BY doc_id),
        |wl AS (SELECT p.doc_id, d.lang, p.ppl
        |  FROM ppl p JOIN documents d USING (doc_id)),
        |ranked AS (SELECT lang, ppl,
        |    row_number() OVER (PARTITION BY lang ORDER BY ppl, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS cnt FROM wl),
        |cuts AS (SELECT lang,
        |    max(CASE WHEN rn = CAST(ceil(cnt * (1.0/3)) AS BIGINT)
        |        THEN ppl END) AS c1,
        |    max(CASE WHEN rn = CAST(ceil(cnt * (2.0/3)) AS BIGINT)
        |        THEN ppl END) AS c2
        |  FROM ranked GROUP BY lang),
        |b AS (SELECT wl.lang,
        |    1 + CAST(wl.ppl > c.c1 AS INT) + CAST(wl.ppl > c.c2 AS INT)
        |      AS bucket,
        |    wl.ppl FROM wl JOIN cuts c USING (lang))
        |SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(ppl) AS lo_ppl, max(ppl) AS hi_ppl,
        |  CAST(sum(CAST(round(ppl * 10000) AS BIGINT)) AS DOUBLE)
        |    / (10000.0 * count(*)) AS avg_ppl
        |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,

    "ns_dup_ngram_spans" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |g AS (SELECT doc_id, i AS pos, list_aggr(ws[i:i+7], 'string_agg', ' ') AS gram
        |  FROM t, unnest(range(1, len(ws) - 6)) AS u(i)),
        |d AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) >= 2 AS dup FROM g),
        |runs AS (SELECT doc_id, pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM d WHERE dup),
        |rl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS run_len FROM runs GROUP BY doc_id, grp),
        |agg AS (SELECT doc_id, max(run_len) AS max_dup_run,
        |    CAST(sum(run_len) AS BIGINT) AS n_dup_grams FROM rl GROUP BY doc_id)
        |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  COALESCE(max(agg.n_dup_grams), 0) AS n_dup_grams,
        |  COALESCE(max(agg.max_dup_run), 0) AS max_dup_run,
        |  CASE WHEN COALESCE(max(agg.max_dup_run), 0) > 0
        |    THEN COALESCE(max(agg.max_dup_run), 0) + 7 ELSE 0 END AS max_dup_span_tokens
        |FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    // 1-based positions here vs Spark's 0-based: offsets are internal,
    // only the reassembled text and counts are compared
    "ns_dup_span_removal" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
        |  FROM documents),
        |g AS (SELECT doc_id, i AS pos, list_aggr(ws[i:i+7], 'string_agg', ' ') AS gram
        |  FROM t, unnest(range(1, len(ws) - 6)) AS u(i)),
        |d AS (SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) >= 2 AS dup
        |    FROM g) WHERE dup),
        |cov AS (SELECT DISTINCT doc_id, pos + o AS cpos
        |  FROM d, unnest(range(0, 8)) AS v(o)),
        |tok AS (SELECT t.doc_id, ws[i] AS tok, CAST(i AS BIGINT) AS pos
        |  FROM t, unnest(range(1, len(ws) + 1)) AS u(i)),
        |kept AS (SELECT tok.doc_id, tok.pos, tok.tok FROM tok
        |  LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.cpos
        |  WHERE cov.doc_id IS NULL),
        |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
        |    CAST(count(*) AS BIGINT) AS n_kept FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM t)
        |SELECT tot.doc_id, COALESCE(agg.clean_text, '') AS clean_text,
        |  tot.n_tokens, COALESCE(agg.n_kept, 0) AS n_kept_tokens,
        |  tot.n_tokens - COALESCE(agg.n_kept, 0) AS n_removed_tokens
        |FROM tot LEFT JOIN agg ON tot.doc_id = agg.doc_id
        |ORDER BY tot.doc_id""".stripMargin,

    "ns_seq_packing" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |    -- window sum(BIGINT) is HUGEINT in DuckDB; cast so seq_id /
        |    -- seq_offset come out BIGINT like Spark's (r02 hash mismatch)
        |    CAST(sum(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) - n_tokens AS start FROM t)
        |SELECT doc_id, n_tokens, start // 512 AS seq_id, start % 512 AS seq_offset
        |FROM c ORDER BY doc_id""".stripMargin,

    // the BPE CTE chain computes the symbol string; packing then runs
    // the identical prefix-sum arithmetic over its length
    "ns_seq_packing_bpe" -> {
      val (ctes, last) =
        graft.functions.Bpe.oracleCtes("documents", "doc_id", "text")
      s"""$ctes,
         |t AS (SELECT doc_id, CAST(length(s) AS BIGINT) AS n_tokens
         |  FROM $last),
         |c AS (SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) - n_tokens AS start FROM t)
         |SELECT doc_id, n_tokens, start // 512 AS seq_id, start % 512 AS seq_offset
         |FROM c ORDER BY doc_id""".stripMargin
    },

    "ns_heavy_hitters" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)),
        |    '\s+')) AS token FROM documents),
        |counts AS (SELECT token, CAST(count(*) AS BIGINT) AS freq,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM tok WHERE token <> '' GROUP BY 1),
        |ranked AS (SELECT token, freq, n_docs,
        |    row_number() OVER (ORDER BY freq DESC, token) AS rank FROM counts)
        |SELECT CAST(rank AS INT) AS rank, token, freq, n_docs
        |FROM ranked WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "ns_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      [CAST(unicode(c) AS BIGINT) for c in split(text, '')]),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "ns_multimodal_meta" ->
      """SELECT doc_id AS asset_id,
        |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS byte_len,
        |  md5(text) AS content_md5
        |FROM documents ORDER BY asset_id""".stripMargin,

    // Literals only: the fixture bytes are COMMITTED (byte_len is a
    // constant of the repo — 661 for photo.jpg, 12 for the garbage
    // blob, 24+40=64 for the truncated JPEG) and 16x12x3 are container
    // facts of the fixture every compliant JPEG decoder reports. The
    // corrupt rows' all-NULL metadata is the quarantine contract under
    // oracle check: a decoder change that starts throwing (task
    // failure) or returning partial metadata flips the hash.
    // Video literals from the ISO 14496-12 layout: ftyp 20 B + largesize
    // moov 16+388 B + mdat 12 B = 436; truncation drops 10 -> 426;
    // 7500/1000 = 7.5 s; 16.16 fixed-point dims decode exactly.
    "ns_multimodal_video" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(436 AS INTEGER), 'isom',
        |   CAST(1000 AS BIGINT), CAST(7500 AS BIGINT), CAST(7.5 AS DOUBLE),
        |   CAST(640.0 AS DOUBLE), CAST(360.0 AS DOUBLE), CAST(2 AS INTEGER),
        |   CAST(1 AS INTEGER), CAST(1 AS INTEGER), TRUE),
        |  (CAST(2 AS BIGINT), CAST(18 AS INTEGER), CAST(NULL AS VARCHAR),
        |   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
        |   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS INTEGER),
        |   CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), FALSE),
        |  (CAST(3 AS BIGINT), CAST(426 AS INTEGER), CAST(NULL AS VARCHAR),
        |   CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
        |   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS INTEGER),
        |   CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), FALSE))
        |  AS t(asset_id, byte_len, major_brand, timescale, duration_units,
        |       duration_sec, width, height, n_tracks, n_video_tracks,
        |       n_audio_tracks, decoded)
        |ORDER BY asset_id""".stripMargin,

    // Audio literals: 44-byte canonical WAV header + 128 PCM bytes ->
    // byte_len 172; ramp stats peak 3200 / mean_abs 1600.0 exactly;
    // duration 64/8000 (one division, engine-identical); truncated =
    // 44 + 100 = 144 bytes, quarantined null like the garbage row.
    "ns_multimodal_audio" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(172 AS INTEGER), CAST(8000 AS INTEGER),
        |   CAST(1 AS INTEGER), CAST(16 AS INTEGER), CAST(64 AS BIGINT),
        |   CAST(0.008 AS DOUBLE), CAST(3200 AS INTEGER),
        |   CAST(1600.0 AS DOUBLE), TRUE),
        |  (CAST(2 AS BIGINT), CAST(9 AS INTEGER), CAST(NULL AS INTEGER),
        |   CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
        |   CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
        |   CAST(NULL AS INTEGER), CAST(NULL AS DOUBLE), FALSE),
        |  (CAST(3 AS BIGINT), CAST(144 AS INTEGER), CAST(NULL AS INTEGER),
        |   CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
        |   CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
        |   CAST(NULL AS INTEGER), CAST(NULL AS DOUBLE), FALSE))
        |  AS t(asset_id, byte_len, sample_rate, channels, bits_per_sample,
        |       n_frames, duration_sec, peak_amp, mean_abs, decoded)
        |ORDER BY asset_id""".stripMargin,

    "ns_multimodal_decode" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), CAST(661 AS INTEGER), CAST(16 AS INTEGER),
        |   CAST(12 AS INTEGER), CAST(3 AS INTEGER), TRUE),
        |  (CAST(2 AS BIGINT), CAST(12 AS INTEGER), CAST(NULL AS INTEGER),
        |   CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), FALSE),
        |  (CAST(3 AS BIGINT), CAST(64 AS INTEGER), CAST(NULL AS INTEGER),
        |   CAST(NULL AS INTEGER), CAST(NULL AS INTEGER), FALSE))
        |  AS t(asset_id, byte_len, width, height, channels, decoded)
        |ORDER BY asset_id""".stripMargin
  )
}
