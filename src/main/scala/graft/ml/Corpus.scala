package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.WordShingles

/** Corpus-level training-data-pipeline operators: eval-set contamination
  * detection, sequence packing, and vocabulary heavy hitters.
  */
object Corpus {

  /** THE cross-engine hash convention: first 8 hex chars of md5 as a
    * non-negative long (DuckDB replay:
    * `('0x' || substr(md5(x), 1, 8))::UINTEGER`). Every deterministic
    * sampling/splitting/sharding operator and its oracle derive from
    * this one definition — widening the prefix or changing the base in
    * one copy would silently desynchronize the rest, so there are no
    * other copies. */
  private[ml] def md5Key(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Whitespace token count — ONE spelling of the cross-engine contract
    * (`len(string_split_regex(trim(text), '\s+'))` in every oracle);
    * shared by the mixture/sampling operators so their token
    * definitions cannot drift apart. */
  private[ml] def wsTokenCount(c: Column): Column =
    size(split(trim(c), "\\s+")).cast("long")

  /** Eval-set contamination: for each training doc, the distinct n-grams it
    * shares with any held-out eval doc and how many eval docs it collides
    * with — the standard pre-training decontamination check (eval n-grams
    * appearing verbatim in training data).
    *
    * Plan shape: both sides shingle once (codegen WordShingles), join on
    * the n-gram inverted index. The eval side is the small one by
    * construction (an eval suite is KBs against a 100 TB corpus) and is
    * broadcast, so the corpus side never shuffles — each task streams its
    * shingles past the in-memory eval index.
    */
  def contamination(docs: DataFrame, isEval: Column, n: Int = 8,
      broadcastEval: Boolean = true): DataFrame = {
    val sh = docs.select(col("doc_id"), isEval.as("is_eval"),
      WordShingles.wordShingles(split(col("text"), " "), n).as("s"))
    // broadcastEval = the KB-sized-eval-suite precondition made a
    // PARAMETER: a caller whose eval side is corpus-sized (trainingMix's
    // 10% shard) must pass false — forcing the hint there would exceed
    // Spark's 8 GB broadcast cap (or OOM the driver) at any real corpus
    // size, despite working at toy SF (r13 review). false = an ordinary
    // gram-hash shuffle join, identical results.
    val evRaw = sh.filter(col("is_eval"))
      .select(col("doc_id").as("eval_id"), explode(col("s")).as("g"))
    val ev = if (broadcastEval) broadcast(evRaw) else evRaw
    val corpus = sh.filter(!col("is_eval"))
      .select(col("doc_id"), explode(col("s")).as("g"))
    corpus.join(ev, "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_shared_ngrams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }

  /** Sequence packing (concat-and-chunk): documents are concatenated in
    * doc_id order and split into fixed `budget`-token training sequences;
    * each doc reports the sequence its first token lands in and the offset
    * within it. This is the global-prefix-sum shape: a naive
    * `Window.orderBy(doc_id)` would drag the whole corpus into ONE
    * partition, so the running total is computed scan-style instead —
    * per-range partial sums within `bucketSize`-wide doc_id ranges, then a
    * prefix sum over the (tiny) per-range totals joined back broadcast.
    * Only the per-range windows touch data-sized partitions.
    */
  def packSequences(docs: DataFrame, budget: Int,
      bucketSize: Long = 1000L): DataFrame =
    packSequencesBy(docs,
      size(split(trim(col("text")), "\\s+")).cast("long"), budget, bucketSize)

  /** [[packSequences]] under an arbitrary per-document token measure —
    * e.g. the real BPE count ([[graft.functions.Bpe]]) instead of the
    * whitespace approximation, so packed sequences respect the budget a
    * model actually trains with. */
  def packSequencesBy(docs: DataFrame, nTokens: org.apache.spark.sql.Column,
      budget: Int, bucketSize: Long = 1000L): DataFrame = {
    val toks = docs.select(col("doc_id"), nTokens.as("n_tokens"))
      .withColumn("bucket", floor(col("doc_id") / bucketSize))
    val wInBucket = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
    val cum = toks.withColumn("cum_in_bucket",
      sum(col("n_tokens")).over(wInBucket))
    // per-bucket totals: numBuckets rows (corpus/1000) — the single-
    // partition window below runs on this tiny frame, not the corpus
    val offsets = toks.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_total"))
      .withColumn("bucket_offset",
        coalesce(sum(col("bucket_total")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("bucket_offset"))
    cum.join(broadcast(offsets), "bucket")
      .withColumn("start",
        col("bucket_offset") + col("cum_in_bucket") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        (col("start") / budget).cast("long").as("seq_id"),
        (col("start") % budget).as("seq_offset"))
  }

  /** The training-SHARD PLAN a mixture pipeline actually ships (r15,
    * verdict #8 — the final link after
    * [[TextAnalysis.divergenceBudgetAlloc]]): consume each source's
    * documents in doc_id order up to its allocated token budget, then
    * lay the kept tokens out as fixed `seqBudget`-token training
    * sequences and report, per source, the manifest a dataloader
    * needs — docs used (full + the one boundary-truncated doc),
    * tokens kept, the shortfall if the source ran DRY (fewer tokens
    * available than allocated — a real planner re-allocates or
    * upsamples on this signal), the sequence count
    * ceil(tokens_kept / seqBudget), and the source's starting sequence
    * id in the concatenated stream (exact S-row prefix sum, so shard
    * boundaries are fixed before any worker reads a byte).
    *
    * `alloc` is ANY (source, alloc_tokens) plan — the divergence
    * apportionment, a hand mix, a temperature mix — which is the
    * composition point: signal → weights → allocation → shards.
    * Because docs with start ≥ alloc are filtered BEFORE aggregation,
    * a source's contribution is exactly min(available, alloc) tokens:
    * `least(n_tokens, alloc − start)` truncates only the boundary doc.
    *
    * Scale shape: the running token total reuses [[packSequencesBy]]'s
    * scan-style prefix sum — per-(source, bucket) windows over
    * ≤ bucketSize docs, a KB-sized (source, bucket) offset frame
    * broadcast back — so no corpus-sized single partition exists; the
    * alloc join is S-row broadcast; the manifest itself is S rows and
    * its seq_start window is the bounded single-partition class
    * (EXPLAIN.md "Bounded single-partition windows"). All arithmetic
    * is exact long math, so the DuckDB replay is bit-for-bit. */
  def shardManifest(docs: DataFrame, alloc: DataFrame, seqBudget: Int,
      bucketSize: Long = 1000L): DataFrame = {
    require(seqBudget > 0, s"seqBudget must be positive, got $seqBudget")
    // the S-row plan frame is consumed TWICE below (cap join + manifest
    // base); without the cut each consumer replays the caller's entire
    // allocator chain — the first golden capture showed SIX copies of
    // the divergence aggregation in one plan (the ns_divergence_mix
    // 4×-replay class, r14). S rows: the checkpoint is metadata-priced.
    val al = alloc.select(col("source"), col("alloc_tokens"))
      .localCheckpoint()
    val capped = cappedLayout(docs, al, bucketSize)
    val per = capped.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_used"),
        sum(when(col("n_tokens") === col("take"), 1L).otherwise(0L))
          .as("n_docs_full"),
        sum(col("take")).as("tokens_kept"))
    val manifest = al
      .join(per, Seq("source"), "left")
      .na.fill(0L, Seq("n_docs_used", "n_docs_full", "tokens_kept"))
      .withColumn("shortfall", col("alloc_tokens") - col("tokens_kept"))
      .withColumn("n_sequences",
        expr(s"(tokens_kept + ${seqBudget - 1}) DIV $seqBudget"))
    manifest.withColumn("seq_start",
        coalesce(sum(col("n_sequences")).over(
          Window.orderBy(col("source"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy(col("source"))
  }

  /** The capped-consumption layout [[shardManifest]] aggregates and
    * [[writeShards]] materializes — ONE implementation so the plan and
    * the artifact cannot drift (r16, verdict #5): per doc of each
    * source, the exact running token `start` (the per-(source, bucket)
    * prefix-sum device — no corpus-sized window), kept while
    * start < alloc with the boundary doc truncated to
    * `take = least(n_tokens, alloc − start)`. `al` must already be the
    * checkpointed S-row (source, alloc_tokens) frame. */
  private def cappedLayout(docs: DataFrame, al: DataFrame,
      bucketSize: Long): DataFrame = {
    val toks = docs.select(col("source"), col("doc_id"),
        wsTokenCount(col("text")).as("n_tokens"))
      .withColumn("bucket", floor(col("doc_id") / bucketSize))
    val wInBucket = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("doc_id"))
    val cum = toks.withColumn("cum_in_bucket",
      sum(col("n_tokens")).over(wInBucket))
    val offsets = toks.groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_total"))
      .withColumn("bucket_offset",
        coalesce(sum(col("bucket_total")).over(
          Window.partitionBy(col("source")).orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("bucket"), col("bucket_offset"))
    cum.join(broadcast(offsets), Seq("source", "bucket"))
      .withColumn("start",
        col("bucket_offset") + col("cum_in_bucket") - col("n_tokens"))
      .join(broadcast(al), Seq("source"))
      .filter(col("start") < col("alloc_tokens"))
      .withColumn("take",
        least(col("n_tokens"), col("alloc_tokens") - col("start")))
  }

  /** Per-SEQUENCE fill accounting of the shard plan (r16) — the
    * dataloader-side view [[shardManifest]] implies but does not state:
    * for every global training sequence, how many documents contribute
    * to it and how many of its `seqBudget` token slots are filled. The
    * invariant a loader asserts before training: every sequence except
    * each shard's LAST is EXACTLY full (n_tokens = seqBudget), and the
    * per-shard sums reconcile with the manifest (Σ n_tokens =
    * tokens_kept, max seq_id = seq_start + n_sequences − 1). A doc with
    * kept tokens [start, start + take) contributes to local sequences
    * start DIV B .. (start + take − 1) DIV B, with the exact overlap
    * least((j+1)·B, start+take) − greatest(j·B, start) tokens in
    * sequence j — pure long arithmetic, so the DuckDB replay is
    * bit-for-bit.
    *
    * Scale shape: [[cappedLayout]]'s output is PLAN-bounded (at most
    * `alloc` total tokens survive the cap, so ≤ Σalloc docs), hence the
    * localCheckpoint below is metadata-priced and the per-doc sequence
    * explode fans out to ≤ tokens_kept/B + n_docs_used segment rows —
    * budget-sized, never corpus-sized. The seq_start frame is S rows,
    * broadcast. The corpus-sized work is exactly cappedLayout's bucketed
    * prefix sum, shared with the manifest. */
  def seqFill(docs: DataFrame, alloc: DataFrame, seqBudget: Int,
      bucketSize: Long = 1000L): DataFrame = {
    require(seqBudget > 0, s"seqBudget must be positive, got $seqBudget")
    val al = alloc.select(col("source"), col("alloc_tokens"))
      .localCheckpoint()
    // plan-bounded (≤ budget tokens ⇒ ≤ budget rows) and consumed TWICE
    // (per-source totals + the segment explode): checkpoint per the
    // small-frame-replay rule — each consumer would otherwise replay the
    // whole corpus prefix-sum chain
    val capped = cappedLayout(docs, al, bucketSize)
      .filter(col("take") > 0) // an empty boundary doc spans no sequence
      .select(col("source"), col("doc_id"), col("start"), col("take"))
      .localCheckpoint()
    val per = capped.groupBy(col("source"))
      .agg(sum(col("take")).as("tokens_kept"))
    val starts = al.join(per, Seq("source"), "left")
      .na.fill(0L, Seq("tokens_kept"))
      .withColumn("n_sequences",
        expr(s"(tokens_kept + ${seqBudget - 1}) DIV $seqBudget"))
      .withColumn("seq_start",
        coalesce(sum(col("n_sequences")).over(
          Window.orderBy(col("source"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("seq_start"))
    val segs = capped
      .withColumn("j", explode(sequence(
        expr(s"start DIV $seqBudget"),
        expr(s"(start + take - 1) DIV $seqBudget"))))
      .withColumn("tok",
        least((col("j") + 1) * seqBudget, col("start") + col("take"))
          - greatest(col("j") * seqBudget, col("start")))
    segs.groupBy(col("source"), col("j"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .join(broadcast(starts), Seq("source"))
      .select((col("seq_start") + col("j")).as("seq_id"), col("source"),
        col("n_docs"), col("n_tokens"))
      .orderBy(col("seq_id"))
  }

  /** MATERIALIZE the shard plan (r16, verdict #5 — the artifact a
    * dataloader mounts): the capped, boundary-truncated doc stream of
    * [[shardManifest]]'s plan, laid out with GLOBAL sequence ids from
    * the manifest's exact seq_start prefix sum and committed to `lake`
    * as one snapshot append CLUSTERED BY SOURCE (each shard's rows land
    * contiguously, so a worker mounts its shard as a source-filtered
    * scan that GenStats min/max file skipping prunes to the shard's own
    * files). Row schema: (source, doc_id, n_tokens_kept, seq_id,
    * seq_offset) — seq_id = seq_start + start DIV seqBudget (the
    * sequence the doc's first kept token lands in), seq_offset the
    * position within it; a doc spanning sequences is reconstructed by
    * the reader exactly as [[packSequences]] documents.
    *
    * Returns (published lake version, the manifest). Conservation holds
    * by CONSTRUCTION, not by parallel arithmetic: rows and manifest both
    * derive from the one [[cappedLayout]] frame, so per source
    * sum(n_tokens_kept) = tokens_kept and every seq_id falls in
    * [seq_start, seq_start + n_sequences) — MixPlanSpec pins both
    * against the FILES read back from the lake, and the commit's
    * changefeed shows the append as inserts.
    *
    * Scale shape: one corpus-sized repartition by source (the
    * deliberate clustering shuffle — at 100 TB this is the write's
    * layout cost, the same exchange any partitioned table write pays);
    * the manifest join is an S-row broadcast; everything else is
    * [[cappedLayout]]'s bucketed prefix sum. */
  def writeShards(lake: graft.ingest.SnapshotLake, docs: DataFrame,
      alloc: DataFrame, seqBudget: Int,
      bucketSize: Long = 1000L): (Long, DataFrame) = {
    require(seqBudget > 0, s"seqBudget must be positive, got $seqBudget")
    val al = alloc.select(col("source"), col("alloc_tokens"))
      .localCheckpoint()
    // S rows, consumed twice (seq_start join + returned to the caller)
    val manifest = shardManifest(docs, al, seqBudget, bucketSize)
      .localCheckpoint()
    val rows = cappedLayout(docs, al, bucketSize)
      .join(broadcast(manifest.select(col("source"), col("seq_start"))),
        Seq("source"))
      .select(col("source"), col("doc_id"),
        col("take").as("n_tokens_kept"),
        (col("seq_start") + expr(s"start DIV $seqBudget")).as("seq_id"),
        (col("start") % seqBudget).as("seq_offset"))
    val version = lake.commit(
      rows.repartition(col("source"))
        .sortWithinPartitions(col("source"), col("seq_id"), col("doc_id")),
      overwrite = false)
    (version, manifest)
  }

  /** Deterministic TRAINING-ORDER shuffle + dataloader sharding — the
    * last hop of every pre-training pipeline: a reproducible global
    * permutation of the corpus, materialized as (shard, position) so N
    * dataloader workers each read one shard sequentially. The
    * permutation key is an md5-prefix hash of (doc_id, seed) — the
    * repo's cross-engine hash convention (ns_split_assign) — so the
    * "shuffle" is a deterministic function, replayable for resume and
    * auditable per seed. Scale shape: shard assignment is map-side;
    * the only sort is per-shard (row_number windows over nShards
    * independent partitions, never a global single-partition sort),
    * which is exactly how a 100 TB corpus gets ordered in practice —
    * global order across shards is meaningless to per-worker
    * sequential readers. */
  def trainOrder(docs: DataFrame, seed: Long, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val key = md5Key(concat_ws(":", col("doc_id"), lit(seed)))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col("doc_id"))
    docs.select(col("doc_id"), key.as("shuffle_key"))
      .withColumn("shard", (col("shuffle_key") % nShards).cast("int"))
      .select(col("doc_id"), col("shard"),
        row_number().over(w).as("position"), col("shuffle_key"))
  }


  /** Quality-paced CURRICULUM training order (r15) — [[trainOrder]]
    * upgraded from one flat permutation to quality PHASES: every doc is
    * scored by the frozen LR quality model
    * ([[TextAnalysis.classifierScore]]), the corpus splits into score
    * TERTILES via sketch cutpoints (phase 1 = highest-quality tertile
    * first — the standard curriculum-learning schedule; the
    * anti-curriculum is just reading phases in reverse), and WITHIN
    * each phase the deterministic md5(doc_id:seed) permutation shards
    * the docs for N dataloader workers. Worker w reads (phase 1,
    * shard w) sequentially, then (phase 2, shard w), … — reproducible,
    * resumable, auditable per seed, exactly like trainOrder.
    *
    * Composition point: score → phases → per-phase shuffle — the same
    * signal→decision chain discipline as divergence→alloc→manifest.
    *
    * Scale shape: the score is map-side (one corpus scan,
    * localCheckpoint'd because the cutpoint aggregate and the output
    * both consume it — the pplBucketed device); the cutpoints are ONE
    * sketch aggregate row broadcast back (rank-exact for n ≤ accuracy,
    * machine-checked by the woven [[graft.functions.SketchGuards]]
    * envelope — the w_ntile/pplBuckets discipline); the only windows
    * run per (phase, shard) — 3·nShards independent partitions, never
    * a corpus-sized single partition. */
  def curriculumOrder(docs: DataFrame, seed: Long, nShards: Int,
      accuracy: Long = 10000000L): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val w = Window.partitionBy(col("phase"), col("shard"))
      .orderBy(col("shuffle_key"), col("doc_id"))
    phasedScores("curriculumOrder", docs, accuracy)
      .withColumn("shuffle_key",
        md5Key(concat_ws(":", col("doc_id"), lit(seed))))
      .withColumn("shard", (col("shuffle_key") % nShards).cast("int"))
      .select(col("doc_id"), col("lr_score"), col("phase"), col("shard"),
        row_number().over(w).as("position"))
  }

  /** The score→tertile-phase derivation [[curriculumOrder]] shuffles
    * and [[curriculumMix]] aggregates — ONE implementation (the
    * cappedLayout discipline, r16) so the phase rule cannot drift
    * between the schedule and its mixture report. Returns
    * (doc_id, lr_score, phase [, sketch cols]); phase 1 = scores ABOVE
    * the 2/3 cut (the clean tertile), phase 3 = at/below the 1/3 cut;
    * boundary semantics mirror the oracle's exact ceil(q·n)-element
    * cutpoints token-for-token, with the rank-exact envelope
    * machine-checked under `opName`. */
  private def phasedScores(opName: String, docs: DataFrame,
      accuracy: Long): DataFrame = {
    graft.functions.SketchGuards.requireSketchAccuracy(opName, accuracy)
    val scored = TextAnalysis.classifierScore(docs)
      .select(col("doc_id"), col("lr_score")).localCheckpoint()
    val cuts = scored.agg(percentile_approx(col("lr_score"),
        array(lit(1.0 / 3), lit(2.0 / 3)),
        lit(Math.toIntExact(accuracy))).as("cuts"),
      count(lit(1)).as("n_rows"))
    val envelopeZero = graft.functions.SketchGuards.rankExactEnvelope(
      opName, "", col("n_rows"), accuracy,
      "raise accuracy in lockstep", "int")
    scored.crossJoin(broadcast(cuts))
      .withColumn("phase", lit(1) + envelopeZero
        + when(col("lr_score") <= col("cuts")(1), 1).otherwise(0)
        + when(col("lr_score") <= col("cuts")(0), 1).otherwise(0))
  }

  /** CURRICULUM × MIXTURE interaction report (r16): per (phase, source),
    * document and whitespace-token counts — the check that a quality-
    * paced schedule does not STARVE a source in its early phases
    * (quality scores correlate with source, so a curriculum silently
    * reorders the mixture; this table is the signal a planner
    * re-balances on, the divergence→alloc discipline applied to the
    * schedule). Phases come from [[phasedScores]] — the same derivation
    * [[curriculumOrder]] ships, so report and schedule cannot disagree.
    *
    * Scale shape: the phase side is the checkpointed (doc_id, lr_score)
    * frame with a 1-row broadcast cutpoint join (curriculumOrder's
    * pinned shape); attaching (source, tokens) is ONE narrow
    * co-partition equi-join on doc_id (both sides ≤ ~24 B/row), then a
    * 3·S-row aggregate. No windows at all. */
  def curriculumMix(docs: DataFrame,
      accuracy: Long = 10000000L): DataFrame = {
    val phased = phasedScores("curriculumMix", docs, accuracy)
      .select(col("doc_id"), col("phase"))
    docs.select(col("doc_id"), col("source"),
        wsTokenCount(col("text")).as("n"))
      .join(phased, "doc_id")
      .groupBy(col("phase"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
      .orderBy(col("phase"), col("source"))
  }

  /** Training-mixture weights per source: token counts and the
    * temperature-scaled sampling weight `tokens^alpha / Σ tokens^alpha`
    * (alpha<1 upsamples small sources — the standard multilingual/
    * multi-source mixing rule). One groupBy on source plus a broadcast
    * 1-row denominator: the per-source score is rounded BEFORE the
    * denominator sum so both engines sum identical doubles.
    */
  def sourceMixture(docs: DataFrame, alpha: Double = 0.3): DataFrame = {
    val per = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(wsTokenCount(col("text"))).as("n_tokens"))
      .withColumn("score", round(pow(col("n_tokens").cast("double"), alpha), 6))
    // Fixed-point denominator: double addition is order-dependent and the
    // aggregation order is partition-dependent; summing round(score*1e6)
    // as long and dividing once is associative, so both engines (and any
    // partitioning) produce the identical double.
    val denom = per.agg(
      (sum(round(col("score") * 1e6).cast("long")) / 1e6).as("denom"))
    per.crossJoin(broadcast(denom))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("score") / col("denom"), 6).as("mix_weight"))
  }

  /** Temperature sampling — the [[sourceMixture]] weights REALIZED as an
    * actual deterministic subsample: per-source keep rate
    * `(n_min / n_s)^(1-alpha)` (the smallest source keeps everything;
    * larger ones down-sample toward the `n^alpha` mixture — expected
    * kept tokens per source = n_min^(1-α) · n_s^α, i.e. proportions
    * ∝ n^α, the standard multilingual re-balancing rule), applied as an
    * md5 threshold per doc so membership is a pure function of doc_id:
    * re-runs, backfills, and engines agree row-for-row, and adding a
    * source only changes OTHER sources' rates through n_min. The knob
    * is `exponent` = 1 − alpha (alpha the usual temperature). Map-side
    * after one tiny per-source aggregate (broadcast rates), no shuffle
    * of the corpus. The rate is rounded to 6 decimals and the threshold
    * compared in integer space, so a last-ulp `pow` divergence cannot
    * flip a row. */
  def temperatureSample(docs: DataFrame, exponent: Double = 0.3): DataFrame = {
    // `exponent` = 1 - alpha, passed DIRECTLY rather than derived:
    // 1.0 - 0.7 is NOT the double literal 0.3 (they differ in the last
    // bit), and the oracle mirrors the literal — deriving it here would
    // hand pow() different inputs per engine, the ulp hazard the
    // round-6 threshold guards everything else against
    val per = docs.groupBy(col("source"))
      .agg(sum(wsTokenCount(col("text"))).as("n_tokens"))
    val nMin = per.agg(min(col("n_tokens")).as("n_min"))
    val rates = per.crossJoin(broadcast(nMin))
      .select(col("source"),
        round(pow(col("n_min").cast("double") / col("n_tokens"), exponent), 6)
          .as("keep_rate"))
    docs.join(broadcast(rates), "source")
      .filter((md5Key(col("doc_id").cast("string")) % 1000000L) <
        round(col("keep_rate") * 1e6).cast("long"))
      .select(col("doc_id"), col("source"), col("keep_rate"))
  }

  /** Quality-threshold selection: keep documents whose stopword ratio is
    * strictly above the corpus median — the "top half by quality signal"
    * selection step. The exact median is a 1-row broadcast aggregate
    * (scalar-subquery shape), not a driver-side collect.
    */
  def qualityFilter(docs: DataFrame): DataFrame = {
    val q = TextAnalysis.qualityFeatures(docs)
      .select(col("doc_id"), col("stopword_ratio"))
    // Rounded before the comparison and in the output: Spark percentile()
    // vs DuckDB quantile_cont() can differ in the last ulp for even-count
    // interpolation, which would flip membership at the boundary.
    val med = q.agg(
      round(expr("percentile(stopword_ratio, 0.5)"), 6).as("median_ratio"))
    q.crossJoin(broadcast(med))
      .filter(col("stopword_ratio") > col("median_ratio"))
      .select(col("doc_id"), col("stopword_ratio"),
        col("median_ratio"))
  }

  /** The END-TO-END training-mix pipeline: quality gate → exact-dedup
    * keep → decontamination → per-domain cap → temperature sampling →
    * split assignment, composed as ONE lazy plan (no driver-side seam,
    * no materialization between stages — Catalyst sees the whole chain).
    * Each stage is the already-scored operator applied to the previous
    * stage's survivors:
    *
    *  1. keep docs whose stopword ratio is strictly above the corpus
    *     median ([[qualityFilter]] semantics, median over the FULL
    *     corpus);
    *  2. exact dedup among survivors — keep the min doc_id per
    *     content hash;
    *  3. drop the held-out eval shard (doc_id % 10 = 0) and every doc
    *     sharing a verbatim 8-gram with it ([[contamination]]; a doc's
    *     contamination is a function of the eval set only, so scoping
    *     the check to survivors changes nothing);
    *  4. cap each source at `domainCap` docs (longest n_chars, ties to
    *     low doc_id) through the bounded-heap TopKPerKeyExec — token
    *     counts are projected BEFORE the heap so text never flows
    *     through it;
    *  5. temperature-sample per source at keep rate
    *     (min_tokens/tokens)^exponent, md5-threshold deterministic
    *     ([[temperatureSample]] conventions: rate rounded to 6, compare
    *     in integer space);
    *  6. assign train/val/test by md5 bucket (80/10/10).
    *
    * Scale shape: stages 1/5 are broadcast 1-row aggregates, stage 2 is
    * one hash-key shuffle, stage 3 broadcasts only eval-shard grams,
    * stage 4 shuffles ≤ cap rows per (source, partition) — the text
    * column is dropped after stage 3's projection. */
  def trainingMix(docs: DataFrame, domainCap: Int = 50,
      exponent: Double = 0.3): DataFrame = {
    val kept1 = docs.join(qualityFilter(docs).select("doc_id"), Seq("doc_id"))
    val reps = kept1.select(col("doc_id"), md5(col("text")).as("h"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val kept2 = kept1.join(reps, Seq("doc_id"))
    val contaminated = contamination(docs, col("doc_id") % 10 === 0, 8,
        broadcastEval = false) // the eval SHARD is corpus-sized: shuffle join
      .select("doc_id")
    val kept3 = kept2.filter(col("doc_id") % 10 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        wsTokenCount(col("text")).as("n_tokens"))
    val kept4 = graft.plans.TopK.perKey(kept3, Seq("source"),
      Seq(("n_chars", false), ("doc_id", true)), domainCap)
    val per = kept4.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("nt"))
    val nMin = per.agg(min(col("nt")).as("n_min"))
    val rates = per.crossJoin(broadcast(nMin))
      .select(col("source"),
        round(pow(col("n_min").cast("double") / col("nt"), exponent), 6)
          .as("keep_rate"))
    val kept5 = kept4.join(broadcast(rates), "source")
      .filter((md5Key(col("doc_id").cast("string")) % 1000000L) <
        round(col("keep_rate") * 1e6).cast("long"))
    // the split key is SALTED (':split') so it is independent of the
    // sampling key above: both were md5Key(doc_id), and since 100
    // divides 1e6 the split bucket was a deterministic function of the
    // sampling residue — at keep_rate <= 8e-5 every survivor had
    // key%1e6 < 80, hence bucket < 80 = 100% 'train', zero val/test
    // (r13 review; trainOrder already salts with its seed).
    val bucket =
      md5Key(concat(col("doc_id").cast("string"), lit(":split"))) % 100L
    kept5.select(col("doc_id"), col("source"), col("lang"),
      when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test").as("split"))
  }

  /** Paragraph-granularity dedup (Gopher/RefinedWeb line-dedup shape): the
    * token stream is chunked into fixed `chunkTokens`-token paragraphs,
    * each chunk is fingerprinted (md5), and a chunk is "duplicated" when
    * it appears verbatim in 2+ distinct documents. Per doc: chunk count,
    * duplicated-chunk count, duplicated fraction — the boilerplate signal
    * a curation pipeline filters on.
    *
    * Scale shape: chunking is a map-side explode (no shuffle); the only
    * shuffles are the chunk-frequency aggregate and the per-doc rollup,
    * both on constant-size md5 keys — the text itself never shuffles.
    * The chunk index explodes the token array per chunk row, but rows are
    * bounded by chunk count (n_tokens / chunkTokens per doc).
    */
  def paragraphDedup(docs: DataFrame, chunkTokens: Int = 20): DataFrame = {
    val toks = docs.select(col("doc_id"),
      split(trim(col("text")), "\\s+").as("t"))
    // chunk index exploded OUTSIDE any lambda: md5/array_join/slice stay
    // codegen projections (HOF lambdas are interpreted — NOTES.md §7).
    val chunks = toks
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0),
          // Column `/` is double division; truncate back to the integral
          // chunk-count bound sequence() requires (size >= 1 always).
          ((size(col("t")) - lit(1)) / lit(chunkTokens)).cast("int"))).as("i"))
      .select(col("doc_id"),
        md5(array_join(
          slice(col("t"), col("i") * chunkTokens + 1, lit(chunkTokens)),
          " ")).as("h"))
    val freq = chunks.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    chunks.join(freq, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_frac",
        round(col("n_dup_chunks") / col("n_chunks"), 6))
  }

  /** Sliding-window chunker (the RAG / context-packing split): each doc's
    * whitespace-token stream becomes windows of `window` tokens starting
    * every `stride` tokens (overlap = window - stride), each chunk
    * fingerprinted (md5 of the space-rejoined slice). Start positions are
    * 0, stride, 2*stride, … stopping at the FIRST start whose window
    * reaches the end of the doc (start + window >= n_tokens): every token
    * lands in >= 1 chunk, a short tail emits one partial chunk, and no
    * chunk is a suffix of its predecessor — the fully-contained tail
    * starts an overlap chunker would otherwise emit are duplicate content
    * a retrieval index must not hold twice. paragraphDedup is the
    * degenerate stride == window case; the overlap generalization is what
    * retrieval pipelines index.
    *
    * Scale shape: entirely map-side — explode the start-index sequence
    * (outside any lambda, so slice/md5 stay codegen projections, NOTES.md
    * §7), no shuffle at all; rows per doc bounded by n_tokens / stride.
    * Reference analog: fixed-size chunk assignment (app.js:406).
    */
  def chunkSliding(docs: DataFrame, window: Int, stride: Int): DataFrame = {
    require(stride >= 1 && window >= stride, "window >= stride >= 1")
    docs.select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0),
          // last start index = ceil(max(n - window, 0) / stride): the
          // first start covering the doc's end. Column `/` is double
          // division; the +(stride-1) trick makes the truncating cast a
          // ceil (numerator >= 0 always — size >= 1, split('') is ['']).
          ((greatest(size(col("t")) - lit(window), lit(0)) +
            lit(stride - 1)) / lit(stride)).cast("int"))).as("i"))
      .select(col("doc_id"), col("i").cast("long").as("chunk_idx"),
        least(lit(window), size(col("t")) - col("i") * stride)
          .cast("long").as("n_tokens"),
        md5(array_join(slice(col("t"), col("i") * stride + 1, lit(window)),
          " ")).as("chunk_hash"))
  }

  /** Content-defined chunking (the LBFS/FastCDC idea as a query):
    * chunk boundaries are placed where the CONTENT says so — after
    * character position i (i ≥ 8) iff the md5 of the 8-char window
    * ending at i starts with hex nibble '0' (P = 1/16 → mean chunk ≈ 16
    * chars) — so an insertion early in a document shifts only the one
    * chunk it lands in, and every later chunk re-aligns and dedups
    * against the original (fixed-size chunking loses ALL alignment past
    * an edit; [[chunkSliding]] is that fixed-size sibling). Output per
    * doc: chunk count, total/max chunk chars, and `n_shared_chunks` —
    * this doc's chunk instances whose content hash also appears in
    * ANOTHER doc, i.e. the storage/dedup win CDC exists to expose.
    *
    * Scale shape: boundary detection + chunk split are ONE map-side
    * codegen expression ([[graft.functions.CdcChunks]] — the
    * interpreted HOF formulation was ~7× slower end-to-end; the
    * expression's body IS the oracle's formulation) over each doc (no
    * shuffle; work linear in corpus chars); the only exchanges are the
    * chunk-hash aggregate and the hash join back — both keyed on md5
    * hex, uniformly distributed by construction (no hot key can
    * exist). Empty texts chunk to nothing and drop out, mirrored by
    * the oracle. */
  def cdcChunks(docs: DataFrame): DataFrame = {
    val chunks = docs
      .select(col("doc_id"),
        explode(graft.functions.CdcChunks.cdcChunks(col("text"))).as("chunk"))
      .withColumn("chash", md5(col("chunk")))
      // barrier: the aggregate branch AND the join probe both consume
      // this frame — without it each re-runs the chunk scan (measured
      // at sf0.1: 0.79 s with the barrier vs 1.04 s recomputing, and
      // the gap widens with corpus size since the recompute is the
      // corpus-linear half). Narrow frame (id + ~16-char chunk + hash),
      // ContextCleaner-released — the cosineDupPairsBanded precedent.
      .localCheckpoint()
    val docsPerChunk = chunks.groupBy(col("chash"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    chunks.join(docsPerChunk, "chash")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_chunks"),
        sum(length(col("chunk"))).cast("bigint").as("chunk_chars"),
        max(length(col("chunk"))).cast("int").as("max_chunk_len"),
        sum(when(col("ndocs") >= 2, 1).otherwise(0)).cast("int")
          .as("n_shared_chunks"))
      .orderBy(col("doc_id"))
  }

  /** Token-length histogram over power-of-two buckets — the sequence-
    * length profile a packing/curriculum planner reads before choosing a
    * context length (what fraction of documents — and of TOKENS — fit in
    * 2^k?). Bucket = bit length of the whitespace token count, computed
    * as `length(bin(n))`: integer-exact in both engines, immune to the
    * floor(log2(n)) ulp flip at exact powers of two. Emits per-bucket
    * doc/token counts, token share, and CUMULATIVE token share.
    *
    * Scale shape: one hash aggregate over a 1-column projection (partial
    * map-side collapse, at most 63 groups), then a bounded self-join for
    * the running sum — a bigint count has <= 63 buckets at ANY corpus
    * size, so the join is constant and broadcast; never a global window
    * (w_ntile stays the one sanctioned global window). Shares are
    * single-division doubles over exact BIGINTs, round-6 per the
    * cross-engine convention.
    *
    * CACHE-LIFETIME CONTRACT (public API): the 63-row bucket frame
    * stays persisted for the lifetime of the returned lazy plan. A
    * long-lived session calling this repeatedly should
    * `spark.catalog.clearCache()` after materializing each result
    * (exactly as [[graft.ml.Fuzzy.fuzzyPairs]] and the streaming sinks
    * document) — the harness does so per query; a library caller owns
    * the same responsibility.
    */
  def tokenHistogram(docs: DataFrame): DataFrame = {
    // persist + eager count, the shingled() pattern: the <= 63-row
    // bucket frame has THREE consumers (self-join x2 + total); without
    // the barrier each recomputes the corpus scan + aggregate — 3 full
    // passes over 100 TB for a 63-row table (and racing cold-cache
    // stages would make the metered shuffle volume nondeterministic).
    val b = docs.select(wsTokenCount(col("text")).as("n_tok"))
      .groupBy(length(bin(col("n_tok"))).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .persist()
    b.count()
    val tot = b.agg(sum(col("n_tokens")).as("tot_tokens"))
    val cum = b.join(
        broadcast(b.select(col("bucket").as("b2"), col("n_tokens").as("nt2"))),
        col("b2") <= col("bucket"))
      .groupBy(col("bucket"), col("n_docs"), col("n_tokens"))
      .agg(sum(col("nt2")).as("cum_tokens"))
    cum.crossJoin(broadcast(tot))
      .select(col("bucket"),
        expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)").as("lo_tokens"),
        (expr("shiftleft(CAST(1 AS BIGINT), bucket)") - lit(1L))
          .as("hi_tokens"),
        col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("tot_tokens"), 6)
          .as("token_share"),
        round(col("cum_tokens").cast("double") / col("tot_tokens"), 6)
          .as("cum_token_share"))
  }

  /** Epochs-per-source budget plan — the data-constrained allocation
    * step after [[sourceMixture]]: given a total training budget of
    * `budgetMultiple` x the corpus's tokens and the temperature-smoothed
    * mixture weights, how many tokens each source must contribute
    * (`tokens_target`) and how many PASSES over that source that implies
    * (`epochs` > 1 = the source repeats; the up-sampling factor a
    * data-constrained run actually schedules). Determinism: mix_weight
    * is already round-6 (fixed-point denominator in sourceMixture),
    * budget is an exact BIGINT, so tokens_target is one IEEE multiply +
    * half-away round in both engines; epochs is one division, round-6.
    * Scale: per-source aggregates only — the corpus shuffles once inside
    * sourceMixture (partial-agg token sums); everything after is a
    * broadcast envelope over |sources| rows.
    */
  def epochsPerSource(docs: DataFrame, alpha: Double = 0.3,
      budgetMultiple: Int = 3): DataFrame = {
    // The [[sourceMixture]] fixed-point chain is INLINED (not called) so
    // every envelope — score denominator AND token total — hangs off the
    // IDENTICAL per-source aggregate subtree: Catalyst's exchange reuse
    // then computes the corpus scan + token sum once (the plan golden
    // pins the ReusedExchanges; calling sourceMixture left one consumer
    // re-scanning the corpus for the total). Same score/denominator
    // spelling as sourceMixture — the oracle replays both identically.
    val per = docs.groupBy(col("source"))
      .agg(sum(wsTokenCount(col("text"))).as("n_tokens"))
    val sc = per.withColumn("score",
      round(pow(col("n_tokens").cast("double"), alpha), 6))
    val denom = sc.agg(
      (sum(round(col("score") * 1e6).cast("long")) / 1e6).as("denom"))
    val tot = per.agg(sum(col("n_tokens")).as("tot_tokens"))
    sc.crossJoin(broadcast(denom)).crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        round(col("score") / col("denom"), 6).as("mix_weight"),
        col("tot_tokens"))
      .select(col("source"), col("n_tokens"), col("mix_weight"),
        round((col("tot_tokens") * budgetMultiple).cast("double") *
          col("mix_weight")).cast("long").as("tokens_target"))
      .withColumn("epochs",
        round(col("tokens_target").cast("double") /
          col("n_tokens").cast("double"), 6))
  }

  /** DSIR-style importance score: how much a document looks like the
    * target domain (here: the `en` slice) relative to the raw corpus,
    * measured over hashed token buckets — the importance-resampling
    * weight from "Data Selection for Language Models via Importance
    * Resampling" (Xie et al., 2023), with unigram features hashed into
    * `nBuckets` and add-one smoothing.
    *
    * Determinism: bucket ids derive from md5 (cross-engine identical);
    * each bucket's log-ratio is rounded to 6 decimals, and the per-doc
    * sum runs in 1e-6 fixed point, so partition order cannot move an ulp.
    *
    * Scale shape: the bucket table is `nBuckets` rows — broadcast — so
    * scoring is a map-side join over the (doc, bucket) counts; the only
    * shuffles are the per-doc bucket histogram and the per-doc rollup.
    * The tokenize+hash map side runs ONCE: both the global bucket stats
    * and the scoring branch consume the same `groupBy(doc_id, is_tgt, b)`
    * exchange, which Spark's ReuseExchange dedups — without the shared
    * exchange the corpus would be scanned and exploded twice.
    */
  def dsirScore(docs: DataFrame, isTarget: Column,
      nBuckets: Int = 1024): DataFrame = {
    val docBucket = docs.select(col("doc_id"), isTarget.as("is_tgt"),
        explode(split(trim(col("text")), "\\s+")).as("t"))
      .select(col("doc_id"), col("is_tgt"),
        (md5Key(col("t")) % nBuckets).as("b"))
      .groupBy(col("doc_id"), col("is_tgt"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val stats = docBucket.groupBy(col("b"))
      .agg(sum(col("cnt")).as("c_all"),
        sum(when(col("is_tgt"), col("cnt")).otherwise(0L)).as("c_tgt"))
    val tot = stats.agg(sum(col("c_all")).as("t_all"),
      sum(col("c_tgt")).as("t_tgt"))
    val contrib = stats.crossJoin(broadcast(tot))
      .select(col("b"),
        round(log(
          ((col("c_tgt") + lit(1.0)) / (col("t_tgt") + lit(nBuckets.toDouble))) /
          ((col("c_all") + lit(1.0)) / (col("t_all") + lit(nBuckets.toDouble)))
        ), 6).as("contrib"))
    // Per-token sum == cnt-weighted sum (all tokens in a bucket share one
    // contrib), so the fixed-point semantics of the oracle are unchanged.
    docBucket.join(broadcast(contrib), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        round(sum(col("cnt") * round(col("contrib") * 1e6).cast("long")) / 1e6, 6)
          .as("dsir_score"))
  }

  /** Corpus vocabulary heavy hitters: the k most frequent lowercased
    * whitespace tokens with their document frequency. Partial (map-side)
    * aggregation does the heavy lifting; the global top-k sorts only the
    * aggregated vocabulary and the rank window runs on k rows.
    */
  def heavyHitters(docs: DataFrame, k: Int): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val counts = tok.groupBy(col("token"))
      .agg(count(lit(1)).as("freq"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("freq").desc, col("token"))
      .limit(k)
    counts.withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("token"))))
      .select(col("rank"), col("token"), col("freq"), col("n_docs"))
  }

  /** The r11 curation pipeline as ONE lazy plan — the composed form of
    * the round's quality tier, the way [[trainingMix]] composes the
    * r7 tier: Gopher rule gate ∧ CCNet head+middle perplexity buckets
    * (independent signals, each computed over the FULL corpus so one
    * filter's selectivity never skews the other's thresholds) →
    * exact-dedup keep among the survivors (min doc_id per md5 — the
    * keep set is filter-dependent by design: dedup what you are about
    * to train on) → per-source document/token budget report.
    *
    * Scale shape: both gates are the operators' own plans (map-side
    * Gopher projection; one localCheckpointed LM pass + broadcast
    * cutpoints); the dedup keep is one (md5, doc_id) exchange over
    * survivors, never text; the rollup is a partial-aggregating
    * groupBy(source). Joins are all on doc_id longs.
    */
  def curationPipeline(docs: DataFrame): DataFrame = {
    val gate = TextAnalysis.gopherRules(docs).filter(col("pass"))
      .select(col("doc_id"), col("source"), col("n_words"))
    val headMid = TextAnalysis.pplBucketed(docs)
      .filter(col("bucket") <= 2).select(col("doc_id"))
    // the narrow survivor frame (doc_id, source, n_words, h — ~50 B/row)
    // materializes ONCE: its two consumers (the md5 min-id keep and the
    // join-back) would otherwise each re-scan the corpus and re-run the
    // Gopher projection. localCheckpoint, not persist, per the
    // pplBuckets lesson (cached-plan compilation loses exchange reuse;
    // checkpoint blocks self-release via the ContextCleaner).
    val surv = gate.join(headMid, "doc_id")
      .join(docs.select(col("doc_id"), md5(col("text")).as("h")), "doc_id")
      .localCheckpoint()
    val canon = surv.groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
    surv.join(canon.select(col("doc_id")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_tokens"))
  }
}
