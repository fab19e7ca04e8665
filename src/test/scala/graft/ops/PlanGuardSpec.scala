package graft.ops

import java.nio.file.{Files, Paths, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import graft.{SparkEntry, SparkSpecBase}

/** Plan-drift regression guard (r9 verdict #3): the physical plans of
  * the headline queries, canonicalized down to their OPERATOR SHAPE and
  * pinned as committed golden files. EXPLAIN.md documents the plans
  * prose-style and NOTES.md's "PLAN-VERIFIED" claims were manual diffs;
  * this spec makes the claim decidable — a Catalyst upgrade, a refactor
  * that silently de-broadcasts a join, an accidental extra Exchange, a
  * Window sneaking into a groupBy path, or a local sort going global
  * all change the canonical form and fail the diff.
  *
  * Canonical form: one line per operator, indented by tree depth,
  * carrying exactly the drift-prone facts —
  *   - `Exchange <PartitioningKind>` (hash / range / single-partition)
  *   - join node + join type + build side (so broadcast→SMJ drift and
  *     build-side flips are visible)
  *   - `Sort global` vs `Sort local` (the w_ntile lesson: a global sort
  *     is a single-task scale killer)
  *   - `Window` (windows are the hot-key buffering hazard — the
  *     dup-span lesson)
  *   - every other node by bare nodeName
  * and NOTHING else: no expressions, no stats, no plan ids, no file
  * paths — those churn without semantic drift. WholeStageCodegen
  * wrappers and InputAdapters are stripped for the same reason (codegen
  * span boundaries move with Spark minor versions; the operator list
  * beneath them is the invariant).
  *
  * AQE is disabled while capturing (the static plan is the canonical
  * object; AQE rewrites are runtime-local) and the broadcast threshold
  * is left at its default (broadcast decisions ARE part of the guarded
  * shape). InMemoryTableScan is kept but not descended into — the cache
  * boundary is shape; the cached fragment's plan is captured at its
  * definition site anyway.
  *
  * Regenerating after an INTENTIONAL plan change:
  *   SPARK_GRAFT_REGEN_PLANS=1 sbt "testOnly graft.ops.PlanGuardSpec"
  * then review + commit the golden diffs like any other code change.
  * A missing golden is written on first run and the test fails with a
  * commit instruction (never silently passes).
  */
class PlanGuardSpec extends SparkSpecBase {

  private val guarded = PlanGuardSpec.Guarded


  private def canonical(plan: SparkPlan): String = {
    val sb = new StringBuilder
    def partKind(p: SparkPlan): String =
      p.outputPartitioning.getClass.getSimpleName.stripSuffix("$")
    // None = transparent wrapper: skip the node, keep its children at
    // the parent's depth
    def label(p: SparkPlan): Option[String] = p match {
      case _: WholeStageCodegenExec => None
      case _: InputAdapter => None
      case e: exchange.ShuffleExchangeExec => Some(s"Exchange ${partKind(e)}")
      case _: exchange.BroadcastExchangeExec => Some("BroadcastExchange")
      case _: exchange.ReusedExchangeExec => Some("ReusedExchange")
      case j: joins.BroadcastHashJoinExec =>
        Some(s"BroadcastHashJoin ${j.joinType} ${j.buildSide}")
      case j: joins.ShuffledHashJoinExec =>
        Some(s"ShuffledHashJoin ${j.joinType} ${j.buildSide}")
      case j: joins.SortMergeJoinExec => Some(s"SortMergeJoin ${j.joinType}")
      case j: joins.BroadcastNestedLoopJoinExec =>
        Some(s"BroadcastNestedLoopJoin ${j.joinType}")
      case j: joins.CartesianProductExec => Some("CartesianProduct")
      case s: SortExec => Some(if (s.global) "Sort global" else "Sort local")
      case _: org.apache.spark.sql.execution.window.WindowExec => Some("Window")
      case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
        Some("WindowGroupLimit")
      case _: FileSourceScanExec => Some("Scan parquet")
      case other => Some(other.nodeName.takeWhile(_ != '(').trim)
    }
    def walk(p: SparkPlan, depth: Int): Unit = label(p) match {
      case None => p.children.foreach(walk(_, depth))
      case Some(l) =>
        sb.append("  " * depth).append(l).append('\n')
        // cache boundary: the fragment behind an InMemoryTableScan is
        // planned (and guarded) where it was defined, not re-walked here
        if (!p.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec])
          p.children.foreach(walk(_, depth + 1))
    }
    walk(plan, 0)
    sb.toString
  }

  private def capture(name: String): String = {
    val fn = SparkEntry.queries(name)
    val keys = Seq("spark.sql.adaptive.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys.head, "false")
    try {
      spark.catalog.clearCache() // normalize InMemoryTableScan presence
      val df: DataFrame = fn(spark, sf0001)
      canonical(df.queryExecution.executedPlan)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Golden directory inside the SOURCE tree (so regenerated files are
    * a reviewable git diff), located via the build.sbt walk rather than
    * cwd assumptions. */
  private lazy val goldenDir: Path = {
    val root = graft.Bench.repoRoot()
      .getOrElse(fail("cannot locate repo root (no build.sbt ancestor)"))
    val d = root.resolve("src/test/resources/graft/plans")
    Files.createDirectories(d)
    d
  }

  private val regen = sys.env.get("SPARK_GRAFT_REGEN_PLANS").contains("1")

  guarded.foreach { name =>
    test(s"plan shape pinned: $name") {
      val got = capture(name)
      val file = goldenDir.resolve(s"$name.plan")
      if (regen) {
        Files.writeString(file, got)
        info(s"regenerated $file")
      } else if (!Files.exists(file)) {
        Files.writeString(file, got)
        fail(s"no golden for $name — wrote $file from the current plan; " +
          "review it against EXPLAIN.md and commit it")
      } else {
        val want = Files.readString(file)
        assert(got == want,
          s"""plan shape drift in $name — if intentional, regenerate with
             |SPARK_GRAFT_REGEN_PLANS=1 and commit the golden diff.
             |=== golden ===
             |$want
             |=== current ===
             |$got""".stripMargin)
      }
    }
  }
}

/** The guarded-name list lives on the companion so
  * [[FloorConsistencySpec]] can cross-check goldens-on-disk against it
  * (an orphaned .plan file after a query rename would otherwise guard
  * nothing, silently). */
object PlanGuardSpec {
  /** Queries under guard — the bench headline families plus the plans
    * r10 specifically reshaped (dup-span gram counting, w_ntile_approx).
    * Keep construction-cheap entries only: each capture builds the
    * DataFrame at sf0.001 (training collects run; the guarded artifact
    * is the final plan). */
  val Guarded: Seq[String] = Seq(
    "q1_agg",
    "join_broadcast_star",
    "join_inner_agg",
    "ns_dedup_exact",
    "ns_dedup_jaccard",
    "ns_dedup_minhash",
    "ns_dedup_simhash",
    "ns_dup_ngram_spans",
    "ns_dup_span_removal",
    "ns_cosine_dup_pairs_banded",
    "ns_similarity_topk",
    "ns_similarity_ivf",
    "ns_lm_perplexity",
    "w_topk_heap",
    "w_ntile_approx",
    "t_tumbling_window",
    "f13_url_pipeline",
    // second wave (r10): the skew-mitigation plans (salting must stay
    // pre-aggregating), the as-of join's single-shuffle union shape,
    // the six-stage composed training mix, a snaplake read through the
    // stats/bloom file index, and the streaming-shaped enrich join
    "ns_dedup_minhash_salted",
    "agg_salted_sum",
    "join_asof",
    "ns_training_mix",
    "l_snaplake_skipping",
    "e_funnel",
    "t_stream_static_enrich",
    // the DOCUMENTED exception, pinned as such: w_ntile's golden
    // contains the one sanctioned empty-partition Window (SCALE.md).
    // Pinning it means a second global window can't hide behind "ntile
    // was always like that" — the golden diff shows exactly one.
    "w_ntile",
    // third wave (r10): the struct-max mode (partial/final SortAggregate
    // over the bounded count frame — a Window appearing here is the
    // regression), last-touch attribution (all user-keyed, no window),
    // and the chunker (map-side only: any Exchange beyond the canonical
    // sort is drift)
    "agg_mode",
    "e_attribution",
    "ns_chunk_overlap",
    // fourth wave (r10): rate-normalized retention must stay
    // window-free with the cohort-size side broadcast (its golden pins
    // the pruned recompute: Catalyst strips collect_set from that
    // branch, so it's a cheap min-only agg, not a second set
    // materialization), and the multiset set-op pins Spark's
    // counted-aggregate + generate shape with the final rollup riding
    // the SAME hash partitioning (exactly one wide exchange — a second
    // one, a sort, or a window appearing means the replicate plan
    // regressed)
    "e_retention_rate",
    "set_except_all",
    // the min(m,n) twin rides the identical counted-aggregate +
    // replicate-rows machinery; pinning both means a Spark upgrade
    // that replans ONE of the multiset ops shows up as a one-file diff
    "set_intersect_all",
    // fifth wave (r10): novelty must keep the hashed-shingle exchange
    // (text never shuffles) and its first-owner groupBy (a Window over
    // gh appearing is the dup-span regression); the histogram must keep
    // its bounded broadcast self-join (an Exchange between the bucket
    // agg and the running sum, or a Window, means the <= 63-row join
    // went wide); epochs must stay a broadcast envelope chain over the
    // one corpus shuffle inside sourceMixture
    "ns_ngram_novelty",
    "ns_token_histogram",
    "ns_epochs_per_source",
    // sixth wave (r10): the per-source gate must keep its sketch
    // aggregate + broadcast-filter shape (an exact percentile or a
    // Window appearing means the constant-state threshold regressed to
    // a group-buffering plan); inflation pins the single (source, md5)
    // exchange with count_distinct's partial dedup
    "ns_quality_gate_source",
    "ns_dup_inflation",
    // seventh wave (r10): the session rollup's windows must stay
    // user-keyed (an unpartitioned Window = the w_ntile hazard) with
    // both rollups riding the same user_id hash partitioning
    "e_session_stats",
    // r11: the text-stats tier's Zipf-hot counts reshaped from windows
    // to partial-agg groupBy + probe join (r10 verdict #1/#2) — a
    // Window over term/bg/s reappearing in these is the regression;
    // fuzzy's golden also pins the null-safe rep join + cache boundary
    "ns_tfidf_top_terms",
    "ns_fuzzy_prefix_pairs",
    // r11 (r10 verdict #4): rank-filter top-k scale-safety depends on
    // Spark 4 planning WindowGroupLimit BELOW the exchange (partial
    // mode) — these goldens pin that node, so a filter rewrite that
    // breaks the row_number() <= k pattern match (silently turning
    // per-key top-k into full-partition buffering) is a visible diff
    "w_row_number_topk",
    "ns_sample_stratified",
    // r11 second wave: the Gopher gate must stay ONE map-side codegen
    // projection (any Exchange beyond the canonical sort = a HOF fell
    // out of codegen into a shuffle-bearing rewrite); the composed
    // curation pipeline pins the gate->buckets->keep->rollup join
    // shape (the checkpoint boundary shows as the bucket side's scan);
    // the buckets rollup pins broadcast-cutpoint + fixed-point agg
    "ns_gopher_rules",
    "ns_ppl_buckets",
    "ns_lang_confusion",
    "ns_curation_pipeline",
    // r13: corpus statistics. Zipf pins the ONE (source, term) corpus
    // exchange with the rank window over the vocab-sized aggregate and
    // the map-side regression reduction (a Window or Exchange over raw
    // tokens = the tfidf regression class); divergence pins the same
    // single corpus shuffle with broadcast pair/probability joins (a
    // shuffled join over the vocab frames = the broadcast envelope
    // regressed); cdc pins the checkpoint boundary (chunk scan runs
    // ONCE) and exactly the chash aggregate + join-back exchanges
    "ns_zipf_slope",
    "ns_source_divergence",
    "ns_cdc_chunks",
    // r14: divergence_mix pins divergence's single corpus shuffle plus
    // the S²-sized argmin aggregate and the 1-row broadcast total (a
    // Window over pairs or a second corpus exchange = regression);
    // dim_stats pins the ONE (d) fixed-point exchange with the rank
    // window on the dim-sized aggregate (an Exchange between the agg
    // and the window = the partial-agg collapse broke). bpe_train is
    // driver-composed (12-row local result) and has no plan to pin.
    "ns_divergence_mix",
    "ns_embedding_dim_stats",
    // r15: shard_manifest pins the composed alloc→cap→manifest shape:
    // the divergence chain's single corpus exchange (checkpoint
    // boundary), the scan-style per-(source,bucket) prefix windows
    // with their KB-sized broadcast offset join, the S-row broadcast
    // alloc join, and ONLY bounded single-partition windows (the S-row
    // remainder rank + seq_start prefix — EXPLAIN.md's adjudicated
    // list); a corpus-sized global Window or a shuffled alloc join =
    // the packSequences scale lesson regressed
    "ns_shard_manifest",
    // r16: impact pins the graph-sized broadcast — the removed set
    // reaches the corpus scan as a BroadcastHashJoin LeftOuter (a
    // shuffled join here = the corpus re-partitioned for a KB-sized
    // probe side) and ONE corpus aggregate pair; the cluster chain
    // stays the checkpointed propagation ns_dedup_clusters pins
    "ns_dedup_impact",
    // r16: seq_fill pins the plan-bounded shape — the capped layout
    // behind a localCheckpoint (LocalTableScan feeding BOTH the
    // per-source totals and the segment explode: a replay of the corpus
    // prefix-sum chain per consumer = the small-frame-replay class
    // regressed), the S-row seq_start BroadcastHashJoin, and only the
    // bounded S-row seq_start window — a corpus-sized Window or a
    // shuffled starts join = the manifest scale lesson regressed
    "ns_shard_seq_fill",
    // r15: curriculum pins the score scan behind a checkpoint (the
    // cutpoint aggregate and the output share ONE quality-feature
    // pass), the 1-row broadcast cutpoint join, and windows partitioned
    // by (phase, shard) — a SinglePartition exchange before the rank =
    // the corpus-sized-window anti-pattern regressed
    "ns_curriculum_order",
    // r16: curriculum×mixture pins the checkpointed score frame + 1-row
    // broadcast cutpoints (curriculumOrder's shape), ONE narrow doc_id
    // equi-join attaching (source, tokens), one aggregate pair, NO
    // windows — a Window or a second corpus-side exchange = the
    // schedule-report chain regressed
    "ns_curriculum_mix",
    // r15: drift_z pins exactly TWO exchanges — the (label, d)
    // fixed-point corpus shuffle, then the (label) rollup whose input
    // is already the |labels|·dim aggregate — and no Window (a third
    // Exchange or any Window = the map-side partial-agg collapse or
    // the dim-sized-frame contract broke)
    "ns_embedding_drift_z")
}
