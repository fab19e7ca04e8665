package graft.streaming

import org.apache.spark.sql.functions._
import graft.{SparkSpecBase, Tables}
import graft.ml.Similarity
import java.nio.file.Files

/** Streaming ANN enrichment vs the batch IVF-PQ tier: arrivals probed
  * per micro-batch against a frozen index must produce exactly the rows
  * `ivfpqTopK` (the scored `ns_similarity_ivfpq` path) produces for the
  * same query set — batch-parity is the operator's contract, since the
  * stream IS the batch probe applied per micro-batch.
  */
class AnnStreamsSpec extends SparkSpecBase {
  import spark.implicits._

  private val qids: Seq[Long] = 0L to 7L // ns_similarity_ivfpq's query set

  test("streamed enrichment == batch ivfpqTopK on the same arrivals; replay no-op") {
    val emb = Tables.embeddings(spark, sf0001)
    val index = Similarity.ivfpqIndex(emb, qids, eager = true)

    // arrivals: the batch tier's query vectors, in two waves
    val src = Files.createTempDirectory("graft_ann_src").toString
    val out = Files.createTempDirectory("graft_ann_out").toString + "/o"
    val ckpt = Files.createTempDirectory("graft_ann_ckpt").toString
    val arrivals = emb.filter($"vec_id".isin(qids: _*))
      .select($"vec_id", $"embedding")
    arrivals.filter($"vec_id" < 4).coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100) // strictly increasing mtimes → deterministic batch order
    arrivals.filter($"vec_id" >= 4).coalesce(1).write.mode("append").parquet(src)

    AnnStreams.runOnce(spark, src, index, k = 5, nprobe = 4, out, ckpt)

    // genuinely incremental: each wave landed in its own batch partition
    val batches = spark.read.parquet(s"$out/batch_id=*")
      .withColumn("batch_id",
        regexp_extract(input_file_name(), "batch_id=(\\d+)", 1).cast("long"))
    assert(batches.select($"batch_id").distinct().count() >= 2,
      "arrivals collapsed into one micro-batch — no streaming happened")

    // batch-parity: streamed union == ivfpqTopK rows, exactly
    val streamed = batches
      .select($"query_id", $"rank", $"vec_id", $"adc_dot")
      .as[(Long, Int, Long, Double)].collect().toSet
    val batch = Similarity.ivfpqTopK(emb, qids, 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(streamed == batch,
      s"streamed enrichment diverged from batch tier: " +
        s"missing ${(batch -- streamed).size}, extra ${(streamed -- batch).size}")

    // replay of wave 0: the frozen index is arrival-independent, so the
    // re-probed batch overwrites its own partition with identical rows
    AnnStreams.annEnrichSink(index, 5, 4, out)(
      emb.filter($"vec_id" < 4).select($"vec_id", $"embedding"), 0L)
    val replayed = spark.read.parquet(s"$out/batch_id=*")
      .select($"query_id", $"rank", $"vec_id", $"adc_dot")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(replayed == batch, "replay changed the enriched output")
  }

  test("durable index: codes written to storage probe identically on re-read") {
    // the production contract the eager-index scaladoc states: a
    // long-running stream should persist the codes table once
    // (partitioned by the inverted-list key) and probe the re-read
    // frame — same results, durable storage instead of executor-local
    // checkpoint blocks
    val emb = Tables.embeddings(spark, sf0001)
    val index = Similarity.ivfpqIndex(emb, qids)
    val dir = Files.createTempDirectory("graft_ann_codes").toString + "/codes"
    index.codes.write.partitionBy("lid").parquet(dir)
    val reloaded = index.copy(codes = spark.read.parquet(dir)
      .select($"lid".cast("long"), $"vec_id", $"sub", $"cid"))
    val queries = emb.filter($"vec_id".isin(qids: _*))
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val live = Similarity.ivfpqProbe(index, queries, 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val durable = Similarity.ivfpqProbe(reloaded, queries, 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(live == durable, "durable codes diverged from live index")
  }

  test("growing index: streamed appends == batch encode; twin retrieved; replay benign") {
    val emb = Tables.embeddings(spark, sf0001)
    // arrivals: two fresh vectors, one of them a verbatim TWIN of query 0
    val q0 = emb.filter($"vec_id" === 0L)
      .select($"embedding").as[Array[Float]].head()
    val other = q0.map(x => -x)
    val arrivals = Seq((900001L, q0), (900002L, other))
      .toDF("vec_id", "embedding")
    // quantizer frozen over the base corpus (arrival ids excluded by
    // construction: they are not in emb)
    val index = Similarity.ivfpqIndex(emb, qids, eager = true)
    val lake = new graft.ingest.SnapshotLake(
      Files.createTempDirectory("graft_ann_grow").toString + "/lake")
    val src = Files.createTempDirectory("graft_ann_grow_src").toString
    val ckpt = Files.createTempDirectory("graft_ann_grow_ckpt").toString
    val markers = Files.createTempDirectory("graft_ann_grow_mk").toString
    // zero-growth composition is the base index, not an error
    assert(AnnStreams.grownCodes(spark, lake).isEmpty)
    arrivals.filter($"vec_id" === 900001L).coalesce(1)
      .write.mode("append").parquet(src)
    Thread.sleep(1100)
    arrivals.filter($"vec_id" === 900002L).coalesce(1)
      .write.mode("append").parquet(src)

    AnnStreams.runOnceGrow(spark, src, index, lake, markers, ckpt)

    // streamed growth == batch encode of the same arrivals, exactly
    val streamedCodes = AnnStreams.grownCodes(spark, lake)
      .as[(Long, Long, Int, Int)].collect().toSet
    val batchCodes = Similarity.ivfpqEncode(index,
        arrivals.select($"vec_id", $"embedding".cast("array<double>").as("v")))
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(streamedCodes == batchCodes, "grown codes diverged from batch encode")
    // the lake's commit history IS the ingest history: one version per batch
    assert(lake.versions(spark) == Seq(1L, 2L))

    // probing the GROWN index finds the twin: identical vector → its ADC
    // dot is query 0's maximal reconstruction dot
    val grown = AnnStreams.grownIndex(spark, lake, index)
    val queries = emb.filter($"vec_id" === 0L)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val top = Similarity.ivfpqProbe(grown, queries, 5)
      .orderBy($"rank").select($"vec_id").as[Long].collect()
    assert(top.contains(900001L),
      s"planted twin not retrieved from the grown index: ${top.mkString(",")}")

    // marker sweep: after the run only the NEWEST batch's marker
    // survives (earlier batches are committed in the checkpoint and can
    // never be re-queried — their markers are dead and must not
    // accumulate one file per batch forever)
    val fs = new org.apache.hadoop.fs.Path(markers)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(markers))
      .map(_.getPath.getName).toSet == Set("batch-1"),
      "dead batch markers were not swept")

    // checkpoint-replay of the newest batch (the only batch Structured
    // Streaming can actually replay): the marker detects it and the
    // sink skips whole — version history stays the batch history
    AnnStreams.indexAppendSink(index, lake, markers)(
      arrivals.filter($"vec_id" === 900002L), 1L)
    assert(lake.versions(spark) == Seq(1L, 2L),
      "marker did not suppress a replayed batch's duplicate commit")

    // crash window (commit landed, marker lost): the re-append writes
    // byte-identical rows and the collapsed code table is unchanged
    fs.delete(new org.apache.hadoop.fs.Path(s"$markers/batch-1"), false)
    AnnStreams.indexAppendSink(index, lake, markers)(
      arrivals.filter($"vec_id" === 900002L), 1L)
    assert(lake.versions(spark).size == 3)
    assert(AnnStreams.grownCodes(spark, lake)
      .as[(Long, Long, Int, Int)].collect().toSet == batchCodes,
      "crash-window re-append changed the collapsed code table")

    // compaction: one generation survives, the collapsed table and the
    // grown probe are unchanged, and further appends keep working
    val cv = AnnStreams.compactGrown(spark, lake)
    assert(lake.versions(spark) == Seq(cv), "compaction left old versions")
    assert(AnnStreams.grownCodes(spark, lake)
      .as[(Long, Long, Int, Int)].collect().toSet == batchCodes,
      "compaction changed the collapsed code table")
    val lakeRoot = lake.dirsAt(spark, cv)
    assert(lakeRoot.size == 1, s"compaction left ${lakeRoot.size} generations")
    val topAfter = Similarity.ivfpqProbe(
        AnnStreams.grownIndex(spark, lake, index), queries, 5)
      .orderBy($"rank").select($"vec_id").as[Long].collect()
    assert(topAfter.sameElements(top), "probe changed across compaction")
  }

  test("quantizer REBUILD recovers recall lost to drifted appends; old version time-travels") {
    val emb = Tables.embeddings(spark, sf0001)
    // DRIFTED appends: 48 vectors in a region the frozen quantizer has
    // never seen — negated and 3x-scaled copies of base vectors. Under
    // the base codebook their reconstructions stay in the base region,
    // so ADC scores against drifted queries are noise; this is the
    // unbounded-drift failure FAISS answers with retrain + re-add.
    val drifted = emb.filter($"vec_id".between(100L, 147L))
      .select(($"vec_id" + 910000L).as("vec_id"),
        transform($"embedding".cast("array<double>"), x => x * -3.0d)
          .as("embedding"))
    val index = Similarity.ivfpqIndex(emb, qids, eager = true)
    val lake = new graft.ingest.SnapshotLake(
      Files.createTempDirectory("graft_ann_rebuild").toString + "/lake")
    val markers = Files.createTempDirectory("graft_ann_rebuild_mk").toString
    AnnStreams.indexAppendSink(index, lake, markers)(drifted, 0L)
    val vPre = lake.latestVersion(spark).get
    val preCodes = AnnStreams.grownCodes(spark, lake)
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(preCodes.nonEmpty)

    // queries: PERTURBED drifted vectors (not in any corpus) — an exact
    // twin would be a matched filter (query and twin share the same
    // optimal codeword per sub, so even a blind codebook ranks it first);
    // what drift actually degrades is NEAR-neighbor ranking, so the
    // queries mix two drifted vectors and recall is measured against the
    // brute-force exact-cosine truth
    val dv = drifted.select($"vec_id", $"embedding")
      .as[(Long, Seq[Double])].collect().toMap
    val queries = (0 until 8).map { i =>
      val a = dv(910100L + i); val b = dv(910120L + i)
      (920000L + i, a.zip(b).map { case (x, y) => 0.9 * x + 0.3 * y })
    }.toDF("vec_id", "v")
    val corpusAll = emb
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .unionByName(drifted.select($"vec_id", $"embedding".as("v")))
    val truth: Map[Long, Set[Long]] = queries
      .select($"vec_id".as("query_id"), $"v".as("qv"))
      .crossJoin(corpusAll)
      .select($"query_id", $"vec_id",
        Similarity.cosine($"qv", $"v").as("c"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"c".desc, $"vec_id")))
      .filter($"rk" <= 5)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // metric: the PRODUCTION probe shape — ADC retrieve rerankK
    // candidates, exact-cosine rerank to top-5 (annEnrichRerankedBatch,
    // the same stack ns_similarity_ivfpq_rerank scores). Raw ADC
    // ranking at ksub=16 is resolution-limited for ANY codebook (the
    // documented PQ crudeness), so what a rebuild measurably recovers
    // is RETRIEVAL: whether the true neighbors are in the probed lists
    // and survive the ADC top-rerankK cut at all. Rerank then reports
    // exact scores, so recall differences are pure retrieval.
    def recallAt5(idx: Similarity.IvfPqIndex): Double = {
      val got = AnnStreams.annEnrichRerankedBatch(idx,
          corpusAll.select($"vec_id", $"v".as("embedding")),
          k = 5, rerankK = 12, nprobe = 2)(
          queries.select($"vec_id", $"v".as("embedding")))
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size / 5.0
      }.sum / truth.size
    }
    val frozenRecall = recallAt5(AnnStreams.grownIndex(spark, lake, index))
    info(s"frozen reranked recall@5 on drifted queries: $frozenRecall")

    // grown fraction below threshold: maybeRebuild composes, commits
    // nothing. driftThreshold = +∞ isolates the grown gate — this
    // fixture's arrivals ARE drifted (−3×), and the now-default z gate
    // (r15) would correctly fire on them; the dedicated drift-gate
    // test below owns that behavior.
    val (composed, noV) = AnnStreams.maybeRebuild(spark, lake, index,
      corpus = emb.select($"vec_id", $"embedding").unionByName(drifted),
      threshold = 0.5, driftThreshold = Double.PositiveInfinity)
    assert(noV.isEmpty && lake.latestVersion(spark).contains(vPre),
      "maybeRebuild committed below threshold")
    // 492 base (500 minus the 8 excluded qids) + 48 drifted
    assert(composed.codes.select($"vec_id").distinct().count() == 540)

    // drift above threshold (48/548 ≈ 0.088): retrain + re-encode as one
    // overwrite commit
    val (rebuilt, someV) = AnnStreams.maybeRebuild(spark, lake, index,
      corpus = emb.select($"vec_id", $"embedding").unionByName(drifted),
      threshold = 0.05)
    val vNew = someV.getOrElse(fail("maybeRebuild did not rebuild"))
    assert(vNew > vPre)
    // recall RECOVERY: Lloyd rounds move coarse centroids into the
    // drifted shell (it is SSE-rich: 48 vectors at 3x scale) so probed
    // lists align with the drifted geometry, and the trained codebook
    // spends codewords there so true neighbors survive the ADC
    // top-rerankK cut. Measured ~0.48 vs the frozen 0.30 at
    // nprobe=2/rerankK=12; the frozen number is fully deterministic,
    // the margins absorb the float-mean wobble trained centroids carry.
    val rebuiltRecall = recallAt5(rebuilt)
    info(s"rebuilt reranked recall@5 on drifted queries: $rebuiltRecall")
    assert(rebuiltRecall >= 0.38,
      s"rebuilt index still blind to drifted region: recall $rebuiltRecall")
    assert(rebuiltRecall > frozenRecall + 0.05,
      s"no recovery: frozen $frozenRecall vs rebuilt $rebuiltRecall")

    // the rebuilt commit carries the WHOLE corpus (base + drifted)...
    assert(rebuilt.codes.select($"vec_id").distinct().count() == 548)
    // ...and the pre-rebuild code table is still time-travel-readable
    val timeTravel = lake.readAt(spark, vPre)
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(timeTravel == preCodes,
      "pre-rebuild version no longer reads back identically")
  }

  test("post-rebuild ingest: appends under the new quantizer compose via grownIndex") {
    // the documented post-rebuild contract: the returned index IS the
    // new frozen artifact — ingest continues against it, and grownIndex
    // composes the rebuilt commit with later appends exactly as before
    val emb = Tables.embeddings(spark, sf0001)
    val lake = new graft.ingest.SnapshotLake(
      Files.createTempDirectory("graft_ann_postrb").toString + "/lake")
    val (rebuilt, v) = AnnStreams.rebuildIndex(spark, lake,
      emb.select($"vec_id", $"embedding"))
    assert(lake.latestVersion(spark).contains(v))
    // a later arrival: a verbatim twin of vector 3, encoded under the
    // REBUILT quantizer and appended as the next lake commit
    val twin = emb.filter($"vec_id" === 3L)
      .select(lit(930001L).as("vec_id"), $"embedding")
    val markers = Files.createTempDirectory("graft_ann_postrb_mk").toString
    AnnStreams.indexAppendSink(rebuilt, lake, markers)(twin, 0L)
    assert(lake.latestVersion(spark).contains(v + 1))
    val grown = AnnStreams.grownIndex(spark, lake, rebuilt)
    // the collapsed composition holds the full corpus + the arrival once
    assert(grown.codes.select($"vec_id").distinct().count() == 501)
    // and the twin is retrieved for its original's query
    val queries = emb.filter($"vec_id" === 3L)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val top = Similarity.ivfpqProbe(grown, queries, 5)
      .orderBy($"rank").select($"vec_id").as[Long].collect()
    assert(top.contains(930001L),
      s"twin not retrieved after post-rebuild append: ${top.mkString(",")}")
  }

  test("grownFraction after a rebuild counts only genuinely new arrivals") {
    // Regression (r8 advice): rebuildIndex overwrites the lake with the
    // full re-encoded corpus AND returns an index probing that same
    // table, so a grown-count that doesn't subtract index-known ids
    // reports ~0.5 drift with ZERO new arrivals — and the documented
    // maintenance loop then retrains on every cycle at any threshold
    // <= 0.5. 'Grown' must mean: lake ids the index does not probe.
    val emb = Tables.embeddings(spark, sf0001)
    val lake = new graft.ingest.SnapshotLake(
      Files.createTempDirectory("graft_ann_frac").toString + "/lake")
    val (rebuilt, v) = AnnStreams.rebuildIndex(spark, lake,
      emb.select($"vec_id", $"embedding"))
    assert(AnnStreams.grownFraction(spark, lake, rebuilt) == 0.0,
      "zero arrivals after a rebuild must gauge zero drift")
    val (_, noV) = AnnStreams.maybeRebuild(spark, lake, rebuilt,
      corpus = emb.select($"vec_id", $"embedding"), threshold = 0.4)
    assert(noV.isEmpty && lake.latestVersion(spark).contains(v),
      "maybeRebuild retrained with zero new arrivals")
    // one genuine arrival: fraction = 1 / (500 base + 1)
    val twin = emb.filter($"vec_id" === 3L)
      .select(lit(940001L).as("vec_id"), $"embedding")
    val markers = Files.createTempDirectory("graft_ann_frac_mk").toString
    AnnStreams.indexAppendSink(rebuilt, lake, markers)(twin, 0L)
    val fr = AnnStreams.grownFraction(spark, lake, rebuilt)
    assert(math.abs(fr - 1.0 / 501) < 1e-12,
      s"one arrival over a 500-vector base should gauge 1/501, got $fr")
  }

  test("drift gate: a drifted-but-NOT-grown stream triggers the rebuild") {
    // r14 (r13 verdict #4): grownFraction alone misses the failure mode
    // the recall spec demonstrates — few arrivals, far from the frozen
    // codebook. The drift statistic (embeddingDrift over ref = index-
    // known ids vs cur = arrivals) must be an actual maybeRebuild
    // input: same −3× fixture as the recall spec, small enough to stay
    // under the grown gate.
    val emb = Tables.embeddings(spark, sf0001)
    val index = Similarity.ivfpqIndex(emb, Seq.empty, eager = true)
    val lake = new graft.ingest.SnapshotLake(
      Files.createTempDirectory("graft_ann_drift").toString + "/lake")
    val markers = Files.createTempDirectory("graft_ann_drift_mk").toString
    val drifted = emb.filter($"vec_id".between(100L, 147L))
      .select(($"vec_id" + 950000L).as("vec_id"),
        transform($"embedding".cast("array<double>"), x => x * -3.0d)
          .cast("array<float>").as("embedding"))
    AnnStreams.indexAppendSink(index, lake, markers)(drifted, 0L)
    val corpus = emb.select($"vec_id", $"embedding").unionByName(drifted)
    // 48/548 ≈ 0.088 grown — under a 0.3 gate; but the arrivals sit at
    // −3× the reference geometry, so the mean-shift is material
    assert(AnnStreams.grownFraction(spark, lake, index) < 0.3)
    val drift = AnnStreams.indexDrift(spark, index, corpus)
    assert(drift > 0.1, s"−3× arrivals should register drift, got $drift")
    // r15 (verdict #2): the gate ships ON. The dimensionless z reads
    // ≈3.2 on this fixture — above the shipped two-sigma default —
    // while a no-drift arrival batch (true twins of index-known
    // vectors under fresh ids) reads ≈1.0, below it. Both sides at the
    // DEFAULT threshold, nothing hand-picked.
    val z = AnnStreams.indexDriftZ(spark, index, corpus)
    assert(z > AnnStreams.DefaultDriftZ,
      s"−3× arrivals must exceed the default two-sigma gate, got $z")
    val calm = emb.filter($"vec_id".between(200L, 247L))
      .select(($"vec_id" + 960000L).as("vec_id"), $"embedding")
    val calmZ = AnnStreams.indexDriftZ(spark, index,
      emb.select($"vec_id", $"embedding").unionByName(calm))
    assert(calmZ < AnnStreams.DefaultDriftZ,
      s"no-drift twins must stay under the default gate, got $calmZ")
    // drifted-but-not-grown: DEFAULT maybeRebuild retrains even though
    // the grown gate is silent
    val (rebuilt, someV) = AnnStreams.maybeRebuild(spark, lake, index,
      corpus = corpus, threshold = 0.3)
    assert(someV.isDefined,
      "drifted-but-not-grown stream did not rebuild at the default gate")
    assert(rebuilt.codes.select($"vec_id").distinct().count() == 548)
    // post-rebuild: every corpus id is reference, so drift reads 0 and
    // the same default gate no longer fires (the loop converges)
    assert(AnnStreams.indexDrift(spark, rebuilt, corpus) == 0.0,
      "post-rebuild drift must read zero (no current side)")
    assert(AnnStreams.indexDriftZ(spark, rebuilt, corpus) == 0.0,
      "post-rebuild drift z must read zero (no current side)")
    val (_, again) = AnnStreams.maybeRebuild(spark, lake, rebuilt,
      corpus = corpus, threshold = 0.3)
    assert(again.isEmpty, "default drift gate re-fired after the rebuild")
  }

  test("streamed refine == batch ivfpqTopKReranked on the same arrivals") {
    val emb = Tables.embeddings(spark, sf0001)
    val index = Similarity.ivfpqIndex(emb, qids, eager = true)
    val src = Files.createTempDirectory("graft_annr_src").toString
    val out = Files.createTempDirectory("graft_annr_out").toString + "/o"
    val ckpt = Files.createTempDirectory("graft_annr_ckpt").toString
    val arrivals = emb.filter($"vec_id".isin(qids: _*))
      .select($"vec_id", $"embedding")
    arrivals.filter($"vec_id" < 4).coalesce(1).write.mode("append").parquet(src)
    Thread.sleep(1100)
    arrivals.filter($"vec_id" >= 4).coalesce(1).write.mode("append").parquet(src)

    AnnStreams.runOnceReranked(spark, src, index, corpusVectors = emb,
      k = 5, rerankK = 20, nprobe = 4, out, ckpt)

    val streamed = spark.read.parquet(s"$out/batch_id=*")
      .select($"query_id", $"rank", $"vec_id", $"cos_sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    val batch = Similarity.ivfpqTopKReranked(emb, qids, 5, rerankK = 20)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(streamed == batch,
      s"streamed refine diverged from batch tier: " +
        s"missing ${(batch -- streamed).size}, extra ${(streamed -- batch).size}")
  }

  test("drift gate ABSTAINS (0.0, no NPE) on a zero-variance reference " +
      "(r16 ADVICE)") {
    // Degenerate/constant reference batch: every reference dimension is
    // zero-variance, so every per-dim t drops by the exact num = 0 test,
    // count(t) = 0, and drift_z is NULL. Pre-fix, Row.getDouble(0) threw
    // NPE — maybeRebuild CRASHED on exactly the batch shape a stuck
    // upstream producer (constant vectors) emits, instead of gating.
    // Only index.codes.vec_id is consulted by the membership tag, so a
    // minimal hand-built IvfPqIndex suffices.
    val ref = Seq((0L, Array.fill(8)(1.0)), (2L, Array.fill(8)(1.0)))
    val cur = Seq((1L, Array.fill(8)(3.0)))
    val corpus = (ref ++ cur).toDF("vec_id", "embedding")
    val index = Similarity.IvfPqIndex(
      centroids = spark.emptyDataFrame, codebook = spark.emptyDataFrame,
      codes = ref.map(_._1).toDF("vec_id"), m = 1, dim = 8)
    val z = AnnStreams.indexDriftZ(spark, index, corpus)
    assert(z == 0.0, s"zero-variance reference must abstain with 0.0, got $z")
  }
}
