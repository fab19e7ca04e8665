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

    // checkpoint-replay of batch 0: the marker detects it and the sink
    // skips whole — version history stays the batch history
    AnnStreams.indexAppendSink(index, lake, markers)(
      arrivals.filter($"vec_id" === 900001L), 0L)
    assert(lake.versions(spark) == Seq(1L, 2L),
      "marker did not suppress a replayed batch's duplicate commit")

    // crash window (commit landed, marker lost): the re-append writes
    // byte-identical rows and the collapsed code table is unchanged
    val fs = new org.apache.hadoop.fs.Path(markers)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$markers/batch-0"), false)
    AnnStreams.indexAppendSink(index, lake, markers)(
      arrivals.filter($"vec_id" === 900001L), 0L)
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
}
