package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ml.Similarity
import graft.ml.Similarity.IvfPqIndex

/** Streaming ANN enrichment — the online half of the IVF-PQ tier: every
  * arriving embedding is a QUERY against a frozen [[IvfPqIndex]], and
  * each micro-batch emits the arrival's top-k nearest corpus vectors by
  * ADC score. This is the shape a continuously-ingesting training-data
  * pipeline runs similarity in: the corpus index is trained and encoded
  * offline (one batch job), then a stream of new documents is enriched
  * with "what does this arrival resemble?" — near-dup flagging against a
  * reference corpus, retrieval-context attachment, or contamination
  * tagging against an eval set, all without ever rebuilding the index on
  * the hot path.
  *
  * Composition, not new machinery: the per-batch transform IS
  * [[Similarity.ivfpqProbe]] — the same probe half the scored
  * `ns_similarity_ivfpq` query runs — applied inside `foreachBatch`, so
  * streamed results are bit-identical to the batch tier on the same
  * arrivals (AnnStreamsSpec pins this batch-parity). Per micro-batch the
  * query side (centroid probes + ADC LUT) is broadcast — a few hundred
  * rows per arrival — and the corpus-sized code table is joined on the
  * inverted-list key; with an `eager` index the codes are materialized
  * pre-partitioned by `lid`, so a batch's cost is proportional to the
  * probed lists, not the corpus.
  *
  * Delivery is effectively-once via the batch-id-keyed overwrite sink
  * ([[EventStreams.idempotentParquetSink]]): a replayed micro-batch
  * re-probes the SAME frozen index (nothing about the index depends on
  * what streamed through it) and overwrites its own partition with
  * identical rows.
  */
object AnnStreams {

  /** Per-batch enrichment: probe `batch` (vec_id, embedding, ...) against
    * the frozen index. Pure — safe under micro-batch replay. */
  def annEnrichBatch(index: IvfPqIndex, k: Int, nprobe: Int)(
      batch: DataFrame): DataFrame =
    Similarity.ivfpqProbe(index,
      batch.select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
      k, nprobe)

  /** foreachBatch sink: enrich, then land in `out/batch_id=N` via the
    * idempotent overwrite sink. */
  def annEnrichSink(index: IvfPqIndex, k: Int, nprobe: Int, out: String)(
      batch: DataFrame, batchId: Long): Unit =
    EventStreams.idempotentParquetSink(out)(
      annEnrichBatch(index, k, nprobe)(batch), batchId)

  /** Per-batch enrichment WITH the refine stage: ADC retrieves `rerankK`
    * candidates from the frozen index, then only those candidates' raw
    * vectors are fetched from `corpusVectors` (the durable
    * (vec_id, embedding) table the index was built from — e.g. the
    * SnapshotLake snapshot) and re-scored with the exact cosine; the
    * emitted top-k carries TRUE similarities, the property downstream
    * dedup/contamination thresholds need. The rerank is
    * [[Similarity.exactRerank]], the same implementation the batch
    * `ns_similarity_ivfpq_rerank` query ends with. */
  def annEnrichRerankedBatch(index: IvfPqIndex, corpusVectors: DataFrame,
      k: Int, rerankK: Int, nprobe: Int)(batch: DataFrame): DataFrame = {
    val queries =
      batch.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cands = Similarity.ivfpqProbe(index, queries, rerankK, nprobe)
      .select(col("query_id"), col("vec_id"))
    Similarity.exactRerank(cands,
      corpusVectors.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")),
      queries.select(col("vec_id").as("query_id"), col("v").as("qv")), k)
  }

  /** foreachBatch sink for the reranked enrichment. */
  def annEnrichRerankedSink(index: IvfPqIndex, corpusVectors: DataFrame,
      k: Int, rerankK: Int, nprobe: Int, out: String)(
      batch: DataFrame, batchId: Long): Unit =
    EventStreams.idempotentParquetSink(out)(
      annEnrichRerankedBatch(index, corpusVectors, k, rerankK, nprobe)(batch),
      batchId)

  /** GROWING-index ingest sink — the online half of FAISS add(): each
    * micro-batch's arrivals are encoded under the frozen quantizer
    * ([[Similarity.ivfpqEncode]] — the same implementation the build
    * uses) and the code rows are appended as one
    * [[graft.ingest.SnapshotLake]] commit, so later probes that read
    * the lake see them. The quantizer never moves; growth is
    * append-only rows, and a REPLAYED batch appends byte-identical
    * rows — benign duplicates [[grownCodes]] collapses on
    * (vec_id, sub). Commit-per-batch also means the lake's versions
    * ARE the ingest history: time travel reads the index as of any
    * batch. */
  def indexAppendSink(index: IvfPqIndex, lake: graft.ingest.SnapshotLake)(
      batch: DataFrame, batchId: Long): Unit = {
    val codes = Similarity.ivfpqEncode(index,
      batch.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")))
    if (!codes.isEmpty) lake.commit(codes, overwrite = false)
  }

  /** The grown code table: the lake's latest snapshot with replayed
    * appends collapsed — (vec_id, sub) is the code key, and duplicates
    * are byte-identical by the frozen-quantizer determinism, so any
    * surviving row is THE row. Compose with the base index via
    * `index.copy(codes = index.codes.unionByName(grownCodes(...)))`. */
  def grownCodes(spark: SparkSession, lake: graft.ingest.SnapshotLake): DataFrame =
    lake.read(spark).dropDuplicates("vec_id", "sub")

  /** Drain `srcDir` (parquet arrivals, one micro-batch per file) through
    * the enrichment sink with Trigger.AvailableNow. */
  def runOnce(spark: SparkSession, srcDir: String, index: IvfPqIndex,
      k: Int, nprobe: Int, outDir: String, checkpoint: String): Unit =
    drain(spark, srcDir, checkpoint, annEnrichSink(index, k, nprobe, outDir))

  /** [[runOnce]] with the refine stage ([[annEnrichRerankedSink]]). */
  def runOnceReranked(spark: SparkSession, srcDir: String,
      index: IvfPqIndex, corpusVectors: DataFrame, k: Int, rerankK: Int,
      nprobe: Int, outDir: String, checkpoint: String): Unit =
    drain(spark, srcDir, checkpoint,
      annEnrichRerankedSink(index, corpusVectors, k, rerankK, nprobe, outDir))

  /** [[runOnce]] for the growing-index ingest ([[indexAppendSink]]). */
  def runOnceGrow(spark: SparkSession, srcDir: String, index: IvfPqIndex,
      lake: graft.ingest.SnapshotLake, checkpoint: String): Unit =
    drain(spark, srcDir, checkpoint, indexAppendSink(index, lake))

  private def drain(spark: SparkSession, srcDir: String, checkpoint: String,
      sink: (DataFrame, Long) => Unit): Unit = {
    val src = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
    val q = src.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch(sink)
      .start()
    q.awaitTermination()
  }
}
