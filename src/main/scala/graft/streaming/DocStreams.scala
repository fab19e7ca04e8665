package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming document ingest with content-level exact dedup against a
  * persistent fingerprint ledger — the reference's resumable saved-work
  * ledger (app.js:438-455 semantics) upgraded from URL-identity to
  * content identity (md5 of text), running continuously.
  *
  * Per micro-batch: dedup within the batch (first doc_id wins per
  * fingerprint), anti-join against the ledger of everything already
  * accepted, append survivors to both the output corpus and the ledger.
  * The ledger is append-only fingerprints (16-byte hashes + ids), so at
  * 100 TB it stays a small fraction of the corpus and the anti-join
  * broadcasts or shuffles hashes only — never text. Batch replay is
  * idempotent: a replayed batch's fingerprints are already in the
  * ledger, so its docs anti-join away.
  */
object DocStreams {

  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def fromParquetDir(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(DocSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(dir)

  /** foreachBatch body: ledger-dedup `batch` and append survivors. */
  def dedupIngestSink(spark: SparkSession, ledgerDir: String,
      outDir: String)(batch: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(ledgerDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val fingerprinted = batch.withColumn("fp", md5(col("text")))
    // within-batch: first doc_id wins per fingerprint
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("doc_id"))
    val batchFirst = fingerprinted
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .drop("rk")
    // cross-batch: drop anything already in the ledger. Explicit schema:
    // a crash can leave the ledger dir existing but holding no committed
    // part files, where schema inference would fail and wedge every
    // replay.
    val fresh =
      if (fs.exists(new Path(ledgerDir)))
        batchFirst.join(
          spark.read.schema("fp STRING, doc_id BIGINT").parquet(ledgerDir)
            .select(col("fp")),
          Seq("fp"), "left_anti")
      else batchFirst
    // persist: both writes below consume this plan; uncached it would
    // re-run the window dedup + ledger anti-join per write
    fresh.persist()
    try {
      // data first, ledger second (reference's crash-safe ordering: a
      // crash between the writes re-admits, never loses)
      fresh.drop("fp").write.mode("append").parquet(outDir)
      fresh.select(col("fp"), col("doc_id")).write.mode("append")
        .parquet(ledgerDir)
    } finally fresh.unpersist()
  }

  /** Drain a bounded doc stream through the dedup-ingest sink. */
  def runOnce(spark: SparkSession, srcDir: String, ledgerDir: String,
      outDir: String, checkpoint: String): Unit = {
    val q = fromParquetDir(spark, srcDir).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch(dedupIngestSink(spark, ledgerDir, outDir) _)
      .start()
    q.awaitTermination()
  }
}
