package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{SparkSpecBase, Tables}
import java.nio.file.Files

class DistinctCountSpec extends SparkSpecBase {
  import spark.implicits._
  import DistinctCountStream._

  override protected def stateStoreProvider: Option[String] =
    Some(graft.SparkSpecBase.RocksDBProvider) // transformWithState requires it

  private def run(srcDir: String): Map[String, Long] = {
    val docs = Tables.documents(spark, sf0001)
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val tokens = src
      .select($"lang", explode(split(trim(lower($"text")), "\\s+")).as("tok"))
      .filter(length($"tok") > 0)
    val out = Files.createTempDirectory("graft_hll_out").toString
    val ckpt = Files.createTempDirectory("graft_hll_ckpt").toString
    val q = streamingDistinct(tokens, "lang", "tok").writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch((df: org.apache.spark.sql.Dataset[DistinctEmit], id: Long) =>
        EventStreams.idempotentParquetSink(out)(df.toDF(), id))
      .start()
    q.awaitTermination()
    val emits = spark.read.parquet(s"$out/batch_id=*")
    val last = emits.groupBy($"key").agg(max($"emit_seq").as("emit_seq"))
    emits.join(last, Seq("key", "emit_seq"))
      .select($"key", $"n_distinct_est")
      .as[(String, Long)].collect().toMap
  }

  test("streaming HLL: per-key estimates within the rsd bound; split-invariant") {
    val docs = Tables.documents(spark, sf0001)
    // stage 1: one wave
    val one = Files.createTempDirectory("graft_hll_one").toString
    docs.coalesce(1).write.mode("append").parquet(one)
    // stage 2: three waves of the same rows
    val three = Files.createTempDirectory("graft_hll_three").toString
    (0 to 2).foreach { i =>
      docs.filter($"doc_id" % 3 === i).coalesce(1).write.mode("append").parquet(three)
      Thread.sleep(1100)
    }
    val estOne = run(one)
    val estThree = run(three)
    // CRDT max-merge: the final registers are a function of the SET of
    // hashed values, so batching must not change a single estimate
    assert(estOne == estThree,
      s"estimate depends on batching: $estOne vs $estThree")
    // accuracy: within 3 rsd of exact (rsd = 1.04/sqrt(2^11) ~ 2.3%)
    val truth = docs
      .select($"lang", explode(split(trim(lower($"text")), "\\s+")).as("tok"))
      .filter(length($"tok") > 0)
      .groupBy($"lang").agg(countDistinct($"tok").as("n"))
      .as[(String, Long)].collect().toMap
    assert(estOne.keySet == truth.keySet)
    val rsd = 1.04 / math.sqrt(1 << DistinctCountStream.P)
    truth.foreach { case (k, n) =>
      val e = estOne(k)
      info(f"$k: est $e vs exact $n (${(e - n).toDouble / n * 100}%.1f%%)")
      assert(math.abs(e - n) <= 3 * rsd * n + 1,
        s"$k: estimate $e outside 3-rsd bound of exact $n")
    }
  }

  test("NULL values are ignored, matching countDistinct semantics") {
    // the documented contract at streamingDistinct: nulls are filtered
    // before hashing — an unfiltered null would hash to the seed
    // constant and count as one phantom distinct value. 5 distinct
    // non-null tokens + nulls must estimate exactly 5 (linear counting
    // is exact at this cardinality), not 6.
    val srcDir = Files.createTempDirectory("graft_hll_null").toString
    Seq(("k", Option("a")), ("k", Option("b")), ("k", Option("c")),
        ("k", Option("d")), ("k", Option("e")), ("k", None), ("k", None))
      .toDF("lang", "tok").coalesce(1).write.mode("append").parquet(srcDir)
    val src = spark.readStream
      .schema("lang STRING, tok STRING").parquet(srcDir)
    val out = Files.createTempDirectory("graft_hll_null_out").toString
    val ckpt = Files.createTempDirectory("graft_hll_null_ckpt").toString
    val q = streamingDistinct(src, "lang", "tok").writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch((df: org.apache.spark.sql.Dataset[DistinctEmit], id: Long) =>
        EventStreams.idempotentParquetSink(out)(df.toDF(), id))
      .start()
    q.awaitTermination()
    val est = spark.read.parquet(s"$out/batch_id=*")
      .orderBy($"emit_seq".desc).select($"n_distinct_est")
      .as[Long].head()
    assert(est == 5L, s"null leaked into the sketch: estimate $est != 5")
  }

  test("HLL unit: register estimate tracks known cardinalities") {
    // feed n distinct hashed longs directly; estimate must stay in band
    Seq(100, 2000, 50000).foreach { n =>
      val regs = new Array[Byte](1 << DistinctCountStream.P)
      var i = 0L
      while (i < n) {
        // xxhash64-equivalent mixing via the same column fn is overkill
        // here; splitmix64 gives well-distributed deterministic hashes
        var z = i + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        DistinctCountStream.addHash(regs, z ^ (z >>> 31))
        i += 1
      }
      val est = DistinctCountStream.estimate(regs)
      val rsd = 1.04 / math.sqrt(1 << DistinctCountStream.P)
      assert(math.abs(est - n) <= 3 * rsd * n + 1,
        s"n=$n: estimate $est outside 3-rsd band")
    }
  }
}
