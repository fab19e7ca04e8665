package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.{SparkSpecBase, Tables}
import java.nio.file.Files

class StatefulSpec extends SparkSpecBase {
  import spark.implicits._
  import StatefulOps._

  test("flatMapGroupsWithState tracks per-user counts/sessions across batches") {
    val dir = Files.createTempDirectory("graft_stateful").toString
    val e = Tables.events(spark, sf0001)
      .select($"user_id", $"ts", $"event_type", $"value")
    // two files → with maxFilesPerTrigger=1, two micro-batches
    e.filter($"user_id" < 8).coalesce(1).write.mode("append").parquet(dir)
    e.filter($"user_id" >= 8).coalesce(1).write.mode("append").parquet(dir)

    val src = spark.readStream
      .schema(e.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withWatermark("ts", "20 minutes")
      .as[UserEvent]
    val out = Files.createTempDirectory("graft_stateful_out").toString
    val ckpt = Files.createTempDirectory("graft_stateful_ckpt").toString
    val q = trackUsers(src).writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch((df: org.apache.spark.sql.Dataset[UserSnapshot], id: Long) =>
        EventStreams.idempotentParquetSink(out)(df.toDF(), id))
      .start()
    q.awaitTermination()

    val snaps = spark.read.parquet(s"$out/batch_id=*")
    // last (non-closed is fine) snapshot per user must match batch truth
    val lastSnap = snaps.groupBy($"user_id")
      .agg(max(struct($"n_events", $"total_value", $"n_sessions")).as("s"))
      .select($"user_id", $"s.n_events", $"s.n_sessions")
      .as[(Long, Long, Long)].collect()
      .map { case (u, n, ns) => u -> ((n, ns)) }.toMap
    val truth = Tables.events(spark, sf0001)
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    truth.foreach { case (u, n) =>
      assert(lastSnap(u)._1 == n, s"user $u events: got ${lastSnap(u)._1}, want $n")
      assert(lastSnap(u)._2 >= 1)
    }
  }

  test("transformWithState variant matches batch truth (RocksDB provider)") {
    val dir = Files.createTempDirectory("graft_tws").toString
    val e = Tables.events(spark, sf0001)
      .select($"user_id", $"ts", $"event_type", $"value")
    e.filter($"user_id" < 8).coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1100)
    e.filter($"user_id" >= 8).coalesce(1).write.mode("append").parquet(dir)

    // transformWithState requires the RocksDB state store provider
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = spark.readStream
        .schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
        .withWatermark("ts", "20 minutes")
        .as[UserEvent]
      val out = Files.createTempDirectory("graft_tws_out").toString
      val ckpt = Files.createTempDirectory("graft_tws_ckpt").toString
      val q = trackUsersTws(src).writeStream
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch((df: org.apache.spark.sql.Dataset[UserSnapshot], id: Long) =>
          EventStreams.idempotentParquetSink(out)(df.toDF(), id))
        .start()
      q.awaitTermination()

      val snaps = spark.read.parquet(s"$out/batch_id=*")
      val lastSnap = snaps.groupBy($"user_id")
        .agg(max(struct($"n_events", $"total_value", $"n_sessions")).as("s"))
        .select($"user_id", $"s.n_events", $"s.n_sessions")
        .as[(Long, Long, Long)].collect()
        .map { case (u, n, ns) => u -> ((n, ns)) }.toMap
      val truth = Tables.events(spark, sf0001)
        .groupBy($"user_id").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
      truth.foreach { case (u, n) =>
        assert(lastSnap(u)._1 == n, s"user $u events: got ${lastSnap(u)._1}, want $n")
        assert(lastSnap(u)._2 >= 1)
      }
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("late data beyond the watermark is dropped from windowed aggregation") {
    val dir = Files.createTempDirectory("graft_late").toString
    // One file per micro-batch (maxFilesPerTrigger=1, increasing mtimes):
    // b0 on-time 10:0x events; b1 12:00 sentinel; b2 12:30 sentinel —
    // after b2 the late-admission threshold has passed 10:10 (admission
    // lags the reported watermark by one batch — measured: a late row
    // arriving in the batch where the watermark first passes its window
    // is still admitted); b3 late 10:05 event → dropped, the finalized
    // 10:00 window keeps only the two on-time events.
    val mk = (id: Long, t: String, v: Double) =>
      (id, java.sql.Timestamp.valueOf(t), 1L, "click", v, "{}")
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    Seq(mk(1, "2024-01-01 10:00:30", 1.0), mk(2, "2024-01-01 10:05:00", 2.0))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1100) // strictly increasing file mod times → batch order
    Seq(mk(3, "2024-01-01 12:00:00", 4.0))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1100)
    Seq(mk(5, "2024-01-01 12:30:00", 8.0))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1100)
    Seq(mk(4, "2024-01-01 10:05:10", 100.0))
      .toDF(cols: _*).coalesce(1).write.mode("append").parquet(dir)

    val src = spark.readStream.schema(EventStreams.EventSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val out = Files.createTempDirectory("graft_late_out").toString
    val ckpt = Files.createTempDirectory("graft_late_ckpt").toString
    val q = EventStreams.tumblingAgg(src).writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch(EventStreams.idempotentParquetSink(out) _)
      .start()
    q.awaitTermination()

    val res = spark.read.parquet(s"$out/batch_id=*")
      .select($"window_start".cast("string"), $"n", $"total_value")
      .as[(String, Long, Double)].collect()
      .map { case (w, n, v) => w -> ((n, v)) }.toMap
    // the 10:00 window closed with ONLY the two on-time events — the late
    // 100.0-value event must not appear
    val w10 = res("2024-01-01 10:00:00")
    assert(w10 == (2L, 3.0), s"late event leaked into closed window: $w10")
  }

  test("streaming heavy hitters: exact at full capacity, bounded error when capped") {
    import HeavyHitterStream._
    val docs = Tables.documents(spark, sf0001).select($"doc_id", $"text")
    val dir = Files.createTempDirectory("graft_hh").toString
    docs.filter($"doc_id" % 2 === 0).coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(1100)
    docs.filter($"doc_id" % 2 === 1).coalesce(1).write.mode("append").parquet(dir)

    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val nShards = 8
      def run(capacity: Int): Map[String, (Long, Long)] = {
        val src = spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1").parquet(dir)
        val out = Files.createTempDirectory("graft_hh_out").toString
        val ckpt = Files.createTempDirectory("graft_hh_ckpt").toString
        val q = streamingHeavyHitters(src, nShards, capacity).writeStream
          .outputMode("update")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .foreachBatch((df: org.apache.spark.sql.Dataset[HitterEmit], id: Long) =>
            EventStreams.idempotentParquetSink(out)(df.toDF(), id))
          .start()
        q.awaitTermination()
        // current summary = max-emit_seq emission per shard
        val emits = spark.read.parquet(s"$out/batch_id=*")
        val last = emits.groupBy($"shard").agg(max($"emit_seq").as("emit_seq"))
        emits.join(last, Seq("shard", "emit_seq"))
          .select($"token", $"count_est", $"overcount")
          .as[(String, Long, Long)].collect()
          .map { case (t, c, o) => t -> ((c, o)) }.toMap
      }

      val truth = docs
        .select(explode(split(trim(lower($"text")), "\\s+")).as("token"))
        .filter(length($"token") > 0)
        .groupBy($"token").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      val totalTokens = truth.values.sum

      // capacity >= any shard's vocabulary → SpaceSaving degenerates to
      // exact counting: summary == full vocabulary histogram
      val exact = run(capacity = truth.size + 1)
      assert(exact.keySet == truth.keySet)
      exact.foreach { case (t, (c, o)) =>
        assert(c == truth(t), s"token '$t': est $c != true ${truth(t)}")
        assert(o == 0L)
      }

      // capped summaries keep the invariants: est overestimates by at most
      // overcount, overcount <= shard stream length / capacity, and state
      // is bounded at nShards*capacity entries
      val capacity = 64
      val capped = run(capacity)
      assert(capped.size <= nShards * capacity)
      capped.foreach { case (t, (c, o)) =>
        val tc = truth.getOrElse(t, 0L)
        assert(c >= tc, s"token '$t': est $c below true $tc")
        assert(c - o <= tc, s"token '$t': guaranteed floor ${c - o} above true $tc")
        assert(o <= totalTokens / capacity,
          s"token '$t': overcount $o above bound ${totalTokens / capacity}")
      }
      // every token heavier than the per-shard error bound must be tracked
      truth.filter(_._2 > totalTokens / capacity).keys.foreach { t =>
        assert(capped.contains(t), s"heavy token '$t' missing from capped summary")
      }
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("poly_fingerprint is callable from SQL after extension registration") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("SELECT poly_fingerprint('abc') AS fp").as[Long].collect()
    assert(r.head == 96354L)
  }

  test("every custom expression is callable from SQL with literal params") {
    graft.GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos,
        |  zorder2(3L, 1L) AS z,
        |  word_shingles(array('a','b','c'), 2) AS sh,
        |  minhash_sig(array('x'), 4) AS sig,
        |  simhash64(array('x','y')) AS sim,
        |  hyperplane_sketch(array_repeat(0.5d, 64), 10, 64) AS sk
        |""".stripMargin).collect().head
    assert(row.getAs[Double]("cos") == 1.0)
    assert(row.getAs[Long]("z") == 7L) // interleave(0b11, 0b01) = 0b0111
    assert(row.getAs[collection.Seq[String]]("sh").toSeq == Seq("a b", "b c"))
    assert(row.getAs[collection.Seq[Long]]("sig").length == 4)
    assert(row.getAs[Long]("sk") >= 0L && row.getAs[Long]("sk") < (1L << 10))
  }
}
