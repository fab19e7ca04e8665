package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming vocabulary heavy hitters — the unbounded-stream analog of
  * `Corpus.heavyHitters` (reference analog: the crawl's per-source progress
  * counters generalized to a frequency summary).
  *
  * An unbounded token stream cannot keep one state entry per distinct token
  * (vocabulary grows without bound at 100 TB), so each shard keeps a
  * SpaceSaving summary (Metwally et al., "Efficient Computation of Frequent
  * and Top-k Elements in Data Streams", ICDT 2005) of fixed `capacity`:
  *
  *   - tracked token hit        → est += w
  *   - untracked, summary full  → evict the min-est entry; the newcomer
  *                                inherits `min+w` with `overcount = min`
  *
  * Invariants (per shard, N = tokens seen by the shard):
  *   - `est` is an overestimate: true ≤ est ≤ true + overcount
  *   - `overcount ≤ N / capacity`
  *   - every token with true count > N / capacity is tracked
  *
  * Tokens are hash-sharded (`pmod(xxhash64(token), nShards)`), so shard
  * summaries hold DISJOINT token sets and the global summary is their plain
  * union — no cross-shard merge math, and state is `nShards × capacity`
  * entries total regardless of stream length. Shard count scales the
  * stateful parallelism exactly like `spark.sql.shuffle.partitions` scales
  * an aggregation.
  *
  * Emission: OutputMode.Update with a per-shard `emit_seq` — readers take
  * the max-seq emission per shard as the current summary (StatefulSpec does
  * exactly that and checks the invariants plus exact parity at
  * capacity ≥ shard vocabulary).
  */
object HeavyHitterStream {

  case class ShardedToken(shard: Int, token: String)
  case class CountPair(est: Long, over: Long)
  case class HitterEmit(shard: Int, emit_seq: Long, token: String,
      count_est: Long, overcount: Long)

  class SpaceSavingProcessor(capacity: Int)
      extends StatefulProcessor[Int, ShardedToken, HitterEmit] {
    // fail at construction, not as a NoSuchElementException("empty
    // TreeSet") inside an executor task on the first token: with
    // capacity <= 0 the summary-full eviction branch fires immediately
    // on an empty byEst index (r13 review)
    require(capacity > 0,
      s"SpaceSavingProcessor: capacity $capacity must be positive — " +
        "the summary holds the top `capacity` token counters per shard")
    @transient private var counters: MapState[String, CountPair] = _
    @transient private var emitSeq: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[String, CountPair]("spacesaving",
        Encoders.STRING, Encoders.product[CountPair], TTLConfig.NONE)
      emitSeq = getHandle.getValueState[Long]("emitSeq",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(shard: Int, rows: Iterator[ShardedToken],
        tv: TimerValues): Iterator[HitterEmit] = {
      // batch-local pre-count: one summary update per distinct token
      val local = collection.mutable.HashMap.empty[String, Long]
      rows.foreach(r => local.update(r.token, local.getOrElse(r.token, 0L) + 1L))
      // the summary is ≤ capacity entries — load, mutate in memory, rewrite
      val summary = collection.mutable.HashMap.empty[String, CountPair]
      // (est, token)-ordered index alongside the map: eviction pops the
      // head in O(log capacity) instead of an O(capacity) minBy scan —
      // a batch full of fresh tokens is O(distinct · log capacity), not
      // O(distinct · capacity)
      val byEst = collection.mutable.TreeSet.empty[(Long, String)]
      counters.iterator().foreach { case (t, cp) =>
        summary.update(t, cp); byEst.add((cp.est, t))
      }
      // token-sorted replay so eviction order (and thus the summary) is
      // deterministic across retries and partition counts
      local.toSeq.sortBy(_._1).foreach { case (tok, w) =>
        summary.get(tok) match {
          case Some(cp) =>
            byEst.remove((cp.est, tok))
            summary.update(tok, CountPair(cp.est + w, cp.over))
            byEst.add((cp.est + w, tok))
          case None if summary.size < capacity =>
            summary.update(tok, CountPair(w, 0L))
            byEst.add((w, tok))
          case None =>
            val (mEst, mTok) = byEst.head
            byEst.remove((mEst, mTok))
            summary.remove(mTok)
            summary.update(tok, CountPair(mEst + w, mEst))
            byEst.add((mEst + w, tok))
        }
      }
      counters.clear()
      summary.foreach { case (t, cp) => counters.updateValue(t, cp) }
      val s = (if (emitSeq.exists()) emitSeq.get() else 0L) + 1L
      emitSeq.update(s)
      summary.toIndexedSeq.sortBy(_._1).iterator.map { case (t, cp) =>
        HitterEmit(shard, s, t, cp.est, cp.over)
      }
    }
  }

  /** Tokenize a streaming `documents` frame and maintain per-shard
    * SpaceSaving summaries. `capacity` bounds state per shard; accuracy is
    * ±(shard token count)/capacity.
    *
    * REQUIRES the RocksDB state store provider: `transformWithState` is
    * rejected at runtime by the default HDFS-backed provider — set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
    * on the session running the query (as StatefulSpec and
    * RocksDBStatefulSpec do). */
  def streamingHeavyHitters(docs: DataFrame, nShards: Int,
      capacity: Int): Dataset[HitterEmit] = {
    import docs.sparkSession.implicits._
    docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .select(pmod(xxhash64(col("token")), lit(nShards)).cast("int").as("shard"),
        col("token"))
      .as[ShardedToken]
      .groupByKey(_.shard)
      .transformWithState(new SpaceSavingProcessor(capacity),
        TimeMode.None(), OutputMode.Update())
  }
}
