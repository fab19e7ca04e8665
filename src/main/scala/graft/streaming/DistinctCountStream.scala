package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming per-key DISTINCT counting with bounded state — the
  * cardinality companion to [[HeavyHitterStream]]'s SpaceSaving summary
  * (that answers "which values are frequent"; this answers "how many
  * distinct values"), for the stream stats an ingest pipeline tracks
  * per source/language/shard forever: exact distinct state grows with
  * the vocabulary, a HyperLogLog register file is a fixed 2^p bytes per
  * key for a ~1.04/√2^p relative error (Flajolet et al., AofA 2007).
  *
  * Register updates are max-merges, so the sketch is a CRDT: the final
  * state is independent of how rows are batched or ordered — the spec
  * asserts bit-identical estimates across different wave splits, the
  * property that makes replay/backfill safe. Hashing is xxhash64 with a
  * fixed seed: the estimate is DETERMINISTIC for a given input set
  * (reproducible across runs and engines), just approximate.
  *
  * REQUIRES the RocksDB state store provider (`transformWithState`), as
  * [[HeavyHitterStream]] does.
  */
object DistinctCountStream {

  case class DistinctEmit(key: String, emit_seq: Long, n_distinct_est: Long)

  /** log2(registers). p=11 → 2 KiB/key state, rsd ≈ 2.3%. */
  val P = 11
  private val M = 1 << P

  /** Standard HLL estimate from a register file, with the small-range
    * linear-counting correction (the only regime the 64-bit hash ever
    * needs below astronomic cardinalities). */
  def estimate(regs: Array[Byte]): Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += 1.0 / (1L << (regs(i) & 0xff)).toDouble
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    val raw = alpha * M * M / sum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.round(est)
  }

  /** Fold one hashed value into the register file (max-merge). */
  def addHash(regs: Array[Byte], h: Long): Unit = {
    val idx = (h & (M - 1)).toInt
    // rank = leading-zero run of the remaining bits + 1; the index bits
    // are consumed, so rank uses the top 64-P bits
    // rest has >= P leading zeros by construction, so zeros WITHIN the
    // (64-P)-bit window = nlz64(rest) - P; rank is that + 1 (max 64-P+1
    // when rest == 0)
    val rest = h >>> P
    val rank = (java.lang.Long.numberOfLeadingZeros(rest) - P + 1).toByte
    if ((regs(idx) & 0xff) < rank) regs(idx) = rank
  }

  class HllProcessor
      extends StatefulProcessor[String, (String, Long), DistinctEmit] {
    @transient private var regs: ValueState[Array[Byte]] = _
    @transient private var emitSeq: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      regs = getHandle.getValueState[Array[Byte]]("hll",
        Encoders.BINARY, TTLConfig.NONE)
      emitSeq = getHandle.getValueState[Long]("emitSeq",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[(String, Long)],
        tv: TimerValues): Iterator[DistinctEmit] = {
      val r = if (regs.exists()) regs.get() else new Array[Byte](M)
      rows.foreach { case (_, h) => addHash(r, h) }
      regs.update(r)
      val s = (if (emitSeq.exists()) emitSeq.get() else 0L) + 1L
      emitSeq.update(s)
      Iterator.single(DistinctEmit(key, s, estimate(r)))
    }
  }

  /** Maintain a per-key HLL over `valueCol` of a streaming frame and
    * emit the running distinct estimate each micro-batch. NULL values
    * are filtered before hashing — xxhash64 skips null children, so an
    * unfiltered null would hash to the seed constant and count as one
    * phantom distinct value, diverging from the countDistinct
    * semantics (which ignores nulls) that the estimate is compared
    * against. */
  def streamingDistinct(df: DataFrame, keyCol: String,
      valueCol: String): Dataset[DistinctEmit] = {
    import df.sparkSession.implicits._
    df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("key"), xxhash64(col(valueCol)).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new HllProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
