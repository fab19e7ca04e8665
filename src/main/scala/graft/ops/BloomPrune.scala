package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the runtime-filter pattern made explicit.
  *
  * Build a driver-side Bloom sketch of the dimension keys (the dim side is
  * small by construction — keys only), broadcast it, and drop non-matching
  * fact rows BEFORE the join shuffle; the exact semi-join afterwards
  * removes the ~fpp false positives, so the result EQUALS the plain
  * semi-join (and carries a DuckDB oracle), while the shuffle moves
  * ~|matching| rows instead of |fact|.
  *
  * At 100 TB this is the difference between shuffling the whole fact table
  * and shuffling the selected slice: a 10M-key dim fits a ~12 MB bloom at
  * 1% fpp — broadcastable when the exact key set (or the dim itself) is
  * not. The membership probe is a UDF because Catalyst's
  * `BloomFilterMightContain` expression is not public API; the probe is a
  * single hash over a long, and the filter runs map-side at scan speed.
  */
object BloomPrune {

  def semiJoin(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      expectedKeys: Long = 100000L, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    // No forced broadcast on the exact pass: AQE picks broadcast when the
    // dim fits, shuffle-hash otherwise — by then the fact side is already
    // bloom-pruned either way.
    // Rename the dim key first: if factKey and dimKey share a name, the
    // post-join condition col(factKey) === col(dimKey) would be ambiguous.
    fact.filter(might(col(factKey)))
      .join(dim.select(col(dimKey).as("__bloom_key")).distinct(),
        col(factKey) === col("__bloom_key"), "left_semi")
  }
}
