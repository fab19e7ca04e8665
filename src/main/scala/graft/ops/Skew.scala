package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE handles skewed sort-merge JOINs
  * automatically; these cover the cases it doesn't — hot-key
  * aggregations — via the classic two-phase salted aggregate.
  */
object Skew {

  /** Two-phase salted count/sum aggregate: partial-aggregate on
    * (key, salt) spreads a hot key over `saltBuckets` reducers, then the
    * final aggregate combines the partials. Semantically identical to a
    * direct groupBy (ScalaTest-verified); worth the extra exchange only
    * when single keys dominate partitions.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      saltBuckets: Int): DataFrame = {
    // Salt from ROW CONTENT (like saltedEnrichJoin), never from
    // monotonically_increasing_id(): mid ids are assigned per-partition
    // at execution time, so a task retry or an AQE re-coalesce re-salts
    // the same rows differently — the partial aggregate would no longer
    // replay to the same partitions, defeating deterministic re-execution
    // (speculative tasks, stage retries) and making plans
    // non-reproducible. A content hash is stable across retries; rows
    // with identical (k, v) share a salt cell, which skews the spread
    // only when a hot key's VALUES are near-constant — and a
    // constant-value hot key is exactly the case where the partial
    // aggregate collapses to one row per cell anyway.
    val salted = df.select(key.as("k"), value.as("v"),
      pmod(xxhash64(key, value), lit(saltBuckets.toLong)).as("salt"))
    salted
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_n")).as("n"))
  }

  /** Salted FACT-to-DIMENSION equi-join — the skew escape hatch for
    * joins where the fact side has unbounded rows per key (a hot hub's
    * edges, a boilerplate domain's documents) but the dimension side has
    * EXACTLY ONE row per key (a label table, a per-key aggregate). A
    * plain equi-join lands every fact row for the hot key on one
    * reducer; here each fact row gets a deterministic salt from
    * `saltSource` (any column that varies across the hot key's rows),
    * the one-row-per-key dimension is replicated g ways, and the join
    * key becomes (key, salt) — the hot key's rows spread over g
    * reducers at the cost of a g× shuffle of the (small) dimension.
    * Parity with the direct join is exact because each fact row matches
    * exactly one of the g dimension replicas (ScaleSpec).
    *
    * Caller contract: `dim` must be unique per `key` (else rows
    * duplicate g-fold) and share the key column name with `fact`.
    */
  def saltedEnrichJoin(fact: DataFrame, key: String, saltSource: Column,
      dim: DataFrame, g: Int): DataFrame = {
    require(g >= 1, s"salt buckets must be >= 1, got $g")
    val fs = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(g.toLong)).cast("int"))
    val ds = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(g - 1))))
    fs.join(ds, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted self-join PAIR GENERATION — the skew escape hatch for
    * LSH-band / deletion-signature candidate joins ([[graft.ml.Dedup
    * .lshCandidates]], [[graft.ml.Fuzzy.fuzzyPairs]]). A bucket with k
    * members emits C(k,2) candidate pairs, and in a plain self-equi-join
    * on the bucket key ONE reducer does all of that work — the remaining
    * 100x-scale risk after df-caps and distinct-string reductions, since
    * a single pathological bucket (boilerplate shingle band, hot
    * signature) makes one task quadratic while its peers idle.
    *
    * The g²-cell decomposition: each member gets a deterministic salt
    * `s(id) = xxhash64(id) mod g`; the left side keeps its own salt as
    * the FIRST coordinate and replicates across all g values of the
    * second, the right side mirrors this, and the join key becomes
    * (bucket, s1, s2). The unordered pair {x, y} matches in exactly the
    * cell (s(x), s(y)) for orientation (x, y) and (s(y), s(x)) for
    * (y, x); the `id_a < id_b` filter keeps exactly one orientation, so
    * output parity with the direct join is exact (ScaleSpec). Shuffle
    * volume grows g× per side, but the hot bucket's C(k,2) pairs spread
    * over g² independent reducers — g=32 turns one 8-hour straggler
    * into a thousand 30-second tasks at the cost of one extra
    * replication pass. AQE's skew-join splitting attacks the same
    * problem reactively; this is the deterministic, planner-independent
    * form for the candidate joins where the blowup is OUTPUT-side
    * (post-join pair explosion), which byte-size-based AQE splitting
    * systematically underestimates.
    *
    * Output: (keyCol, id_a, id_b), id_a < id_b, one row per unordered
    * member pair per bucket key. */
  def saltedSelfJoinPairs(df: DataFrame, keyCol: String, idCol: String,
      g: Int): DataFrame = {
    require(g >= 1, s"salt buckets must be >= 1, got $g")
    val base = df.select(col(keyCol).as("k"), col(idCol).as("id"),
      pmod(xxhash64(col(idCol)), lit(g.toLong)).cast("int").as("s"))
    val allSalts = sequence(lit(0), lit(g - 1))
    val left = base
      .withColumn("s2", explode(allSalts))
      .select(col("k"), col("id").as("id_a"), col("s").as("s1"), col("s2"))
    val right = base
      .withColumn("s1", explode(allSalts))
      .select(col("k"), col("id").as("id_b"), col("s1"), col("s").as("s2"))
    left.join(right, Seq("k", "s1", "s2"))
      .filter(col("id_a") < col("id_b"))
      .select(col("k").as(keyCol), col("id_a"), col("id_b"))
  }
}
