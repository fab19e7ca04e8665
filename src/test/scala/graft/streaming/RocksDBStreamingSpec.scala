package graft.streaming

import graft.SparkSpecBase

/** The ENTIRE streaming surface re-run under the RocksDB state store
  * provider — windowed aggregations, session windows, watermark dedup,
  * stream-stream inner/left/full joins, and the ledger/upsert sinks all
  * carry their state through RocksDB instead of the default HDFS-backed
  * heap map. At 100 TB the state (dedup ledgers, join buffers, window
  * state) must live off-heap, so every stateful operator has to survive
  * the provider swap, not just the transformWithState ones that require
  * it. Zero test duplication: same assertions, different store.
  */
class RocksDBStreamingSpec extends StreamingSpec {
  override protected def stateStoreProvider: Option[String] =
    Some(SparkSpecBase.RocksDBProvider)
}

/** StatefulSpec (flatMapGroupsWithState, transformWithState, late-data
  * drop, streaming heavy hitters) under RocksDB end to end — including
  * the operators that DON'T require RocksDB, proving they run identically
  * on both providers. */
class RocksDBStatefulSpec extends StatefulSpec {
  override protected def stateStoreProvider: Option[String] =
    Some(SparkSpecBase.RocksDBProvider)
}
