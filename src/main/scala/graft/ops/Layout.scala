package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ZOrder2

/** Data-layout utilities for the write side of a 100 TB lake: multi-column
  * clustering (z-order) and small-file compaction. Both are plain
  * repartition+sort plans — no table-format dependency — and pay off at
  * read time through parquet min/max row-group and file pruning.
  */
object Layout {

  /** Write `df` clustered on the z-order curve of two long keys: range-
    * partition by z-value (contiguous z-ranges per output file) and sort
    * within partitions. Every file then carries a tight min/max envelope
    * on BOTH keys, so scans filtering either column prune files — the
    * OPTIMIZE ZORDER effect as a plain sort key.
    *
    * Each key is min-max normalized to `bitsPerKey` bits before the
    * interleave (one cheap global min/max agg — a columnar-stats scan).
    * Without this, keys of unequal range put every split bit on the wider
    * key and the narrow key's envelopes never tighten; normalization is
    * how production ZORDER implementations make the curve fair.
    */
  def writeZOrdered(df: DataFrame, a: Column, b: Column, path: String,
      numFiles: Int, bitsPerKey: Int = 21): Unit =
    zOrderCluster(df, a, b, numFiles, bitsPerKey)
      .write.mode("overwrite").parquet(path)

  /** The clustering transform behind [[writeZOrdered]], reusable by any
    * writer (e.g. [[graft.ingest.SnapshotLake.optimizeZOrder]]): range-
    * partition by z-value and sort within partitions, so each output
    * file carries a tight envelope on BOTH keys. */
  def zOrderCluster(df: DataFrame, a: Column, b: Column,
      numFiles: Int, bitsPerKey: Int = 21): DataFrame =
    zOrderClusterN(df, Seq(a, b), numFiles, bitsPerKey)

  /** N-key clustering on the [[graft.functions.ZOrderN]] curve: each key
    * min-max normalized to `bitsPerKey` bits (one global-stats agg — an
    * unequal-range key would otherwise hog every split bit), then the
    * interleave is the range-partition + sort key. The 2-key path uses
    * [[ZOrder2]]'s custom expression, wider arities the pure builtin
    * composition — bit-identical layouts either way. */
  def zOrderClusterN(df: DataFrame, keys: Seq[Column],
      numFiles: Int, bitsPerKey: Int = 21): DataFrame = {
    require(keys.size >= 2, "z-order clustering needs at least two keys")
    require(keys.size * bitsPerKey <= 63,
      s"${keys.size} keys × $bitsPerKey bits exceeds a long")
    val aggs = keys.zipWithIndex.flatMap { case (k, i) =>
      Seq(min(k).cast("double").as(s"mn_$i"), max(k).cast("double").as(s"mx_$i"))
    }
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    val maxCode = (1L << bitsPerKey) - 1
    def scale(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else least(lit(maxCode),
        ((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(maxCode.toDouble))
          .cast("long"))
    val scaled = keys.zipWithIndex.map { case (k, i) =>
      // null bounds = zero rows (e.g. OPTIMIZE after a full delete) or an
      // all-null key column: no envelope to tighten on that key — degrade
      // to the same constant code the hi<=lo branch uses instead of
      // crashing the compaction on getDouble(null)
      if (bounds.isNullAt(2 * i) || bounds.isNullAt(2 * i + 1)) lit(0L)
      else scale(k, bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
    }
    val z =
      if (keys.size == 2) ZOrder2.zorder(scaled(0), scaled(1), bitsPerKey)
      else graft.functions.ZOrderN.zorder(scaled, bitsPerKey)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Compact a directory of (typically many small) parquet files into
    * `numFiles` outputs sorted by `sortKeys` — the maintenance pass that
    * keeps scan parallelism healthy after streaming/incremental appends.
    */
  def compact(df: DataFrame, path: String, numFiles: Int,
      sortKeys: Seq[Column]): Unit = {
    val part = sortKeys.headOption match {
      case Some(k) => df.repartitionByRange(numFiles, k)
      case None => df.repartition(numFiles)
    }
    part.sortWithinPartitions(sortKeys: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Write parquet with per-column BLOOM FILTERS on `bloomCols` — the
    * point-lookup complement to min/max envelopes. Min/max prunes range
    * scans but is useless for high-cardinality point predicates on
    * unsorted columns (every row group's [min,max] spans the probe);
    * a bloom filter answers "definitely absent" per row group, so
    * `WHERE content_hash = X` skips row groups with no false-negative
    * risk. `ndv` sizes the filter (bits ∝ ndv for the target fpp).
    *
    * The options are plain parquet-hadoop writer properties — the sort
    * order of the data is unconstrained, so this composes with
    * [[writeZOrdered]]/[[compact]] (cluster for ranges, bloom for point
    * probes on the OTHER columns).
    */
  def writeWithBloomFilters(df: DataFrame, path: String,
      bloomCols: Seq[String], ndv: Long = 100000L): Unit =
    writeWithBloomFilters(df, path, bloomCols.map(_ -> ndv))

  /** Per-column ndv overload: mixed-cardinality column sets (a 1e9-ndv
    * content hash next to a 1e3-ndv source id) need per-column sizing —
    * one shared ndv either wastes bits on the small column or inflates
    * the false-positive rate on the big one. */
  def writeWithBloomFilters(df: DataFrame, path: String,
      bloomNdv: Seq[(String, Long)]): Unit = {
    val w = bloomNdv.foldLeft(df.write.mode("overwrite")) {
      case (wr, (c, n)) =>
        wr.option(s"parquet.bloom.filter.enabled#$c", "true")
          .option(s"parquet.bloom.filter.expected.ndv#$c", n.toString)
    }
    w.parquet(path)
  }
}
