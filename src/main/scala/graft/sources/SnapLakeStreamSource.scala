package graft.sources

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

import graft.ingest.SnapshotLake

/** [[SnapshotLake]]'s commit log tailed as a Structured Streaming source
  * (`spark.readStream.format("snaplake").load(root)`): offsets are commit
  * VERSIONS, and the micro-batch for (start, end] is the parquet data of
  * the generation directories end's manifest lists that start's does not.
  *
  * Because append commits reference the previous manifest plus one new
  * generation, the delta of consecutive versions is exactly the appended
  * data — the lake's history IS the changelog, with no extra bookkeeping
  * (the same observation Delta's streaming source is built on). The
  * version arithmetic makes replay exact: a restarted query re-derives
  * batch (start, end] from the immutable manifests, so a checkpointed
  * offset always reproduces the same rows.
  *
  * OVERWRITE commits are not row-level deletes and a stream cannot
  * unsay emitted rows: an overwrite's freshly-introduced directories are
  * emitted like any append (the rewritten table content arrives as one
  * batch) and directories it dropped simply stop contributing — the
  * ignore-changes contract downstream consumers of table-format streams
  * already live with. Streams needing clean restatement semantics should
  * read upsert keys and apply them stateful-side (`t_cdc_upsert`).
  *
  * The stream schema is fixed when the source is created (standard
  * streaming contract); later appends with evolved schemas project onto
  * it — new columns are ignored, missing ones read as null, exactly how
  * a long-running reader of an evolving table must behave.
  */
class SnapLakeStreamSource(spark: SparkSession, root: String,
    override val schema: StructType, startingVersion: Option[Long])
    extends Source {

  private val lake = new SnapshotLake(root)

  /** Offset value = last version already emitted; versions at or below
    * the base are history the stream starts after. `startingVersion` is
    * the first version to INCLUDE (Delta's option of the same name);
    * default 1 — the whole table, so a fresh stream first replays the
    * current snapshot and then follows new commits. */
  private val baseVersion: Long = startingVersion.map(_ - 1).getOrElse(0L)

  private def ver(o: Offset): Long = o.json.trim.toLong

  override def getOffset: Option[Offset] =
    lake.latestVersion(spark).filter(_ > baseVersion).map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val startV = start.map(ver).getOrElse(baseVersion)
    val known: Set[String] =
      if (startV <= 0) Set.empty else lake.dirsAt(spark, startV).toSet
    val dirs = lake.dirsAt(spark, ver(end)).filterNot(known)
    if (dirs.isEmpty) {
      // a no-op commit (e.g. a lost-race rebase) adds no directories
      GraftBridge.ofRows(spark,
        LocalRelation(DataTypeUtils.toAttributes(schema), Nil, isStreaming = true))
    } else {
      // the delegated parquet relation again, pinned to the stream schema
      // so evolved appends project instead of widening mid-stream
      val rel = org.apache.spark.sql.execution.datasources.DataSource(
        spark,
        className = "parquet",
        paths = dirs.map(d => s"$root/$d"),
        userSpecifiedSchema = Some(schema)).resolveRelation(checkFilesExist = false)
      GraftBridge.ofRows(spark, LogicalRelation(rel, isStreaming = true))
    }
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"SnapLakeStreamSource[$root]"
}
