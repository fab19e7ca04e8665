package graft.streaming

import org.apache.spark.sql.SparkSession

/** The CURRENT-pointer generation chassis shared by every
  * read-merge-swap sink in this package ([[DocStreams]],
  * [[NearDedupStreams]], [[EventStreams.upsertSnapshotSink]]) — one
  * copy, because the atomic-swap subtleties (tmp-write + rename
  * semantics, the S3A non-atomicity caveat) must be fixed in one place,
  * not kept in sync across three (r13 review: the chassis had drifted
  * into three byte-identical inline copies).
  *
  * A ledger dir holds generation subdirs plus a CURRENT file naming the
  * live one. Readers resolve CURRENT once and scan that generation;
  * writers publish a new generation by [[swapPtr]] — write CURRENT.tmp,
  * then the shared [[graft.ingest.AtomicOverwrite]] rename onto CURRENT
  * (FileContext on HDFS, POSIX ATOMIC_MOVE on local roots — the bare
  * FileContext call is delete+rename locally and can crash into a
  * missing pointer). The rename is the atomicity point:
  * all-or-nothing on HDFS/POSIX. Object stores like
  * S3A do NOT guarantee it — a crash mid-swap there can leave a missing
  * or partial pointer; on such stores, front the pointer with a
  * consistent metadata layer (e.g. [[graft.ingest.SnapshotLake]]'s
  * commit log on a rename-atomic store) rather than pointing a sink at
  * the bucket directly. NearDedupSpec pins the observable half: the
  * pointer flips whole and no tmp residue survives a swap.
  */
object GenPointer {

  /** The current generation name, if a CURRENT pointer exists. */
  private[streaming] def readPtr(fs: org.apache.hadoop.fs.FileSystem,
      ledgerDir: String): Option[String] = {
    val ptr = new org.apache.hadoop.fs.Path(s"$ledgerDir/CURRENT")
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  /** Publish `gen` as the current generation (see class doc for the
    * atomicity contract). The swap routes through
    * [[graft.ingest.AtomicOverwrite]] (r14): the bare
    * FileContext.rename(OVERWRITE) this used before is delete+rename on
    * the LOCAL filesystem — a crash between the two left NO pointer,
    * and the next micro-batch would silently re-create generation 0,
    * forgetting every admitted document (the exact failure the class
    * doc's "all-or-nothing on HDFS/POSIX" claim promised away). */
  private[streaming] def swapPtr(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, ledgerDir: String,
      gen: String): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = new Path(s"$ledgerDir/CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write(gen.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    graft.ingest.AtomicOverwrite.rename(
      spark.sparkContext.hadoopConfiguration, fs, tmp,
      new Path(s"$ledgerDir/CURRENT"))
  }
}
