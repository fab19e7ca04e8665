package graft.ingest

import org.apache.spark.sql.SaveMode
import graft.SparkSpecBase
import java.nio.file.Files

/** [[graft.sources.SnapLakeStreamSource]]: the commit log as a
  * Structured Streaming changelog — initial-snapshot replay, appends
  * arriving as deltas, checkpoint restart resuming at the recorded
  * version, startingVersion skipping history, and no-op commits
  * producing empty batches.
  */
class SnapLakeStreamSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snapstream").toString

  private def commit(root: String, mode: SaveMode, rows: (Long, String)*): Unit =
    rows.toDF("id", "v").write.format("snaplake").mode(mode).save(root)

  test("appends arrive as deltas; checkpoint restart resumes, not replays") {
    val root = freshRoot()
    val ckpt = Files.createTempDirectory("graft_snapstream_ckpt").toString
    // parquet sink: the memory sink refuses checkpoint RECOVERY, and the
    // restart leg below is the point of this test
    val out = Files.createTempDirectory("graft_snapstream_out").toString
    commit(root, SaveMode.Overwrite, (1L, "a"), (2L, "b"))
    val stream = spark.readStream.format("snaplake").load(root)
    assert(stream.isStreaming)
    def emitted(): Set[(Long, String)] =
      spark.read.parquet(out).as[(Long, String)].collect().toSet
    val q = stream.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // a fresh stream first replays the current snapshot...
      assert(emitted() == Set((1L, "a"), (2L, "b")))
      // ...then follows new commits with ONLY their delta
      commit(root, SaveMode.Append, (3L, "c"))
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 3,
        "append delta re-emitted or lost rows")
    } finally q.stop()
    // a commit landing while the stream is down is picked up on restart
    // from the checkpointed version — nothing before it is replayed
    commit(root, SaveMode.Append, (4L, "d"))
    val q2 = spark.readStream.format("snaplake").load(root)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try {
      q2.processAllAvailable()
      assert(emitted() == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")) &&
        spark.read.parquet(out).count() == 4,
        "restart did not resume at the checkpointed version")
    } finally q2.stop()
  }

  test("startingVersion skips history; no-op commits yield empty batches") {
    val root = freshRoot()
    commit(root, SaveMode.Overwrite, (1L, "a"))
    commit(root, SaveMode.Append, (2L, "b"))
    val q = spark.readStream.format("snaplake")
      .option("startingVersion", "2").load(root)
      .writeStream.format("memory").queryName("snapstream_c").start()
    try {
      q.processAllAvailable()
      assert(spark.table("snapstream_c").as[(Long, String)].collect().toSet ==
        Set((2L, "b")), "startingVersion did not skip version 1")
      // a manifest-only commit (a lost-race rebase republishing the same
      // directories) must advance the offset with an EMPTY batch
      val lake = new SnapshotLake(root)
      val dirs = lake.dirsAt(spark, 2L)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(new org.apache.hadoop.fs.Path(
        s"$root/_commits/v00000003.json"), false)
      try out.write(
        s"""{"version":3,"dirs":[${dirs.map("\"" + _ + "\"").mkString(",")}]}"""
          .getBytes("UTF-8"))
      finally out.close()
      q.processAllAvailable()
      assert(spark.table("snapstream_c").count() == 1,
        "no-op commit emitted rows")
      // and the stream keeps going afterwards
      commit(root, SaveMode.Append, (3L, "c"))
      q.processAllAvailable()
      assert(spark.table("snapstream_c").count() == 2)
    } finally q.stop()
  }

  test("a generation appended then overwritten away inside one batch window still emits") {
    val root = freshRoot()
    // v1 append {a}, v2 append {b}, v3 overwrite {c} — ALL before the
    // stream's first batch, so the batch window spans (0, 3]. An
    // endpoint-manifest diff would emit only v3's content and silently
    // drop b (committed rows whose delivery would depend on trigger
    // cadence); the per-version walk must emit every version's delta.
    commit(root, SaveMode.Overwrite, (1L, "a"))
    commit(root, SaveMode.Append, (2L, "b"))
    commit(root, SaveMode.Overwrite, (9L, "c"))
    val q = spark.readStream.format("snaplake").load(root)
      .writeStream.format("memory").queryName("snapstream_e").start()
    try {
      q.processAllAvailable()
      assert(spark.table("snapstream_e").as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b"), (9L, "c")),
        "intra-window append was dropped by the batch delta")
    } finally q.stop()
  }

  test("a restore never re-emits a generation this stream already delivered") {
    val root = freshRoot()
    // v1 gen A, delivered in batch (0,1]; v2 overwrites to gen B,
    // delivered in batch (1,2]; v3 RESTOREs to v1, re-referencing A.
    // Each commit lands in its OWN trigger window — the cross-batch
    // case where the per-batch seen-set (seeded only from the start
    // offset's manifest) cannot know A went out two batches ago. The
    // restore history check must skip it: emitted rows are never
    // re-sent, regardless of trigger cadence.
    commit(root, SaveMode.Overwrite, (1L, "a"))
    val q = spark.readStream.format("snaplake").load(root)
      .writeStream.format("memory").queryName("snapstream_restore").start()
    try {
      q.processAllAvailable()
      commit(root, SaveMode.Overwrite, (9L, "z"))
      q.processAllAvailable()
      assert(spark.table("snapstream_restore").count() == 2)
      new SnapshotLake(root).restore(spark, 1L)
      q.processAllAvailable()
      assert(spark.table("snapstream_restore").as[(Long, String)]
        .collect().toSet == Set((1L, "a"), (9L, "z")),
        "restore re-emitted a generation already delivered in an " +
          "earlier batch (duplicate rows)")
    } finally q.stop()
  }

  test("a restore re-referencing history the stream never saw emits it") {
    val root = freshRoot()
    // v1 gen A, v2 overwrites to gen B, v3 restores to v1. A stream
    // with startingVersion=3 never delivered A (its base is v2's
    // snapshot), so the restore's re-reference IS new data for this
    // stream and must be emitted — the history check distinguishes
    // "delivered before" from "predates my start but never delivered".
    commit(root, SaveMode.Overwrite, (1L, "a"))
    commit(root, SaveMode.Overwrite, (9L, "z"))
    new SnapshotLake(root).restore(spark, 1L)
    val q = spark.readStream.format("snaplake")
      .option("startingVersion", "3").load(root)
      .writeStream.format("memory").queryName("snapstream_restore2").start()
    try {
      q.processAllAvailable()
      assert(spark.table("snapstream_restore2").as[(Long, String)]
        .collect().toSet == Set((1L, "a")),
        "restore of never-delivered history was wrongly skipped (or " +
          "base-version content leaked)")
    } finally q.stop()
  }

  test("overwrite commits emit the rewritten content (ignore-changes)") {
    val root = freshRoot()
    commit(root, SaveMode.Overwrite, (1L, "a"), (2L, "b"))
    val q = spark.readStream.format("snaplake").load(root)
      .writeStream.format("memory").queryName("snapstream_d").start()
    try {
      q.processAllAvailable()
      assert(spark.table("snapstream_d").count() == 2)
      // an overwrite introduces one new generation; its full content
      // arrives as a batch — emitted rows are never retracted
      commit(root, SaveMode.Overwrite, (9L, "z"))
      q.processAllAvailable()
      assert(spark.table("snapstream_d").as[(Long, String)].collect().toSet ==
        Set((1L, "a"), (2L, "b"), (9L, "z")))
    } finally q.stop()
  }
}
