package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.ingest.SnapshotLake.{ChangeTypeCol, CommitVersionCol}

/** Row-level changefeed on [[SnapshotLake]]: the three cost tiers
  * (append = manifest arithmetic, merge/delete = materialized `_cdf`,
  * blind overwrite = file-level restatement), optimize's empty feed,
  * retention failure, and the streaming `readChangeFeed` source.
  */
class SnapLakeCdfSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snapcdf").toString

  private def changes(lake: SnapshotLake, v1: Long, v2: Long): Set[(Long, String, String, Long)] =
    lake.changesBetween(spark, v1, v2)
      .as[(Long, String, String, Long)].collect().toSet

  test("append/merge/delete/optimize each feed their own change tier") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), overwrite = true) // v1
    lake.commit(Seq((3L, "c")).toDF("id", "v")) // v2 append
    lake.merge(Seq((2L, "B!"), (9L, "i")).toDF("id", "v"), Seq("id")) // v3
    lake.delete(spark, col("id") === 1L) // v4
    lake.optimize(spark, 1, Seq(col("id"))) // v5
    // v1: initial snapshot arrives as inserts
    assert(changes(lake, 0L, 1L) ==
      Set((1L, "a", "insert", 1L), (2L, "b", "insert", 1L)))
    // v2: append tier — just the new generation's rows
    assert(changes(lake, 1L, 2L) == Set((3L, "c", "insert", 2L)))
    // v3: merge tier — pre-image delete + source inserts, nothing else
    // (id=1 and id=3 did not change and must NOT appear)
    assert(changes(lake, 2L, 3L) == Set(
      (2L, "b", "delete", 3L), (2L, "B!", "insert", 3L),
      (9L, "i", "insert", 3L)))
    // v4: delete tier — the removed row's pre-image only
    assert(changes(lake, 3L, 4L) == Set((1L, "a", "delete", 4L)))
    // v5: optimize rewrote every file but changed no row
    assert(changes(lake, 4L, 5L) == Set.empty)
    // windows compose
    assert(changes(lake, 2L, 5L) == changes(lake, 2L, 3L) ++ changes(lake, 3L, 4L))
  }

  test("changefeed across a REBASED merge: winner's inserts, then the merge's _cdf") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), overwrite = true) // v1
    // a disjoint append races into the merge's publish window: the merge
    // loses its claim at v2, proves the appended generation outside its
    // key envelope, and REBASES to v3 — its materialized _cdf must still
    // describe exactly its own changes, and the winner's version must
    // feed its own inserts
    val racy = new SnapshotLake(root) {
      override protected def onBeforePublish(): Unit =
        new SnapshotLake(root).commit(Seq((7L, "g")).toDF("id", "v")) // v2
    }
    val v = racy.merge(Seq((1L, "A"), (5L, "e")).toDF("id", "v"), Seq("id"))
    assert(v == 3L, s"merge should land at v3 after rebasing, got $v")
    assert(changes(lake, 1L, 2L) == Set((7L, "g", "insert", 2L)))
    assert(changes(lake, 2L, 3L) == Set(
      (1L, "a", "delete", 3L), (1L, "A", "insert", 3L),
      (5L, "e", "insert", 3L)))
    // the composed window tells the whole interleaved story
    assert(changes(lake, 1L, 3L) ==
      changes(lake, 1L, 2L) ++ changes(lake, 2L, 3L))
  }

  test("a blind overwrite restates: delete-all + insert-all") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    lake.commit(Seq((2L, "b")).toDF("id", "v"), overwrite = true)
    assert(changes(lake, 1L, 2L) ==
      Set((1L, "a", "delete", 2L), (2L, "b", "insert", 2L)))
  }

  test("a restore's feed is the restatement, not the restored mutation's rows") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), overwrite = true) // v1
    lake.merge(Seq((2L, "B")).toDF("id", "v"), Seq("id")) // v2: one gen WITH _cdf
    lake.commit(Seq((9L, "z")).toDF("id", "v"), overwrite = true) // v3: bad deploy
    lake.restore(spark, 2L) // v4 re-references v2's rewrite generation
    // v4's "new" directory carries the v2 merge's _cdf — but v4 is a
    // restore, so its changefeed must be the manifest restatement
    // (delete the bad table, insert the restored one), never the stale
    // merge rows (delete b / insert B) tagged with v4
    assert(changes(lake, 3L, 4L) == Set(
      (9L, "z", "delete", 4L),
      (1L, "a", "insert", 4L), (2L, "B", "insert", 4L)))
    // and v2's own feed still reads its materialized rows
    assert(changes(lake, 1L, 2L) == Set(
      (2L, "b", "delete", 2L), (2L, "B", "insert", 2L)))
  }

  test("changefeed past retention fails fast") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    lake.commit(Seq((2L, "b")).toDF("id", "v"))
    lake.commit(Seq((3L, "c")).toDF("id", "v"))
    lake.vacuum(spark, retainLast = 1)
    intercept[IllegalArgumentException] {
      changes(lake, 1L, 3L)
    }
  }

  test("streaming changefeed maintains a rollup that tracks the table " +
    "(the l_snaplake_incr_agg streaming twin)") {
    // The MV-refresh pattern as a LIVE query: a streaming aggregation
    // over readChangeFeed applies signed deltas (updates = delete+
    // insert pairs) and must equal a from-scratch aggregate of the
    // current table after EVERY kind of mutation — upsert, predicate
    // delete, append of a brand-new group, and a full group deletion
    // (which nets to n = 0 rather than disappearing: complete-mode
    // state never forgets a key, the one divergence from the batch
    // recompute, pinned here).
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    def frame(rows: (Long, String, Long)*) = rows.toDF("id", "grp", "len")
    lake.commit(frame((1L, "x", 10L), (2L, "y", 20L), (3L, "x", 30L),
      (4L, "y", 40L)), overwrite = true)
    val sgn = when(col(ChangeTypeCol) === "insert", 1L).otherwise(-1L)
    val q = spark.readStream.format("snaplake")
      .option("readChangeFeed", "true").load(root)
      .groupBy(col("grp"))
      .agg(sum(sgn).as("n"), sum(sgn * col("len")).as("len_sum"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("snapmv").start()
    def mv(): Map[String, (Long, Long)] =
      spark.table("snapmv").as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    def live(): Map[String, (Long, Long)] = mv().filter(_._2._1 > 0)
    def full(): Map[String, (Long, Long)] =
      lake.read(spark).groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("len")).as("len_sum"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    try {
      q.processAllAvailable()
      assert(live() == full(), "snapshot replay diverged")
      lake.merge(frame((2L, "y", 25L)), Seq("id")) // update
      q.processAllAvailable()
      assert(live() == full(), "upsert delta diverged")
      lake.delete(spark, col("id") === 1L) // predicate delete
      q.processAllAvailable()
      assert(live() == full(), "delete delta diverged")
      lake.commit(frame((9L, "z", 5L))) // append, brand-new group
      q.processAllAvailable()
      assert(live() == full(), "new-group append diverged")
      lake.delete(spark, col("grp") === "z") // full group deletion
      q.processAllAvailable()
      assert(live() == full(), "group-deletion delta diverged")
      assert(mv().get("z").contains((0L, 0L)),
        "fully-deleted group should net to zero in complete-mode state")
    } finally q.stop()
  }

  test("streaming readChangeFeed: mutations arrive as tagged rows") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), overwrite = true)
    val q = spark.readStream.format("snaplake")
      .option("readChangeFeed", "true").load(root)
      .writeStream.format("memory").queryName("snapcdf").start()
    def table(): Set[(Long, String, String, Long)] =
      spark.table("snapcdf").as[(Long, String, String, Long)].collect().toSet
    try {
      q.processAllAvailable()
      // snapshot replay, tagged as version-1 inserts
      assert(table() == Set((1L, "a", "insert", 1L), (2L, "b", "insert", 1L)))
      // a merge lands as its delete+insert pairs, not a restatement
      lake.merge(Seq((2L, "B!")).toDF("id", "v"), Seq("id"))
      q.processAllAvailable()
      assert(table() == Set(
        (1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
        (2L, "b", "delete", 2L), (2L, "B!", "insert", 2L)))
      // optimize commits a version but feeds nothing
      lake.optimize(spark, 1, Seq(col("id")))
      q.processAllAvailable()
      assert(table().size == 4, "optimize leaked rows into the changefeed")
      // an append flows through as inserts
      lake.commit(Seq((5L, "e")).toDF("id", "v"))
      q.processAllAvailable()
      assert(table().contains((5L, "e", "insert", 4L)))
      assert(table().size == 5)
    } finally q.stop()
  }
}
