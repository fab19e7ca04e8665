package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Copy-on-write MERGE/DELETE on [[SnapshotLake]]: upsert and delete
  * semantics, stats-scoped rewrites (untouched generations carry forward
  * by reference), the no-op delete fast path, and the optimistic-abort
  * publication contract under a racing commit.
  */
class SnapLakeMergeSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snapmerge").toString

  test("merge: updates replace by key, inserts append, others survive") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "name", "v"), overwrite = true)
    val src = Seq((2L, "B!", 200), (9L, "i", 90)).toDF("id", "name", "v")
    val v = lake.merge(src, Seq("id"))
    assert(v == 2L)
    assert(lake.read(spark).as[(Long, String, Int)].collect().toSet ==
      Set((1L, "a", 10), (2L, "B!", 200), (3L, "c", 30), (9L, "i", 90)))
    // time travel still shows the pre-merge table
    assert(lake.readAt(spark, 1L).count() == 3)
  }

  test("merge rewrite is scoped: non-intersecting generations carry forward") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    // three generations with disjoint id ranges
    lake.commit(spark.range(0, 100).toDF("id").withColumn("v", lit("old")),
      overwrite = true)
    lake.commit(spark.range(100, 200).toDF("id").withColumn("v", lit("old")))
    lake.commit(spark.range(200, 300).toDF("id").withColumn("v", lit("old")))
    val before = lake.dirsAt(spark, 3L)
    // source touches only the middle generation's envelope
    val v = lake.merge(Seq((150L, "new")).toDF("id", "v"), Seq("id"))
    val after = lake.dirsAt(spark, v)
    // the two untouched generations are re-referenced, not rewritten
    assert(after.toSet.intersect(before.toSet).size == 2,
      s"expected 2 carried generations: before=$before after=$after")
    assert(after.size == 3, s"one rewrite generation expected: $after")
    val rows = lake.read(spark).as[(Long, String)].collect()
    assert(rows.length == 300)
    assert(rows.toMap.apply(150L) == "new")
    assert(rows.count(_._2 == "old") == 299)
  }

  test("merge into a statless generation rewrites it conservatively") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, "x")).toDF("id", "v"), overwrite = true)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gen1 = lake.dirsAt(spark, 1L).head
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$root/$gen1/${GenStats.StatsFileName}"), false)
    val v = lake.merge(Seq((99L, "y")).toDF("id", "v"), Seq("id"))
    assert(lake.read(spark).as[(Long, String)].collect().toSet ==
      Set((1L, "x"), (99L, "y")))
    // conservative: the statless generation was rewritten, not carried
    assert(!lake.dirsAt(spark, v).contains(gen1))
  }

  test("delete: predicate rows go, NULL-evaluating rows stay") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, Some(5)), (2L, None), (3L, Some(50)))
      .toDF("id", "score"), overwrite = true)
    val v = lake.delete(spark, col("score") > 10)
    assert(v == 2L)
    // id=2's NULL score must survive a score>10 delete (SQL semantics)
    assert(lake.read(spark).select("id").as[Long].collect().toSet == Set(1L, 2L))
  }

  test("delete scoping: proven-clean generations carry; full miss is a no-op") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(spark.range(0, 100).toDF("id"), overwrite = true)
    lake.commit(spark.range(100, 200).toDF("id"))
    val before = lake.dirsAt(spark, 2L)
    // predicate outside every envelope: no-op, no new version
    assert(lake.delete(spark, col("id") >= 1000) == 2L)
    assert(lake.latestVersion(spark).get == 2L)
    // predicate inside one generation only
    val v = lake.delete(spark, col("id") < 50)
    assert(v == 3L)
    val after = lake.dirsAt(spark, v)
    assert(after.toSet.intersect(before.toSet).size == 1,
      s"one generation should carry: before=$before after=$after")
    assert(lake.read(spark).count() == 150)
  }

  test("a commit racing into the publish window aborts the merge") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    // a lake whose publish window admits a competing append
    val racy = new SnapshotLake(root) {
      override protected def onBeforePublish(): Unit =
        new SnapshotLake(root).commit(Seq((7L, "g")).toDF("id", "v"))
    }
    intercept[java.util.ConcurrentModificationException] {
      racy.merge(Seq((1L, "A")).toDF("id", "v"), Seq("id"))
    }
    // the winner's append survives; the merge left no published trace
    assert(lake.read(spark).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (7L, "g")))
    // rerun rebases cleanly on the new snapshot
    val v = lake.merge(Seq((1L, "A")).toDF("id", "v"), Seq("id"))
    assert(lake.readAt(spark, v).as[(Long, String)].collect().toSet ==
      Set((1L, "A"), (7L, "g")))
  }

  test("merge I/O is bounded by the affected tail, not the table") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    // a BIG body generation and a small tail with a disjoint key range
    lake.commit(spark.range(0, 300000).toDF("id")
      .withColumn("payload", concat(lit("x"), col("id"))), overwrite = true)
    lake.commit(spark.range(1000000, 1000100).toDF("id")
      .withColumn("payload", lit("tail")))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bigGen = lake.dirsAt(spark, 1L).head
    val bigBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(s"$root/$bigGen")).getLength
    // measure task INPUT during a merge that touches only the tail
    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      lake.merge(Seq((1000050L, "upd")).toDF("id", "payload"), Seq("id"))
      org.apache.spark.sql.GraftBridge.waitListenerBus(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    // the body generation (multi-MB) must never be scanned: the merge's
    // reads are the tail generation + the one-row source + its own
    // validation/stats read-back of the small rewrite
    assert(bytesRead.get() < bigBytes / 4,
      s"merge read ${bytesRead.get()} bytes vs body $bigBytes — " +
        "stats scoping stopped excluding the untouched generation")
    assert(lake.read(spark).count() == 300100)
  }

  test("merge with an evolved source schema widens the table") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), overwrite = true)
    // source carries a new column; untouched target rows read it null
    lake.merge(Seq((2L, "B", "fresh"), (3L, "c", "fresh"))
      .toDF("id", "v", "tag"), Seq("id"))
    val got = lake.read(spark).select("id", "v", "tag")
      .as[(Long, String, Option[String])].collect().toSet
    assert(got == Set((1L, "a", None), (2L, "B", Some("fresh")),
      (3L, "c", Some("fresh"))))
  }

  test("merge through the source: format-written lake accepts upserts") {
    val root = freshRoot()
    spark.range(0, 50).select(col("id"), lit("base").as("tag"))
      .write.format("snaplake").mode(SaveMode.Overwrite).save(root)
    val lake = new SnapshotLake(root)
    lake.merge(Seq((10L, "up"), (60L, "ins")).toDF("id", "tag"), Seq("id"))
    val got = spark.read.format("snaplake").load(root)
      .groupBy(col("tag")).count().as[(String, Long)].collect().toMap
    assert(got == Map("base" -> 49L, "up" -> 1L, "ins" -> 1L))
  }
}
