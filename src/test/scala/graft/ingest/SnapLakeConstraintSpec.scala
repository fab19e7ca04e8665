package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Write-time CHECK constraints on [[SnapshotLake]] and timestamp time
  * travel: violating commits abort atomically (no version, no orphan
  * generation), NULL passes (SQL CHECK), merges are gated like
  * ingests, and `timestampAsOf` resolves the version published at that
  * instant.
  */
class SnapLakeConstraintSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snapcons").toString

  test("a violating commit aborts whole: no version, no orphan data") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.addConstraint(spark, "score_range", "score >= 0 AND score <= 100")
    lake.addConstraint(spark, "id_present", "id IS NOT NULL")
    assert(lake.constraints(spark).keySet == Set("score_range", "id_present"))
    val bad = Seq((1L, 50), (2L, 101)).toDF("id", "score")
    val e = intercept[IllegalStateException] { lake.commit(bad, overwrite = true) }
    assert(e.getMessage.contains("score_range") &&
      e.getMessage.contains("1 row(s)"), e.getMessage)
    assert(lake.versions(spark).isEmpty, "violating commit published")
    // the half-written generation was cleaned up, not orphaned
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .exists(_.getPath.getName.startsWith("gen-")), "orphan generation left")
    // a clean commit passes
    lake.commit(Seq((1L, 50), (2L, 99)).toDF("id", "score"), overwrite = true)
    assert(lake.read(spark).count() == 2)
  }

  test("CHECK passes NULL; drop re-admits; merge is gated too") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.addConstraint(spark, "positive", "v > 0")
    // NULL v evaluates the CHECK to NULL → passes, standard SQL
    lake.commit(Seq((1L, Some(5)), (2L, None)).toDF("id", "v"),
      overwrite = true)
    assert(lake.read(spark).count() == 2)
    // a merge whose source violates aborts and leaves the table alone
    intercept[IllegalStateException] {
      lake.merge(Seq((3L, Some(-1))).toDF("id", "v"), Seq("id"))
    }
    assert(lake.latestVersion(spark).contains(1L))
    assert(lake.read(spark).count() == 2)
    // dropping the constraint re-admits the same rows
    lake.dropConstraint(spark, "positive")
    lake.merge(Seq((3L, Some(-1))).toDF("id", "v"), Seq("id"))
    assert(lake.read(spark).count() == 3)
  }

  test("a constraint on a column the generation lacks passes vacuously") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.addConstraint(spark, "score_range", "score >= 0")
    // schema evolution: this append simply has no score column — every
    // row's score reads NULL, and CHECK passes NULL, so the commit must
    // succeed rather than fail analysis
    lake.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    assert(lake.read(spark).count() == 1)
    // a later generation WITH the column is still gated
    intercept[IllegalStateException] {
      lake.commit(Seq((2L, -5)).toDF("id", "score"))
    }
    assert(lake.latestVersion(spark).contains(1L))
  }

  test("IS NOT NULL on a missing column gates the write (evolved-read eval)") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.addConstraint(spark, "id_present", "id IS NOT NULL")
    // "missing column ⇒ CHECK passes NULL" is only true for
    // null-propagating expressions; IS NOT NULL over an evolved-read
    // NULL is FALSE, so an append that simply drops the column must
    // abort — otherwise every committed row reads back as a violation
    val e = intercept[IllegalStateException] {
      lake.commit(Seq(("x", 1)).toDF("v", "score"), overwrite = true)
    }
    assert(e.getMessage.contains("id_present"), e.getMessage)
    assert(lake.versions(spark).isEmpty)
    // with the column present and non-null the same shape commits
    lake.commit(Seq((1L, "x")).toDF("id", "v"), overwrite = true)
    assert(lake.read(spark).count() == 1)
  }

  test("mixed missing struct-root + missing column refuses, never skips silently") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    // `meta.flag` cannot be evaluated when meta is absent (a NULL
    // literal has no fields), but silently skipping the WHOLE constraint
    // would also drop the id IS NOT NULL gate — refuse instead
    lake.addConstraint(spark, "mixed2",
      "id IS NOT NULL AND named_struct('f', meta.flag).f")
    val e = intercept[IllegalStateException] {
      lake.commit(Seq(("x", 1)).toDF("v", "score"), overwrite = true)
    }
    assert(e.getMessage.contains("mixed2") &&
      e.getMessage.contains("evolved-read"), e.getMessage)
    assert(lake.versions(spark).isEmpty, "refusal must not publish")
    // with both columns present the constraint evaluates normally
    lake.dropConstraint(spark, "mixed2")
    lake.addConstraint(spark, "id_p", "id IS NOT NULL")
    lake.commit(Seq((1L, "x")).toDF("id", "v"), overwrite = true)
    assert(lake.read(spark).count() == 1)
  }

  test("concurrent validateGen never sees an absent constraints file") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.addConstraint(spark, "c0", "v > 0")
    // writeConstraints must replace via an OVERWRITING atomic rename: a
    // delete-then-rename window would let a racing commit validate
    // against zero constraints. Hammer replacements on one thread while
    // the read side polls — constraints() must never come back empty.
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sawEmpty = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writer = new Thread(() => {
      var i = 0
      while (!stop.get() && i < 200) {
        lake.addConstraint(spark, "c0", s"v > ${i % 3}")
        i += 1
      }
    })
    writer.start()
    val deadline = System.nanoTime() + 2_000_000_000L
    while (writer.isAlive && System.nanoTime() < deadline) {
      if (lake.constraints(spark).isEmpty) sawEmpty.set(true)
    }
    stop.set(true); writer.join()
    assert(!sawEmpty.get(), "a reader observed zero constraints mid-replace")
    assert(lake.constraints(spark).keySet == Set("c0"))
  }

  test("vacuumOrphans reclaims aged unreferenced generations only") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash between data write and commit claim: a gen dir
    // with data but no referencing commit — plain vacuum never touches
    // it (could be an in-flight writer), so it leaks forever without a
    // dedicated sweep
    val orphan = new org.apache.hadoop.fs.Path(root, "gen-deadbeef0001")
    fs.mkdirs(orphan)
    val out = fs.create(new org.apache.hadoop.fs.Path(orphan, "part-0.parquet"))
    out.write(Array[Byte](1, 2, 3)); out.close()
    val young = new org.apache.hadoop.fs.Path(root, "gen-deadbeef0002")
    fs.mkdirs(young) // an "in-flight writer" — too young to sweep
    fs.setTimes(orphan, 1000L, -1)
    fs.setTimes(young, System.currentTimeMillis(), -1)
    lake.vacuumOrphans(spark, cutoffMillis = 1000000L)
    assert(!fs.exists(orphan), "aged orphan not reclaimed")
    assert(fs.exists(young), "in-flight generation swept")
    // the referenced generation is untouched
    assert(lake.read(spark).count() == 1)
  }

  test("a malformed constraint aborts the commit without orphaning data") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, 1)).toDF("id", "score"), overwrite = true)
    lake.addConstraint(spark, "broken", "score ~~nonsense~~")
    intercept[Exception] { lake.commit(Seq((2L, 2)).toDF("id", "score")) }
    assert(lake.latestVersion(spark).contains(1L))
    // the failed commit's generation was cleaned up
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("gen-"))
    assert(gens.length == 1, s"orphan generation left behind: ${gens.toSeq}")
  }

  test("a violating micro-batch fails the stream; the lake stays clean") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, 10)).toDF("id", "score"), overwrite = true)
    lake.addConstraint(spark, "score_range", "score BETWEEN 0 AND 100")
    val sink = new graft.sources.SnapLakeSource().createSink(spark.sqlContext,
      Map("path" -> root), Nil, org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(0L, Seq((2L, 50)).toDF("id", "score"))
    assert(lake.read(spark).count() == 2)
    // the violating batch aborts before the commit claim — in a real
    // query this surfaces as the stream failing, which is the correct
    // outcome for a quality gate: bad data never lands, and the
    // checkpoint retries the batch after the producer is fixed
    intercept[IllegalStateException] {
      sink.addBatch(1L, Seq((3L, 999)).toDF("id", "score"))
    }
    assert(lake.latestVersion(spark).contains(2L))
    assert(lake.read(spark).count() == 2, "violating batch leaked rows")
  }

  test("changefeed reads plan as pure scans: no exchange, no join") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), overwrite = true)
    lake.merge(Seq((2L, "B")).toDF("id", "v"), Seq("id"))
    // the merge version's changes come from the materialized _cdf — the
    // read is a scan plus literals, never a diff of snapshots
    val plan = lake.changesBetween(spark, 1L, 2L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"changefeed read should be scan-only:\n$plan")
    assert(lake.changesBetween(spark, 1L, 2L).count() == 2)
  }

  test("vacuumOlderThan drops an aged prefix, never the head or a hole") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    lake.commit(Seq((2L, "b")).toDF("id", "v"))
    lake.commit(Seq((3L, "c")).toDF("id", "v"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def age(v: Int, t: Long): Unit = fs.setTimes(
      new org.apache.hadoop.fs.Path(f"$root/_commits/v$v%08d.json"), t, -1)
    // v1 old, v2 YOUNG, v3 old: the expired set is {v1, v3} but only the
    // contiguous prefix {v1} may go — dropping v3 under a younger v2
    // would leave a hole, and v3 is also the head
    age(1, 1000L); age(2, 2000000L); age(3, 3000L)
    lake.vacuumOlderThan(spark, cutoffMillis = 1000000L)
    assert(lake.versions(spark) == Seq(2L, 3L))
    assert(lake.read(spark).count() == 3, "survivor data lost")
    // head survives even when everything is ancient
    age(2, 1000L); age(3, 1001L)
    lake.vacuumOlderThan(spark, cutoffMillis = Long.MaxValue)
    assert(lake.versions(spark) == Seq(3L))
    assert(lake.read(spark).count() == 3)
  }

  test("timestampAsOf resolves the version live at that instant") {
    val root = freshRoot()
    val lake = new SnapshotLake(root)
    lake.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    lake.commit(Seq((2L, "b")).toDF("id", "v"))
    // pin distinct publication instants via the commit files' mtimes
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t1 = 1700000000000L
    val t2 = 1700000600000L
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$root/_commits/v00000001.json"),
      t1, -1)
    fs.setTimes(new org.apache.hadoop.fs.Path(s"$root/_commits/v00000002.json"),
      t2, -1)
    assert(lake.versionAt(spark, t1 - 1).isEmpty)
    assert(lake.versionAt(spark, t1).contains(1L))
    assert(lake.versionAt(spark, t2 - 1).contains(1L))
    assert(lake.versionAt(spark, t2 + 1).contains(2L))
    // through the source option (session-TZ parse; UTC here — t1 is
    // exactly 2023-11-14T22:13:20Z)
    val asOf = spark.read.format("snaplake")
      .option("timestampAsOf", "2023-11-14 22:13:20").load(root)
    assert(asOf.count() == 1)
    // date-only form resolves to midnight (reference-format behavior):
    // 2023-11-15 00:00:00Z is after both commits → v2's 2 rows
    val dateOnly = spark.read.format("snaplake")
      .option("timestampAsOf", "2023-11-15").load(root)
    assert(dateOnly.count() == 2)
    intercept[IllegalArgumentException] {
      spark.read.format("snaplake").option("timestampAsOf", "2001-01-01 00:00:00")
        .load(root)
    }
    intercept[IllegalArgumentException] {
      spark.read.format("snaplake").option("versionAsOf", "1")
        .option("timestampAsOf", "2023-11-14 22:13:20").load(root)
    }
  }
}
