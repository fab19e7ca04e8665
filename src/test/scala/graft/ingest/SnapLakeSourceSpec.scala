package graft.ingest

import org.apache.spark.sql.{AnalysisException, SaveMode}
import org.apache.spark.sql.functions._
import graft.SparkSpecBase
import java.nio.file.Files

/** [[graft.sources.SnapLakeSource]]: SnapshotLake behind
  * `spark.read.format("snaplake")` — short-name registration, SaveMode →
  * commit mapping, time travel via option, snapshot isolation through
  * the resolved relation, and parquet pushdown surviving the delegation.
  */
class SnapLakeSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_snapsrc").toString

  test("write/read round trip through the format, with time travel") {
    val root = freshRoot()
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.format("snaplake").mode(SaveMode.Overwrite).save(root)
    Seq((3L, "c")).toDF("id", "v")
      .write.format("snaplake").mode(SaveMode.Append).save(root)
    // short name resolves via DataSourceRegister (META-INF/services)
    val latest = spark.read.format("snaplake").load(root)
    assert(latest.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    val v1 = spark.read.format("snaplake").option("versionAsOf", "1").load(root)
    assert(v1.as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    // the write path returns the same commits SnapshotLake's API sees
    assert(new SnapshotLake(root).versions(spark) == Seq(1L, 2L))
  }

  test("SaveMode semantics: ErrorIfExists refuses, Ignore no-ops") {
    val root = freshRoot()
    val df = Seq((1L, "a")).toDF("id", "v")
    // ErrorIfExists on a fresh root commits
    df.write.format("snaplake").mode(SaveMode.ErrorIfExists).save(root)
    intercept[AnalysisException] {
      df.write.format("snaplake").mode(SaveMode.ErrorIfExists).save(root)
    }
    // Ignore on a non-empty table leaves it untouched
    Seq((9L, "z")).toDF("id", "v")
      .write.format("snaplake").mode(SaveMode.Ignore).save(root)
    assert(spark.read.format("snaplake").load(root).count() == 1)
    assert(new SnapshotLake(root).versions(spark) == Seq(1L))
  }

  test("a resolved reader keeps its snapshot across later commits") {
    val root = freshRoot()
    Seq((1L, "a")).toDF("id", "v")
      .write.format("snaplake").mode(SaveMode.Overwrite).save(root)
    val reader = spark.read.format("snaplake").load(root)
    Seq((2L, "b")).toDF("id", "v")
      .write.format("snaplake").mode(SaveMode.Append).save(root)
    // new reads see v2; the pre-existing frame pinned v1's file listing
    assert(spark.read.format("snaplake").load(root).count() == 2)
    assert(reader.as[(Long, String)].collect().toSet == Set((1L, "a")),
      "snapshot isolation broken through the source")
  }

  test("filters push into the delegated parquet scan") {
    val root = freshRoot()
    spark.range(0, 1000).select(col("id"), (col("id") % 7).as("k"))
      .write.format("snaplake").mode(SaveMode.Overwrite).save(root)
    val q = spark.read.format("snaplake").load(root).filter(col("id") < 100)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(id,100)"),
      s"filter did not reach the parquet scan:\n$plan")
    assert(q.count() == 100)
  }

  test("SQL DDL works for reads; INSERT INTO is refused, lake intact") {
    val root = freshRoot()
    Seq((1L, "a")).toDF("id", "v")
      .write.format("snaplake").mode(SaveMode.Overwrite).save(root)
    spark.sql(s"CREATE TABLE snap_sql_t USING snaplake OPTIONS (path '$root')")
    try {
      assert(spark.sql("SELECT v FROM snap_sql_t WHERE id = 1")
        .as[String].collect().toSeq == Seq("a"))
      // INSERT INTO would bypass the commit log and drop parquet files
      // straight into a committed generation — mutating every version
      // that references it. The index advertises the table's real
      // multi-location layout, so Spark's single-path insert refuses.
      intercept[Exception] {
        spark.sql("INSERT INTO snap_sql_t VALUES (2, 'b')")
      }
      val lake = new SnapshotLake(root)
      assert(lake.versions(spark) == Seq(1L))
      assert(lake.readAt(spark, 1L).count() == 1,
        "INSERT INTO leaked rows into a committed generation")
    } finally spark.sql("DROP TABLE snap_sql_t")
  }

  test("reading an empty root or unknown version fails fast") {
    val root = freshRoot()
    intercept[IllegalArgumentException] {
      spark.read.format("snaplake").load(root).count()
    }
    Seq((1L, "a")).toDF("id", "v")
      .write.format("snaplake").mode(SaveMode.Overwrite).save(root)
    intercept[IllegalArgumentException] {
      spark.read.format("snaplake").option("versionAsOf", "5").load(root)
    }
  }
}
