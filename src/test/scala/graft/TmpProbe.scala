package graft
import org.apache.spark.sql.functions._
class TmpProbe extends SparkSpecBase {
  import spark.implicits._
  test("probe: delete-all then read") {
    val root = java.nio.file.Files.createTempDirectory("probe_lake").toString + "/lake"
    val lake = new ingest.SnapshotLake(root)
    lake.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val v = lake.delete(spark, col("id") >= 0)
    info(s"delete-all published v$v")
    try {
      val n = lake.read(spark).count()
      info(s"read after delete-all: $n rows")
    } catch { case e: Exception => info(s"READ FAILED: ${e.getMessage.take(200)}") }
    try {
      val c = lake.changesBetween(spark, v - 1, v).count()
      info(s"changefeed rows: $c")
    } catch { case e: Exception => info(s"CDF FAILED: ${e.getMessage.take(200)}") }
    // and time travel to pre-delete still fine?
    info(s"readAt(v-1): ${lake.readAt(spark, v - 1).count()} rows")
  }
}
