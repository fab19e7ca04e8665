package graft.ingest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{SparkSpecBase, Tables}
import java.nio.file.Files

/** Source/sink format coverage beyond parquet: the corpus survives a
  * round trip through JSONL (the de-facto training-data interchange
  * format) and CSV with explicit schemas — no inference in the read
  * path, so a malformed producer can't silently retype a column.
  */
class FormatsSpec extends SparkSpecBase {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docsSorted = Tables.documents(spark, sf0001)
    .select($"doc_id", $"text", $"lang", $"source", $"n_chars")

  test("JSONL round trip preserves every row and column") {
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/docs"
    docsSorted.write.mode("overwrite").json(dir)
    val back = spark.read.schema(docSchema).json(dir)
    assert(back.count() == docsSorted.count())
    assert(back.exceptAll(docsSorted).isEmpty && docsSorted.exceptAll(back).isEmpty)
  }

  test("CSV round trip with quoting survives embedded delimiters and newlines") {
    val dir = Files.createTempDirectory("graft_csv").toString + "/docs"
    // inject a delimiter, a quote, and an embedded newline to exercise
    // escaping; multiLine=true on the read side is what makes quoted
    // newlines survive (the default reader splits records at \n)
    val tricky = docsSorted.withColumn("text",
      when($"doc_id" === 0L, lit("a,b \"quoted\" c\nsecond line"))
        .otherwise($"text"))
    tricky.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(docSchema)
      .option("header", "true").option("multiLine", "true").csv(dir)
    assert(back.count() == tricky.count())
    assert(back.exceptAll(tricky).isEmpty && tricky.exceptAll(back).isEmpty)
  }

  test("ORC round trip preserves every row and column") {
    val dir = Files.createTempDirectory("graft_orc").toString + "/docs"
    docsSorted.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(docSchema).orc(dir)
    assert(back.count() == docsSorted.count())
    assert(back.exceptAll(docsSorted).isEmpty && docsSorted.exceptAll(back).isEmpty)
  }

  test("ORC scan pushes filters and prunes columns like parquet") {
    val dir = Files.createTempDirectory("graft_orc_push").toString + "/docs"
    docsSorted.write.mode("overwrite").orc(dir)
    val q = spark.read.schema(docSchema).orc(dir)
      .filter($"doc_id" < 100L).select($"doc_id", $"lang")
    val plan = q.queryExecution.executedPlan.toString
    // the ORC v1 scan reports pushed filters and the pruned read schema
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(doc_id,100)"),
      s"filter not pushed to ORC scan:\n$plan")
    assert(!plan.contains("text"), s"column pruning failed — text still read:\n$plan")
    assert(q.count() == docsSorted.filter($"doc_id" < 100L).count())
  }

  test("malformed JSONL rows land in the corrupt-record column, not mid-job failures") {
    val dir = Files.createTempDirectory("graft_badjson").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part.jsonl"),
      ("""{"doc_id": 1, "text": "ok"}""" + "\n" +
       """{"doc_id": broken""" + "\n" +
       """{"doc_id": 2, "text": "also ok"}""" + "\n").getBytes)
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    // Spark disallows querying only the corrupt-record column of a raw
    // file scan; cache the parsed frame first (per the error's guidance)
    val read = spark.read.schema(schema).json(dir).cache()
    assert(read.filter($"_corrupt_record".isNotNull).count() == 1)
    assert(read.filter($"_corrupt_record".isNull).count() == 2)
  }
}
