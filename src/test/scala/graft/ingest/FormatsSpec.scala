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

  test("parquet bloom filters: written per column, probe-able, and selective") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.io.api.Binary
    import org.apache.hadoop.fs.Path
    import scala.jdk.CollectionConverters._

    val dir = Files.createTempDirectory("graft_bloom").toString + "/t"
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", md5($"text").as("content_hash"),
        md5(concat($"text", lit("x"))).as("url_hash"), $"lang")
    // per-column ndv: two high-cardinality hash columns sized
    // independently, plus low-ndv lang (one shared ndv would waste bytes
    // on a small column or inflate a big column's fpp)
    graft.ops.Layout.writeWithBloomFilters(docs.coalesce(1), dir,
      Seq("content_hash" -> 1000L, "url_hash" -> 500L, "lang" -> 8L))

    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val file = fs.listStatus(new Path(dir))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val present = docs.select($"content_hash").as[String].head(50)
      val block = reader.getFooter.getBlocks.asScala.head
      val colMeta = block.getColumns.asScala
        .find(_.getPath.toDotString == "content_hash").get
      // the filter was written…
      assert(colMeta.getBloomFilterOffset >= 0,
        "no bloom filter offset recorded for content_hash")
      // doc_id got none (not requested) — blooms are opt-in per column
      val idMeta = block.getColumns.asScala
        .find(_.getPath.toDotString == "doc_id").get
      assert(idMeta.getBloomFilterOffset < 0,
        "bloom filter written for a column that never asked for one")
      // the second requested hash column got its own filter too
      val urlMeta = block.getColumns.asScala
        .find(_.getPath.toDotString == "url_hash").get
      assert(urlMeta.getBloomFilterOffset >= 0,
        "no bloom filter offset recorded for url_hash")
      // lang asked for one but is fully dictionary-encoded — parquet-mr
      // suppresses the bloom there (the dictionary page is already an
      // exact membership filter), which is the right outcome for low-ndv
      // columns and worth pinning so nobody "fixes" it
      val langMeta = block.getColumns.asScala
        .find(_.getPath.toDotString == "lang").get
      assert(langMeta.getBloomFilterOffset < 0,
        "bloom written for a fully dictionary-encoded column")
      val bloom = reader.getBloomFilterDataReader(block).readBloomFilter(colMeta)
      // …contains every present value (no false negatives, the guarantee
      // row-group skipping relies on)…
      present.foreach { h =>
        assert(bloom.findHash(bloom.hash(Binary.fromString(h))),
          s"present hash $h not found — bloom would wrongly skip its row group")
      }
      // …and rejects nearly all absent probes (selectivity: the point of
      // paying the filter bytes)
      val falsePos = (1 to 200).count { i =>
        bloom.findHash(bloom.hash(Binary.fromString(s"absent_probe_$i")))
      }
      assert(falsePos < 20, s"bloom filter useless: $falsePos/200 false positives")
    } finally reader.close()
  }

  test("parquet codecs: zstd and snappy round-trip; zstd is tighter on text") {
    // storage economics at 100 TB: codec choice is a write option, not a
    // code change — both codecs must round-trip byte-identically, and on
    // text-heavy tables zstd buys a real size reduction over the snappy
    // default
    def dirBytes(d: String): Long =
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum
    val docs = Tables.documents(spark, sf0001)
    val base = Files.createTempDirectory("graft_codec").toString
    Seq("zstd", "snappy").foreach { c =>
      docs.coalesce(1).write.option("compression", c)
        .mode("overwrite").parquet(s"$base/$c")
      val back = spark.read.parquet(s"$base/$c")
      assert(back.count() == docs.count())
      assert(back.select($"doc_id", $"text").except(
        docs.select($"doc_id", $"text")).isEmpty)
    }
    val (z, s) = (dirBytes(s"$base/zstd"), dirBytes(s"$base/snappy"))
    info(f"zstd ${z / 1024}%d KiB vs snappy ${s / 1024}%d KiB")
    assert(z < s, s"zstd ($z B) not smaller than snappy ($s B) on text")
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

  test("JDBC source/sink smoke: spark.read.jdbc round-trips an embedded Derby table") {
    // SURVEY §2.1 maps S6 to parquet scans OR spark.read.jdbc; this
    // closes the jdbc clause with the one embedded database the Spark
    // distribution itself ships (derby*.jar) — no external server.
    // The shape is the production one: a dimension-sized table pulled
    // from an RDBMS, written back via df.write.jdbc.
    val dbDir = Files.createTempDirectory("graft_jdbc").toString
    val url = s"jdbc:derby:$dbDir/devices;create=true"
    val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE devices (id BIGINT NOT NULL, brand VARCHAR(32), score DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO devices VALUES (?, ?, ?)")
      Seq((1L, "acme", 0.5), (2L, "globex", 0.75), (3L, "initech", 0.25))
        .foreach { case (i, b, s) =>
          ins.setLong(1, i); ins.setString(2, b); ins.setDouble(3, s)
          ins.executeUpdate()
        }
      st.close(); ins.close()
    } finally conn.close()

    val df = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "devices")
      .option("driver", driver).load()
    assert(df.schema.fieldNames.map(_.toLowerCase).toSet == Set("id", "brand", "score"))
    val got = df.as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "acme", 0.5), (2L, "globex", 0.75), (3L, "initech", 0.25)))
    // predicate pushdown reaches the JDBC scan (the DataSource translates
    // the filter to SQL; driver-visible via the pushed-filter plan field)
    val filtered = df.filter($"id" > 1L)
    assert(filtered.count() == 2)
    // assert the CONCRETE pushed filter, not just the field name — every
    // JDBC scan prints "PushedFilters: [...]" even when empty, so a
    // contains("PushedFilters") check passes vacuously
    val fplan = filtered.queryExecution.executedPlan.toString
    assert(fplan.contains("PushedFilters") && fplan.contains("GreaterThan"),
      s"jdbc scan lost the pushed id > 1 filter:\n${fplan.take(600)}")
    // and the sink direction: write a derived frame back, read it again
    df.filter($"score" >= 0.5).write.format("jdbc")
      .option("url", url).option("dbtable", "top_devices")
      .option("driver", driver).mode("overwrite").save()
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "top_devices")
      .option("driver", driver).load()
    assert(back.count() == 2)
  }
}
