package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Wide-schema stress: the reference chunks its wide spec tables at 150
  * columns (app.js:9,345 — a MySQL row-width ceiling); the MapType +
  * pivot story here must hold at reference-BREAKING widths with bounded
  * planning time. Two surfaces:
  *
  *  - [[SpecIngest.pivotSpecs]] projecting 2,500 map keys to columns in
  *    ONE relation — 16x past the reference's ceiling, planning time
  *    asserted linear-ish (an exponential analyzer blowup fails the
  *    bound by orders of magnitude, not by co-tenant noise);
  *  - the `_pN` chunked compat layout ([[SpecLake.writeChunked]])
  *    round-tripping 2,000 value columns across ~14 parts.
  */
class WideSchemaSpec extends SparkSpecBase {
  import spark.implicits._

  private val width = 2500

  test("pivotSpecs projects 2,500 map keys to columns; planning stays bounded") {
    // 20 records, each carrying a 2,500-entry specs map built in-plan
    val keys = transform(sequence(lit(1), lit(width)),
      i => concat(lit("k"), lpad(i.cast("string"), 4, "0")))
    val vals = (id: org.apache.spark.sql.Column) =>
      transform(sequence(lit(1), lit(width)),
        i => concat(id.cast("string"), lit(":"), i.cast("string")))
    val records = spark.range(0, 20).select(
      concat(lit("b"), col("id") % 3).as("brand"),
      concat(lit("m"), col("id")).as("model"),
      concat(lit("https://specs.example/w/"), col("id")).as("srcUrl"),
      map_from_arrays(keys, vals(col("id"))).as("specs"))
    val allKeys = (1 to width).map(i => f"k$i%04d")

    val t0 = System.nanoTime()
    val wide = SpecIngest.pivotSpecs(records, allKeys)
    wide.queryExecution.executedPlan // force analysis → physical planning
    val planSec = (System.nanoTime() - t0) / 1e9
    info(f"planned ${allKeys.size + 3} columns in $planSec%.1f s")
    // the bound is NOT a benchmark: a quadratic-or-worse analyzer pass
    // over 2.5k projections fails it by orders of magnitude, while
    // co-tenant noise cannot push linear planning anywhere near it
    assert(planSec < 120.0, f"planning 2.5k columns took $planSec%.1f s")

    assert(wide.columns.length == width + 3)
    val row = wide.filter(col("model") === "m7").head()
    assert(row.getAs[String]("k0042") == "7:42")
    assert(row.getAs[String]("k2500") == "7:2500")
    assert(wide.count() == 20)

    // the production read path stays narrow: a consumer asking for 3
    // keys plans 3 element_at projections, not 2,500
    val narrow = SpecIngest.pivotSpecs(records, Seq("k0001", "k1250", "k2500"))
    assert(narrow.columns.toSeq ==
      Seq("brand", "model", "srcUrl", "k0001", "k1250", "k2500"))
    assert(narrow.filter(col("model") === "m3").head()
      .getAs[String]("k1250") == "3:1250")
  }

  test("chunked compat layout round-trips 2,000 value columns across parts") {
    // the reference's own answer to its ceiling is chunked tables; the
    // compat writer must handle reference-breaking widths too
    val n = 2000
    val base = spark.range(0, 10).select(
      concat(lit("m"), col("id")).as("model") +:
        (1 to n).map(i =>
          concat(col("id").cast("string"), lit("_"), lit(i)).as(f"c$i%04d")): _*)
    val root = Files.createTempDirectory("graft_wide_chunk").toString + "/t"
    val parts = SpecLake.writeChunked(base, "model", root, width = 150)
    assert(parts == math.ceil(n / 150.0).toInt, s"unexpected part count $parts")
    val back = SpecLake.readChunked(spark, root, "model")
    assert(back.columns.length == n + 1)
    val r = back.filter(col("model") === "m4").head()
    assert(r.getAs[String]("c0001") == "4_1" && r.getAs[String]("c2000") == "4_2000")
    assert(back.count() == 10)
  }
}
