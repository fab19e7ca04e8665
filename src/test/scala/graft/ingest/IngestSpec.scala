package graft.ingest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpecBase
import java.nio.file.Files

case class SpecRowFixture(title: String, subtitle: String, content: String)

/** End-to-end ingest tests over hand-built fixtures mimicking the
  * reference's three extraction shapes (FIXTURES.md §2), with golden
  * outputs transcribed from the JS semantics.
  */
class IngestSpec extends SparkSpecBase {
  import spark.implicits._

  test("gsmarena shape: continuation rows, to_key, brand/model split") {
    val rows = Seq(
      SpecRowFixture("Platform", "OS", "Android 12 "),
      SpecRowFixture("Platform", "C", " One UI 4.1"), // 1-char subtitle → continuation
      SpecRowFixture("Platform", "Chipset", "Snapdragon 8"),
      SpecRowFixture("Display", "Type", "AMOLED"))
    val raw = Seq(("http://g/a", "Samsung Galaxy S21", "http://img/a", rows))
      .toDF("src_url", "model", "img_url", "rows")
    val out = SpecIngest.fromSpecTable(raw).collect().head
    assert(out.getAs[String]("brand") == "Samsung")
    assert(out.getAs[String]("model") == "Galaxy S21")
    val specs = out.getAs[Map[String, String]]("specs")
    assert(specs("platform_os") == "Android 12 One UI 4.1") // continuation appended
    assert(specs("platform_chipset") == "Snapdragon 8")
    assert(specs("display_type") == "AMOLED")
  }

  test("gsmarena shape: repeated title starts a fresh per-table fold") {
    // Two distinct tables share the title 'Network'; the second one's
    // LEADING continuation row must write the bare-title key (app.js
    // folds per table: result[text_to_key(title)] when i-1 < 0), not
    // append to the first table's last subtitle.
    val rows = Seq(
      SpecRowFixture("Network", "Technology", "GSM"),
      SpecRowFixture("Display", "Type", "LCD"),
      SpecRowFixture("Network", "X", "5G bands"), // 1-char subtitle at table start
      SpecRowFixture("Network", "Speed", "HSPA"))
    val raw = Seq(("http://g/b", "Acme One", "http://img/b", rows))
      .toDF("src_url", "model", "img_url", "rows")
    val specs = SpecIngest.fromSpecTable(raw).collect().head
      .getAs[Map[String, String]]("specs")
    assert(specs("network") == "5G bands") // bare-title key, fresh fold
    assert(specs("network_technology") == "GSM") // untouched by table 2
    assert(specs("network_speed") == "HSPA")
  }

  test("geekbench shape: zip with '' backfill, last-wins dups, iOS override") {
    val raw = Seq(
      ("https://browser.geekbench.com/ios_devices/5", "iPhone 13", "p1",
        Seq("CPU ", "Cores", "CPU "), Seq("A15", "6")), // mismatch + dup key
      ("https://browser.geekbench.com/android_devices/9", "Samsung Galaxy", "p2",
        Seq("Score"), Seq("812")))
      .toDF("url", "model", "product_id", "keys", "values")
    val out = SpecIngest.fromParallelArrays(raw).collect()
      .map(r => r.getAs[String]("srcUrl") -> r).toMap
    val ios = out("https://browser.geekbench.com/ios_devices/5")
    assert(ios.getAs[String]("device") == "ios")
    assert(ios.getAs[String]("brand") == "Apple") // override (app.js:630-634)
    // app.js:634 shifts the first token only when device != 'ios' — an iOS
    // multi-token model keeps the full string
    assert(ios.getAs[String]("model") == "iPhone 13")
    val specs = ios.getAs[Map[String, String]]("specs")
    assert(specs("cores") == "6")
    assert(specs("cpu") == "") // third key had no value → '' backfill, last wins
    val android = out("https://browser.geekbench.com/android_devices/9")
    assert(android.getAs[String]("brand") == "Samsung")
    assert(android.getAs[Map[String, String]]("specs")("score") == "812")
  }

  test("versus shape: nested JSON walk, values+unit concat") {
    val json =
      """[{"name": "Performance", "reasons": [
        |  {"name": "CPU speed", "values": ["2.8", "4"], "unit": " GHz"},
        |  {"name": "RAM", "values": ["8"], "unit": null}]},
        | {"name": "Display", "reasons": [
        |  {"name": "resolution", "values": ["1080", "2400"], "unit": null}]}]"""
        .stripMargin
    val raw = Seq(("http://v/x", "Google Pixel 6", json))
      .toDF("src_url", "model", "props_json")
    val out = SpecIngest.fromNestedJson(raw).collect().head
    assert(out.getAs[String]("brand") == "Google")
    assert(out.getAs[String]("model") == "Pixel 6")
    val specs = out.getAs[Map[String, String]]("specs")
    assert(specs("performance_cpu_speed") == "2.8,4 GHz") // F9: comma join + unit
    assert(specs("performance_ram") == "8")
    assert(specs("display_resolution") == "1080,2400")
  }

  test("SpecLake: mergeSchema evolution, replay dedup, resume anti-join") {
    val root = Files.createTempDirectory("graft_lake").toString
    val lake = new SpecLake(root)
    // batch 1 and batch 2 have different "wide" columns → schema evolves
    lake.append(Seq(("u1", "Apple", "a-spec")).toDF("srcUrl", "brand", "spec_a"))
    lake.append(Seq(("u2", "Samsung", "b-spec")).toDF("srcUrl", "brand", "spec_b"))
    // replay of u1 (crash-retry) must not duplicate
    lake.append(Seq(("u1", "Apple", "a-spec")).toDF("srcUrl", "brand", "spec_a"))
    val data = lake.read(spark)
    assert(data.count() == 2)
    assert(data.columns.toSet == Set("srcUrl", "brand", "spec_a", "spec_b"))
    val u2 = data.filter($"srcUrl" === "u2").collect().head
    assert(u2.getAs[String]("spec_b") == "b-spec")
    assert(u2.getAs[String]("spec_a") == null) // evolved column backfills null
    // resume: frontier \ saved, falsy URLs dropped (P3/J1 semantics)
    val frontier = Seq("u1", "u2", "u3", "", null.asInstanceOf[String], "u3")
      .toDF("url")
    val todo = lake.pending(frontier).as[String].collect().toSet
    assert(todo == Set("u3"))
  }

  test("pivotSpecs: wide compat view projects requested keys only") {
    val recs = Seq(("B", "M", "u", Map("cpu" -> "A15", "ram" -> "8")))
      .toDF("brand", "model", "srcUrl", "specs")
    val wide = SpecIngest.pivotSpecs(recs, Seq("cpu", "missing_key"))
    val row = wide.collect().head
    assert(row.getAs[String]("cpu") == "A15")
    assert(row.getAs[String]("missing_key") == null)
    assert(!wide.columns.contains("ram"))
  }

  test("chunked _pN compat layout: write splits at width, read reassembles") {
    // the reference's 150-column MySQL sharding (app.js:333-363),
    // materialized and reassembled; width 3 over 8 value columns → 3
    // part dirs with the key in each, reassembly == original frame
    val dir = java.nio.file.Files.createTempDirectory("graft_chunked").toString
    val wideDf = spark.range(0, 20).select(
      (col("id").as("key") +: (0 until 8).map(i =>
        (col("id") * 10 + i).as(s"c$i"))): _*)
    val nParts = SpecLake.writeChunked(wideDf, "key", dir, width = 3)
    assert(nParts == 3) // ceil(8 / 3) — chunkKeys' split points
    // each physical part holds the key + at most `width` value columns
    (0 until nParts).foreach { i =>
      val cols = spark.read.parquet(s"$dir/p$i").columns
      assert(cols.head == "key" || cols.contains("key"))
      assert(cols.length <= 4, s"p$i has ${cols.length} columns")
    }
    val back = SpecLake.readChunked(spark, dir, "key")
    assert(back.columns.sorted.toSeq == wideDf.columns.sorted.toSeq)
    val orig = wideDf.orderBy("key").collect().map(_.toSeq)
    val round = back.select(wideDf.columns.map(col(_)): _*)
      .orderBy("key").collect().map(_.toSeq)
    assert(round.toSeq == orig.toSeq, "chunked round trip diverged")
    // a NARROWER re-write to the same root must prune the stale p2 —
    // an orphaned part would resurrect old columns and inner-join-drop
    // keys absent from it
    val narrowDf = spark.range(0, 10).select(
      (col("id").as("key") +: (0 until 4).map(i =>
        (col("id") * 100 + i).as(s"d$i"))): _*)
    assert(SpecLake.writeChunked(narrowDf, "key", dir, width = 3) == 2)
    val back2 = SpecLake.readChunked(spark, dir, "key")
    assert(back2.columns.sorted.toSeq == narrowDf.columns.sorted.toSeq,
      s"stale part columns leaked: ${back2.columns.mkString(",")}")
    assert(back2.count() == 10)
  }

  test("ingest edge shapes: empty keys, null rows, null/empty props_json survive") {
    // r13 review: three crash/drop paths on pages the crawler really
    // produces (no spec table, empty key arrays, missing __data blob).
    // Each must yield the record WITH AN EMPTY SPEC MAP — never a
    // failed job (NPE / INVALID_INDEX_OF_ZERO) and never a silently
    // vanished product whose URL the ledger already marked crawled.
    // geekbench: empty parallel arrays — sequence(1, size) on an empty
    // keys array counts DOWN to [1, 0]; the index-bearing transform
    // yields the empty map instead
    val gb = Seq(("http://g/e", "Acme One", Seq.empty[String],
        Seq.empty[String], null.asInstanceOf[String]))
      .toDF("url", "model", "keys", "values", "product_id")
    val gbOut = SpecIngest.fromParallelArrays(gb).collect().head
    assert(gbOut.getAs[Map[String, String]]("specs") == Map.empty)
    assert(gbOut.getAs[String]("model") == "One")
    // gsmarena: null rows column (page with no spec table)
    val gs = Seq(("http://g/n", "Acme Two", "http://img/n",
        null.asInstanceOf[Seq[SpecRowFixture]]))
      .toDF("src_url", "model", "img_url", "rows")
    val gsOut = SpecIngest.fromSpecTable(gs).collect().head
    assert(gsOut.getAs[Map[String, String]]("specs") == Map.empty)
    // versus: null / malformed / empty-array props_json all keep the row
    val vs = Seq(
        ("http://v/1", "Acme Three", null.asInstanceOf[String]),
        ("http://v/2", "Acme Four", "not json at all"),
        ("http://v/3", "Acme Five", "[]"))
      .toDF("src_url", "model", "props_json")
    val vsOut = SpecIngest.fromNestedJson(vs)
    assert(vsOut.count() == 3, "records with no props must survive")
    vsOut.collect().foreach { r =>
      assert(r.getAs[Map[String, String]]("specs") == Map.empty,
        s"expected empty specs for ${r.getAs[String]("srcUrl")}")
    }
  }

  test("SpecLake.read resolves replay duplicates deterministically: first landing wins") {
    // r13 review: dropDuplicates picked an ARBITRARY row per srcUrl, so
    // a crash-window re-crawl that landed different page content made
    // successive reads disagree. Landing order is now stamped at append
    // and keep-first is deterministic.
    val root = Files.createTempDirectory("graft_lake_det").toString
    val lake = new SpecLake(root)
    lake.append(Seq(("u1", "Apple", "original")).toDF("srcUrl", "brand", "spec_a"))
    Thread.sleep(5) // distinct landing instants
    lake.append(Seq(("u1", "Apple", "re-crawled")).toDF("srcUrl", "brand", "spec_a"))
    (1 to 3).foreach { i =>
      val got = lake.read(spark).filter($"srcUrl" === "u1")
        .select($"spec_a").as[String].collect().toSeq
      assert(got == Seq("original"), s"read $i returned $got")
    }
    // the stamp is an internal column, not part of the read schema
    assert(!lake.read(spark).columns.contains("_landed_at"))
  }

  test("writeChunked on a key-only frame keeps the keys and sweeps cleanly") {
    // r13 review: zero value columns wrote zero parts but still swept
    // every existing pN — destroying the previous layout while
    // persisting nothing. Now p0 carries the key column alone.
    val dir = Files.createTempDirectory("graft_chunked_k").toString
    val wide = spark.range(0, 5).select(col("id").as("key"),
      (col("id") * 2).as("c0"))
    assert(SpecLake.writeChunked(wide, "key", dir, width = 3) == 1)
    val keyOnly = spark.range(0, 7).select(col("id").as("key"))
    assert(SpecLake.writeChunked(keyOnly, "key", dir, width = 3) == 1)
    val back = SpecLake.readChunked(spark, dir, "key")
    assert(back.columns.toSeq == Seq("key"))
    assert(back.as[Long].collect().toSet == (0L until 7L).toSet)
  }
}
