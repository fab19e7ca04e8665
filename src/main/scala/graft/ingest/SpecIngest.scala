package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{ColFns, Normalize}

/** Normalization pipelines for the three raw extraction shapes the
  * reference produces (SURVEY §2.10, FIXTURES.md §2), minus the network
  * I/O: the crawl extractors' `page.evaluate` closures become parsers over
  * already-landed raw rows.
  *
  *  - gsmarena shape (app.js:545-586): per-device spec table rows
  *    (title, subtitle, content) with 1-char-subtitle continuation rows.
  *  - geekbench shape (app.js:596-636): parallel keys/values arrays with
  *    possible length mismatch, device/brand derived from the URL.
  *  - versus shape (app.js:682-704): nested propGroups/reasons JSON with
  *    per-reason values array + optional unit.
  *
  * The stateful continuation fold is a pure-Scala function
  * ([[Normalize.foldSpecRows]], unit-tested without Spark) wrapped in one
  * typed UDF — the same boundary the reference drew around its
  * browser-side evaluators; everything else is built-in expressions.
  */
object SpecIngest {

  /** versus `window.__data` propGroups schema (app.js:690-704). */
  val PropGroupsSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("name", StringType),
    StructField("reasons", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("values", ArrayType(StringType)),
      StructField("unit", StringType))))))))

  private val specRowsType = ArrayType(StructType(Seq(
    StructField("title", StringType),
    StructField("subtitle", StringType),
    StructField("content", StringType))))

  /** gsmarena shape: input (src_url, model, img_url,
    * rows: array<struct<title, subtitle, content>>). One UDF applies the
    * continuation fold + last-wins merge per document.
    */
  def fromSpecTable(raw: DataFrame): DataFrame = {
    val parse = udf { rowsIn: Seq[org.apache.spark.sql.Row] =>
      // null rows (page with no spec table, or a cast that nulled the
      // column) parse to the empty spec map — Spark passes null through
      // to reference-typed UDF params, and an unguarded foreach would
      // NPE the whole job on one such page (r13 review)
      val rows = Option(rowsIn).getOrElse(Seq.empty)
      // The reference folds EACH spec table independently (one result
      // object per th, app.js:548-565), then merge_array_object merges
      // the per-table objects last-wins (app.js:585). The raw shape
      // flattens one row per (table, subtitle) with the table's title
      // repeated, so a title change marks a table boundary: group by
      // consecutive title runs, not globally by title — a repeated title
      // later in the page starts a FRESH fold (its leading continuation
      // row writes the bare-title key, not an append to the earlier
      // table's last subtitle).
      val runs = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]]
      var prevTitle: String = null
      rows.foreach { r =>
        val t = r.getAs[String]("title")
        if (runs.isEmpty || t != prevTitle)
          runs += scala.collection.mutable.ArrayBuffer(r)
        else runs.last += r
        prevTitle = t
      }
      Normalize.mergeSpecs(runs.toSeq.flatMap { rs =>
        Normalize.foldSpecRows(rs.head.getAs[String]("title"),
          rs.map(_.getAs[String]("subtitle")).toSeq,
          rs.map(_.getAs[String]("content")).toSeq)
      })
    }
    raw
      .withColumn("specs", parse(col("rows").cast(specRowsType)))
      .withColumn("brand", ColFns.brandCol(col("model")))
      .withColumn("model", ColFns.modelCol(col("model")))
      .withColumn("product_id", lit(""))
      .withColumn("device", lit(""))
      .select(col("brand"), col("model"), col("img_url").as("imgUrl"),
        col("src_url").as("srcUrl"), col("product_id").as("productId"),
        col("device"), col("specs"))
  }

  /** geekbench shape: parallel keys/values arrays zipped positionally with
    * '' backfill on mismatch (app.js:626-627) — pure expressions:
    * normalize keys, pad values, map_from_entries with last-wins dedup.
    */
  def fromParallelArrays(raw: DataFrame): DataFrame = {
    val keys = transform(col("keys"),
      k => ColFns.trimTrailingUnderscoresCol(ColFns.toKeyCol(k)))
    // try_element_at: ANSI mode (Spark 4 default) makes plain element_at
    // throw on the out-of-range indexes a key/value length mismatch hits;
    // the reference backfills '' instead (app.js:627). Indexes ride the
    // keys array itself via transform's (elem, idx) lambda — NOT
    // sequence(1, size(keys)): sequence infers step -1 when start >
    // stop, so an EMPTY keys array would yield [1, 0] and a 2-element
    // padded side against 0 keys (r13 review).
    val padded = transform(col("keys"),
      (_, i) => coalesce(try_element_at(col("values"), i + lit(1)), lit("")))
    val device = ColFns.deviceCol(col("url"))
    raw
      // JS object assignment is last-wins on duplicate keys (app.js:627).
      // Dedup explicitly in the expression (keep each key's LAST entry)
      // instead of flipping the session-wide mapKeyDedupPolicy conf —
      // map_from_entries then sees unique keys, so the policy (EXCEPTION
      // by default in Spark 4) never fires and no session state leaks.
      .withColumn("specs",
        map_from_entries(lastWinsEntries(
          zip_with(keys, padded, (k, v) => struct(k.as("k"), v.as("v"))))))
      .withColumn("device", device)
      .withColumn("brand",
        ColFns.brandWithIosOverride(col("device"), ColFns.brandCol(col("model"))))
      // app.js:634: the first model token is shifted off only when the
      // device is NOT 'ios' — an iOS multi-token model keeps the full
      // string (brand is separately forced to 'Apple').
      .withColumn("model",
        when(col("device") === "ios", col("model"))
          .otherwise(ColFns.modelCol(col("model"))))
      .select(col("brand"), col("model"), lit("").as("imgUrl"),
        col("url").as("srcUrl"), coalesce(col("product_id"), lit("")).as("productId"),
        col("device"), col("specs"))
  }

  /** Expression-level LAST_WIN dedup (see [[ColFns.lastWinsEntries]]). */
  private def lastWinsEntries(entries: Column): Column =
    ColFns.lastWinsEntries(entries, keyField = "k")

  /** versus shape: nested JSON blob → explode propGroups ×
    * reasons → key = to_key(group_name + '_' + reason_name), value =
    * comma-joined values + unit (F9, app.js:702).
    */
  def fromNestedJson(raw: DataFrame): DataFrame = {
    // explode_outer, both levels: a record whose props_json is
    // null/malformed (from_json → null) or whose groups/reasons are
    // empty must survive with an EMPTY spec map — the gsmarena and
    // geekbench paths keep such records, and a plain explode would
    // silently drop the whole product while the saved-URL ledger
    // already marked it crawled (r13 review). The null placeholder
    // rows these outer explodes add are filtered out of `entries`
    // below (a null spec_key never becomes a map entry).
    val exploded = raw
      .withColumn("pg",
        explode_outer(from_json(col("props_json"), PropGroupsSchema)))
      .withColumn("reason", explode_outer(col("pg.reasons")))
      .select(col("src_url"), col("model"),
        ColFns.trimTrailingUnderscoresCol(ColFns.toKeyCol(
          concat(col("pg.name"), lit("_"), col("reason.name")))).as("spec_key"),
        ColFns.valuesWithUnitCol(col("reason.values"), col("reason.unit"))
          .as("spec_value"))
    exploded
      .groupBy(col("src_url"), col("model"))
      // entries originate from a single exploded source row, so
      // collect_list order is the reason order; last-wins dedup before
      // map_from_entries (no session-conf mutation, see lastWinsEntries).
      // collect_list skips NULL elements, so the when(...) turns the
      // outer-explode placeholder rows into zero entries.
      .agg(collect_list(when(col("spec_key").isNotNull,
          struct(col("spec_key").as("k"),
            coalesce(col("spec_value"), lit("")).as("v"))))
        .as("entries"))
      .withColumn("specs", map_from_entries(lastWinsEntries(col("entries"))))
      .drop("entries")
      .withColumn("brand", ColFns.brandCol(col("model")))
      .withColumn("model", ColFns.modelCol(col("model")))
      .select(col("brand"), col("model"), lit("").as("imgUrl"),
        col("src_url").as("srcUrl"), lit("").as("productId"),
        lit("").as("device"), col("specs"))
  }

  /** Wide-table compatibility view: pivot chosen spec keys to columns
    * (SURVEY §7.5 — never materialize thousands of columns; project the
    * keys a consumer asks for). */
  def pivotSpecs(records: DataFrame, keys: Seq[String]): DataFrame =
    records.select(
      (Seq(col("brand"), col("model"), col("srcUrl")) ++
        keys.map(k => element_at(col("specs"), k).as(k))): _*)
}
