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
    val parse = udf { rows: Seq[org.apache.spark.sql.Row] =>
      // group rows by spec-table section, keeping first-occurrence section
      // order (JS object iteration order) so last-wins merges stay stable
      val grouped = rows.zipWithIndex
        .groupBy(_._1.getAs[String]("title")).toSeq
        .sortBy(_._2.head._2)
        .map { case (title, rs0) =>
          val rs = rs0.map(_._1)
          Normalize.foldSpecRows(title,
            rs.map(_.getAs[String]("subtitle")),
            rs.map(_.getAs[String]("content")))
        }
      Normalize.mergeSpecs(grouped.flatten)
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
    // the reference backfills '' instead (app.js:627).
    val padded = transform(sequence(lit(1), size(col("keys"))),
      i => coalesce(try_element_at(col("values"), i), lit("")))
    val device = ColFns.deviceCol(col("url"))
    // JS object assignment is last-wins on duplicate keys (app.js:627);
    // Spark's default map policy is EXCEPTION, so opt into LAST_WIN.
    raw.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    raw
      .withColumn("specs", map_from_arrays(keys, padded))
      .withColumn("device", device)
      .withColumn("brand",
        ColFns.brandWithIosOverride(col("device"), ColFns.brandCol(col("model"))))
      .withColumn("model", ColFns.modelCol(col("model")))
      .select(col("brand"), col("model"), lit("").as("imgUrl"),
        col("url").as("srcUrl"), coalesce(col("product_id"), lit("")).as("productId"),
        col("device"), col("specs"))
  }

  /** versus shape: nested JSON blob → explode propGroups ×
    * reasons → key = to_key(group_name + '_' + reason_name), value =
    * comma-joined values + unit (F9, app.js:702).
    */
  def fromNestedJson(raw: DataFrame): DataFrame = {
    raw.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    val exploded = raw
      .withColumn("pg", explode(from_json(col("props_json"), PropGroupsSchema)))
      .withColumn("reason", explode(col("pg.reasons")))
      .select(col("src_url"), col("model"),
        ColFns.trimTrailingUnderscoresCol(ColFns.toKeyCol(
          concat(col("pg.name"), lit("_"), col("reason.name")))).as("spec_key"),
        ColFns.valuesWithUnitCol(col("reason.values"), col("reason.unit"))
          .as("spec_value"))
    exploded
      .groupBy(col("src_url"), col("model"))
      .agg(map_from_entries(collect_list(struct(col("spec_key"), col("spec_value"))))
        .as("specs"))
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
