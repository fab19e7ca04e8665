package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scans, projections, predicates, range generation — SURVEY.md §2.1/§2.2/§2.5.
  *
  * Reference semantics covered: P1 column projection (app.js:342,462), P2
  * meta-column drop (app.js:444), P3 truthiness filter (app.js:109), P4
  * status predicate (app.js:87,116), P5 prefix/pattern predicate
  * (app.js:337), P6 substring/in-set predicate (app.js:73-77), S6 table scan
  * (app.js:461-475), S7 catalog scan (app.js:337,393), O4 bounded range
  * generation (app.js:205,232,310).
  *
  * All filters/projections here compile to parquet-pushed predicates and
  * pruned read schemas (verified via explain: PushedFilters / ReadSchema) —
  * the Spark-native equivalent of the reference's "don't fetch what you
  * won't read" request interception.
  */
object Scans extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S6/P1: projection + predicate, both pushed to the parquet scan.
    "s6_scan_project" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .filter(col("o_totalprice") > 50000)
        .orderBy(col("o_orderkey"))
    }),

    // P2: drop "meta" columns (id/parent_id analog) from a wide scan.
    // Canonical sort is TOTAL: every projected column participates
    // (driver lineitem violates the (l_orderkey, l_linenumber) PK —
    // 456,861 distinct pairs over 600,000 sf0.1 rows with DIFFERENT
    // payloads — so a key-only sort would rest on accidental
    // stable-sort agreement between engines; j3_zip_positional
    // pattern, NOTES r13). Ties that remain are identical tuples.
    "p2_drop_meta" -> ((s, d) => {
      Tables.lineitem(s, d)
        .drop("l_partkey", "l_suppkey", "l_extendedprice", "l_discount",
          "l_tax", "l_shipdate")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"), col("l_linestatus"))
    }),

    // P3: truthiness filter — drop null/empty strings like app.js:109.
    "p3_filter_nonempty" -> ((s, d) => {
      Tables.documents(s, d)
        .filter(col("text").isNotNull && col("text") =!= "" && col("lang").isNotNull)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // P4: status equality predicate (HTTP 200 analog).
    "p4_filter_eq" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    // P5: prefix/pattern predicates (the `LIKE '<t>_p%'` part-discovery analog).
    "p5_filter_like" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_name").like("%wid%") && col("p_type").startsWith("ECO"))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy(col("p_partkey"))
    }),

    // P6: in-set + substring predicates (resource-type/domain blocklist analog).
    "p6_filter_in_contains" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase") &&
          !col("props").contains("\"k\": 1}"))
        .select(col("event_id"), col("event_type"), col("props"))
        .orderBy(col("event_id"))
    }),

    // S7: catalog/schema introspection — spark.catalog equivalent of
    // information_schema.columns (app.js:390-399).
    "s7_catalog_columns" -> ((s, d) => {
      import s.implicits._
      val names = Tables.lineitem(s, d).schema.fields.map(_.name).toSeq
      names.toDF("column_name").orderBy(col("column_name"))
    }),

    // O4: bounded range generation with the reference's stride-5 probe space
    // (app.js:205-213) and chunk-window arithmetic (app.js:345,406).
    "o4_range_gen" -> ((s, d) => {
      s.range(1, 1000, 5)
        .select(
          col("id"),
          (col("id") * 150 + 150).as("window_end"),
          ceil(col("id") / 150.0).cast("long").as("chunk"))
        .orderBy(col("id"))
    }),

    // SURVEY §7.5.3: the pivotSpecs wide-table compatibility view — the
    // MapType spec record projected to the columns a reference-shaped
    // consumer asks for (app.js:401-417's wide tables, read side).
    // Spec-shaped records (brand, model, srcUrl, specs MAP) are derived
    // in-query from `part` because the driver's oracle registers only
    // the ten parquet tables, not the JSON device fixtures; the pivot
    // itself is the exact production path: element_at per requested
    // key, absent keys (size_mm on small parts, battery_mah everywhere)
    // surfacing as NULL columns.
    "s_pivot_specs_wide" -> ((s, d) => {
      val p = Tables.part(s, d)
      val records = p.select(
        col("p_brand").as("brand"),
        col("p_name").as("model"),
        concat(lit("https://specs.example/part/"), col("p_partkey"))
          .as("srcUrl"),
        map_filter(
          map(
            lit("part_type"), col("p_type"),
            lit("size_mm"), col("p_size").cast("string"),
            lit("price_usd"),
            round(col("p_retailprice")).cast("long").cast("string")),
          (k, _) => !(k === lit("size_mm") && col("p_size") < 10))
          .as("specs"))
      graft.ingest.SpecIngest.pivotSpecs(records,
          Seq("part_type", "size_mm", "price_usd", "battery_mah"))
        .orderBy(col("srcUrl"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "s6_scan_project" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice > 50000 ORDER BY o_orderkey""".stripMargin,

    "p2_drop_meta" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus""".stripMargin,

    "p3_filter_nonempty" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE text IS NOT NULL AND text <> '' AND lang IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    "p4_filter_eq" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        |WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin,

    "p5_filter_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
        |WHERE p_name LIKE '%wid%' AND p_type LIKE 'ECO%'
        |ORDER BY p_partkey""".stripMargin,

    "p6_filter_in_contains" ->
      """SELECT event_id, event_type, props FROM events
        |WHERE event_type IN ('click', 'purchase')
        |  AND props NOT LIKE '%"k": 1}%'
        |ORDER BY event_id""".stripMargin,

    "s7_catalog_columns" ->
      """SELECT column_name FROM (VALUES
        |  ('l_orderkey'),('l_partkey'),('l_suppkey'),('l_linenumber'),
        |  ('l_quantity'),('l_extendedprice'),('l_discount'),('l_tax'),
        |  ('l_returnflag'),('l_linestatus'),('l_shipdate')) t(column_name)
        |ORDER BY column_name""".stripMargin,

    "o4_range_gen" ->
      """SELECT gs AS id, gs * 150 + 150 AS window_end,
        |  CAST(ceil(gs / 150.0) AS BIGINT) AS chunk
        |FROM generate_series(1, 999, 5) t(gs) ORDER BY id""".stripMargin,

    // manual-CASE spelling of the same wide view: present keys project
    // their value, conditionally-absent and never-present keys are NULL
    "s_pivot_specs_wide" ->
      """SELECT p_brand AS brand, p_name AS model,
        |  'https://specs.example/part/' || p_partkey AS srcUrl,
        |  p_type AS part_type,
        |  CASE WHEN p_size >= 10 THEN CAST(p_size AS VARCHAR) END AS size_mm,
        |  CAST(CAST(round(p_retailprice) AS BIGINT) AS VARCHAR) AS price_usd,
        |  CAST(NULL AS VARCHAR) AS battery_mah
        |FROM part ORDER BY srcUrl""".stripMargin
  )
}
