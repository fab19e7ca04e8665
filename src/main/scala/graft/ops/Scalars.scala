package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{ColFns, Normalize}
import QueryPack._

/** Scalar-function family — SURVEY.md §2.6 (F1-F18). Every function is a
  * built-in Catalyst expression chain (no UDFs), so the whole projection
  * stays inside whole-stage codegen.
  *
  * F1/F2 key normalization, F3 brand/model split, F4 device-from-url with
  * iOS override, F5 coalesce-to-'', F6 trim, F8 key-prefix concat, F10
  * timestamp format, F12 numeric suffix parse, F13 url normalize, F14/F15
  * JSON extraction, F16 flatten, F17 concat_ws, F18 arithmetic.
  */
object Scalars extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 + F2: to_key over real text, then trailing-underscore trim.
    "f1_to_key" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          ColFns.toKeyCol(substring(col("text"), 1, 40)).as("raw_key"))
        .withColumn("spec_key", ColFns.trimTrailingUnderscoresCol(col("raw_key")))
        .orderBy(col("doc_id"))
    }),

    // F3: brand = first token, model = rest (single-token keeps both).
    "f3_brand_model" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          ColFns.brandCol(col("p_name")).as("brand"),
          ColFns.modelCol(col("p_name")).as("model"))
        .orderBy(col("p_partkey"))
    }),

    // F4 + F12 + F8: synthesize a geekbench-style URL, re-extract the device
    // segment, apply the iOS→Apple brand override, parse numeric suffix.
    "f4_device_override" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val url = concat(lit("https://browser.geekbench.com/"),
        when(col("c_custkey") % 3 === 0, lit("ios")).otherwise(lower(col("c_mktsegment"))),
        lit("_devices/"), col("c_custkey").cast("string"))
      c.select(col("c_custkey"), url.as("url"))
        .withColumn("device", ColFns.deviceCol(col("url")))
        .withColumn("brand", ColFns.brandWithIosOverride(col("device"), lit("Generic")))
        .withColumn("device_num", regexp_extract(col("url"), "/(\\d+)$", 1).cast("long"))
        .orderBy(col("c_custkey"))
    }),

    // F10: timestamp formatting + calendar field extraction (app.js:39).
    "f10_date_format" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          tsStr(col("o_orderdate")).as("order_ts"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("q"))
        .orderBy(col("o_orderkey"))
    }),

    // F13 + F5 + F6 + F17: url strip + coalesce + trim + concat_ws pipeline.
    "f13_url_pipeline" -> ((s, d) => {
      val p = Tables.part(s, d)
      val url = concat(lit("https://catalog.example.com/p/"),
        col("p_partkey").cast("string"), lit("?ref="), col("p_brand"), lit("#frag"))
      p.select(col("p_partkey"), url.as("url"),
          ColFns.normalizeUrlCol(url).as("clean_url"),
          coalesce(nullif(col("p_brand"), lit("")), lit("unknown")).as("brand_or_unknown"),
          trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed_name"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey"))
    }),

    // F14/F15: JSON extraction from the events props blob (app.js:682-704).
    "f14_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k_typed"),
          get_json_object(col("props"), "$.k").as("k_raw"))
        .orderBy(col("event_id"))
    }),

    // F16: nested-array flatten + positional explode (app.js:732-733).
    "f16_flatten" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          flatten(array(array(col("l_quantity")),
            array(col("l_discount"), col("l_tax")))).as("flat"))
        .select(col("l_orderkey"), col("l_linenumber"),
          posexplode(col("flat")).as(Seq("pos", "val")))
        // TOTAL canonical sort: val joins the key columns because driver
        // lineitem repeats (l_orderkey, l_linenumber) with different
        // payloads (NOTES r13); remaining ties are identical tuples.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("pos"),
          col("val"))
    }),

    // F18: arithmetic family (ceil/floor/round/abs/mod/sqrt, app.js:345).
    "f18_math" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          floor(col("l_extendedprice")).as("price_floor"),
          round(col("l_extendedprice"), 1).as("price_round1"),
          (col("l_orderkey") % 7).as("key_mod7"),
          r6(abs(col("l_discount") - col("l_tax"))).as("disc_tax_gap"),
          r6(sqrt(col("l_quantity"))).as("qty_sqrt"))
        // TOTAL canonical sort over every projected column — the
        // (l_orderkey, l_linenumber) prefix alone is non-total on the
        // driver's PK-violating lineitem (NOTES r13). The computed
        // doubles are bit-identical across engines (they are the
        // hash-compared values), so both engines rank ties identically.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("price_ceil"),
          col("price_floor"), col("price_round1"), col("key_mod7"),
          col("disc_tax_gap"), col("qty_sqrt"))
    }),

    // ANSI-safe error handling: Spark 4 runs ANSI mode ON, where a bad
    // cast or division-by-zero THROWS mid-job; the try_* family turns
    // row-level garbage into NULLs so one malformed record can't kill a
    // 100 TB scan. Mixed-validity input built from order columns.
    "f_try_parse" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")
            .as("prio_num"),          // '1'-'5' parse; letters would null
          expr("try_cast(o_orderstatus AS INT)").as("status_num"), // null
          expr("try_divide(o_totalprice, o_custkey % 3)").as("per_bucket"),
          expr("try_cast(o_orderdate AS DATE)").as("order_date"))
        .orderBy(col("o_orderkey"))
    }),

    // Date arithmetic family: interval shifts, month arithmetic with
    // end-of-month clamping (add_months), boundary extraction
    // (last_day, month trunc), and day differences — the calendar
    // operations every retention/windowing pipeline leans on.
    "f_date_arith" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_add(col("o_orderdate"), 30).as("plus30"),
          date_sub(col("o_orderdate"), 7).as("minus7"),
          add_months(col("o_orderdate"), 2).as("plus2m"),
          last_day(col("o_orderdate")).as("eom"),
          trunc(col("o_orderdate"), "mm").as("som"),
          datediff(lit(java.sql.Date.valueOf("2026-01-01")),
            col("o_orderdate")).as("days_to_2026"))
        .orderBy(col("o_orderkey"))
    }),

    // Array higher-order functions — the codegen-free lambda family
    // (aggregate/filter/exists/forall/zip_with/transform/sort_array)
    // over a derived numeric array. The oracle replays the SEMANTICS as
    // scalar expressions with the SAME operation order (sequential fold
    // parenthesization), so doubles stay bit-identical; `orders` keys
    // the rows because (l_orderkey, l_linenumber) is not unique.
    "f_array_hof" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          array(col("o_totalprice"), col("o_totalprice") * 0.1,
            col("o_totalprice") - 42.0).as("a"))
        .select(col("o_orderkey"),
          round(aggregate(col("a"), lit(0.0), (acc, x) => acc + x), 6)
            .as("hof_sum"),
          size(filter(col("a"), x => x > lit(100.0))).as("n_gt100"),
          exists(col("a"), x => x > lit(100000.0)).as("any_big"),
          forall(col("a"), x => x >= lit(50.0)).as("all_ge50"),
          round(element_at(
            zip_with(col("a"), col("a"), (x, y) => x + y), 1), 6).as("z1"),
          round(element_at(sort_array(col("a")), 1), 6).as("mn"))
        .orderBy(col("o_orderkey"))
    }),

    // VARIANT (Spark 4 semi-structured type): parse the JSON blob once
    // into the binary variant encoding, then typed-path extraction —
    // the scale upgrade of get_json_object (one parse feeds every field
    // access; open schemas survive without a DDL migration).
    "f_variant_extract" -> ((s, d) => {
      val v = parse_json(col("props"))
      Tables.events(s, d)
        .select(col("event_id"),
          variant_get(v, "$.k", "int").as("k_int"),
          try_variant_get(v, "$.k", "double").as("k_dbl"),
          variant_get(v, "$.missing", "string").as("absent"))
        .orderBy(col("event_id"))
    }),

    // Regex family over the phone/name columns (digits live there).
    // Patterns stay in the character-class subset where Java regex and
    // DuckDB's RE2 agree; DuckDB's regexp_replace needs the 'g' flag to
    // match Spark's replace-all semantics.
    "f_regexp" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "^([A-Za-z]+)#", 1).as("prefix"),
          regexp_extract(col("c_name"), "([0-9]+)$", 1).cast("int")
            .as("cust_num"),
          length(regexp_replace(col("c_name"), "[^0-9]", ""))
            .as("n_digits"),
          regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
          col("c_name").rlike("00[0-9]{2}$").as("low_tail"))
        .orderBy(col("c_custkey"))
    }),

    // Bitwise family on the key columns — codegen'd integer ops.
    "f_bitwise" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("low_byte"),
          col("o_orderkey").bitwiseOR(lit(4096L)).as("with_flag"),
          col("o_orderkey").bitwiseXOR(shiftright(col("o_orderkey"), 3))
            .as("mixed"),
          bit_count(col("o_orderkey")).as("popcount"),
          bitwise_not(col("o_orderkey")).as("inverted"))
        .orderBy(col("o_orderkey"))
    }),

    // Signed-zero canonicalization, driver-gated: (42.0 - o_totalprice)
    // scaled down rounds to ±0.0 for most rows, the exact class that
    // shipped agg_regression red in r8 (DuckDB's round is
    // sign-preserving, Spark's BigDecimal Round is not; the driver
    // hash-compares BITS). r2/r4/r6 zero-fold (QueryPack.zf) and the
    // oracle mirrors with `+ 0` — this row keeps the convention honest
    // every round. Rounded magnitudes sit ~1e8 ulps from any .5
    // boundary, so the engines' differing boundary arithmetic (NOTES §1)
    // never engages.
    "f_signed_zero" -> ((s, d) => {
      val tiny = lit(42.0) - col("o_totalprice")
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          r6(tiny / lit(1e12)).as("tiny6"),
          r4(tiny / lit(1e9)).as("tiny4"),
          r2(tiny / lit(1e7)).as("tiny2"))
        .orderBy(col("o_orderkey"))
    })
  )

  override def oracles: Map[String, String] = Map(
    // add_months end-of-month clamping matches DuckDB's +INTERVAL MONTH;
    // datediff argument order is (end, start) vs date_diff('day', start,
    // end) — the NOTES §4 mapping.
    "f_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
        |  CAST(o_orderdate - INTERVAL 7 DAY AS DATE) AS minus7,
        |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |  last_day(o_orderdate) AS eom,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS som,
        |  CAST(date_diff('day', o_orderdate, DATE '2026-01-01') AS INT)
        |    AS days_to_2026
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // The HOF semantics as scalar expressions: the fold's sequential
    // parenthesization is written out so both engines run the same
    // IEEE754 additions in the same order.
    "f_array_hof" ->
      """SELECT o_orderkey,
        |  round(((0.0 + o_totalprice) + o_totalprice * 0.1)
        |          + (o_totalprice - 42.0), 6) AS hof_sum,
        |  CAST((o_totalprice > 100.0)::INT +
        |       (o_totalprice * 0.1 > 100.0)::INT +
        |       (o_totalprice - 42.0 > 100.0)::INT AS INT) AS n_gt100,
        |  (o_totalprice > 100000.0 OR o_totalprice * 0.1 > 100000.0
        |     OR o_totalprice - 42.0 > 100000.0) AS any_big,
        |  (o_totalprice >= 50.0 AND o_totalprice * 0.1 >= 50.0
        |     AND o_totalprice - 42.0 >= 50.0) AS all_ge50,
        |  round(o_totalprice + o_totalprice, 6) AS z1,
        |  round(least(o_totalprice, o_totalprice * 0.1, o_totalprice - 42.0), 6)
        |    AS mn
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // try_cast is try_cast in both engines; try_divide maps to
    // x / nullif(y, 0) (DuckDB integer-zero division would raise).
    "f_try_parse" ->
      """SELECT o_orderkey,
        |  try_cast(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
        |  try_cast(o_orderstatus AS INTEGER) AS status_num,
        |  o_totalprice / nullif(o_custkey % 3, 0) AS per_bucket,
        |  CAST(o_orderdate AS DATE) AS order_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // NOTE: the char class below is the reference's to_key class verbatim
    // (app.js:99) — RE2 (DuckDB) and Java (Spark) agree on it for ASCII.
    "f1_to_key" ->
      """SELECT doc_id,
        |  regexp_replace(lower(substr(text, 1, 40)),
        |    '\s|[!"#$%&''()*+,\-./:;<=>?@\[\]^`{|}~]', '_', 'g') AS raw_key,
        |  regexp_replace(regexp_replace(lower(substr(text, 1, 40)),
        |    '\s|[!"#$%&''()*+,\-./:;<=>?@\[\]^`{|}~]', '_', 'g'),
        |    '_+$', '', 'g') AS spec_key
        |FROM documents ORDER BY doc_id""".stripMargin,

    "f3_brand_model" ->
      """SELECT p_partkey, split_part(p_name, ' ', 1) AS brand,
        |  CASE WHEN array_length(string_split(p_name, ' ')) <= 1 THEN p_name
        |       ELSE array_to_string(list_slice(string_split(p_name, ' '), 2,
        |              array_length(string_split(p_name, ' '))), ' ')
        |  END AS model
        |FROM part ORDER BY p_partkey""".stripMargin,

    "f4_device_override" ->
      """WITH u AS (SELECT c_custkey,
        |  'https://browser.geekbench.com/' ||
        |  (CASE WHEN c_custkey % 3 = 0 THEN 'ios' ELSE lower(c_mktsegment) END) ||
        |  '_devices/' || CAST(c_custkey AS VARCHAR) AS url FROM customer)
        |SELECT c_custkey, url,
        |  split_part(split_part(url, 'com/', 2), '_', 1) AS device,
        |  CASE WHEN split_part(split_part(url, 'com/', 2), '_', 1) = 'ios'
        |       THEN 'Apple' ELSE 'Generic' END AS brand,
        |  CAST(regexp_extract(url, '/(\d+)$', 1) AS BIGINT) AS device_num
        |FROM u ORDER BY c_custkey""".stripMargin,

    "f10_date_format" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(quarter(o_orderdate) AS INT) AS q
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f13_url_pipeline" ->
      """WITH u AS (SELECT p_partkey, p_brand, p_type, p_name,
        |  'https://catalog.example.com/p/' || CAST(p_partkey AS VARCHAR) ||
        |    '?ref=' || p_brand || '#frag' AS url FROM part)
        |SELECT p_partkey, url,
        |  regexp_replace(url, '[?#].*$', '') AS clean_url,
        |  COALESCE(NULLIF(p_brand, ''), 'unknown') AS brand_or_unknown,
        |  trim('  ' || p_name || '  ') AS trimmed_name,
        |  concat_ws('|', p_brand, p_type) AS brand_type
        |FROM u ORDER BY p_partkey""".stripMargin,

    // Typed extraction parity: DuckDB has no VARIANT; the observable
    // results (typed values out of JSON) are engine-agnostic.
    "f_variant_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_dbl,
        |  json_extract_string(props, '$.missing') AS absent
        |FROM events ORDER BY event_id""".stripMargin,

    "f14_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
        |  json_extract_string(props, '$.k') AS k_raw
        |FROM events ORDER BY event_id""".stripMargin,

    "f16_flatten" ->
      """SELECT l_orderkey, l_linenumber, pos, val FROM (
        |  SELECT l_orderkey, l_linenumber, 0 AS pos, l_quantity AS val FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 1, l_discount FROM lineitem
        |  UNION ALL SELECT l_orderkey, l_linenumber, 2, l_tax FROM lineitem) t
        |ORDER BY l_orderkey, l_linenumber, pos, val""".stripMargin,

    "f18_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  round(l_extendedprice, 1) AS price_round1,
        |  l_orderkey % 7 AS key_mod7,
        |  round(abs(l_discount - l_tax), 6) AS disc_tax_gap,
        |  round(sqrt(l_quantity), 6) AS qty_sqrt
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, price_ceil, price_floor,
        |  price_round1, key_mod7, disc_tax_gap, qty_sqrt""".stripMargin,

    "f_regexp" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, '^([A-Za-z]+)#', 1) AS prefix,
        |  CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS INT) AS cust_num,
        |  CAST(len(regexp_replace(c_name, '[^0-9]', '', 'g')) AS INT)
        |    AS n_digits,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        |  regexp_matches(c_name, '00[0-9]{2}$') AS low_tail
        |FROM customer ORDER BY c_custkey""".stripMargin,

    // xor()/~ spellings differ per engine; the semantics are identical
    // two's-complement BIGINT ops.
    "f_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS low_byte,
        |  o_orderkey | 4096 AS with_flag,
        |  xor(o_orderkey, o_orderkey >> 3) AS mixed,
        |  CAST(bit_count(o_orderkey) AS INT) AS popcount,
        |  ~o_orderkey AS inverted
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // `+ 0` folds DuckDB's sign-preserving round to +0.0 (IEEE
    // -0.0 + 0 = +0.0) — mirrors QueryPack.zf on the Spark side.
    "f_signed_zero" ->
      """SELECT o_orderkey,
        |  round((42.0 - o_totalprice) / 1e12, 6) + 0 AS tiny6,
        |  round((42.0 - o_totalprice) / 1e9, 4) + 0 AS tiny4,
        |  round((42.0 - o_totalprice) / 1e7, 2) + 0 AS tiny2
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
