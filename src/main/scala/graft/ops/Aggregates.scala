package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import QueryPack._

/** Aggregation family — SURVEY.md §2.4/§2.8: the reference's count/max/
  * distinct/set-algebra operators (A1-A8, app.js:342-479) plus the GROUP BY
  * machinery it delegates to MySQL: hash aggregation, rollup/cube/grouping
  * sets, having, stats aggs, approx-distinct.
  *
  * Scale notes: every groupBy here has map-side partial aggregation (Spark
  * HashAggregate partial → shuffle on group keys → final); group-key
  * cardinality is bounded (flags, segments, nations, custkeys), so the
  * shuffle carries pre-aggregated rows, not the fact table. A7's last-wins
  * map merge is expressed as max_by per key — distributed, no
  * collect-to-driver fold.
  */
object Aggregates extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1-ish + TPC-H Q1: the canonical multi-agg groupBy.
    "q1_agg" -> ((s, d) => {
      // Decimal-exact sums; averages derived from them so both engines
      // divide bit-identical doubles (see QueryPack.decMoney).
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2000-12-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(decMoney(col("l_extendedprice"))).as("s_base"),
          sum(decMoney(col("l_extendedprice")) * (lit(1) - decRate(col("l_discount")))).as("s_disc"),
          sum(decMoney(col("l_extendedprice")) * (lit(1) - decRate(col("l_discount")))
            * (lit(1) + decRate(col("l_tax")))).as("s_charge"),
          sum(decRate(col("l_discount"))).as("s_d"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"),
          moneyRound(col("s_base")).as("sum_base_price"),
          moneyRound(col("s_disc")).as("sum_disc_price"),
          moneyRound(col("s_charge")).as("sum_charge"),
          r4(col("sum_qty") / col("count_order")).as("avg_qty"),
          r4(col("s_base").cast("double") / col("count_order")).as("avg_price"),
          r4(col("s_d").cast("double") / col("count_order")).as("avg_disc"),
          col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // A2: global min/max (the reference's sort+pop max, app.js:342).
    "a2_minmax" -> ((s, d) => {
      Tables.part(s, d).agg(
        max(col("p_retailprice")).as("max_price"),
        min(col("p_retailprice")).as("min_price"),
        max(col("p_size")).as("max_size"),
        min(col("p_size")).as("min_size"))
    }),

    // A3: DISTINCT (dedup of URL lists, app.js:477-478).
    "a3_distinct" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_mktsegment")).distinct()
        .orderBy(col("c_mktsegment"))
    }),

    // A4: union-distinct of two key sets (app.js:406-416).
    "a4_union_distinct" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("k"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
        .distinct()
        .orderBy(col("k"))
    }),

    // A5: EXCEPT — keys present in one set and not the other (app.js:408).
    "a5_except_keys" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("k"))
        .except(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
        .orderBy(col("k"))
    }),

    // Intersect — the complement the reference never wrote (SURVEY §2.8).
    "set_intersect" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("k"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
        .orderBy(col("k"))
    }),

    // Multiset EXCEPT ALL — the bag-semantics complement of A5 that the
    // distinct-set rows deliberately don't cover (COVERAGE §2.8):
    // multiplicity max(m - n, 0) per key. Spark plans exceptAll as a
    // +1/-1 counted aggregate + replicate-rows generate — one hash
    // shuffle on the key, no sort, partial aggregation intact — so a
    // hot key collapses map-side exactly like any groupBy. Collapsed to
    // (k, n) so the surviving multiplicities are the scored artifact.
    "set_except_all" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("k"))
        .exceptAll(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    }),

    // Multiset INTERSECT ALL: multiplicity min(m, n) per key.
    "set_intersect_all" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_nationkey").as("k"))
        .intersectAll(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .orderBy(col("k"))
    }),

    // Boolean/conditional aggregate pack — the §2.4 family rows Spark
    // ships as first-class aggregates: count_if (filtered count without
    // a CASE), bool_and/bool_or (universal/existential per group), and
    // min_by/max_by over a (price, key) struct so ties break on the key
    // — the same total-order discipline as agg_mode, replayed in the
    // oracle via row_number. All partial-aggregating hash aggregates on
    // one group-key exchange.
    "agg_bool_pack" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(count_if(col("o_totalprice") > 100000).as("n_big"),
          bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
          bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"),
          min_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey")))
            .as("cheapest_key"),
          max_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey")))
            .as("priciest_key"))
        .orderBy(col("o_orderstatus"))
    }),

    // A6: union-all (frontier accumulation, app.js:181) — no dedup.
    "a6_union_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_totalprice") > 100000)
        .select(col("o_orderkey").as("k"), lit("high").as("src"))
        .union(o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("k"), lit("urgent").as("src")))
        .orderBy(col("k"), col("src"))
    }),

    // A7: merge_array_object — last-wins map merge with trailing-underscore
    // key trim (app.js:100), distributed as trim → groupBy key → max_by.
    // Built on orders because o_orderkey IS unique ("last" must be total).
    "a7_map_merge" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          regexp_replace(
            concat(lit("o_"), col("o_orderstatus"), lit("_"), col("o_orderpriority"), lit("__")),
            "_+$", "").as("spec_key"),
          col("o_custkey").cast("string").as("v"),
          col("o_orderkey").as("ord"))
        .groupBy(col("spec_key"))
        .agg(max_by(col("v"), col("ord")).as("spec_value"))
        .orderBy(col("spec_key"))
    }),

    // A8: per-table row counts (progress counters, app.js:508,532).
    "a8_counts" -> ((s, d) => {
      def cnt(name: String) =
        Tables(s, d, name).agg(count(lit(1)).as("n")).select(lit(name).as("tbl"), col("n"))
      Seq("customer", "lineitem", "nation", "orders", "part", "region", "supplier")
        .map(cnt).reduce(_ union _)
        .orderBy(col("tbl"))
    }),

    // HAVING — post-aggregation predicate.
    "agg_having" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          moneyRound(sum(decMoney(col("o_totalprice")))).as("total"))
        .filter(col("n_orders") > 5)
        .orderBy(col("o_custkey"))
    }),

    // ROLLUP — hierarchical subtotals (null group keys coalesced to 'ALL'
    // so the ordering is engine-independent).
    "agg_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("returnflag"), col("linestatus"))
    }),

    // CUBE — all grouping combinations.
    "agg_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(moneyRound(sum(decMoney(col("o_totalprice")))).as("total"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("total"), col("n"))
        .orderBy(col("status"), col("priority"))
    }),

    // GROUPING SETS via the SQL API (DSL has no direct form). Temp view
    // name is per-invocation (QueryPack.freshView) — a fixed name races
    // under a shared session, the exact hazard Extras' subquery views
    // already guard against.
    "agg_grouping_sets" -> ((s, d) => {
      val v = QueryPack.freshView("graft_li_gs")
      Tables.lineitem(s, d).createOrReplaceTempView(v)
      s.sql(
        s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           |  coalesce(l_linestatus, 'ALL') AS linestatus,
           |  sum(l_quantity) AS sum_qty, count(*) AS n
           |FROM $v
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           |ORDER BY returnflag, linestatus""".stripMargin)
    }),

    // Stats aggregates per group. avg/stddev are derived from decimal-exact
    // sum and sum-of-squares so both engines do identical IEEE double ops
    // (sum-of-squares formula as a determinism shim for the oracle diff;
    // the data is far from the cancellation regime).
    "agg_stats" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(decMoney(col("c_acctbal"))).as("s1"),
          sum(decMoney(col("c_acctbal")) * decMoney(col("c_acctbal"))).as("s2"),
          max(col("c_acctbal")).as("max_bal"),
          min(col("c_acctbal")).as("min_bal"),
          count(lit(1)).as("n"))
        .select(col("c_mktsegment"),
          r4(col("s1").cast("double") / col("n")).as("avg_bal"),
          r4(sqrt((col("s2").cast("double")
            - col("s1").cast("double") * col("s1").cast("double") / col("n"))
            / (col("n") - 1))).as("sd_bal"),
          col("max_bal"), col("min_bal"), col("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // Approx-distinct (HLL++). DuckDB's sketch differs, so the approx
    // VALUES can't be oracled — instead the row carries the exact
    // distinct counts (oracled) plus booleans asserting the HLL estimate
    // landed within ±5% of exact (rsd=0.01 → a 5-sigma bound; the oracle
    // expects TRUE). ScalaTest additionally checks the raw estimates.
    // Sketch quantiles next to their exact values (same pattern as
    // agg_approx_distinct): the oracle pins the exact columns, the
    // bounded-error flags assert the sketch stayed within tolerance.
    // At 100 TB approx_percentile is the only viable form — constant
    // sketch state vs a global sort.
    "agg_approx_percentile" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_exact"),
          round(expr("percentile(l_quantity, 0.95)"), 6).as("p95_exact"),
          expr("approx_percentile(l_quantity, 0.5, 1000)").as("ap50"),
          expr("approx_percentile(l_quantity, 0.95, 1000)").as("ap95"))
        .select(col("p50_exact"), col("p95_exact"),
          (abs(col("ap50") - col("p50_exact")) <= lit(1.0)).as("approx_p50_ok"),
          (abs(col("ap95") - col("p95_exact")) <= lit(1.0)).as("approx_p95_ok"))
    }),

    "agg_approx_distinct" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
        .select(col("n_parts"), col("n_orders"),
          (abs(col("ap") - col("n_parts"))
            <= col("n_parts").cast("double") * 0.05).as("approx_parts_ok"),
          (abs(col("ao") - col("n_orders"))
            <= col("n_orders").cast("double") * 0.05).as("approx_orders_ok"))
    }),

    // Two-phase salted aggregation (hot-key mitigation): semantically
    // identical to a direct GROUP BY — which is exactly what the oracle
    // runs. l_quantity is integral-valued, so double sums are exact and
    // partial-sum order can't perturb the result.
    "agg_salted_sum" -> ((s, d) => {
      Skew.saltedSumCount(Tables.lineitem(s, d),
          col("l_orderkey"), col("l_quantity"), saltBuckets = 16)
        .select(col("k").as("l_orderkey"), col("total").as("sum_qty"),
          col("n").as("n_rows"))
        .orderBy(col("l_orderkey"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "agg_approx_percentile" ->
      """SELECT round(quantile_cont(l_quantity, 0.5), 6) AS p50_exact,
        |  round(quantile_cont(l_quantity, 0.95), 6) AS p95_exact,
        |  TRUE AS approx_p50_ok, TRUE AS approx_p95_ok
        |FROM lineitem""".stripMargin,

    "agg_approx_distinct" ->
      """SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |  TRUE AS approx_parts_ok, TRUE AS approx_orders_ok
        |FROM lineitem""".stripMargin,

    "agg_salted_sum" ->
      """SELECT l_orderkey, sum(l_quantity) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "q1_agg" ->
      """WITH g AS (SELECT l_returnflag, l_linestatus,
        |    sum(l_quantity) AS sum_qty,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS s_base,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |        (1 - CAST(l_discount AS DECIMAL(4,2)))) AS s_disc,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |        (1 - CAST(l_discount AS DECIMAL(4,2))) *
        |        (1 + CAST(l_tax AS DECIMAL(4,2)))) AS s_charge,
        |    sum(CAST(l_discount AS DECIMAL(4,2))) AS s_d,
        |    CAST(count(*) AS BIGINT) AS count_order
        |  FROM lineitem
        |  WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |  GROUP BY l_returnflag, l_linestatus)
        |SELECT l_returnflag, l_linestatus, sum_qty,
        |  CAST(round(s_base, 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(s_disc, 2) AS DOUBLE) AS sum_disc_price,
        |  CAST(round(s_charge, 2) AS DOUBLE) AS sum_charge,
        |  round(sum_qty / count_order, 4) AS avg_qty,
        |  round(CAST(s_base AS DOUBLE) / count_order, 4) AS avg_price,
        |  round(CAST(s_d AS DOUBLE) / count_order, 4) AS avg_disc,
        |  count_order
        |FROM g ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "a2_minmax" ->
      """SELECT max(p_retailprice) AS max_price, min(p_retailprice) AS min_price,
        |  max(p_size) AS max_size, min(p_size) AS min_size FROM part""".stripMargin,

    "a3_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",

    "a4_union_distinct" ->
      """SELECT DISTINCT k FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |ORDER BY k""".stripMargin,

    "a5_except_keys" ->
      """SELECT c_nationkey AS k FROM customer
        |EXCEPT SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""".stripMargin,

    "set_intersect" ->
      """SELECT c_nationkey AS k FROM customer
        |INTERSECT SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""".stripMargin,

    "set_except_all" ->
      """SELECT k, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  EXCEPT ALL SELECT s_nationkey AS k FROM supplier)
        |GROUP BY k ORDER BY k""".stripMargin,

    "set_intersect_all" ->
      """SELECT k, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  INTERSECT ALL SELECT s_nationkey AS k FROM supplier)
        |GROUP BY k ORDER BY k""".stripMargin,

    // min_by/max_by replay: row_number with the identical struct total
    // order ((price, key) ASC for min, DESC for max).
    "agg_bool_pack" ->
      """WITH r AS (SELECT o_orderstatus, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice, o_orderkey) AS rn_min,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max
        |  FROM orders),
        |a AS (SELECT o_orderstatus,
        |    CAST(count(*) FILTER (o_totalprice > 100000) AS BIGINT) AS n_big,
        |    bool_and(o_totalprice > 1000) AS all_over_1k,
        |    bool_or(o_orderpriority = '1-URGENT') AS any_urgent
        |  FROM orders GROUP BY 1)
        |SELECT a.o_orderstatus, n_big, all_over_1k, any_urgent,
        |  mn.o_orderkey AS cheapest_key, mx.o_orderkey AS priciest_key
        |FROM a
        |  JOIN r mn ON a.o_orderstatus = mn.o_orderstatus AND mn.rn_min = 1
        |  JOIN r mx ON a.o_orderstatus = mx.o_orderstatus AND mx.rn_max = 1
        |ORDER BY a.o_orderstatus""".stripMargin,

    "a6_union_all" ->
      """SELECT o_orderkey AS k, 'high' AS src FROM orders WHERE o_totalprice > 100000
        |UNION ALL
        |SELECT o_orderkey AS k, 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY k, src""".stripMargin,

    "a7_map_merge" ->
      """SELECT regexp_replace('o_' || o_orderstatus || '_' || o_orderpriority || '__',
        |         '_+$', '', 'g') AS spec_key,
        |  arg_max(CAST(o_custkey AS VARCHAR), o_orderkey) AS spec_value
        |FROM orders GROUP BY 1 ORDER BY spec_key""".stripMargin,

    "a8_counts" ->
      """SELECT 'customer' AS tbl, CAST(count(*) AS BIGINT) AS n FROM customer
        |UNION ALL SELECT 'lineitem', count(*) FROM lineitem
        |UNION ALL SELECT 'nation', count(*) FROM nation
        |UNION ALL SELECT 'orders', count(*) FROM orders
        |UNION ALL SELECT 'part', count(*) FROM part
        |UNION ALL SELECT 'region', count(*) FROM region
        |UNION ALL SELECT 'supplier', count(*) FROM supplier
        |ORDER BY tbl""".stripMargin,

    "agg_having" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) > 5
        |ORDER BY o_custkey""".stripMargin,

    "agg_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  sum(l_quantity) AS sum_qty, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "agg_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  sum(l_quantity) AS sum_qty, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin,

    "agg_stats" ->
      """WITH g AS (SELECT c_mktsegment,
        |    sum(CAST(c_acctbal AS DECIMAL(12,2))) AS s1,
        |    sum(CAST(c_acctbal AS DECIMAL(12,2)) *
        |        CAST(c_acctbal AS DECIMAL(12,2))) AS s2,
        |    max(c_acctbal) AS max_bal, min(c_acctbal) AS min_bal,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM customer GROUP BY c_mktsegment)
        |SELECT c_mktsegment,
        |  round(CAST(s1 AS DOUBLE) / n, 4) + 0 AS avg_bal,
        |  round(sqrt((CAST(s2 AS DOUBLE)
        |    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)), 4) AS sd_bal,
        |  max_bal, min_bal, n
        |FROM g ORDER BY c_mktsegment""".stripMargin
  )
}
