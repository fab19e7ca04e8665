package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import QueryPack._

/** Join family — SURVEY.md §2.3: the reference's three join semantics (J1
  * anti-join resume diff app.js:457-482, J2 part-table reassembly equi-join
  * app.js:422-433, J3 positional zip app.js:626-627) plus the standard join
  * families the reference delegates to MySQL (inner/left/full/semi,
  * broadcast star, range/theta, as-of).
  *
  * Scale notes: dimension sides are `broadcast()` where small (nation,
  * region, supplier, bucket literals); the as-of join is expressed as a
  * union + running `last(ignoreNulls)` window, which shuffles each side
  * once on (user) and never materializes a cross product — the plan a
  * 1000-executor cluster wants, vs. the naive per-row subquery.
  */
object Joins extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1: resume anti-join — URLs-not-yet-saved semantic (app.js:479).
    "j1_anti_resume" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val source = orders.select(col("o_orderkey"))
      val saved = orders.filter(col("o_orderstatus") =!= "O").select(col("o_orderkey"))
      source.join(saved, Seq("o_orderkey"), "left_anti").orderBy(col("o_orderkey"))
    }),

    // J2: base ⋈ part reassembly — the `_pN` wide-record chunking made into
    // an explicit equi-join view (app.js:422-433). Columnar storage makes
    // the chunking itself a no-op; the compat view remains.
    "j2_reassembly" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val base = c.select(col("c_custkey").as("id"), col("c_name"), col("c_nationkey"))
      val p1 = c.select(col("c_custkey").as("parent_id"), col("c_acctbal"), col("c_mktsegment"))
      base.join(p1, col("id") === col("parent_id"), "left")
        .select(col("id"), col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
        .orderBy(col("id"))
    }),

    // J3: positional zip of parallel key/value arrays (app.js:626-627):
    // build the arrays per order, zip them, explode back. Round-trips the
    // original rows, proving arrays_zip/explode match the JS zip contract.
    "j3_zip_positional" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(col("l_linenumber"), col("l_quantity")))).as("rows"))
        .select(col("l_orderkey"),
          explode(arrays_zip(
            transform(col("rows"), r => r.getField("l_linenumber")),
            transform(col("rows"), r => r.getField("l_quantity")))).as("z"))
        .select(col("l_orderkey"),
          col("z").getField("0").as("l_linenumber"),
          col("z").getField("1").as("l_quantity"))
        // (l_orderkey, l_linenumber) is NOT unique in the test data, so the
        // ordering must include l_quantity to be total across engines.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    // Inner join + agg (TPC-H Q3 shape): building-segment order revenue.
    "join_inner_agg" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val orders = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      cust.join(orders, cust("c_custkey") === orders("o_custkey"))
        .join(li, orders("o_orderkey") === li("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(moneyRound(sum(decMoney(col("l_extendedprice")) * (lit(1) - decRate(col("l_discount"))))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderkey"))
    }),

    // Left outer: every nation keeps a row even with zero customers.
    "join_left_outer" -> ((s, d) => {
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      n.join(c, n("n_nationkey") === c("c_nationkey"), "left")
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(count(col("c_custkey")).as("n_customers"))
        .orderBy(col("n_nationkey"))
    }),

    // Full outer on per-nation aggregates of two independent sides.
    "join_full_outer" -> ((s, d) => {
      val cAgg = Tables.customer(s, d).groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("nc"))
      val sAgg = Tables.supplier(s, d).groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("ns"))
      cAgg.join(sAgg, cAgg("c_nationkey") === sAgg("s_nationkey"), "full")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("nc"), lit(0L)).as("n_customers"),
          coalesce(col("ns"), lit(0L)).as("n_suppliers"))
        .orderBy(col("nationkey"))
    }),

    // Left semi: EXISTS — customers having at least one order.
    "join_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Broadcast star join: fact ⋈ three broadcast dims, revenue per region.
    "join_broadcast_star" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val sup = broadcast(Tables.supplier(s, d))
      val nat = broadcast(Tables.nation(s, d))
      val reg = broadcast(Tables.region(s, d))
      li.join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(nat, sup("s_nationkey") === nat("n_nationkey"))
        .join(reg, nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(moneyRound(sum(decMoney(col("l_extendedprice")) * (lit(1) - decRate(col("l_discount"))))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"))
    }),

    // Range/theta join: parts binned into literal size buckets.
    "join_range_bucket" -> ((s, d) => {
      import s.implicits._
      val buckets = broadcast(Seq(("small", 1, 9), ("medium", 10, 24), ("large", 25, 50))
        .toDF("bucket", "lo", "hi"))
      Tables.part(s, d)
        .join(buckets, col("p_size") >= col("lo") && col("p_size") <= col("hi"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_parts"),
          sum(decMoney(col("p_retailprice"))).as("s_price"))
        .select(col("bucket"), col("n_parts"),
          round(col("s_price").cast("double") / col("n_parts"), 2).as("avg_price"))
        .orderBy(col("bucket"))
    }),

    // As-of join: for each purchase, the user's latest click at-or-before it.
    // Spark lacks ASOF JOIN; expressed scalably as tagged-union + running
    // last(ignoreNulls) per user — one shuffle, no cross product.
    "join_asof" -> ((s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      // tag 0 = click, 1 = purchase: at equal ts the click sorts first, so
      // "at-or-before" includes it (matches ASOF's >= bound).
      val tagged = clicks.select(col("user_id"), col("ts"), lit(0).as("tag"),
          col("click_id"), lit(null).cast("long").as("event_id"))
        .unionByName(purchases.select(col("user_id"), col("ts"), lit(1).as("tag"),
          lit(null).cast("long").as("click_id"), col("event_id")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("asof_click_id", last(col("click_id"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("user_id"), tsStrUs(col("ts")).as("ts"),
          col("asof_click_id"))
        .orderBy(col("event_id"))
    }),

    // Bloom-pruned semi-join: runtime-filter pattern — broadcast a bloom
    // of the dim keys, prune the fact scan map-side, exact semi-join
    // removes false positives → result equals the plain semi-join.
    "join_bloom_prune" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d).filter(col("s_nationkey") < 5)
      BloomPrune.semiJoin(li, "l_suppkey", sup, "s_suppkey")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_suppkey"))
    })
  )

  override def oracles: Map[String, String] = Map(
    // Plain semi-join oracle is valid: the bloom pass only pre-prunes;
    // the exact semi-join restores set equality (fpp affects cost, not
    // results). sum(l_quantity) sums integral doubles — exact in IEEE.
    "join_bloom_prune" ->
      """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_items,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem
        |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "j1_anti_resume" ->
      """SELECT o_orderkey FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM orders s
        |  WHERE s.o_orderstatus <> 'O' AND s.o_orderkey = o.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "j2_reassembly" ->
      """SELECT b.id, b.c_name, b.c_nationkey, p.c_acctbal, p.c_mktsegment
        |FROM (SELECT c_custkey AS id, c_name, c_nationkey FROM customer) b
        |LEFT JOIN (SELECT c_custkey AS parent_id, c_acctbal, c_mktsegment
        |           FROM customer) p ON b.id = p.parent_id
        |ORDER BY b.id""".stripMargin,

    "j3_zip_positional" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,

    "join_inner_agg" ->
      """SELECT o_orderkey,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "join_left_outer" ->
      """SELECT n_nationkey, n_name, CAST(count(c_custkey) AS BIGINT) AS n_customers
        |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin,

    "join_full_outer" ->
      """WITH ca AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS nc
        |            FROM customer GROUP BY c_nationkey),
        |     sa AS (SELECT s_nationkey, CAST(count(*) AS BIGINT) AS ns
        |            FROM supplier GROUP BY s_nationkey)
        |SELECT COALESCE(ca.c_nationkey, sa.s_nationkey) AS nationkey,
        |  COALESCE(ca.nc, 0) AS n_customers, COALESCE(sa.ns, 0) AS n_suppliers
        |FROM ca FULL OUTER JOIN sa ON ca.c_nationkey = sa.s_nationkey
        |ORDER BY nationkey""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "join_broadcast_star" ->
      """SELECT r_name,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "join_range_bucket" ->
      """SELECT bucket, CAST(count(*) AS BIGINT) AS n_parts,
        |  round(CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
        |    / count(*), 2) AS avg_price
        |FROM part JOIN (VALUES ('small',1,9),('medium',10,24),('large',25,50))
        |  b(bucket, lo, hi) ON p_size >= lo AND p_size <= hi
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "join_asof" ->
      """WITH c AS (SELECT user_id, ts, event_id AS click_id FROM events
        |           WHERE event_type = 'click'),
        |     p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
        |  c.click_id AS asof_click_id
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin
  )
}
