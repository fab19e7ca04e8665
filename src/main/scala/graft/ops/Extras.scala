package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import QueryPack._

/** Completeness extras beyond the reference's literal surface: subqueries
  * (scalar + correlated), pivot, unpivot — standard engine capabilities a
  * reference user would expect to keep (SURVEY §2.3/2.4 "absent" rows).
  */
object Extras extends QueryPack {

  // Unique temp-view names per invocation (shared helper — Aggregates'
  // GROUPING SETS query needs the same discipline): a fixed name would
  // race if two queries (or two concurrent runs of one query) shared a
  // session.
  private def freshView(prefix: String): String = QueryPack.freshView(prefix)

  /** Skewness + excess kurtosis per event_type from EXACT integer power
    * sums: values round to integer units first, both engines cast the
    * identical integers to double and run identically-parenthesized
    * IEEE arithmetic (m2^1.5 spelled m2*sqrt(m2): sqrt is correctly
    * rounded, pow is not). The agg_stats/corr/regression convention
    * extended to the 3rd and 4th moments.
    *
    * Overflow envelope (r16 fixed-point audit — the drift-z class): the
    * per-row POWERS stay in long codegen, exact for |w| ≤ 55,108
    * (⁴√Long.MaxValue; the events value range is ~[0, 600]), but the
    * ACCUMULATORS for the 2nd-4th powers ride DECIMAL(38,0) — a long
    * sum(w⁴) wraps at ~1.0e8 rows per event_type for w ≈ 560 (an ANSI
    * ArithmeticException crash at a few GB of events, far below the
    * design scale; sum(w³) at ~4e10 rows). The DuckDB replay sums the
    * same BIGINT powers into its native HUGEINT; both engines then cast
    * the identical exact integer (≤ ~1e38) to double — correctly
    * rounded and identical on both sides, so parity does not require
    * the sum to stay under 2^53, only the integers to be equal.
    * s1 keeps a long accumulator: |w|·N ≤ 600·N wraps only past
    * ~1.5e16 rows, 4 orders beyond the design point (the linear
    * fixed-point-sum convention). */
  def skewKurt(events: DataFrame): DataFrame = {
    val w = round(col("value")).cast("long")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(w).as("s1"),
        sum((w * w).cast(dec38)).as("s2"),
        sum((w * w * w).cast(dec38)).as("s3"),
        sum((w * w * w * w).cast(dec38)).as("s4"))
      .select(col("event_type"), col("n"), {
        val n = col("n").cast("double")
        val m = col("s1").cast("double") / n
        val m2 = col("s2").cast("double") / n - m * m
        val m3 = col("s3").cast("double") / n -
          lit(3.0) * m * (col("s2").cast("double") / n) +
          lit(2.0) * m * m * m
        val m4 = col("s4").cast("double") / n -
          lit(4.0) * m * (col("s3").cast("double") / n) +
          lit(6.0) * m * m * (col("s2").cast("double") / n) -
          lit(3.0) * m * m * m * m
        struct(r6(m3 / (m2 * sqrt(m2))).as("skewness"),
          r6(m4 / (m2 * m2) - lit(3.0)).as("kurtosis"))
      }.as("mm"))
      .select(col("event_type"), col("n"),
        col("mm.skewness").as("skewness"),
        col("mm.kurtosis").as("kurtosis"))
      .orderBy(col("event_type"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Scalar subquery: orders above the (decimal-exact) global average.
    "sub_scalar" -> ((s, d) => {
      val v = freshView("graft_orders_ss")
      Tables.orders(s, d).createOrReplaceTempView(v)
      s.sql(
        s"""SELECT o_orderkey, o_totalprice FROM $v
           |WHERE o_totalprice > (
           |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
           |         / count(*) FROM $v)
           |ORDER BY o_orderkey""".stripMargin)
    }),

    // Correlated subquery: customers with more than 8 orders, written as
    // a correlated COUNT (Catalyst decorrelates to an aggregate + join).
    "sub_correlated" -> ((s, d) => {
      val vo = freshView("graft_orders_sc")
      val vc = freshView("graft_customer_sc")
      Tables.orders(s, d).createOrReplaceTempView(vo)
      Tables.customer(s, d).createOrReplaceTempView(vc)
      s.sql(
        s"""SELECT c_custkey, c_name FROM $vc c
           |WHERE (SELECT count(*) FROM $vo o
           |       WHERE o.o_custkey = c.c_custkey) > 8
           |ORDER BY c_custkey""".stripMargin)
    }),

    // Pivot: order counts per status with priorities as columns.
    "agg_pivot" -> ((s, d) => {
      val pivoted = Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .pivot(col("o_orderpriority"),
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
      pivoted.select(col("o_orderstatus"),
          coalesce(col("`1-URGENT`"), lit(0L)).as("p_urgent"),
          coalesce(col("`2-HIGH`"), lit(0L)).as("p_high"),
          coalesce(col("`3-MEDIUM`"), lit(0L)).as("p_medium"),
          coalesce(col("`4-NOT SPECIFIED`"), lit(0L)).as("p_notspec"),
          coalesce(col("`5-LOW`"), lit(0L)).as("p_low"))
        .orderBy(col("o_orderstatus"))
    }),

    // Exact percentiles (continuous interpolation) per group.
    "agg_percentile" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(
          r4(expr("percentile(c_acctbal, 0.5)")).as("median_bal"),
          r4(expr("percentile(c_acctbal, 0.9)")).as("p90_bal"),
          count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // Pearson correlation from decimal-exact sums (same determinism shim
    // as agg_stats — both engines derive from bit-identical doubles).
    "agg_corr" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy(col("l_returnflag"))
        .agg(
          sum(decMoney(col("l_extendedprice"))).as("sx"),
          sum(col("l_quantity")).as("sy"),
          sum(decMoney(col("l_extendedprice")) * decMoney(col("l_extendedprice"))).as("sxx"),
          sum(col("l_quantity") * col("l_quantity")).as("syy"),
          // quantity must be decimal too: decimal × double promotes the
          // whole product to double and the sum loses exactness
          sum(decMoney(col("l_extendedprice"))
            * col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(4, 1))).as("sxy"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          r6((col("n") * col("sxy").cast("double") - col("sx").cast("double") * col("sy"))
            / sqrt((col("n") * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double"))
              * (col("n") * col("syy") - col("sy") * col("sy"))))
            .as("corr_price_qty"),
          col("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Least-squares regression aggregates (regr_slope/regr_intercept
    // semantics: qty regressed on price) from the SAME exact decimal
    // sums as agg_corr — the one safe way to oracle regression doubles:
    // both engines convert identical exact rationals to double once and
    // run identically-parenthesized arithmetic from there.
    "agg_regression" -> ((s, d) => {
      val dec41 = org.apache.spark.sql.types.DecimalType(4, 1)
      val num = col("n") * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy")
      val den = col("n") * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")
      Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(
          sum(decMoney(col("l_extendedprice"))).as("sx"),
          sum(col("l_quantity")).as("sy"),
          sum(decMoney(col("l_extendedprice"))
            * decMoney(col("l_extendedprice"))).as("sxx"),
          sum(decMoney(col("l_extendedprice"))
            * col("l_quantity").cast(dec41)).as("sxy"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          r6(num / den).as("slope"),
          r6((col("sy") - (num / den) * col("sx").cast("double")) / col("n"))
            .as("intercept"),
          col("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Count-min sketch (depth 4 × width 64, md5-derived row hashes):
    // the mergeable fixed-size frequency sketch a 100 TB pipeline keeps
    // when exact per-key counts don't fit — cells build in ONE hash
    // aggregate over (row, cell) keys (map-side partials collapse hot
    // keys), probes take the min over rows, and the estimate is
    // provably >= exact (overestimation only). Scored against the exact
    // counts so both the sketch arithmetic AND the invariant are
    // driver-gated; deterministic hashes make the whole build replay in
    // SQL (same md5 convention as ns_split_assign).
    "agg_countmin" -> ((s, d) => {
      val depth = 4
      val width = 64
      // ONE md5 per row, sliced into four disjoint 32-bit row-hashes —
      // 4x less hashing than md5-per-(row, sketch-row), same
      // independence for the min-estimate
      def h(i: Int, m: org.apache.spark.sql.Column) =
        conv(substring(m, 1 + 8 * i, 8), 16, 10).cast("long") % width
      def cellsOf(m: org.apache.spark.sql.Column) =
        array((0 until depth).map(i => h(i, m)): _*)
      val cms = Tables.lineitem(s, d)
        .select(md5(col("l_suppkey").cast("string")).as("m"))
        .select(posexplode(cellsOf(col("m"))).as(Seq("i", "cell")))
        .groupBy(col("i"), col("cell")).agg(count(lit(1)).as("n"))
      Tables.lineitem(s, d).filter(col("l_suppkey") <= 10)
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("exact_n"))
        .select(col("l_suppkey"), col("exact_n"),
          posexplode(cellsOf(md5(col("l_suppkey").cast("string"))))
            .as(Seq("i", "cell")))
        .join(cms, Seq("i", "cell"))
        .groupBy(col("l_suppkey"), col("exact_n"))
        .agg(min(col("n")).as("cms_est"))
        .orderBy(col("l_suppkey"))
    }),

    // HyperLogLog distinct-count sketch, replayed EXACTLY in both
    // engines (vs agg_approx_distinct, which only sanity-bands Spark's
    // built-in HLL++): m=64 registers from the top 6 bits of a 32-bit
    // md5 slice, rho = leading-zero rank of the remaining 26 bits
    // (computed as 27 - bit_length via bin(), no float log), harmonic
    // sum kept in INTEGER fixed point (sum of 2^(27-M_j), max 2^33) so
    // the only double arithmetic is the final alpha*m^2/Z — identical
    // IEEE ops from identical integers. Registers build in one hash
    // aggregate; the register table is 64 rows forever, the mergeable
    // fixed-size distinct sketch of a 100 TB ingest.
    "agg_hyperloglog" -> ((s, d) => {
      val m = 64
      val x = conv(substring(md5(col("l_orderkey").cast("string")), 1, 8),
        16, 10).cast("long")
      val regs = Tables.lineitem(s, d)
        .select(shiftright(x, 26).as("bucket"),
          x.bitwiseAND(lit((1L << 26) - 1)).as("y"))
        .select(col("bucket"),
          (lit(27) - when(col("y") === 0, 0).otherwise(length(bin(col("y")))))
            .as("rho"))
        .groupBy(col("bucket")).agg(max(col("rho")).as("reg"))
      val full = s.range(m).select(col("id").as("bucket"))
        .join(regs, Seq("bucket"), "left")
        .select(coalesce(col("reg"), lit(0)).as("reg"))
      val agg = full.agg(
        sum(expr("cast(shiftleft(1L, 27 - reg) as bigint)")).as("z_fix"),
        count(when(col("reg") === 0, 1)).as("v_zero"))
      val exact = Tables.lineitem(s, d)
        .agg(countDistinct(col("l_orderkey")).as("n_exact"))
      agg.crossJoin(exact)
        .select(col("n_exact"), col("v_zero"), col("z_fix"),
          r4(when(
            lit(0.709 * m * m) / (col("z_fix").cast("double") / lit(134217728.0))
              <= 2.5 * m && col("v_zero") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero").cast("double")))
          .otherwise(
            lit(0.709 * m * m) / (col("z_fix").cast("double") / lit(134217728.0))))
            .as("hll_est"))
    }),

    // Geometric mean via the fixed-point log-sum convention
    // (ns_char_entropy's pattern): per-row ln rounds to 6 decimals in
    // INTEGER space before summing, so a libm last-ulp difference
    // cannot creep into the aggregate; exp at the end runs on an
    // identical double in both engines.
    // Long-sum envelope (r16 audit): |summand| = round(ln(price)·1e6)
    // ≤ 1.4e7, so the per-status accumulator wraps past ~6.5e11 rows —
    // ~9× beyond a 100 TB orders table even if one status held every
    // row. Linear fixed-point sums stay long per the repo convention;
    // revisit only if the design point moves past ~1 PB of orders.
    "agg_geomean" -> ((s, d) => {
      Tables.orders(s, d).groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(round(log(col("o_totalprice")) * 1e6).cast("long")).as("lfix"))
        .select(col("o_orderstatus"), col("n"),
          r4(exp(col("lfix").cast("double") / 1e6 / col("n")))
            .as("geo_mean_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // Skewness + excess kurtosis from EXACT integer power sums — see
    // [[Extras.skewKurt]] for the moments pipeline and its overflow
    // envelope.
    "agg_skew_kurt" -> ((s, d) => skewKurt(Tables.events(s, d))),

    // EXACT distinct counting via mergeable bitmaps (Spark 4 bitmap
    // aggregates): per (group, 32k-bucket) bitmaps OR-merge in partial
    // aggregation — unlike countDistinct, whose exact form must shuffle
    // every distinct value, the bitmap is a fixed-size pre-aggregable
    // state per bucket, the same trick ClickHouse/Doris use for exact
    // distinct at scale. The result EQUALS count(distinct), which is
    // the oracle.
    "agg_bitmap_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"),
          expr("bitmap_bucket_number(l_orderkey)").as("b"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(l_orderkey))")
          .as("bm"))
        .groupBy(col("l_returnflag"))
        .agg(sum(expr("bitmap_count(bm)")).as("n_distinct_orders"))
        .orderBy(col("l_returnflag"))
    }),

    // Deterministic per-group MODE: two partial-aggregating hash
    // aggregates, never a window — (group, value) counts collapse
    // map-side first, then max(struct(n, value)) picks the most
    // frequent value with ties broken to the GREATEST value (struct
    // ordering compares field-by-field), a total order both engines
    // share. The same aggregate carries the group total so the mode's
    // share comes free. At scale this is the only mode plan that
    // survives skew: a value owned by half the corpus collapses to one
    // partial count per map task instead of buffering a window frame.
    "agg_mode" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("o_orderstatus"))
        .agg(max(struct(col("n"), col("o_orderpriority"))).as("m"),
          sum(col("n")).as("n_total"))
        .select(col("o_orderstatus"),
          col("m.o_orderpriority").as("mode_priority"),
          col("m.n").as("n_mode"),
          r6(col("m.n").cast("double") / col("n_total").cast("double"))
            .as("mode_share"))
        .orderBy(col("o_orderstatus"))
    }),

    // String-function family beyond the reference's F-rows.
    "f_string_pack2" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("lpadded"),
          rpad(col("p_type"), 10, ".").as("rpadded"),
          substring_index(col("p_name"), " ", 1).as("first_word"),
          translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
          repeat(col("p_brand"), 2).as("doubled"),
          reverse(col("p_name")).as("reversed"),
          instr(col("p_name"), "wid").as("wid_pos"),
          ascii(col("p_name")).as("first_ascii"))
        .orderBy(col("p_partkey"))
    }),

    // first_value / nth_value window functions.
    "w_first_nth" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
      Tables.orders(s, d)
        .withColumn("first_price", first(col("o_totalprice")).over(w))
        .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(w))
        .select(col("o_custkey"), col("o_orderkey"),
          col("first_price"), col("second_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // explode_outer: empty arrays keep their parent row (null element).
    "explode_outer_nulls" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("arr",
          when(col("o_orderstatus") === "P", array().cast("array<int>"))
            .otherwise(array(lit(1), lit(2))))
        .select(col("o_orderkey"), explode_outer(col("arr")).as("val"))
        .orderBy(col("o_orderkey"), col("val").asc_nulls_first)
    }),

    // Map functions over a constructed map column (the MapType specs
    // surface from SURVEY §1.4): build, extract, size, keys, merge.
    "f_map_ops" -> ((s, d) => {
      Tables.part(s, d)
        .withColumn("m", map(
          lit("brand"), col("p_brand"),
          lit("type"), col("p_type")))
        // last-wins overwrite merge, expressed directly (concat the entry
        // lists, keep each key's last entry, rebuild) — no session-wide
        // mapKeyDedupPolicy mutation leaking into later queries
        .withColumn("m2", map_from_entries(
          graft.functions.ColFns.lastWinsEntries(
            concat(map_entries(col("m")),
              map_entries(map(lit("type"), lower(col("p_type"))))))))
        .select(col("p_partkey"),
          element_at(col("m"), "brand").as("brand_val"),
          size(col("m")).as("m_size"),
          array_join(sort_array(map_keys(col("m2"))), ",").as("m2_keys"),
          element_at(col("m2"), "type").as("type_after_merge"),
          element_at(col("m2"), "missing").as("missing_val"))
        .orderBy(col("p_partkey"))
    }),

    // Unpivot (melt): part's numeric attributes to long form.
    "unpivot_melt" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
          "attr", "val")
        .orderBy(col("p_partkey"), col("attr"))
    })
  )

  override def oracles: Map[String, String] = Map(
    "sub_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |         / count(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "sub_correlated" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE (SELECT count(*) FROM orders o
        |       WHERE o.o_custkey = c.c_custkey) > 8
        |ORDER BY c_custkey""".stripMargin,

    "agg_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p_urgent,
        |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p_high,
        |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p_medium,
        |  CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p_notspec,
        |  CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p_low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "agg_percentile" ->
      """SELECT c_mktsegment,
        |  round(quantile_cont(c_acctbal, 0.5), 4) + 0 AS median_bal,
        |  round(quantile_cont(c_acctbal, 0.9), 4) + 0 AS p90_bal,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "agg_corr" ->
      """WITH g AS (SELECT l_returnflag,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sx,
        |    sum(l_quantity) AS sy,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |        CAST(l_extendedprice AS DECIMAL(12,2))) AS sxx,
        |    sum(l_quantity * l_quantity) AS syy,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |        CAST(l_quantity AS DECIMAL(4,1))) AS sxy,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
        |    / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (n * syy - sy * sy)), 6) + 0 AS corr_price_qty,
        |  n
        |FROM g ORDER BY l_returnflag""".stripMargin,

    "agg_regression" ->
      """WITH g AS (SELECT l_returnflag,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sx,
        |    sum(l_quantity) AS sy,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |        CAST(l_extendedprice AS DECIMAL(12,2))) AS sxx,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |        CAST(l_quantity AS DECIMAL(4,1))) AS sxy,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
        |    / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
        |    6) + 0 AS slope,
        |  round((sy - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
        |    / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |    * CAST(sx AS DOUBLE)) / n, 6) + 0 AS intercept,
        |  n
        |FROM g ORDER BY l_returnflag""".stripMargin,

    // 134217728 = 2^27; 67108863 = 2^26 - 1. No ORDER BY: one row.
    "agg_hyperloglog" ->
      """WITH h AS (SELECT
        |    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::UINTEGER
        |      ::BIGINT AS x
        |  FROM lineitem),
        |b AS (SELECT x // 67108864 AS bucket, x & 67108863 AS y FROM h),
        |r AS (SELECT bucket,
        |    max(27 - CASE WHEN y = 0 THEN 0 ELSE len(bin(y)) END) AS reg
        |  FROM b GROUP BY bucket),
        |fl AS (SELECT coalesce(r.reg, 0) AS reg
        |  FROM (SELECT unnest(range(0, 64)) AS bucket) s
        |  LEFT JOIN r ON r.bucket = s.bucket),
        |agg AS (SELECT
        |    CAST(sum(CAST(1 AS BIGINT) << (27 - reg)) AS BIGINT) AS z_fix,
        |    CAST(count(*) FILTER (reg = 0) AS BIGINT) AS v_zero
        |  FROM fl),
        |ex AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact
        |  FROM lineitem)
        |SELECT n_exact, v_zero, z_fix,
        |  round(CASE WHEN (0.709 * 64 * 64) / (CAST(z_fix AS DOUBLE) / 134217728.0)
        |               <= 2.5 * 64 AND v_zero > 0
        |        THEN 64.0 * ln(64.0 / CAST(v_zero AS DOUBLE))
        |        ELSE (0.709 * 64 * 64) / (CAST(z_fix AS DOUBLE) / 134217728.0)
        |        END, 4) AS hll_est
        |FROM agg CROSS JOIN ex""".stripMargin,

    "agg_geomean" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  round(exp(CAST(sum(CAST(round(ln(o_totalprice) * 1e6) AS BIGINT))
        |                  AS DOUBLE) / 1e6 / count(*)), 4) + 0
        |    AS geo_mean_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // Identically-parenthesized double arithmetic from identical exact
    // integers; kurtosis is EXCESS kurtosis (normal = 0). The 2nd-4th
    // power sums stay in DuckDB's native HUGEINT (mirroring the Spark
    // side's DECIMAL(38,0) accumulators — r16 overflow audit): both
    // engines cast the identical exact integer to double, so parity
    // holds even past 2^53.
    "agg_skew_kurt" ->
      """WITH p AS (SELECT event_type, CAST(round(value, 0) AS BIGINT) AS w
        |  FROM events),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(w) AS BIGINT) AS s1, sum(w*w) AS s2,
        |    sum(w*w*w) AS s3,
        |    sum(w*w*w*w) AS s4
        |  FROM p GROUP BY event_type),
        |m AS (SELECT event_type, n,
        |    CAST(s1 AS DOUBLE) / n AS mu,
        |    CAST(s2 AS DOUBLE) / n AS r2,
        |    CAST(s3 AS DOUBLE) / n AS r3,
        |    CAST(s4 AS DOUBLE) / n AS r4
        |  FROM g),
        |c AS (SELECT event_type, n,
        |    r2 - mu * mu AS m2,
        |    r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
        |    r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
        |      - 3.0 * mu * mu * mu * mu AS m4
        |  FROM m)
        |SELECT event_type, n,
        |  round(m3 / (m2 * sqrt(m2)), 6) + 0 AS skewness,
        |  round(m4 / (m2 * m2) - 3.0, 6) + 0 AS kurtosis
        |FROM c ORDER BY event_type""".stripMargin,

    "agg_bitmap_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct_orders
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_countmin" ->
      """WITH ri AS (SELECT md5(CAST(l_suppkey AS VARCHAR)) AS m FROM lineitem),
        |iv AS (SELECT unnest([0, 1, 2, 3]) AS i),
        |cms AS (SELECT i,
        |    ('0x' || substr(m, 1 + 8 * i, 8))::UINTEGER % 64 AS cell,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM ri CROSS JOIN iv GROUP BY 1, 2),
        |probes AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS exact_n,
        |    md5(CAST(l_suppkey AS VARCHAR)) AS m
        |  FROM lineitem WHERE l_suppkey <= 10 GROUP BY l_suppkey),
        |pe AS (SELECT l_suppkey, exact_n, i,
        |    ('0x' || substr(m, 1 + 8 * i, 8))::UINTEGER % 64 AS cell
        |  FROM probes CROSS JOIN iv)
        |SELECT pe.l_suppkey, pe.exact_n, min(cms.n) AS cms_est
        |FROM pe JOIN cms USING (i, cell)
        |GROUP BY 1, 2 ORDER BY l_suppkey""".stripMargin,

    // Mode replay: the tiebreak (count DESC, then value DESC) mirrors
    // the struct-max ordering exactly; share rounds at 6 like r6.
    "agg_mode" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority),
        |t AS (SELECT o_orderstatus, CAST(sum(n) AS BIGINT) AS n_total
        |  FROM c GROUP BY o_orderstatus),
        |r AS (SELECT o_orderstatus, o_orderpriority, n,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY n DESC, o_orderpriority DESC) AS rn
        |  FROM c)
        |SELECT r.o_orderstatus, o_orderpriority AS mode_priority,
        |  n AS n_mode,
        |  round(CAST(n AS DOUBLE) / n_total, 6) + 0 AS mode_share
        |FROM r JOIN t ON r.o_orderstatus = t.o_orderstatus
        |WHERE rn = 1 ORDER BY r.o_orderstatus""".stripMargin,

    "f_string_pack2" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS lpadded,
        |  rpad(p_type, 10, '.') AS rpadded,
        |  split_part(p_name, ' ', 1) AS first_word,
        |  translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
        |  repeat(p_brand, 2) AS doubled,
        |  reverse(p_name) AS reversed,
        |  CAST(instr(p_name, 'wid') AS INT) AS wid_pos,
        |  CAST(ascii(p_name) AS INT) AS first_ascii
        |FROM part ORDER BY p_partkey""".stripMargin,

    "w_first_nth" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "explode_outer_nulls" ->
      """SELECT o_orderkey, CAST(NULL AS INT) AS val FROM orders
        |  WHERE o_orderstatus = 'P'
        |UNION ALL
        |SELECT o_orderkey, x AS val
        |  FROM orders CROSS JOIN (VALUES (1), (2)) t(x)
        |  WHERE o_orderstatus <> 'P'
        |ORDER BY o_orderkey, val NULLS FIRST""".stripMargin,

    "f_map_ops" ->
      """SELECT p_partkey,
        |  p_brand AS brand_val,
        |  2 AS m_size,
        |  'brand,type' AS m2_keys,
        |  lower(p_type) AS type_after_merge,
        |  CAST(NULL AS VARCHAR) AS missing_val
        |FROM part ORDER BY p_partkey""".stripMargin,

    "unpivot_melt" ->
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice', p_retailprice FROM part) t
        |ORDER BY p_partkey, attr""".stripMargin
  )
}
