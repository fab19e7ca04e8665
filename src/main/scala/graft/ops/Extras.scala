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

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Scalar subquery: orders above the (decimal-exact) global average.
    "sub_scalar" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_ss")
      s.sql(
        """SELECT o_orderkey, o_totalprice FROM graft_orders_ss
          |WHERE o_totalprice > (
          |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
          |         / count(*) FROM graft_orders_ss)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // Correlated subquery: customers with more than 8 orders, written as
    // a correlated COUNT (Catalyst decorrelates to an aggregate + join).
    "sub_correlated" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_sc")
      Tables.customer(s, d).createOrReplaceTempView("graft_customer_sc")
      s.sql(
        """SELECT c_custkey, c_name FROM graft_customer_sc c
          |WHERE (SELECT count(*) FROM graft_orders_sc o
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

    "unpivot_melt" ->
      """SELECT p_partkey, attr, val FROM (
        |  SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice', p_retailprice FROM part) t
        |ORDER BY p_partkey, attr""".stripMargin
  )
}
