package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries and their DuckDB oracles live in one `QueryPack` per SURVEY §2
  * operator family; this object only assembles them.
  */
object SparkEntry {

  private def packs: Seq[QueryPack] =
    Seq(Scans, Joins, Aggregates, Windows, Scalars, EventsOps, Extras, LayoutPack,
      graft.ml.MlPack, graft.ml.QualityPack, graft.ml.ClusterPack)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Read → broadcast star join → agg → sort: the full lifecycle slice
    * (SURVEY §7.2).
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val sup = broadcast(Tables.supplier(spark, d))
    val nat = broadcast(Tables.nation(spark, d))
    val reg = broadcast(Tables.region(spark, d))
    li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(nat, sup("s_nationkey") === nat("n_nationkey"))
      .join(reg, nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"), col("l_returnflag"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("l_returnflag"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
