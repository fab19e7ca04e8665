package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE handles skewed sort-merge JOINs
  * automatically; these cover the cases it doesn't — hot-key
  * aggregations — via the classic two-phase salted aggregate.
  */
object Skew {

  /** Two-phase salted count/sum aggregate: partial-aggregate on
    * (key, salt) spreads a hot key over `saltBuckets` reducers, then the
    * final aggregate combines the partials. Semantically identical to a
    * direct groupBy (ScalaTest-verified); worth the extra exchange only
    * when single keys dominate partitions.
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      saltBuckets: Int): DataFrame = {
    val salted = df.select(key.as("k"), value.as("v"),
      (monotonically_increasing_id() % saltBuckets).as("salt"))
    salted
      .groupBy(col("k"), col("salt"))
      .agg(sum(col("v")).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_n")).as("n"))
  }
}
