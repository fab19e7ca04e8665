package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators for training-data curation.
  *
  * `DataFrame.sample` draws from a partition-dependent RNG — fine for
  * throwaway estimates, wrong for curation pipelines that must be
  * reproducible across runs, engines, and repartitions. These operators
  * order by a content hash instead: deterministic, engine-portable
  * (md5 is bit-identical in Spark and DuckDB), and still uniform-ish
  * because the hash decorrelates the sample from ingestion order.
  */
object Sampling {

  /** Deterministic stratified sample: the first `nPer` rows per stratum in
    * md5(id) order (id as tiebreak for hash collisions). One shuffle on
    * the stratum key; row_number short-circuits per partition. */
  def stratified(df: DataFrame, stratum: Column, id: Column, nPer: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(md5(id.cast("string")), id)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= nPer)
  }

  /** Deterministic global sample of `n` rows: top-n by md5(id) — a full
    * sort at scale is avoided by Spark's TakeOrderedAndProject (per-
    * partition top-n, then merge on one reducer). */
  def deterministicSample(df: DataFrame, id: Column, n: Int): DataFrame =
    df.withColumn("h", md5(id.cast("string")))
      .orderBy(col("h"), id).limit(n).drop("h")
}
