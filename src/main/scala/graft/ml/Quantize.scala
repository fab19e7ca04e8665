package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of the embedding corpus — the memory-compression
  * step an ANN index applies before serving (4x smaller vectors, distance
  * computed on int8 with a per-dimension affine de-quantizer).
  *
  * Scale shape: the per-dimension (lo, hi) calibration table is a
  * dim-row aggregate (64-1024 rows regardless of corpus size) joined back
  * by broadcast — the corpus itself is never shuffled for calibration.
  * The only full shuffle is the final per-vector aggregation, and its sums
  * run in FIXED POINT (squared error quantized to 1e-12 longs) so the
  * result is exact and independent of partial-aggregation order — the same
  * determinism device as [[Clustering]] centroid averaging, and what makes
  * a bit-exact DuckDB oracle possible.
  */
object Quantize {

  /** Per-vector quantization report: dimension count, reconstruction MSE
    * (from the exact fixed-point SSE), and the squared L2 norm of the
    * quantized int8 vector (exact long arithmetic).
    *
    * Quantizer: q = round((x - lo) / (hi - lo) * 254 - 127) in [-127, 127];
    * constant dimensions (hi == lo) map to q = 0 and reconstruct exactly.
    */
  def int8Stats(emb: DataFrame): DataFrame = {
    val dims = emb
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("d", "x")))
    val ranges = dims.groupBy(col("d"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val scaled: Column = (col("x") - col("lo")) / (col("hi") - col("lo"))
    dims.join(broadcast(ranges), "d")
      .withColumn("q",
        when(col("hi") === col("lo"), lit(0))
          .otherwise(round(scaled * lit(254.0) - lit(127.0)).cast("int")))
      .withColumn("xr",
        col("lo") + (col("q") + lit(127)).cast("double") / lit(254.0) *
          (col("hi") - col("lo")))
      .withColumn("err_fp",
        round(pow(col("x") - col("xr"), 2) * lit(1e12)).cast("long"))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dims"),
        sum(col("err_fp")).as("sse_fp"),
        sum(col("q").cast("long") * col("q")).as("qnorm2"))
      .select(col("vec_id"), col("n_dims"),
        round(col("sse_fp").cast("double") / lit(1e12) / col("n_dims"), 9)
          .as("mse"),
        col("qnorm2"))
  }

  /** Per-dimension corpus statistics — mean, population variance, and
    * the variance RANK (r14): the principled dimension-selection signal
    * for the truncated-retrieval tier. Prefix truncation
    * (`ns_embedding_truncate`, the MRL convention) assumes the encoder
    * front-loaded information into the leading dimensions; this is the
    * statistic that VERIFIES that assumption on an actual corpus (high
    * var_rank concentrated at low d) or tells a pipeline to select
    * dimensions by rank instead.
    *
    * Determinism (the zipfSlope device): per-dimension sums are ×1e6
    * fixed-point longs (exact under any partitioning), Σx² rides
    * DECIMAL(38,0) (a per-row long square is exact, the corpus-sized
    * SUM of squares is not long-safe), the variance assembles as
    * (n·Σxx − Sx²) in decimal and finishes with ONE IEEE division
    * mirrored token-for-token; ranks order by the already-ROUNDED
    * variance (ties to d) so no ulp can flip a rank.
    *
    * Scale shape: ONE shuffle of (d) fixed-point partials — map-side
    * combine collapses every partition to |dims| rows regardless of
    * corpus size; the rank window runs on the dim-sized aggregate. */
  def dimVariance(emb: DataFrame): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def dec(c: Column): Column = c.cast(dec38)
    val dx = emb.select(
      posexplode(col("embedding").cast("array<double>")).as(Seq("d", "x")))
    val fp = round(col("x") * lit(1e6)).cast("long")
    val s = dx.groupBy(col("d")).agg(count(lit(1)).as("n"),
      sum(fp).as("sx"), sum(dec(fp * fp)).as("sxx"))
    val num = dec(col("n")) * col("sxx") - dec(col("sx")) * dec(col("sx"))
    val v = s.select(col("d").cast("int").as("d"), col("n"),
      graft.ops.QueryPack.r6(
        col("sx").cast("double") / (lit(1e6) * col("n"))).as("mean"),
      graft.ops.QueryPack.r6(num.cast("double") /
        (col("n").cast("double") * col("n") * lit(1e12))).as("variance"))
    v.withColumn("var_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("variance").desc, col("d"))).cast("int"))
      .orderBy(col("d"))
  }
}
