package graft.ml

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline trainer that (re)generates [[ResidualTable]] — the committed
  * residual-IVF quantizer. Training data is the sf0.001 `embeddings`
  * fixture corpus (query ids 0-7 excluded, exactly as the scoring path
  * excludes them); the L2 Lloyd coarse quantizer and the residual sample
  * codebook come from the SAME [[Similarity]] internals the spec-tested
  * trained tier uses, then every coordinate is rounded to fixed-point
  * (×1e6 longs). Fixed-point freezing is the cross-engine determinism
  * contract: both Spark and DuckDB reconstruct the coordinate as
  * fix / 1e6 (an exact-integer by exact-power division, identical in
  * IEEE754), so the committed table IS the quantizer, bit-for-bit, in
  * both engines.
  *
  * Run: `sbt "runMain graft.ml.ResidualFreeze /root/testdata/sf0.001"`
  * and paste stdout into ResidualTable.scala. MlSpec re-runs this
  * training on the fixture and asserts it reproduces the committed
  * table value-for-value (the BpeTable trainer-parity precedent), so
  * the artifact cannot silently drift from its documented provenance.
  */
object ResidualFreeze {

  private val QueryVecIds: Seq[Long] = 0L to 7L

  /** (lid -> fixed-point centroid, (sub, cid) -> fixed-point codeword)
    * trained from `sfDir`'s embeddings with [[ResidualTable]]'s
    * hyperparameters. */
  def train(spark: SparkSession, sfDir: String)
      : (Seq[(Long, Seq[Long])], Seq[((Int, Int), Seq[Long])]) = {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val (assigned, centroids) = Similarity.residualParts(
      emb, QueryVecIds, ResidualTable.nlist, ResidualTable.coarseIters)
    val codebook = Similarity.residualCodebook(
      assigned, ResidualTable.m, ResidualTable.ksub, ResidualTable.dim)
    def fix(xs: Seq[Double]): Seq[Long] = xs.map(x => math.round(x * 1e6))
    val cent = centroids.select(col("lid"), col("lv"))
      .collect()
      .map(r => r.getLong(0) -> fix(r.getSeq[Double](1)))
      .sortBy(_._1).toSeq
    val cw = codebook.select(col("sub"), col("cid"), col("cv"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> fix(r.getSeq[Double](2)))
      .sortBy(_._1).toSeq
    (cent, cw)
  }

  /** The ResidualTable.scala literal body for the trained tables. */
  def render(cent: Seq[(Long, Seq[Long])],
      cw: Seq[((Int, Int), Seq[Long])]): String = {
    val c = cent.map { case (l, v) =>
      s"    ${l}L -> Vector[Long](${v.mkString(", ")})"
    }.mkString(",\n")
    val k = cw.map { case ((s, cid), v) =>
      s"    ($s, $cid) -> Vector[Long](${v.mkString(", ")})"
    }.mkString(",\n")
    s"""  val centroidsFix: Vector[(Long, Vector[Long])] = Vector(
       |$c)
       |
       |  val codebookFix: Vector[((Int, Int), Vector[Long])] = Vector(
       |$k)""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (cent, cw) = train(spark, sfDir)
    println(render(cent, cw))
    spark.stop()
  }
}
