package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Bit-exact parity of the r16 codegen vector kernels ([[L2Sq]],
  * [[DotSeq]]) against the interpreted `aggregate(zip_with(...))` HOF
  * spellings they replaced in [[graft.ml.Similarity]]'s PQ tier.
  *
  * The claim under test is the optimization round's correctness
  * contract: the DuckDB oracles for every PQ-family scored query were
  * written against the HOF spelling's sequential left-fold, so the
  * kernel must reproduce it BIT-identically — same element order, same
  * per-element IEEE form, same null/length-mismatch propagation, same
  * empty-array seed. `===` on Double columns would hide a sign-of-zero
  * or NaN divergence, so rows are compared via
  * `java.lang.Double.doubleToRawLongBits` where non-null.
  */
class VecMathParitySpec extends SparkSpecBase {

  private val vecSchema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("va", ArrayType(DoubleType, containsNull = true), nullable = true),
    StructField("vb", ArrayType(DoubleType, containsNull = true), nullable = true)))

  private lazy val vectors: DataFrame = {
    def v(seed: Int, dim: Int): Seq[java.lang.Double] =
      (0 until dim).map(i => java.lang.Double.valueOf(
        math.sin(seed * 31.0 + i) * (if (i % 7 == 0) -1 else 1) *
          math.pow(10.0, (i % 5) - 2)))
    val rows: Seq[Row] = Seq(
      Row(1, v(1, 64), v(2, 64)),
      Row(2, v(3, 64), v(3, 64)), // identical vectors (L2 = 0)
      Row(3, Seq.fill(64)(java.lang.Double.valueOf(0.0)), v(4, 64)),
      Row(4, v(5, 64).updated(7, null), v(6, 64)), // null element
      Row(5, v(7, 64), v(8, 64).take(32)), // length mismatch
      Row(6, null, v(9, 64)), // null array
      Row(7, v(10, 64).updated(0, java.lang.Double.valueOf(-0.0)), v(10, 64)),
      Row(8, Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]), // fold seed
      Row(9, v(11, 8), v(12, 8)), // dsub-sized subvectors (the PQ shape)
      Row(10, v(13, 8).updated(3, java.lang.Double.valueOf(Double.NaN)),
        v(14, 8))) // NaN propagates identically through both spellings
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), vecSchema)
      .localCheckpoint()
  }

  private def bits(df: DataFrame): Seq[(Int, Option[Long])] =
    df.collect().toSeq.map(r => (r.getInt(0),
      if (r.isNullAt(1)) None
      else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(1)))))

  test("L2Sq is bit-identical to aggregate(zip_with((x-y)^2)) everywhere") {
    val hof = bits(vectors.select(col("id"),
      aggregate(zip_with(col("va"), col("vb"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)).orderBy(col("id")))
    val gen = bits(vectors.select(col("id"),
      L2Sq.l2sq(col("va"), col("vb"))).orderBy(col("id")))
    assert(gen == hof, s"L2Sq diverged from the HOF spelling:\n " +
      s"hof=$hof\n gen=$gen")
    // the null cases must actually BE null (not accidentally absent)
    assert(gen.collect { case (id, None) => id } == Seq(4, 5, 6))
  }

  test("DotSeq is bit-identical to aggregate(zip_with(x*y)) everywhere") {
    val hof = bits(vectors.select(col("id"),
      aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).orderBy(col("id")))
    val gen = bits(vectors.select(col("id"),
      DotSeq.dot(col("va"), col("vb"))).orderBy(col("id")))
    assert(gen == hof, s"DotSeq diverged from the HOF spelling:\n " +
      s"hof=$hof\n gen=$gen")
    assert(gen.collect { case (id, None) => id } == Seq(4, 5, 6))
  }
}
