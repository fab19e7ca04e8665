package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

/** The signed-zero convention behind every rounded oracle double
  * (QueryPack.zf / r2 / r4 / r6): the driver hash-compares BITS, and
  * DuckDB's sign-preserving round emits -0.0 where Spark's BigDecimal
  * Round emits +0.0 — equal under ==, different under hash (the class
  * that shipped agg_regression red in r8). The Spark spelling folds via
  * zf; the oracle spelling appends `+ 0`; this spec pins the Spark half
  * on the boundary values and the bit-exact selfcheck
  * (tools/selfcheck.py) pins the DuckDB half every round.
  */
class QueryPackSpec extends SparkSpecBase {

  private def bitsOf(values: Seq[Double],
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Seq[Long] = {
    // drive the literals through a real plan (codegen'd projection),
    // not scala-side math
    val df = spark.createDataFrame(
      values.map(v => Tuple1(v))).toDF("x")
    df.select(f(col("x")).as("y")).collect()
      .map(r => java.lang.Double.doubleToRawLongBits(r.getDouble(0))).toSeq
  }

  private val PlusZeroBits = java.lang.Double.doubleToRawLongBits(0.0)

  test("zf folds -0.0 to +0.0 and is bit-identity everywhere else") {
    val boundary = Seq(-0.0, 0.0, -1e-300, 1e-300, -0.49e-6, 0.49e-6,
      -1.5, 1.5, Double.MinPositiveValue, -Double.MinPositiveValue)
    val folded = bitsOf(boundary, QueryPack.zf)
    val raw = boundary.map(java.lang.Double.doubleToRawLongBits)
    boundary.indices.foreach { i =>
      if (boundary(i) == 0.0)
        assert(folded(i) == PlusZeroBits,
          s"zf(${boundary(i)}) must be +0.0 bits")
      else assert(folded(i) == raw(i),
        s"zf must not perturb ${boundary(i)}")
    }
  }

  test("r6 boundary sweep: tiny negatives land on +0.0 bits, " +
      "near-half-ulp magnitudes round identically to the folded oracle") {
    // every input whose 6-decimal round is zero must produce +0.0 BITS
    val tinies = Seq(-4.9e-7, -1e-9, -1e-300, 4.9e-7, 1e-9,
      -Double.MinPositiveValue)
    bitsOf(tinies, QueryPack.r6).foreach(b =>
      assert(b == PlusZeroBits, "rounded-to-zero value must be +0.0 bits"))
    // exact .5-boundary magnitudes: both engines round half away from
    // zero (NOTES §4), so ±5e-7 must escape zero with the sign kept
    val halves = bitsOf(Seq(5e-7, -5e-7), QueryPack.r6)
    assert(halves(0) == java.lang.Double.doubleToRawLongBits(1e-6))
    assert(halves(1) == java.lang.Double.doubleToRawLongBits(-1e-6))
  }

  test("r2/r4 share the fold") {
    assert(bitsOf(Seq(-1e-3), QueryPack.r2).head == PlusZeroBits)
    assert(bitsOf(Seq(-1e-5), QueryPack.r4).head == PlusZeroBits)
  }
}
