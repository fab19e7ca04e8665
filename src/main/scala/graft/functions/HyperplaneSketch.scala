package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane (sign-random-projection) LSH sketch of an
  * `array<double>` vector: bit b of the result is the sign of the dot
  * product with fixed ±1 hyperplane b.
  *
  * A native codegen Expression replacing the earlier formulation of nBits
  * separate `aggregate(zip_with(...))` lambda chains per row — higher-order
  * functions are interpreted per element, which made the sketch the hot
  * spot of every LSH similarity query. This is one tight nBits × dim loop
  * inside whole-stage codegen; because the planes are ±1, the "dot
  * product" needs no multiplications at all (add or subtract each
  * coordinate).
  *
  * Plane generation is the same fixed-seed LCG the HOF version used, so
  * bucket assignments (and therefore recall behavior) are unchanged.
  */
case class HyperplaneSketch(child: Expression, nBits: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if nBits >= 1 && nBits <= 63 && dim >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sketch needs array<double>, 1 <= nBits <= 63, dim >= 1; " +
        s"got ${child.dataType}, nBits=$nBits, dim=$dim")
  }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSketch.compute(input.asInstanceOf[ArrayData], nBits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneSketch.compute($c, $nBits, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSketch =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sketch"
}

object HyperplaneSketch {

  /** Deterministic ±1 hyperplane matrix (nBits × dim) — stored as sign
    * booleans (true = +1). Fixed LCG seed, identical sequence to the
    * original HOF sketch so buckets are stable across versions. */
  private def makePlanes(nBits: Int, dim: Int): Array[Array[Boolean]] = {
    var state = 0x5DEECE66DL
    def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; state }
    Array.fill(nBits, dim) { next() >= 0 }
  }

  // Tiny cache: the engine only ever uses a couple of (nBits, dim) shapes.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Boolean]]]()

  private[functions] def planes(nBits: Int, dim: Int): Array[Array[Boolean]] =
    cache.computeIfAbsent((nBits, dim), { k: (Int, Int) => makePlanes(k._1, k._2) })

  /** The ±1 plane signs (true = +1), exposed so an oracle can replay the
    * exact same sketch pipeline outside Spark (e.g. generated DuckDB SQL
    * embedding the planes as literals). */
  def planeSigns(nBits: Int, dim: Int): Array[Array[Boolean]] =
    planes(nBits, dim).map(_.clone())

  /** Static so generated code calls it directly. */
  def compute(vec: ArrayData, nBits: Int, dim: Int): Long = {
    val p = planes(nBits, dim)
    val n = math.min(dim, vec.numElements())
    var out = 0L
    var b = 0
    while (b < nBits) {
      val plane = p(b)
      var dot = 0.0
      var i = 0
      while (i < n) {
        // a null element contributes 0 to the projection (the total
        // semantics; blind getDouble NPE'd on GenericArrayData-backed
        // inputs — r13 review)
        if (!vec.isNullAt(i)) {
          val x = vec.getDouble(i)
          if (plane(i)) dot += x else dot -= x
        }
        i += 1
      }
      if (dot >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def sketch(v: Column, nBits: Int, dim: Int): Column =
    GraftBridge.column(HyperplaneSketch(GraftBridge.expression(v), nBits, dim))
}

/** Banded sign-random-projection sketch: element b of the result array is
  * the rowsPerBand-bit bucket of band b (planes drawn from the same LCG
  * stream as [[HyperplaneSketch]], band b bit j using plane b*rowsPerBand+j).
  *
  * Banding turns an approximate bucket-equality test into a
  * recall-guaranteed candidate generator: two vectors with cosine >= τ
  * share at least one band with probability 1 - (1 - p^r)^B where
  * p = 1 - acos(τ)/π — with B=128, r=4 that is 1 - 1.5e-11 even at
  * τ=0.45. One pass over all B·r planes per row; the shuffle key is a
  * (band, bucket) pair, never the vector.
  */
case class HyperplaneBands(child: Expression, nBands: Int, rowsPerBand: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _)
        if nBands >= 1 && rowsPerBand >= 1 && rowsPerBand <= 63 && dim >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands needs array<double>, nBands >= 1, 1 <= rowsPerBand <= 63, " +
        s"dim >= 1; got ${child.dataType}, nBands=$nBands, rowsPerBand=$rowsPerBand, dim=$dim")
  }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBands.compute(input.asInstanceOf[ArrayData], nBands, rowsPerBand, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneBands.compute($c, $nBands, $rowsPerBand, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_bands"
}

object HyperplaneBands {

  /** Static so generated code calls it directly. */
  def compute(vec: ArrayData, nBands: Int, rowsPerBand: Int, dim: Int): ArrayData = {
    val p = HyperplaneSketch.planes(nBands * rowsPerBand, dim)
    val n = math.min(dim, vec.numElements())
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var bucket = 0L
      var j = 0
      while (j < rowsPerBand) {
        val plane = p(b * rowsPerBand + j)
        var dot = 0.0
        var i = 0
        while (i < n) {
          // same null-element-as-0 rule as HyperplaneSketch.compute
          if (!vec.isNullAt(i)) {
            val x = vec.getDouble(i)
            if (plane(i)) dot += x else dot -= x
          }
          i += 1
        }
        if (dot >= 0) bucket |= (1L << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def bands(v: Column, nBands: Int, rowsPerBand: Int, dim: Int): Column =
    GraftBridge.column(HyperplaneBands(GraftBridge.expression(v), nBands, rowsPerBand, dim))
}
