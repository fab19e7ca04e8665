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

  private def planes(nBits: Int, dim: Int): Array[Array[Boolean]] =
    cache.computeIfAbsent((nBits, dim), { k: (Int, Int) => makePlanes(k._1, k._2) })

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
        val x = vec.getDouble(i)
        if (plane(i)) dot += x else dot -= x
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
