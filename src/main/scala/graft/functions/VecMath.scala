package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Squared-L2 distance of two `array<double>` vectors as a native codegen
  * Expression: one fused pass accumulating Σ(x−y)² — the [[CosineSim]]
  * treatment applied to the PQ tier's distance kernel (r16, optimization
  * round; guide §"expressions and codegen").
  *
  * Replaces the interpreted `aggregate(zip_with(a, b, (x,y) => (x−y)²))`
  * HOF chain that every PQ encode/train/distortion pass evaluates
  * n·m·ksub times per corpus scan (higher-order functions are evaluated
  * per element through the interpreter and keep the surrounding projection
  * out of whole-stage codegen). The accumulation is SEQUENTIAL in element
  * order with the same per-element IEEE form `acc + (x−y)·(x−y)`, so
  * results are bit-identical to the HOF spelling — and therefore to the
  * DuckDB oracle replays, which were written against it (the oracle SQL
  * is untouched by this change).
  *
  * Null contract, matching the HOF chain exactly (the r13 CosineSim
  * lesson): `zip_with` pads a length mismatch with null and the lambda /
  * fold then propagate it, so any length mismatch or null ELEMENT yields
  * NULL; two empty arrays fold to the 0.0 seed. See VecMathParitySpec /
  * CodegenParitySpec for the by-value pins across codegen modes.
  */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // nullable beyond the inputs' own nullability: a null ELEMENT or a
  // length mismatch yields NULL (see compute) even when both array
  // columns are non-nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"l2_sq needs (array<double>, array<double>); " +
          s"got (${left.dataType}, ${right.dataType})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    L2Sq.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.L2Sq.compute($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_sq"
}

object L2Sq {

  /** Static so generated code calls it directly. Sequential accumulation
    * (same element order and per-element form as the HOF aggregate chain
    * this replaces); NULL (boxed) on a length mismatch or null element —
    * exactly what `aggregate(zip_with(...))` produces there. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def l2sq(a: Column, b: Column): Column =
    GraftBridge.column(L2Sq(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Sequential-fold inner product ⟨a, b⟩ of two `array<double>` vectors —
  * the codegen twin of the `aggregate(zip_with(a, b, _*_))` spelling
  * behind every fixed-point ADC term ([[graft.ml.Similarity]]'s pqDot).
  * Same bit-parity and null contract as [[L2Sq]]; kept as its own
  * expression (not a mode flag) so each kernel's parity pin is a single
  * unambiguous case in the sweep specs.
  */
case class DotSeq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_seq needs (array<double>, array<double>); " +
          s"got (${left.dataType}, ${right.dataType})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotSeq.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.DotSeq.compute($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotSeq =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_seq"
}

object DotSeq {

  /** Static so generated code calls it directly; same contract shape as
    * [[L2Sq.compute]]. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotSeq(GraftBridge.expression(a), GraftBridge.expression(b)))
}
