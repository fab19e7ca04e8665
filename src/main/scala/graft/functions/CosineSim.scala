package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity of two `array<double>` vectors as a native codegen
  * Expression: one fused pass accumulating dot/|a|²/|b|².
  *
  * Replaces three interpreted `aggregate(zip_with(...))` HOF chains per
  * row — the dominant cost of every similarity verify stage (higher-order
  * functions are evaluated per element through the interpreter). The
  * accumulation is SEQUENTIAL in element order with the identical
  * `dot/sqrt(na*nb)` final form, so results are bit-identical to both the
  * HOF formulation and DuckDB's `list_cosine_similarity` (NOTES.md §4) —
  * the oracle diffs stay exact.
  */
case class CosineSim(left: Expression, right: Expression)
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
        s"cosine_sim needs (array<double>, array<double>); " +
          s"got (${left.dataType}, ${right.dataType})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.CosineSim.compute($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

object CosineSim {

  /** Static so generated code calls it directly. Sequential accumulation
    * (same order as the HOF aggregate chains this replaces).
    *
    * Returns NULL (boxed) on a length mismatch or a null element —
    * exactly what the aggregate(zip_with(...)) chain it claims
    * bit-parity with produces there (zip_with pads the shorter array
    * with null; the aggregate then propagates it). The pre-r13 version
    * silently truncated to the shorter length and blind-read null
    * slots (NPE on GenericArrayData, 0.0 on UnsafeArrayData) — i.e.
    * the parity claim broke precisely on the malformed rows an oracle
    * diff exists to catch. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))
}
