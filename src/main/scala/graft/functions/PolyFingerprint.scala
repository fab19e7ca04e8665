package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: Karp-Rabin polynomial rolling hash of the text's
  * Unicode code points, mod the Mersenne prime 2^31-1.
  *
  * A native Catalyst `Expression` with `doGenCode` — stays inside
  * whole-stage codegen (no UDF serialization, no boxing per row), the
  * preferred extension tier for scalar functions (SURVEY §7.4). The
  * modulus keeps the accumulator < 2^36 so the arithmetic needs no
  * 128-bit intermediates, and the same fold is expressible in ANSI SQL
  * (`list_reduce` over code points) for the DuckDB oracle.
  */
case class PolyFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_fingerprint needs a string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PolyFingerprint.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PolyFingerprint.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyFingerprint =
    copy(child = newChild)

  override def prettyName: String = "poly_fingerprint"
}

object PolyFingerprint {
  final val Mod: Long = 2147483647L // 2^31 - 1
  final val Base: Long = 31L

  /** Static so generated code can call it directly. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column-level wrapper. */
  def fingerprint(c: Column): Column =
    GraftBridge.column(PolyFingerprint(GraftBridge.expression(c)))
}
