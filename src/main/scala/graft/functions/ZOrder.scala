package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave of two long keys, `bitsPerKey` bits each:
  * bit i of `left` lands at result bit 2i, bit i of `right` at 2i+1.
  *
  * The data-layout primitive behind multi-column clustering: writing files
  * sorted by z-value gives every file a tight min/max envelope on BOTH
  * keys simultaneously, so parquet row-group / file pruning works for
  * predicates on either column — the Delta/Iceberg OPTIMIZE ZORDER effect,
  * expressed as a plain sort key. Codegen'd single expression; values
  * must fit in bitsPerKey bits (caller picks; 21 bits each keeps the
  * result under 2^42).
  */
case class ZOrder2(left: Expression, right: Expression, bitsPerKey: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) if bitsPerKey >= 1 && bitsPerKey <= 31 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"zorder2 needs (bigint, bigint), 1 <= bitsPerKey <= 31; " +
          s"got (${left.dataType}, ${right.dataType}), bitsPerKey=$bitsPerKey")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bitsPerKey)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrder2.compute($a, $b, $bitsPerKey)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zorder2"
}

object ZOrder2 {

  /** Static so generated code calls it directly.
    *
    * Loud on overflow (r14, ADVICE): a key with bits at/above
    * `bitsPerKey` used to interleave IDENTICALLY to the key 2^bits
    * below it — an unclusterable curve that a mirrored oracle keeps
    * green (the exact latent class r13's 18→21-bit fix closed for sf1;
    * without the guard the same bug re-arms at the next scale-up). The
    * branch is one OR+shift on the hot path; the writer path
    * (Layout.zOrderClusterN) min-max normalizes and never trips it. */
  def compute(a: Long, b: Long, bitsPerKey: Int): Long = {
    if (((a | b) >>> bitsPerKey) != 0L) throw new IllegalArgumentException(
      s"zorder2: key out of range for $bitsPerKey bits/key (a=$a, b=$b) — " +
        "raise bitsPerKey or min-max normalize (Layout.zOrderClusterN)")
    var out = 0L
    var i = 0
    while (i < bitsPerKey) {
      out |= ((a >> i) & 1L) << (2 * i)
      out |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    out
  }

  def zorder(a: Column, b: Column, bitsPerKey: Int = 21): Column =
    GraftBridge.column(ZOrder2(GraftBridge.expression(a),
      GraftBridge.expression(b), bitsPerKey))

  /** The same interleave as ANSI SQL arithmetic (for the DuckDB oracle):
    * per-bit shift terms OR'd together. Every term is fully parenthesized —
    * DuckDB gives `<<` and `|` equal precedence (left-associative), so an
    * unparenthesized chain re-shifts the accumulated value. */
  def sqlExpr(aCol: String, bCol: String, bitsPerKey: Int): String = {
    val terms =
      (0 until bitsPerKey).map(i => s"((($aCol >> $i) & 1) << ${2 * i})") ++
        (0 until bitsPerKey).map(i => s"((($bCol >> $i) & 1) << ${2 * i + 1})")
    terms.mkString("(", " | ", ")")
  }
}

/** N-key Morton interleave: bit i of key j lands at result bit i·n + j,
  * so ZOrderN over two keys is bit-identical to [[ZOrder2]] (spec-pinned).
  *
  * Deliberately NOT a custom Expression: the interleave is a pure
  * shift/mask/or tree, so it composes from Spark's own codegen'd
  * bitwise functions — n·bits terms OR-reduced — and the optimizer sees
  * ordinary arithmetic it can constant-fold and push around. The custom-
  * Expression route ([[ZOrder2]]) predates this and is kept for the
  * 2-key fast path and its SQL registration; for arbitrary n the
  * composition is the Spark-first answer. n·bitsPerKey must stay ≤ 63.
  */
object ZOrderN {

  def zorder(cols: Seq[Column], bitsPerKey: Int): Column = {
    import org.apache.spark.sql.functions.{concat, lit, raise_error,
      shiftleft, shiftrightunsigned, when}
    val n = cols.size
    require(n >= 2, "zorderN needs at least two keys")
    require(n * bitsPerKey <= 63, s"$n keys × $bitsPerKey bits exceeds a long")
    // Runtime overflow guard (r14, ADVICE — same latent class the r13
    // 18→21-bit fix closed): a key with bits at/above bitsPerKey would
    // silently interleave like the key 2^bits below it, and a mirrored
    // oracle keeps the truncation green. The SketchGuards weave
    // discipline: an always-0 term OR'd into the RESULT, so the
    // optimizer cannot prune it and the happy-path value is unchanged
    // (x | 0 = x) — one `when` per row instead of duplicating the
    // guard into every interleave term. Negative keys trip it too
    // (srl fills with the sign bits).
    // coalesce: a null key nulls the whole z-value anyway (every term
    // propagates it) — the guard must not turn null into a raise.
    val overflow = org.apache.spark.sql.functions.coalesce(
      cols.map(shiftrightunsigned(_, bitsPerKey)).reduce(_.bitwiseOR(_)),
      lit(0L))
    val guardZero = when(overflow === lit(0L), lit(0L))
      .otherwise(raise_error(concat(
        lit(s"zorderN: key out of range for $bitsPerKey bits/key ("),
        cols.map(_.cast("string")).reduce((a, b) => concat(a, lit(","), b)),
        lit(") — raise bitsPerKey or min-max normalize " +
          "(Layout.zOrderClusterN)"))).cast("long"))
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bitsPerKey
    } yield shiftleft(
      shiftrightunsigned(c, i).bitwiseAND(lit(1L)), i * n + j)
    (terms :+ guardZero).reduce(_.bitwiseOR(_))
  }

  /** The identical interleave as SQL for the oracle (same
    * parenthesization discipline as [[ZOrder2.sqlExpr]]). */
  def sqlExpr(cols: Seq[String], bitsPerKey: Int): String = {
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bitsPerKey
    } yield s"((($c >> $i) & 1) << ${i * n + j})"
    terms.mkString("(", " | ", ")")
  }
}
