package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE token count under the fixed, committed merge table
  * [[BpeTable]] — what an LLM pipeline actually budgets by, replacing
  * the regex approximation in `TextAnalysis.tokenCounts` for real token
  * accounting (reference analog: the crawl's per-record size accounting,
  * app.js:401-417, generalized to model-tokenizer units).
  *
  * Encoding applies the merges IN RANK ORDER, one left-to-right
  * non-overlapping pass each — provably identical to the GPT-2-style
  * "repeatedly merge the lowest-rank adjacent pair" encoder, because a
  * merge can only create adjacencies involving its own new symbol, so an
  * occurrence of a lower-ranked pair can never appear after that rank's
  * pass (validated against an independent min-rank-iteration
  * implementation over the whole fixture corpus; MlSpec pins goldens).
  * Rank-order passes are also exactly what a SQL oracle can replay:
  * each pass IS `replace(s, chr(a)||chr(b), chr(256+rank))` on a
  * one-codepoint-per-symbol string, so the DuckDB oracle chains 128
  * replace() calls generated from the same table.
  *
  * A native Catalyst `Expression` with `doGenCode` — stays inside
  * whole-stage codegen; the per-row work is one in-place compacting pass
  * per merge rank over a short int array (the array only shrinks, and
  * passes stop as soon as a single symbol remains).
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_token_count needs a string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Bpe.countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.countTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)

  override def prettyName: String = "bpe_token_count"
}

object Bpe {

  /** Encode a UTF-8 byte array to BPE symbol ids (merge rank r emits
    * symbol 256+r). Shared by the expression, the spec goldens, and any
    * caller that wants the token ids rather than the count. */
  def encode(bytes: Array[Byte]): Array[Int] = {
    var n = bytes.length
    if (n == 0) return Array.emptyIntArray
    var s = new Array[Int](n)
    var i = 0
    while (i < n) { s(i) = bytes(i) & 0xff; i += 1 }
    val merges = BpeTable.merges
    var r = 0
    while (r < merges.length && n > 1) {
      val a = merges(r)._1
      val b = merges(r)._2
      // one left-to-right non-overlapping pass, compacting in place
      var w = 0
      i = 0
      while (i < n) {
        if (i + 1 < n && s(i) == a && s(i + 1) == b) {
          s(w) = 256 + r; i += 2
        } else {
          s(w) = s(i); i += 1
        }
        w += 1
      }
      n = w
      r += 1
    }
    java.util.Arrays.copyOf(s, n)
  }

  /** Static so generated code can call it directly; avoids the id-array
    * copy when only the count is needed. */
  def countTokens(text: UTF8String): Int = {
    val bytes = text.getBytes
    var n = bytes.length
    if (n == 0) return 0
    val s = new Array[Int](n)
    var i = 0
    while (i < n) { s(i) = bytes(i) & 0xff; i += 1 }
    val merges = BpeTable.merges
    var r = 0
    while (r < merges.length && n > 1) {
      val a = merges(r)._1
      val b = merges(r)._2
      var w = 0
      i = 0
      while (i < n) {
        if (i + 1 < n && s(i) == a && s(i + 1) == b) {
          s(w) = 256 + r; i += 2
        } else {
          s(w) = s(i); i += 1
        }
        w += 1
      }
      n = w
      r += 1
    }
    n
  }

  /** Column-level wrapper. */
  def tokenCount(c: Column): Column =
    GraftBridge.column(BpeTokenCount(GraftBridge.expression(c)))

  /** The DuckDB replay of [[BpeTable]]: the merges as chained
    * `replace(expr, chr(a)||chr(b), chr(256+rank))` calls over a
    * one-codepoint-per-symbol string, staged through CTEs of
    * `perStage` merges each (DuckDB's binder caps expression nesting
    * at 128, so one flat 128-deep chain won't bind). Valid when the
    * input is ASCII (byte == codepoint), which the oracle corpus is;
    * the Spark side operates on true UTF-8 bytes either way.
    *
    * Returns a full query: `WITH s0 AS (SELECT <id>, <textCol> AS s
    * FROM <table>), s1 AS (...), ... SELECT <id>, CAST(length(s) AS
    * INT) AS <outCol> FROM sN ORDER BY <id>`. */
  def oracleSql(table: String, idCol: String, textCol: String,
      outCol: String, perStage: Int = 16): String = {
    val (ctes, last) = oracleCtes(table, idCol, textCol, perStage)
    s"$ctes\nSELECT $idCol, CAST(length(s) AS INT) AS $outCol " +
      s"FROM $last ORDER BY $idCol"
  }

  /** The staged-CTE prefix alone (and the final CTE's name), for oracles
    * that post-process the symbol string — e.g. BPE-budget sequence
    * packing sums `length(s)` instead of selecting it. */
  def oracleCtes(table: String, idCol: String, textCol: String,
      perStage: Int = 16): (String, String) = {
    val stages = BpeTable.merges.zipWithIndex.grouped(perStage).toSeq
    val ctes = new StringBuilder(
      s"WITH s0 AS (SELECT $idCol, $textCol AS s FROM $table)")
    stages.zipWithIndex.foreach { case (group, gi) =>
      val chain = group.foldLeft("s") { case (acc, ((a, b), r)) =>
        s"replace($acc, chr($a)||chr($b), chr(${256 + r}))"
      }
      ctes.append(s",\ns${gi + 1} AS (SELECT $idCol, $chain AS s FROM s$gi)")
    }
    (ctes.toString, s"s${stages.size}")
  }
}
