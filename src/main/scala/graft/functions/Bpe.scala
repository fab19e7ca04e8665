package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions._
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
/** UTF-8 bytes of a string as `array<int>` (0-255) — the initial token
  * sequence for BPE training ([[Bpe.train]]). */
case class Utf8Bytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"utf8_bytes needs a string input, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    Bpe.utf8Bytes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.utf8Bytes($c)")
  override protected def withNewChildInternal(newChild: Expression): Utf8Bytes =
    copy(child = newChild)
  override def prettyName: String = "utf8_bytes"
}

/** One BPE merge pass over an `array<int>` token sequence: every
  * left-to-right non-overlapping (a, b) adjacency collapses to `newId`
  * — the per-document step of distributed BPE training. */
case class BpeMergePass(child: Expression, a: Int, b: Int, newId: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(IntegerType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_merge_pass needs array<int>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    Bpe.mergePassData(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      a, b, newId)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Bpe.mergePassData($c, $a, $b, $newId)")
  override protected def withNewChildInternal(newChild: Expression): BpeMergePass =
    copy(child = newChild)
  override def prettyName: String = "bpe_merge_pass"
}

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

  /** One shared encoder core (byte expansion + the per-rank in-place
    * compacting passes) behind both [[encode]] and [[countTokens]], so
    * the expression hot path and the golden/oracle path can never
    * diverge. Returns the symbol buffer and its live length. */
  private def encodeCore(bytes: Array[Byte]): (Array[Int], Int) = {
    var n = bytes.length
    val s = new Array[Int](n)
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
    (s, n)
  }

  /** Encode a UTF-8 byte array to BPE symbol ids (merge rank r emits
    * symbol 256+r). Shared by the expression, the spec goldens, and any
    * caller that wants the token ids rather than the count. */
  def encode(bytes: Array[Byte]): Array[Int] = {
    if (bytes.isEmpty) return Array.emptyIntArray
    val (s, n) = encodeCore(bytes)
    java.util.Arrays.copyOf(s, n)
  }

  /** Static so generated code can call it directly; avoids the id-array
    * copy when only the count is needed. */
  def countTokens(text: UTF8String): Int = {
    val bytes = text.getBytes
    if (bytes.isEmpty) 0 else encodeCore(bytes)._2
  }

  /** Column-level wrapper. */
  def tokenCount(c: Column): Column =
    GraftBridge.column(BpeTokenCount(GraftBridge.expression(c)))

  /** Static helpers for the training expressions' generated code. */
  def utf8Bytes(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xff; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def mergePassData(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      a: Int, b: Int, newId: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val out = new Array[Int](n)
    var i = 0
    var w = 0
    // null slots: the internal train pipeline never produces them
    // (Utf8Bytes emits containsNull=false), but the expression is a
    // public building block and the type check admits nullable-element
    // arrays — a blind getInt on a null slot reads garbage 0 that can
    // SILENTLY match a merge symbol (r13 review). A null token matches
    // no pair and fails loudly instead of corrupting the sequence.
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          "bpe_merge_pass: null token id at position " + i +
            " — token-id arrays must not contain nulls")
      if (i + 1 < n && !arr.isNullAt(i + 1) &&
          arr.getInt(i) == a && arr.getInt(i + 1) == b) {
        out(w) = newId; i += 2
      } else {
        out(w) = arr.getInt(i); i += 1
      }
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, w))
  }

  /** DISTRIBUTED BPE training — the corpus-scale form of the offline
    * trainer that produced [[BpeTable]] (identical semantics: most
    * frequent adjacent pair per round counted WITH overlaps, ties to
    * the numerically smallest (a, b); merge rank r mints symbol
    * 256 + r). Returns the learned (a, b) merge list. MlSpec asserts
    * the learned prefix reproduces BpeTable.merges exactly on the
    * fixture corpus.
    *
    * Per round: ONE corpus-scan job materializes the full pair-count
    * table (adjacent pairs via two slices + zip_with — no shuffle of
    * token arrays, only (a, b, count) partials; `localCheckpoint` is
    * eager, so the follow-up top-K/maxima reads are tiny cached-block
    * jobs), then a BATCH of merges is applied as chained lazy codegen
    * passes. Strict one-merge-per-scan sequentiality is NOT required
    * for rank fidelity, but unconditional batching is impossible:
    * merge rank r+1 is defined over the corpus AFTER merge r, and the
    * sequential argmax can be a pair merge r CREATED (corpus "abab":
    * merge 1 = (a,b)→c, merge 2 = (c,c) — a pair with no pre-merge
    * count at all). So the batch is the provably-safe greedy PREFIX of
    * the sorted pair list: walking pairs in (count desc, a, b) order
    * with no skips, accept p_j = (a_j, b_j, n_j) while
    *  (1) its symbols are disjoint from every earlier accepted pair
    *      (so applying them never consumes or creates each other's
    *      occurrences — an overlap would need a shared symbol), and
    *  (2) n_j strictly exceeds every accepted p_i's new-pair bound
    *      M_i = max(max_x n(x, a_i), max_y n(b_i, y)): any pair a
    *      merge creates contains its minted symbol c_i, every
    *      occurrence "x c_i" comes from "x a_i b_i" (so its count is
    *      ≤ n(x, a_i) ≤ M_i), and symmetrically for "c_i y" — so
    *      nothing merge i creates can reach n_j, and strictness makes
    *      tie-breaks moot,
    * stopping at the first violation (skipping would leave a
    * higher-ranked pair unapplied ahead of p_j). Under (1) the counts
    * of accepted pairs are exactly unchanged while the batch applies,
    * under (2) no created pair can outrank the next accepted one, and
    * the no-skip prefix means every pair ranked above p_j has already
    * been applied — so the batch reproduces the sequential ranks
    * exactly, at one corpus scan per batch instead of per merge
    * (MlSpec measures the scan reduction and asserts parity). */
  def train(docs: org.apache.spark.sql.DataFrame, textCol: String,
      nMerges: Int): Seq[(Int, Int)] = trainBatched(docs, textCol, nMerges)._1

  /** [[train]] + the number of corpus-scan rounds it took (< nMerges
    * whenever any batch exceeded one merge). */
  def trainBatched(docs: org.apache.spark.sql.DataFrame, textCol: String,
      nMerges: Int, maxBatch: Int = 16): (Seq[(Int, Int)], Int) = {
    val (m, rounds) = trainWithCounts(docs, textCol, nMerges, maxBatch)
    (m.map { case (a, b, _) => (a, b) }, rounds)
  }

  /** [[trainBatched]] additionally reporting each merge's pair count —
    * exactly the count the SEQUENTIAL trainer's argmax sees at that
    * rank (safety condition (1) of the batching proof: an accepted
    * pair's count is unchanged while its batch applies), which is what
    * lets a scored query emit (rank, a, b, n) against a sequential
    * DuckDB replay. */
  def trainWithCounts(docs: org.apache.spark.sql.DataFrame, textCol: String,
      nMerges: Int, maxBatch: Int = 16): (Seq[(Int, Int, Long)], Int) = {
    var toks = docs.select(
      GraftBridge.column(Utf8Bytes(GraftBridge.expression(col(textCol))))
        .as("t"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    var rounds = 0
    while (merges.length < nMerges) {
      // single-token and empty docs have no adjacent pairs — and slice()
      // with length size-1 <= 0 throws, so they must not reach it
      val counts = toks.filter(size(col("t")) >= 2)
        .select(explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint() // eager: the round's one corpus scan
      rounds += 1
      val top = counts
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(maxBatch).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
      if (top.isEmpty) return (merges.toSeq, rounds)
      // new-pair bounds: max n(*, s) and max n(s, *) per symbol — tiny
      // jobs over the checkpointed count table, vocab-sized results
      val maxInto = counts.groupBy(col("b")).agg(max(col("n")).as("m"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val maxFrom = counts.groupBy(col("a")).agg(max(col("n")).as("m"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val used = scala.collection.mutable.Set.empty[Int]
      val bounds = scala.collection.mutable.ArrayBuffer.empty[Long]
      var open = true
      top.foreach { case (a, b, n) =>
        if (open && merges.length < nMerges &&
            (bounds.isEmpty ||
              (!used(a) && !used(b) && bounds.forall(n > _)))) {
          val rank = merges.length
          merges += ((a, b, n))
          toks = toks.select(
            GraftBridge.column(BpeMergePass(
              GraftBridge.expression(col("t")), a, b, 256 + rank)).as("t"))
          used += a; used += b
          bounds += math.max(maxInto.getOrElse(a, 0L), maxFrom.getOrElse(b, 0L))
        } else open = false
      }
      if (rounds % 4 == 0) toks = toks.localCheckpoint()
    }
    (merges.toSeq, rounds)
  }

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
