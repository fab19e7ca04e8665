package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) subword tokenization: a vocabulary
  * of pieces with log-probabilities; tokenizing a word = the Viterbi
  * segmentation maximizing the sum of piece log-probs. The OTHER major
  * subword family next to BPE ([[Bpe]]): BPE builds tokens bottom-up by
  * frozen merge replay, unigram picks the globally best segmentation
  * under a probabilistic model — which is why it needs a DP here where
  * BPE needs only chained replaces.
  *
  * Everything is deterministic: the DP scans left to right, ties prefer
  * the LONGER piece (two candidate parses ending at the same position
  * can only tie through equal double totals, and the longer-piece
  * candidate is visited first with a strict-improvement update — there
  * is no further tiebreak to need: at one start position there is only
  * one piece), and characters outside the vocabulary fall back to a
  * fixed penalty so segmentation never fails.
  *
  * Unit convention (r16 sweep note): the DP walks UTF-16 code units
  * (Java substring), so an astral character (surrogate pair) is two
  * positions whose halves are out-of-vocabulary singles — deterministic
  * and self-consistent on the Spark side, but a codepoint-convention
  * replay (DuckDB) would count it differently. The scored oracle is
  * immune BY CONSTRUCTION: it derives a CLOSED word→count table from
  * this very encoder at oracle-build time and inner-joins corpus words
  * against it, so any convention-diverging word fails the join and reds
  * the gate loudly (the ns_bpe_train ASCII-pin discipline, different
  * mechanism).
  */
object Unigram {

  /** Cost of a character the vocabulary cannot cover — harsh enough
    * that any in-vocab parse wins, finite so tokenization still
    * totals. */
  val UnknownLogProb: Double = -30.0

  /** Word marker, as SentencePiece: words are prefixed so pieces learn
    * word-initial vs word-internal forms. */
  val WordMarker: String = "▁"

  /** Viterbi-best segmentation of `word` under `vocab` (piece →
    * logprob). O(len · maxPieceLen) with per-position backpointers. */
  def segment(word: String, vocab: collection.Map[String, Double],
      maxPieceLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1) // piece start for the best parse ending at i
    java.util.Arrays.fill(best, 1, n + 1, Double.NegativeInfinity)
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      // walk starts ascending: longer pieces first, so an equal-score
      // later (shorter) candidate never replaces one — ties keep the
      // longer piece deterministically
      while (j < i) {
        val piece = word.substring(j, i)
        val lp =
          if (i - j == 1) vocab.getOrElse(piece, UnknownLogProb)
          else vocab.getOrElse(piece, Double.NegativeInfinity)
        if (lp != Double.NegativeInfinity && best(j) + lp > best(i)) {
          best(i) = best(j) + lp
          back(i) = j
        }
        j += 1
      }
      i += 1
    }
    // reconstruct right-to-left
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      val s = back(p)
      out += word.substring(s, p)
      p = s
    }
    out.reverseIterator.toArray
  }

  /** Total log-likelihood of the Viterbi parse (the trainer's loss). */
  def nll(word: String, vocab: collection.Map[String, Double],
      maxPieceLen: Int): Double =
    -segment(word, vocab, maxPieceLen)
      .map(p => vocab.getOrElse(p,
        if (p.length == 1) UnknownLogProb else Double.NegativeInfinity)).sum

  // precompiled: String.split("\\s+") recompiles the Pattern per call —
  // per ROW on the unigram_token_count codegen hot path (r13 review)
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** Whitespace pre-tokenization with the word marker — the shape both
    * the trainer and the encoder feed to [[segment]]. */
  def words(text: String): Array[String] =
    Whitespace.split(text).iterator.filter(_.nonEmpty).map(WordMarker + _).toArray

  // -------------------------------------------------- frozen-table encode

  private lazy val frozenMaxLen: Int =
    UnigramTable.pieces.iterator.map(_._1.length).max

  private lazy val frozenScala: Map[String, Double] = UnigramTable.pieces.toMap

  /** Token count of `text` under the COMMITTED [[UnigramTable]] — the
    * static entry point the codegen expression calls. */
  def countTokens(text: UTF8String): Int = {
    var total = 0
    val ws = words(text.toString)
    var i = 0
    while (i < ws.length) {
      total += segment(ws(i), frozenScala, frozenMaxLen).length
      i += 1
    }
    total
  }

  /** All pieces of `text` under the committed table, in order. */
  def encode(text: String): Array[String] =
    words(text).flatMap(w => segment(w, frozenScala, frozenMaxLen))

  def tokenCount(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(UnigramTokenCount(
      org.apache.spark.sql.GraftBridge.expression(c)))
}

/** `unigram_token_count(text)` over the frozen [[UnigramTable]] — a
  * codegen expression (static call, stays inside WholeStageCodegen) like
  * [[BpeTokenCount]]. */
case class UnigramTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() = child.dataType match {
    case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"unigram_token_count needs STRING, got $t")
  }
  override protected def nullSafeEval(input: Any): Any =
    Unigram.countTokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Unigram.countTokens($c)")
  override protected def withNewChildInternal(newChild: Expression): UnigramTokenCount =
    copy(child = newChild)
  override def prettyName: String = "unigram_token_count"
}
