package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup hot path. The higher-order
  * function formulations (`transform`/`aggregate` chains) are interpreted
  * per element; these compile to a static-call inside whole-stage codegen
  * with tight per-row loops — the SURVEY §7.4 "custom Expression beats
  * UDF beats HOF" tier, applied where the bench showed HOFs dominating.
  */

/** Distinct word n-gram shingles over a token array (space-joined),
  * first-occurrence order — matches `array_distinct(transform(...))`
  * exactly (oracle-compatible). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs array<string> and n >= 1, got ${child.dataType}, n=$n")
  }

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  /** Static so generated code calls it directly. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]((m - n + 1) * 2)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var k = 0
      while (k < n) { window(k) = tokens.getUTF8String(i + k); k += 1 }
      seen.add(UTF8String.concatWs(Space, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  def wordShingles(c: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(c), n))
}

/** Positional (non-distinct) word n-gram shingles over a token array,
  * space-joined, in document order — gram i covers tokens [i, i+n). The
  * positional/multiplicity-preserving sibling of [[WordShingles]]: the
  * LM-scoring and duplicated-span operators need every occurrence (with
  * its offset via posexplode), where dedup candidate generation wants the
  * distinct set. Same tight codegen loop, no per-element lambda. */
case class PosShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pos_shingles needs array<string> and n >= 1, got ${child.dataType}, n=$n")
  }

  override protected def nullSafeEval(input: Any): Any =
    PosShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PosShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): PosShingles =
    copy(child = newChild)

  override def prettyName: String = "pos_shingles"
}

object PosShingles {
  private val Space = UTF8String.fromString(" ")

  /** Static so generated code calls it directly. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](m - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var k = 0
      while (k < n) { window(k) = tokens.getUTF8String(i + k); k += 1 }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def posShingles(c: Column, n: Int): Column =
    GraftBridge.column(PosShingles(GraftBridge.expression(c), n))
}

/** MinHash signature via 2-universal permutations: ONE xxhash64 per
  * shingle, then sig[i] = min over shingles of (a_i * h + b_i) with fixed
  * odd multipliers a_i. Same minhash guarantees as k independent hashes
  * (each permutation is a pairwise-independent shuffle of 2^64) at ~k×
  * fewer hash computations — the dominant term at 100 TB where every doc
  * pays k × |shingles| work. One tight loop per row, codegen'd. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string> and k >= 1, got ${child.dataType}, k=$k")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSig.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** 64-bit SimHash over a token array: per-bit majority vote of each
  * token's 64-bit hash. One pass per row (vs an interpreted aggregate ×
  * zip_with × 64-transform chain).
  *
  * The per-token hash is the first 8 bytes (big-endian, unsigned) of
  * `md5(token)` rather than xxhash64: md5 is the one 64-bit-derivable
  * hash both Spark and DuckDB compute bit-identically, which makes the
  * whole simhash pipeline oracle-checkable end to end
  * (`('0x' || substr(md5(t), 1, 16))::UBIGINT` on the DuckDB side).
  * SimHash quality only needs a uniform hash, so the basis choice is
  * semantically free. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string>, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  // MessageDigest is stateful; one instance per executor thread.
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of md5(bytes), big-endian — matches DuckDB's
    * `('0x' || substr(md5(t), 1, 16))::UBIGINT` bit for bit. */
  def md5Hash64(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (dig(i) & 0xFFL); i += 1 }
    h
  }

  /** Static so generated code calls it directly. */
  def compute(tokens: ArrayData): Long = {
    val counters = new Array[Int](64)
    val m = tokens.numElements()
    var j = 0
    while (j < m) {
      // null slots contribute nothing: the type check admits
      // array<string> with containsNull=true (any array built over a
      // nullable column), and an unguarded getBytes NPE'd mid-task on
      // the first null element (r13 review)
      if (!tokens.isNullAt(j)) {
        val s = tokens.getUTF8String(j)
        val h = md5Hash64(s.getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counters(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def simhash64(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))
}

object MinHashSig {
  /** Largest supported signature length. */
  val MaxK = 512

  private def splitmix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  // Fixed permutation constants (deterministic across JVMs/executors):
  // odd multipliers A (bijective mod 2^64) and offsets B.
  private val A: Array[Long] = Array.tabulate(MaxK)(i => splitmix64(2L * i) | 1L)
  private val B: Array[Long] = Array.tabulate(MaxK)(i => splitmix64(2L * i + 1L))

  /** Static so generated code calls it directly. */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    require(k <= MaxK, s"minhash k=$k exceeds MaxK=$MaxK")
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val a = A
    val b = B
    val m = shingles.numElements()
    var j = 0
    while (j < m) {
      // null slots contribute no permutation minimum — same guard (and
      // reason) as SimHash64.compute (r13 review)
      if (!shingles.isNullAt(j)) {
        val s = shingles.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0L)
        var i = 0
        while (i < k) {
          val p = a(i) * h + b(i)
          if (p < sig(i)) sig(i) = p
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  def minhashSig(c: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), k))
}

/** 64-bit signatures of every ≤ maxEd-deletion variant of a string — the
  * SymSpell candidate-generation hot path ([[graft.ml.Fuzzy]]) as one
  * codegen'd tight loop. The HOF spelling (nested transform + substr +
  * explode + xxhash64) is interpreted per element and dominated the fuzzy
  * query's runtime; this hashes each variant's bytes straight out of the
  * source string through a reused scratch buffer, never materializing
  * variant strings.
  *
  * Deletions are by CODE POINT, not byte (char offsets walked via UTF-8
  * lead bytes): Levenshtein counts characters, so byte-level deletes
  * would silently break the recall theorem on multi-byte text (one char
  * substitution can change 4 bytes). Signature semantics: equal variant
  * strings ⇒ equal hashes, so the deletion-neighborhood intersection
  * survives hashing; cross-string collisions only add candidates that
  * exact verification discards.
  */
case class DeletionSigs(child: Expression, maxEd: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if maxEd >= 1 && maxEd <= 2 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"deletion_sigs needs a string and maxEd in [1,2], got ${child.dataType}, maxEd=$maxEd")
  }

  override protected def nullSafeEval(input: Any): Any =
    DeletionSigs.compute(input.asInstanceOf[UTF8String], maxEd)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeletionSigs.compute($c, $maxEd)")

  override protected def withNewChildInternal(newChild: Expression): DeletionSigs =
    copy(child = newChild)

  override def prettyName: String = "deletion_sigs"
}

object DeletionSigs {

  private def hashRange(buf: Array[Byte], len: Int): Long =
    XXH64.hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      len, 42L)

  /** Static so generated code calls it directly. Emits hashes for: the
    * string itself, every 1-char deletion, and (maxEd == 2) every
    * unordered 2-char deletion — 1 + n + C(n,2) entries for n chars. */
  def compute(s: UTF8String, maxEd: Int): ArrayData = {
    val bytes = s.getBytes
    val L = bytes.length
    // char start offsets (code-point boundaries), offs(n) == L
    var n = 0
    var p = 0
    while (p < L) { p += UTF8String.numBytesForFirstByte(bytes(p)); n += 1 }
    val offs = new Array[Int](n + 1)
    p = 0; var ci = 0
    while (p < L) { offs(ci) = p; p += UTF8String.numBytesForFirstByte(bytes(p)); ci += 1 }
    offs(n) = L
    val total = 1 + n + (if (maxEd >= 2) n * (n - 1) / 2 else 0)
    val out = new Array[Long](total)
    val buf = new Array[Byte](L)
    var idx = 0
    out(idx) = hashRange(bytes, L); idx += 1
    // delete char i: bytes [0, offs(i)) ++ [offs(i+1), L)
    var i = 0
    while (i < n) {
      var w = 0
      System.arraycopy(bytes, 0, buf, 0, offs(i)); w = offs(i)
      val tail = L - offs(i + 1)
      System.arraycopy(bytes, offs(i + 1), buf, w, tail); w += tail
      out(idx) = hashRange(buf, w); idx += 1
      i += 1
    }
    if (maxEd >= 2) {
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          // skip char spans i and j (i < j)
          var w = offs(i)
          System.arraycopy(bytes, 0, buf, 0, w)
          val mid = offs(j) - offs(i + 1)
          System.arraycopy(bytes, offs(i + 1), buf, w, mid); w += mid
          val tail = L - offs(j + 1)
          System.arraycopy(bytes, offs(j + 1), buf, w, tail); w += tail
          out(idx) = hashRange(buf, w); idx += 1
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  def sigs(c: Column, maxEd: Int): Column =
    GraftBridge.column(DeletionSigs(GraftBridge.expression(c), maxEd))
}
