package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** Evaluation-path parity for every custom codegen Expression (r15
  * review sweep): the SAME logical input must produce the SAME result
  * regardless of HOW Spark evaluates it —
  *
  *  - whole-stage codegen (the production path),
  *  - per-expression codegen with whole-stage off (CODEGEN_ONLY),
  *  - the interpreted `eval` path (NO_CODEGEN) — which is ALSO the
  *    constant-folding path: a literal argument is folded through
  *    `eval` at optimization time even in a codegen'd query, so an
  *    eval/codegen divergence surfaces as "the literal probe and the
  *    column data disagree", the quietest possible wrong answer;
  *  - and regardless of the input's PHYSICAL representation:
  *    UnsafeArrayData (row data, null slots read as zeroed bytes when
  *    accessed unguarded) vs GenericArrayData (folded literals and
  *    collected rows, null slots are real nulls — the r13 CosineSim
  *    lesson, which this spec generalizes to the whole surface).
  *
  * The repo's expressions route codegen through the same static their
  * eval calls, so mode parity holds by construction TODAY; this spec is
  * the net that keeps a future hand-inlined doGenCode honest. The r15
  * sweep that wrote it specifically hunted the null-slot representation
  * class in WordShingles/PosShingles (they read slots UNGUARDED, unlike
  * the r13-fixed SimHash64/MinHashSig/CosineSim) and REFUTED the red:
  * Spark 4's UnsafeArrayData string accessor returns null for null
  * slots just like GenericArrayData, and UTF8String.concatWs skips
  * nulls, so a window spanning a null token consistently yields the
  * shortened gram in every path — semantics now PINNED here (grams
  * 'a','b' for ["a", null, "b"], n=2) so an accessor-contract change in
  * a future Spark upgrade fails a test instead of silently re-hashing
  * every shingle.
  */
class CodegenParitySpec extends SparkSpecBase {

  private val Modes = Seq(
    "wholestage" -> Map(
      "spark.sql.codegen.wholeStage" -> "true",
      "spark.sql.codegen.factoryMode" -> "FALLBACK"),
    "codegen_only" -> Map(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY"),
    "interpreted" -> Map(
      "spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN"))

  private def withConf[A](m: Map[String, String])(f: => A): A = {
    val prev = m.keys.map(k => k -> spark.conf.getOption(k)).toSeq
    m.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Collect `build(df)` ordered by its first column under each mode and
    * demand identical rows. */
  private def assertModeParity(tag: String, df: DataFrame,
      build: DataFrame => DataFrame): Unit = {
    val results = Modes.map { case (name, conf) =>
      name -> withConf(conf) {
        build(df).collect().toSeq.map(_.toString)
      }
    }
    val (refName, ref) = results.head
    results.tail.foreach { case (name, got) =>
      assert(got == ref,
        s"$tag: $name diverges from $refName\n  $refName: ${ref.take(5)}\n" +
          s"  $name: ${got.take(5)}")
    }
  }

  private val textSchema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("text", StringType, nullable = true)))

  private lazy val texts: DataFrame = {
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .orderBy(col("doc_id")).limit(64)
      .select(col("doc_id").cast("int").as("id"), col("text"))
    val edges = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1001, null), Row(1002, ""), Row(1003, " "), Row(1004, "a"),
        Row(1005, "héllo wörld ∑ düp"), Row(1006, "x " * 40 + "x"),
        Row(1007, "tab\tand\nnewline  double"), Row(1008, "ascii only text"),
        Row(1009, "\u0000nul byte"), Row(1010, "ωmega πrefix suffix")),
      textSchema)
    corpus.unionByName(edges).localCheckpoint()
  }

  private val arrSchema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("toks", ArrayType(StringType, containsNull = true), nullable = true)))

  private lazy val tokenArrays: DataFrame = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1, Seq("a", "b", "c", "d")),
      Row(2, Seq("a", null, "b")),
      Row(3, Seq(null, null)),
      Row(4, Seq("solo")),
      Row(5, Seq.empty[String]),
      Row(6, null),
      Row(7, Seq("", "a", "")),
      Row(8, Seq("dup", "dup", "dup", "dup")),
      Row(9, Seq("ünï", "códe", "pòint"))),
    arrSchema).localCheckpoint()

  private val vecSchema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("va", ArrayType(DoubleType, containsNull = true), nullable = true),
    StructField("vb", ArrayType(DoubleType, containsNull = true), nullable = true)))

  private lazy val vectors: DataFrame = {
    val dim = 64
    def v(seed: Int): Seq[java.lang.Double] =
      (0 until dim).map(i => java.lang.Double.valueOf(
        math.sin(seed * 31.0 + i) * (if (i % 7 == 0) -1 else 1)))
    val rows: Seq[Row] = Seq(
      Row(1, v(1), v(2)),
      Row(2, v(3), v(3)),
      Row(3, Seq.fill(dim)(java.lang.Double.valueOf(0.0)), v(4)),
      Row(4, v(5).updated(7, null), v(6)), // null element
      Row(5, v(7), v(8).take(32)), // length mismatch
      Row(6, null, v(9)), // null array
      Row(7, v(10).updated(0, java.lang.Double.valueOf(-0.0)), v(10)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), vecSchema)
      .localCheckpoint()
  }

  test("text expressions: identical across wholestage/codegen-only/interpreted") {
    assertModeParity("bpe_token_count", texts, df => df.select(col("id"),
      Bpe.tokenCount(col("text"))).orderBy(col("id")))
    assertModeParity("unigram_token_count", texts, df => df.select(col("id"),
      Unigram.tokenCount(col("text"))).orderBy(col("id")))
    assertModeParity("poly_fingerprint", texts, df => df.select(col("id"),
      PolyFingerprint.fingerprint(col("text"))).orderBy(col("id")))
    assertModeParity("cdc_chunks", texts, df => df.select(col("id"),
      CdcChunks.cdcChunks(col("text"))).orderBy(col("id")))
    assertModeParity("deletion_sigs", texts, df => df.select(col("id"),
      DeletionSigs.sigs(col("text"), 1)).orderBy(col("id")))
  }

  test("token-array expressions: identical across modes (null slots included)") {
    assertModeParity("word_shingles", tokenArrays, df => df.select(col("id"),
      WordShingles.wordShingles(col("toks"), 2)).orderBy(col("id")))
    assertModeParity("pos_shingles", tokenArrays, df => df.select(col("id"),
      PosShingles.posShingles(col("toks"), 2)).orderBy(col("id")))
    assertModeParity("minhash_sig", tokenArrays, df => df.select(col("id"),
      MinHashSig.minhashSig(col("toks"), 8)).orderBy(col("id")))
    assertModeParity("simhash64", tokenArrays, df => df.select(col("id"),
      SimHash64.simhash64(col("toks"))).orderBy(col("id")))
  }

  test("vector expressions: identical across modes (null elements, mismatch, zero)") {
    assertModeParity("cosine_sim", vectors, df => df.select(col("id"),
      CosineSim.cosine(col("va"), col("vb"))).orderBy(col("id")))
    assertModeParity("hyperplane_sketch", vectors, df => df.select(col("id"),
      HyperplaneSketch.sketch(col("va"), 16, 64)).orderBy(col("id")))
    assertModeParity("hyperplane_bands", vectors, df => df.select(col("id"),
      HyperplaneBands.bands(col("va"), 8, 2, 64)).orderBy(col("id")))
    assertModeParity("l2_sq", vectors, df => df.select(col("id"),
      L2Sq.l2sq(col("va"), col("vb"))).orderBy(col("id")))
    assertModeParity("dot_seq", vectors, df => df.select(col("id"),
      DotSeq.dot(col("va"), col("vb"))).orderBy(col("id")))
  }

  test("zorder2: identical across modes; out-of-range throws in every mode") {
    val zdf = spark.range(0, 64).select(col("id").cast("int").as("id"),
      (col("id") * 31337L % 2097152L).as("a"),
      (col("id") * 7919L % 2097152L).as("b")).localCheckpoint()
    assertModeParity("zorder2", zdf, df => df.select(col("id"),
      ZOrder2.zorder(col("a"), col("b"), 21)).orderBy(col("id")))
    val bad = spark.range(0, 1).select(lit(1L << 22).as("a"), lit(0L).as("b"))
    Modes.foreach { case (name, conf) =>
      withConf(conf) {
        val e = intercept[Exception] {
          bad.select(ZOrder2.zorder(col("a"), col("b"), 21)).collect()
        }
        // SparkException wraps the task failure; the guard's message
        // must be the cause in EVERY mode
        def messages(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
        assert(messages(e).exists(_.contains("zorder2: key out of range")),
          s"$name: out-of-range did not raise the guard")
      }
    }
  }

  /** The constant-folding face of the same contract: a FOLDABLE
    * argument evaluates through `eval` on GenericArrayData at optimize
    * time; the identical values as row data evaluate through codegen on
    * UnsafeArrayData. The two must agree. (Hunted as a suspected red —
    * see the class doc; refuted, and the agreed-on null-window gram
    * semantics are pinned by this test.) */
  test("literal vs row data: shingles over a null-bearing token array agree") {
    val lits = Seq(
      array(lit("a"), lit(null).cast("string"), lit("b")),
      array(lit(null).cast("string"), lit("x")),
      array(lit("p"), lit("q"), lit(null).cast("string"), lit("r"), lit("s")))
    val rows = java.util.Arrays.asList(
      Row(0, Seq("a", null, "b")), Row(1, Seq(null, "x")),
      Row(2, Seq("p", "q", null, "r", "s")))
    val data = spark.createDataFrame(rows, arrSchema).localCheckpoint()
    for ((mk, tag) <- Seq(
        ((c: org.apache.spark.sql.Column) => WordShingles.wordShingles(c, 2),
          "word_shingles"),
        ((c: org.apache.spark.sql.Column) => PosShingles.posShingles(c, 2),
          "pos_shingles"))) {
      val folded = lits.zipWithIndex.map { case (l, i) =>
        spark.range(1).select(mk(l)).collect()(0).getSeq[String](0).toList
      }
      val fromRows = data.select(col("id"), mk(col("toks")))
        .orderBy(col("id")).collect().map(_.getSeq[String](1).toList).toSeq
      assert(fromRows == folded,
        s"$tag: row-data grams ${fromRows} != constant-folded grams ${folded}")
      // the agreed semantics, pinned by VALUE (not just by agreement):
      // null slots are skipped by concatWs, so a window spanning one
      // yields the shortened gram — if a Spark upgrade changes the
      // accessor contract (null slot reads as ""), this fails loudly
      // instead of silently re-hashing every shingle in the corpus
      assert(fromRows.head == List("a", "b"),
        s"$tag: null-window gram semantics changed: ${fromRows.head}")
    }
  }
}
