package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpecBase, Tables}
import graft.ml.UnigramTrain

/** Unigram-LM tokenizer: Viterbi optimality against brute force, the
  * deterministic tie rule, coverage, the distributed trainer's loss and
  * determinism, frozen-table parity, and the codegen expression.
  */
class UnigramSpec extends SparkSpecBase {
  import spark.implicits._

  private val toyVocab = Map(
    "ab" -> -1.2, "bc" -> -1.4, "abc" -> -2.9, "a" -> -2.0, "b" -> -2.1,
    "c" -> -2.2, "d" -> -2.3, "cd" -> -1.1, "abcd" -> -4.0)

  private def score(pieces: Seq[String]): Double =
    pieces.map(p => toyVocab.getOrElse(p,
      if (p.length == 1) Unigram.UnknownLogProb else Double.NegativeInfinity)).sum

  /** All segmentations whose multi-char pieces are in the vocab. */
  private def allSegmentations(w: String): Seq[List[String]] =
    if (w.isEmpty) Seq(Nil)
    else (1 to w.length).flatMap { l =>
      val head = w.substring(0, l)
      if (l == 1 || toyVocab.contains(head))
        allSegmentations(w.substring(l)).map(head :: _)
      else Seq.empty
    }

  test("Viterbi matches the brute-force optimum on every short string") {
    val alphabet = "abcd"
    // every string over {a,b,c,d} up to length 6 — 5460 cases
    def strings(n: Int): Iterator[String] =
      if (n == 0) Iterator("")
      else strings(n - 1).flatMap(s => alphabet.iterator.map(c => s + c))
    (1 to 6).foreach { n =>
      strings(n).foreach { w =>
        val got = Unigram.segment(w, toyVocab, maxPieceLen = 4)
        assert(got.mkString == w, s"'$w' reassembly broke: ${got.toSeq}")
        val best = allSegmentations(w).map(score).max
        assert(math.abs(score(got.toSeq) - best) < 1e-12,
          s"'$w': viterbi ${got.toSeq} score ${score(got.toSeq)} != best $best")
      }
    }
  }

  test("equal-score ties keep the longer piece") {
    // one-piece and two-piece parses tie exactly: -1.0 vs -0.5 + -0.5
    val v = Map("xy" -> -1.0, "x" -> -0.5, "y" -> -0.5)
    assert(Unigram.segment("xy", v, 2).toSeq == Seq("xy"))
  }

  test("unknown characters segment as penalized singles, never fail") {
    val got = Unigram.segment("aZb", toyVocab, 4)
    assert(got.mkString == "aZb" && got.contains("Z"))
    assert(Unigram.segment("", toyVocab, 4).isEmpty)
  }

  test("trainer: beats the char baseline, respects size, deterministic") {
    val corpus = Seq.fill(40)("the cat sat on the mat") ++
      Seq.fill(25)("a cat ate the hat") ++ Seq.fill(10)("matte hatter chat")
    val docs = corpus.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    val cfg = UnigramTrain.Config(vocabSize = 40, seedSize = 200,
      maxPieceLen = 5)
    val vocab = UnigramTrain.train(docs, "text", cfg)
    assert(vocab.size <= 40, s"vocab overflow: ${vocab.size}")
    // single-char coverage survived pruning
    val singles = vocab.map(_._1).filter(_.length == 1).toSet
    assert(Set("t", "h", "e", "c", "a").subsetOf(singles))
    // the learned vocabulary beats a uniform character-only model
    val words = UnigramTrain.wordCounts(docs, "text").as[(String, Long)]
    val charBaseline = UnigramTrain.logProbs(
      words.collect().flatMap { case (w, c) => w.map(ch => ch.toString -> c) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum })
    val lossTrained = UnigramTrain.corpusLoss(words, vocab.toMap, 5)
    val lossChars = UnigramTrain.corpusLoss(words, charBaseline, 5)
    assert(lossTrained < lossChars,
      s"trained loss $lossTrained not below char baseline $lossChars")
    // byte-identical across runs
    assert(UnigramTrain.train(docs, "text", cfg) == vocab)
  }

  test("seed selection is a bounded engine top-k, not a driver-side " +
      "sort of the whole candidate set (r16 audit)") {
    // seedCounts is corpus-vocabulary-scaled; the trainer must take its
    // top seedSize through TakeOrderedAndProject (per-partition bounded
    // heaps) so only seedSize rows ever reach the driver. Pins BOTH the
    // plan shape and the selection itself: the engine top-k under
    // (cnt desc, piece asc) must equal the old driver-side rule.
    val docs = Tables.documents(spark, sf0001)
    val words = UnigramTrain.wordCounts(docs, "text").as[(String, Long)]
    val seedSize = 50
    val topk = UnigramTrain.seedCounts(words, 5)
      .orderBy(col("cnt").desc, col("piece").asc).limit(seedSize)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"seed top-k is not a bounded TakeOrderedAndProject:\n$plan")
    val engine = topk.as[(String, Long)].collect().toSeq
    val driver = UnigramTrain.seedCounts(words, 5)
      .as[(String, Long)].collect()
      .sortBy { case (p, c) => (-c, p) }.take(seedSize).toSeq
    assert(engine == driver,
      "engine top-k diverged from the driver-side selection rule")
  }

  test("corpusLoss of an empty corpus is 0.0, not an encoder crash " +
      "(degenerate-input class, r16 audit)") {
    // sum over zero rows is NULL; decoding NULL through the primitive
    // Long encoder throws — the empty-input twin of the indexDriftZ
    // null-guard ADVICE fix. An empty corpus has zero loss by the
    // sum-of-nothing semantics.
    val empty = spark.emptyDataset[(String, Long)]
    assert(UnigramTrain.corpusLoss(empty, toyVocab, 5) == 0.0)
  }

  test("frozen table parity: retraining the fixture corpus reproduces it") {
    val vocab = UnigramTrain.train(Tables.documents(spark, sf0001), "text")
    assert(vocab == UnigramTable.pieces.toSeq,
      "UnigramTable.scala is stale — retrain and recommit it")
  }

  test("token-count expression agrees with the driver-side encoder") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val got = docs.select(col("doc_id"),
      Unigram.tokenCount(col("text")).as("n")).as[(Long, Int)].collect()
    val texts = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    got.foreach { case (id, n) =>
      assert(n == Unigram.encode(texts(id)).length, s"doc $id count mismatch")
    }
    // encode() reassembles the input's words exactly
    val sample = texts.values.head
    assert(Unigram.encode(sample).mkString
      .replace(Unigram.WordMarker, " ").trim == sample.split("\\s+").mkString(" "))
    // null-safe
    val withNull = Seq((1L, "the customer"), (2L, null)).toDF("id", "text")
    val r = withNull.select(Unigram.tokenCount(col("text")).as("n"))
      .collect().map(x => if (x.isNullAt(0)) -1 else x.getInt(0))
    assert(r(1) == -1, "null input must stay null")
    // the expression stays inside WholeStageCodegen over a real scan
    // (a 2-row LocalTableScan never codegens, so assert on the parquet
    // query)
    val plan = docs.select(Unigram.tokenCount(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [unigram_token_count"),
      s"projection fell out of whole-stage codegen (no * stage):\n$plan")
    // callable from SQL after extension registration
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT unigram_token_count('the table scan') AS n").head().getInt(0)
    assert(viaSql == Unigram.encode("the table scan").length)
  }
}
