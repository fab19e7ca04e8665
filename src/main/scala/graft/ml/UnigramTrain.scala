package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.Unigram

/** Distributed unigram-LM tokenizer training (the SentencePiece
  * algorithm family, hard-EM form), the counterpart of [[graft.functions.Bpe]]'s
  * merge trainer:
  *
  *  1. whitespace pre-tokenize → DISTINCT word table with counts. All
  *     further work is O(|distinct words|), which is what makes the
  *     trainer corpus-scale: a 100 TB corpus has billions of documents
  *     but a distinct-word table orders of magnitude smaller, and only
  *     ONE pass ever touches the raw text.
  *  2. seed vocabulary: every substring up to `maxPieceLen` of every
  *     distinct word, count-weighted (one shuffle), top `seedSize` by
  *     (count desc, piece asc) plus every single character (coverage:
  *     segmentation can never fail).
  *  3. hard-EM rounds: Viterbi-segment each distinct word under the
  *     current piece log-probs (broadcast vocab — words never shuffle),
  *     re-estimate counts from the piece usage, drop unused multi-char
  *     pieces. Each round is one aggregate job whose result is
  *     vocab-bounded (a driver collect of ≤ seedSize rows).
  *  4. prune to `vocabSize` by (count desc, piece asc), single chars
  *     exempt, then further EM rounds under the pruned vocabulary.
  *
  * Everything is deterministic: exact Long count sums, total-order
  * tie-breaks, and a left-to-right DP with a fixed tie rule — two runs
  * over the same corpus produce byte-identical vocabularies, which is
  * what lets [[graft.functions.UnigramTable]] be committed and the
  * parity spec re-derive it.
  */
object UnigramTrain {

  case class Config(vocabSize: Int = 512, seedSize: Int = 2048,
      maxPieceLen: Int = 8, emIters: Int = 2, emItersPost: Int = 2)

  /** Marker-prefixed distinct words with corpus counts — the one pass
    * over raw text. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(concat(lit(Unigram.WordMarker), col("w")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].toDF("word", "cnt")
  }

  /** Count-weighted substring seeds (piece, weight), one shuffle. */
  def seedCounts(words: Dataset[(String, Long)], maxPieceLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    words.flatMap { case (w, c) =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(maxPieceLen, w.length - i)
      } yield (w.substring(i, i + l), c)
    }.toDF("piece", "cnt").groupBy("piece").agg(sum("cnt").as("cnt"))
  }

  /** One hard-EM round: piece usage counts of the Viterbi parses. */
  def emRound(words: Dataset[(String, Long)],
      vocab: Map[String, Double], maxPieceLen: Int): Map[String, Long] = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    words.flatMap { case (w, c) =>
      Unigram.segment(w, bc.value, maxPieceLen).map(p => (p, c))
    }.toDF("piece", "cnt").groupBy("piece").agg(sum("cnt").as("cnt"))
      .as[(String, Long)].collect().toMap // vocab-bounded metadata
  }

  /** Corpus NLL of the Viterbi parses under `vocab` — the monotone loss
    * the spec pins (fixed-point sum: exact aggregation order). */
  def corpusLoss(words: Dataset[(String, Long)],
      vocab: Map[String, Double], maxPieceLen: Int): Double = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    // coalesce: sum over ZERO rows is NULL, and decoding NULL through
    // the primitive Long encoder crashes — an empty corpus has zero
    // loss by the sum-of-nothing semantics (degenerate-input class,
    // r16 audit)
    val micro = words.map { case (w, c) =>
      math.round(Unigram.nll(w, bc.value, maxPieceLen) * 1e6) * c
    }.toDF("m").agg(coalesce(sum("m"), lit(0L))).as[Long].head()
    micro / 1e6
  }

  def logProbs(counts: Map[String, Long]): Map[String, Double] = {
    val total = counts.valuesIterator.sum.toDouble
    counts.map { case (p, c) => p -> math.log(c / total) }
  }

  /** Full training run; returns (piece, logprob) sorted by piece. */
  def train(docs: DataFrame, textCol: String,
      cfg: Config = Config()): Seq[(String, Double)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordCounts(docs, textCol).as[(String, Long)].persist()
    words.count() // materialize once; every round re-reads the cache
    try {
      val chars = words.flatMap { case (w, c) =>
        w.map(ch => (ch.toString, c))
      }.toDF("piece", "cnt").groupBy("piece").agg(sum("cnt").as("cnt"))
        .as[(String, Long)].collect().toMap
      // top-seedSize IN THE ENGINE (r16 audit): seedCounts is
      // corpus-vocabulary-scaled (every ≤maxPieceLen substring of every
      // distinct word), so collecting it whole then sorting on the
      // driver is an OOM at corpus scale. orderBy+limit plans as
      // TakeOrderedAndProject — per-partition bounded heaps, ONE
      // seedSize-bounded merge on the driver — under the same total
      // selection rule (count desc, piece asc: piece is unique after
      // the groupBy, so the order is total and the set identical).
      val seeds = seedCounts(words, cfg.maxPieceLen)
        .orderBy(col("cnt").desc, col("piece").asc)
        .limit(cfg.seedSize)
        .as[(String, Long)].collect().toMap
      var counts: Map[String, Long] = seeds ++ chars.map { case (p, c) =>
        p -> math.max(c, seeds.getOrElse(p, 0L)) }
      def em(rounds: Int): Unit = (0 until rounds).foreach { _ =>
        val used = emRound(words, logProbs(counts), cfg.maxPieceLen)
        // unused multi-char pieces fall out; single chars keep a floor
        // count so coverage survives even when never chosen
        counts = counts.flatMap { case (p, _) =>
          used.get(p) match {
            case Some(c) => Some(p -> c)
            case None if p.length == 1 => Some(p -> 1L)
            case None => None
          }
        }
      }
      em(cfg.emIters)
      // prune to the target size; single characters are never pruned
      val (singles, multis) = counts.partition(_._1.length == 1)
      val keep = multis.toSeq.sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, cfg.vocabSize - singles.size))
      counts = singles ++ keep
      em(cfg.emItersPost)
      logProbs(counts).toSeq.sortBy(_._1)
    } finally words.unpersist()
  }
}
