package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, stopword-profile language ID. All built-in expression
  * chains (whole-stage codegen), no UDFs.
  */
object TextAnalysis {

  /** BPE-ish token regex: letter runs, digit runs, single non-space symbol
    * runs — the classic pre-tokenizer split. Identical semantics in Java
    * regex (Spark) and RE2 (DuckDB) for this pattern. */
  val TokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"

  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  private def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  private def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(_.asInstanceOf[Any]): _*)))

  /** Per-SOURCE quality gate: keep documents whose stopword ratio is
    * strictly above their own source's median — the domain-normalized
    * form of [[graft.ml.Corpus.qualityFilter]]'s global gate (a global
    * threshold systematically drains whole domains whose prose style
    * sits below the corpus-wide median; per-source gating keeps the
    * mixture while dropping each domain's own worst half).
    *
    * Scale shape: thresholds come from approx_percentile at
    * accuracy=1e6 per source — a partial-aggregating SKETCH (constant
    * state per group, map-side combine), not an exact percentile that
    * buffers every value of a group in one task; the w_ntile_approx
    * convention applies (rank-exact at this accuracy: the value IS the
    * ceil(q*n)-th order statistic, which the oracle replays). The tiny
    * per-source threshold table broadcasts onto a map-side filter; the
    * only corpus-wide exchange is the threshold aggregate's. Ratios are
    * round-6 on both sides, and the median is one of the ratios, so the
    * strict compare is ulp-safe.
    */
  def perSourceQualityGate(docs: DataFrame,
      accuracy: Long = 1000000L): DataFrame = {
    // Shared construction-time Int-range check (SketchGuards, ADVICE
    // r12): past 2^31 the lockstep advice no longer applies — switch
    // the oracle to a ±1-rank band.
    graft.functions.SketchGuards.requireSketchAccuracy(
      "perSourceQualityGate", accuracy)
    val toks = wsTokens(col("text"))
    val r = docs.select(col("doc_id"), col("source"),
      round(stopwordCount(toks, Stopwords("en")).cast("double") /
        size(toks), 6).as("stopword_ratio"))
    // per-source n rides the same sketch aggregate: the oracle's
    // ceil(0.5·n)-order-statistic claim holds only inside the GK
    // rank-exactness envelope (n <= accuracy/2 per source) — checked in
    // the plan itself so an sf bump fails loudly instead of as a
    // confusing oracle-hash red (the w_ntile_approx discipline). The
    // always-0 term is woven into the filter because a free-standing
    // check column would be pruned away. `accuracy` is parameterized so
    // QualitySpec can force the guard to FIRE on a small frame — proof
    // the raise_error survives optimization rather than being pruned as
    // dead code (the scored query always passes the 1e6 default).
    val thr = r.groupBy(col("source"))
      .agg(percentile_approx(col("stopword_ratio"), lit(0.5),
        lit(Math.toIntExact(accuracy))).as("source_median"),
        count(lit(1)).as("n_src"))
    val envelopeZero = graft.functions.SketchGuards.rankExactEnvelope(
      "perSourceQualityGate", " for a source", col("n_src"), accuracy,
      "raise accuracy in lockstep", "double")
    r.join(broadcast(thr), "source")
      .filter(col("stopword_ratio") > col("source_median") + envelopeZero)
      .select(col("doc_id"), col("source"), col("stopword_ratio"),
        col("source_median"))
  }

  /** Gopher quality rules (Rae et al. 2021 §A1.1, the publicly
    * documented filter set) — the rule gate a production corpus runs
    * BEFORE model-based scoring: per document, word count, mean word
    * length, symbol-to-word ratio, alphabetic-word fraction, and
    * stopword hits, plus the conjunctive pass verdict. Thresholds are
    * the paper's: 50 <= words <= 100000, 3 <= mean_word_len <= 10,
    * symbol_ratio <= 0.1, alpha_ratio >= 0.8, >= 2 stopword hits from
    * the 8-word indicator set.
    *
    * Shape at scale: ONE map-side projection over a single-space token
    * split (the jaccardCtes convention) — array HOFs inside whole-stage
    * codegen, zero exchanges before the canonical ORDER BY. Ratios and
    * the mean are SINGLE divisions of exact integers, left unrounded
    * per the cross-engine determinism rule (rounding a lone IEEE
    * division is what CREATES decimal-half divergence — NOTES r10
    * wave 6), so the threshold booleans are engine-identical.
    */
  def gopherRules(docs: DataFrame): DataFrame = {
    val gopherStops = array(Seq("the", "be", "to", "of", "and", "that",
      "have", "with").map(lit): _*)
    val t = split(col("text"), " ")
    docs.select(col("doc_id"), col("source"),
        size(t).cast("long").as("n_words"),
        aggregate(transform(t, w => length(w)), lit(0L),
          (acc, x) => acc + x).as("char_sum"),
        size(filter(t, w =>
          w.contains("#") || w.contains("..."))).cast("long")
          .as("symbol_words"),
        size(filter(t, w => w.rlike("[A-Za-z]"))).cast("long")
          .as("alpha_words"),
        size(filter(t, w => array_contains(gopherStops, lower(w))))
          .cast("long").as("stopword_hits"))
      .select(col("doc_id"), col("source"), col("n_words"),
        (col("char_sum").cast("double") / col("n_words"))
          .as("mean_word_len"),
        (col("symbol_words").cast("double") / col("n_words"))
          .as("symbol_ratio"),
        (col("alpha_words").cast("double") / col("n_words"))
          .as("alpha_ratio"),
        col("stopword_hits"))
      .withColumn("pass",
        col("n_words").between(50L, 100000L) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_ratio") <= 0.1 &&
          col("alpha_ratio") >= 0.8 &&
          col("stopword_hits") >= 2L)
  }

  /** Shannon character entropy per document — a classic low-quality-text
    * signal (near-zero entropy = padded/repeated filler; natural prose sits
    * around 4 bits ≈ 2.8 nats). One explode + two hash aggregates; at
    * scale the (doc_id, ch) shuffle key keeps partial aggregation
    * map-side-combinable, so shuffle volume is |docs|·|alphabet|, not
    * |chars|. Per-char contributions are rounded to 6 decimals and summed
    * in fixed point so addition order (Spark partition order vs DuckDB's)
    * cannot shift an ulp — the same discipline as dsirScore.
    */
  def charEntropy(docs: DataFrame): DataFrame = {
    // Spark's split("") can emit boundary empties (Java regex); DuckDB's
    // doesn't — filter them so both engines see the same char multiset
    val chars = docs.select(col("doc_id"),
        explode(split(col("text"), "")).as("ch"))
      .filter(length(col("ch")) === 1)
    // doc totals via an unordered window over the partial-agg output
    // (the tfidf df trick): one shuffle on (doc_id, ch) for the combine,
    // one on doc_id for window + final agg — no per-doc self-join
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val perChar = chars.groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n_chars", sum(col("c")).over(byDoc))
      .withColumn("n_distinct_chars", count(lit(1)).over(byDoc))
    val p = col("c").cast("double") / col("n_chars")
    perChar
      .select(col("doc_id"), col("n_chars"), col("n_distinct_chars"),
        round(-p * log(p), 6).as("contrib"))
      .groupBy(col("doc_id"), col("n_chars"), col("n_distinct_chars"))
      .agg((sum(round(col("contrib") * 1e6, 0).cast("long")) / 1e6).as("ent"))
      .select(col("doc_id"), col("n_chars"), col("n_distinct_chars"),
        round(col("ent"), 6).as("char_entropy"))
  }

  /** Token counts: whitespace tokens + regex (BPE-ish) tokens + distinct. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(wsTokens(col("text"))).as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(TokenPattern), lit(0))).as("n_re_tokens"),
      size(array_distinct(wsTokens(col("text")))).as("n_distinct_tokens"))

  /** Frozen linear quality model — a shipped classifier artifact like
    * [[graft.functions.BpeTable]]: real pipelines score documents with a
    * trained quality classifier (the GPT-3/LLaMA-style LR-over-features
    * filter) whose weights are versioned data, not code that retrains on
    * every run. Training is offline and orthogonal; these weights
    * threshold the fixture corpus ~65/35 so the decision genuinely
    * bites. */
  object QualityModel {
    val Bias = -6.5
    val WStopword = 20.0
    val WCharsPerToken = 1.0
    val WPunct = -12.0
    val WUpper = -8.0
  }

  /** Model-based quality scoring: sigmoid of the frozen linear model
    * over [[qualityFeatures]], plus the keep/drop decision at 0.5 —
    * purely map-side (one projection over the feature projection), the
    * classifier-filter shape every pre-training pipeline runs corpus-
    * wide. The logit accumulates left-to-right over ROUNDED features so
    * both engines fold identical doubles. */
  def classifierScore(docs: DataFrame): DataFrame = {
    import QualityModel._
    val z = lit(Bias) +
      lit(WStopword) * col("stopword_ratio") +
      lit(WCharsPerToken) * col("chars_per_token") +
      lit(WPunct) * col("punct_ratio") +
      lit(WUpper) * col("upper_ratio")
    qualityFeatures(docs)
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("lr_score"))
      .withColumn("keep", col("lr_score") >= 0.5)
  }

  /** Quality-score features: length, token stats, punctuation / whitespace /
    * uppercase ratios, English stopword ratio. Ratios divide exact integer
    * counts so both engines produce identical doubles. */
  def qualityFeatures(docs: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    val nChars = length(col("text"))
    val nPunct = length(col("text")) -
      length(regexp_replace(col("text"), "[!-/:-@\\[-`{-~]", ""))
    val nUpper = length(col("text")) -
      length(regexp_replace(col("text"), "[A-Z]", ""))
    val nWs = length(col("text")) -
      length(regexp_replace(col("text"), "\\s", ""))
    // greatest(x, 1) denominators, mirrored verbatim in the DuckDB
    // oracle CTEs: an empty-text (or all-whitespace) doc has
    // n_chars = 0 / zero tokens, and under Spark 4's default ANSI mode
    // a bare division throws DIVIDE_BY_ZERO mid-job — one such row
    // crashed qualityFilter, classifierScore, trainQualityModel, and
    // trainingMix (r13 review). Ratios of an empty doc are 0.
    val nCharsSafe = greatest(nChars, lit(1))
    val nToksSafe = greatest(size(toks), lit(1))
    docs.select(col("doc_id"),
      nChars.as("n_chars"),
      size(toks).as("n_tokens"),
      round(nChars.cast("double") / nToksSafe, 6).as("chars_per_token"),
      round(nPunct.cast("double") / nCharsSafe, 6).as("punct_ratio"),
      round(nUpper.cast("double") / nCharsSafe, 6).as("upper_ratio"),
      round(nWs.cast("double") / nCharsSafe, 6).as("ws_ratio"),
      round(stopwordCount(toks, Stopwords("en")).cast("double") / nToksSafe, 6)
        .as("stopword_ratio"))
  }

  /** DISTRIBUTED quality-classifier TRAINING — the offline step that
    * produces a [[QualityModel]]-shaped weight vector, completing the
    * train-once/freeze/infer-at-scale story the BPE table and the
    * residual quantizer follow. Full-batch logistic-regression gradient
    * descent over the four [[qualityFeatures]] ratios: each iteration
    * is ONE aggregation job over the persisted feature table (four
    * gradient sums + bias gradient + log-loss, all map-side partials),
    * and the driver holds only the 5-double weight vector — the same
    * driver-state discipline as the BPE trainer's argmax row. At 100 TB
    * the feature table is 5 doubles per doc (computed in one corpus
    * pass, persisted), so iterations cost feature-table scans, not
    * corpus scans. Labels join on doc_id; like Lloyd training, float
    * gradient sums make this spec-tested (loss descent + label
    * recovery) rather than oracle-scored — the SCORED row stays the
    * frozen [[QualityModel]].
    *
    * Features are STANDARDIZED internally (one stats job; raw ratios
    * span 0-0.3 while chars_per_token sits near 5, and that
    * conditioning gap makes raw-space GD diverge at any useful rate);
    * the returned weights are mapped back to raw feature space, so
    * they drop into [[classifierScore]]'s formula directly.
    *
    * Returns ((bias, wStopword, wCharsPerToken, wPunct, wUpper),
    * per-iteration mean log-loss). */
  def trainQualityModel(docs: DataFrame, labels: DataFrame,
      iters: Int = 100, stepSize: Double = 1.0)
      : (Array[Double], Seq[Double]) = {
    val raw = qualityFeatures(docs)
      .select(col("doc_id"), col("stopword_ratio").as("x1"),
        col("chars_per_token").as("x2"), col("punct_ratio").as("x3"),
        col("upper_ratio").as("x4"))
      .join(labels.select(col("doc_id"), col("label").cast("double").as("y")),
        "doc_id")
    val xs = (1 to 4).map(j => s"x$j")
    val stats = raw.agg(
      count(lit(1)).cast("double").as("n"),
      xs.flatMap(x => Seq(avg(col(x)).as(s"m_$x"),
        coalesce(stddev_pop(col(x)), lit(0.0)).as(s"s_$x"))): _*).head()
    val n = stats.getAs[Double]("n")
    // fail fast: n=0 would cascade NaN through every weight via 0/0
    // (null avgs unbox to 0.0, so nothing downstream would throw)
    require(n > 0,
      "trainQualityModel: docs⋈labels is empty — no doc_id overlap")
    val mu = xs.map(x => stats.getAs[Double](s"m_$x"))
    // zero-variance feature → weight 0 via standardized x = 0
    val sd = xs.map(x => math.max(stats.getAs[Double](s"s_$x"), 1e-12))
    val feats = raw.select(col("y") +:
      xs.zipWithIndex.map { case (x, j) =>
        ((col(x) - mu(j)) / sd(j)).as(x) }: _*)
      .persist()
    try {
      feats.count()
      val w = Array(0.0, 0.0, 0.0, 0.0, 0.0) // bias, w1..w4 (standardized)
      val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to iters).foreach { _ =>
        val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
          lit(w(3)) * col("x3") + lit(w(4)) * col("x4")
        val p = lit(1.0) / (lit(1.0) + exp(-z))
        val err = p - col("y")
        val r = feats.agg(
          sum(err).as("g0"), sum(err * col("x1")).as("g1"),
          sum(err * col("x2")).as("g2"), sum(err * col("x3")).as("g3"),
          sum(err * col("x4")).as("g4"),
          // clamp keeps log finite when a confident p saturates to 0/1
          sum(-(col("y") * log(greatest(p, lit(1e-12))) +
            (lit(1.0) - col("y")) *
              log(greatest(lit(1.0) - p, lit(1e-12))))).as("l")).head()
        (0 to 4).foreach(j => w(j) -= stepSize * r.getDouble(j) / n)
        losses += r.getDouble(5) / n
      }
      // back to raw space: w_j = w'_j / sd_j, b = b' - Σ w'_j mu_j / sd_j
      val wRaw = (1 to 4).map(j => w(j) / sd(j - 1))
      val bias = w(0) - (1 to 4).map(j => w(j) * mu(j - 1) / sd(j - 1)).sum
      ((bias +: wRaw).toArray, losses.toSeq)
    } finally feats.unpersist()
  }

  /** Stopword-profile language ID: count tokens from each language's
    * stopword list; highest count wins, ties broken by fixed language
    * priority (en, de, es, fr, zh), 'und' when no stopwords hit at all.
    */
  def langId(docs: DataFrame): DataFrame = {
    val toks = wsTokens(lower(col("text")))
    val langs = Seq("en", "de", "es", "fr", "zh")
    val scored = docs.select(col("doc_id") +: col("lang").as("labeled_lang") +:
      langs.map(l => stopwordCount(toks, Stopwords(l)).as(s"s_$l")): _*)
    val best = langs.foldRight(lit("und")) { (l, rest) =>
      val isMax = langs.filter(_ != l)
        .map(o => col(s"s_$l") >= col(s"s_$o"))
        .reduce(_ && _)
      when(col(s"s_$l") > 0 && isMax, lit(l)).otherwise(rest)
    }
    scored.withColumn("predicted_lang", best)
      .select(col("doc_id"), col("labeled_lang"), col("predicted_lang"),
        col("s_en"), col("s_de"), col("s_es"), col("s_fr"), col("s_zh"))
  }

  /** Bigram-LM perplexity scoring — the CCNet/KenLM-style quality signal:
    * train add-one-smoothed bigram probabilities on the corpus itself,
    * then score each document by its mean negative log-probability
    * (nats) and perplexity exp(avg_nlp). High-ppl docs are gibberish /
    * boilerplate candidates; low-ppl docs are repetitive.
    *
    * P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V), V = |vocab|.
    *
    * Shape at scale: bigrams come from a codegen positional-shingle pass
    * (map-side, no lambda recompute); per-(doc, bigram) multiplicities
    * aggregate FIRST, and the corpus-wide bigram count is a
    * partial-aggregating groupBy over tf + a probe join back — NEVER a
    * sum over a Window.partitionBy(bg): the background count's whole
    * point is that some bigrams ("of the") appear in nearly every
    * document, and WindowExec would buffer that bigram's entire
    * (doc, bg, tf) row set in ONE task, while the groupBy collapses it
    * to one row per map partition and the join back streams
    * (AQE-skew-splittable) — the [[graft.ml.Dedup.dupNgramSpans]]
    * lesson applied to the text-stats tier. The tf exchange on
    * (doc_id, bg) is planned identically under both consumers, so
    * ReuseExchange computes the explode once. The unigram-context count
    * joins on the gram's first token and V broadcasts as a 1-row
    * aggregate. avg_nlp is a tf-weighted mean so repeated bigrams never
    * re-shuffle as duplicate rows.
    */
  def lmPerplexity(docs: DataFrame): DataFrame = {
    val toks = split(trim(lower(col("text"))), "\\s+")
    val tok = docs.select(col("doc_id"), explode(toks).as("w"))
    val uni = tok.groupBy(col("w")).agg(count(lit(1)).as("cu"))
    // count(cu), not count(1): cu is never null so the value IS the
    // vocab size, but referencing it keeps this branch's uni subtree
    // identical to the w1-join probe's, so ReuseExchange plans the
    // token explode once (the tfidf df lesson — count(1) lets Catalyst
    // strip the aggregate and fork the scans)
    val vocab = uni.agg(count(col("cu")).as("vocab"))
    val tf = docs.select(col("doc_id"),
        explode(graft.functions.PosShingles.posShingles(toks, 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("tf"))
    // corpus-wide bigram count: partial-agg groupBy (a Zipf-hot bigram
    // collapses map-side) + probe join; exact same cb values as the
    // window sum it replaces, streaming exchange shape
    val cbTbl = tf.groupBy(col("bg")).agg(sum(col("tf")).as("cb"))
    val scored = tf.join(cbTbl, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(uni.withColumnRenamed("w", "w1"), "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("nlp",
        -log((col("cb") + lit(1.0)) / (col("cu") + col("vocab"))))
    scored.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        round(sum(col("tf") * col("nlp")) / sum(col("tf")), 6).as("avg_nlp"),
        round(exp(sum(col("tf") * col("nlp")) / sum(col("tf"))), 4).as("ppl"))
  }

  /** Doc-level form of [[pplBuckets]]: (doc_id, lang, ppl, bucket) per
    * document — the frame a curation pipeline FILTERS on ("keep head +
    * middle"), where [[pplBuckets]] is its reporting rollup.
    *
    * Shape at scale: tertile CUTPOINTS come from approx_percentile per
    * language (constant sketch state, map-side combine — the
    * w_ntile_approx convention, rank-exact inside the n <= accuracy/2
    * envelope, which the plan itself machine-checks via the woven
    * raise_error guard); the tiny (lang, cuts) table broadcasts onto a
    * map-side bucket assignment. No global or per-lang sort ever runs.
    *
    * The scored frame (doc_id, lang, ppl — ~20 B/row) is materialized
    * ONCE via an eager localCheckpoint: its two consumers (cutpoint
    * sketch + bucket assignment) would otherwise each recompute the
    * ENTIRE three-exchange LM pipeline over the raw text.
    * localCheckpoint, NOT persist: compiling a cached plan loses the
    * lm-internal ReusedExchange (measured: the cache materialization
    * itself ran the tokenize subtree twice, 54k records vs 28k), while
    * the checkpoint runs a normal QueryExecution where reuse fires —
    * and its blocks self-release via the ContextCleaner, so no
    * cache-lifetime contract is imposed on the caller.
    */
  def pplBucketed(docs: DataFrame, accuracy: Long = 1000000L): DataFrame = {
    // Shared construction-time Int-range check (SketchGuards, ADVICE
    // r12): Math.toIntExact below would throw anyway, but fail with the
    // envelope vocabulary, before any job runs.
    graft.functions.SketchGuards.requireSketchAccuracy(
      "pplBuckets", accuracy)
    // LEFT join, deliberately: an inner join on doc_id infers
    // isnotnull(doc_id) into the lm side only (the cb branch groups by
    // bg and never sees it), forking the tf subtrees and killing the
    // lm-internal ReusedExchange — measured 58.6k vs 32k records. A
    // left join infers nothing on the left keys; doc_id is never null
    // and always matches, so the rows are identical.
    val wl = lmPerplexity(docs).select(col("doc_id"), col("ppl"))
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"), "left")
      .localCheckpoint()
    // `accuracy` parameterized for the same reason as
    // [[perSourceQualityGate]]: QualitySpec fires this guard for real.
    val cuts = wl.groupBy(col("lang"))
      .agg(percentile_approx(col("ppl"),
        array(lit(1.0 / 3), lit(2.0 / 3)),
        lit(Math.toIntExact(accuracy))).as("cuts"),
        count(lit(1)).as("n_lang"))
    val envelopeZero = graft.functions.SketchGuards.rankExactEnvelope(
      "pplBuckets", " for a language", col("n_lang"), accuracy,
      "raise accuracy in lockstep", "int")
    wl.join(broadcast(cuts), "lang")
      .withColumn("bucket", lit(1) + envelopeZero
        + when(col("ppl") > col("cuts")(0), 1).otherwise(0)
        + when(col("ppl") > col("cuts")(1), 1).otherwise(0))
      .select(col("doc_id"), col("lang"), col("ppl"), col("bucket"))
  }

  /** CCNet-style per-language perplexity bucketing (Wenzek et al. 2020,
    * the public pipeline): score every document with the corpus bigram
    * LM ([[lmPerplexity]]) and split each language into HEAD / MIDDLE /
    * TAIL tertiles by perplexity — the standard "keep the head, sample
    * the middle, drop the tail" curation gate, per language so one
    * language's prose style never drains another's budget. Output:
    * (lang, bucket 1..3, n_docs, lo/hi/avg ppl) — the reporting rollup
    * of [[pplBucketed]], which carries the plan-shape contract.
    *
    * avg_ppl is a FIXED-POINT mean: ppl is round-4, so summing
    * round(ppl·10⁴) longs is exact under any partition order and the
    * final single division of exact integers is bit-identical across
    * engines (the charEntropy/dsirScore discipline — a double sum here
    * would be addition-order-dependent). */
  def pplBuckets(docs: DataFrame): DataFrame =
    pplBucketed(docs)
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("ppl")).as("lo_ppl"), max(col("ppl")).as("hi_ppl"),
        (sum(round(col("ppl") * lit(10000.0), 0).cast("long")).cast("double")
          / (lit(10000.0) * count(lit(1)))).as("avg_ppl"))

  /** Top-k terms per document by TF-IDF (tf · ln(N/df)).
    *
    * Shape at scale: tf is one shuffle on (doc_id, term); df is a
    * partial-aggregating groupBy over tf (already unique per pair) + a
    * probe join back on term — NEVER a count over a
    * Window.partitionBy(term): "the" appears in every document, so its
    * entire (doc_id, term, tf) row set would buffer in ONE WindowExec
    * task, while the groupBy collapses it to one row per map partition
    * and the probe join streams (AQE-skew-splittable) — the
    * [[graft.ml.Dedup.dupNgramSpans]] lesson; Zipf-hot terms are the
    * signal here, not cappable noise. The tf subtree is planned
    * identically under both consumers, so ReuseExchange computes the
    * explode once; the extra exchange carries only the vocab-sized
    * (term, df) table. N joins in as a broadcast 1-row aggregate — no
    * driver-side count. tfidf is rounded BEFORE ranking so the rank
    * order (tfidf desc, term) is reproducible across engines.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = docs.select(col("doc_id"),
        explode(wsTokens(lower(col("text")))).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // sum(least(tf, 1)), not count(1): tf >= 1 always, so the value IS
    // the pair count — but a plain count lets Catalyst eliminate tf's
    // aggregate from this branch entirely (it plans a bare distinct),
    // forking the two tf subtrees and blocking ReuseExchange into a
    // second corpus scan + explode. Genuinely consuming the tf value
    // keeps both branches' tf plans canonical-equal, so the tokenize
    // pass is planned ONCE (the ns_epochs_per_source inline lesson).
    val dfTbl = tf.groupBy(col("term"))
      .agg(sum(least(col("tf"), lit(1L))).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfTbl, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .as("tfidf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
  }

  /** Fixed-point (×1e6) quantization of a non-negative double for
    * ORDER-INDEPENDENT summation: float sums reassociate across
    * partitions, so any statistic built from Σ over corpus terms must
    * sum exact longs, not doubles (the lm_perplexity / PQ precedent).
    * Inputs here are already round-6'd (ulp-absorbed), so ×1e6 lands
    * within ~1e-7 of an integer and round() snaps deterministically. */
  private def fp6(c: Column): Column = round(c * lit(1000000)).cast("long")

  /** Per-source Zipf exponent: least-squares slope of ln(freq) on
    * ln(rank) over the source's term-frequency table (rank = position
    * under the TOTAL order (freq desc, term)). The canonical corpus
    * health statistic — natural text sits near slope −1; a source that
    * deviates hard (template spam: flat; boilerplate: cliff) is a
    * curation signal no per-document feature sees.
    *
    * Determinism: x/y are round-6 ln values (libm ulp absorbed — the
    * tfidf/lm precedent); all four regression sums are fixed-point
    * longs ([[fp6]]); numerator/denominator assemble in DECIMAL(38,0)
    * (exact integers — n·Sxy·1e6 would overflow a long on a large
    * open vocabulary, and ANSI mode makes that a crash, not a wrap);
    * the single final division is one IEEE op on bit-identical inputs.
    *
    * Scale shape: term counts are ONE partial-aggregating shuffle on
    * (source, term); the rank window partitions by source over the
    * vocab-sized aggregate (never the corpus — same shape as
    * tfidfTopTerms' df); the regression reduces each source to one row
    * map-side. A pathologically hot source's vocab is still its vocab:
    * the window buffers |vocab(source)| rows, not |corpus|. */
  def zipfSlope(docs: DataFrame): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    def dec(c: Column): Column = c.cast(dec38)
    val tf = docs.select(col("source"),
        explode(wsTokens(lower(col("text")))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("freq").desc, col("term"))
    val xy = tf.withColumn("rank", row_number().over(w))
      .select(col("source"),
        round(log(col("rank").cast("double")), 6).as("x"),
        round(log(col("freq").cast("double")), 6).as("y"))
    val sums = xy.groupBy(col("source")).agg(
      count(lit(1)).as("n"),
      sum(fp6(col("x"))).as("sx"), sum(fp6(col("y"))).as("sy"),
      sum(fp6(col("x") * col("y"))).as("sxy"),
      sum(fp6(col("x") * col("x"))).as("sxx"))
    val num = dec(col("n")) * dec(col("sxy")) * dec(lit(1000000L)) -
      dec(col("sx")) * dec(col("sy"))
    val den = dec(col("n")) * dec(col("sxx")) * dec(lit(1000000L)) -
      dec(col("sx")) * dec(col("sx"))
    sums.select(col("source"), col("n").cast("int").as("n_terms"),
      when(den === dec(lit(0L)), lit(0.0))
        .otherwise(graft.ops.QueryPack.r6(
          num.cast("double") / den.cast("double"))).as("zipf_slope"))
      .orderBy(col("source"))
  }

  /** Pairwise Jensen-Shannon divergence (nats) between the sources'
    * unigram distributions — the statistic behind "which domains are
    * redundant / which are distinct" mixture decisions (and the drift
    * metric between a corpus snapshot and a reference). JS is chosen
    * over KL because it is finite on disjoint support (absent terms are
    * p=0, handled exactly) and symmetric, so one row per unordered
    * pair suffices.
    *
    * Determinism: per-term probabilities are single exact long/long
    * IEEE divisions; each term's contribution is quantized to 1e-6
    * ([[fp6]] semantics, applied to the already-halved sum) so the
    * per-pair Σ is an exact long sum — identical under any partition
    * order; ln ulp drift is absorbed by the quantization exactly as in
    * tfidf/lm (same round-6 class).
    *
    * Scale shape: term counts are the same ONE corpus shuffle as
    * [[zipfSlope]] (sharing its (source, term) key); everything after
    * operates on the vocab-sized aggregate. Pair enumeration is
    * S²-quadratic BY SEMANTICS (every pair is an output row) — at
    * thousands of sources, cap to the top-K sources by token mass
    * first (ns_source_coverage's cut); the per-pair cost stays
    * |vocab(a) ∪ vocab(b)|. Only the S-sized source list carries a
    * broadcast HINT; the vocab-sized probability frames join unhinted —
    * Catalyst broadcasts them at small SFs from stats and degrades to a
    * shuffled join when the open vocabulary outgrows the cap, so no
    * corpus-sized exchange exists past the first and nothing crashes at
    * the 8 GB broadcast ceiling. */
  def sourceDivergence(docs: DataFrame): DataFrame = {
    val tc = docs.select(col("source"),
        explode(wsTokens(lower(col("text")))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
      // barrier: five consumers (tot, pa/pb probes, both support arms)
      // would otherwise each replan the tokenize+count subtree back to
      // the parquet scan (ReuseExchange only caught some branches —
      // the plan golden showed THREE corpus scans before this). The
      // frame is the vocab-sized aggregate (S×V rows), so the
      // checkpoint is pennies and the corpus is read ONCE.
      .localCheckpoint()
    val tot = tc.groupBy(col("source")).agg(sum(col("c")).as("nt"))
    val p = tc.join(tot, "source").select(col("source"), col("term"),
      (col("c").cast("double") / col("nt")).as("p"))
    val pa = p.select(col("source").as("src_a"), col("term"),
      col("p").as("pa"))
    val pb = p.select(col("source").as("src_b"), col("term"),
      col("p").as("pb"))
    val pairs = tot.select(col("source").as("src_a"))
      .crossJoin(broadcast(tot.select(col("source").as("src_b"))))
      .filter(col("src_a") < col("src_b"))
    val support = pairs.join(pa.select(col("src_a"), col("term")), "src_a")
      .select(col("src_a"), col("src_b"), col("term"))
      .union(pairs.join(pb.select(col("src_b"), col("term")), "src_b")
        .select(col("src_a"), col("src_b"), col("term")))
      .distinct()
    // No broadcast hints on pa/pb (r14, the contamination precedent):
    // the probability frames are S×V rows — vocab-sized, and open
    // vocabulary grows with the corpus, so a forced hint would hit the
    // 8 GB broadcast cap at scale and FAIL the query. Unhinted,
    // Catalyst still picks broadcast at gate SFs from stats and
    // degrades to a shuffled join at scale — the stats-driven shape
    // the cross-SF plan audit certifies.
    val pq = support
      .join(pa, Seq("src_a", "term"), "left")
      .join(pb, Seq("src_b", "term"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("pa"), lit(0.0)).as("p"),
        coalesce(col("pb"), lit(0.0)).as("q"))
    // expression shape mirrors the oracle token-for-token so every
    // intermediate double is bit-identical before the quantization
    val contrib = round((
      when(col("p") > 0,
        col("p") * log(lit(2.0) * col("p") / (col("p") + col("q"))))
        .otherwise(lit(0.0)) +
      when(col("q") > 0,
        col("q") * log(lit(2.0) * col("q") / (col("p") + col("q"))))
        .otherwise(lit(0.0))) * lit(0.5) * lit(1000000)).cast("long")
    pq.groupBy(col("src_a"), col("src_b"))
      .agg(graft.ops.QueryPack.r6(
          sum(contrib).cast("double") / lit(1000000)).as("js_div"),
        count(lit(1)).cast("int").as("n_terms"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Divergence-weighted mixture plan (r14 — composing
    * [[sourceDivergence]] into the decision it exists to feed): each
    * source's redundancy is its MINIMUM JS divergence to any other
    * source (a source that near-duplicates some other source has
    * min-JS ≈ 0; a distinct one is far from everything), and the
    * mixture share is that redundancy's share of the total — so
    * near-duplicate sources are down-weighted toward zero and
    * distinctive sources absorb their mass. Output per source:
    * (source, nearest_source, min_js, weight), nearest_source being
    * the argmin partner (the "who am I redundant with" pointer a
    * curation reviewer reads first). Weights sum to ~1 (exactly 1 in
    * fixed point before the final per-row rounding).
    *
    * Linear min-JS share rather than a softmax, deliberately: exp of
    * an IEEE sum is partition-order-dependent and needs a temperature
    * hyperparameter, while the linear share is exact in ×1e6 fixed
    * point (min of round-6 values, one long/long-derived IEEE division
    * per row) and preserves the same ordering; temperature shaping is
    * downstream policy (ns_sample_temperature's machinery). All-zero
    * redundancy (every source an exact distributional twin) degrades
    * to the uniform 1/S mix instead of dividing by zero.
    *
    * Scale shape: everything beyond [[sourceDivergence]]'s one corpus
    * shuffle operates on the S²-pair frame (S capped by the same
    * top-K-source-mass cut documented there); the argmin is a
    * min(struct) partial/final aggregate, no window. */
  /** Shared core of the divergence-driven mixture surface: per source,
    * the min-JS redundancy (argmin partner, ×1e6 fixed point) with the
    * 1-row grand total cross-joined on. The S²-row divergence table is
    * an eager localCheckpoint (r14, caught by the mix's own plan golden
    * at review): FOUR consumers — the sym union reads it twice, and
    * the broadcast grand-total duplicates both again — each replayed
    * the whole post-corpus JS aggregation (vocab-sized, so wasteful
    * rather than corpus-fatal; the corpus scan itself was already
    * behind sourceDivergence's internal checkpoint). */
  private def minJsShares(docs: DataFrame): DataFrame = {
    val js = sourceDivergence(docs).localCheckpoint()
    val sym = js.select(col("src_a").as("source"),
        col("src_b").as("partner"), col("js_div"))
      .unionAll(js.select(col("src_b").as("source"),
        col("src_a").as("partner"), col("js_div")))
    // min(struct): min js_div, ties to the lexicographically smallest
    // partner — deterministic in both engines (binary string order)
    val m = sym.groupBy(col("source"))
      .agg(min(struct(col("js_div"), col("partner"))).as("mn"))
      .select(col("source"), col("mn.js_div").as("min_js"),
        col("mn.partner").as("nearest_source"))
      .withColumn("fp", round(col("min_js") * lit(1000000)).cast("long"))
    val tot = m.agg(sum(col("fp")).as("tot_fp"),
      count(lit(1)).as("n_src"))
    m.crossJoin(broadcast(tot)) // 1-row total — the S-sized hint class
  }

  def divergenceWeightedMix(docs: DataFrame): DataFrame =
    minJsShares(docs)
      .select(col("source"), col("nearest_source"), col("min_js"),
        when(col("tot_fp") === 0,
          graft.ops.QueryPack.r6(lit(1.0) / col("n_src")))
          .otherwise(graft.ops.QueryPack.r6(
            col("fp").cast("double") / col("tot_fp").cast("double")))
          .as("weight"))
      .orderBy(col("source"))

  /** EXACT token-budget allocation from the divergence weights — the
    * step after [[divergenceWeightedMix]] in a mixture plan: split
    * `budget` tokens across sources proportionally to min-JS redundancy
    * such that the allocations are integers and SUM EXACTLY to the
    * budget (a rounded-double split drifts by up to S tokens and a
    * downstream packer then over/under-fills the final shard).
    * Largest-remainder (Hamilton) apportionment in pure long
    * arithmetic: floor(budget·fp / tot) per source, then the shortfall
    * (< S by construction) goes to the S_short largest remainders
    * (ties to the lexicographically first source). The all-twin corpus
    * (every min-JS zero) degrades to the uniform apportionment by
    * substituting fp=1 per source. Every step is exact integer math —
    * products stay ≤ budget·ln(2)·1e6 ≈ 7e14·(budget/1e9), long-safe
    * for budgets to ~10^13 — so the DuckDB oracle replays bit-exactly.
    *
    * Scale: S-row arithmetic after [[minJsShares]]'s one corpus
    * shuffle; the remainder rank is a window over S rows. */
  def divergenceBudgetAlloc(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, "divergenceBudgetAlloc needs a positive budget")
    val shares = minJsShares(docs)
      .withColumn("fpe",
        when(col("tot_fp") === 0, lit(1L)).otherwise(col("fp")))
      .withColumn("tote",
        when(col("tot_fp") === 0, col("n_src")).otherwise(col("tot_fp")))
      .withColumn("prod", lit(budget) * col("fpe"))
      .withColumn("fl", expr("prod DIV tote"))
      .withColumn("rem", pmod(col("prod"), col("tote")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("source"))
    val totals = shares.agg(sum(col("fl")).as("fl_sum"))
    shares.withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(totals))
      .select(col("source"), col("min_js"),
        (col("fl") + when(col("rk") <= lit(budget) - col("fl_sum"), 1L)
          .otherwise(0L)).as("alloc_tokens"))
      .orderBy(col("source"))
  }
}
