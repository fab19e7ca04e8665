package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.WordShingles

/** Corpus-quality operators a pre-training data pipeline runs before
  * anything else: within-document repetition signals (the Gopher §A1.1
  * repetition filters), cross-document boilerplate n-gram coverage (the
  * C4/CCNet "remove spans seen in many pages" signal), and PII/ID
  * scrubbing. All are per-document or per-n-gram aggregations — shuffles
  * carry (doc_id, gram) pairs, never full texts, so every plan here is
  * linear in corpus size at 100 TB.
  */
object Quality {

  /** Within-doc repetition stats per document: the fraction of word
    * n-gram occurrences that are duplicated inside the document and the
    * most-frequent-token share — the two cheap repetition filters used to
    * drop degenerate (looping / listy) documents before training.
    *
    * Shape: posexplode to (doc_id, pos, tok), n-grams via per-document
    * `lead()` windows, then hash aggregations. Partitioning is by doc_id
    * (high cardinality; a partition is one document's tokens), so the plan
    * scales linearly. No HOF lambdas in the hot path (NOTES.md §7).
    */
  def repetitionStats(docs: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val tok = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      // barrier: THREE consumers (gram windows, top-token agg, token
      // count) each replanned the tokenize back to the parquet scan
      // (they shuffle on different keys, so ReuseExchange cannot help;
      // measured 3 scans in the executed plan — r13 review). The frame
      // is narrow (id + pos + token) and ContextCleaner-released.
      .localCheckpoint()
    // concat_ws skips NULLs, so trailing positions (fewer than n tokens
    // left) would emit short grams — the lead(n-1) null check drops them.
    val grams = tok
      .withColumn("g", concat_ws(" ",
        (0 until n).map(i => if (i == 0) col("tok") else lead(col("tok"), i).over(w)): _*))
      .withColumn("keep", lead(col("tok"), n - 1).over(w).isNotNull)
      .filter(col("keep"))
      .select(col("doc_id"), col("g"))
    val dup = grams.groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_occ"))
    val top = tok.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("c").desc, col("tok"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("tok").as("top_token"), col("c").as("top_cnt"))
    val nt = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tokens"))
    nt.join(top, "doc_id").join(dup, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("top_token"),
        round(col("top_cnt").cast("double") / col("n_tokens"), 6).as("top_token_frac"),
        round(col("dup_occ").cast("double") / col("n_grams"), 6).as("dup_gram_frac"))
  }

  /** Cross-document boilerplate coverage: for each document, how many of
    * its distinct word n-grams also appear in at least `minDocs` documents
    * corpus-wide (headers, footers, license blurbs, templated spans).
    * High coverage flags a page as boilerplate-dominated.
    *
    * Shape: codegen WordShingles (distinct per doc, so a plain count per
    * gram IS the document frequency), one groupBy on the gram HASH PAIR,
    * a semi-join back. The shuffle key is (xxhash64, murmur3) of the
    * n-gram (strings drop before any exchange) — corpus-frequency-
    * bounded, never quadratic. Documents shorter than n tokens have no grams and are
    * excluded (mirrored in the oracle).
    */
  def boilerplateCoverage(docs: DataFrame, n: Int = 6, minDocs: Int = 2): DataFrame = {
    // The gram frame shuffles and checkpoints as (doc_id, gram-hash
    // PAIR) — 24 B/row instead of carrying the ~40-byte gram strings
    // (the dup-span convention: the output is COUNTS, so the string can
    // drop before any exchange). The key is TWO independent hashes
    // (xxhash64 + murmur3 — ~96 bits; r14, ADVICE): a single 64-bit
    // hash colliding would merge two distinct grams' document
    // frequencies, and while the raw-string oracle reds that at gate
    // SFs, LIBRARY use on another corpus would absorb it silently.
    // The pair pushes the corpus size where a collision is even
    // 1%-likely past 10^13 grams. The checkpoint is the
    // three-consumer barrier: df table, semi-join probe, and per-doc
    // totals each replanned the tokenize+shingle back to the parquet
    // scan (3 scans measured in the executed plan — r13 review).
    val g = docs.select(col("doc_id"),
      explode(WordShingles.wordShingles(split(col("text"), " "), n)).as("ng"))
      .select(col("doc_id"), xxhash64(col("ng")).as("gh"),
        hash(col("ng")).as("gh2"))
      .localCheckpoint()
    val boiler = g.groupBy(col("gh"), col("gh2"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("gh"), col("gh2"))
    val per = g.join(boiler, Seq("gh", "gh2"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_boiler"))
    val tot = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    tot.join(per, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        round(coalesce(col("n_boiler"), lit(0L)).cast("double") / col("n_grams"), 6)
          .as("boiler_frac"))
  }

  /** Long digit runs — account/customer IDs embedded in free text. */
  val IdPat = "\\d{6,}"
  /** Email-shaped spans (none exist in the synthetic data; the pattern
    * still exercises the multi-pattern scrub path end-to-end). */
  val EmailPat = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+\\.[a-zA-Z]{2,}"

  /** PII/ID scrubbing: mask long numeric identifiers and email-shaped
    * spans in free-text columns, reporting the redaction count per row.
    * Pure codegen `regexp_replace`/`regexp_extract_all` projections — no
    * shuffle at all; at 100 TB this runs map-side at scan speed.
    * (Patterns use only portable regex syntax — char classes and bounded
    * repetition — identical under Java regex and RE2.)
    */
  def scrubPii(customer: DataFrame): DataFrame = {
    // Count ID matches on the email-scrubbed text (mirroring replacement
    // order) so a digit run inside an email is not double-counted: the
    // replacement masks it once, and n_redactions reports actual edits.
    val emailScrubbed = regexp_replace(col("c_name"), EmailPat, "<EMAIL>")
    customer.select(col("c_custkey"),
      regexp_replace(emailScrubbed, IdPat, "<ID>").as("name_scrubbed"),
      (size(regexp_extract_all(emailScrubbed, lit(IdPat), lit(0))) +
        size(regexp_extract_all(col("c_name"), lit(EmailPat), lit(0))))
        .cast("long").as("n_redactions"))
  }
}
