package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenization + word-shingle helpers for the dedup/text-analysis ops.
  * All pure Column expressions (codegen'd higher-order functions, no UDFs).
  *
  * Shingle width 5 is deliberate: the synthetic corpus draws from a ~30
  * word vocabulary, so 3-gram shingles collide between unrelated documents
  * at a rate that makes the inverted-index candidate set quadratic at
  * scale; 5-grams keep random collisions ~4e-4 per pair while near-dup
  * pairs still share almost all shingles.
  */
object Shingles {

  /** Whitespace tokens (JS `split(' ')` semantics on single spaces). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles from a TOKENS column; empty array when
    * the doc is shorter than n tokens (sequence() would otherwise generate
    * a DESCENDING range and index out of bounds).
    *
    * Takes tokens, not text, so callers can materialize the token array
    * behind a persist barrier — referencing a `split()` expression from a
    * higher-order lambda would otherwise re-run the split per gram after
    * projection collapse. slice+concat_ws references the array once per
    * gram (vs n element_at calls).
    */
  def wordShinglesFromTokens(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    array_distinct(when(size(toks) >= n, grams).otherwise(array().cast("array<string>")))
  }
}
