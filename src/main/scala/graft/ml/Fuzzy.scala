package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching (entity resolution / near-identical title-URL
  * dedup): SymSpell-style recall-GUARANTEED candidate generation via
  * deletion neighborhoods, verified with exact Levenshtein distance.
  *
  * The classic result behind the signature scheme: if lev(a, b) ≤ d then
  * the ≤d-deletion neighborhoods of a and b intersect (delete the edited
  * positions of any ≤d-edit alignment from each side and both reach the
  * same string), so joining on deletion variants finds EVERY qualifying
  * pair — banding-free exactness, unlike probabilistic LSH. The verify
  * step makes precision exact, so output equals the brute-force pair set.
  *
  * Scale shape (mirrors [[Similarity.cosineDupPairsBanded]]): the
  * signature self-join shuffles (signature, id) pairs only — a string of
  * length L yields ~C(L,d) short variants, linear work per row — and
  * strings are re-fetched just for the verified candidate ids. The
  * quadratic all-pairs comparison never materializes. Everything is
  * built-ins (sequence/transform HOFs + levenshtein), no UDFs.
  */
object Fuzzy {

  /** All strings obtained by deleting exactly one character (as an array
    * column). `substr` with Column args keeps positions dynamic. */
  private def deleteOne(s: Column): Column =
    transform(sequence(lit(0), greatest(length(s) - 1, lit(0))),
      i => concat(substr(s, lit(1), i), substr(s, i + lit(2), length(s))))

  /** Deletion neighborhood of `s` up to `maxEd` deletes (includes `s`
    * itself), distinct. maxEd ≤ 2 keeps variant counts ~C(L,2). */
  def deletionVariants(s: Column, maxEd: Int): Column = {
    require(maxEd >= 1 && maxEd <= 2, s"maxEd must be 1 or 2, got $maxEd")
    val d1 = array_distinct(concat(array(s), deleteOne(s)))
    if (maxEd == 1) d1
    else array_distinct(flatten(transform(d1,
      t => concat(array(t), deleteOne(t)))))
  }

  /** All id pairs whose `strCol` values are within Levenshtein `maxEd`,
    * with the exact distance. Output: (id_a, id_b, edit_dist),
    * id_a < id_b. */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
      maxEd: Int): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
    // persist: feeds the two-sided signature join and the verify lookups
    // (same barrier rationale as Dedup.shingled / cosineDupPairsBanded)
    val sigs = base
      .withColumn("sig", explode(deletionVariants(col("s"), maxEd)))
      .select(col("id"), col("sig"))
      .persist()
    sigs.count()
    val l = sigs.select(col("id").as("id_a"), col("sig"))
    val r = sigs.select(col("id").as("id_b"), col("sig"))
    val cands = l.join(r, "sig").filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cands
      .join(base.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).as("edit_dist"))
      .filter(col("edit_dist") <= maxEd)
  }
}
