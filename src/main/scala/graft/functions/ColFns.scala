package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level (codegen'd, no UDF) versions of the Normalize semantics.
  * Everything here compiles to built-in Catalyst expressions so it stays
  * inside whole-stage codegen and is pushdown/prune friendly.
  */
object ColFns {

  /** F1 to_key as a Column: lower + global regexp_replace with the exact
    * reference char class (app.js:99). Spark regexp_replace is global. */
  def toKeyCol(c: Column): Column =
    regexp_replace(lower(c), Normalize.KeyPunctRegex, "_")

  /** F2: strip trailing underscores. */
  def trimTrailingUnderscoresCol(c: Column): Column =
    regexp_replace(c, "_+$", "")

  /** F3 brand/model split (app.js:579-582): brand = first token; model =
    * rest re-joined; single-token input keeps the full string for both. */
  def brandCol(model: Column): Column = split_part(model, lit(" "), lit(1))

  def modelCol(model: Column): Column = {
    val parts = split(model, " ", -1)
    when(size(parts) <= 1, model)
      .otherwise(array_join(slice(parts, lit(2), size(parts) - 1), " "))
  }

  /** F4: device segment of a URL (`com/<device>_...`), iOS brand override. */
  def deviceCol(url: Column): Column =
    split_part(split_part(url, lit("com/"), lit(2)), lit("_"), lit(1))

  def brandWithIosOverride(device: Column, default: Column): Column =
    when(device === "ios", lit("Apple")).otherwise(default)

  /** F13: strip query string + fragment from a URL. */
  def normalizeUrlCol(url: Column): Column =
    regexp_replace(url, "[?#].*$", "")

  /** F9: comma-join values, append optional unit, trim (app.js:702).
    * nullReplacement "" keeps a null element's comma ("a,,b"), matching
    * JS Array.toString — without it array_join DROPS the element and
    * the Scala twin disagreed on null-bearing rows (r13 review). */
  def valuesWithUnitCol(values: Column, unit: Column): Column =
    trim(concat(array_join(values, ",", ""), coalesce(unit, lit(""))))

  /** Keep only the LAST entry per key of an array<struct> of map entries —
    * the expression-level equivalent of mapKeyDedupPolicy=LAST_WIN (JS
    * object-assignment semantics, app.js:627) WITHOUT mutating session
    * conf: downstream map_from_entries sees unique keys, so Spark 4's
    * EXCEPTION default never fires. O(n²) per row; spec maps are small.
    *
    * keyField names the struct field holding the key ("key" for
    * map_entries output, caller-chosen for hand-built structs).
    */
  def lastWinsEntries(entries: Column, keyField: String = "key"): Column =
    filter(entries, (e, i) =>
      !exists(slice(entries, i + lit(2), size(entries)),
        e2 => e2.getField(keyField) === e.getField(keyField)))
}
