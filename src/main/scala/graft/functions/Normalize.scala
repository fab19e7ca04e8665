package graft.functions

import java.util.Locale

/** Pure (Spark-free) normalization functions re-expressing the reference's
  * key/record semantics (reference: /root/reference/app.js).
  *
  * Each function documents the app.js line it derives its contract from;
  * semantics are transcribed from observed behavior, not code copied (the
  * reference is JavaScript).
  */
object Normalize {

  /** F1 `to_key` (app.js:99): lowercase, then map every whitespace char and
    * every ASCII punctuation char EXCEPT `_` and `\` to `_`.
    *
    * The reference char class is `\s|[!"#$%&'()*+,-./:;<=>?@\[\]\^`{|}~]`
    * (`,-.` is the range 0x2C-0x2E). Note it is NOT idempotent: runs of
    * punctuation become runs of underscores, and no collapsing happens.
    */
  private[graft] final val KeyPunctRegex =
    """\s|[!"#$%&'()*+,\-./:;<=>?@\[\]^`{|}~]"""

  def toKey(t: String): String =
    t.toLowerCase(Locale.ROOT).replaceAll(KeyPunctRegex, "_")

  /** F2 (app.js:100): strip trailing underscores off a key during map merge. */
  def trimTrailingUnderscores(k: String): String = k.replaceAll("_+$", "")

  /** A7 `merge_array_object` (app.js:100): fold a sequence of (key, value)
    * pairs into one map; keys get trailing `_` stripped; later entries win.
    */
  def mergeSpecs(pairs: Seq[(String, String)]): Map[String, String] =
    pairs.foldLeft(Map.empty[String, String]) { case (acc, (k, v)) =>
      acc + (trimTrailingUnderscores(k) -> v)
    }

  /** F3 brand/model split (app.js:579-582 et al.): first space-separated
    * token is the brand; the rest re-joined is the model. A single-token
    * model keeps the full string as BOTH brand and model (no shift happens
    * when `modelname.length == 1`).
    *
    * JS `"a b".split(' ')` splits on every single space (empty strings kept
    * for doubled spaces), matching Scala `split(" ", -1)`.
    */
  def splitBrandModel(model: String): (String, String) = {
    val parts = model.split(" ", -1)
    if (parts.length <= 1) (model, model)
    else (parts.head, parts.tail.mkString(" "))
  }

  /** F4 device-from-URL (app.js:630-634): `url.split('com/')[1].split('_')[0]`,
    * with brand forced to "Apple" when the device segment is "ios".
    * Returns empty string when "com/" is absent (JS would throw; we total-ize
    * — the quarantine path in the reference logs-and-skips such rows).
    */
  def deviceFromUrl(url: String): String = {
    // split, not substring-after-first: JS split('com/')[1] is the
    // segment BETWEEN the first and second "com/" — a URL like
    // "cdn.com/x.com/ios_1" yields "x.", and ColFns.deviceCol's
    // split_part agrees; substring(i+4) kept everything after the
    // first match and diverged row-for-row on such URLs (r13 review)
    val parts = url.split("com/", -1)
    if (parts.length < 2) ""
    else parts(1).split("_", -1).head
  }

  def brandForDevice(device: String, default: String): String =
    if (device == "ios") "Apple" else default

  /** F13 URL normalize (app.js:73): strip query string and fragment.
    * indexOf-based, not split().head: Java split drops TRAILING empty
    * strings, so "?" split on '?' is the empty array and .head threw —
    * JS split keeps empties and returns "" there, as does the Column
    * twin ColFns.normalizeUrlCol (r13 review). */
  def normalizeUrl(url: String): String = {
    val q = url.indexOf('?')
    val noQuery = if (q >= 0) url.substring(0, q) else url
    val h = noQuery.indexOf('#')
    if (h >= 0) noQuery.substring(0, h) else noQuery
  }

  /** F8 continuation merge (app.js:553-563): fold a spec table's
    * (title, subtitle, content) triples into key/value pairs. A 1-char
    * subtitle marks a continuation row: its content is appended (space-
    * separated) to the previous key's value; at position 0 the key is just
    * the title. Values are trimmed before appending, as in the reference.
    *
    * Mirrors the JS exactly, including the quirk that a continuation row
    * whose previous key was never written produces a value prefixed with
    * "undefined " in JS; here we treat the missing previous value as ""
    * and document the divergence (the quarantine path would drop such rows).
    */
  def foldSpecRows(title: String, subtitles: Seq[String], contents: Seq[String]): Seq[(String, String)] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (i <- subtitles.indices) {
      val content = if (i < contents.length) contents(i).trim else ""
      if (subtitles(i).length == 1) {
        if (i - 1 < 0) out(toKey(title)) = content
        else {
          val k = toKey(s"${title}_${subtitles(i - 1)}")
          out(k) = out.getOrElse(k, "") + " " + content
        }
      } else {
        out(toKey(s"${title}_${subtitles(i)}")) = content
      }
    }
    out.toSeq
  }

  /** J3 positional zip (app.js:626-627, 669-670): zip parallel key/data
    * arrays; on length mismatch the reference logs and backfills missing
    * data with `|| ''`. Extra data beyond keys is dropped (JS iterates keys).
    */
  def zipSpecs(keys: Seq[String], values: Seq[String]): Seq[(String, String)] =
    keys.zipWithIndex.map { case (k, i) =>
      k -> (if (i < values.length && values(i) != null) values(i) else "")
    }

  /** J1 `find_difference` (app.js:101-112): nested-loop anti-join a \ b,
    * returning b verbatim when a is empty, and dropping falsy (null/empty)
    * elements of a.
    */
  def findDifference(a: Seq[String], b: Seq[String]): Seq[String] =
    if (a.isEmpty) b
    else a.filter(x => x != null && x.nonEmpty && !b.contains(x))

  /** Chunking math (app.js:345, 401-417): slice a key set into
    * `ceil(n/width)` chunks of at most `width` keys (150 in the reference).
    * Parquet needs no chunking; kept for the compatibility view + tests.
    */
  def chunkKeys[A](keys: Seq[A], width: Int = 150): Seq[Seq[A]] =
    keys.grouped(width).toSeq

  /** F12 part-number parse (app.js:342): extract the numeric suffix of a
    * `<table>_pN` part-table name. */
  def partNumber(tableName: String): Option[Int] = {
    val m = "_p(\\d+)$".r.findFirstMatchIn(tableName)
    m.map(_.group(1).toInt)
  }

  /** F9 values+unit concat (app.js:702): JS `Array.toString` = comma join
    * — null/undefined elements render EMPTY with the comma kept
    * ("a,,b"), so nulls map to "" before the join (mkString would print
    * "null"; the Column twin passes "" as array_join's nullReplacement
    * for the same reason; r13 review) — then append unit (empty when
    * absent), then trim. */
  def valuesWithUnit(values: Seq[String], unit: Option[String]): String =
    (values.map(v => if (v == null) "" else v).mkString(",") +
      unit.getOrElse("")).trim
}
