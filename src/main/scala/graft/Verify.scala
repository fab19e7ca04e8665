package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL would otherwise make
    * the driver's json.load fail and silently zero the round's
    * correctness. Exposed for VerifySpec's round-trip property. */
  private[graft] def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Every double-quoted string literal in `txt`, still escaped,
    * in order. Hand-rolled scanner, NOT a regex: the obvious
    * `"((?:[^"\\]|\\.)*)"` pattern recurses per character inside
    * java.util.regex's alternation machinery and StackOverflowErrors
    * on this file's multi-KB SQL strings (observed at 174 queries).
    * Pairing the literals up ({"k": "v", ...} holds only string
    * literals) reconstructs the oracle map with no unescape/re-escape
    * cycle. */
  private[graft] def stringLiterals(txt: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < txt.length) {
      if (txt.charAt(i) == '"') {
        val start = i
        i += 1
        while (i < txt.length && txt.charAt(i) != '"') {
          if (txt.charAt(i) == '\\') i += 1 // skip the escaped char
          i += 1
        }
        if (i < txt.length) out += txt.substring(start, i + 1)
      }
      i += 1
    }
    out.result()
  }

  /** Prior oracle_sql.json entries (still-escaped key/value literals)
    * that may survive a targeted-run merge: the query must still EXIST
    * in the registry AND its oracle SQL text must still MATCH it. A
    * renamed/deleted query's stale entry (plus its frozen parquet dump)
    * would keep "validating" forever, and — the subtler hazard — a
    * query whose implementation AND oracle were both edited but which
    * wasn't in this run's `only` filter would keep its OLD SQL
    * validating its OLD parquet dump: green correctness certifying the
    * previous build. Dropping text-mismatched entries (stderr-counted)
    * forces those queries to be re-dumped before they count as
    * validated. Exposed for VerifySpec. */
  private[graft] def keepablePrior(priorJson: String,
      registry: Map[String, String]): Map[String, String] = {
    val liveSql = registry.map { case (k, v) => jsonQuote(k) -> jsonQuote(v) }
    val pairs = stringLiterals(priorJson)
      .grouped(2).collect { case Seq(k, v) => k -> v }.toSeq
    val stale = pairs.collect {
      case (k, v) if liveSql.get(k).exists(_ != v) => k }
    if (stale.nonEmpty) System.err.println(
      s"[verify] dropped ${stale.size} prior oracle entries whose SQL " +
        s"no longer matches the registry (re-dump to revalidate): " +
        stale.mkString(", "))
    pairs.collect {
      case (k, v) if liveSql.get(k).contains(v) => k -> v }.toMap
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic planning: without this the custom strategy/rules
    // activate mid-run at whatever point w_topk_heap happens to execute
    graft.plans.TopK.ensurePlanning(spark)
    new java.io.File(outDir).mkdirs()
    // targeted-iteration knob (builder-side only; the driver sets
    // nothing, so its runs dump every query): comma-separated names
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // Queries whose dump THREW: any stale dump dir from a previous run
    // must go — otherwise the unchanged SQL validates the previous
    // build's parquet and the breakage reads GREEN (the same hazard
    // keepablePrior closes for text-drifted entries; r13 review). The
    // oracle SQL entry is still WRITTEN (r14, ADVICE): selfcheck/the
    // driver iterate oracle keys, so an entry pointing at the deleted
    // dump fails loudly as "spark result unreadable" — dropping the
    // entry too would make the broken query silently disappear from the
    // gate (n_fail stays 0 over one fewer query).
    val failed = scala.collection.mutable.Set.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name
        val stale = new java.io.File(s"$outDir/$name")
        if (stale.exists())
          org.apache.commons.io.FileUtils.deleteDirectory(stale)
      }
      finally spark.catalog.clearCache() // free per-query persisted intermediates
    }
    // With the filter active, MERGE into any existing oracle_sql.json
    // instead of clobbering the full map: a targeted run into an outDir
    // previously populated by a full run would otherwise leave stale
    // per-query parquet dirs next to a shrunken oracle map, and a
    // downstream consumer would silently validate fewer queries. The
    // existing file is this writer's own flat `"k": "v"` format, so the
    // still-escaped pairs splice through verbatim (no unescape cycle).
    val fresh = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => jsonQuote(k) -> jsonQuote(v) }
    val oraclePath = Paths.get(s"$outDir/oracle_sql.json")
    val prior: Map[String, String] =
      if (only.isDefined && Files.exists(oraclePath))
        keepablePrior(Files.readString(oraclePath), SparkEntry.oracleSql)
      else Map.empty
    // fresh overrides prior, so a failed query's entry is the CURRENT
    // SQL pointing at its deleted dump — a guaranteed loud FAIL, never
    // a stale green (its previous dump is gone and the prior entry is
    // replaced, not merged around)
    val json = (prior ++ fresh)
      .map { case (k, v) => s"$k: $v" }.mkString("{", ",", "}")
    Files.writeString(oraclePath, json)
    if (failed.nonEmpty) System.err.println(
      s"[verify] ${failed.size} dumps FAILED (oracle entries kept so the " +
        s"compare reds them): ${failed.toSeq.sorted.mkString(", ")}")
    spark.stop()
  }
}
