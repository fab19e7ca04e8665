package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** BENCH_FLOOR.json: per-query min across all prior rounds' benches —
    * the committed baseline that makes regressions decidable on a box
    * with documented 5x co-tenant noise (NOTES.md §9). Flat
    * {"query":seconds} JSON; parsed with a regex to stay
    * dependency-free. */
  def loadFloor(path: String): Map[String, Double] =
    try {
      val txt = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
      "\"([A-Za-z0-9_]+)\"\\s*:\\s*([0-9.Ee+-]+)".r
        .findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble)
        .toMap
    } catch {
      case t: Throwable =>
        // an empty vs_floor must be distinguishable from a missing floor
        // file: without this warning a corrupt BENCH_FLOOR.json silently
        // kills the regression signal
        System.err.println(s"WARN Bench: floor file '$path' unreadable (${t.getClass.getSimpleName}: ${t.getMessage}); vs_floor will be empty")
        Map.empty
    }

  /** Nearest ancestor of the launch cwd containing build.sbt — the repo
    * root wherever the checkout lives. Guard files resolve against
    * this, so neither a cwd-relative miss (silently disables the floor
    * logic) nor a machine-specific absolute fallback is needed. */
  def repoRoot(): Option[java.nio.file.Path] = {
    var d = java.nio.file.Paths.get(
      sys.props.getOrElse("user.dir", ".")).toAbsolutePath
    while (d != null && !java.nio.file.Files.exists(d.resolve("build.sbt")))
      d = d.getParent
    Option(d)
  }

  /** (load1, load5) from /proc/loadavg — the ambient-load evidence a
    * DRIVER-side bench run carries with it (r16, verdict #2): the
    * builder can wrap its own runs in tools/floor_seed.py's context
    * recorder, but not the driver's, so the run must self-evidence.
    * (-1, -1) when unreadable (non-Linux) — visibly absent, never a
    * silent zero that reads as "idle box". */
  def loadAvg(): (Double, Double) =
    try {
      val parts = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim.split("\\s+")
      (parts(0).toDouble, parts(1).toDouble)
    } catch { case _: Throwable => (-1.0, -1.0) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (load1Before, load5Before) = loadAvg()
    val wallT0 = System.nanoTime()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // targeted-bisect knobs: ONLY=comma-sep query names, REPS=min-of-N
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val reps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic planning across the whole run (see Verify)
    graft.plans.TopK.ensurePlanning(spark)
    // Warm the session (codegen, parquet footer reads, JIT) before timing.
    try SparkEntry.queries.get("q1_agg").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => }
    // None = the query THREW: a failed rep must never produce a number —
    // a broken query exits in milliseconds, and since BENCH_FLOOR.json is
    // a min-over-rounds, one such "measurement" would become the
    // permanent floor (every later healthy run reads as a regression) and
    // the breakage itself would look like a speedup (r13 review).
    def timeOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case t: Throwable =>
          System.err.println(s"WARN Bench: query '$name' FAILED " +
            s"(${t.getClass.getSimpleName}: ${t.getMessage}); rep discarded")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop caches a query may have persisted so later queries aren't
      // timed under another query's GC/storage pressure
      spark.catalog.clearCache()
      if (ok) Some(dt) else None
    }
    // floor loaded up front: queries with a heavy committed floor get extra
    // reps (see below) so their min-of-N is co-tenant-burst-proof in the
    // driver-visible artifact, not just in NOTES.md bisects.
    // resolve the floor file against the DISCOVERED repo root: if the
    // driver launches from elsewhere, a bare relative path silently
    // loads nothing and the adaptive anti-burst reps never fire — r7's
    // committed artifact carried a 6.6x co-tenant spike exactly that way
    val floorPath = sys.env.get("SPARK_GRAFT_FLOOR")
      .orElse(repoRoot().map(_.resolve("BENCH_FLOOR.json").toString))
      .getOrElse("BENCH_FLOOR.json")
    val floor = loadFloor(floorPath)
    // min-of-N per query (default 3): this box has bursty co-tenant load
    // (NOTES.md §9) and single-shot timings varied up to 5x across
    // identical binaries. Queries whose committed floor exceeds 0.5s are
    // the ones where a single unlucky rep shows up as a >2x "regression"
    // worth seconds — give those min-of-3 minimum.
    val repCounts = scala.collection.mutable.Map.empty[String, Int]
    val failedQueries = scala.collection.mutable.SortedSet.empty[String]
    // execution order, as actually run: JIT/family-warmth adjudications
    // (NOTES r15 entry 11) depend on WHICH queries ran before an
    // elevated one in the same JVM — record it so a driver run is
    // adjudicable from its own artifact (r16, verdict #2)
    val runOrder = scala.collection.mutable.ArrayBuffer.empty[String]
    val firstPass = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .flatMap { case (name, fn) =>
        runOrder += name
        val f = floor.get(name)
        val r = if (f.exists(_ > 0.5)) math.max(reps, 3) else reps
        var attempts = r
        var times = Seq.fill(r)(timeOnce(name, fn)).flatten
        // ADAPTIVE reps: if the min still exceeds 1.5x the committed
        // floor, it is either a real regression or a co-tenant burst that
        // outlasted the fixed reps (r6's worst-10 was dominated by
        // sub-0.2s-floor trivials at 3-6x — pure burst noise). Up to 3
        // extra reps decide which: a burst clears and the min converges
        // to the clean value; a regression stays visible at every rep.
        // Extra wall is bounded (3 reps, only on flagged queries).
        var extra = 0
        // fl > 0 guards a zero/corrupt floor entry from reading as an
        // infinite ratio and always burning the maximum extra reps
        while (extra < 3 && times.nonEmpty &&
            f.exists(fl => fl > 0 && times.min / fl > 1.5)) {
          times = times ++ timeOnce(name, fn)
          attempts += 1
          extra += 1
        }
        repCounts(name) = attempts
        // every rep threw → the query is BROKEN: report it in `failed`
        // on the summary line instead of a bogus near-zero time
        if (times.isEmpty) { failedQueries += name; None }
        else Some(name -> times.min)
      }
    // SECOND-PASS retry (r8 verdict): the in-place adaptive reps above
    // cannot outlast a co-tenant burst — the retries run immediately
    // after the slow rep, while the burst is still live (r8's committed
    // worst-10 was six such spikes, all clean on re-measurement).
    // Queries still >1.5x their committed floor re-time once more at
    // the END of the whole run, minutes later and temporally
    // decorrelated from whatever flagged them; keep the min. A real
    // regression survives the second pass at every rep.
    val flagged = firstPass.collect { case (q, v)
      if floor.get(q).exists(fl => fl > 0 && v / fl > 1.5) => q }.toSeq
    val results = firstPass ++ flagged.map { q =>
      repCounts(q) = repCounts.getOrElse(q, 0) + 1
      runOrder += q // second-pass retries are real executions: record them
      q -> timeOnce(q, SparkEntry.queries(q))
        .fold(firstPass(q))(math.min(firstPass(q), _))
    }
    def toJson(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Headline queries: the flagship agg, each dedup/similarity tier, a
    // broadcast join, a window, a streaming-shaped event agg, a scalar pack.
    val headline = Seq("q1_agg", "ns_dedup_exact", "ns_dedup_jaccard",
      "ns_dedup_minhash", "ns_dedup_minhash_salted", "ns_dedup_simhash",
      "ns_similarity_topk", "ns_similarity_lsh", "ns_similarity_pq",
      "ns_similarity_ivfpq", "ns_similarity_ivfpq_res",
      "ns_similarity_rebuild", "ns_cosine_dup_pairs",
      "ns_cosine_dup_pairs_banded", "ns_fuzzy_prefix_pairs",
      "ns_dup_ngram_spans", "ns_lm_perplexity", "ns_near_dedup_replay",
      "ns_gopher_rules", "ns_token_count_bpe", "join_broadcast_star",
      "w_row_number_topk", "w_topk_heap", "w_topk_global", "w_ntile_approx",
      "t_tumbling_window", "t_stream_static_enrich", "f13_url_pipeline")
    val head = headline.flatMap(h => results.get(h).map(h -> _))
    // vs_floor: current/floor ratio per query against the committed
    // per-query floor — >1 is slower than the best round ever recorded.
    val vsFloor = results.toSeq.sortBy(_._1).flatMap { case (q, v) =>
      floor.get(q).filter(_ > 0)
        .map(f => q -> (math.round(v / f * 100.0) / 100.0))
    }
    // Per-query detail and the FULL vs_floor map each on their own line
    // FIRST; the parseable summary line is printed LAST and kept compact
    // (headline + worst-10 vs_floor only, well under the driver's
    // 2000-char tail capture), because the driver keeps only the tail of
    // stdout — round 1's single giant line had its head (the total)
    // truncated away, and round 5's 125-entry vs_floor map on the final
    // line reintroduced exactly that (BENCH_r05 "parsed": null).
    println(s"""{"metric":"queries","queries":${toJson(results)},"sf":"$sfDir"}""")
    println(s"""{"metric":"vs_floor_full","vs_floor":${toJson(vsFloor)},"sf":"$sfDir"}""")
    // full execution order on its OWN line (210 names would blow the
    // final line's tail-capture budget); the final line carries its md5
    // so two artifacts are order-comparable even if this line scrolls
    // out of the captured tail
    println(s"""{"metric":"run_order","order":${
      runOrder.map("\"" + _ + "\"").mkString("[", ",", "]")},"sf":"$sfDir"}""")
    // worst-10 is the regression SIGNAL, so it lists only entries whose
    // absolute delta to floor is >= 0.5s: a 5x ratio on a 0.1s floor is
    // half a second of co-tenant scheduling noise, not a regression, and
    // letting such trivials crowd the list hid the real entries in r6.
    // The full ratio map (previous line) still carries every query.
    val worst10 = vsFloor
      .filter { case (q, _) =>
        floor.get(q).exists(f => results(q) - f >= 0.5) }
      .sortBy(-_._2).take(10)
    // n_queries: the total is a SUM over every registered query, so it
    // grows as coverage grows — comparisons across rounds should be
    // per-query or normalized by this count
    // `config` is the authoritative record of what this run actually used
    // — the driver's top-level `cpus` field in BENCH_r*.json records the
    // MACHINE's core count, not the bench master, which made the r9
    // artifact look misconfigured vs BASELINE.md (local[4]/shuffle=4);
    // floors are only comparable under an identical config. `reps` lists
    // the queries that got MORE than the base rep count (adaptive
    // anti-burst reps and/or the decorrelated second pass), so a
    // committed >1.5x-floor entry carries its own evidence of how many
    // measurements failed to clear it. Both ride the FINAL line because
    // the driver keeps only the tail of stdout.
    val extraReps = repCounts.toSeq.filter(_._2 > reps).sortBy(_._1)
      .map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    // `failed` names queries whose every rep THREW (no time recorded) —
    // normally empty; any entry is a build-level red the totals above
    // deliberately do not absorb
    val failedJson = failedQueries.map("\"" + _ + "\"").mkString("[", ",", "]")
    // `ambient`: the run's own co-tenancy evidence (r16, verdict #2) —
    // load averages straddling the run, wall-clock vs summed query time
    // (a large gap = scheduling pressure between queries), and the md5
    // of the execution order (JVM-warmth comparability across runs).
    // With these on the FINAL line, a driver-run regression face like
    // r15's 108.0-vs-105.2 is adjudicable from BENCH_r{N}.json alone.
    val (load1After, load5After) = loadAvg()
    val wallSec = (System.nanoTime() - wallT0) / 1e9
    val orderMd5 = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(runOrder.mkString(",").getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val ambient = s""""ambient":{"load1_before":$load1Before,""" +
      s""""load5_before":$load5Before,"load1_after":$load1After,""" +
      s""""load5_after":$load5After,"wall_sec":${math.round(wallSec * 100.0) / 100.0},""" +
      s""""order_md5":"$orderMd5"}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"failed":$failedJson,"config":{"master":"local[$cpus]","shuffle_partitions":$cpus,"base_reps":$reps},$ambient,"reps":$extraReps,"queries":${toJson(head)},"vs_floor_worst10":${toJson(worst10)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
