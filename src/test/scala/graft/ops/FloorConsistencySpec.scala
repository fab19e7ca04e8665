package graft.ops

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Artifact-consistency guard: the committed regression artifacts
  * (BENCH_FLOOR.json, SHUFFLE_FLOOR.json, the plan goldens) must stay in
  * lockstep with `SparkEntry.queries` — the failure mode is silent in
  * every direction:
  *
  *  - a query WITHOUT a bench floor never gets the adaptive anti-burst
  *    reps and its vs-floor ratio silently drops out of the artifact;
  *  - an ORPHANED floor key (query renamed/removed) pins nothing and
  *    pads the floor sum the driver's aggregate ratio is judged against;
  *  - a shuffle-guarded family member without a volume floor makes the
  *    ShuffleGuard pass vacuously for that query (it only `info`s);
  *  - a .plan golden whose query no longer exists guards nothing while
  *    looking like coverage.
  *
  * No SparkSession needed — this is pure bookkeeping over the committed
  * files, so it runs first and fails fast.
  */
class FloorConsistencySpec extends AnyFunSuite {

  private val root = graft.Bench.repoRoot()
    .getOrElse(fail("cannot locate repo root (no build.sbt ancestor)"))

  private val queryNames: Set[String] = SparkEntry.queries.keySet

  private val shuffleGuardedPrefixes = ShuffleGuardSpec.GuardedPrefixes

  test("every scored query has a bench floor; no orphaned floor keys") {
    val floors = graft.Bench.loadFloor(
      root.resolve("BENCH_FLOOR.json").toString)
    assert(floors.nonEmpty, "BENCH_FLOOR.json unreadable or empty")
    val missing = queryNames -- floors.keySet
    assert(missing.isEmpty,
      s"queries without a bench floor (seed with a min-of-3 bench run): " +
        missing.toSeq.sorted.mkString(", "))
    val orphans = floors.keySet -- queryNames
    assert(orphans.isEmpty,
      s"bench-floor keys with no matching query (stale after a rename?): " +
        orphans.toSeq.sorted.mkString(", "))
  }

  test("floor-context records pair with real floor entries") {
    // BENCH_FLOOR_CONTEXT.json (r15, verdict #5): tools/floor_seed.py
    // records load-avg + JVM-warmth context alongside every floor it
    // seeds, so ambient-drift episodes are mechanically detectable
    // instead of reconstructed from shell history (the r14 entry-5
    // forensics). Context is OPTIONAL per floor (historical entries
    // predate the tool) but every context key must name a live floor —
    // an orphan means a rename or a hand-edit bypassed the tool.
    val ctxPath = root.resolve("BENCH_FLOOR_CONTEXT.json")
    if (Files.exists(ctxPath)) {
      val txt = new String(Files.readAllBytes(ctxPath))
      val keys = """"([A-Za-z0-9_]+)"\s*:\s*\[""".r
        .findAllMatchIn(txt).map(_.group(1)).toSet
      val floors = graft.Bench.loadFloor(
        root.resolve("BENCH_FLOOR.json").toString)
      val orphans = keys -- floors.keySet
      assert(orphans.isEmpty,
        s"floor-context keys with no matching bench floor: " +
          orphans.toSeq.sorted.mkString(", "))
      // context records carry the fields the adjudication protocol
      // reads; a tool regression that drops them would void the point
      for (f <- Seq("load1_before", "sec", "reps"))
        assert(txt.contains("\"" + f + "\""),
          s"context records lack the '$f' field")
    }
  }

  test("shuffle floors cover exactly the guarded families") {
    val txt = new String(Files.readAllBytes(
      root.resolve("SHUFFLE_FLOOR.json")))
    val keys = """"([A-Za-z0-9_]+)"\s*:\s*\[""".r
      .findAllMatchIn(txt).map(_.group(1)).toSet
    assert(keys.nonEmpty, "SHUFFLE_FLOOR.json unreadable or empty")
    val guardedQueries = queryNames
      .filter(q => shuffleGuardedPrefixes.exists(q.startsWith))
    val missing = guardedQueries -- keys
    assert(missing.isEmpty,
      "guarded queries without a shuffle floor (refresh with " +
        "SPARK_GRAFT_SHUFFLE_RECORD=1 and min-merge): " +
        missing.toSeq.sorted.mkString(", "))
    val orphans = keys -- queryNames
    assert(orphans.isEmpty,
      s"shuffle-floor keys with no matching query: " +
        orphans.toSeq.sorted.mkString(", "))
  }

  test("plan goldens on disk match the guarded list, which names real queries") {
    val dir = root.resolve("src/test/resources/graft/plans")
    val onDisk =
      if (!Files.exists(dir)) Set.empty[String]
      else Files.list(dir).iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".plan")).map(_.dropRight(5)).toSet
    val guarded = PlanGuardSpec.Guarded.toSet
    val unknown = guarded -- queryNames
    assert(unknown.isEmpty,
      s"PlanGuardSpec guards names that are not queries: " +
        unknown.toSeq.sorted.mkString(", "))
    val orphanFiles = onDisk -- guarded
    assert(orphanFiles.isEmpty,
      s"golden .plan files no test reads (delete or re-guard): " +
        orphanFiles.toSeq.sorted.mkString(", "))
    val missingFiles = guarded -- onDisk
    assert(missingFiles.isEmpty,
      s"guarded queries with no committed golden (run PlanGuardSpec and " +
        s"commit the written files): " + missingFiles.toSeq.sorted.mkString(", "))
  }

  test("every query has an oracle or is a documented rows-only exception") {
    // current invariant: FULL oracle coverage (the driver contract allows
    // omission for non-SQL-expressible ops, but every present query is
    // SQL-checked today — a new query landing without an oracle should be
    // a deliberate, listed decision, not an accident)
    val rowsOnly = Set.empty[String]
    val missing = queryNames -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty,
      s"queries without an oracle (add SQL or list here as rows-only): " +
        missing.toSeq.sorted.mkString(", "))
    val orphanOracles = SparkEntry.oracleSql.keySet -- queryNames
    assert(orphanOracles.isEmpty,
      s"oracle entries with no matching query: " +
        orphanOracles.toSeq.sorted.mkString(", "))
  }

  test("every scored query has an sf1-capable oracle (committed or overridden)") {
    // The sf1 gate (tools/gen_sf1.py + tools/selfcheck.py, a per-round
    // protocol step since r13) runs every committed oracle against 10x
    // the driver's largest SF. An oracle whose cost is super-linear in
    // rows (the brute O(n²)-levenshtein fuzzy oracle: 89 s at sf0.1,
    // hours at sf1) must carry an equivalence-proved override in
    // tools/oracle_overrides_sf1.json — and conversely, an override
    // appearing WITHOUT a declared super-linear cause would silently
    // swap the oracle a green line is judged against. Keep the two
    // sets identical so both drifts fail here, not as a mystery at sf1.
    val superLinearOracles = Set(
      // pigeonhole-blocked override proved tuple-identical at sf0.1
      // (6,118 rows, 88.8 s brute vs 0.5 s blocked — NOTES r12/r13),
      // self-guarding via error() on its length precondition
      "ns_fuzzy_prefix_pairs")
    val overridePath = root.resolve("tools/oracle_overrides_sf1.json")
    assert(Files.exists(overridePath),
      "tools/oracle_overrides_sf1.json missing — the sf1 gate cannot run")
    // top-level keys of the flat {name: sql} object, via a real JSON
    // parse (Jackson rides in on the Spark classpath) — a text regex
    // would also match name-colon shapes INSIDE an override's SQL value
    // (e.g. a LIKE pattern over commit-log JSON) and fail the suite
    // with a phantom "override with no matching query"
    val overrideKeys = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readAllBytes(overridePath))
      .fieldNames().asScala.toSet
    assert((overrideKeys -- queryNames).isEmpty,
      "sf1 oracle overrides with no matching query: " +
        (overrideKeys -- queryNames).toSeq.sorted.mkString(", "))
    assert((superLinearOracles -- overrideKeys).isEmpty,
      "queries declared super-linear without an sf1 override oracle: " +
        (superLinearOracles -- overrideKeys).toSeq.sorted.mkString(", "))
    assert((overrideKeys -- superLinearOracles).isEmpty,
      "sf1 override oracles without a declared super-linear cause " +
        "(add to superLinearOracles with the equivalence proof cited): " +
        (overrideKeys -- superLinearOracles).toSeq.sorted.mkString(", "))
  }
}
