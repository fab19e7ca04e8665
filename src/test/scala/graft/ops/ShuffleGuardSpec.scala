package graft.ops

import graft.{ShuffleMeter, SparkSpecBase}

/** Family-wide shuffle-volume regression guard: every `ns_*` scored
  * query's total shuffle (bytes, records) at sf0.001, compared against
  * the committed floors in `SHUFFLE_FLOOR.json` — the generalization of
  * [[ShuffleVolumeSpec]]'s hand-picked pins. A plan change that
  * reintroduces a text-carrying exchange, loses a broadcast hint, or
  * drops a map-side partial shows up here as a multiple of its floor in
  * a metric co-tenant noise cannot touch.
  *
  * Tolerances: bytes ≤ 2× floor (compressed sizes jitter with row
  * order/layout), records ≤ 1.5× floor + 64 (record counts are
  * plan-deterministic; the slack absorbs boundary effects only). A
  * query with NO floor entry is reported, not failed — refresh with
  * `SPARK_GRAFT_SHUFFLE_RECORD=1 sbt "testOnly *ShuffleGuardSpec"`,
  * which rewrites the guard file from the current plans (then review
  * the diff like any floor change).
  */
class ShuffleGuardSpec extends SparkSpecBase {

  // resolved against the discovered repo root (graft.Bench.repoRoot),
  // not bare cwd: an IDE/CI launch dir would otherwise make every
  // query fall into the "no floor entry" branch and the guard pass
  // vacuously — the exact silent-relative-path hazard Bench fixed
  private val FloorFile = graft.Bench.repoRoot()
    .map(_.resolve("SHUFFLE_FLOOR.json").toString)
    .getOrElse("SHUFFLE_FLOOR.json")

  private def loadFloors(): Map[String, (Long, Long)] = {
    val p = java.nio.file.Paths.get(FloorFile)
    if (!java.nio.file.Files.exists(p)) return Map.empty
    val txt = new String(java.nio.file.Files.readAllBytes(p))
    """"([A-Za-z0-9_]+)"\s*:\s*\[\s*(\d+)\s*,\s*(\d+)\s*\]""".r
      .findAllMatchIn(txt)
      .map(m => m.group(1) -> (m.group(2).toLong, m.group(3).toLong))
      .toMap
  }

  /** Guarded families: the full ML surface plus the join/window/agg
    * gap-fill packs and the reference J-rows (r8 verdict #9 — the
    * custom TopK exec's queries especially); r10 adds the event-time
    * family (t_ — windows/stream-shaped joins carry real aggregation
    * exchanges) and the snaplake reads (l_ — the query functions build
    * their lakes eagerly at construction, so the measured region is the
    * READ: a pruning regression that starts shuffling unpruned files
    * shows up as record growth). Scalar/projection packs shuffle only
    * for their canonical ORDER BY, so guarding them would pin sort
    * exchanges, not plan shape. */
  private val GuardedPrefixes = ShuffleGuardSpec.GuardedPrefixes

  test("scored-family shuffle volumes stay within committed floors") {
    graft.plans.TopK.ensurePlanning(spark)
    val ns = graft.SparkEntry.queries.keys
      .filter(q => GuardedPrefixes.exists(q.startsWith)).toSeq.sorted
    assert(ns.nonEmpty)
    val measured = ns.map { q =>
      val (b, r) = ShuffleMeter.shuffleMetrics(spark) {
        graft.SparkEntry.queries(q)(spark, sf0001).count()
      }
      spark.catalog.clearCache() // dedup queries persist intermediates
      q -> ((b, r))
    }
    if (sys.env.get("SPARK_GRAFT_SHUFFLE_RECORD").contains("1")) {
      val json = measured
        .map { case (q, (b, r)) => s"""  "$q": [$b, $r]""" }
        .mkString("{\n", ",\n", "\n}\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(FloorFile),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      info(s"recorded ${measured.size} shuffle floors to $FloorFile")
    } else {
      val floors = loadFloors()
      measured.filterNot(m => floors.contains(m._1)).foreach { case (q, (b, r)) =>
        info(s"no shuffle floor for $q (measured $b B / $r rec) — " +
          "refresh with SPARK_GRAFT_SHUFFLE_RECORD=1")
      }
      val violations = measured.flatMap { case (q, (b, r)) =>
        floors.get(q).collect {
          case (fb, fr) if b > 2 * math.max(fb, 1024) ||
              r > (1.5 * fr).toLong + 64 =>
            f"$q: $b B / $r rec vs floor $fb B / $fr rec"
        }
      }
      assert(violations.isEmpty,
        s"shuffle volume regressions:\n${violations.mkString("\n")}")
    }
  }
}

/** Prefix list on the companion so [[FloorConsistencySpec]] checks the
  * SAME families this guard measures — a prefix added here is
  * automatically required to have committed volume floors. */
object ShuffleGuardSpec {
  val GuardedPrefixes: Seq[String] =
    Seq("ns_", "join_", "w_", "agg_", "j1_", "j2_", "j3_", "sub_", "q1_",
      "e_", "t_", "l_",
      // r10: the multiset set-ops plan as a counted aggregate + generate
      // — losing the partial-agg collapse or gaining a second wide
      // exchange is exactly a record-count regression
      "set_")
}
