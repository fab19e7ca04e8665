package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The rank-exactness envelope discipline, in ONE place (r13; it was
  * triplicated across ntileApprox / pplBucketed / perSourceQualityGate
  * with hand-kept message drift — the next envelope-policy change, the
  * documented ±1-rank-band switch, must be a one-file edit).
  *
  * Contract shared by every GK-sketch call site: `percentile_approx`
  * with accuracy A is RANK-EXACT while the sketched group stays within
  * n <= A/2 (the 1/(2·accuracy) error bound of Greenwald–Khanna makes
  * the max rank error < 1 there), which is what lets a bit-exact DuckDB
  * oracle pin an "approximate" operator at test scale. Both guards
  * below exist to make leaving that envelope LOUD:
  *
  *  - [[requireSketchAccuracy]] fails at CONSTRUCTION for accuracy
  *    outside (0, Int.MaxValue]: the sketch takes an Int, so a Long
  *    past 2^31-1 would silently truncate (possibly to a tiny or
  *    negative sketch) while the runtime guard still compared against
  *    the un-truncated accuracy/2 (ADVICE r12) — following the
  *    "raise in lockstep" advice past Int range must throw, not
  *    corrupt the plan.
  *  - [[rankExactEnvelope]] fails at RUNTIME when a sketched group
  *    outgrows accuracy/2: an always-0 column woven into the caller's
  *    arithmetic/filter (a free-standing check column would be pruned
  *    away as dead code — QualitySpec force-fires all three sites to
  *    prove the raise_error survives optimization). First real trip:
  *    w_ntile_approx at the r12 sf1 gate (NOTES r12).
  */
object SketchGuards {

  /** Loud Int-range check for a GK sketch accuracy parameter; call
    * before building the plan. `site` names the operator in the
    * message so a throw debugs itself. */
  def requireSketchAccuracy(site: String, accuracy: Long): Unit =
    require(accuracy > 0 && accuracy <= Int.MaxValue,
      s"$site: accuracy $accuracy outside (0, ${Int.MaxValue}] — the " +
        "GK sketch takes an Int; past 2^31 relax the oracle to a " +
        "±1-rank band instead of another lockstep bump")

  /** An always-0 column (of type `castTo`) that raise_errors when
    * `n` — the sketched group's row count, computed in the same
    * aggregate as the sketch — exceeds the rank-exact envelope
    * accuracy/2. Weave it into arithmetic the optimizer cannot drop.
    * `scope` reads as part of the message ("" or " for a source");
    * `advice` names the remedy. */
  def rankExactEnvelope(site: String, scope: String, n: Column,
      accuracy: Long, advice: String, castTo: String): Column =
    when(n > lit(accuracy / 2),
      raise_error(concat(
        lit(s"$site: rank-exact envelope exceeded$scope (n="), n,
        lit(s" > accuracy/2 = ${accuracy / 2}); $advice")))
        .cast(castTo))
      .otherwise(lit(0).cast(castTo))

  /** The ±1-RANK BAND's precondition (r14 — the documented next
    * envelope, implemented cold rather than at the sf≈3.3 incident):
    * GK with accuracy A has rank error ≤ n/A, so while n <= A the
    * sketch's answer is the exact target order statistic or an
    * immediate (±1 rank) neighbor — which a snap refinement pass
    * (count-lt/count-le/prev/next against the sketch value, one
    * map-side-combined aggregate) converts into the EXACT statistic.
    * This guard is that band's boundary: past n = A the sketch may
    * stray beyond the immediate neighbor and the snap's case analysis
    * no longer holds. Same weave discipline as [[rankExactEnvelope]],
    * which it replaces at call sites that adopt the snap (doubling
    * their machine-checked range without growing sketch state). */
  def oneRankBandEnvelope(site: String, scope: String, n: Column,
      accuracy: Long, advice: String, castTo: String): Column =
    when(n > lit(accuracy),
      raise_error(concat(
        lit(s"$site: ±1-rank band exceeded$scope (n="), n,
        lit(s" > accuracy = $accuracy); $advice")))
        .cast(castTo))
      .otherwise(lit(0).cast(castTo))
}
