package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A named group of driver-contract queries. Each query is paired (where
  * SQL-expressible) with an ANSI-SQL oracle the driver replays in DuckDB
  * on the same parquet tables.
  *
  * Determinism rules (SURVEY.md §5): every query ends in a total ORDER BY,
  * every computed column is aliased identically in Spark and SQL, computed
  * doubles are rounded, timestamps are emitted as formatted strings, and
  * DuckDB integer aggregates are cast to BIGINT to match Spark's LongType.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

object QueryPack {
  /** Fold IEEE -0.0 to +0.0 (x + 0.0 == x for every other double). The
    * driver hash-compares BITS: DuckDB's round() is sign-preserving
    * (round(-2.3e-7, 6) = -0.0) while Spark's BigDecimal Round emits
    * +0.0 — equal under ==, different under hash. Every rounded double
    * that can go tiny-negative (slopes, correlations, differences) must
    * pass through this on BOTH sides: here via r2/r4/r6, and in the
    * oracle SQL by appending `+ 0` to the round(...) expression. */
  def zf(c: Column): Column = c + lit(0.0)

  /** Round a computed double; raw stored doubles pass through un-rounded
    * (identical bits in both engines need no tolerance). Zero-folded —
    * see [[zf]]; oracle spellings of these must carry `+ 0`. */
  def r2(c: Column): Column = zf(round(c, 2))
  def r4(c: Column): Column = zf(round(c, 4))
  def r6(c: Column): Column = zf(round(c, 6))

  /** Money determinism: the test data's monetary doubles are exact
    * 2-decimal values, so float SUMs land exactly ON `.xx5` rounding
    * boundaries and `round(sum(double), 2)` becomes engine-dependent
    * (observed: 186686.29 vs 186686.30). Casting to DECIMAL before
    * arithmetic makes every sum exact and identical in Spark and DuckDB;
    * the final cast back to DOUBLE normalizes the output type. Both
    * engines round half-away-from-zero, so the boundary itself is safe.
    */
  def decMoney(c: Column): Column =
    c.cast(org.apache.spark.sql.types.DecimalType(12, 2))
  def decRate(c: Column): Column =
    c.cast(org.apache.spark.sql.types.DecimalType(4, 2))
  /** round(exact-decimal-agg, 2) → double. */
  def moneyRound(c: Column): Column = round(c, 2).cast("double")

  /** Unique temp-view name per invocation, for queries that must go
    * through the SQL parser (GROUPING SETS, subqueries): a fixed view
    * name races when two queries — or two concurrent runs of one
    * query — share a session, with one run's sql() resolving the other
    * run's just-replaced view over a different dataset snapshot. */
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong()
  def freshView(prefix: String): String =
    s"${prefix}_${viewSeq.incrementAndGet()}"

  /** Canonical timestamp rendering (second precision, UTC). */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Microsecond-precision rendering for event timestamps. */
  def tsStrUs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
}
