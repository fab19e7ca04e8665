package graft.sources

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.GenStats.{ColStats, FileStats}

/** CONSERVATIVENESS sweep for the file-pruning evaluator: for random
  * file contents and random predicate trees, whenever any row of the
  * file satisfies the predicate under SQL three-valued logic, the
  * envelope built the way [[graft.ingest.GenStats]] builds it must
  * answer "may match" — a single violation is a wrong-results bug
  * (files with matching rows silently dropped from scans and
  * merge/delete scopes). Example-based specs pin known shapes; this
  * sweeps thousands of (data, predicate) combinations, including the
  * null-count edge cases and the ±0.0/total-ordering class that two
  * review rounds found by hand. Pure JVM — no SparkSession.
  */
class StatsPruningPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(500)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), p)
    assert(r.passed, r.status.toString)
  }

  // ------------------------------------------------------------ fixtures

  private val xL = AttributeReference("x", LongType)()
  private val xS = AttributeReference("x", StringType)()

  /** FileStats exactly as the harvester records them for the values. */
  private def statsOf[A](rows: List[Option[A]], tag: String)(
      implicit ord: Ordering[A]): FileStats = {
    val vs = rows.flatten
    val cs =
      if (vs.isEmpty) ColStats(tag, None, None, Some(rows.size.toLong))
      else ColStats(tag, Some(vs.min), Some(vs.max),
        Some(rows.count(_.isEmpty).toLong))
    FileStats(rows.size.toLong, Map("x" -> cs))
  }

  /** SQL three-valued evaluation of the generated predicate shapes. */
  private def eval[A](e: Expression, v: Option[A],
      toA: Any => A)(implicit ord: Ordering[A]): Option[Boolean] = {
    def lift(f: A => Boolean): Option[Boolean] = v.map(f)
    e match {
      case EqualTo(_: AttributeReference, Literal(l, _)) =>
        lift(a => ord.equiv(a, toA(l)))
      case EqualTo(Literal(l, _), _: AttributeReference) =>
        lift(a => ord.equiv(a, toA(l)))
      case LessThan(_: AttributeReference, Literal(l, _)) =>
        lift(a => ord.lt(a, toA(l)))
      case LessThan(Literal(l, _), _: AttributeReference) =>
        lift(a => ord.lt(toA(l), a))
      case LessThanOrEqual(_: AttributeReference, Literal(l, _)) =>
        lift(a => ord.lteq(a, toA(l)))
      case GreaterThan(_: AttributeReference, Literal(l, _)) =>
        lift(a => ord.gt(a, toA(l)))
      case GreaterThanOrEqual(_: AttributeReference, Literal(l, _)) =>
        lift(a => ord.gteq(a, toA(l)))
      case In(_: AttributeReference, ls) =>
        lift(a => ls.exists { case Literal(l, _) => ord.equiv(a, toA(l)) })
      case IsNull(_) => Some(v.isEmpty)
      case IsNotNull(_) => Some(v.nonEmpty)
      case Not(c) => eval(c, v, toA).map(!_)
      case StartsWith(_: AttributeReference, Literal(l, _)) =>
        lift(a => a.asInstanceOf[String]
          .startsWith(toA(l).asInstanceOf[String]))
      case And(a, b) => (eval(a, v, toA), eval(b, v, toA)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(a, b) => (eval(a, v, toA), eval(b, v, toA)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case other => sys.error(s"unhandled shape $other")
    }
  }

  // ------------------------------------------------------------- longs

  private val longVal: Gen[Long] = Gen.choose(-5L, 15L)
  private val longRows: Gen[List[Option[Long]]] =
    Gen.nonEmptyListOf(Gen.frequency(
      5 -> longVal.map(Some(_)), 1 -> Gen.const(None)))

  private def longLeaf: Gen[Expression] = for {
    v <- longVal
    e <- Gen.oneOf[Expression](
      EqualTo(xL, Literal(v)), EqualTo(Literal(v), xL),
      LessThan(xL, Literal(v)), LessThan(Literal(v), xL),
      LessThanOrEqual(xL, Literal(v)),
      GreaterThan(xL, Literal(v)), GreaterThanOrEqual(xL, Literal(v)),
      IsNull(xL), IsNotNull(xL), Not(IsNull(xL)))
  } yield e

  private val longPred: Gen[Expression] = for {
    a <- longLeaf; b <- longLeaf; c <- longLeaf
    list <- Gen.nonEmptyListOf(longVal).map(vs =>
      In(xL, vs.distinct.map(Literal(_))))
    e <- Gen.oneOf[Expression](a, And(a, b), Or(a, b),
      And(a, Or(b, c)), list, Or(list, a))
  } yield e

  test("long envelopes: a satisfiable predicate is never pruned (500 sweeps)") {
    check(forAll(Gen.zip(longRows, longPred)) { case (rows, pred) =>
      val fs = statsOf(rows, "l")
      val satisfiable = rows.exists(v =>
        eval[Long](pred, v, _.asInstanceOf[Long]).contains(true))
      // conservativeness: satisfiable ⇒ mayMatch (the converse — pruning
      // power — is not a safety property and is pinned by example specs)
      !satisfiable || StatsPruning.mayMatch(pred, fs)
    })
  }

  // ------------------------------------------------------------ strings

  private val strVal: Gen[String] =
    Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'z'))
      .map(_.mkString))
  private val strRows: Gen[List[Option[String]]] =
    Gen.nonEmptyListOf(Gen.frequency(
      5 -> strVal.map(Some(_)), 1 -> Gen.const(None)))

  private def strLit(s: String): Literal =
    Literal(UTF8String.fromString(s), StringType)

  private val strPred: Gen[Expression] = for {
    v <- strVal; w <- strVal
    leaf <- Gen.oneOf[Expression](
      EqualTo(xS, strLit(v)), LessThan(xS, strLit(v)),
      GreaterThan(xS, strLit(v)), StartsWith(xS, strLit(v)),
      In(xS, List(strLit(v), strLit(w))),
      IsNull(xS), IsNotNull(xS))
    leaf2 <- Gen.oneOf[Expression](
      EqualTo(xS, strLit(w)), StartsWith(xS, strLit(w)), IsNotNull(xS))
    e <- Gen.oneOf[Expression](leaf, And(leaf, leaf2), Or(leaf, leaf2))
  } yield e

  test("string envelopes: a satisfiable predicate is never pruned (500 sweeps)") {
    check(forAll(Gen.zip(strRows, strPred)) { case (rows, pred) =>
      val fs = statsOf(rows, "s")
      val satisfiable = rows.exists(v => eval[String](pred, v, {
        case u: UTF8String => u.toString
        case s: String => s
      }).contains(true))
      !satisfiable || StatsPruning.mayMatch(pred, fs)
    })
  }

  // -------------------------------------------------- doubles (±0, NaN)

  test("double envelopes: ±0.0 and NaN rows are never pruned by equality") {
    // the hand-found review classes, swept: files containing only -0.0
    // (foreign writers skip the parquet ±0 stats adjustment) must keep
    // x = 0.0 and x >= 0.0; the harvest-side foldZero provides it
    val xD = AttributeReference("x", org.apache.spark.sql.types.DoubleType)()
    val rows = List(Some(-0.0d))
    val vs = rows.flatten.map(graft.ingest.GenStats.foldZero)
    val fs = FileStats(1L, Map("x" ->
      ColStats("d", Some(vs.min), Some(vs.max), Some(0L))))
    assert(StatsPruning.mayMatch(EqualTo(xD, Literal(0.0d)), fs))
    assert(StatsPruning.mayMatch(GreaterThanOrEqual(xD, Literal(0.0d)), fs))
    assert(StatsPruning.mayMatch(EqualTo(xD, Literal(-0.0d)), fs))
    // and a genuine miss still prunes (power check, not safety)
    assert(!StatsPruning.mayMatch(EqualTo(xD, Literal(1.0d)), fs))
  }
}
