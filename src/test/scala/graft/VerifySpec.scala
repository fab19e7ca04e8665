package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}

/** The oracle_sql.json writer/merger primitives: jsonQuote must emit
  * strings python's json.load accepts (the driver's parser), and
  * stringLiterals must invert the file layout jsonQuote produced —
  * the merge splices still-escaped literals verbatim, so a round-trip
  * defect would silently corrupt queries on the next targeted run.
  * (The r10 regex → scanner rewrite exists because the regex form
  * StackOverflowed on multi-KB SQL; the length property pins that.)
  */
class VerifySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(200)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), p)
    assert(r.passed, r.status.toString)
  }

  // keys/values with the hostile content real oracle SQL carries:
  // quotes, backslashes, newlines/tabs/CRs, control chars, unicode
  private val hostile: Gen[String] = Gen.listOf(Gen.frequency(
    5 -> Gen.alphaNumChar,
    1 -> Gen.oneOf('"', '\\', '\n', '\r', '\t', '\u0001', '\u001f'),
    1 -> Gen.oneOf(':', ',', '{', '}', '[', ']', ' '),
    1 -> Gen.oneOf('é', '→', '秋'))).map(_.mkString)

  private def render(m: Seq[(String, String)]): String =
    m.map { case (k, v) => s"${Verify.jsonQuote(k)}: ${Verify.jsonQuote(v)}" }
      .mkString("{", ",", "}")

  test("scanner inverts the writer: literals recovered verbatim, in order") {
    check(Prop.forAll(Gen.listOf(Gen.zip(hostile, hostile))) { kvs =>
      val txt = render(kvs)
      val lits = Verify.stringLiterals(txt)
      lits == kvs.flatMap { case (k, v) =>
        Seq(Verify.jsonQuote(k), Verify.jsonQuote(v)) }
    })
  }

  test("quoted output is valid JSON for the driver-side parser") {
    // jackson is the JSON-compliance oracle available on this classpath
    // (the driver uses python json.load — both are RFC 8259 parsers)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    check(Prop.forAll(hostile) { s =>
      mapper.readTree(Verify.jsonQuote(s)).asText() == s
    })
  }

  test("scanner is linear: multi-KB literals cannot overflow the stack") {
    // the regex form died here at ~KB scale; 4 MB proves the scanner
    // never recurses per character
    val big = Verify.jsonQuote("SELECT '" + ("x\\\"" * 1000000) + "'")
    val lits = Verify.stringLiterals(s"{${Verify.jsonQuote("k")}: $big}")
    assert(lits == Seq(Verify.jsonQuote("k"), big))
  }

  test("merge semantics: fresh keys override, prior keys survive") {
    val prior = render(Seq("a" -> "old", "b" -> "keep"))
    val priorMap = Verify.stringLiterals(prior).grouped(2)
      .collect { case Seq(k, v) => k -> v }.toMap
    val fresh = Map(Verify.jsonQuote("a") -> Verify.jsonQuote("new"))
    val merged = priorMap ++ fresh
    assert(merged(Verify.jsonQuote("a")) == Verify.jsonQuote("new"))
    assert(merged(Verify.jsonQuote("b")) == Verify.jsonQuote("keep"))
  }

  test("stale prior oracles are dropped: dead keys AND text-drifted SQL") {
    // the r10-ADVICE hazard: a query edited (impl + oracle) but absent
    // from the targeted run's `only` filter must NOT keep its old SQL
    // validating its old parquet dump. keepablePrior keeps a prior
    // entry only when the key is live AND the SQL text still matches.
    val prior = render(Seq(
      "alive_same" -> "SELECT 1",
      "alive_drifted" -> "SELECT old",
      "dead_key" -> "SELECT 2"))
    val registry = Map(
      "alive_same" -> "SELECT 1",
      "alive_drifted" -> "SELECT new")
    val kept = Verify.keepablePrior(prior, registry)
    assert(kept == Map(
      Verify.jsonQuote("alive_same") -> Verify.jsonQuote("SELECT 1")),
      s"kept $kept")
    // hostile content flows through unchanged (still-escaped splice)
    check(Prop.forAll(hostile, hostile) { (k, v) =>
      val p = render(Seq(k -> v))
      Verify.keepablePrior(p, Map(k -> v)) ==
        Map(Verify.jsonQuote(k) -> Verify.jsonQuote(v)) &&
      Verify.keepablePrior(p, Map(k -> (v + "x"))).isEmpty &&
      Verify.keepablePrior(p, Map.empty).isEmpty
    })
  }
}
