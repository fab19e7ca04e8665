package graft.ingest

import graft.SparkSpecBase

class FrontierSpec extends SparkSpecBase {
  import spark.implicits._

  test("frontier expands to the reachable closure and no further") {
    // nav graph: root → a,b; a → c; c → d; isolated x → y (unreachable)
    val edges = Seq(
      ("root", "a"), ("root", "b"), ("a", "c"), ("c", "d"),
      ("x", "y"), ("d", "a") /* cycle back */)
      .toDF("src_url", "dst_url")
    val seed = Seq("root").toDF("url")
    val closure = Frontier.expand(seed, edges).as[String].collect().toSet
    assert(closure == Set("root", "a", "b", "c", "d"))
  }

  test("null dst edges are dropped: exact closure, no duplicates, early fixpoint") {
    // every level has a null-dst edge — the old shape re-"discovered"
    // the null each round (anti-join null != null), duplicating rows and
    // defeating early termination (r13 review)
    val edges = Seq(
      ("a", "b"), ("b", null), ("b", "c"), ("c", null))
      .toDF("src_url", "dst_url")
    val out = Frontier.expand(Seq("a").toDF("url"), edges, maxIter = 10)
      .as[String].collect()
    assert(out.toSet == Set("a", "b", "c") && out.length == 3,
      s"closure carried nulls or duplicates: ${out.mkString(",")}")
    // null seeds are not nodes either
    val out2 = Frontier.expand(Seq("a", null).toDF("url"), edges)
      .as[String].collect()
    assert(out2.toSet == Set("a", "b", "c") && out2.length == 3)
  }

  test("maxIter bounds the expansion depth") {
    val chain = (1 to 20).map(i => (s"u$i", s"u${i + 1}")).toDF("src_url", "dst_url")
    val got = Frontier.expand(Seq("u1").toDF("url"), chain, maxIter = 3)
      .as[String].collect().toSet
    assert(got == Set("u1", "u2", "u3", "u4"))
  }
}
