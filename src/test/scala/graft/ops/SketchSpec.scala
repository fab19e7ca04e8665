package graft.ops

import graft.SparkSpecBase

/** Count-min sketch semantics (the `agg_countmin` scored query): the
  * oracle gate proves engine parity; this spec pins the SKETCH
  * invariants the parity check cannot see — an implementation that
  * mis-hashed both sides identically would still match its oracle.
  */
class SketchSpec extends SparkSpecBase {

  test("hyperloglog estimate lands within 3 sigma of exact") {
    val r = graft.SparkEntry.queries("agg_hyperloglog")(spark, sf0001)
      .collect().head
    val exact = r.getAs[Long]("n_exact")
    val est = r.getAs[Double]("hll_est")
    // standard error 1.04/sqrt(64) = 13%; 3 sigma = 39%
    assert(math.abs(est - exact) <= 0.39 * exact,
      s"HLL est $est vs exact $exact outside 3 sigma")
  }

  test("count-min estimates dominate exact counts within the width bound") {
    val rows = graft.SparkEntry.queries("agg_countmin")(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val n = graft.Tables.lineitem(spark, sf0001).count()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("cms_est")
      // CMS never undercounts...
      assert(est >= exact, s"undercount: est $est < exact $exact")
      // ...and with depth 4 the min cell's collision mass stays within
      // a few times the uniform expectation N/width (= N/64); 3x is
      // far above anything a healthy hash family produces on this data
      assert(est - exact <= 3 * n / 64,
        s"overestimate ${est - exact} exceeds 3N/64 = ${3 * n / 64}")
    }
  }
}
