package graft.functions

import graft.SparkSpecBase

class MergeSpecsSpec extends SparkSpecBase {
  import spark.implicits._

  // duplicate keys (after trim), underscore-trimmed keys, later-wins
  private val pairs = Seq(
    ("screen_size__", "6.1"), ("battery", "4000"), ("screen_size", "6.7"),
    ("weight___", "174"), ("battery_", "4500"), ("chip", "a17"))

  test("typed Aggregator matches the sequential Normalize.mergeSpecs fold") {
    val expected = Normalize.mergeSpecs(pairs)
    val ds = pairs.zipWithIndex
      .map { case ((k, v), i) => SpecEntry(i.toLong, k, v) }.toDS()
    assert(ds.select(MergeSpecs.toColumn).head() == expected)
    // associativity/commutativity over unique ords: same answer under
    // arbitrary partitioning (partial buffers merged in shuffle order)
    assert(ds.repartition(8).select(MergeSpecs.toColumn).head() == expected)
  }

  test("merge_specs registers as a SQL UDAF and groups per key") {
    MergeSpecs.register(spark)
    pairs.zipWithIndex
      .map { case ((k, v), i) => (i.toLong, k, v, i % 2) }
      .toDF("ord", "key", "value", "grp")
      .createOrReplaceTempView("spec_rows")
    val got = spark.sql(
      "SELECT grp, merge_specs(ord, key, value) AS m FROM spec_rows GROUP BY grp")
      .as[(Int, Map[String, String])].collect().toMap
    val expected = (0 to 1).map { g =>
      g -> Normalize.mergeSpecs(
        pairs.zipWithIndex.filter(_._2 % 2 == g).map(_._1))
    }.toMap
    assert(got == expected)
  }
}
