package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{SparkSpecBase, Tables}

class TopKSpec extends SparkSpecBase {
  import spark.implicits._

  private def heapTopK(k: Int) =
    TopK.perKey(Tables.orders(spark, sf0001),
      Seq("o_custkey"), Seq("o_totalprice" -> false, "o_orderkey" -> true), k)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")

  test("bounded-heap top-k equals the window row_number formulation") {
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val expected = Tables.orders(spark, sf0001)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)].collect().toSet
    val got = heapTopK(3).as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
    // k = 1 (the reference's sort+pop max) and k larger than any group
    val max1 = heapTopK(1).as[(Long, Long, Double)].collect()
    assert(max1.map(_._1).distinct.length == max1.length) // one row per key
    val all = heapTopK(1000000).count()
    assert(all == Tables.orders(spark, sf0001).count())
  }

  test("planned as a partial/final pair around one exchange, with no sort") {
    val plan = heapTopK(3).queryExecution.executedPlan.toString
    assert("TopKPerKey".r.findAllIn(plan).size == 2,
      s"expected partial+final TopKPerKey:\n${plan.take(900)}")
    assert(plan.contains("Exchange hashpartitioning"),
      s"missing key exchange:\n${plan.take(900)}")
    assert(!plan.contains("Sort "), s"unexpected sort:\n${plan.take(900)}")
  }

  test("ns_domain_cap's per-source cap plans through the heap operator") {
    val df = graft.ml.MlPack.queries("ns_domain_cap")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey".r.findAllIn(plan).size == 2,
      s"domain cap not planned as partial+final TopKPerKey:\n${plan.take(900)}")
    // matches the row_number formulation it replaces
    val w = Window.partitionBy($"source").orderBy($"n_chars".desc, $"doc_id")
    val expected = Tables.documents(spark, sf0001)
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      .select($"source", $"doc_id", $"n_chars")
      .as[(String, Long, Long)].collect().toSet
    assert(df.select($"source", $"doc_id", $"n_chars")
      .as[(String, Long, Long)].collect().toSet == expected)
  }

  test("rank mode keeps whole tie groups, under normal and flushing partials") {
    // order by date only — real ties within each priority group
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_orderdate".desc)
    val expected = Tables.orders(spark, sf0001)
      .withColumn("rk", rank().over(w)).filter($"rk" <= 3)
      .select($"o_orderpriority", $"o_orderkey")
      .as[(String, Long)].collect().toSet
    def viaHeap = TopK.perKey(Tables.orders(spark, sf0001),
        Seq("o_orderpriority"), Seq("o_orderdate" -> false), 3, TopKMode.Rank)
      .select($"o_orderpriority", $"o_orderkey")
      .as[(String, Long)].collect().toSet
    assert(viaHeap == expected)
    // ties make expected > 3 rows somewhere, or the mode isn't exercised
    val perKeyCounts = expected.groupBy(_._1).map(_._2.size)
    assert(perKeyCounts.exists(_ > 3), "no tie group extended past k")
    // emit-and-reset path: every flushed chunk must re-merge tie-correctly
    spark.conf.set(TopK.MaxPartialKeysFlag, "2")
    try assert(viaHeap == expected)
    finally spark.conf.unset(TopK.MaxPartialKeysFlag)
  }

  test("dense_rank mode keeps the k best distinct order values") {
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_orderdate".desc)
    val expected = Tables.orders(spark, sf0001)
      .withColumn("rk", dense_rank().over(w)).filter($"rk" <= 2)
      .select($"o_orderpriority", $"o_orderkey")
      .as[(String, Long)].collect().toSet
    val got = TopK.perKey(Tables.orders(spark, sf0001),
        Seq("o_orderpriority"), Seq("o_orderdate" -> false), 2, TopKMode.DenseRank)
      .select($"o_orderpriority", $"o_orderkey")
      .as[(String, Long)].collect().toSet
    assert(got == expected)
  }

  test("rank()<=k and global dense_rank patterns auto-rewrite when the rank is dropped") {
    TopK.ensurePlanning(spark)
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_orderdate".desc)
    val grouped = Tables.orders(spark, sf0001)
      .withColumn("rk", rank().over(w)).filter($"rk" <= 2)
      .select($"o_orderpriority", $"o_orderkey")
    assert(grouped.queryExecution.optimizedPlan.toString.contains("TopKPerKey"),
      "rank()<=k filter not rewritten to the heap operator")
    val wg = Window.orderBy($"o_orderdate".desc)
    val global = Tables.orders(spark, sf0001)
      .withColumn("rk", dense_rank().over(wg)).filter($"rk" <= 2)
      .select($"o_orderkey")
    assert(global.queryExecution.optimizedPlan.toString.contains("TopKPerKey"),
      "global dense_rank()<=k not rewritten to the empty-key heap node")
    // rewritten results match the window path with the rewrite disabled
    spark.conf.set(WindowTopKRewrite.RewriteFlag, "false")
    val (expG, expGlob) =
      try ((Tables.orders(spark, sf0001)
          .withColumn("rk", rank().over(w)).filter($"rk" <= 2)
          .select($"o_orderpriority", $"o_orderkey")
          .as[(String, Long)].collect().toSet,
        Tables.orders(spark, sf0001)
          .withColumn("rk", dense_rank().over(wg)).filter($"rk" <= 2)
          .select($"o_orderkey").as[Long].collect().toSet))
      finally spark.conf.unset(WindowTopKRewrite.RewriteFlag)
    assert(grouped.as[(String, Long)].collect().toSet == expG)
    assert(global.as[Long].collect().toSet == expGlob)
  }

  test("window row_number<=k pattern auto-rewrites when the rank is dropped") {
    TopK.ensurePlanning(spark)
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    def pattern = Tables.orders(spark, sf0001)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice") // rn dropped
    val rewritten = pattern
    assert(rewritten.queryExecution.optimizedPlan.toString.contains("TopKPerKey"),
      "rank-dropped pattern not rewritten")
    val exec = rewritten.queryExecution.executedPlan.toString
    // neither the Window exec nor Spark's sort-based WindowGroupLimit
    // survives — the heap operator subsumes both, sort-free
    assert(!exec.contains("Window [") && !exec.contains("WindowGroupLimit"),
      s"window machinery survived the rewrite:\n${exec.take(900)}")
    assert(!exec.contains("Sort "), s"unexpected sort:\n${exec.take(900)}")
    // identical rows to the untouched window formulation (rank kept →
    // not rewritten), which doubles as the semantics proof
    val kept = Tables.orders(spark, sf0001)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
    assert(!kept.queryExecution.optimizedPlan.toString.contains("TopKPerKey"),
      "rank-in-output query wrongly rewritten")
    val a = rewritten.as[(Long, Long, Double)].collect().toSet
    val b = kept.select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)].collect().toSet
    assert(a == b)
    // rn = 1 (top-1 / dedup-first shape) also rewrites
    val top1 = Tables.orders(spark, sf0001)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey")
    assert(top1.queryExecution.optimizedPlan.toString.contains("TopKPerKey"))
    assert(top1.count() ==
      Tables.orders(spark, sf0001).select($"o_custkey").distinct().count())
  }

  test("key-only filters push below the custom node; value filters do not") {
    val base = TopK.perKey(Tables.orders(spark, sf0001),
      Seq("o_custkey"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    val keyF = base.filter($"o_custkey" < 100)
    val optK = keyF.queryExecution.optimizedPlan.toString
    assert(optK.indexOf("TopKPerKey") < optK.indexOf("Filter"),
      s"key filter not pushed through:\n$optK")
    // and the pushed plan still computes the right answer
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val expected = Tables.orders(spark, sf0001).filter($"o_custkey" < 100)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)].collect().toSet
    assert(keyF.select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)].collect().toSet == expected)
    // a filter over a NON-key column must stay above the operator
    // (pushing it would change which rows make the top k)
    val valF = base.filter($"o_totalprice" < 50000.0)
    val optV = valF.queryExecution.optimizedPlan.toString
    assert(optV.indexOf("Filter") < optV.indexOf("TopKPerKey"),
      s"value filter wrongly pushed:\n$optV")
    // a NONDETERMINISTIC key-referencing filter must also stay above:
    // sampling input rows before selection changes which rows win
    val ndF = base.filter(rand(7) < lit(2.0)) // always true, but nondeterministic
    val optN = ndF.queryExecution.optimizedPlan.toString
    assert(optN.indexOf("Filter") < optN.indexOf("TopKPerKey"),
      s"nondeterministic filter wrongly pushed:\n$optN")
  }

  test("partial heap map caps at maxPartialKeys and stays correct via emit-and-reset") {
    // ~1e6 distinct keys, 3 rows each, under a 1000-key map cap: the
    // partial exec must flush ~1000× per partition and the final stage
    // must re-reduce the duplicated keys to the exact per-key top 2
    val n = 1000000L
    val rows = spark.range(3 * n).select(
      (col("id") % n).as("key"),
      // values laid out so each key's top-2 by value desc is the
      // occurrences at id∈[n,3n) (values key+n, key+2n), never id∈[0,n)
      col("id").as("value"))
    spark.conf.set(TopK.MaxPartialKeysFlag, "1000")
    try {
      val got = TopK.perKey(rows, Seq("key"), Seq("value" -> false), 2)
      assert(got.count() == 2 * n)
      // spot-check exact membership: every key keeps values {key+n, key+2n}
      val bad = got.groupBy($"key")
        .agg(sum($"value").as("s"), count(lit(1)).as("c"))
        .filter($"c" =!= 2 || $"s" =!= $"key" * 2 + 3 * n)
        .count()
      assert(bad == 0, s"$bad keys with wrong top-2 membership under flush")
    } finally spark.conf.unset(TopK.MaxPartialKeysFlag)
  }

  test("global top-k (empty keys): rewrite fires, final runs single-partition") {
    TopK.ensurePlanning(spark)
    val w = Window.orderBy($"o_totalprice".desc, $"o_orderkey")
    val pattern = Tables.orders(spark, sf0001)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"o_orderkey", $"o_totalprice")
    // rewritten to Spark's canonical Limit(Sort) → TakeOrderedAndProject,
    // with the leftover Window + rank-Filter machinery stripped
    val exec = pattern.queryExecution.executedPlan.toString
    assert(exec.contains("TakeOrderedAndProject(limit=5"),
      s"global top-k not planned as TakeOrderedAndProject:\n${exec.take(900)}")
    assert(!exec.contains("Window ["),
      s"window machinery survived the global rewrite:\n${exec.take(900)}")
    val expected = Tables.orders(spark, sf0001)
      .orderBy($"o_totalprice".desc, $"o_orderkey").limit(5)
      .select($"o_orderkey", $"o_totalprice")
      .as[(Long, Double)].collect().toSet
    assert(pattern.as[(Long, Double)].collect().toSet == expected)
    // direct API spelling takes the heap ladder: partials keep ≤ k rows
    // per map partition, the final heap runs after a single-partition
    // exchange over ≤ k·partitions candidates
    val api = TopK.global(Tables.orders(spark, sf0001),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 5)
      .select($"o_orderkey", $"o_totalprice")
    val apiExec = api.queryExecution.executedPlan.toString
    assert("TopKPerKey".r.findAllIn(apiExec).size == 2 &&
      apiExec.contains("Exchange SinglePartition"),
      s"API global top-k not a partial/final heap pair:\n${apiExec.take(900)}")
    assert(api.as[(Long, Double)].collect().toSet == expected)
  }
}
