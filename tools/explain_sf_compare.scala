// Plan-shape audit across scale factors (r13, judge r12 #6 follow-on):
// prints a canonical operator skeleton for the most expensive scored
// queries at sf0.1 AND testdata_sf1, so a python diff can flag any
// query whose PLANNED shape changes with data size (the classic
// toy-scale trap: a join that is broadcast at sf0.1 silently becoming
// a shuffle join at sf1, or vice versa). Run via:
//   sbt console < tools/explain_sf_compare.scala > /tmp/sf_compare.txt
// then diff the @@@QUERY blocks pairwise per query.
// Node labels mirror PlanGuardSpec.canonical's vocabulary (join type +
// build side, exchange partitioning kind) but collapse everything else
// to nodeName so SF-dependent constants (stats, sizes, file counts)
// never show in the diff.
val spark2 = org.apache.spark.sql.SparkSession.builder().master("local[8]").config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
spark2.sparkContext.setLogLevel("ERROR")
graft.plans.TopK.ensurePlanning(spark2)

import org.apache.spark.sql.execution._
def canon(p: SparkPlan, depth: Int, sb: StringBuilder): Unit = {
  val label: Option[String] = p match {
    case _: WholeStageCodegenExec => None
    case _: InputAdapter => None
    case e: exchange.ShuffleExchangeExec =>
      Some("Exchange " + e.outputPartitioning.getClass.getSimpleName.stripSuffix("$"))
    case _: exchange.BroadcastExchangeExec => Some("BroadcastExchange")
    case _: exchange.ReusedExchangeExec => Some("ReusedExchange")
    case j: joins.BroadcastHashJoinExec => Some(s"BroadcastHashJoin ${j.joinType} ${j.buildSide}")
    case j: joins.ShuffledHashJoinExec => Some(s"ShuffledHashJoin ${j.joinType} ${j.buildSide}")
    case j: joins.SortMergeJoinExec => Some(s"SortMergeJoin ${j.joinType}")
    case j: joins.BroadcastNestedLoopJoinExec => Some(s"BroadcastNestedLoopJoin ${j.joinType}")
    case _: joins.CartesianProductExec => Some("CartesianProduct")
    case s: SortExec => Some(if (s.global) "Sort global" else "Sort local")
    case _: FileSourceScanExec => Some("Scan parquet")
    case a: adaptive.AdaptiveSparkPlanExec => None // walk the current physical plan
    case other => Some(other.nodeName.takeWhile(_ != '(').trim)
  }
  label match {
    case None =>
      p match {
        case a: adaptive.AdaptiveSparkPlanExec => canon(a.executedPlan, depth, sb)
        case _ => p.children.foreach(canon(_, depth, sb))
      }
    case Some(l) =>
      sb.append("  " * depth).append(l).append('\n')
      if (!p.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec])
        p.children.foreach(canon(_, depth + 1, sb))
  }
}

// the sf1 bench's 12 most expensive queries plus the headline joins —
// where a planned-shape flip would cost real seconds at scale
val names = Seq("ns_fuzzy_prefix_pairs", "ns_cosine_dup_pairs", "ns_cosine_dup_pairs_banded", "ns_similarity_rebuild", "ns_near_dedup_replay", "ns_paragraph_dedup", "ns_dedup_minhash_salted", "ns_dedup_containment", "ns_dedup_jaccard", "ns_dedup_simhash", "ns_curation_pipeline", "ns_dsir_score", "q1_agg", "join_inner_agg", "join_broadcast_star", "join_asof", "agg_salted_sum", "j1_anti_resume", "w_topk_heap", "f16_flatten")

Seq("/root/testdata/sf0.1", "/root/repo/testdata_sf1").foreach { sf => names.foreach { n => println(s"@@@QUERY $n @$sf"); val sb = new StringBuilder; try canon(graft.SparkEntry.queries(n)(spark2, sf).queryExecution.executedPlan, 0, sb) catch { case e: Throwable => sb.append("ERROR " + e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(200) + "\n") }; println(sb.toString); spark2.catalog.clearCache() } }
println("@@@DONE")
sys.exit(0)
