package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T5 recursive frontier expansion (app.js:175-189): the reference's
  * `get_product_links` recurses through nav pages, accumulating product
  * links before crawling. Spark has no native recursion; the idiomatic
  * shape is a driver-side fixpoint loop of distributed steps — each
  * iteration is one distributed join/union, only the TERMINATION decision
  * (an aggregate count) comes back to the driver.
  */
object Frontier {

  /** Expand a seed URL set to its closure over a link graph
    * (`edges(src_url, dst_url)`), bounded by maxIter. Each iteration:
    * newly discovered = (frontier ⋈ edges) \ visited — an equi-join plus
    * the J1 anti-join, both distributed; the loop carries only DataFrames.
    *
    * The localCheckpoint per iteration truncates the lineage — without it
    * the plan doubles each round (the classic iterative-algorithm trap).
    * Only each round's DISCOVERED frontier is checkpointed; `visited` is
    * the lazy union of those already-checkpointed legs, so every url is
    * materialized ONCE (checkpointing the accumulated set per round —
    * the previous shape — re-wrote O(|V| · depth) rows on a deep crawl)
    * while the union's lineage stays depth-1 per leg.
    *
    * A NULL url is not a node: null dst edges are dropped on sight —
    * the anti-join's null != null semantics would otherwise "re-discover"
    * a null every round (one duplicate null row per iteration and no
    * early fixpoint; r13 review).
    */
  def expand(seed: DataFrame, edges: DataFrame, maxIter: Int = 10): DataFrame = {
    val seed0 = seed.select(col("url")).filter(col("url").isNotNull)
      .distinct().localCheckpoint()
    var frontiers = Vector(seed0)
    var frontier = seed0
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val visited = frontiers.reduce(_ union _)
      val discovered = frontier
        .join(edges, frontier("url") === edges("src_url"))
        .select(col("dst_url").as("url"))
        .filter(col("url").isNotNull)
        .distinct()
        .join(visited, Seq("url"), "left_anti")
        .localCheckpoint()
      if (discovered.isEmpty) done = true
      else {
        frontiers = frontiers :+ discovered
        frontier = discovered
      }
      i += 1
    }
    frontiers.reduce(_ union _)
  }
}
