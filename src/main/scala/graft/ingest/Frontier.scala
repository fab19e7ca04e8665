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
    */
  def expand(seed: DataFrame, edges: DataFrame, maxIter: Int = 10): DataFrame = {
    var visited = seed.select(col("url")).distinct().localCheckpoint()
    var frontier = visited
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val discovered = frontier
        .join(edges, frontier("url") === edges("src_url"))
        .select(col("dst_url").as("url"))
        .distinct()
        .join(visited, Seq("url"), "left_anti")
        .localCheckpoint()
      if (discovered.isEmpty) done = true
      else {
        visited = visited.union(discovered).localCheckpoint()
        frontier = discovered
      }
      i += 1
    }
    visited
  }
}
