package graft.ml

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means over the embedding corpus, plus the
  * SemDeDup-style semantic near-dup pass it enables (cluster first, then
  * compare pairs only within a cluster).
  *
  * Determinism is load-bearing for the DuckDB oracle AND for reproducible
  * pipelines: (a) initial centroids are the k lowest-id corpus vectors
  * (same convention as the IVF coarse quantizer), (b) assignment ties
  * break on cluster id after rounding similarity to 6 decimals, and
  * (c) centroid averaging runs in 1e-6 FIXED POINT — components are
  * quantized to integers and summed as longs, so the mean is exact and
  * independent of partitioning/summation order. A plain `avg(double)`
  * would differ between partial-aggregation trees (Spark) and sequential
  * scans (DuckDB) in the last bits and flip near-tie assignments.
  *
  * Scale shape per Lloyd iteration: one crossJoin against a broadcast
  * k-row centroid table (map-side, no shuffle of the corpus), one
  * (cid, dim)-keyed aggregation for the recompute — both linear in n·k.
  */
object Clustering {

  private def asDouble(c: Column): Column = c.cast("array<double>")
  private def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosine(a, b)

  /** (vec_id, v, cid): nearest centroid by rounded cosine, ties to the
    * lowest cid.
    *
    * The argmin is a max_by AGGREGATION, not a row_number window: the
    * window form shuffled the full n×k crossjoin (every vector
    * replicated k times through the exchange) per Lloyd round,
    * contradicting the scaladoc's map-side claim; max_by partial-
    * aggregates map-side, so the exchange carries ~n rows (r13 review).
    * Identical tie-break by construction: max over
    * (cos_sim, -cid) = highest similarity, then LOWEST cid — and the
    * struct comparison is total, so the result is deterministic. */
  private def assign(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("cid"),
        round(cosine(col("v"), col("cv")), 6).as("cos_sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("v"), col("cid"), col("cos_sim")),
        struct(col("cos_sim"), -col("cid"))).as("best"))
      .select(col("vec_id"), col("best.v").as("v"),
        col("best.cid").as("cid"), col("best.cos_sim").as("cos_sim"))

  /** New centroids: exact fixed-point mean per (cid, dimension). */
  private def recompute(assigned: DataFrame): DataFrame = {
    val comp = assigned
      .select(col("cid"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy(col("cid"), col("d"))
      .agg((sum(round(col("x") * 1e6).cast("long")).cast("double") /
        (lit(1e6) * count(lit(1)))).as("comp"))
    comp.groupBy(col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("comp")))),
        s => s.getField("comp")).as("cv"))
  }

  /** Shared seed-selection + Lloyd-iteration chain: the final
    * (vec_id, v, cid, cos_sim) assignment both entry points build on.
    * One definition so the two queries sharing an oracle CTE chain can't
    * silently desynchronize. */
  private def finalAssignment(corpus: DataFrame, k: Int,
      iters: Int): DataFrame = {
    // Similarity.seedVectors, not a bare orderBy-limit: a corpus
    // smaller than k must FAIL FAST (truncated centroid set → cid gaps
    // and garbage downstream scores), and the collected LocalRelation
    // means the Lloyd fold reads literal seed rows instead of
    // re-scanning the corpus per round (r13 review).
    val seeds = Similarity.seedVectors(corpus, k, "kmeans")
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val finalCentroids = (1 until iters).foldLeft(seeds) { (c, _) =>
      recompute(assign(corpus, c))
    }
    assign(corpus, finalCentroids)
  }

  /** Cluster assignment after `iters` Lloyd rounds: (vec_id, cluster_id,
    * cos_sim to the final centroid). Centroid ids are the seed vec_ids. */
  def kmeansAssign(emb: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val corpus = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    finalAssignment(corpus, k, iters)
      .select(col("vec_id"), col("cid").as("cluster_id"), col("cos_sim"))
  }

  /** SemDeDup: semantic near-duplicate pairs compared only WITHIN a
    * k-means cluster — the candidate set per doc is its cluster, not the
    * corpus, so the pair join is sum(|cluster|²) instead of n². Cross-
    * cluster near-dups are forfeited by design (the SemDeDup trade);
    * within-cluster results are exact, and the oracle replays the same
    * deterministic clustering so parity is bit-exact.
    */
  def semanticDupPairs(emb: DataFrame, tau: Double, k: Int = 8,
      iters: Int = 2): DataFrame = {
    val corpus = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val a = finalAssignment(corpus, k, iters)
      .select(col("vec_id"), col("v"), col("cid"))
    val l = a.select(col("cid"), col("vec_id").as("vec_a"), col("v").as("va"))
    val r = a.select(col("cid"), col("vec_id").as("vec_b"), col("v").as("vb"))
    l.join(r, Seq("cid"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(cosine(col("va"), col("vb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= tau)
  }
}
