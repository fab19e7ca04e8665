package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.QueryPack

/** Embedding-clustering operators as driver-contract queries. The k-means
  * pipeline is fully deterministic (seeded centroids, fixed-point
  * averaging), so both queries carry full-replay DuckDB oracles.
  */
object ClusterPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic k-means (k=8, 2 Lloyd rounds): final assignment.
    "ns_kmeans_assign" -> ((s, d) => {
      Clustering.kmeansAssign(Tables.embeddings(s, d), k = 8, iters = 2)
        .orderBy(col("vec_id"))
    }),

    // SemDeDup: near-dup pairs compared within k-means clusters only.
    "ns_semantic_dup" -> ((s, d) => {
      Clustering.semanticDupPairs(Tables.embeddings(s, d), tau = 0.45,
        k = 8, iters = 2)
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // Int8 scalar quantization report (fixed-point-exact MSE + q-norm).
    "ns_embedding_quantize" -> ((s, d) => {
      Quantize.int8Stats(Tables.embeddings(s, d))
        .orderBy(col("vec_id"))
    }),

    // Embedding distribution drift per label (reference = even vec_ids,
    // current = odd): mean-vector L2 shift + worst per-dimension shift —
    // the monitor that tells an ANN deployment its frozen quantizer
    // needs the retrain-and-swap. See Similarity.embeddingDrift.
    "ns_embedding_drift" -> ((s, d) => {
      Similarity.embeddingDrift(Tables.embeddings(s, d),
        col("vec_id") % 2 === 0)
    }),

    // Per-dimension mean/variance + variance rank — the dimension-
    // selection diagnostic behind the truncated-retrieval tier (does
    // prefix truncation actually keep the high-variance dims?). See
    // Quantize.dimVariance.
    "ns_embedding_dim_stats" -> ((s, d) => {
      Quantize.dimVariance(Tables.embeddings(s, d))
    }),

    // ns_embedding_drift NORMALIZED into the dimensionless two-sample
    // z the shipped rebuild gate thresholds (r15): RMS over dimensions
    // of (mean shift / its no-drift standard error). The even/odd
    // split is a true no-drift partition, so every label's drift_z
    // hovers near 1.0 — the statistic's calibration point — while
    // AnnStreams' −3× fixture reads ≈3.2 against the 2.0 default gate.
    // See Similarity.embeddingDriftZ for the exact-arithmetic device.
    "ns_embedding_drift_z" -> ((s, d) => {
      Similarity.embeddingDriftZ(Tables.embeddings(s, d),
        col("vec_id") % 2 === 0)
    })
  )

  /** Shared CTE chain replaying the deterministic k-means: seeds = 8
    * lowest-id vectors, one fixed-point recompute, final assignment. */
  private val kmeansCtes: String =
    """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      |c0 AS (SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 8),
      |a1 AS (SELECT vec_id, v, cid FROM (
      |    SELECT e.vec_id, e.v, c.cid,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_cosine_similarity(e.v, c.cv), 6) DESC, c.cid)
      |        AS rk
      |    FROM e CROSS JOIN c0 c) t WHERE rk = 1),
      |x1 AS (SELECT cid, unnest(range(1, len(v) + 1)) AS d, v FROM a1),
      |m1 AS (SELECT cid, d,
      |        CAST(sum(CAST(round(v[d] * 1e6) AS BIGINT)) AS DOUBLE) /
      |          (1e6 * count(*)) AS comp
      |      FROM x1 GROUP BY 1, 2),
      |c1 AS (SELECT cid, list(comp ORDER BY d) AS cv FROM m1 GROUP BY cid),
      |a2 AS (SELECT vec_id, v, cid, cos_sim FROM (
      |    SELECT e.vec_id, e.v, c.cid,
      |      round(list_cosine_similarity(e.v, c.cv), 6) AS cos_sim,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY round(list_cosine_similarity(e.v, c.cv), 6) DESC, c.cid)
      |        AS rk
      |    FROM e CROSS JOIN c1 c) t WHERE rk = 1)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "ns_kmeans_assign" ->
      s"""WITH $kmeansCtes
         |SELECT vec_id, cid AS cluster_id, cos_sim
         |FROM a2 ORDER BY vec_id""".stripMargin,

    "ns_semantic_dup" ->
      s"""WITH $kmeansCtes
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
         |FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin,

    // Drift replay: fixed-point per-dim sums, one IEEE division per
    // mean, ×1e12 fixed-point Σdd² (a 64-term double sum would be
    // order-dependent), IEEE-exact sqrt, round-6 outputs. The 1-based
    // unnest d vs Spark's 0-based posexplode is grouping-key-only
    // (bijective, never output).
    "ns_embedding_drift" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v
        |           FROM embeddings),
        |x AS (SELECT label, vec_id % 2 = 0 AS is_ref,
        |    unnest(range(1, len(v) + 1)) AS d, v FROM e),
        |dx AS (SELECT label, is_ref, d, v[d] AS x FROM x),
        |per AS (SELECT label, d,
        |    sum(CASE WHEN is_ref THEN CAST(round(x * 1e6) AS BIGINT) END) AS sr,
        |    sum(CASE WHEN is_ref THEN 1 END) AS nr,
        |    sum(CASE WHEN NOT is_ref THEN CAST(round(x * 1e6) AS BIGINT) END)
        |      AS sc,
        |    sum(CASE WHEN NOT is_ref THEN 1 END) AS nc
        |  FROM dx GROUP BY 1, 2),
        |mu AS (SELECT label, nr, nc,
        |    CAST(sr AS DOUBLE) / (1e6 * nr) - CAST(sc AS DOUBLE) / (1e6 * nc)
        |      AS dd
        |  FROM per WHERE nr IS NOT NULL AND nc IS NOT NULL)
        |SELECT label,
        |  CAST(max(nr) AS BIGINT) AS n_ref, CAST(max(nc) AS BIGINT) AS n_cur,
        |  round(sqrt(CAST(sum(CAST(round((dd * dd) * 1e12) AS BIGINT))
        |          AS BIGINT) / 1e12), 6) AS mean_shift_l2,
        |  round(max(abs(dd)), 6) AS max_dim_shift
        |FROM mu GROUP BY label ORDER BY label""".stripMargin,

    // Variance replay: ×1e6 fixed-point sums (HUGEINT ≥ Spark's
    // DECIMAL(38,0) — both exact), the same (n·Σxx − Sx²) integer
    // assembly, one mirrored IEEE division per statistic, ranks over
    // the ROUNDED variance. unnest d is 1-based → emitted as d-1 to
    // match posexplode.
    "ns_embedding_dim_stats" ->
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |ix AS (SELECT unnest(range(1, len(v) + 1)) AS d, v FROM e),
        |dx AS (SELECT d, v[d] AS x FROM ix),
        |s AS (SELECT d, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(x * 1e6) AS BIGINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(round(x * 1e6) AS BIGINT)
        |           * CAST(round(x * 1e6) AS BIGINT)) AS HUGEINT) AS sxx
        |  FROM dx GROUP BY d),
        |v AS (SELECT CAST(d - 1 AS INT) AS d, n,
        |    round(CAST(sx AS DOUBLE) / (1e6 * n), 6) + 0 AS mean,
        |    round(CAST(n * sxx - sx * sx AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * n * 1e12), 6) + 0 AS variance
        |  FROM s)
        |SELECT d, n, mean, variance,
        |  CAST(row_number() OVER (ORDER BY variance DESC, d) AS INT)
        |    AS var_rank
        |FROM v ORDER BY d""".stripMargin,

    // Drift-z replay, token-mirroring embeddingDriftZ: ×1e6 fixed-point
    // per-dim sums; the reference Σfp² and the (n·Σxx − Sx²) variance
    // numerator ride HUGEINT (≥ Spark's DECIMAL(38,0), both exact);
    // σ=0 dims drop by the EXACT integer test num = 0; t is the same
    // left-assoc IEEE chain dd / (sqrt(vr) · sqrt(1/nr + 1/nc)); the
    // cross-dim ×1e9 fixed-point Σt² rides HUGEINT (≥ Spark's
    // DECIMAL(38,0) — t ~ √batch, a BIGINT sum overflows at |t| ≈ 1500
    // over 4096 dims, r16). 1-based unnest d is grouping-key-only.
    "ns_embedding_drift_z" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) v
        |           FROM embeddings),
        |x AS (SELECT label, vec_id % 2 = 0 AS is_ref,
        |    unnest(range(1, len(v) + 1)) AS d, v FROM e),
        |dx AS (SELECT label, is_ref, d, v[d] AS x FROM x),
        |per AS (SELECT label, d,
        |    sum(CASE WHEN is_ref THEN CAST(round(x * 1e6) AS BIGINT) END) AS sr,
        |    sum(CASE WHEN is_ref THEN 1 END) AS nr,
        |    sum(CASE WHEN is_ref THEN
        |        CAST(CAST(round(x * 1e6) AS BIGINT)
        |           * CAST(round(x * 1e6) AS BIGINT) AS HUGEINT) END) AS srr,
        |    sum(CASE WHEN NOT is_ref THEN CAST(round(x * 1e6) AS BIGINT) END)
        |      AS sc,
        |    sum(CASE WHEN NOT is_ref THEN 1 END) AS nc
        |  FROM dx GROUP BY 1, 2),
        |f AS (SELECT label, nr, nc,
        |    CAST(nr AS HUGEINT) * srr - CAST(sr AS HUGEINT) * sr AS num,
        |    CAST(sr AS DOUBLE) / (1e6 * nr) - CAST(sc AS DOUBLE) / (1e6 * nc)
        |      AS dd
        |  FROM per WHERE nr IS NOT NULL AND nc IS NOT NULL),
        |t AS (SELECT label, nr, nc,
        |    CASE WHEN num = 0 THEN NULL
        |      ELSE dd / (sqrt(CAST(num AS DOUBLE)
        |                   / (CAST(nr AS DOUBLE) * nr * 1e12))
        |                 * sqrt(1.0 / nr + 1.0 / nc)) END AS t
        |  FROM f)
        |SELECT label,
        |  CAST(max(nr) AS BIGINT) AS n_ref, CAST(max(nc) AS BIGINT) AS n_cur,
        |  round(sqrt(CAST(sum(CAST(round((t * t) * 1e9) AS HUGEINT))
        |          AS DOUBLE) / 1e9 / count(t)), 6) AS drift_z,
        |  round(max(abs(t)), 6) AS max_dim_z,
        |  CAST(count(t) AS INT) AS n_dims
        |FROM t GROUP BY label ORDER BY label""".stripMargin,

    // Same affine quantizer, same expression shapes (left-assoc double
    // math), same 1e-12 fixed-point SSE — exact parity by construction.
    "ns_embedding_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        |ix AS (SELECT vec_id, unnest(range(1, len(v) + 1)) AS d, v FROM e),
        |dx AS (SELECT vec_id, d, v[d] AS x FROM ix),
        |rg AS (SELECT d, min(x) AS lo, max(x) AS hi FROM dx GROUP BY d),
        |q AS (SELECT vec_id, x, lo, hi,
        |    CASE WHEN hi = lo THEN 0
        |      ELSE CAST(round((x - lo) / (hi - lo) * 254 - 127) AS INT)
        |    END AS q
        |  FROM dx JOIN rg USING (d)),
        |r AS (SELECT vec_id, q, x,
        |    lo + CAST(q + 127 AS DOUBLE) / 254 * (hi - lo) AS xr FROM q)
        |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dims,
        |  round(CAST(sum(CAST(round(pow(x - xr, 2) * 1e12) AS BIGINT))
        |          AS DOUBLE) / 1e12 / count(*), 9) AS mse,
        |  CAST(sum(CAST(q AS BIGINT) * q) AS BIGINT) AS qnorm2
        |FROM r GROUP BY vec_id ORDER BY vec_id""".stripMargin
  )
}
