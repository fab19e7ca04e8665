package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft.{SparkSpecBase, Tables}

/** Shuffle-VOLUME regression guards. Wall-clock on this box swings up to
  * 5× under co-tenant load (NOTES.md §9), but the bytes a plan moves
  * through its exchanges are a deterministic property of the plan and the
  * data — so the scale claims ("shuffles carry sketches, not text",
  * "broadcast joins move no fact rows", "the partial heap caps what
  * reaches the exchange") are pinned here in bytes, where noise cannot
  * blur them. Bounds are ~2× the measured sf0.001 volumes: tight enough
  * that reintroducing a text-carrying or pre-aggregation-free shuffle
  * (order-of-magnitude regressions) fails, loose enough that layout
  * jitter doesn't.
  */
class ShuffleVolumeSpec extends SparkSpecBase {
  import spark.implicits._

  /** Total shuffle (bytes, records) written across all tasks of `body`
    * ([[graft.ShuffleMeter]] — shared with the ns_* family guard). */
  private def shuffleMetrics(body: => Unit): (Long, Long) =
    graft.ShuffleMeter.shuffleMetrics(spark)(body)

  private def shuffleWritten(body: => Unit): Long = shuffleMetrics(body)._1

  private val MiB = 1L << 20

  test("q1_agg: broadcast star join shuffles only aggregate partials") {
    val b = shuffleWritten {
      graft.SparkEntry.queries("q1_agg")(spark, sf0001).count()
    }
    // 6k lineitem rows × 3 dims: every join side broadcasts; the only
    // exchange is the (r_name, returnflag) partial-aggregate rows
    assert(b < 1 * MiB, s"q1_agg shuffled $b bytes — a join stopped broadcasting")
    spark.catalog.clearCache()
  }

  test("minhash dedup: shuffles carry signatures and ids, never text") {
    val docsBytes = Tables.documents(spark, sf0001)
      .agg(sum(length($"text"))).head.getLong(0)
    try {
      val b = shuffleWritten {
        graft.ml.Dedup.minhashDupPairs(Tables.documents(spark, sf0001), 0.5)
          .count()
      }
      // banded sketch rows + candidate verify joins; if document text or
      // shingle arrays ever enter an exchange this blows through the bound
      assert(b < 8 * MiB,
        s"minhash shuffled $b bytes (corpus text is $docsBytes) — text in an exchange?")
    } finally spark.catalog.clearCache() // even on failure: later
    // measurements in this shared session must start cold
  }

  test("ivfpq probe: exchanges carry codes and fixed-point dots, never floats") {
    // the ADC tier's scale claim: after encoding, the raw 64-double
    // vectors exist only on the broadcast query side (probes + LUT) —
    // the sole exchange is the per-(query, vec) fixed-point ADC sum over
    // 4-byte code joins. The corpus floats at sf0.001 are ~500 KiB; if
    // they ever entered an exchange (a lost broadcast hint, a rerank
    // shuffle on vec_id) the bound blows through.
    val emb = Tables.embeddings(spark, sf0001)
    val index = graft.ml.Similarity.ivfpqIndex(emb, 0L to 7L)
    val queries = emb.filter($"vec_id".isin(0L to 7L: _*))
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val bProbe = shuffleWritten {
      graft.ml.Similarity.ivfpqProbe(index, queries, 5).count()
    }
    assert(bProbe < 1 * MiB,
      s"ivfpq probe shuffled $bProbe bytes — floats in an exchange?")
    // the refine stage adds a broadcast candidate fetch on top; the
    // corpus scan must still never shuffle its vectors
    val bRerank = shuffleWritten {
      graft.ml.Similarity.ivfpqTopKReranked(emb, 0L to 7L, 5, rerankK = 20)
        .count()
    }
    assert(bRerank < 2 * MiB,
      s"reranked probe shuffled $bRerank bytes — candidate fetch stopped broadcasting?")
    spark.catalog.clearCache()
  }

  test("heap top-k: the partial caps the RECORDS that reach the exchange") {
    // identical projection both sides, no output sort on either — the
    // ONLY difference is the partial heap in front of the key exchange.
    // Records, not bytes: at this scale compressed byte counts are
    // dominated by row ORDER (the parquet-order baseline compresses
    // better than jumbled heap output), while the record count is the
    // exact deterministic claim — <= k rows per key per map partition.
    val proj = Tables.orders(spark, sf0001)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val (_, fullRec) = shuffleMetrics {
      proj.repartition($"o_custkey").count() // the no-partial baseline
    }
    val (_, topkRec) = shuffleMetrics {
      graft.plans.TopK.perKey(
        Tables.orders(spark, sf0001).select(
          $"o_custkey", $"o_orderkey", $"o_totalprice"),
        Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), 3).count()
    }
    // 150 customers × top-3 ≈ 450 survivors of ~1500 input rows
    assert(topkRec < fullRec / 2,
      s"heap top-k shuffled $topkRec records vs full repartition $fullRec")
    spark.catalog.clearCache()
  }

  test("fuzzy pairs: distinct-string reduction bounds the signature exchange") {
    try {
      val b = shuffleWritten {
        val docs = Tables.documents(spark, sf0001)
          .select($"doc_id", substring($"text", 1, 24).as("s"))
        graft.ml.Fuzzy.fuzzyPairs(docs, "doc_id", "s", 2).count()
      }
      // ~500 distinct 24-char prefixes × ~301 signature longs plus the
      // candidate/verify traffic; pre-round-5 (per-id signatures through
      // dup groups) this was a multiple of the corpus, not a fraction
      assert(b < 8 * MiB, s"fuzzy pairs shuffled $b bytes — reduction regressed?")
    } finally spark.catalog.clearCache() // fuzzyPairs persists memb + sigs
  }
}
