package graft
import org.apache.spark.sql.functions._
class TmpProfile extends SparkSpecBase {
  test("profile dupClusters components at sf0.1") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      info(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm the scan cache
    docs.count()
    val pairs = ml.Dedup.jaccardPairsCapped(docs, 0.5, ml.Dedup.ScoredDfCap)
    time("pairs only (count)")(pairs.count())
    time("pairs only again")(pairs.count())
    for (g <- Seq(8, 1); rep <- 1 to 2)
      time(s"dupClusters salt=$g rep$rep")(
        ml.Dedup.dupClusters(pairs, saltBuckets = g).count())
    val clusters = ml.Dedup.dupClusters(pairs)
    time("keepCanonical tail")(ml.Dedup.keepCanonical(docs, clusters).count())
  }
}
