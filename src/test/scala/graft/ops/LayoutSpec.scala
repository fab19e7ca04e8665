package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkSpecBase, Tables}
import graft.functions.ZOrder2

class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("zorder2 matches a naive bit-interleave reference") {
    def naive(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (12345L, 67890L), ((1L << 21) - 1, (1L << 21) - 1), (54321L, 98765L))
    val got = pairs.toDF("a", "b")
      .select(ZOrder2.zorder(col("a"), col("b"), 21).as("z"))
      .as[Long].collect().toSeq
    assert(got == pairs.map { case (a, b) => naive(a, b, 21) })
    // interleave is monotone in each key holding the other fixed
    assert(ZOrder2.compute(5, 9, 21) < ZOrder2.compute(6, 9, 21))
    assert(ZOrder2.compute(5, 9, 21) < ZOrder2.compute(5, 10, 21))
  }

  test("zorderN at n=2 is bit-identical to zorder2; n=3 interleaves by stride") {
    val pairs = Seq((0L, 0L), (12345L, 67890L), (54321L, 98765L),
      ((1L << 21) - 1, (1L << 21) - 1))
    val viaN = pairs.toDF("a", "b")
      .select(graft.functions.ZOrderN.zorder(Seq(col("a"), col("b")), 21).as("z"))
      .as[Long].collect().toSeq
    val via2 = pairs.toDF("a", "b")
      .select(ZOrder2.zorder(col("a"), col("b"), 21).as("z"))
      .as[Long].collect().toSeq
    assert(viaN == via2, "two-key ZOrderN diverged from ZOrder2")
    // n=3: bit i of key j lands at 3i+j
    def naive3(a: Long, b: Long, c: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (3 * i)) |
          (((b >> i) & 1L) << (3 * i + 1)) | (((c >> i) & 1L) << (3 * i + 2))
      }
    val triples = Seq((1L, 2L, 4L), (123L, 456L, 789L), (0L, 0L, 1L))
    val got3 = triples.toDF("a", "b", "c")
      .select(graft.functions.ZOrderN.zorder(
        Seq(col("a"), col("b"), col("c")), 18).as("z"))
      .as[Long].collect().toSeq
    assert(got3 == triples.map { case (a, b, c) => naive3(a, b, c, 18) })
  }

  test("raw-key interleave is LOUD on out-of-range keys; null keys stay null") {
    // r14 (ADVICE): a key with bits at/above bitsPerKey used to
    // interleave identically to the key 2^bits below it — silent
    // unclusterable output a mirrored oracle keeps green. Both the
    // 2-key expression and the composed N-key form must raise instead.
    val bad = Seq(((1L << 21), 1L)).toDF("a", "b")
    val e2 = intercept[Exception] {
      bad.select(ZOrder2.zorder(col("a"), col("b"), 21)).collect()
    }
    assert(e2.getMessage != null)
    val eN = intercept[Exception] {
      bad.select(graft.functions.ZOrderN.zorder(
        Seq(col("a"), col("b")), 21)).collect()
    }
    assert(exceptionChain(eN).exists(_.contains("out of range")),
      s"expected the zorderN guard message, got: ${eN.getMessage}")
    // negative keys are out of range too (srl fills with sign bits)
    val eNeg = intercept[Exception] {
      Seq((-1L, 1L)).toDF("a", "b").select(graft.functions.ZOrderN.zorder(
        Seq(col("a"), col("b")), 21)).collect()
    }
    assert(exceptionChain(eNeg).exists(_.contains("out of range")))
    // in-range keys are untouched by the guard; a null key nulls the
    // z-value (prior semantics) rather than raising
    val ok = Seq((Some((1L << 21) - 1), Some(5L)), (None, Some(5L)))
      .toDF("a", "b")
      .select(graft.functions.ZOrderN.zorder(Seq(col("a"), col("b")), 21)
        .as("z"))
      .select(col("z")).collect()
    assert(ok(0).getLong(0) == ZOrder2.compute((1L << 21) - 1, 5L, 21))
    assert(ok(1).isNullAt(0), "null key must stay null, not raise")
  }

  private def exceptionChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq

  test("writeZOrdered preserves data and tightens per-file envelopes on BOTH keys") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val out = tmpDir("zorder")
    Layout.writeZOrdered(li, col("l_partkey"), col("l_suppkey"), out, numFiles = 8)

    val back = spark.read.parquet(out)
    assert(back.count() == li.count())
    assert(back.select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet ==
      li.select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().toSet)

    // Per-file min/max envelopes (what parquet footer pruning sees) must be
    // substantially tighter than the global range on BOTH keys — the whole
    // point of z-ordering vs a single-column sort.
    val env = back.groupBy(input_file_name().as("f"))
      .agg((max("l_partkey") - min("l_partkey")).as("pw"),
        (max("l_suppkey") - min("l_suppkey")).as("sw"))
      .agg(avg("pw").as("apw"), avg("sw").as("asw"))
      .as[(Double, Double)].head()
    val (pMin, pMax) = li.agg(min("l_partkey"), max("l_partkey"))
      .as[(Long, Long)].head()
    val (sMin, sMax) = li.agg(min("l_suppkey"), max("l_suppkey"))
      .as[(Long, Long)].head()
    assert(env._1 < (pMax - pMin) * 0.7,
      s"avg partkey envelope ${env._1} not tighter than global ${pMax - pMin}")
    assert(env._2 < (sMax - sMin) * 0.7,
      s"avg suppkey envelope ${env._2} not tighter than global ${sMax - sMin}")
  }

  test("zOrderClusterN degrades on empty input and all-null keys instead of crashing") {
    // zero rows: min/max aggregates return NULL — getDouble on them threw
    // NullPointerException, aborting e.g. an OPTIMIZE ZORDER on a table
    // whose rows were all deleted (r13 review); must yield an empty frame
    val empty = spark.range(0).selectExpr("id AS a", "id AS b")
    assert(Layout.zOrderCluster(empty, col("a"), col("b"), 2).count() == 0)
    // an all-null key column: no envelope to tighten on that key — the
    // OTHER key must still cluster, and no row may be dropped
    val halfNull = spark.range(100).selectExpr(
      "CAST(NULL AS BIGINT) AS a", "id AS b")
    val out = Layout.zOrderCluster(halfNull, col("a"), col("b"), 2)
    assert(out.count() == 100)
    assert(out.schema.fieldNames.toSeq == Seq("a", "b"), "helper column leaked")
  }

  test("compact merges many small files into the requested count, sorted") {
    val src = tmpDir("small-files")
    Tables.orders(spark, sf0001).repartition(32).write.mode("overwrite").parquet(src)
    val scattered = spark.read.parquet(src)
    assert(scattered.select(input_file_name()).distinct().count() > 4)

    val out = tmpDir("compacted")
    Layout.compact(scattered, out, numFiles = 4, Seq(col("o_orderkey")))
    val back = spark.read.parquet(out)
    assert(back.select(input_file_name()).distinct().count() == 4)
    assert(back.count() == scattered.count())
    // within each file rows are sorted by the compaction key
    val unsorted = back
      .withColumn("f", input_file_name())
      .withColumn("prev", lag("o_orderkey", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f")
          .orderBy(monotonically_increasing_id())))
      .filter(col("prev") > col("o_orderkey"))
    assert(unsorted.count() == 0)
  }
}
