package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions, GraftBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions._

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions. Attach at session build time
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`), or post-hoc on a live
  * session via [[GraftExtensions.register]].
  *
  * Integer tuning parameters (shingle width, signature length, sketch
  * bits) are taken as trailing literal arguments — they parameterize the
  * generated code, so they must be constants, like Spark's own
  * `approx_count_distinct` rsd argument.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    // whole-operator custom plan: bounded-heap top-k per key
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKFilterPushdown)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other")
  }

  /** name -> children-to-expression builder, shared by the extension
    * injection and post-hoc registration. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "poly_fingerprint" -> (c => PolyFingerprint(c.head)),
    "cosine_sim" -> (c => CosineSim(c(0), c(1))),
    "zorder2" -> { c =>
      val bits = if (c.length > 2) intArg(c(2), "zorder2", "bitsPerKey") else 21
      ZOrder2(c(0), c(1), bits)
    },
    "word_shingles" -> (c =>
      WordShingles(c(0), intArg(c(1), "word_shingles", "n"))),
    "pos_shingles" -> (c =>
      PosShingles(c(0), intArg(c(1), "pos_shingles", "n"))),
    "minhash_sig" -> (c =>
      MinHashSig(c(0), intArg(c(1), "minhash_sig", "k"))),
    "simhash64" -> (c => SimHash64(c.head)),
    "hyperplane_sketch" -> { c =>
      HyperplaneSketch(c(0), intArg(c(1), "hyperplane_sketch", "nBits"),
        intArg(c(2), "hyperplane_sketch", "dim"))
    },
    "deletion_sigs" -> (c =>
      DeletionSigs(c(0), intArg(c(1), "deletion_sigs", "maxEd"))),
    "cdc_chunks" -> (c => CdcChunks(c.head)),
    "bpe_token_count" -> (c => BpeTokenCount(c.head)),
    "unigram_token_count" -> (c => UnigramTokenCount(c.head)),
    "utf8_bytes" -> (c => Utf8Bytes(c.head)),
    "bpe_merge_pass" -> (c => BpeMergePass(c(0),
      intArg(c(1), "bpe_merge_pass", "a"), intArg(c(2), "bpe_merge_pass", "b"),
      intArg(c(3), "bpe_merge_pass", "newId"))))

  /** Register graft SQL functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      GraftBridge.registerFunction(spark, name, builder)
    }
}
