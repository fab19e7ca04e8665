package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions, GraftBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.PolyFingerprint

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions. Attach at session build time
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`), or post-hoc on a live
  * session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("poly_fingerprint"),
      new ExpressionInfo(classOf[PolyFingerprint].getName, "poly_fingerprint"),
      (children: Seq[Expression]) => PolyFingerprint(children.head)))
  }
}

object GraftExtensions {
  /** Register graft SQL functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "poly_fingerprint",
      children => PolyFingerprint(children.head))
}
