package graft.functions

import org.apache.spark.sql.{Encoder, SparkSession, functions => F}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One spec-table row: `ord` is the row's position in the original
  * document order (must be a total order — it decides which duplicate
  * key wins), `key`/`value` the raw pair. */
case class SpecEntry(ord: Long, key: String, value: String)

/** A7 `merge_array_object` (app.js:100) as a typed `Aggregator` — the
  * Dataset-native spelling of the map merge: fold (key, value) pairs into
  * one map, trailing underscores stripped off keys, the LATEST entry (by
  * `ord`) winning per key. Semantically identical to the sequential
  * [[Normalize.mergeSpecs]] (parity-tested), but associative and
  * commutative over unique `ord`s, so Spark can partial-aggregate it
  * map-side and merge buffers in any order — the property the sequential
  * fold lacks.
  *
  * The buffer keeps (ord, value) per trimmed key: max-by-ord is the
  * semigroup that makes "later wins" order-insensitive.
  */
object MergeSpecs
    extends Aggregator[SpecEntry, Map[String, (Long, String)], Map[String, String]] {

  override def zero: Map[String, (Long, String)] = Map.empty

  override def reduce(b: Map[String, (Long, String)],
      a: SpecEntry): Map[String, (Long, String)] = {
    val k = Normalize.trimTrailingUnderscores(a.key)
    b.get(k) match {
      case Some((o, _)) if o >= a.ord => b
      case _ => b + (k -> (a.ord, a.value))
    }
  }

  override def merge(b1: Map[String, (Long, String)],
      b2: Map[String, (Long, String)]): Map[String, (Long, String)] =
    b2.foldLeft(b1) { case (acc, (k, (o, v))) =>
      acc.get(k) match {
        case Some((o2, _)) if o2 >= o => acc
        case _ => acc + (k -> (o, v))
      }
    }

  override def finish(r: Map[String, (Long, String)]): Map[String, String] =
    r.map { case (k, (_, v)) => k -> v }

  override def bufferEncoder: Encoder[Map[String, (Long, String)]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, String]] =
    ExpressionEncoder()

  /** Untyped/SQL form: `merge_specs(ord, key, value)`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("merge_specs", F.udaf(MergeSpecs))
}
