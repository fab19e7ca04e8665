package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for Spark-backed suites: one session per JVM (sbt forks
  * one test JVM), local[*] with small shuffle partitioning. */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.session
  def sf0001 = "/root/testdata/sf0.001"

  /** When set, every test in the suite runs with this streaming state
    * store provider (set before, restored after, each test). Lets a
    * whole streaming suite be re-run under RocksDB — the off-heap
    * provider a large deployment actually uses — by subclassing with an
    * override instead of duplicating tests. */
  protected def stateStoreProvider: Option[String] = None

  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome =
    stateStoreProvider match {
      case None => super.withFixture(test)
      case Some(p) =>
        val key = "spark.sql.streaming.stateStore.providerClass"
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, p)
        try super.withFixture(test)
        finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
    }
}

object SparkSpecBase {
  /** FQCN of the RocksDB state store provider (shared by the RocksDB
    * suite overrides and the per-test sets in StatefulSpec). */
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[*]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // unreleased TaskMemoryManager reservations (e.g. from the top-k
      // partial exec's MemoryConsumer) fail the task instead of warning
      .config("spark.unsafe.exceptionOnMemoryLeak", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
