package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for Spark-backed suites: one session per JVM (sbt forks
  * one test JVM), local[*] with small shuffle partitioning. */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.session
  def sf0001 = "/root/testdata/sf0.001"
}

object SparkSpecBase {
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
