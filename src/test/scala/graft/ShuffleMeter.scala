package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Listener harness measuring the total shuffle (bytes, records) written
  * by everything executed inside `body` — the deterministic plan
  * property the volume guards pin (wall-clock on this box swings 5×
  * under co-tenant load; bytes through an exchange do not). */
object ShuffleMeter {
  def shuffleMetrics(spark: SparkSession)(body: => Unit): (Long, Long) = {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val records = new java.util.concurrent.atomic.AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      org.apache.spark.sql.GraftBridge.waitListenerBus(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    (bytes.get(), records.get())
  }
}
