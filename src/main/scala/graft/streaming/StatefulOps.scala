package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** Custom keyed state via flatMapGroupsWithState — the streaming analog of
  * the reference's per-source crawl bookkeeping (in-flight URL set +
  * saved-count, app.js:457-512), generalized to per-user event telemetry.
  *
  * State is bounded: one small struct per user, evicted by event-time
  * timeout two gaps after the user's last event — the 100 TB-safe shape
  * (state size ∝ active keys, not history).
  */
object StatefulOps {

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp,
      event_type: String, value: Double)

  case class UserState(nEvents: Long, totalValue: Double,
      lastTs: Long, nSessions: Long)

  case class UserSnapshot(user_id: Long, n_events: Long, total_value: Double,
      n_sessions: Long, closed: Boolean)

  val SessionGapMs: Long = 30 * 60 * 1000

  /** Emits a snapshot per user per micro-batch (and a final `closed`
    * snapshot when the state times out). Counts events, value, and
    * session boundaries (gap > 30 min). */
  def trackUsers(events: Dataset[UserEvent]): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserSnapshot](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId, batch, state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSnapshot(userId, s.nEvents, s.totalValue,
              s.nSessions, closed = true))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
            var s = state.getOption.getOrElse(UserState(0L, 0.0, Long.MinValue, 0L))
            sorted.foreach { e =>
              val newSession = s.lastTs == Long.MinValue ||
                e.ts.getTime - s.lastTs > SessionGapMs
              s = UserState(s.nEvents + 1, s.totalValue + e.value,
                e.ts.getTime, s.nSessions + (if (newSession) 1 else 0))
            }
            state.update(s)
            // never set a timeout below the current watermark (the engine
            // rejects it); users idle across the whole batch window evict
            // shortly after the watermark instead
            state.setTimeoutTimestamp(
              math.max(s.lastTs + 2 * SessionGapMs,
                state.getCurrentWatermarkMs() + 1000))
            Iterator.single(UserSnapshot(userId, s.nEvents, s.totalValue,
              s.nSessions, closed = false))
          }
      }
  }

  /** The same per-user tracker on Spark 4's `transformWithState` —
    * the current stateful API (typed ValueState + explicit timers instead
    * of the single implicit timeout). Requires the RocksDB state store
    * provider; semantics are batch-parity-tested against both the direct
    * aggregate and [[trackUsers]] in StatefulSpec.
    */
  class UserTrackerProcessor
      extends StatefulProcessor[Long, UserEvent, UserSnapshot] {
    @transient private var state: ValueState[UserState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserState]("userState",
        Encoders.product[UserState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
        tv: TimerValues): Iterator[UserSnapshot] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
      var s = if (state.exists()) state.get()
              else UserState(0L, 0.0, Long.MinValue, 0L)
      sorted.foreach { e =>
        val newSession = s.lastTs == Long.MinValue ||
          e.ts.getTime - s.lastTs > SessionGapMs
        s = UserState(s.nEvents + 1, s.totalValue + e.value,
          e.ts.getTime, s.nSessions + (if (newSession) 1 else 0))
      }
      state.update(s)
      // single live eviction timer per key: drop stale ones, then arm two
      // gaps past the last event (clamped above the watermark, as in
      // trackUsers — the engine rejects timers below it)
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(math.max(s.lastTs + 2 * SessionGapMs,
        tv.getCurrentWatermarkInMs() + 1000))
      Iterator.single(UserSnapshot(userId, s.nEvents, s.totalValue,
        s.nSessions, closed = false))
    }

    override def handleExpiredTimer(userId: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[UserSnapshot] =
      if (state.exists()) {
        val s = state.get()
        state.clear()
        Iterator.single(UserSnapshot(userId, s.nEvents, s.totalValue,
          s.nSessions, closed = true))
      } else Iterator.empty
  }

  /** [[trackUsers]] re-expressed on transformWithState (event-time mode,
    * append output). */
  def trackUsersTws(events: Dataset[UserEvent]): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new UserTrackerProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
