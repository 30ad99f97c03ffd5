package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Typed event row for the stateful streaming operators. */
case class EventRow(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Per-user running aggregate emitted on every update. */
case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

/** T5 (custom-state flavor): Spark 4.x `transformWithState` with an
  * arbitrary ValueState per key — the successor API to
  * mapGroupsWithState. State lives in the per-executor RocksDB state
  * store (provider set by the caller/test), so per-key state scales
  * with executor count, not driver memory. TTL is the state-boundedness
  * knob at 100 TB (TTLConfig.NONE here; production would bound it).
  */
class RunningCountProcessor extends StatefulProcessor[Long, EventRow, UserRunning] {
  @transient private var state: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Double)](
      "running", Encoders.product[(Long, Double)], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[EventRow],
      timerValues: TimerValues): Iterator[UserRunning] = {
    val (n0, s0) = if (state.exists()) state.get() else (0L, 0.0)
    var n = n0
    var s = s0
    rows.foreach { r => n += 1; s += r.value }
    state.update((n, s))
    Iterator.single(UserRunning(key, n, s))
  }
}

object StatefulOps {
  /** Running per-user (count, sum) over a stream of events, one update
    * row per key per micro-batch. */
  def runningCounts(events: Dataset[EventRow]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningCountProcessor, TimeMode.None(), OutputMode.Update())
  }
}
