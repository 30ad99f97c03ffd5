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

/** Per-user funnel progress emitted each micro-batch: furthest stage
  * reached and the stage timestamps (µs epoch, -1 = not reached). */
case class FunnelUpdate(user_id: Long, stage: Int, t1_us: Long, t2_us: Long, t3_us: Long)

/** Streaming twin of the batch w6_funnel query: per-user ordered
  * funnel (s1 → s2-after-s1 → s3-after-that) with the three stage
  * timestamps as ValueState. Rows are processed in ts order within
  * each batch; cross-batch late data refines t1/t2 downward but
  * cannot resurrect a candidate discarded in an earlier batch — the
  * same boundedness tradeoff the watermark-scoped dedup makes, and
  * exact whenever per-user arrival is ts-ordered across batches
  * (within-batch disorder is always handled). State is three longs
  * per user in RocksDB — O(users), not O(events).
  */
class FunnelProcessor(s1: String = "view", s2: String = "click",
                      s3: String = "purchase")
    extends StatefulProcessor[Long, EventRow, FunnelUpdate] {
  @transient private var state: ValueState[(Long, Long, Long)] = _
  private val None_ = Long.MaxValue

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long, Long)](
      "funnel", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[EventRow],
      timerValues: TimerValues): Iterator[FunnelUpdate] = {
    var (t1, t2, t3) =
      if (state.exists()) state.get() else (None_, None_, None_)
    // java.sql.Timestamp: getTime is ms-granular; sub-ms lives in
    // getNanos — compose the full µs value (events are µs-granular)
    def micros(r: EventRow): Long =
      Math.floorDiv(r.ts.getTime, 1000L) * 1000000L + r.ts.getNanos / 1000L
    rows.toSeq.sortBy(r => (micros(r), r.event_id)).foreach { r =>
      val us = micros(r)
      if (r.event_type == s1 && us < t1) t1 = us
      else if (r.event_type == s2 && t1 != None_ && us > t1 && us < t2) t2 = us
      else if (r.event_type == s3 && t2 != None_ && us > t2 && us < t3) t3 = us
    }
    state.update((t1, t2, t3))
    val stage = if (t3 != None_) 3 else if (t2 != None_) 2 else if (t1 != None_) 1 else 0
    def out(t: Long) = if (t == None_) -1L else t
    Iterator.single(FunnelUpdate(key, stage, out(t1), out(t2), out(t3)))
  }
}

/** One maintained top-k row per user per micro-batch. */
case class TopPurchase(user_id: Long, rank: Int, value: Double, event_id: Long)

/** T10: per-user streaming top-k purchases via ListState — the
  * bounded-collection state flavor (ValueState holds scalars, this
  * holds the k best (value, event_id) pairs; k rows per key in
  * RocksDB regardless of stream length). Order: value DESC, then
  * event_id ASC so replays and cross-batch merges are deterministic.
  */
class TopKPurchaseProcessor(k: Int = 3)
    extends StatefulProcessor[Long, EventRow, TopPurchase] {
  @transient private var state: ListState[(Double, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getListState[(Double, Long)](
      "topk", Encoders.product[(Double, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[EventRow],
      timerValues: TimerValues): Iterator[TopPurchase] = {
    val merged = (state.get().toSeq ++
        rows.filter(_.event_type == "purchase").map(r => (r.value, r.event_id)))
      .sortBy { case (v, id) => (-v, id) }
      .take(k)
    state.clear()
    if (merged.nonEmpty) state.appendList(merged.toArray)
    merged.iterator.zipWithIndex.map { case ((v, id), i) =>
      TopPurchase(key, i + 1, v, id)
    }
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

  /** Streaming per-user funnel progress (stage + stage timestamps),
    * one update row per key per micro-batch. */
  def funnelProgress(events: Dataset[EventRow]): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Streaming per-user top-k purchases (ListState), re-emitted each
    * micro-batch the key appears in. */
  def topPurchases(events: Dataset[EventRow], k: Int = 3): Dataset[TopPurchase] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TopKPurchaseProcessor(k), TimeMode.None(), OutputMode.Update())
  }
}
