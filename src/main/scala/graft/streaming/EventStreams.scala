package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming transforms over the events schema — SURVEY.md
  * §2 T1–T5. Each is a plain DataFrame→DataFrame function so the same
  * logic runs on a batch frame (DuckDB-verifiable, T1–T3) and on a
  * `readStream` source with watermarks (MemoryStream unit tests, T4–T5).
  * No DStreams — Structured Streaming only (Spark 4.x).
  */
object EventStreams {

  /** T1/T4: tumbling 1-hour windows; with a streaming source the
    * watermark bounds state and drops late rows in append mode. */
  def hourlyCounts(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "10 minutes") else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"))
  }

  /** T2: sliding 1-hour windows every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"))

  /** T3: 10-minute-gap session windows per user. */
  def sessions(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "10 minutes") else events
    src.groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start_s"),
        col("n_events"))
  }

  /** T5: stateful streaming dedup on event_id, state bounded by the
    * watermark (batch fallback: plain dropDuplicates). */
  def dedupEvents(events: DataFrame, streaming: Boolean): DataFrame =
    if (streaming)
      events.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")
}
