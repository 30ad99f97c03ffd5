package graft.streaming

import org.apache.spark.sql.functions._
import graft.QueryRegistry._
import graft.sources.Tables

/** Batch-at-rest equivalents of the streaming windows (SURVEY.md §2 T1–T3)
  * — same EventStreams logic, DuckDB-verifiable. Window starts are
  * emitted as epoch millis so the events table's ns-precision parquet
  * (Spark truncates to µs, DuckDB keeps ns — SURVEY.md §7.3.5) can never
  * skew the comparison: hour/15-min boundaries are whole seconds.
  */
object StreamingQueries {

  val entries: Seq[Entry] = Seq(
    // T1: tumbling 1-hour window aggregation.
    Entry(
      "t1_tumbling_window",
      (s, d) =>
        EventStreams.hourlyCounts(Tables.events(s, d))
          .select(unix_millis(col("win_start")).as("win_ms"), col("event_type"), col("cnt"))
          .orderBy("win_ms", "event_type"),
      Some("""SELECT epoch_ms(date_trunc('hour', ts)) AS win_ms, event_type, count(*) AS cnt
             |FROM events GROUP BY 1, 2
             |ORDER BY win_ms NULLS FIRST, event_type NULLS FIRST""".stripMargin)
    ),

    // T2: sliding 1h/15min windows — each event lands in exactly 4
    // epoch-aligned windows; the oracle generates the same 4 offsets.
    Entry(
      "t2_sliding_window",
      (s, d) =>
        EventStreams.slidingCounts(Tables.events(s, d))
          .select(unix_millis(col("win_start")).as("win_ms"), col("event_type"), col("cnt"))
          .orderBy("win_ms", "event_type"),
      Some("""SELECT ((epoch_ms(ts) // 900000) - k) * 900000 AS win_ms, event_type, count(*) AS cnt
             |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) o(k)
             |GROUP BY 1, 2 ORDER BY win_ms NULLS FIRST, event_type NULLS FIRST""".stripMargin)
    ),

    // T3: session windows (10-minute gap) per user — oracle is the
    // classic gaps-and-islands rewrite. Spark opens a new session when
    // the gap is >= the duration; the island flag matches exactly.
    Entry(
      "t3_session_window",
      (s, d) =>
        EventStreams.sessions(Tables.events(s, d))
          .orderBy("user_id", "session_start_s"),
      Some("""WITH x AS (
             |SELECT user_id, ts,
             |CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS new_s
             |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |y AS (SELECT user_id, ts,
             |sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |FROM x)
             |SELECT user_id, epoch_ms(min(ts)) // 1000 AS session_start_s, count(*) AS n_events
             |FROM y GROUP BY user_id, sid
             |ORDER BY user_id NULLS FIRST, session_start_s NULLS FIRST""".stripMargin)
    ),

    // T8 batch twin: the stream-stream interval join
    // (EventStreams.attributePurchases) computed at rest — each
    // purchase joined to the same user's views in the preceding 5
    // minutes, rolled up per purchase so the judged output is bounded
    // and deterministic. Scale shape is identical to the streaming
    // plan: ONE shuffle on user_id, then a per-key local interval
    // filter — exactly the state the streaming side's watermark bounds
    // (a buffered view dies when the purchase watermark passes
    // view_ts + 5 min). Interval arithmetic in integer micros on both
    // engines, so timestamp-precision skew cannot move the hash.
    Entry(
      "t8_interval_join",
      (s, d) => {
        val e = Tables.events(s, d)
        val v = e.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"),
            unix_micros(col("ts")).as("v_us"))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            unix_micros(col("ts")).as("p_us"))
        p.join(v, Seq("user_id"))
          .filter(col("v_us") <= col("p_us") &&
            col("v_us") >= col("p_us") - lit(300000000L))
          .groupBy("purchase_id", "user_id")
          .agg(count(lit(1)).as("n_views"),
            min(col("view_id")).as("first_view"),
            max(col("view_id")).as("last_view"))
          .orderBy("purchase_id")
      },
      Some("""WITH v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS v_us
             |  FROM events WHERE event_type = 'view'),
             |p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
             |  FROM events WHERE event_type = 'purchase')
             |SELECT p.purchase_id, p.user_id, count(*) AS n_views,
             |  min(v.view_id) AS first_view, max(v.view_id) AS last_view
             |FROM p JOIN v ON p.user_id = v.user_id
             |  AND v.v_us <= p.p_us AND v.v_us >= p.p_us - 300000000
             |GROUP BY 1, 2 ORDER BY purchase_id NULLS FIRST""".stripMargin)
    )
  )
}
