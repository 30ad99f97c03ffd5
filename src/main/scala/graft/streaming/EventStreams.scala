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

  /** T6: stream-static enrichment — join each micro-batch against a
    * static dimension. The dim side is broadcast, so the stream never
    * shuffles; at scale the dim is re-broadcast per batch, which is
    * exactly the semantics a slowly-refreshed lookup table wants. */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
      broadcast(dim.select(col("c_custkey"), col("c_mktsegment"))),
      events("user_id") === col("c_custkey"), "left")
      .select(events("event_id"), events("user_id"),
        col("c_mktsegment").as("segment"), events("value"))

  /** T7: latest-wins MERGE of one micro-batch into a parquet target —
    * the body of a foreachBatch upsert sink (streaming twin of the
    * judged c12_upsert_latest). Within the batch the highest
    * (ts, event_id) wins per user; rows for unseen users pass through
    * as inserts. The merged frame is materialized (localCheckpoint)
    * before the overwrite so the write never reads its own input. */
  def mergeBatchIntoTarget(batch: DataFrame, targetDir: String): Unit = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val latest = batch
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id").as("u_key"), col("value").as("u_value"))
    val existing =
      try spark.read.parquet(targetDir)
      catch { case _: Exception =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("user_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("value",
              org.apache.spark.sql.types.DoubleType))))
      }
    val merged = existing
      .join(latest, col("user_id") === col("u_key"), "full_outer")
      .select(
        coalesce(col("user_id"), col("u_key")).as("user_id"),
        coalesce(col("u_value"), col("value")).as("value"))
      .transform(graft.QueryRegistry.ckpt)
    merged.write.mode("overwrite").parquet(targetDir)
  }

  /** T8: stream-stream interval join — attribute each purchase to the
    * same user's views in the preceding 5 minutes. Both sides carry
    * watermarks, so join state is bounded: a buffered view can be
    * evicted once the purchase-side watermark passes view_ts + 5 min.
    * At scale both streams shuffle on user_id once and the join is
    * per-key local — no broadcast, no unbounded buffer. */
  def attributePurchases(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.filter(col("event_type") === "view")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
    val p = purchases.filter(col("event_type") === "purchase")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value"))
    p.join(v,
      col("p_user") === col("v_user") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr("interval 5 minutes"))
      .select(col("purchase_id"), col("view_id"), col("p_user").as("user_id"),
        col("value"))
  }

  /** T7 driver: attach the upsert sink to a stream via foreachBatch. */
  def upsertSink(stream: DataFrame, targetDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatchIntoTarget(batch, targetDir)
      }
      .start()

  /** T7': streaming ACID ingest — each micro-batch MERGEs into a
    * [[graft.sources.ManifestTable]] by key through one atomic
    * manifest commit, so a concurrent reader always sees a committed
    * snapshot boundary, never half a batch (the raw-parquet
    * `upsertSink` can expose a partially-rewritten target between its
    * delete and write). foreachBatch + the commit protocol's
    * optimistic version loop compose to exactly-once-per-batch at the
    * snapshot level: a replayed batch after a crash re-merges the same
    * keys and converges to the same head state.
    *
    * MERGE's key-unique-batch precondition is ENFORCED here, not
    * assumed: a trigger that delivers several rows for one key (a hot
    * key updated twice between triggers) is pre-reduced latest-wins —
    * highest `latestBy` tuple per key survives, the c12_upsert_latest
    * rule — before the merge, so a repeated key can never double-insert
    * through `upsert`. The empty-table case is decided INSIDE the
    * commit retry loop (ManifestTable.upsert handles head 0), so two
    * sink instances racing table creation resolve through the
    * conditional-commit protocol rather than a check-then-act branch
    * here. */
  def manifestUpsertSink(stream: DataFrame, table: String,
      checkpointDir: String,
      keys: Seq[String],
      latestBy: Seq[String] = Seq("ts", "event_id"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(latestBy.map(col(_).desc): _*)
        val unique = batch
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        if (!batch.isEmpty)
          graft.sources.ManifestTable.upsert(spark, table, unique, keys)
        ()
      }
      .start()
}
