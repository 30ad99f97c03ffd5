package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sources.{GraftCatalog, ManifestTable, MviewIncremental}

/** CONTINUOUS materialized-view maintenance (r19, VERDICT r18 ask #3):
  * the change feed and the incremental refresh, composed. A streaming
  * query tails the change feed of every base table the view reads and
  * drives `REFRESH MATERIALIZED VIEW … INCREMENTAL` once per fired
  * microbatch — the streaming twin of the batch q_mv_incremental
  * loop. Every published feed range fires a batch even when its diff
  * holds zero rows (delete/metadata-only commits publish a
  * schema-only part file as the wake-up signal), so retraction-only
  * churn reaches the refresh too.
  *
  * The feed is only the TRIGGER. Each refresh reads the base tables'
  * manifests itself (marker → head delta, dirty-group rescan), so
  * UPDATE/DELETE/MERGE commits are fully reflected — the append-only
  * caveat of streaming an aggregate OVER the feed rows
  * ([[ChangeFeedStream.readTableStream]]) does not apply here, which
  * is exactly why join and multi-table aggregate views that refuse as
  * feed-row aggregates maintain fine through this composition.
  *
  * Exactly-once: the refresh is idempotent by construction — each
  * image commit records the base versions it reflects as txn markers,
  * and a replayed refresh against unchanged markers is a publish-free
  * noop. So the at-least-once firing a restarted foreachBatch sink
  * gives (Spark may replay the last uncommitted batch) converges to
  * exactly-once IMAGE maintenance, with the stream's checkpoint
  * carrying only feed-file progress. Stop/restart at any point: the
  * first refresh after restart consumes whatever marker→head window
  * accumulated while the query was down.
  *
  * At 100 TB each tick costs O(churned files) to locate dirty groups
  * plus a rescan restricted to them — the continuous loop never pays
  * the O(base) recompute a scheduled full REFRESH would. */
object MviewMaintenance {

  /** Start maintaining `graft.<name>` continuously. The view's
    * defining query must QUALIFY for incremental refresh
    * ([[MviewIncremental.analyze]]) — a non-qualifying view refuses
    * here rather than silently running O(base) full recomputes per
    * tick (schedule plain REFRESH for those).
    *
    * `autoPump = false` for deployments that run their own
    * [[ChangeFeedStream.publishPending]] scheduler (and for
    * deterministic tests — publish, then processAllAvailable). */
  def maintainView(spark: SparkSession, name: String,
                   checkpointDir: String,
                   autoPump: Boolean = true,
                   pollIntervalMs: Long = 250L,
                   trigger: Trigger =
                     Trigger.ProcessingTime("500 milliseconds"))
      : StreamingQuery = {
    val bare = name.stripPrefix("graft.")
    val path = GraftCatalog.lookup(bare).getOrElse(
      throw new IllegalArgumentException(
        s"maintainView: no registered table 'graft.$bare'"))
    val sql = ManifestTable.tableConfig(spark, path).get("graft.mview")
      .getOrElse(throw new IllegalArgumentException(
        s"maintainView: graft.$bare is not a materialized view — it " +
          "records no defining query"))
    val sh = MviewIncremental.analyze(spark, sql) match {
      case Right(s) => s
      case Left(reason) => throw new IllegalArgumentException(
        s"maintainView: graft.$bare cannot maintain incrementally — " +
          s"$reason. Continuous maintenance refuses rather than run a " +
          "full recompute per microbatch; schedule plain REFRESH " +
          "MATERIALIZED VIEW for this shape")
    }
    // one change stream per DISTINCT base table (a self-joined table
    // feeds once), unioned into a single trigger stream — churn in ANY
    // base wakes the refresh, including dim-only churn
    val ticks: DataFrame = sh.markerTables.map { case (n, _) =>
      ChangeFeedStream.readTableStream(spark, n, autoPump, pollIntervalMs)
        .select(lit(1).as("tick"))
    }.reduce(_.unionByName(_))
    ticks.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, _: Long) =>
        // refresh on EVERY fired batch, rows or not: a delete-only
        // base commit publishes a zero-row feed range (its only
        // consumer-visible trace is the schema-only part file that
        // fires this batch) — gating on batch rows would sleep
        // through exactly the retraction commits the manifest-reading
        // refresh exists to reflect. Replayed/empty batches cost one
        // marker-vs-head probe: the refresh is a publish-free noop
        spark.sql(
          s"REFRESH MATERIALIZED VIEW graft.$bare INCREMENTAL").collect()
        ()
      }
      .start()
  }
}
