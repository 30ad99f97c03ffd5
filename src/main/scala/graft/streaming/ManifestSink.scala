package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.sources.ManifestTable

/** Structured-Streaming sink INTO the manifest table — the missing
  * half of the feed story (ChangeFeedStream reads the table as a
  * stream; this writes a stream into it with ACID + exactly-once).
  *
  * The composition is the standard Delta one: `foreachBatch` hands
  * each micro-batch to [[ManifestTable.merge]] (keyed upsert) or
  * [[ManifestTable.commit]] (append), tagged with
  * `txn = (appId, batchId)`. Spark's checkpoint guarantees each batch
  * id is processed AT LEAST once (a crash between the merge's commit
  * and the checkpoint write replays the batch on restart); the
  * manifest's transaction record turns that into EXACTLY once — the
  * replayed batch finds its (appId, batchId) already recorded at the
  * head it would commit against and no-ops, atomically, because the
  * record rides the same manifest publish as the data.
  *
  * At 100 TB each micro-batch costs what the equivalent batch merge
  * costs — touched-file pruned, O(churn) write volume — plus one root
  * manifest write; the stream adds no per-row state of its own. */
object ManifestSink {

  /** `table` may be a directory path or a REGISTERED name (bare or
    * `graft.`-qualified) — the streaming-WRITE twin of
    * readTableStream's by-name sugar (r14 verdict ask #4). Anything
    * holding a path separator is a path; anything else resolves
    * through the registry, loudly. Resolution happens ONCE, here —
    * the foreachBatch closures then carry the path, so a mid-stream
    * rename does not silently redirect a running query. */
  private def resolve(table: String): String =
    if (table.contains("/") || table.contains("\\")) table
    else {
      val bare = if (table.toLowerCase(java.util.Locale.ROOT)
          .startsWith("graft.")) table.substring("graft.".length) else table
      require(graft.sources.GraftCatalog.lookupView(bare).isEmpty,
        s"ManifestSink: '$table' is a VIEW — views are read-only; " +
          "sink into the table it reads")
      graft.sources.GraftCatalog.lookup(bare).getOrElse(
        throw new IllegalArgumentException(
          s"ManifestSink: no registered table '$table'" +
            graft.sources.GraftCatalog.hintRenamed(bare) +
            " — GraftCatalog.register(name, path) first, or pass a path"))
    }

  /** The foreachBatch body for a keyed latest-state sink: each batch
    * MERGEs into `table` (a path or a registered name) on `keys`
    * (insert new keys, replace matched ones), exactly once per batch
    * id. Batches must be key-unique — pre-collapse multi-event
    * batches with [[latestWins]]. */
  def upsertBatch(table: String, keys: Seq[String], appId: String)
      : (DataFrame, Long) => Unit = {
    val path = resolve(table)
    (batch, batchId) =>
      ManifestTable.merge(batch.sparkSession, path, batch, keys,
        txn = Some((appId, batchId)))
  }

  /** The foreachBatch body for an append-only sink (event logs):
    * each batch commits as one append version, exactly once.
    * `table` is a path or a registered name. */
  def appendBatch(table: String, appId: String)
      : (DataFrame, Long) => Unit = {
    val path = resolve(table)
    (batch, batchId) =>
      ManifestTable.commit(batch.sparkSession, path, batch,
        txn = Some((appId, batchId)))
  }

  /** Collapse a micro-batch to one row per key, latest `ordering`
    * wins (ties broken by the ordering column list in order) — makes
    * any event batch [[upsertBatch]]-safe. */
  def latestWins(batch: DataFrame, keys: Seq[String],
                 ordering: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ordering.map(c => col(c).desc): _*)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Wire a streaming frame into `table` (a path or a registered
    * name — `into(w, "graft.state", …)`) as a keyed upsert sink:
    * `events.writeStream` → [[into]] → `.start()`. Sugar over
    * foreachBatch + [[upsertBatch]]. */
  def into[T](w: DataStreamWriter[T], table: String, keys: Seq[String],
              appId: String): DataStreamWriter[T] =
    w.foreachBatch { (batch: org.apache.spark.sql.Dataset[T], batchId: Long) =>
      upsertBatch(table, keys, appId)(batch.toDF(), batchId)
    }
}
