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

  /** The foreachBatch body for a keyed latest-state sink: each batch
    * MERGEs into `table` on `keys` (insert new keys, replace matched
    * ones), exactly once per batch id. Batches must be key-unique —
    * pre-collapse multi-event batches with [[latestWins]]. */
  def upsertBatch(table: String, keys: Seq[String], appId: String)
      : (DataFrame, Long) => Unit = (batch, batchId) =>
    ManifestTable.merge(batch.sparkSession, table, batch, keys,
      txn = Some((appId, batchId)))

  /** The foreachBatch body for an append-only sink (event logs):
    * each batch commits as one append version, exactly once. */
  def appendBatch(table: String, appId: String)
      : (DataFrame, Long) => Unit = (batch, batchId) =>
    ManifestTable.commit(batch.sparkSession, table, batch,
      txn = Some((appId, batchId)))

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

  /** Wire a streaming frame into `table` as a keyed upsert sink:
    * `events.writeStream` → [[into]] → `.start()`. Sugar over
    * foreachBatch + [[upsertBatch]]. */
  def into[T](w: DataStreamWriter[T], table: String, keys: Seq[String],
              appId: String): DataStreamWriter[T] =
    w.foreachBatch { (batch: org.apache.spark.sql.Dataset[T], batchId: Long) =>
      upsertBatch(table, keys, appId)(batch.toDF(), batchId)
    }
}
