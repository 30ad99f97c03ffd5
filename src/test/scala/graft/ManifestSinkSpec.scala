package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.ManifestTable
import graft.streaming.ManifestSink

case class Kv(id: Long, v: String, seq: Long)

/** Streaming sink INTO the manifest table (r10): foreachBatch →
  * keyed MERGE with batch-id-keyed transaction idempotence (the Delta
  * txnAppId/txnVersion idiom). Pins the exactly-once contract: one
  * manifest version per delivered batch, a replayed batch (the
  * crash-between-commit-and-checkpoint case) is a no-op, restart from
  * a checkpoint duplicates nothing, and a CONCURRENT replay of the
  * same batch resolves inside the commit protocol. */
class ManifestSinkSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def fresh(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def headMap(t: String): Map[Long, (String, Long)] =
    ManifestTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("streaming upsert sink: one version per batch; replayed batch is a no-op") {
    implicit val ctx = spark.sqlContext
    val t = fresh("graft_sink")
    val cp = fresh("graft_sink_cp")
    val in = MemoryStream[Kv]
    val q = ManifestSink.into(
      in.toDF().writeStream.option("checkpointLocation", cp),
      t, Seq("id"), "app-a").start()
    try {
      in.addData(Kv(1, "a", 1), Kv(2, "b", 1))
      q.processAllAvailable()
      in.addData(Kv(1, "A", 2), Kv(3, "c", 2))
      q.processAllAvailable()
    } finally q.stop()
    assert(headMap(t) === Map(1L -> ("A", 2L), 2L -> ("b", 1L), 3L -> ("c", 2L)))
    val v = ManifestTable.currentVersion(spark, t)
    assert(v === 2, "one manifest version per delivered batch")
    assert(ManifestTable.txnVersion(spark, t, "app-a") === Some(1L))
    // the crash-window case: checkpoint lost the last batch's mark, the
    // restarted query re-delivers it — the sink must not apply it twice
    ManifestSink.upsertBatch(t, Seq("id"), "app-a")(
      Seq(Kv(1, "A", 2), Kv(3, "c", 2)).toDF(), 1L)
    assert(ManifestTable.currentVersion(spark, t) === v, "replay must not commit")
    assert(headMap(t) === Map(1L -> ("A", 2L), 2L -> ("b", 1L), 3L -> ("c", 2L)))
    // a LATER batch from the same app still lands
    ManifestSink.upsertBatch(t, Seq("id"), "app-a")(
      Seq(Kv(4, "d", 3)).toDF(), 2L)
    assert(ManifestTable.currentVersion(spark, t) === v + 1)
    assert(ManifestTable.txnVersion(spark, t, "app-a") === Some(2L))
  }

  test("restart from checkpoint continues without duplicating rows or versions") {
    implicit val ctx = spark.sqlContext
    val t = fresh("graft_sink_restart")
    val cp = fresh("graft_sink_restart_cp")
    val in = MemoryStream[Kv]
    val w = () => ManifestSink.into(
      in.toDF().writeStream.option("checkpointLocation", cp),
      t, Seq("id"), "app-r")
    val q1 = w().start()
    try {
      in.addData(Kv(1, "a", 1), Kv(2, "b", 1))
      q1.processAllAvailable()
    } finally q1.stop()
    val vMid = ManifestTable.currentVersion(spark, t)
    // restart against the same checkpoint; feed more data
    val q2 = w().start()
    try {
      in.addData(Kv(2, "B", 2), Kv(5, "e", 2))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(headMap(t) === Map(1L -> ("a", 1L), 2L -> ("B", 2L), 5L -> ("e", 2L)))
    assert(ManifestTable.currentVersion(spark, t) === vMid + 1,
      "the restarted query's batch lands as exactly one version")
  }

  test("by-name sink: graft.<name> resolves through the registry; checkpoint restart duplicates nothing") {
    implicit val ctx = spark.sqlContext
    val t = fresh("graft_sink_byname")
    val cp = fresh("graft_sink_byname_cp")
    graft.sources.GraftCatalog.register("r15_sink", t)
    try {
      val in = MemoryStream[Kv]
      // the streaming-write twin of readTableStream's by-name sugar
      // (r14 verdict ask #4): the NAME, not the path, wires the sink
      val w = () => ManifestSink.into(
        in.toDF().writeStream.option("checkpointLocation", cp),
        "graft.r15_sink", Seq("id"), "app-n")
      val q1 = w().start()
      try {
        in.addData(Kv(1, "a", 1), Kv(2, "b", 1))
        q1.processAllAvailable()
      } finally q1.stop()
      val vMid = ManifestTable.currentVersion(spark, t)
      assert(vMid === 1 && headMap(t).keySet === Set(1L, 2L),
        "the by-name sink must land in the registered table's directory")
      // restart against the same checkpoint, still by name
      val q2 = w().start()
      try {
        in.addData(Kv(2, "B", 2), Kv(5, "e", 2))
        q2.processAllAvailable()
      } finally q2.stop()
      assert(headMap(t) === Map(1L -> ("a", 1L), 2L -> ("B", 2L), 5L -> ("e", 2L)))
      assert(ManifestTable.currentVersion(spark, t) === vMid + 1)
      // an unregistered name refuses loudly instead of minting a dir
      val e = intercept[IllegalArgumentException] {
        ManifestSink.upsertBatch("graft.nope_sink", Seq("id"), "x")
      }
      assert(e.getMessage.contains("no registered table"), e.getMessage)
    } finally graft.sources.GraftCatalog.unregister("r15_sink")
  }

  test("append sink: replayed append commits once; events accumulate exactly") {
    val t = fresh("graft_sink_append")
    val b0 = Seq(Kv(1, "x", 1), Kv(2, "y", 1)).toDF()
    val b1 = Seq(Kv(3, "z", 2)).toDF()
    ManifestSink.appendBatch(t, "log-app")(b0, 0L)
    ManifestSink.appendBatch(t, "log-app")(b1, 1L)
    ManifestSink.appendBatch(t, "log-app")(b1, 1L) // replay
    assert(ManifestTable.currentVersion(spark, t) === 2)
    assert(ManifestTable.read(spark, t).count() === 3)
  }

  test("latestWins collapses a multi-event batch to upsert-safe rows") {
    val batch = Seq(Kv(1, "v1", 1), Kv(1, "v2", 2), Kv(2, "w", 1)).toDF()
    val got = ManifestSink.latestWins(batch, Seq("id"), Seq("seq"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "v2", 2L -> "w"))
  }

  test("a CONCURRENT replay of the same batch resolves to one application") {
    val t = fresh("graft_sink_race")
    ManifestTable.commit(spark, t, Seq(Kv(1, "a", 1)).toDF())
    val batch = Seq(Kv(1, "A", 2), Kv(9, "i", 2)).toDF()
    // interleave: main's merge derives, then the interloper (the same
    // batch, replayed by a zombie executor) commits first — main must
    // detect the recorded txn and NO-OP, not double-apply
    var fired = false
    var inside = false
    ManifestTable.beforeConditionalCommit = () => {
      if (!inside && !fired) {
        fired = true; inside = true
        try ManifestSink.upsertBatch(t, Seq("id"), "app-z")(batch, 0L)
        finally inside = false
      }
    }
    try ManifestSink.upsertBatch(t, Seq("id"), "app-z")(batch, 0L)
    finally ManifestTable.beforeConditionalCommit = () => ()
    assert(headMap(t) === Map(1L -> ("A", 2L), 9L -> ("i", 2L)))
    // exactly one version carries the batch (the zombie's), the loser no-ops
    assert(ManifestTable.currentVersion(spark, t) === 2)
    assert(ManifestTable.txnVersion(spark, t, "app-z") === Some(0L))
  }

  test("capstone: CDC replication A→B through the row feed — deletes included, restart-safe") {
    import org.apache.spark.sql.functions.{col, when}
    import graft.streaming.ChangeFeedStream
    val a = fresh("graft_cdc_a"); val b = fresh("graft_cdc_b")
    val feed = fresh("graft_cdc_feed"); val cp = fresh("graft_cdc_cp")
    def rows(kv: (Long, String, Long)*) =
      kv.toSeq.toDF("id", "v", "ver")
    // window 1 on the SOURCE: seed, update, insert, delete
    ManifestTable.commit(spark, a,
      rows((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L)),
      statsColumns = Seq("id"))
    ManifestTable.upsert(spark, a, rows((2L, "B2", 2L), (4L, "d", 2L)), Seq("id"))
    ManifestTable.deleteWhere(spark, a, col("id") === 3L)
    ChangeFeedStream.publishPendingRows(spark, a, feed, Seq("id"))
    // the CDC-apply sink: collapse the batch per key (latest ver wins,
    // a delete outranks a same-ver row — the pre-image carries the
    // OLD ver), MERGE the live rows exactly-once, then delete the
    // dead keys (idempotent: a replayed empty-match delete commits no
    // version)
    def applyCdc(batch: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      val s = batch.sparkSession
      val collapsed = graft.streaming.ManifestSink.latestWins(
        batch.withColumn("__prio",
          when(col("_change_type") === "delete", 1).otherwise(0)),
        Seq("id"), Seq("ver", "__prio")).drop("__prio")
      val upserts = collapsed.filter(col("_change_type") =!= "delete")
        .drop("_change_type")
      if (!upserts.isEmpty)
        ManifestTable.merge(s, b, upserts, Seq("id"),
          txn = Some(("cdc-b", batchId)))
      val dead = collapsed.filter(col("_change_type") === "delete")
        .select("id").collect().map(_.getLong(0))
      if (dead.nonEmpty)
        ManifestTable.deleteWhere(s, b, col("id").isin(dead.map(Long.box): _*))
    }
    def start() = ChangeFeedStream.readRowChangeStream(spark, a, feed)
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch(applyCdc _).start()
    def image(t: String) = ManifestTable.read(spark, t)
      .select("id", "v", "ver").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(image(b) === image(a), "replica must converge on window 1")
    assert(image(b) === Set((1L, "a", 1L), (2L, "B2", 2L), (4L, "d", 2L)))
    // window 2 lands while the stream is DOWN — update, insert, and a
    // delete of an already-replicated key
    ManifestTable.upsert(spark, a, rows((1L, "A3", 3L), (5L, "e", 3L)), Seq("id"))
    ManifestTable.deleteWhere(spark, a, col("id") === 4L)
    ChangeFeedStream.publishPendingRows(spark, a, feed, Seq("id"))
    val q2 = start() // SAME checkpoint: only the new range replays
    try q2.processAllAvailable() finally q2.stop()
    assert(image(b) === image(a), "replica must converge after restart")
    assert(image(b) === Set((1L, "A3", 3L), (2L, "B2", 2L), (5L, "e", 3L)))
  }
}
