package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** T4/T5 Structured Streaming semantics (non-oracle — SURVEY.md §5.3.4):
  * watermarked tumbling windows emit on watermark passage and drop late
  * rows; stateful dedup keeps the first arrival of each event_id.
  */
class EventStreamsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  test("T4: watermarked tumbling window emits closed windows, drops late rows") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.hourlyCounts(in.toDF(), withWatermark = true)
      .writeStream.format("memory").queryName("t4_sink").outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts("10:05"), 1, "view", 1.0),
        Ev(2, ts("10:40"), 1, "view", 1.0))
      q.processAllAvailable()
      // watermark still inside the 10:00 window → nothing finalized yet
      assert(spark.table("t4_sink").count() === 0)

      // event at 12:00 pushes watermark past 11:00 → 10:00 window closes
      in.addData(Ev(3, ts("12:00"), 1, "view", 1.0))
      q.processAllAvailable()
      val closed = spark.table("t4_sink")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      assert(closed.toSeq === Seq((ts("10:00"), "view", 2L)))

      // a late row for the already-closed 10:00 window is dropped
      in.addData(Ev(4, ts("10:30"), 1, "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("t4_sink").count() === 1)
    } finally q.stop()
  }

  test("T5: dropDuplicatesWithinWatermark keeps first arrival per event_id") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.dedupEvents(in.toDF(), streaming = true)
      .writeStream.format("memory").queryName("t5_sink").outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts("10:00"), 1, "view", 1.0),
        Ev(1, ts("10:01"), 1, "view", 2.0), // same id, same batch
        Ev(2, ts("10:02"), 1, "click", 1.0))
      q.processAllAvailable()
      in.addData(Ev(1, ts("10:03"), 1, "view", 3.0)) // same id, later batch, inside watermark
      q.processAllAvailable()
      val ids = spark.table("t5_sink").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("T3 streaming: session windows merge events within the gap, split across it") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.sessions(in.toDF(), withWatermark = true)
      .writeStream.format("memory").queryName("t3_sink").outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts("10:00"), 1, "view", 1.0),
        Ev(2, ts("10:05"), 1, "view", 1.0),  // same session (gap < 10 min)
        Ev(3, ts("10:30"), 1, "view", 1.0))  // new session (gap >= 10 min)
      q.processAllAvailable()
      in.addData(Ev(4, ts("12:00"), 1, "view", 1.0)) // advance watermark, close sessions
      q.processAllAvailable()
      val sessions = spark.table("t3_sink")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
      // sessions: [10:00,10:05] with 2 events, [10:30] with 1
      assert(sessions.take(2).toSeq === Seq(
        (1L, ts("10:00").getTime / 1000, 2L),
        (1L, ts("10:30").getTime / 1000, 1L)))
    } finally q.stop()
  }

  test("T4b: file-source stream over parquet events matches the batch result") {
    // end-to-end streaming from files (the production shape): copy the
    // events table into a stream-source dir, run the same transform with
    // AvailableNow, compare against the batch run.
    val src = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    src.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(src.schema).parquet(dir)
    val q = EventStreams.hourlyCounts(stream)
      .writeStream.format("memory").queryName("t4b_sink").outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val streamed = spark.table("t4b_sink")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventStreams.hourlyCounts(src)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("T6: stream-static join enriches each micro-batch from the static dim") {
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dim = Seq((1L, "AUTO"), (2L, "HOUSE"))
      .toDF("c_custkey", "c_mktsegment")
    val in = MemoryStream[Ev]
    val q = EventStreams.enrich(in.toDF(), dim)
      .writeStream.format("memory").queryName("t6_sink").outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts("10:00"), 1, "view", 1.0),
        Ev(2, ts("10:01"), 2, "view", 2.0),
        Ev(3, ts("10:02"), 9, "view", 3.0)) // no dim row -> null segment
      q.processAllAvailable()
      val rows = spark.table("t6_sink")
        .select(col("event_id"), col("segment"))
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
      assert(rows.toSeq === Seq(
        (1L, Some("AUTO")), (2L, Some("HOUSE")), (3L, None)))
    } finally q.stop()
  }

  test("T8: stream-stream interval join attributes purchases to recent views") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Ev]
    val df = in.toDF()
    val q = EventStreams.attributePurchases(df, df)
      .writeStream.format("memory").queryName("t8_sink").outputMode("append").start()
    try {
      in.addData(
        Ev(1, ts("10:00"), 1, "view", 0.0),
        Ev(2, ts("10:03"), 1, "purchase", 9.99),  // 3 min after view 1 -> match
        Ev(3, ts("10:10"), 1, "purchase", 5.00),  // 10 min after view 1 -> outside window
        Ev(4, ts("10:02"), 2, "purchase", 7.00))  // other user, no view -> no match
      q.processAllAvailable()
      val rows = spark.table("t8_sink")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(rows.toSeq === Seq((2L, 1L, 1L)))
    } finally q.stop()
  }

  test("T7: foreachBatch upsert sink applies latest-wins merges across micro-batches") {
    implicit val ctx = spark.sqlContext
    val target = java.nio.file.Files.createTempDirectory("graft_t7_target").toString + "/tbl"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_t7_ckpt").toString
    val in = MemoryStream[Ev]
    val q = EventStreams.upsertSink(in.toDF(), target, ckpt)
    try {
      in.addData(
        Ev(1, ts("10:00"), 1, "purchase", 10.0),
        Ev(2, ts("10:01"), 1, "purchase", 11.0), // same user, later -> wins batch 1
        Ev(3, ts("10:00"), 2, "purchase", 20.0))
      q.processAllAvailable()
      in.addData(Ev(4, ts("10:05"), 2, "purchase", 25.0)) // update user 2
      q.processAllAvailable()
      val state = spark.read.parquet(target)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      assert(state.toSeq === Seq((1L, 11.0), (2L, 25.0)))
    } finally q.stop()
  }

  test("T7': manifest sink commits one atomic snapshot per micro-batch; replays converge") {
    implicit val ctx = spark.sqlContext
    val table = java.nio.file.Files.createTempDirectory("graft_t7m").toString + "/tbl"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_t7m_ckpt").toString
    val in = MemoryStream[Ev]
    val q = EventStreams.manifestUpsertSink(in.toDF(), table, ckpt, Seq("user_id"))
    try {
      in.addData(
        Ev(1, ts("10:00"), 1, "purchase", 10.0),
        Ev(3, ts("10:00"), 2, "purchase", 20.0))
      q.processAllAvailable()
      val v1 = graft.sources.ManifestTable.currentVersion(spark, table)
      in.addData(Ev(4, ts("10:05"), 2, "purchase", 25.0)) // update user 2
      q.processAllAvailable()
      val head = graft.sources.ManifestTable.read(spark, table)
        .select("user_id", "value")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      assert(head.toSeq === Seq((1L, 10.0), (2L, 25.0)))
      // batch 1's snapshot is still intact below the head (time travel)
      assert(graft.sources.ManifestTable.read(spark, table, version = v1)
        .select("user_id", "value")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
        .toSeq === Seq((1L, 10.0), (2L, 20.0)))
    } finally q.stop()
  }

  test("T7': a batch repeating a key is pre-reduced latest-wins — one row per key at head") {
    implicit val ctx = spark.sqlContext
    val table = java.nio.file.Files.createTempDirectory("graft_t7k").toString + "/tbl"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_t7k_ckpt").toString
    val in = MemoryStream[Ev]
    val q = EventStreams.manifestUpsertSink(in.toDF(), table, ckpt, Seq("user_id"))
    try {
      // one trigger, user 1 updated twice: without the in-sink pre-reduce
      // both rows would insert through the MERGE (double row per key)
      in.addData(
        Ev(1, ts("10:00"), 1, "purchase", 10.0),
        Ev(2, ts("10:03"), 1, "purchase", 12.0), // same key, later ts -> wins
        Ev(3, ts("10:01"), 2, "purchase", 20.0))
      q.processAllAvailable()
      val head = graft.sources.ManifestTable.read(spark, table)
      assert(head.groupBy("user_id").count()
        .filter(org.apache.spark.sql.functions.col("count") > 1).count() === 0,
        "a repeated key leaked through the MERGE as a duplicate row")
      val got = head.select("user_id", "value")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      assert(got.toSeq === Seq((1L, 12.0), (2L, 20.0)))
    } finally q.stop()
  }

  test("T5 batch fallback: dropDuplicates on event_id") {
    val df = Seq(
      Ev(1, ts("10:00"), 1, "view", 1.0),
      Ev(1, ts("10:01"), 1, "view", 2.0),
      Ev(2, ts("10:02"), 2, "click", 1.0)).toDF()
    assert(EventStreams.dedupEvents(df, streaming = false).count() === 2)
  }

  test("T9: change-feed stream delivers commits landing while it runs; restart is exactly-once") {
    import graft.sources.ManifestTable
    import graft.streaming.ChangeFeedStream
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_cdf_$tag").toString
    val (table, feed, ckpt, out) = (tmp("tab"), tmp("feed"), tmp("ckpt"), tmp("out"))
    def rows(lo: Int, hi: Int) = (lo to hi).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    assert(ManifestTable.commit(spark, table, rows(1, 10)) === 1)
    assert(ChangeFeedStream.publishPending(spark, table, feed) === 1)
    // pump idempotence: a re-tick publishes nothing new
    assert(ChangeFeedStream.publishPending(spark, table, feed) === 1)
    def start() = ChangeFeedStream.readChangeStream(spark, table, feed)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    val q = start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 10)
      // a commit lands WHILE the stream runs; the next tick + trigger deliver it
      ManifestTable.commit(spark, table, rows(11, 15))
      ChangeFeedStream.publishPending(spark, table, feed)
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 15)
    } finally q.stop()
    // stop, commit more, restart from the SAME checkpoint: the already-
    // consumed feed files are not re-delivered, the new range arrives
    // exactly once — 18 distinct ids, 18 rows total
    ManifestTable.commit(spark, table, rows(16, 18))
    ChangeFeedStream.publishPending(spark, table, feed)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (1L to 18L))
  }

  test("T9c: a stream started on an EMPTY feed picks up the first publish") {
    import graft.sources.ManifestTable
    import graft.streaming.ChangeFeedStream
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_cdfe_$tag").toString
    val (table, feed, ckpt) = (tmp("tab"), tmp("feed"), tmp("ckpt"))
    // the consumer deploys first: table committed, nothing published yet
    ManifestTable.commit(spark, table, Seq((1L, "a")).toDF("id", "v"))
    val q = ChangeFeedStream.readChangeStream(spark, table, feed)
      .writeStream.format("memory").queryName("t9c_sink")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("t9c_sink").count() === 0) // empty feed, no crash
      ChangeFeedStream.publishPending(spark, table, feed)
      q.processAllAvailable()
      assert(spark.table("t9c_sink").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "a")))
    } finally q.stop()
  }

  test("T9d: feed retention keeps the progress marker; a running consumer is unaffected") {
    import graft.sources.ManifestTable
    import graft.streaming.ChangeFeedStream
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_cdfr_$tag").toString
    val (table, feed, ckpt, out) = (tmp("tab"), tmp("feed"), tmp("ckpt"), tmp("out"))
    def rows(lo: Int, hi: Int) = (lo to hi).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    (1 to 3).foreach { i =>
      ManifestTable.commit(spark, table, rows(i * 10, i * 10 + 1))
      ChangeFeedStream.publishPending(spark, table, feed)
    }
    val q = ChangeFeedStream.readChangeStream(spark, table, feed)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 6)
      ChangeFeedStream.expireFeed(spark, feed, keepLast = 1)
      // progress marker survives: nothing republishes, nothing re-delivers
      assert(ChangeFeedStream.publishedUpTo(spark, feed) === 3)
      assert(ChangeFeedStream.publishPending(spark, table, feed) === 3)
      ManifestTable.commit(spark, table, rows(40, 41))
      ChangeFeedStream.publishPending(spark, table, feed)
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 8)
    } finally q.stop()
    intercept[IllegalArgumentException](
      ChangeFeedStream.expireFeed(spark, feed, keepLast = 0))
  }

  test("T9e: the row-level CDC stream delivers classified events exactly once") {
    import graft.sources.ManifestTable
    import graft.streaming.ChangeFeedStream
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_cdc_$tag").toString
    val (table, feed, ckpt, out) = (tmp("tab"), tmp("feed"), tmp("ckpt"), tmp("out"))
    val keys = Seq("id")
    ManifestTable.commit(spark, table,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    ChangeFeedStream.publishPendingRows(spark, table, feed, keys)
    val q = ChangeFeedStream.readRowChangeStream(spark, table, feed)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // bootstrap range: everything is an insert
      assert(spark.read.parquet(out).groupBy("_change_type").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        === Map("insert" -> 3L))
      // mutations while the stream runs: update key 2, delete key 3,
      // insert key 4 — ONE classified event each, nothing re-delivered
      ManifestTable.upsert(spark, table,
        Seq((2L, "B"), (4L, "d")).toDF("id", "v"), keys)
      ManifestTable.deleteWhere(spark, table,
        org.apache.spark.sql.functions.col("id") === 3L)
      ChangeFeedStream.publishPendingRows(spark, table, feed, keys)
      q.processAllAvailable()
      val events = spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(events === Set(
        (1L, "a", "insert"), (2L, "b", "insert"), (3L, "c", "insert"),
        (2L, "B", "update_post"), (3L, "c", "delete"), (4L, "d", "insert")))
      assert(spark.read.parquet(out).count() === 6) // exactly once each
    } finally q.stop()
  }

  test("T9f: table-side expiry past the feed's position fails the tick loudly, not a spin") {
    import graft.sources.ManifestTable
    import graft.streaming.ChangeFeedStream
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_cdfx_$tag").toString
    val (table, feed) = (tmp("tab"), tmp("feed"))
    ManifestTable.commit(spark, table, Seq((1L, "a")).toDF("id", "v")) // v1
    ChangeFeedStream.publishPending(spark, table, feed)                // feed at 1
    ManifestTable.commit(spark, table, Seq((2L, "b")).toDF("id", "v")) // v2
    ManifestTable.commit(spark, table, Seq((3L, "c")).toDF("id", "v")) // v3
    ManifestTable.expire(spark, table, keepLast = 1) // v1, v2 gone
    val e = intercept[IllegalStateException](
      ChangeFeedStream.publishPending(spark, table, feed))
    assert(e.getMessage.contains("expired"))
  }

  test("T9g: a wedged feed recovers via bootstrap into a NEW feedDir, exactly once (r9)") {
    import graft.sources.ManifestTable
    import graft.streaming.ChangeFeedStream
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_cdfb_$tag").toString
    val (table, feed, ckpt, out) = (tmp("tab"), tmp("feed"), tmp("ckpt"), tmp("out"))
    def rows(lo: Int, hi: Int) = (lo to hi).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    // wedge the original feed: it consumed v1, then retention dropped
    // the manifests its next tick needs
    ManifestTable.commit(spark, table, rows(1, 3))   // v1
    ChangeFeedStream.publishPending(spark, table, feed)
    ManifestTable.commit(spark, table, rows(4, 6))   // v2
    ManifestTable.commit(spark, table, rows(7, 9))   // v3
    ManifestTable.expire(spark, table, keepLast = 1)
    intercept[ChangeFeedStream.FeedWedgedException](
      ChangeFeedStream.publishPending(spark, table, feed))
    // bootstrap refuses the consumed feedDir (would re-deliver history)
    intercept[IllegalArgumentException](
      ChangeFeedStream.bootstrap(spark, table, feed))
    // ...and seeds a NEW one with the head snapshot as its first range
    val feed2 = tmp("feed2")
    assert(ChangeFeedStream.bootstrap(spark, table, feed2) === 3)
    // bootstrap is not repeatable either — the snapshot range is history
    intercept[IllegalArgumentException](
      ChangeFeedStream.bootstrap(spark, table, feed2))
    val q = ChangeFeedStream.readChangeStream(spark, table, feed2)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 9, "snapshot rows once")
      // the feed continues INCREMENTALLY from the bootstrap head
      ManifestTable.commit(spark, table, rows(10, 12)) // v4
      assert(ChangeFeedStream.publishPending(spark, table, feed2) === 4)
      q.processAllAvailable()
      val got = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted
      assert(got.toSeq === (1L to 12L), "exactly-once: snapshot + increment")
    } finally q.stop()
    // an empty table bootstraps to nothing, harmlessly
    val (t2, f3) = (tmp("tab2"), tmp("feed3"))
    assert(ChangeFeedStream.bootstrap(spark, t2, f3) === 0)
  }

  test("T9i: one mode per feedDir is ENFORCED — crossing publishers/readers fail loudly (r9)") {
    import graft.sources.ManifestTable
    import graft.streaming.ChangeFeedStream
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_cdmode_$tag").toString
    val (table, feed) = (tmp("tab"), tmp("feed"))
    ManifestTable.commit(spark, table, Seq((1L, "a")).toDF("id", "v"))
    // a FILE-level bootstrap stamps the feed; a row-level publisher or
    // reader on it would surface _change_type = null for every row —
    // silently classified as nothing by any consumer — so it must
    // refuse instead
    ChangeFeedStream.bootstrap(spark, table, feed)
    ManifestTable.commit(spark, table, Seq((2L, "b")).toDF("id", "v"))
    intercept[IllegalArgumentException] {
      ChangeFeedStream.publishPendingRows(spark, table, feed, Seq("id"))
    }
    intercept[IllegalArgumentException] {
      ChangeFeedStream.readRowChangeStream(spark, table, feed)
    }
    assert(ChangeFeedStream.publishPending(spark, table, feed) === 2,
      "the matching publisher keeps working")
    // and the reverse direction: a rows feed refuses file-level callers
    val feed2 = tmp("feed2")
    ChangeFeedStream.bootstrapRows(spark, table, feed2)
    intercept[IllegalArgumentException] {
      ChangeFeedStream.publishPending(spark, table, feed2)
    }
    intercept[IllegalArgumentException] {
      ChangeFeedStream.readChangeStream(spark, table, feed2)
    }
  }

  test("T9h: bootstrapRows seeds a row-level feed with insert events (r9)") {
    import graft.sources.ManifestTable
    import graft.streaming.ChangeFeedStream
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_cdbr_$tag").toString
    val (table, feed, ckpt, out) = (tmp("tab"), tmp("feed"), tmp("ckpt"), tmp("out"))
    val keys = Seq("id")
    ManifestTable.commit(spark, table,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    ManifestTable.upsert(spark, table, Seq((2L, "B")).toDF("id", "v"), keys)
    assert(ChangeFeedStream.bootstrapRows(spark, table, feed) === 2)
    val q = ChangeFeedStream.readRowChangeStream(spark, table, feed)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // the snapshot arrives as inserts of the POST-upsert image
      assert(spark.read.parquet(out).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
        === Set((1L, "a", "insert"), (2L, "B", "insert")))
      // and the row feed continues with classified increments
      ManifestTable.deleteWhere(spark, table,
        org.apache.spark.sql.functions.col("id") === 1L)
      ChangeFeedStream.publishPendingRows(spark, table, feed, keys)
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 3)
      assert(spark.read.parquet(out)
        .filter(org.apache.spark.sql.functions.col("_change_type") === "delete")
        .collect().map(_.getLong(0)).toSeq === Seq(1L))
    } finally q.stop()
  }

  test("T9b: the continuous pump picks up commits without an explicit tick") {
    import graft.sources.ManifestTable
    import graft.streaming.ChangeFeedStream
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_cdfp_$tag").toString
    val (table, feed) = (tmp("tab"), tmp("feed"))
    val pump = ChangeFeedStream.pump(spark, table, feed, pollIntervalMs = 100L)
    try {
      ManifestTable.commit(spark, table,
        Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      val deadline = System.currentTimeMillis() + 30000
      while (ChangeFeedStream.publishedUpTo(spark, feed) < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(ChangeFeedStream.publishedUpTo(spark, feed) === 1)
      assert(spark.read.parquet(s"$feed/data/v1").count() === 2)
    } finally pump.close()
  }

  test("T9j: by-name streaming sugar — register, stream, append; restart is exactly-once") {
    import graft.sources.{GraftCatalog, ManifestTable}
    import graft.streaming.ChangeFeedStream
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_cdfn_$tag").toString
    val (table, ckpt, out) = (tmp("tab") + "/t", tmp("ckpt"), tmp("out"))
    def rows(lo: Int, hi: Int) =
      (lo to hi).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    ManifestTable.commit(spark, table, rows(1, 8))
    GraftCatalog.register("t9e_events", table)
    try {
      // the whole by-name story: no feedDir, no pump plumbing — the
      // sugar owns the table's default feed and a session-local pump
      def start() = ChangeFeedStream
        .readTableStream(spark, "graft.t9e_events")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      val q = start()
      try {
        val deadline = System.currentTimeMillis() + 30000
        def delivered = {
          q.processAllAvailable()
          try spark.read.parquet(out).count() catch { case _: Exception => 0L }
        }
        while (delivered < 8 && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        assert(spark.read.parquet(out).count() === 8,
          "the initial snapshot must stream through the auto-pumped feed")
        // an append lands while the stream runs; the pump delivers it
        ManifestTable.commit(spark, table, rows(9, 12))
        while (delivered < 12 && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        assert(spark.read.parquet(out).count() === 12)
      } finally q.stop()
      // restart from the SAME checkpoint: consumed files are not
      // re-delivered, the new commit arrives exactly once
      ManifestTable.commit(spark, table, rows(13, 15))
      val q2 = start()
      try {
        val deadline = System.currentTimeMillis() + 30000
        def delivered = {
          q2.processAllAvailable()
          spark.read.parquet(out).count()
        }
        while (delivered < 15 && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
      } finally q2.stop()
      val got = spark.read.parquet(out)
        .select("id").collect().map(_.getLong(0)).sorted
      assert(got.toSeq === (1L to 15L),
        "restart must be exactly-once: 15 distinct ids, 15 rows")
      // an unregistered name refuses with the registration pointer
      val e = intercept[Exception](
        ChangeFeedStream.readTableStream(spark, "ghost"))
      assert(e.getMessage.contains("register"), e.getMessage)
    } finally {
      ChangeFeedStream.stopTableStreamPump("t9e_events")
      GraftCatalog.unregister("t9e_events")
    }
  }

  test("T9w: an AGGREGATE view streams with a watermark — counts track the feed (r18)") {
    import graft.sources.{GraftCatalog, ManifestTable}
    import graft.streaming.ChangeFeedStream
    import org.apache.spark.sql.functions.{col, to_timestamp}
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_cdfw_$tag").toString
    val table = tmp("tab") + "/t"
    ManifestTable.commit(spark, table,
      Seq((1L, "a", 10L, "2024-01-01 10:00:00"),
          (2L, "a", 20L, "2024-01-01 10:01:00"),
          (3L, "b", 30L, "2024-01-01 10:02:00"))
        .toDF("id", "cat", "v", "ts_s")
        .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s"))
    GraftCatalog.register("t9w_base", table)
    GraftCatalog.registerView("t9w_view",
      "SELECT cat, count(*) AS n, sum(v) AS total FROM graft.t9w_base GROUP BY cat")
    try {
      // without a watermark the aggregate view still refuses
      val e = intercept[Exception](
        ChangeFeedStream.readTableStream(spark, "graft.t9w_view"))
      assert(e.getMessage.contains("stream-safe"), e.getMessage)
      // with one, the expansion IS the watermarked streaming aggregate
      val agg = ChangeFeedStream.readTableStream(spark, "graft.t9w_view",
        watermark = Some(("ts", "0 seconds")))
      assert(agg.isStreaming && agg.columns.toSeq === Seq("cat", "n", "total"))
      val q = agg.writeStream.format("memory").queryName("t9w_mem")
        .outputMode("complete").start()
      try {
        def state: Map[String, (Long, Long)] = spark.table("t9w_mem")
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2))).toMap
        // the pump publishes asynchronously — poll to a deadline
        def awaitState(want: Map[String, (Long, Long)]): Unit = {
          val deadline = System.currentTimeMillis() + 30000
          while (state != want && System.currentTimeMillis() < deadline) {
            q.processAllAvailable(); Thread.sleep(100)
          }
          assert(state === want, s"aggregate state: $state")
        }
        awaitState(Map("a" -> (2L, 30L), "b" -> (1L, 30L)))
        // an append flows through the SAME aggregation
        ManifestTable.commit(spark, table,
          Seq((4L, "b", 5L, "2024-01-01 10:03:00"))
            .toDF("id", "cat", "v", "ts_s")
            .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s"))
        awaitState(Map("a" -> (2L, 30L), "b" -> (2L, 35L)))
      } finally q.stop()
    } finally {
      ChangeFeedStream.stopTableStreamPump("t9w_base")
      GraftCatalog.unregisterView("t9w_view")
      GraftCatalog.unregister("t9w_base")
    }
  }

  test("T9x: a WINDOWED aggregate view streams append-mode — the watermark closes windows (r18)") {
    import graft.sources.{GraftCatalog, ManifestTable}
    import graft.streaming.ChangeFeedStream
    import org.apache.spark.sql.functions.{col, to_timestamp}
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_cdfx_$tag").toString
    val (table, ckpt, out) = (tmp("tab") + "/t", tmp("ckpt"), tmp("out"))
    def rows(rs: (Long, Long, String)*) =
      rs.toSeq.toDF("id", "v", "ts_s")
        .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    ManifestTable.commit(spark, table, rows(
      (1L, 10L, "2024-01-01 10:00:00"),
      (2L, 20L, "2024-01-01 10:01:00"),
      (3L, 30L, "2024-01-01 10:02:00")))
    GraftCatalog.register("t9x_base", table)
    GraftCatalog.registerView("t9x_view",
      """SELECT window.start AS ws, count(*) AS n, sum(v) AS total
        |FROM graft.t9x_base GROUP BY window(ts, '10 minutes')""".stripMargin)
    try {
      val agg = ChangeFeedStream.readTableStream(spark, "graft.t9x_view",
        watermark = Some(("ts", "0 seconds")))
      // append mode: only CLOSED windows emit — exactly-once rows
      // into a plain parquet sink
      val q = agg.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      try {
        // a late-hour row advances the watermark past the first window
        ManifestTable.commit(spark, table,
          rows((4L, 5L, "2024-01-01 10:30:00")))
        val deadline = System.currentTimeMillis() + 30000
        def emitted = {
          q.processAllAvailable()
          try spark.read.parquet(out).count() catch { case _: Exception => 0L }
        }
        while (emitted < 1 && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        val got = spark.read.parquet(out).collect()
          .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
        assert(got.toSeq === Seq(("2024-01-01 10:00:00.0", 3L, 60L)),
          s"the closed 10:00 window must emit exactly once: ${got.toSeq}")
      } finally q.stop()
    } finally {
      ChangeFeedStream.stopTableStreamPump("t9x_base")
      GraftCatalog.unregisterView("t9x_view")
      GraftCatalog.unregister("t9x_base")
    }
  }

  test("T9v: a registered VIEW streams — view stream == table stream + view transform") {
    import graft.sources.{GraftCatalog, ManifestTable}
    import graft.streaming.ChangeFeedStream
    def tmp(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_cdfv_$tag").toString
    val (table, ckpt, out) = (tmp("tab") + "/t", tmp("ckpt"), tmp("out"))
    ManifestTable.commit(spark, table,
      (1 to 10).map(i => (i.toLong, i * 10L)).toDF("id", "v"))
    GraftCatalog.register("t9v_base", table)
    GraftCatalog.registerView("t9v_view",
      "SELECT id, v * 2 AS twice FROM graft.t9v_base WHERE id % 2 = 0")
    // a view on the view proves nested expansion (and the cycle guard)
    GraftCatalog.registerView("t9v_outer",
      "SELECT twice FROM graft.t9v_view WHERE twice >= 80")
    try {
      val q = ChangeFeedStream.readTableStream(spark, "graft.t9v_view")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try {
        val deadline = System.currentTimeMillis() + 30000
        def delivered = {
          q.processAllAvailable()
          try spark.read.parquet(out).count() catch { case _: Exception => 0L }
        }
        while (delivered < 5 && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        // == the table stream + the view's own transform
        val got = spark.read.parquet(out).collect()
          .map(r => r.getAs[Long]("id") -> r.getAs[Long]("twice")).toMap
        assert(got === Map(2L -> 40L, 4L -> 80L, 6L -> 120L,
          8L -> 160L, 10L -> 200L),
          "view stream must equal table stream + projection/filter")
        // an append flows through the SAME expansion
        ManifestTable.commit(spark, table, Seq((11L, 110L), (12L, 120L))
          .toDF("id", "v"))
        while (delivered < 6 && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        assert(spark.read.parquet(out).count() === 6)
      } finally q.stop()
      // nested view expands through the chain
      val nested = ChangeFeedStream.readTableStream(spark, "graft.t9v_outer")
      assert(nested.isStreaming && nested.columns.toSeq === Seq("twice"))
      // non-stream-safe views refuse with the watermark pointer
      GraftCatalog.registerView("t9v_agg",
        "SELECT count(*) AS n FROM graft.t9v_base")
      val e = intercept[Exception](
        ChangeFeedStream.readTableStream(spark, "t9v_agg"))
      assert(e.getMessage.contains("stream-safe"), e.getMessage)
      // ADVICE r17: a subquery EXPRESSION hides a whole plan inside a
      // projection/filter — it must refuse too, never silently run as
      // a point-in-time batch read per microbatch
      GraftCatalog.registerView("t9v_scalar",
        "SELECT id, (SELECT max(v) FROM graft.t9v_base) AS mx FROM graft.t9v_base")
      val eScalar = intercept[Exception](
        ChangeFeedStream.readTableStream(spark, "t9v_scalar"))
      assert(eScalar.getMessage.contains("stream-safe"), eScalar.getMessage)
      GraftCatalog.registerView("t9v_in",
        "SELECT id FROM graft.t9v_base WHERE v IN (SELECT v FROM graft.t9v_base WHERE id < 3)")
      val eIn = intercept[Exception](
        ChangeFeedStream.readTableStream(spark, "t9v_in"))
      assert(eIn.getMessage.contains("stream-safe"), eIn.getMessage)
      // sinking INTO a view refuses
      val e2 = intercept[Exception](
        graft.streaming.ManifestSink.appendBatch("graft.t9v_view", "app"))
      assert(e2.getMessage.contains("read-only"), e2.getMessage)
    } finally {
      ChangeFeedStream.stopTableStreamPump("t9v_base")
      Seq("t9v_view", "t9v_outer", "t9v_agg", "t9v_scalar", "t9v_in")
        .foreach(GraftCatalog.unregisterView)
      GraftCatalog.unregister("t9v_base")
    }
  }
}
