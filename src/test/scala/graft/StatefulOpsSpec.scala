package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{EventRow, StatefulOps}

/** transformWithState: per-key ValueState accumulates across
  * micro-batches (RocksDB state store, the TWS requirement). */
class StatefulOpsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ev(id: Long, user: Long, v: Double) =
    EventRow(id, Timestamp.valueOf("2026-01-01 10:00:00"), user, "view", v)

  test("running per-user count/sum accumulates across batches") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = StatefulOps.runningCounts(in.toDS())
      .writeStream.format("memory").queryName("tws_sink").outputMode("update").start()
    try {
      in.addData(ev(1, 1, 2.0), ev(2, 1, 3.0), ev(3, 2, 10.0))
      q.processAllAvailable()
      in.addData(ev(4, 1, 5.0))
      q.processAllAvailable()
      // update mode: latest row per (user, batch); take the final state per user
      val last = spark.table("tws_sink")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
      assert(last(1L) === ((1L, 3L, 10.0))) // 2+3 in batch 1, +5 in batch 2
      assert(last(2L) === ((2L, 1L, 10.0)))
    } finally q.stop()
  }

  private def tev(id: Long, user: Long, tpe: String, sec: Int) =
    EventRow(id, Timestamp.valueOf(f"2026-01-01 10:00:$sec%02d"), user, tpe, 0.0)

  test("transformWithState survives a stop/restart from the checkpoint") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val ctx = spark.sqlContext
    def vev(id: Long, user: Long, v: Double) =
      EventRow(id, Timestamp.valueOf("2026-01-01 10:00:00"), user, "view", v)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_tws_ckpt").toString
    val in = MemoryStream[EventRow]
    // the memory sink refuses checkpoint recovery — a foreachBatch
    // sink (replayed by batch id) is the recoverable pattern
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    def start() =
      StatefulOps.runningCounts(in.toDS())
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.UserRunning], _: Long) =>
          val rows = batch.collect().map(u => (u.user_id, u.n_events, u.sum_value))
          buf.synchronized { buf ++= rows }; ()
        }
        .start()
    val q1 = start()
    try {
      in.addData(vev(1, 1L, 5.0), vev(2, 1L, 7.0))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(buf.synchronized(buf.toSeq) === Seq((1L, 2L, 12.0)))
    // new data lands while the query is down; the restarted query must
    // resume from the committed offset WITH the RocksDB state restored
    in.addData(vev(3, 1L, 2.0))
    val q2 = start()
    try {
      q2.processAllAvailable()
      // count 3 / sum 14 proves batch-1 state recovery (a cold start
      // would report 1 / 2.0); exactly the one new batch was replayed
      assert(buf.synchronized(buf.toSeq).last === ((1L, 3L, 14.0)))
      assert(buf.synchronized(buf.size) === 2)
    } finally q2.stop()
  }

  test("streaming top-k purchases: ListState merges across batches, k-bounded") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val ctx = spark.sqlContext
    def pev(id: Long, user: Long, tpe: String, v: Double) =
      EventRow(id, Timestamp.valueOf("2026-01-01 10:00:00"), user, tpe, v)
    val in = MemoryStream[EventRow]
    val q = StatefulOps.topPurchases(in.toDS(), k = 3)
      .writeStream.format("memory").queryName("topk_sink").outputMode("update").start()
    try {
      def snap() = spark.table("topk_sink")
        .collect().map(r => (r.getInt(1), r.getDouble(2), r.getLong(3))).toSeq
      in.addData(
        pev(1, 1, "purchase", 5.0), pev(2, 1, "purchase", 9.0),
        pev(3, 1, "view", 99.0),              // non-purchase ignored
        pev(4, 1, "purchase", 7.0), pev(5, 1, "purchase", 1.0))
      q.processAllAvailable()
      assert(snap().sorted === Seq((1, 9.0, 2L), (2, 7.0, 4L), (3, 5.0, 1L)))
      // batch 2: 8.0 displaces 5.0; a tie at 9.0 breaks by event_id —
      // 9.0(id 2) keeps rank 1 over 9.0(id 7)
      in.addData(pev(6, 1, "purchase", 8.0), pev(7, 1, "purchase", 9.0))
      q.processAllAvailable()
      val batch2 = snap().diff(Seq((1, 9.0, 2L), (2, 7.0, 4L), (3, 5.0, 1L)))
      assert(batch2.sorted === Seq((1, 9.0, 2L), (2, 9.0, 7L), (3, 8.0, 6L)))
    } finally q.stop()
  }

  test("streaming funnel advances stages across batches and enforces ordering") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[EventRow]
    val q = StatefulOps.funnelProgress(in.toDS())
      .writeStream.format("memory").queryName("funnel_sink").outputMode("update").start()
    try {
      // user 1: view@10 then click@20 (stage 2 after batch 1);
      // user 2: click@05 BEFORE any view — must stay stage 0, then
      //         view@10 in the same batch cannot retro-admit click@05
      //         (ordering is strict: click must follow the view);
      // user 3: view@10, click@20, purchase@15 — purchase precedes the
      //         click so it must NOT count.
      in.addData(
        tev(1, 1, "view", 10), tev(2, 1, "click", 20),
        tev(3, 2, "click", 5), tev(4, 2, "view", 10),
        tev(5, 3, "view", 10), tev(6, 3, "click", 20), tev(7, 3, "purchase", 15))
      q.processAllAvailable()
      // batch 2: user 1 completes; user 2 clicks after its view;
      // user 3's purchase now arrives after the click
      in.addData(
        tev(8, 1, "purchase", 30),
        tev(9, 2, "click", 12),
        tev(10, 3, "purchase", 25))
      q.processAllAvailable()
      val rows = spark.table("funnel_sink")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val batch1 = rows.groupBy(_._1).map { case (u, rs) => u -> rs.minBy(_._2) }
      val last = rows.groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
      assert(batch1(1L)._2 === 2)          // view+click in batch 1
      assert(last(1L)._2 === 3)            // purchase completes in batch 2
      assert(batch1(2L)._2 === 1)          // early click never admitted
      assert(last(2L)._2 === 2)            // later click (after view) is
      assert(batch1(3L)._2 === 2)          // out-of-order purchase rejected
      assert(last(3L)._2 === 3)
      // stage timestamps are µs epochs in funnel order
      val (_, _, t1, t2, t3) = last(3L)
      assert(t1 < t2 && t2 < t3)
      // streaming result agrees with the batch funnel on the union of inputs
      val batchDf = graft.operators.Analytics.funnel(
        Seq(tev(1, 1, "view", 10), tev(2, 1, "click", 20), tev(8, 1, "purchase", 30),
          tev(3, 2, "click", 5), tev(4, 2, "view", 10), tev(9, 2, "click", 12),
          tev(5, 3, "view", 10), tev(6, 3, "click", 20), tev(7, 3, "purchase", 15),
          tev(10, 3, "purchase", 25)).toDF(),
        Seq("view", "click", "purchase"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(batchDf === last.map { case (u, r) => u -> r._2 })
    } finally q.stop()
  }
}
