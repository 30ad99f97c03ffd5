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
}
