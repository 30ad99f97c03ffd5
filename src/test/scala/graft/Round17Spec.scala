package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftCatalog

/** r17 pins: the identity allocation race contract (refuse at commit,
  * retry cleanly, never duplicate), and the NullType store-cast. */
class Round17Spec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_r17_$tag").toString + "/t"

  test("racing identity INSERTs refuse-then-retry without duplicates") {
    val t = tmp("idrace")
    GraftCatalog.unregister("r17_idrace")
    spark.sql(s"""CREATE TABLE graft.r17_idrace (
                 |  id BIGINT GENERATED ALWAYS AS IDENTITY,
                 |  v BIGINT
                 |) LOCATION '$t'""".stripMargin)
    val threads = 6; val perThread = 8
    val retries = new java.util.concurrent.atomic.AtomicLong
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val gate = new java.util.concurrent.CyclicBarrier(threads)
      val futs = (0 until threads).map { th =>
        pool.submit(new Runnable {
          def run(): Unit = {
            gate.await()
            (0 until perThread).foreach { i =>
              var done = false
              var attempts = 0
              while (!done) {
                try {
                  spark.sql("INSERT INTO graft.r17_idrace (v) " +
                    s"VALUES (${th * 1000 + i})")
                  done = true
                } catch {
                  // the commit-time gate: the allocation base moved —
                  // the RE-RUN re-derives fresh values from the new
                  // mark, so a retry can never duplicate
                  case _: java.util.ConcurrentModificationException =>
                    attempts += 1
                    require(attempts < 200, "livelock in identity retry")
                    retries.incrementAndGet()
                }
              }
            }
          }
        })
      }
      futs.foreach(_.get())
      val agg = spark.sql(
        """SELECT count(*) AS n, count(DISTINCT id) AS d,
          |  count(DISTINCT v) AS dv
          |FROM graft.r17_idrace""".stripMargin).head()
      val expect = threads.toLong * perThread
      assert(agg.getLong(0) == expect && agg.getLong(2) == expect,
        s"every insert must land exactly once: $agg")
      assert(agg.getLong(1) == expect,
        s"racing allocations must never duplicate an id: " +
          s"rows=${agg.getLong(0)} distinct_ids=${agg.getLong(1)} " +
          s"(retries observed: ${retries.get()})")
    } finally {
      pool.shutdown()
      GraftCatalog.unregister("r17_idrace")
    }
  }

  test("a bare NULL literal stores into any nullable column (VALUES and MERGE)") {
    import spark.implicits._
    val t = tmp("nulllit")
    GraftCatalog.unregister("r17_null")
    spark.sql(s"""CREATE TABLE graft.r17_null (
                 |  id BIGINT, s STRING, d DOUBLE, ts TIMESTAMP
                 |) LOCATION '$t'""".stripMargin)
    try {
      spark.sql("INSERT INTO graft.r17_null VALUES (1, NULL, NULL, NULL)")
      spark.sql("""MERGE INTO graft.r17_null t
                  |USING (SELECT 2L AS id) s ON t.id = s.id
                  |WHEN NOT MATCHED THEN
                  |  INSERT (id, s, d, ts) VALUES (s.id, NULL, NULL, NULL)
                  |""".stripMargin)
      val rows = spark.sql("SELECT * FROM graft.r17_null ORDER BY id").collect()
      assert(rows.length == 2 &&
        rows.forall(r => r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)))
    } finally GraftCatalog.unregister("r17_null")
  }
}
