package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable
import graft.streaming.ChangeFeedStream

/** Round-10 advice regressions, one test per adjudicated finding:
  *
  *  1. tryPublish temp names are unique PER ATTEMPT — two concurrent
  *     metadata-only publishers whose tags collide (same 12-byte
  *     predicate prefix) can no longer clobber each other's temp body
  *     and silently lose a committed-and-acknowledged tombstone.
  *  2. the manifest text cache validates hits against the file's
  *     (length, mtime) — a table dropped and re-created at the same
  *     path serves the NEW table's manifests, never stale text.
  *  3. changes() surfaces the full to-version column set: a
  *     metadata-only addColumn inside the range arrives null-filled,
  *     exactly like the batch read path null-fills old files.
  *  4. the feed's mode stamp is ONE atomic-exclusive slot whose content
  *     is the kind — racing first publishers of different kinds leave
  *     exactly one winner and a working feed, never a wedged one.
  */
class AdviceR10Spec extends AnyFunSuite with SparkFixture {

  private def fresh(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  // ---- 1. shared-tag publish race ----------------------------------

  test("concurrent lazy deletes with colliding tags both land (unique temp names)") {
    val t = fresh("graft_tmpclash")
    ManifestTable.commit(spark, t,
      df(1000001L -> "a", 1000002L -> "b", 3L -> "keep"))
    // both predicates share the first 12 bytes of their SQL text, so
    // both publishers derive the same 16-char base64 tag — before the
    // unique-temp fix they shared one temp path at the same head
    val predA = col("id") === 1000001L
    val predB = col("id") === 1000002L
    val bReady = new CountDownLatch(1)
    val bGo = new CountDownLatch(1)
    val mainThread = Thread.currentThread()
    @volatile var bErr: Throwable = null
    val b = new Thread(() => {
      try ManifestTable.deleteWhereLazy(spark, t, predB)
      catch { case e: Throwable => bErr = e }
    }, "advice-r10-b")
    val aFired = new AtomicBoolean(false)
    val bFired = new AtomicBoolean(false)
    // interleaving: A writes its temp manifest → (seam) B starts, writes
    // ITS temp manifest and parks before its link → A links and wins the
    // slot → B links, loses, retries against the new head. With a shared
    // temp path this exact schedule made A publish B's body: A's delete
    // reported success but its tombstone never existed.
    ManifestTable.beforePublishLink = () => {
      if (Thread.currentThread() eq mainThread) {
        if (aFired.compareAndSet(false, true)) {
          b.start()
          assert(bReady.await(60, TimeUnit.SECONDS), "B never reached its publish point")
        }
      } else if (bFired.compareAndSet(false, true)) {
        bReady.countDown()
        assert(bGo.await(60, TimeUnit.SECONDS), "A never released B")
      }
    }
    try {
      ManifestTable.deleteWhereLazy(spark, t, predA)
      bGo.countDown()
      b.join(120000)
      assert(!b.isAlive, "B did not finish")
      assert(bErr == null, s"B failed: $bErr")
    } finally ManifestTable.beforePublishLink = () => ()
    val tombs = ManifestTable.deleteTombstones(spark, t)
    assert(tombs.size === 2,
      s"both acknowledged deletes must exist as tombstones, got ${tombs.map(_._1)}")
    val live = ManifestTable.read(spark, t).collect().map(_.getLong(0)).toSet
    assert(live === Set(3L),
      s"both lazily deleted rows must be hidden, still see $live")
  }

  // ---- 2. cache vs drop-and-recreate -------------------------------

  test("a table dropped and re-created at the same path reads the NEW manifests") {
    val t = fresh("graft_recreate")
    ManifestTable.commit(spark, t, df(1L -> "old", 2L -> "old").repartition(3))
    assert(ManifestTable.read(spark, t).count() === 2) // warms the cache
    // drop the table wholesale and re-create it at the SAME path: the
    // new line restarts at v1, so a bare-existence cache would serve
    // the old v1 text (different length here — 3 files vs 1 — so the
    // (len, mtime) validation catches it deterministically)
    val f = new Path(t).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(t), true)
    ManifestTable.commit(spark, t, df(9L -> "new").coalesce(1))
    val got = ManifestTable.read(spark, t).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(9L), s"stale cached manifest text served: $got")
  }

  // ---- 3. changes() across metadata-only addColumn ------------------

  test("changes() null-fills a column added by metadata-only DDL inside the range") {
    val t = fresh("graft_cdf_addcol")
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    ManifestTable.addColumn(spark, t, "extra",
      org.apache.spark.sql.types.LongType)
    // the range's only physical files predate the column — the batch
    // frame must still surface it (null), like a head read does
    val ch = ManifestTable.changes(spark, t, 0)
    assert(ch.columns.toSeq === Seq("id", "v", "extra"),
      s"to-version schema must be surfaced in full, got ${ch.columns.toSeq}")
    assert(ch.filter(col("extra").isNotNull).count() === 0)
    assert(ch.count() === 2)
    // and a post-DDL commit's values ride through unchanged
    import spark.implicits._
    ManifestTable.commit(spark, t,
      Seq((5L, "c", 42L)).toDF("id", "v", "extra"))
    val all = ManifestTable.changes(spark, t, 0)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    assert(all === Set((1L, -1L), (2L, -1L), (5L, 42L)))
  }

  // ---- 4. mode stamp: single atomic slot ----------------------------

  test("racing first publishers of different kinds: one wins, the feed is never wedged") {
    val t = fresh("graft_modetab")
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    val feed = fresh("graft_modefeed")
    val results = new java.util.concurrent.ConcurrentHashMap[String, Either[Throwable, Int]]()
    val start = new CountDownLatch(1)
    def runner(name: String)(body: => Int) = new Thread(() => {
      start.await()
      results.put(name,
        try Right(body) catch { case e: Throwable => Left(e) })
    }, name)
    val tf = runner("file")(ChangeFeedStream.publishPending(spark, t, feed))
    val tr = runner("rows")(ChangeFeedStream.publishPendingRows(spark, t, feed, Seq("id")))
    tf.start(); tr.start(); start.countDown()
    tf.join(120000); tr.join(120000)
    val winners = results.entrySet().toArray().toSeq
      .map(_.asInstanceOf[java.util.Map.Entry[String, Either[Throwable, Int]]])
      .collect { case e if e.getValue.isRight => e.getKey }
    assert(winners.size === 1,
      s"exactly one kind must win the stamp, got $results")
    val winner = winners.head
    val loser = if (winner == "file") "rows" else "file"
    // the loser failed LOUDLY with the mode mismatch, not a wedge
    val err = results.get(loser).left.toOption.map(_.getMessage).getOrElse("")
    assert(err.contains("-level feed"), s"loser must explain the kind clash, got: $err")
    // the feed keeps working for the winner's kind...
    ManifestTable.commit(spark, t, df(10L -> "x"))
    val reach =
      if (winner == "file") ChangeFeedStream.publishPending(spark, t, feed)
      else ChangeFeedStream.publishPendingRows(spark, t, feed, Seq("id"))
    assert(reach === 2, "the winner's kind must keep publishing")
    // ...and keeps refusing the loser's kind, loudly
    val again = intercept[IllegalArgumentException] {
      if (winner == "file") ChangeFeedStream.publishPendingRows(spark, t, feed, Seq("id"))
      else ChangeFeedStream.publishPending(spark, t, feed)
    }
    assert(again.getMessage.contains("-level feed"))
  }

  test("legacy name-encoded mode stamps are still honored") {
    val t = fresh("graft_legacymode")
    ManifestTable.commit(spark, t, df(1L -> "a"))
    val feed = fresh("graft_legacyfeed")
    val dataDir = new Path(feed, "data")
    val f = dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(dataDir)
    f.create(new Path(dataDir, "_mode_rows"), true).close()
    val e = intercept[IllegalArgumentException] {
      ChangeFeedStream.publishPending(spark, t, feed)
    }
    assert(e.getMessage.contains("rows-level feed"))
    assert(ChangeFeedStream.publishPendingRows(spark, t, feed, Seq("id")) === 1)
  }
}
