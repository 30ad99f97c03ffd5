package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** Lazy deletes — predicate tombstones (sources/ManifestTable.scala
  * deleteWhereLazy / materializeDeletes / readLive): DELETE as a
  * metadata-only commit scoped to the stats-pruned target files, with
  * point-in-time semantics (later inserts stay visible), read-path
  * filtering everywhere, materialization by OPTIMIZE or explicitly,
  * and no resurrection through MERGE rewrites. */
class TombstoneSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_tombs").toString

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  private def headIds(t: String): Set[Long] =
    ManifestTable.read(spark, t).select("id").collect().map(_.getLong(0)).toSet

  test("lazy delete is metadata-only: rows vanish, zero data files move") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b", 3L -> "c"))
    val filesBefore = ManifestTable.snapshotFiles(spark, t)
    val v = ManifestTable.deleteWhereLazy(spark, t, col("id") === 2L)
    assert(v === 2)
    assert(ManifestTable.snapshotFiles(spark, t) === filesBefore,
      "a lazy delete must not touch a single data file")
    assert(headIds(t) === Set(1L, 3L))
    // pre-delete time travel still sees the row
    assert(ManifestTable.read(spark, t, 1).count() === 3)
    assert(ManifestTable.commitOp(spark, t) === Some("delete-lazy"))
  }

  test("point-in-time semantics: later inserts matching the predicate stay visible") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "old", 2L -> "keep"))
    ManifestTable.deleteWhereLazy(spark, t, col("v") === "old")
    ManifestTable.commit(spark, t, df(3L -> "old"))
    // the delete is a statement about the table AS OF its commit: the
    // later "old" row is untouched — an unscoped predicate would
    // silently swallow it
    assert(headIds(t) === Set(2L, 3L))
  }

  test("tombstone targets are stats-pruned to the files that could match") {
    val t = freshTable()
    import org.apache.spark.sql.SaveMode
    ManifestTable.commit(spark, t,
      df((1L to 40L).map(i => i -> s"r$i"): _*)
        .repartitionByRange(4, col("id")),
      SaveMode.Overwrite, statsColumns = Seq("id"))
    ManifestTable.deleteWhereLazy(spark, t, col("id") <= 5L)
    val Seq((_, targets)) = ManifestTable.deleteTombstones(spark, t)
    assert(targets.size < 4,
      s"a range delete must target only the files owning the range, got $targets")
    assert(headIds(t) === (6L to 40L).toSet)
    // readRange / readWhere apply tombstones too
    assert(ManifestTable.readRange(spark, t, Seq(("id", 1.0, 10.0)))
      .count() === 5)
    assert(ManifestTable.readWhere(spark, t, col("id") <= 10L).count() === 5)
  }

  test("no-op cases commit nothing") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"), statsColumns = Seq("id"))
    assert(ManifestTable.deleteWhereLazy(spark, t, col("id") > 100L) === 1,
      "prunable-to-nothing predicate must not commit")
    assert(ManifestTable.materializeDeletes(spark, t) === 1,
      "nothing pending — no commit")
    intercept[Exception] {
      ManifestTable.deleteWhereLazy(spark, t, col("no_such_col") === 1L)
    }
    assert(ManifestTable.currentVersion(spark, t) === 1)
  }

  test("materializeDeletes rewrites only targeted files and clears the set") {
    val t = freshTable()
    import org.apache.spark.sql.SaveMode
    ManifestTable.commit(spark, t,
      df((1L to 40L).map(i => i -> s"r$i"): _*)
        .repartitionByRange(4, col("id")),
      SaveMode.Overwrite, statsColumns = Seq("id"))
    ManifestTable.deleteWhereLazy(spark, t, col("id") <= 5L)
    val before = ManifestTable.snapshotFiles(spark, t).toSet
    val Seq((_, targets)) = ManifestTable.deleteTombstones(spark, t)
    ManifestTable.materializeDeletes(spark, t)
    val after = ManifestTable.snapshotFiles(spark, t).toSet
    assert((before -- after) === targets.toSet,
      "exactly the targeted files must be rewritten")
    assert((before intersect after).size === before.size - targets.size,
      "untargeted files carry by reference")
    assert(ManifestTable.deleteTombstones(spark, t) === Nil)
    assert(headIds(t) === (6L to 40L).toSet, "read-visible state is unchanged")
    assert(ManifestTable.commitOp(spark, t) === Some("materialize"))
  }

  test("MERGE does not resurrect lazily-deleted rows; its rewrite self-cleans the target list") {
    val t = freshTable()
    ManifestTable.commit(spark, t,
      df(1L -> "a", 2L -> "b", 3L -> "c").repartition(1))
    ManifestTable.deleteWhereLazy(spark, t, col("id") === 2L)
    // the upsert touches the same (single) file that holds deleted id 2
    ManifestTable.upsert(spark, t, df(1L -> "A"), Seq("id"))
    assert(headIds(t) === Set(1L, 3L), "the rewrite must not resurrect id 2")
    // the rewritten file dropped out of the tombstone's target list at
    // publish — with no targets left, the tombstone itself is gone
    assert(ManifestTable.deleteTombstones(spark, t) === Nil)
    // and re-inserting the key now works (point-in-time, not a curse)
    ManifestTable.upsert(spark, t, df(2L -> "back"), Seq("id"))
    assert(headIds(t) === Set(1L, 2L, 3L))
  }

  test("compact materializes all pending tombstones") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    ManifestTable.commit(spark, t, df(3L -> "c", 4L -> "d"))
    ManifestTable.deleteWhereLazy(spark, t, col("id") === 2L)
    ManifestTable.deleteWhereLazy(spark, t, col("id") === 4L)
    ManifestTable.compact(spark, t, targetFiles = 1)
    assert(ManifestTable.deleteTombstones(spark, t) === Nil)
    assert(headIds(t) === Set(1L, 3L))
    assert(ManifestTable.read(spark, t).count() === 2)
  }

  test("restore brings back the target version's tombstone state") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    ManifestTable.deleteWhereLazy(spark, t, col("id") === 2L) // v2: 2 hidden
    ManifestTable.materializeDeletes(spark, t)                // v3: cleared
    ManifestTable.restore(spark, t, 2)                        // v4: v2's state
    assert(ManifestTable.deleteTombstones(spark, t).size === 1)
    assert(headIds(t) === Set(1L))
    ManifestTable.restore(spark, t, 1)                        // v5: pre-delete
    assert(ManifestTable.deleteTombstones(spark, t) === Nil)
    assert(headIds(t) === Set(1L, 2L))
  }

  test("a tombstone added mid-derive forces the merge to re-derive, not carry") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    var fired = false
    var inside = false
    ManifestTable.beforeConditionalCommit = () => {
      if (!fired && !inside) {
        fired = true; inside = true
        try ManifestTable.deleteWhereLazy(spark, t, col("id") === 2L)
        finally inside = false
      }
    }
    try {
      // the merge derived its post-image BEFORE the delete existed;
      // carrying it would resurrect id 2 into an untargeted file
      ManifestTable.upsert(spark, t, df(1L -> "A"), Seq("id"))
    } finally ManifestTable.beforeConditionalCommit = () => ()
    assert(headIds(t) === Set(1L), "id 2 must stay deleted across the race")
  }
}
