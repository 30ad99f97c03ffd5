package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** RESTORE — rollback as a new commit (sources/ManifestTable.scala
  * restore/restoreAsOf): the head becomes the target version's image
  * BY REFERENCE, history stays readable, expiry keeps restored files
  * live, and the row-level CDF of a restore is the inverse of what it
  * undoes. */
class RestoreSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_restore").toString

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  private def headMap(t: String): Map[Long, String] =
    ManifestTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("restore flips the head to the target image by reference; history intact") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    ManifestTable.upsert(spark, t, df(1L -> "BAD", 9L -> "junk"), Seq("id"))
    val v = ManifestTable.restore(spark, t, 1)
    assert(v === 3)
    assert(headMap(t) === Map(1L -> "a", 2L -> "b"))
    // zero-copy: the restored head references EXACTLY v1's files
    assert(ManifestTable.snapshotFiles(spark, t, 3) ===
      ManifestTable.snapshotFiles(spark, t, 1))
    // the undone version stays inspectable (rollback, not erasure)
    assert(ManifestTable.read(spark, t, 2).filter(col("v") === "BAD").count() === 1)
  }

  test("restore survives expiry of the target version's manifest") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    ManifestTable.commit(spark, t, df(2L -> "b"))
    ManifestTable.upsert(spark, t, df(1L -> "BAD"), Seq("id"))
    ManifestTable.restore(spark, t, 2)
    ManifestTable.expire(spark, t, keepLast = 1)
    // v2's manifest is gone but the head references its files — they
    // must have survived the vacuum's reachability sweep
    assert(headMap(t) === Map(1L -> "a", 2L -> "b"))
    intercept[IllegalArgumentException] {
      ManifestTable.read(spark, t, 2)
    }
  }

  test("the row CDF of a restore is the inverse of the commit it undoes") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    ManifestTable.upsert(spark, t, df(1L -> "BAD", 9L -> "junk"), Seq("id"))
    ManifestTable.restore(spark, t, 1)
    val feed = ManifestTable.rowChanges(spark, t, sinceVersion = 2, Seq("id"))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type")))
      .toSet
    // diff v2 → v3(=v1 image): the upsert's update reverts, its insert deletes
    assert(feed.contains((1L, "update_post")) || feed.contains((1L, "update_pre")),
      s"key 1 must revert, got $feed")
    assert(feed.contains((9L, "delete")), s"key 9 must delete, got $feed")
  }

  test("restore keeps stats, sizes and the partition spec of the target version") {
    val t = freshTable()
    ManifestTable.commit(spark, t,
      df(1L -> "x", 11L -> "y").withColumn("p", when(col("id") < 10, "a").otherwise("b")),
      partitionBy = Seq("p"), statsColumns = Seq("id"))
    ManifestTable.commit(spark, t,
      df(21L -> "z").withColumn("p", lit("b")))
    ManifestTable.restore(spark, t, 1)
    assert(ManifestTable.partitionColumns(spark, t) === Seq("p"))
    assert(ManifestTable.snapshotSizes(spark, t).keySet ===
      ManifestTable.snapshotFiles(spark, t).toSet)
    // recorded id-stats carried: a disjoint range prunes everything
    assert(ManifestTable.readRange(spark, t, Seq(("id", 100.0, 200.0)))
      .count() === 0)
    assert(headMap(t) === Map(1L -> "x", 11L -> "y"))
  }

  test("restoreAsOf resolves through commit wall-clock; bad targets are refused") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    val tsBase = ManifestTable.commitTimeMs(spark, t).get
    ManifestTable.upsert(spark, t, df(1L -> "BAD"), Seq("id"))
    ManifestTable.restoreAsOf(spark, t, tsBase)
    assert(headMap(t) === Map(1L -> "a"))
    intercept[IllegalArgumentException] {
      ManifestTable.restore(spark, t, 0)
    }
    intercept[IllegalArgumentException] {
      ManifestTable.restore(spark, t, 99)
    }
  }
}
