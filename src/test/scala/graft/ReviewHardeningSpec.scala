package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** Round-9 review hardening: each test pins a bug found by the
  * adversarial review of the lakehouse diff — path-encoding mismatches
  * between the manifest's on-disk file names (Path.toString, one
  * hive-escape layer) and Spark's `_metadata.file_path` (URI-encoded
  * on top), manifest-grammar truncation via an unescaped `}`,
  * cross-layout change feeds, and raced layout changes. */
class ReviewHardeningSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_hardening").toString

  private def pdf(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v", "p")
  }

  test("hive-escaped partition values: merge and delete target the right files (no dup/no resurrect)") {
    val t = freshTable()
    ManifestTable.commit(spark, t,
      pdf((1L, "a", "x/y:z"), (2L, "b", "x%3Ay"), (3L, "c", "plain")),
      SaveMode.Overwrite, partitionBy = Seq("p"))
    // upsert a row living in a hive-escaped partition: the rewrite must
    // DROP the old file from the snapshot (a relFileCol/manifest
    // spelling mismatch would keep it and duplicate the row)
    ManifestTable.upsert(spark, t, pdf((1L, "A", "x/y:z")), Seq("id"))
    val got = ManifestTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq((1L, "A", "x/y:z"), (2L, "b", "x%3Ay"),
      (3L, "c", "plain")), s"got ${got.toSeq}")
    // eager delete in an escaped partition must actually remove it
    ManifestTable.deleteWhere(spark, t, col("p") === "x/y:z")
    assert(ManifestTable.read(spark, t).count() === 2)
    assert(ManifestTable.read(spark, t)
      .filter(col("p") === "x/y:z").count() === 0)
  }

  test("a partition value containing literal %XX records correct stats and isn't pruned away") {
    val t = freshTable()
    ManifestTable.commit(spark, t,
      pdf((1L, "a", "x%3Ay"), (2L, "b", "plain")),
      SaveMode.Overwrite, partitionBy = Seq("p"))
    // double-unescaping would have recorded stats for "x:y" and the
    // equality read below would prune the live file to zero rows
    val got = ManifestTable.readWhere(spark, t, col("p") === "x%3Ay")
      .collect().map(_.getLong(0))
    assert(got.toSeq === Seq(1L))
  }

  test("a literal '}' in a partition value cannot truncate the tombstone block") {
    val t = freshTable()
    ManifestTable.commit(spark, t,
      pdf((1L, "del", "a}b"), (2L, "keep", "a}b"), (3L, "keep", "plain")),
      SaveMode.Overwrite, partitionBy = Seq("p"))
    ManifestTable.deleteWhereLazy(spark, t, col("v") === "del")
    val tombs = ManifestTable.deleteTombstones(spark, t)
    assert(tombs.size === 1 && tombs.head._2.nonEmpty,
      s"tombstone with a }-path target must survive the manifest round-trip, got $tombs")
    assert(tombs.head._2.exists(_.contains("a}b")))
    assert(ManifestTable.read(spark, t).count() === 2,
      "the lazily deleted row must stay hidden")
  }

  test("a table rooted under a col=value directory derives partition values from the right segment") {
    val root = java.nio.file.Files.createTempDirectory("graft_rooted")
    val t = root.resolve("lang=archive").resolve("tbl").toString
    import spark.implicits._
    ManifestTable.commit(spark, t,
      Seq((1L, "en"), (2L, "fr")).toDF("id", "lang"),
      SaveMode.Overwrite, partitionBy = Seq("lang"))
    val got = ManifestTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "en"), (2L, "fr")),
      "the root's lang=archive segment must not shadow the real partition dirs")
    assert(ManifestTable.readWhere(spark, t, col("lang") === "en")
      .count() === 1)
  }

  test("an append racing a layout-changing overwrite fails loudly, never publishes a mixed snapshot") {
    val t = freshTable()
    ManifestTable.commit(spark, t, pdf((1L, "a", "x")),
      SaveMode.Overwrite, partitionBy = Seq("p"))
    var fired = false
    var inside = false
    ManifestTable.beforeConditionalCommit = () => {
      if (!fired && !inside) {
        fired = true; inside = true
        try ManifestTable.commit(spark, t, pdf((9L, "z", "flat-now")),
          SaveMode.Overwrite) // layout change: partitioned → flat
        finally inside = false
      }
    }
    try {
      val e = intercept[IllegalArgumentException] {
        ManifestTable.commit(spark, t, pdf((2L, "b", "y")))
      }
      assert(e.getMessage.contains("layout"))
    } finally ManifestTable.beforeConditionalCommit = () => ()
    // the overwrite's flat snapshot stands; nothing mixed was published
    val got = ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(got.toSeq === Seq((9L, "flat-now")))
  }

  test("addConstraint validates the LIVE table: lazily deleted violators don't block it") {
    val t = freshTable()
    import spark.implicits._
    ManifestTable.commit(spark, t,
      Seq((1L, 10L), (2L, -5L)).toDF("id", "score"),
      statsColumns = Seq("score"))
    ManifestTable.deleteWhereLazy(spark, t, col("score") < 0L)
    assert(ManifestTable.read(spark, t).count() === 1)
    // the raw files still hold the -5 row; only the live view matters
    ManifestTable.addConstraint(spark, t, "score_pos", "score > 0")
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t, Seq((3L, -1L)).toDF("id", "score"))
    }
  }

  test("change feeds across a layout-changing overwrite keep the physical column values") {
    val t = freshTable()
    ManifestTable.commit(spark, t, pdf((1L, "a", "en"), (2L, "b", "fr"))) // flat: p physical
    ManifestTable.commit(spark, t,
      ManifestTable.read(spark, t), SaveMode.Overwrite,
      partitionBy = Seq("p")) // same rows, partitioned layout
    // changes(0): v1's flat files must read under v1's layout — the
    // to-layout read stripped p and re-derived null from pathless dirs
    val feed = ManifestTable.changes(spark, t, 0)
    assert(feed.filter(col("p").isNull).count() === 0,
      "pre-overwrite files must surface their physical column values")
    // rowChanges across the pure layout rewrite must be EMPTY — a
    // null'd pre-side made every row a spurious update_post before
    val rc = ManifestTable.rowChanges(spark, t, 1, Seq("id"))
    assert(rc.count() === 0, s"pure layout rewrite must diff to nothing")
  }

  test("a batch with the reserved size column is refused before any data is written") {
    val t = freshTable()
    import spark.implicits._
    ManifestTable.commit(spark, t, Seq((1L, "a")).toDF("id", "v"))
    val dirsBefore = new java.io.File(t, "data").listFiles().map(_.getName).toSet
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t,
        Seq((2L, "b", 9L)).toDF("id", "v", "__graft_bytes"))
    }
    val dirsAfter = new java.io.File(t, "data").listFiles().map(_.getName).toSet
    assert(dirsAfter === dirsBefore, "refusal must precede the write")
  }
}
