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

  test("date-keyed tables: merge works and date stats record/prune as epoch days") {
    val t = freshTable()
    import spark.implicits._
    val base = Seq(("2024-01-01", 1L), ("2024-01-02", 2L),
        ("2024-06-01", 3L), ("2024-06-02", 4L))
      .toDF("ds", "n").select(col("ds").cast("date").as("day"), col("n"))
    ManifestTable.commit(spark, t, base.repartitionByRange(2, col("day")),
      SaveMode.Overwrite, statsColumns = Seq("day"))
    // the unconditional double-cast used to fail ANALYSIS here — both
    // in the stats agg at commit and in the merge key envelope
    ManifestTable.upsert(spark, t,
      Seq(("2024-01-01", 10L), ("2024-07-01", 5L)).toDF("ds", "n")
        .select(col("ds").cast("date").as("day"), col("n")),
      Seq("day"))
    val got = ManifestTable.read(spark, t).orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(got.toSeq === Seq(("2024-01-01", 10L), ("2024-01-02", 2L),
      ("2024-06-01", 3L), ("2024-06-02", 4L), ("2024-07-01", 5L)))
    // date predicates prune through the epoch-day stats space
    assert(ManifestTable.readWhere(spark, t,
      col("day") === lit(java.sql.Date.valueOf("2024-01-02"))).count() === 1)
    // a binary stats column is skipped, never a crash
    val t2 = freshTable()
    ManifestTable.commit(spark, t2,
      Seq((1L, Array[Byte](1, 2))).toDF("id", "blob"),
      statsColumns = Seq("blob", "id"))
    assert(ManifestTable.read(spark, t2).count() === 1)
  }

  test("a delete-everything snapshot stays readable as an empty frame; the line continues") {
    val t = freshTable()
    ManifestTable.commit(spark, t, pdf((1L, "a", "x"), (2L, "b", "y"))
      .select(col("id"), col("v")))
    ManifestTable.deleteWhere(spark, t, lit(true))
    val empty = ManifestTable.read(spark, t)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === Seq("id", "v"),
      "the recorded schema must survive an empty snapshot")
    assert(ManifestTable.readWhere(spark, t, col("id") > 0L).count() === 0)
    assert(ManifestTable.compact(spark, t) === ManifestTable.currentVersion(spark, t),
      "compacting an empty snapshot is a no-op, not a crash")
    ManifestTable.commit(spark, t, pdf((3L, "c", "z")).select(col("id"), col("v")))
    assert(ManifestTable.read(spark, t).count() === 1)
  }

  test("constraint names that base64 into '/' leave no stray dirs under _manifests") {
    val t = freshTable()
    ManifestTable.commit(spark, t, pdf((1L, "a", "x")).select(col("id"), col("v")))
    ManifestTable.addConstraint(spark, t, "co?", "id IS NOT NULL") // b64('co?') = 'Y28/'
    ManifestTable.dropConstraint(spark, t, "co?")
    val entries = new java.io.File(t, "_manifests").listFiles().map(_.getName)
    assert(entries.forall(n => n.matches("v\\d{8}\\.json")),
      s"publish tags must not leave temp debris: ${entries.toSeq}")
  }

  test("the vacuum grace window sees NESTED write activity, not just depth-1 mtimes") {
    val t = freshTable()
    ManifestTable.commit(spark, t, pdf((1L, "a", "x")).select(col("id"), col("v")))
    // an unreferenced dir simulating an in-flight deep write: stale
    // top-level dirs, one FRESH nested file
    val orphan = java.nio.file.Paths.get(t, "data", "inflight", "sub")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("part-0.parquet"), Array[Byte](1))
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 3_600_000L)
    java.nio.file.Files.setLastModifiedTime(orphan.getParent, old)
    java.nio.file.Files.setLastModifiedTime(orphan, old)
    val (graced, _) = ManifestTable.vacuumPreview(spark, t,
      keepLast = 1, graceMs = 600_000L)
    assert(!graced.contains("data/inflight"),
      "a fresh nested file must keep the dir inside the grace window")
    // fully quiesced (nested file backdated too) → reclaimable
    java.nio.file.Files.setLastModifiedTime(orphan.resolve("part-0.parquet"), old)
    val (ripe, bytes) = ManifestTable.vacuumPreview(spark, t,
      keepLast = 1, graceMs = 600_000L)
    assert(ripe.contains("data/inflight") && bytes >= 1L)
    ManifestTable.expire(spark, t, keepLast = 1, graceMs = 600_000L)
    assert(!java.nio.file.Files.exists(orphan),
      "expire must reclaim exactly what the preview promised")
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
