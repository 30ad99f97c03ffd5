package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** DESCRIBE HISTORY (sources/ManifestTable.scala history/commitOp):
  * every publish records its operation kind; history() derives the
  * audit trail — version, op, commit clock, file/byte totals, churn —
  * entirely from manifests, never touching data. */
class HistorySpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_history").toString

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  test("every writer path records its op; history rows carry clock, files, bytes, churn") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    ManifestTable.commit(spark, t, df(3L -> "c"))
    ManifestTable.upsert(spark, t, df(1L -> "A"), Seq("id"))
    ManifestTable.deleteWhere(spark, t, col("id") === 3L)
    ManifestTable.compact(spark, t, targetFiles = 1)
    ManifestTable.restore(spark, t, 2)
    ManifestTable.addConstraint(spark, t, "id_pos", "id > 0")
    ManifestTable.dropConstraint(spark, t, "id_pos")
    val h = ManifestTable.history(spark, t).orderBy("version").collect()
    assert(h.map(_.getAs[String]("op")).toSeq === Seq(
      "append", "append", "merge", "delete", "compact", "restore",
      "add-constraint", "drop-constraint"))
    // clocks strictly increase along the line
    val clocks = h.map(_.getAs[Long]("commit_ms")).toSeq
    assert(clocks === clocks.sorted && clocks.distinct === clocks)
    // v1: everything is an add
    assert(h(0).getAs[Long]("n_added") === h(0).getAs[Int]("n_files").toLong)
    assert(h(0).getAs[Long]("n_removed") === 0L)
    // append adds without removing
    assert(h(1).getAs[Long]("n_removed") === 0L)
    // restore(2): back to v2's file census
    assert(h(5).getAs[Int]("n_files") === h(1).getAs[Int]("n_files"))
    // metadata-only commits move no files
    assert(h(6).getAs[Long]("n_added") === 0L && h(6).getAs[Long]("n_removed") === 0L)
    // bytes agree with the recorded sizes
    assert(h.last.getAs[Long]("n_bytes") ===
      ManifestTable.snapshotSizes(spark, t).values.sum)
    assert(ManifestTable.commitOp(spark, t, 3) === Some("merge"))
  }

  test("vacuumPreview reports exactly what expire then reclaims, without touching anything") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    ManifestTable.commit(spark, t, df(3L -> "c"))
    ManifestTable.compact(spark, t, targetFiles = 1) // v1+v2 dirs become garbage at keepLast=1
    val (victims, bytes) = ManifestTable.vacuumPreview(spark, t, keepLast = 1)
    assert(victims.size === 2 && bytes > 0L, s"got $victims / $bytes")
    // preview is a dry run: everything still on disk, all versions readable
    assert(new java.io.File(t, "data").listFiles().length === 3)
    assert(ManifestTable.read(spark, t, 1).count() === 2)
    ManifestTable.expire(spark, t, keepLast = 1)
    val left = new java.io.File(t, "data").listFiles().map("data/" + _.getName).toSet
    assert((victims.toSet intersect left).isEmpty,
      "expire must reclaim exactly the previewed dirs")
    assert(left.size === 1)
    val (afterV, afterB) = ManifestTable.vacuumPreview(spark, t, keepLast = 1)
    assert(afterV.isEmpty && afterB === 0L)
    // a grace window defers fresh dirs in the preview too
    ManifestTable.commit(spark, t, df(9L -> "z"), SaveMode.Overwrite)
    val (graced, _) = ManifestTable.vacuumPreview(spark, t,
      keepLast = 1, graceMs = 600_000L)
    assert(graced.isEmpty, "fresh unreferenced dirs sit out the grace window")
  }

  test("after retention, the oldest surviving version has unknowable churn (null), not lies") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    ManifestTable.commit(spark, t, df(2L -> "b"))
    ManifestTable.commit(spark, t, df(3L -> "c"))
    ManifestTable.expire(spark, t, keepLast = 2)
    val h = ManifestTable.history(spark, t).orderBy("version").collect()
    assert(h.map(_.getAs[Int]("version")).toSeq === Seq(2, 3))
    assert(h(0).isNullAt(h(0).fieldIndex("n_added")),
      "v2's parent expired — its churn is unknowable")
    assert(h(1).getAs[Long]("n_added") === 1L, "v3 diffs against surviving v2")
  }

  test("history is O(root parses): publish-time rollups make it correct with every segment gone") {
    val t = freshTable()
    val conf = spark.sparkContext.hadoopConfiguration
    val prev = conf.get(ManifestTable.SegmentFilesKey)
    conf.setInt(ManifestTable.SegmentFilesKey, 2)
    try {
      import spark.implicits._
      ManifestTable.commit(spark, t,
        (1L to 7L).map(i => i -> s"v$i").toDF("id", "v").repartition(5))
      ManifestTable.commit(spark, t,
        (8L to 9L).map(i => i -> s"v$i").toDF("id", "v").repartition(2))
      ManifestTable.deleteWhere(spark, t, col("id") === 1L)
    } finally {
      if (prev == null) conf.unset(ManifestTable.SegmentFilesKey)
      else conf.set(ManifestTable.SegmentFilesKey, prev)
    }
    val before = ManifestTable.history(spark, t).orderBy("version").collect()
      .map(_.toSeq).toSeq
    // the proof: delete every segment file — a history that still
    // answers identically touched ONLY the roots (the 100 TB design:
    // DESCRIBE HISTORY on a 100k-file × 50-version table must not
    // re-derive 5M file entries)
    val segDir = java.nio.file.Paths.get(t, "_manifests", "segments")
    assert(java.nio.file.Files.isDirectory(segDir),
      "the drill needs a genuinely segmented table")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(segDir).iterator().asScala.toSeq
      .foreach(java.nio.file.Files.delete(_))
    val after = ManifestTable.history(spark, t).orderBy("version").collect()
      .map(_.toSeq).toSeq
    assert(after === before, "history must come entirely from root rollups")
  }

  test("legacy roots without a rollup fall back to the full file-set derive") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    ManifestTable.commit(spark, t, df(3L -> "c"))
    ManifestTable.deleteWhere(spark, t, col("id") === 2L)
    val before = ManifestTable.history(spark, t).orderBy("version").collect()
      .map(_.toSeq).toSeq
    // strip the rollup line from every root — the pre-r14 manifest era
    val mdir = java.nio.file.Paths.get(t, "_manifests")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(mdir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.matches("v\\d+\\.json")).foreach { p =>
        val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        val stripped = txt.linesIterator
          .filterNot(_.trim.startsWith("\"rollup\"")).mkString("\n")
        assert(stripped != txt, "the drill expects rollups to be present")
        java.nio.file.Files.write(p, stripped.getBytes("UTF-8"))
      }
    val after = ManifestTable.history(spark, t).orderBy("version").collect()
      .map(_.toSeq).toSeq
    assert(after === before,
      "legacy roots must yield the same history via the fallback derive")
  }
}
