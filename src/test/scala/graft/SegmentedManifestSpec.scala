package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** Manifest segmentation (r10): past `graft.manifest.segmentFiles`
  * files the root manifest stops inlining the file list + stats and
  * references immutable segment files instead (the Delta-checkpoint /
  * Iceberg-manifest-list shape). These tests pin the contract:
  * byte-identical reads across the layout change, carry-by-reference
  * appends, O(root) metadata ops and restores, affected-segment-only
  * deletes, small-segment coalescing, legacy migration, and vacuum of
  * unreferenced segments. */
class SegmentedManifestSpec extends AnyFunSuite with SparkFixture {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft_segment").toString

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  /** Run `body` with the segment threshold lowered to `n` files. */
  private def withSegTarget[A](n: Int)(body: => A): A = {
    val conf = spark.sparkContext.hadoopConfiguration
    val prev = conf.get(ManifestTable.SegmentFilesKey)
    conf.setInt(ManifestTable.SegmentFilesKey, n)
    try body
    finally if (prev == null) conf.unset(ManifestTable.SegmentFilesKey)
            else conf.set(ManifestTable.SegmentFilesKey, prev)
  }

  private def headMap(t: String): Map[Long, String] =
    ManifestTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("a commit past the threshold segments the manifest; reads and stats are identical") {
    val t = fresh()
    withSegTarget(2) {
      ManifestTable.commit(spark, t,
        df((1L to 7L).map(i => i -> s"v$i"): _*).repartition(5),
        statsColumns = Seq("id"))
      val segs = ManifestTable.snapshotSegments(spark, t)
      assert(segs.nonEmpty, "past-threshold commit must write segments")
      assert(segs.forall(_.startsWith("segments/")), s"refs must be manifest-relative: $segs")
      // snapshot surface identical to the inline layout
      assert(headMap(t) === (1L to 7L).map(i => i -> s"v$i").toMap)
      val files = ManifestTable.snapshotFiles(spark, t)
      val stats = ManifestTable.snapshotStats(spark, t)
      assert(files.size > 2, s"need a multi-file past-threshold snapshot, got ${files.size}")
      assert(files.forall(stats.contains), "per-file stats must survive segmentation")
      assert(stats.values.forall(_.contains("id")))
      // stats pruning still works through segments
      val pruned = ManifestTable.readWhere(spark, t, col("id") === 1L)
      assert(pruned.collect().map(_.getLong(0)).toSeq === Seq(1L))
    }
  }

  test("an append carries parent segments by reference and adds exactly its own") {
    val t = fresh()
    withSegTarget(2) {
      ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b", 3L -> "c").repartition(3))
      val before = ManifestTable.snapshotSegments(spark, t)
      assert(before.nonEmpty)
      ManifestTable.commit(spark, t, df(4L -> "d").coalesce(1))
      val after = ManifestTable.snapshotSegments(spark, t)
      assert(before.toSet.subsetOf(after.toSet),
        s"parent segments must be carried by reference: $before vs $after")
      assert((after.toSet -- before.toSet).size === 1,
        "a 1-file append writes exactly one new segment")
      assert(headMap(t).keySet === Set(1L, 2L, 3L, 4L))
    }
  }

  test("metadata-only ops (constraint, lazy delete, DDL, restore) write no new segments") {
    val t = fresh()
    withSegTarget(2) {
      ManifestTable.commit(spark, t,
        df(1L -> "a", 2L -> "b", 3L -> "c").repartition(3), statsColumns = Seq("id"))
      val v1Segs = ManifestTable.snapshotSegments(spark, t, 1).toSet
      ManifestTable.addConstraint(spark, t, "pos", "id > 0")
      assert(ManifestTable.snapshotSegments(spark, t).toSet === v1Segs)
      ManifestTable.deleteWhereLazy(spark, t, col("id") === 2L)
      assert(ManifestTable.snapshotSegments(spark, t).toSet === v1Segs)
      assert(headMap(t).keySet === Set(1L, 3L))
      ManifestTable.addColumn(spark, t, "extra",
        org.apache.spark.sql.types.LongType)
      assert(ManifestTable.snapshotSegments(spark, t).toSet === v1Segs)
      // restore to v1 references v1's segments verbatim — zero segment IO
      val segDir = new Path(new Path(t, "_manifests"), "segments")
      val f = segDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val nBefore = f.listStatus(segDir).length
      ManifestTable.restore(spark, t, 1)
      assert(f.listStatus(segDir).length === nBefore,
        "restore must not write segment files")
      assert(ManifestTable.snapshotSegments(spark, t).toSet === v1Segs)
      assert(headMap(t).keySet === Set(1L, 2L, 3L))
    }
  }

  test("a delete rewrites only the segments it touches") {
    val t = fresh()
    withSegTarget(1) {
      // three appends → three single-file segments
      ManifestTable.commit(spark, t, df(1L -> "a").coalesce(1), statsColumns = Seq("id"))
      ManifestTable.commit(spark, t, df(2L -> "b").coalesce(1))
      ManifestTable.commit(spark, t, df(3L -> "c").coalesce(1))
      val before = ManifestTable.snapshotSegments(spark, t)
      assert(before.size === 3)
      // stats-pruned delete touches only the file holding id=2
      ManifestTable.deleteWhere(spark, t, col("id") === 2L)
      val after = ManifestTable.snapshotSegments(spark, t)
      assert((before.toSet & after.toSet).size === 2,
        s"untouched segments must be carried by reference: $before vs $after")
      assert(headMap(t).keySet === Set(1L, 3L))
    }
  }

  test("accumulated small segments coalesce once more than 8 exist") {
    val t = fresh()
    withSegTarget(4) {
      (1L to 12L).foreach(i =>
        ManifestTable.commit(spark, t, df(i -> s"v$i").coalesce(1)))
      val segs = ManifestTable.snapshotSegments(spark, t)
      // 12 one-file appends would leave 12 one-file segments without
      // coalescing; the demote-and-repack keeps the count bounded
      assert(segs.size < 12, s"small segments must coalesce, got ${segs.size}")
      assert(headMap(t).keySet === (1L to 12L).toSet)
    }
  }

  test("a legacy inline table migrates on its first over-threshold commit; old versions stay readable") {
    val t = fresh()
    // inline layout first (threshold far above the file count)
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"), statsColumns = Seq("id"))
    assert(ManifestTable.snapshotSegments(spark, t).isEmpty, "small table stays inline")
    withSegTarget(1) {
      ManifestTable.commit(spark, t, df(3L -> "c", 4L -> "d").repartition(2))
      assert(ManifestTable.snapshotSegments(spark, t).nonEmpty,
        "crossing the threshold must segment the new root")
      assert(headMap(t).keySet === Set(1L, 2L, 3L, 4L))
      // v1 (inline) still readable through time travel
      assert(ManifestTable.read(spark, t, 1).collect().map(_.getLong(0)).toSet
        === Set(1L, 2L))
      // and stats carried across the migration still prune
      val got = ManifestTable.readWhere(spark, t, col("id") === 1L)
        .collect().map(_.getLong(0))
      assert(got.toSeq === Seq(1L))
    }
  }

  test("expire reclaims segments no surviving version references") {
    val t = fresh()
    withSegTarget(1) {
      ManifestTable.commit(spark, t, df(1L -> "a").coalesce(1))
      ManifestTable.commit(spark, t, df(2L -> "b").coalesce(1))
      // overwrite orphans v1/v2's segments once those versions expire
      ManifestTable.commit(spark, t, df(9L -> "z").coalesce(1), SaveMode.Overwrite)
      val headSegs = ManifestTable.snapshotSegments(spark, t).toSet
      val segDir = new Path(new Path(t, "_manifests"), "segments")
      val f = segDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(f.listStatus(segDir).length > headSegs.size)
      ManifestTable.expire(spark, t, keepLast = 1)
      val left = f.listStatus(segDir).map(s => "segments/" + s.getPath.getName).toSet
      assert(left === headSegs,
        s"only the surviving version's segments may remain, got $left")
      assert(headMap(t) === Map(9L -> "z"))
    }
  }

  test("merge on a segmented table touches only churned segments and stays correct") {
    val t = fresh()
    withSegTarget(2) {
      ManifestTable.commit(spark, t,
        df((1L to 8L).map(i => i -> s"v$i"): _*).repartition(4), statsColumns = Seq("id"))
      val before = ManifestTable.snapshotSegments(spark, t).toSet
      ManifestTable.upsert(spark, t, df(1L -> "V1", 100L -> "ins"), Seq("id"))
      val after = ManifestTable.snapshotSegments(spark, t).toSet
      assert((before & after).nonEmpty,
        "untouched segments must be carried through a merge")
      assert(headMap(t) ===
        ((2L to 8L).map(i => i -> s"v$i").toMap + (1L -> "V1") + (100L -> "ins")))
      // change feed across the segmented line is still churn-bounded and exact
      val ch = ManifestTable.rowChanges(spark, t, 1, Seq("id"))
      val byType = ch.collect().groupBy(_.getAs[String]("_change_type"))
      assert(byType("insert").map(_.getLong(0)).toSet === Set(100L))
      assert(byType("update_post").map(_.getLong(0)).toSet === Set(1L))
    }
  }

  test("r10 features compose on a SEGMENTED table: transforms + blooms + clone + count") {
    val t = fresh(); val dst = fresh()
    withSegTarget(3) {
      import spark.implicits._
      val rows = (0 until 400).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      ManifestTable.commit(spark, t, rows.repartition(8, col("id")),
        org.apache.spark.sql.SaveMode.Overwrite,
        partitionBy = Seq("bucket(4,id)"), statsColumns = Seq("id"))
      ManifestTable.addBloom(spark, t, Seq("v"))
      ManifestTable.commit(spark, t,
        (1000 until 1200).map(i => (i.toLong, s"v$i")).toDF("id", "v")
          .repartition(4, col("id")))
      assert(ManifestTable.snapshotSegments(spark, t).nonEmpty,
        "the table must actually be segmented")
      // hidden bucket pruning through segment-carried partition stats
      val hit = ManifestTable.readWhere(spark, t, col("id") === 1100L)
      assert(hit.count() === 1L)
      assert(hit.inputFiles.length <
        ManifestTable.snapshotFiles(spark, t).size)
      // bloom pruning on the post-config commit's files
      val bh = ManifestTable.readWhere(spark, t, col("v") === "v1150")
      assert(bh.count() === 1L)
      // metadata count sums across segments
      assert(ManifestTable.rowCount(spark, t) === Some(600L))
      // clone of a segmented table: fresh segments under the clone,
      // same image, pruning intact
      ManifestTable.cloneShallow(spark, t, dst)
      assert(ManifestTable.read(spark, dst).count() === 600L)
      assert(ManifestTable.rowCount(spark, dst) === Some(600L))
      val ch = ManifestTable.readWhere(spark, dst, col("id") === 7L)
      assert(ch.count() === 1L)
      assert(ch.inputFiles.length <
        ManifestTable.snapshotFiles(spark, dst).size)
    }
  }

  test("a config-only commit (addBloom) carries EVERY segment by reference") {
    // promoted r11 probe 3 — the fact it adjudicated: ADVICE's claim
    // that addBloom "rewrites every segment" (an O(table) metadata
    // cost) is FALSE. tryPublish's carry rule — a candidate segment is
    // reused iff every file is in the snapshot with identical stats —
    // makes any config-only publish (bloom config, constraints, DDL)
    // carry the whole parent layout automatically; this pin keeps a
    // future carry-rule edit from silently re-introducing the rewrite.
    import org.apache.spark.sql.SaveMode
    import spark.implicits._
    withSegTarget(10) {
      val t = fresh() + "/t"
      val data = (0 until 200).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
      ManifestTable.commit(spark, t, data.repartition(40), SaveMode.Overwrite,
        statsColumns = Seq("id"))
      val segsBefore = ManifestTable.snapshotSegments(spark, t)
      assert(segsBefore.nonEmpty, "table should be segmented")
      ManifestTable.addBloom(spark, t, Seq("id"))
      val segsAfter = ManifestTable.snapshotSegments(spark, t)
      assert(segsAfter.toSet == segsBefore.toSet,
        "a config-only commit must carry every segment by reference " +
          s"(before=${segsBefore.size}, after=${segsAfter.size}, " +
          s"carried=${segsAfter.count(segsBefore.contains)})")
    }
  }

  test("partition-aligned segments: a partition-scoped delete rewrites only its value's segments") {
    // r12: new files pack into segments ORDERED by partition value, so
    // each segment covers a contiguous value range — a delete of one
    // value fails the carry rule only where that value lives, instead
    // of in every (uuid-interleaved) segment
    import org.apache.spark.sql.SaveMode
    import spark.implicits._
    withSegTarget(20) {
      val t = fresh() + "/t"
      val data = (0 until 2000).map(i => (i.toLong, i % 10, s"r$i"))
        .toDF("id", "g", "s")
      ManifestTable.commit(spark, t, data.repartition(20, col("id")),
        SaveMode.Overwrite, partitionBy = Seq("g"), statsColumns = Seq("id"))
      val segsBefore = ManifestTable.snapshotSegments(spark, t)
      assert(segsBefore.size >= 8, s"expected ~10 segments, got ${segsBefore.size}")
      def holdsValue(ref: String, v: Int): Boolean =
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"$t/_manifests/$ref")), "UTF-8")
          .contains(s"g=$v/")
      // alignment means most segments hold exactly one value — the
      // victim value must live in very few of them
      val victims = segsBefore.filter(holdsValue(_, 3))
      assert(victims.size <= 2,
        s"g=3 should live in ~1 aligned segment, found it in ${victims.size} " +
          s"of ${segsBefore.size}")
      ManifestTable.deleteWhere(spark, t, col("g") === 1)
      val segsAfter = ManifestTable.snapshotSegments(spark, t).toSet
      val untouched = segsBefore.filterNot(holdsValue(_, 1))
      assert(untouched.nonEmpty && untouched.forall(segsAfter.contains),
        "every segment without the deleted value must carry by reference")
      assert(ManifestTable.read(spark, t).count() == 1800)
      // pruning still intact on the aligned layout
      val hit = ManifestTable.readWhere(spark, t, col("g") === 4)
      assert(hit.count() == 200)
      assert(hit.inputFiles.length <
        ManifestTable.snapshotFiles(spark, t).size)
    }
  }
}
