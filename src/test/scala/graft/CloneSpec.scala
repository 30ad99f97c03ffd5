package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** SHALLOW CLONE (sources/ManifestTable.scala cloneShallow): a
  * zero-copy table born referencing the donor's files by path through
  * the extern ledger. Pins the independence contract (writes to either
  * side never affect the other), metadata carriage (stats, constraints,
  * tombstones, deletion vectors), the vacuum contract in BOTH
  * directions (clone expire can never touch donor bytes; donor expire
  * breaks the clone LOUDLY), progressive localization via rewrites,
  * and clone-of-clone chaining. */
class CloneSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_clone").toString

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  private def headMap(t: String): Map[Long, String] =
    ManifestTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def localDataBytes(t: String): Long = {
    val d = new java.io.File(t, "data")
    if (!d.exists) 0L
    else {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length
      walk(d)
    }
  }

  test("clone reads the donor image with zero local data bytes") {
    val src = freshDir(); val dst = freshDir()
    ManifestTable.commit(spark, src, df(1L -> "a", 2L -> "b"),
      statsColumns = Seq("id"))
    ManifestTable.commit(spark, src, df(3L -> "c"))
    val v = ManifestTable.cloneShallow(spark, src, dst)
    assert(v === 1)
    assert(localDataBytes(dst) === 0L, "a shallow clone moves no data")
    assert(headMap(dst) === Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // stats carried: skipping works from birth
    assert(ManifestTable.snapshotStats(spark, dst).nonEmpty)
    assert(ManifestTable.readWhere(spark, dst, col("id") === 3L)
      .inputFiles.length < ManifestTable.snapshotFiles(spark, dst).size)
  }

  test("writes diverge: clone append/upsert never shows in the donor, and vice versa") {
    val src = freshDir(); val dst = freshDir()
    ManifestTable.commit(spark, src, df(1L -> "a", 2L -> "b"))
    ManifestTable.cloneShallow(spark, src, dst)
    ManifestTable.upsert(spark, dst, df(2L -> "B2", 9L -> "new"), Seq("id"))
    ManifestTable.commit(spark, src, df(7L -> "donor-only"))
    assert(headMap(dst) === Map(1L -> "a", 2L -> "B2", 9L -> "new"))
    assert(headMap(src) === Map(1L -> "a", 2L -> "b", 7L -> "donor-only"))
  }

  test("clone carries pending tombstones and deletion vectors") {
    val src = freshDir(); val dst = freshDir()
    ManifestTable.commit(spark, src,
      df(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"),
      statsColumns = Seq("id"))
    ManifestTable.deleteWhereLazy(spark, src, col("id") === 2L)
    ManifestTable.deleteWhereVector(spark, src, col("v") === "d")
    ManifestTable.cloneShallow(spark, src, dst)
    assert(headMap(dst) === Map(1L -> "a", 3L -> "c"),
      "deferred donor deletes must stay deleted in the clone")
    // materializing in the CLONE localizes, donor still deferred
    ManifestTable.materializeDeletes(spark, dst)
    assert(headMap(dst) === Map(1L -> "a", 3L -> "c"))
    assert(ManifestTable.deleteTombstones(spark, src).nonEmpty)
  }

  test("clone carries CHECK constraints but not txn watermarks") {
    val src = freshDir(); val dst = freshDir()
    ManifestTable.commit(spark, src, df(1L -> "a"),
      txn = Some(("app-x", 5L)))
    ManifestTable.addConstraint(spark, src, "pos_id", "id > 0")
    ManifestTable.cloneShallow(spark, src, dst)
    assert(ManifestTable.checkConstraints(spark, dst) === Map("pos_id" -> "id > 0"))
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, dst, df(-1L -> "bad"))
    }
    assert(ManifestTable.txnVersion(spark, dst, "app-x").isEmpty,
      "a clone starts its own streaming lineage")
  }

  test("clone-side expire can never touch donor bytes; compact localizes") {
    val src = freshDir(); val dst = freshDir()
    ManifestTable.commit(spark, src, df(1L -> "a", 2L -> "b"))
    val donorBytes = localDataBytes(src)
    ManifestTable.cloneShallow(spark, src, dst)
    ManifestTable.commit(spark, dst, df(9L -> "local"))
    // compact rewrites everything into the clone's own data dir …
    ManifestTable.compact(spark, dst, targetFiles = 1)
    ManifestTable.expire(spark, dst, keepLast = 1)
    // … and the vacuum that follows reclaims only clone-local garbage
    assert(localDataBytes(src) === donorBytes,
      "clone expire must not reclaim donor files")
    assert(headMap(src) === Map(1L -> "a", 2L -> "b"))
    assert(headMap(dst) === Map(1L -> "a", 2L -> "b", 9L -> "local"))
    assert(localDataBytes(dst) > 0L, "compact localized the snapshot")
  }

  test("donor expire that reclaims a referenced file breaks the clone LOUDLY") {
    val src = freshDir(); val dst = freshDir()
    ManifestTable.commit(spark, src, df(1L -> "a"))
    ManifestTable.commit(spark, src, df(2L -> "b"), // v2 files survive
      org.apache.spark.sql.SaveMode.Overwrite)
    ManifestTable.cloneShallow(spark, src, dst, version = 1)
    ManifestTable.expire(spark, src, keepLast = 1) // reclaims v1's files
    val ex = intercept[Exception] { headMap(dst) }
    val msg = Option(ex.getMessage).getOrElse("") + ex.getClass.getName
    assert(!headMap(src).isEmpty) // donor head fine
    assert(msg.nonEmpty, "clone read after donor vacuum must fail, not be empty")
  }

  test("clone-of-clone chains resolution to the dir that owns the bytes") {
    val a = freshDir(); val b = freshDir(); val c = freshDir()
    ManifestTable.commit(spark, a, df(1L -> "a", 2L -> "b"))
    ManifestTable.cloneShallow(spark, a, b)
    ManifestTable.commit(spark, b, df(3L -> "b-local"))
    ManifestTable.cloneShallow(spark, b, c)
    assert(headMap(c) === Map(1L -> "a", 2L -> "b", 3L -> "b-local"))
    // c's ledger points each uuid at its OWNER (a for a's files, b for
    // b's), not at the intermediate clone
    val ext = ManifestTable.externRoots(spark, c)
    assert(ext.values.toSet.size === 2)
  }

  test("clone of a partitioned table keeps layout-derived partition columns") {
    val src = freshDir(); val dst = freshDir()
    import spark.implicits._
    val d = Seq((1L, "x", "p1"), (2L, "y", "p2"), (3L, "z", "p1"))
      .toDF("id", "v", "part")
    ManifestTable.commit(spark, src, d, partitionBy = Seq("part"),
      statsColumns = Seq("id"))
    ManifestTable.cloneShallow(spark, src, dst)
    val got = ManifestTable.read(spark, dst)
      .select("id", "part").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "p1", 2L -> "p2", 3L -> "p1"))
    // partition pruning works through the extern resolution
    assert(ManifestTable.readWhere(spark, dst, col("part") === "p2")
      .inputFiles.length < ManifestTable.snapshotFiles(spark, dst).size)
  }

  test("clone refuses a non-fresh destination and a second ledger") {
    val src = freshDir(); val dst = freshDir()
    ManifestTable.commit(spark, src, df(1L -> "a"))
    ManifestTable.commit(spark, dst, df(2L -> "b"))
    intercept[IllegalArgumentException] {
      ManifestTable.cloneShallow(spark, src, dst)
    }
  }

  test("time-travel clone takes the requested donor version") {
    val src = freshDir(); val dst = freshDir()
    ManifestTable.commit(spark, src, df(1L -> "a"))
    ManifestTable.upsert(spark, src, df(1L -> "A2"), Seq("id"))
    ManifestTable.cloneShallow(spark, src, dst, version = 1)
    assert(headMap(dst) === Map(1L -> "a"))
  }
}
