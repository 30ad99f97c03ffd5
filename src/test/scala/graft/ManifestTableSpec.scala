package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** Manifest-commit protocol (sources/ManifestTable.scala): snapshot
  * isolation over raw parquet. The torn-write drill is the point —
  * data files on disk with no manifest must be invisible. */
class ManifestTableSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_mtab").toString

  import org.apache.spark.sql.DataFrame
  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  test("append commits compose snapshots; reads see exactly the committed union") {
    val t = freshTable()
    assert(ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b")) === 1)
    assert(ManifestTable.commit(spark, t, df(3L -> "c")) === 2)
    val got = ManifestTable.read(spark, t).orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("overwrite replaces the snapshot; time travel still reads v1") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    ManifestTable.commit(spark, t, df(9L -> "z"), SaveMode.Overwrite)
    assert(ManifestTable.read(spark, t).count() === 1)
    assert(ManifestTable.read(spark, t, version = 1).count() === 2)
  }

  test("readers never see a half-commit: orphan data files without a manifest are invisible") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    // simulate a writer crash between data write and manifest publish:
    // a full parquet directory appears under data/ with NO manifest
    df(100L -> "torn", 101L -> "torn").write
      .mode(SaveMode.ErrorIfExists).parquet(s"$t/data/crashed-writer")
    val got = ManifestTable.read(spark, t).collect()
    assert(got.length === 1 && got.head.getLong(0) === 1L,
      "orphan files leaked into a read")
    // and the next commit does not resurrect them
    ManifestTable.commit(spark, t, df(2L -> "b"))
    assert(ManifestTable.read(spark, t).count() === 2)
  }

  test("upsert replaces matched keys, inserts the rest, as ONE atomic snapshot") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "old", 2L -> "keep"))
    val v = ManifestTable.upsert(spark, t, df(1L -> "new", 3L -> "ins"), Seq("id"))
    val got = ManifestTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
    // pre-image intact at the previous version (snapshot isolation)
    assert(ManifestTable.read(spark, t, version = v - 1)
      .filter(col("v") === "old").count() === 1)
  }

  test("a crashed writer's temp manifest is invisible — not a parse crash") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    // simulate a crash between temp-manifest write and the rename
    val stray = new java.io.File(new java.io.File(t, "_manifests"), ".tmp-dead-2.json")
    val w = new java.io.PrintWriter(stray)
    try w.write("""{"version": 2, "files": ["/nowhere.parquet"]}""") finally w.close()
    assert(ManifestTable.currentVersion(spark, t) === 1)
    assert(ManifestTable.read(spark, t).count() === 1)
    // and the next commit lands on v2 normally
    assert(ManifestTable.commit(spark, t, df(2L -> "b")) === 2)
  }

  test("optimistic concurrency: a squatted version slot forces a retry, not a clobber") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    // squat v2 by hand (a concurrent writer's committed manifest)
    val dir = new java.io.File(t, "_manifests")
    val squat = new java.io.File(dir, "v00000002.json")
    val w = new java.io.PrintWriter(squat)
    try w.write("""{"version": 2, "files": []}""") finally w.close()
    // this writer must land on v3, leave v2 untouched, and recompose
    // its append against the NEW head — v2 emptied the table, so v3 is
    // squat-snapshot + new file = 1 row (not a lost-update 2)
    assert(ManifestTable.commit(spark, t, df(2L -> "b")) === 3)
    assert(scala.io.Source.fromFile(squat).mkString.contains("\"files\": []"))
    assert(ManifestTable.read(spark, t).count() === 1)
  }
}
