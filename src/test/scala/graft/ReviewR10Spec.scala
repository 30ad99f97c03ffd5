package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{GraftCatalog, ManifestTable}

/** Regression pins for the second r10 review pass: the change feed
  * under column evolution + lazy deletes, the __f/__ri tag-name
  * reservation, analyzer-rule robustness for absurd version literals,
  * and the drop-and-recreate cache purge. */
class ReviewR10Spec extends AnyFunSuite with SparkFixture {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_rev10").toString

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  test("changes() survives addColumn + lazy delete on the NEW column") {
    val t = freshDir()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"),
      statsColumns = Seq("id"))
    ManifestTable.addColumn(spark, t, "extra",
      org.apache.spark.sql.types.IntegerType)
    import spark.implicits._
    ManifestTable.commit(spark, t,
      Seq((3L, "c", 5), (4L, "d", 9)).toDF("id", "v", "extra"))
    // the tombstone's predicate names a column the v1 group's recorded
    // schema does not have — the feed must evaluate it under the
    // to-version semantics (null for old rows), not crash
    ManifestTable.deleteWhereLazy(spark, t, col("extra") === 5)
    val ch = ManifestTable.changes(spark, t, 0)
    val ids = ch.select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 4L), s"live feed image wrong: $ids")
    // the IS NULL direction: old rows DO match and must be hidden by
    // the feed exactly as the live read hides them
    val t2 = freshDir()
    ManifestTable.commit(spark, t2, df(1L -> "a"), statsColumns = Seq("id"))
    ManifestTable.addColumn(spark, t2, "extra",
      org.apache.spark.sql.types.IntegerType)
    ManifestTable.deleteWhereLazy(spark, t2, col("extra").isNull)
    assert(ManifestTable.read(spark, t2).count() === 0L)
    assert(ManifestTable.changes(spark, t2, 0).count() === 0L,
      "feed and live read must agree on IS-NULL tombstones over old files")
  }

  test("data columns named __f or __ri are refused at the write") {
    val t = freshDir()
    import spark.implicits._
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t, Seq((1L, "x")).toDF("id", "__f"))
    }
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t, Seq((1L, "x")).toDF("id", "__ri"))
    }
  }

  test("an over-Int version literal resolves as not-found, never an analyzer NFE") {
    val t = freshDir()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    // the resolution rule lives in GraftExtensions — build an
    // extension session on the shared context (the GraftExtensionsSpec
    // pattern)
    import org.apache.spark.sql.SparkSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    GraftCatalog.register("rev10t", t)
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // sane time travel works
      assert(ext.sql("SELECT count(*) FROM graft.`rev10t@v1`")
        .head.getLong(0) === 1L)
      val e = intercept[Exception] {
        ext.sql("SELECT * FROM graft.`rev10t@v99999999999`").collect()
      }
      assert(!e.isInstanceOf[NumberFormatException],
        s"analyzer rule leaked ${e.getClass}")
    } finally {
      GraftCatalog.unregister("rev10t")
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  test("a listing that reveals a recreate purges stale cached manifests") {
    val t = freshDir()
    ManifestTable.commit(spark, t, df(1L -> "old"))
    ManifestTable.commit(spark, t, df(2L -> "old2"))
    assert(ManifestTable.read(spark, t, 2).count() === 2L) // warm the cache
    // drop and recreate the table at the same path with a SHORTER history
    def rmRf(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRf)
      f.delete(); ()
    }
    rmRf(new java.io.File(t))
    ManifestTable.commit(spark, t, df(9L -> "new"))
    // the listing shows head 1: the cached v2 text must be purged, so
    // a v2 read fails loudly instead of serving the old table
    assert(ManifestTable.versions(spark, t) === Seq(1),
      "recreated table must restart at v1 — " +
        new java.io.File(t, "_manifests").listFiles().map(_.getName).toSeq)
    intercept[IllegalArgumentException] {
      ManifestTable.snapshotFiles(spark, t, 2)
    }
    assert(ManifestTable.read(spark, t).collect()
      .map(_.getString(1)).toSeq === Seq("new"))
  }
}
