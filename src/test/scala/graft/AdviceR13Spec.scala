package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import graft.sources.{GraftCatalog, ManifestTable}

/** Pins the ADVICE r13 findings.
  *
  *  - mediums: the CREATE-race config hazard (a racing winner's
  *    published config must never be overwritten, and a loser must
  *    surface a typed adopt-or-refuse signal, not an opaque version
  *    check) and the clone debris sweep's blast radius (a winner whose
  *    COPIED INGEST LEDGERS and CONFIG SIDECAR were swept mid-publish
  *    must restore them after v1, exactly like its extern ledger);
  *  - lows: case-insensitive stats-column resolution on the write
  *    paths, NOT NULL columns refused at CREATE (recorded-but-
  *    unenforced clauses are lies), table + column COMMENTs surviving
  *    the SHOW CREATE round-trip, and torn-config reads made
  *    impossible by the atomic write-temp-then-link create. */
class AdviceR13Spec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_advr13_$tag").toString + "/t"

  private def mkTable(n: Int): String = {
    import spark.implicits._
    val t = tmp("tbl")
    ManifestTable.commit(spark, t,
      (0 until n).map(i => (i.toLong, i * 2.0)).toDF("id", "v"),
      SaveMode.Overwrite)
    t
  }

  // ---- medium 1: the CREATE-race config contract -------------------

  test("config on a published table: different props refuse (typed), identical props are idempotent") {
    val t = tmp("pub")
    spark.sql(s"""CREATE TABLE graft.advr13_pub (id BIGINT, v DOUBLE)
                 |LOCATION '$t'
                 |TBLPROPERTIES ('graft.statsColumns' = 'id')""".stripMargin)
    try {
      // a late loser with a DIFFERENT statement: typed refusal, and
      // the winner's config is untouched
      intercept[ManifestTable.ConcurrentCreateException] {
        ManifestTable.writeTableConfig(spark, t,
          Map("graft.statsColumns" -> "v"))
      }
      assert(ManifestTable.tableConfig(spark, t)
        .get("graft.statsColumns").contains("id"),
        "the published winner's config must never be overwritten")
      // a late loser replaying the IDENTICAL statement: idempotent
      ManifestTable.writeTableConfig(spark, t,
        Map("graft.statsColumns" -> "id"))
      assert(ManifestTable.tableConfig(spark, t)
        .get("graft.statsColumns").contains("id"))
    } finally GraftCatalog.unregister("advr13_pub")
  }

  test("a FRESH different config at a version-less path is a live racing CREATE: refused loudly") {
    val t = tmp("fresh")
    val mdir = java.nio.file.Paths.get(s"$t/_manifests")
    java.nio.file.Files.createDirectories(mdir)
    java.nio.file.Files.write(mdir.resolve("config.json"),
      """{"graft.statsColumns":"other"}""".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      ManifestTable.writeTableConfig(spark, t,
        Map("graft.statsColumns" -> "id"))
    }
    assert(e.getMessage.contains("racing") &&
      e.getMessage.contains("staleness"),
      s"refusal must name the race and the window: ${e.getMessage}")
    // the in-flight racer's config was NOT touched
    assert(ManifestTable.tableConfig(spark, t)
      .get("graft.statsColumns").contains("other"))
  }

  test("a STALE different config at a version-less path is crashed-CREATE debris: swept and replaced") {
    val t = tmp("stale")
    val mdir = java.nio.file.Paths.get(s"$t/_manifests")
    java.nio.file.Files.createDirectories(mdir)
    val cfg = mdir.resolve("config.json")
    java.nio.file.Files.write(cfg,
      """{"graft.statsColumns":"other"}""".getBytes("UTF-8"))
    cfg.toFile.setLastModified(
      System.currentTimeMillis() - ManifestTable.cloneDebrisStaleMs - 60000)
    ManifestTable.writeTableConfig(spark, t,
      Map("graft.statsColumns" -> "id"))
    assert(ManifestTable.tableConfig(spark, t)
      .get("graft.statsColumns").contains("id"),
      "stale debris must be swept and the new CREATE's config recorded")
  }

  test("two racing CREATEs with DIFFERENT properties: exactly one wins, its config survives, the loser is loud") {
    val t = tmp("race")
    val stmts = Seq("id" -> "advr13_race_a", "v" -> "advr13_race_b").map {
      case (col, name) =>
        () => spark.sql(
          s"""CREATE TABLE graft.$name (id BIGINT, v DOUBLE)
             |LOCATION '$t'
             |TBLPROPERTIES ('graft.statsColumns' = '$col')""".stripMargin)
    }
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val results = Await.result(
        Future.sequence(stmts.map(s => Future(scala.util.Try(s())))), 120.seconds)
      val failures = results.collect { case scala.util.Failure(e) => e }
      assert(failures.length === 1,
        s"exactly one racing CREATE must lose, got ${failures.length}")
      val root = Iterator.iterate(failures.head)(_.getCause)
        .takeWhile(_ != null).toSeq
      assert(root.exists(e => e.getMessage != null &&
        (e.getMessage.contains("concurrent CREATE") ||
          e.getMessage.contains("racing") ||
          e.getMessage.contains("different properties"))),
        s"the loser must fail on the race, not opaquely: ${failures.head}")
      // the survivor's config matches ITS statement — no silent merge
      assert(ManifestTable.currentVersion(spark, t) === 1)
      val winnerCol = ManifestTable.tableConfig(spark, t)("graft.statsColumns")
      assert(Set("id", "v").contains(winnerCol))
    } finally {
      GraftCatalog.unregister("advr13_race_a")
      GraftCatalog.unregister("advr13_race_b")
    }
  }

  // ---- medium 2: clone restores ALL swept sidecars after v1 --------

  test("a clone whose config + ingest ledgers were swept mid-publish restores them after v1") {
    import spark.implicits._
    val src = tmp("donor")
    spark.sql(s"""CREATE TABLE graft.advr13_donor (id BIGINT, v DOUBLE)
                 |LOCATION '$src'
                 |TBLPROPERTIES ('graft.statsColumns' = 'id')""".stripMargin)
    val land = java.nio.file.Files.createTempDirectory("graft_advr13_land")
    (1 to 8).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(land.toString + "/batch1")
    ManifestTable.copyInto(spark, src, land.toString + "/batch1")
    try {
      val dst = tmp("clone")
      val dmdir = java.nio.file.Paths.get(s"$dst/_manifests")
      ManifestTable.beforePublishLink = () => {
        // the racer's mis-judged sweep: externs, config AND the copied
        // ingest ledgers all vanish between our copies and our v1 link
        java.nio.file.Files.deleteIfExists(dmdir.resolve("externs.json"))
        java.nio.file.Files.deleteIfExists(dmdir.resolve("config.json"))
        val ing = dmdir.resolve("ingest")
        if (java.nio.file.Files.isDirectory(ing)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.list(ing).iterator().asScala.toSeq
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
        ()
      }
      try assert(ManifestTable.cloneShallow(spark, src, dst) === 1)
      finally ManifestTable.beforePublishLink = () => ()
      // every pure-function sidecar came back
      assert(ManifestTable.read(spark, dst).count() === 8,
        "extern resolution must survive the sweep")
      assert(ManifestTable.tableConfig(spark, dst)
        .get("graft.statsColumns").contains("id"),
        "the donor's config sidecar must be restored after v1")
      assert(ManifestTable.ingestLedgers(spark, dst,
        ManifestTable.currentVersion(spark, dst)).nonEmpty)
      // the restored COPY INTO memory really prevents double-ingest
      val again = ManifestTable.copyInto(spark, dst, land.toString + "/batch1")
      assert(again === -1 || ManifestTable.read(spark, dst).count() === 8,
        "a restored ledger must keep the already-ingested batch out")
    } finally GraftCatalog.unregister("advr13_donor")
  }

  // ---- low: case-insensitive stats-column resolution ---------------

  test("graft.statsColumns resolves case-insensitively on the write path") {
    val t = tmp("ci")
    spark.sql(s"""CREATE TABLE graft.advr13_ci (id BIGINT, price DOUBLE)
                 |LOCATION '$t'
                 |TBLPROPERTIES ('graft.statsColumns' = 'ID, Price')""".stripMargin)
    try {
      spark.sql(
        "INSERT INTO graft.advr13_ci SELECT id, id * 2.0D FROM range(50)")
      // CREATE's empty v1 writes a zero-row file with no column
      // stats — judge only the row-bearing files
      val stats = ManifestTable.snapshotStats(spark, t).values
        .filter(_.get("__graft_rows").exists(_._2 > 0))
      assert(stats.nonEmpty)
      assert(stats.forall(m => m.contains("id") && m.contains("price")),
        s"config names differing only in case must still begin stats " +
          s"collection, got ${stats.headOption}")
    } finally GraftCatalog.unregister("advr13_ci")
  }

  // ---- low: NOT NULL refused at CREATE ------------------------------

  test("CREATE TABLE refuses NOT NULL columns, pointing at CHECK") {
    val t = tmp("nn")
    val e = intercept[Exception] {
      spark.sql(s"""CREATE TABLE graft.advr13_nn (id BIGINT NOT NULL)
                   |LOCATION '$t'""".stripMargin)
    }
    assert(e.getMessage.contains("NOT NULL") &&
      e.getMessage.contains("CHECK"),
      s"refusal must point at the enforced alternative: ${e.getMessage}")
    assert(ManifestTable.versions(spark, t).isEmpty,
      "a refused CREATE must leave nothing on disk")
  }

  // ---- low: COMMENT round-trips through SHOW CREATE -----------------

  test("table and column COMMENTs survive the SHOW CREATE round-trip") {
    val t = tmp("cmt")
    spark.sql(s"""CREATE TABLE graft.advr13_cmt (
                 |  id BIGINT COMMENT 'the key',
                 |  v DOUBLE
                 |) COMMENT 'it\\'s a table'
                 |LOCATION '$t'""".stripMargin)
    try {
      val stmt = spark.sql("SHOW CREATE TABLE graft.advr13_cmt")
        .head.getString(0)
      assert(stmt.contains("COMMENT 'the key'"),
        s"column comment lost:\n$stmt")
      assert(stmt.contains("COMMENT 'it\\'s a table'"),
        s"table comment lost (escaping included):\n$stmt")
      // the emitted DDL replays — and the twin still carries both
      val t2 = tmp("cmt2")
      spark.sql(stmt.replace("graft.advr13_cmt", "graft.advr13_cmt2")
        .replace(s"LOCATION '$t'", s"LOCATION '$t2'"))
      try {
        val twin = spark.sql("SHOW CREATE TABLE graft.advr13_cmt2")
          .head.getString(0)
        assert(twin.contains("COMMENT 'the key'") &&
          twin.contains("COMMENT 'it\\'s a table'"))
      } finally GraftCatalog.unregister("advr13_cmt2")
    } finally GraftCatalog.unregister("advr13_cmt")
  }
}
