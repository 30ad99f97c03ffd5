package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.{GraftCatalog, ManifestTable}

/** The SQL maintenance surface (r13 verdict gap #3): OPTIMIZE /
  * VACUUM (via the injected GraftSqlParser — vanilla Spark has no
  * grammar for them), ALTER TABLE ADD/DROP CONSTRAINT, and ANALYZE
  * TABLE … FOR COLUMNS (the stats backfill). A SQL-only operator can
  * now create, load, mutate AND maintain a table. */
class SqlMaintenanceSpec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_sqlmnt_$tag").toString + "/t"

  private def mk(name: String, n: Int = 60, parts: Int = 6): String = {
    import spark.implicits._
    val t = tmp(name)
    ManifestTable.commit(spark, t,
      (1 to n).map(i => (i.toLong, i % 7, i * 1.5)).toDF("id", "grp", "price")
        .repartition(parts),
      SaveMode.Overwrite)
    GraftCatalog.register(name, t)
    t
  }

  test("OPTIMIZE bin-packs small files; the data is untouched") {
    val t = mk("opt", parts = 8)
    try {
      val before = ManifestTable.snapshotFiles(spark, t).size
      assert(before === 8)
      val sum0 = ManifestTable.read(spark, t).agg(sum("id")).head.getLong(0)
      val out = spark.sql("OPTIMIZE graft.opt").collect()
      assert(out.length === 1 && out.head.getString(1) === "compact-small")
      assert(ManifestTable.snapshotFiles(spark, t).size < before,
        "OPTIMIZE must collapse the small files")
      assert(ManifestTable.read(spark, t)
        .agg(sum("id")).head.getLong(0) === sum0)
      assert(ManifestTable.commitOp(spark, t).contains("compact-small"))
    } finally GraftCatalog.unregister("opt")
  }

  test("OPTIMIZE WHERE scopes the bin-pack to the predicate's files") {
    import spark.implicits._
    val t = tmp("optw")
    // two partitions, 4 small files each; the WHERE must touch ONE
    ManifestTable.commit(spark, t,
      (1 to 40).map(i => (i.toLong, i % 2)).toDF("id", "p")
        .repartition(4, col("id")),
      SaveMode.Overwrite, partitionBy = Seq("p"), statsColumns = Seq("id"))
    GraftCatalog.register("optw", t)
    try {
      val before = ManifestTable.snapshotFiles(spark, t)
      assert(before.count(_.contains("p=0")) === 4 &&
        before.count(_.contains("p=1")) === 4)
      val out = spark.sql("OPTIMIZE graft.optw WHERE p = 1").head
      assert(out.getString(1) === "compact-small(where p = 1)")
      val after = ManifestTable.snapshotFiles(spark, t)
      assert(after.count(_.contains("p=1")) === 1,
        s"the scoped partition must bin-pack: $after")
      assert(before.filter(_.contains("p=0")).forall(after.contains),
        "files outside the WHERE must not be touched")
      assert(ManifestTable.read(spark, t).count() === 40)
      // WHERE + ZORDER refuse with the rationale
      val e = intercept[Exception](spark.sql(
        "OPTIMIZE graft.optw WHERE p = 0 ZORDER BY (id)"))
      assert(e.getMessage.contains("don't compose"), e.getMessage)
    } finally GraftCatalog.unregister("optw")
  }

  test("OPTIMIZE ZORDER BY (x, y) rewrites z-clustered with stats on both dims") {
    val t = mk("optz", n = 4000, parts = 8)
    try {
      val sum0 = ManifestTable.read(spark, t).agg(sum("id")).head.getLong(0)
      val out = spark.sql("OPTIMIZE graft.optz ZORDER BY (grp, id)").collect()
      assert(out.head.getString(1) === "zorder(grp, id)")
      assert(ManifestTable.read(spark, t)
        .agg(sum("id")).head.getLong(0) === sum0, "rewrite must be lossless")
      // the clustered dimensions carry fresh ranges on every file
      val stats = ManifestTable.snapshotStats(spark, t).values
        .filter(_.get("__graft_rows").exists(_._2 > 0))
      assert(stats.nonEmpty &&
        stats.forall(m => m.contains("grp") && m.contains("id")),
        "ZORDER BY must record stats for its dimensions")
      assert(ManifestTable.commitOp(spark, t).contains("compact"))
      // >2 dims refuse with the clustering rationale
      val e = intercept[Exception](
        spark.sql("OPTIMIZE graft.optz ZORDER BY (grp, id, price)"))
      assert(e.getMessage.contains("2"), e.getMessage)
    } finally GraftCatalog.unregister("optz")
  }

  test("VACUUM RETAIN n VERSIONS: DRY RUN previews, the real one reclaims, no RETAIN refuses") {
    import spark.implicits._
    val t = mk("vac")
    try {
      // three rewrites leave two unreferenced uuid dirs
      spark.sql("INSERT OVERWRITE graft.vac SELECT id, 1, 9.9D FROM range(10)")
      spark.sql("INSERT OVERWRITE graft.vac SELECT id, 2, 1.1D FROM range(10)")
      val dataDirs = new java.io.File(t, "data").listFiles().length
      assert(dataDirs === 3)
      val dry = spark.sql("VACUUM graft.vac RETAIN 1 VERSIONS DRY RUN").head
      assert(dry.getInt(0) === 2 && dry.getLong(1) > 0L,
        s"preview must name the two dead dirs, got $dry")
      assert(new java.io.File(t, "data").listFiles().length === 3,
        "DRY RUN must delete nothing")
      val real = spark.sql("VACUUM graft.vac RETAIN 1 VERSIONS").head
      assert(real.getInt(0) === 2)
      assert(new java.io.File(t, "data").listFiles().length === 1,
        "VACUUM must reclaim the unreferenced dirs")
      assert(ManifestTable.read(spark, t).count() === 10)
      val e = intercept[Exception](spark.sql("VACUUM graft.vac"))
      assert(e.getMessage.contains("RETAIN"),
        s"a retention-less VACUUM must refuse loudly: ${e.getMessage}")
      // non-graft VACUUM stays with Spark's own parser (and its error)
      val e2 = intercept[Exception](spark.sql("VACUUM other.tbl"))
      assert(!e2.getMessage.contains("graft"), e2.getMessage)
    } finally GraftCatalog.unregister("vac")
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT: enforced immediately, dropped cleanly") {
    val t = mk("cons")
    try {
      spark.sql(
        "ALTER TABLE graft.cons ADD CONSTRAINT price_pos CHECK (price > 0)")
      assert(ManifestTable.checkConstraints(spark, t,
        ManifestTable.currentVersion(spark, t)).contains("price_pos"))
      val e = intercept[Exception](spark.sql(
        "INSERT INTO graft.cons VALUES (999, 1, -5.0)"))
      assert(e.getMessage.contains("price_pos"),
        s"the added CHECK must bind the next writer: ${e.getMessage}")
      // existing rows validate BEFORE the constraint publishes
      val e2 = intercept[Exception](spark.sql(
        "ALTER TABLE graft.cons ADD CONSTRAINT impossible CHECK (id > 100)"))
      assert(e2.getMessage.toLowerCase.contains("constraint") ||
        e2.getMessage.contains("id > 100"), e2.getMessage)
      // NOT ENFORCED is a lie the engine refuses to record
      val e3 = intercept[Exception](spark.sql(
        "ALTER TABLE graft.cons ADD CONSTRAINT lax CHECK (id > 0) NOT ENFORCED"))
      assert(e3.getMessage.contains("NOT ENFORCED"), e3.getMessage)
      spark.sql("ALTER TABLE graft.cons DROP CONSTRAINT price_pos")
      spark.sql("INSERT INTO graft.cons VALUES (999, 1, -5.0)")
      assert(ManifestTable.read(spark, t).filter(col("id") === 999).count() === 1)
      // IF EXISTS tolerates absence; a bare DROP refuses it
      spark.sql("ALTER TABLE graft.cons DROP CONSTRAINT IF EXISTS ghost")
      val e4 = intercept[Exception](
        spark.sql("ALTER TABLE graft.cons DROP CONSTRAINT ghost"))
      assert(e4.getMessage.contains("ghost"), e4.getMessage)
    } finally GraftCatalog.unregister("cons")
  }

  test("ANALYZE TABLE … FOR COLUMNS backfills skipping stats over old files") {
    import spark.implicits._
    val t = tmp("anl")
    // committed WITHOUT stats: no skipping power on any column
    ManifestTable.commit(spark, t,
      (1 to 40).map(i => (i.toLong, s"u$i")).toDF("id", "name")
        .repartitionByRange(4, col("id")), SaveMode.Overwrite)
    GraftCatalog.register("anl", t)
    try {
      assert(ManifestTable.snapshotStats(spark, t).values
        .forall(!_.contains("id")), "the drill needs stats-less files")
      val out = spark.sql(
        "ANALYZE TABLE graft.anl COMPUTE STATISTICS FOR COLUMNS id").head
      assert(out.getInt(0) === 2 && out.getString(1) === "id")
      val stats = ManifestTable.snapshotStats(spark, t)
      assert(stats.nonEmpty && stats.values.forall(m =>
        m.contains("id") && m.contains("__graft_nulls:id") &&
          m.contains("__graft_rows")),
        s"backfilled files must carry ranges + null counts + rows, got " +
          s"${stats.values.headOption}")
      // the backfilled ranges are REAL: a point read keeps only the
      // one range-partitioned file owning the value (10 of 40 rows)
      val hit = ManifestTable.readRange(spark, t, Seq(("id", 1.0, 1.0)))
      assert(hit.count() === 10)
      // FOR ALL COLUMNS covers the rest (string bounds included)
      spark.sql("ANALYZE TABLE graft.anl COMPUTE STATISTICS FOR ALL COLUMNS")
      assert(ManifestTable.snapshotStats(spark, t).values
        .forall(_.contains("name")))
      // from here on the tracked set sticks: a NEW insert records id
      // stats with zero caller cooperation
      spark.sql("INSERT INTO graft.anl VALUES (1000, 'x')")
      val newest = ManifestTable.snapshotStats(spark, t).values
        .filter(_.get("id").exists(_._2 === 1000.0))
      assert(newest.nonEmpty, "the analyzed set must bind later writers")
      // plain COMPUTE STATISTICS points at the FOR COLUMNS form
      val e = intercept[Exception](
        spark.sql("ANALYZE TABLE graft.anl COMPUTE STATISTICS"))
      assert(e.getMessage.contains("FOR COLUMNS"), e.getMessage)
      val e2 = intercept[Exception](spark.sql(
        "ANALYZE TABLE graft.anl COMPUTE STATISTICS FOR COLUMNS ghost"))
      assert(e2.getMessage.contains("ghost"), e2.getMessage)
    } finally GraftCatalog.unregister("anl")
  }

  test("VACUUM RETAIN n HOURS anchors the window; SET TBLPROPERTIES refuses with the evolution paths") {
    val t = mk("vach")                                            // v1
    try {
      spark.sql("INSERT OVERWRITE graft.vach SELECT id, 1, 2.0D FROM range(8)") // v2
      spark.sql("INSERT OVERWRITE graft.vach SELECT id, 2, 3.0D FROM range(8)") // v3
      // every commit is seconds old: a 1000-hour window keeps all
      // three versions and reclaims nothing
      val wide = spark.sql(
        "VACUUM graft.vach RETAIN 1000 HOURS DRY RUN").head
      assert(wide.getInt(0) === 0, s"nothing is outside a wide window: $wide")
      // a zero-hour window keeps just the head: two dirs die
      val zero = spark.sql("VACUUM graft.vach RETAIN 0 HOURS DRY RUN").head
      assert(zero.getInt(0) === 2, s"0 HOURS must orphan both old dirs: $zero")
      spark.sql("VACUUM graft.vach RETAIN 0 HOURS").collect()
      assert(ManifestTable.versions(spark, t) === Seq(3))
      assert(ManifestTable.read(spark, t).count() === 8)
      // negative hours never parse; VERSIONS still requires >= 1
      intercept[Exception](
        spark.sql("VACUUM graft.vach RETAIN 0 VERSIONS"))
      // SET/UNSET TBLPROPERTIES refuse naming the evolution paths
      val e = intercept[Exception](spark.sql(
        "ALTER TABLE graft.vach SET TBLPROPERTIES ('graft.statsColumns'='id')"))
      assert(e.getMessage.contains("ANALYZE"), e.getMessage)
      val e2 = intercept[Exception](spark.sql(
        "ALTER TABLE graft.vach UNSET TBLPROPERTIES ('graft.statsColumns')"))
      assert(e2.getMessage.contains("do not mutate in place"), e2.getMessage)
    } finally GraftCatalog.unregister("vach")
  }

  test("SHOW PARTITIONS: the O(metadata) census, honest across a partition evolution") {
    import spark.implicits._
    val t = tmp("shp")
    ManifestTable.commit(spark, t,
      (1 to 30).map(i => (i.toLong, i % 3)).toDF("id", "p"),
      SaveMode.Overwrite, partitionBy = Seq("p"), statsColumns = Seq("id"))
    GraftCatalog.register("shp", t)
    try {
      val rows = spark.sql("SHOW PARTITIONS graft.shp").collect()
        .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
      assert(rows.keySet === Set("p=0", "p=1", "p=2"))
      assert(rows.values.map(_._2).sum === 30, s"recorded rows: $rows")
      // evolution to flat: new files land dir-less and report honestly
      ManifestTable.setPartitionSpec(spark, t, Nil)
      ManifestTable.commit(spark, t,
        (31 to 35).map(i => (i.toLong, 9)).toDF("id", "p"))
      val mixed = spark.sql("SHOW PARTITIONS graft.shp").collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(mixed("<unpartitioned>") === 5, s"got $mixed")
      assert(mixed.filterNot(_._1 == "<unpartitioned>").values.sum === 30)
      // a never-partitioned table refuses, like Spark's own statement
      val t2 = tmp("shp2")
      ManifestTable.commit(spark, t2, Seq((1L, 1)).toDF("id", "p"))
      GraftCatalog.register("shp2", t2)
      try {
        val e = intercept[Exception](
          spark.sql("SHOW PARTITIONS graft.shp2").collect())
        assert(e.getMessage.contains("not partitioned"), e.getMessage)
      } finally GraftCatalog.unregister("shp2")
    } finally GraftCatalog.unregister("shp")
  }

  test("DESCRIBE HISTORY and DESCRIBE DETAIL: the audit trail and the one-row identity") {
    val t = mk("ddh", parts = 3)
    try {
      spark.sql("INSERT INTO graft.ddh SELECT id, 1, 2.0D FROM range(5)")
      spark.sql("DELETE FROM graft.ddh WHERE id > 58")
      val hist = spark.sql("DESCRIBE HISTORY graft.ddh").collect()
      assert(hist.length === 3, s"three versions, three rows: ${hist.length}")
      val ops = hist.map(r => r.getAs[String]("op")).toSeq
      assert(ops.contains("append") && ops.contains("delete"), ops.mkString(","))
      val detail = spark.sql("DESCRIBE DETAIL graft.ddh").head
      assert(detail.getAs[String]("format") === "graft")
      assert(detail.getAs[String]("name") === "graft.ddh")
      assert(detail.getAs[String]("location") === t)
      assert(detail.getAs[Int]("version") === 3)
      assert(detail.getAs[Int]("num_files") ===
        ManifestTable.snapshotFiles(spark, t).size)
      assert(detail.getAs[Long]("size_in_bytes") > 0L)
      val e = intercept[Exception](
        spark.sql("DESCRIBE DETAIL graft.ghost_dd").collect())
      assert(e.getMessage.contains("no such registered table"))
    } finally GraftCatalog.unregister("ddh")
  }

  test("COPY INTO ingests a landing zone idempotently through SQL") {
    import spark.implicits._
    val t = tmp("cpt")
    val landing = java.nio.file.Files
      .createTempDirectory("graft_sqlmnt_landing").toString
    try {
      spark.sql(s"CREATE TABLE graft.cpt (id BIGINT, v DOUBLE) LOCATION '$t'")
      (1 to 20).map(i => (i.toLong, i * 0.5)).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(landing)
      val out = spark.sql(
        s"COPY INTO graft.cpt FROM '$landing' FILEFORMAT = PARQUET").head
      assert(out.getString(1) === "copy-into(parquet)")
      assert(spark.sql("SELECT count(*) FROM graft.cpt").head.getLong(0) === 20)
      val v = ManifestTable.currentVersion(spark, t)
      // exact re-run: nothing fresh, no new version
      spark.sql(s"COPY INTO graft.cpt FROM '$landing' FILEFORMAT = PARQUET")
        .collect()
      assert(ManifestTable.currentVersion(spark, t) === v,
        "an exact COPY INTO re-run must be a no-op")
      // a new landing file ingests alone
      (21 to 25).map(i => (i.toLong, i * 0.5)).toDF("id", "v")
        .coalesce(1).write.mode("append").parquet(landing)
      spark.sql(s"COPY INTO graft.cpt FROM '$landing' FILEFORMAT = PARQUET")
        .collect()
      assert(spark.sql("SELECT count(*) FROM graft.cpt").head.getLong(0) === 25)
      // format-less refusal names the clause
      val e = intercept[Exception](
        spark.sql(s"COPY INTO graft.cpt FROM '$landing'"))
      assert(e.getMessage.contains("FILEFORMAT"), e.getMessage)
    } finally GraftCatalog.unregister("cpt")
  }

  test("INSERT INTO … REPLACE WHERE swaps exactly the predicate region in ONE version") {
    val t = mk("rpw", n = 40)                                   // v1: grp 0..6
    try {
      val v1 = ManifestTable.currentVersion(spark, t)
      // reload region grp=2 (ids 2,9,16,23,30,37 → 6 rows) with 3 rows
      spark.sql("""INSERT INTO graft.rpw REPLACE WHERE grp = 2
                  |SELECT id + 100 AS id, 2 AS grp, 9.9D AS price FROM range(3)""".stripMargin)
      assert(ManifestTable.currentVersion(spark, t) === v1 + 1,
        "replace must land as ONE version")
      val out = spark.sql(
        "SELECT grp, count(*) AS n FROM graft.rpw GROUP BY grp ORDER BY grp")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(out(2) === 3, s"the region must equal the batch, got $out")
      assert(out.filterNot(_._1 == 2) ===
        Map(0 -> 5, 1 -> 6, 3 -> 6, 4 -> 6, 5 -> 6, 6 -> 5),
        "rows outside the region must be untouched")
      assert(spark.sql("SELECT min(id) FROM graft.rpw WHERE grp = 2")
        .head.getLong(0) === 100L)
      // out-of-region batch rows refuse before anything is written
      val vNow = ManifestTable.currentVersion(spark, t)
      val e = intercept[Exception](spark.sql(
        """INSERT INTO graft.rpw REPLACE WHERE grp = 3
          |SELECT id, 4 AS grp, 1.0D AS price FROM range(2)""".stripMargin))
      assert(e.getMessage.contains("OUTSIDE the predicate region"),
        e.getMessage)
      assert(ManifestTable.currentVersion(spark, t) === vNow,
        "a refused replace must leave no version behind")
      // idempotence: the exact statement re-run converges to the
      // same logical image
      spark.sql("""INSERT INTO graft.rpw REPLACE WHERE grp = 2
                  |SELECT id + 100 AS id, 2 AS grp, 9.9D AS price FROM range(3)""".stripMargin)
      assert(spark.sql("SELECT count(*) FROM graft.rpw WHERE grp = 2")
        .head.getLong(0) === 3)
    } finally GraftCatalog.unregister("rpw")
  }

  test("TRUNCATE TABLE is a full-delete commit; history stays; PARTITION form refuses") {
    val t = mk("trc", n = 30)
    try {
      spark.sql("TRUNCATE TABLE graft.trc")
      assert(spark.sql("SELECT count(*) FROM graft.trc").head.getLong(0) === 0)
      assert(ManifestTable.read(spark, t, 1).count() === 30,
        "time travel must still see the pre-truncate rows")
      // appends keep working against the recorded schema
      spark.sql("INSERT INTO graft.trc SELECT id, 1, 2.0D FROM range(3)")
      assert(spark.sql("SELECT count(*) FROM graft.trc").head.getLong(0) === 3)
      val e = intercept[Exception](
        spark.sql("TRUNCATE TABLE graft.trc PARTITION (grp = 1)"))
      assert(e.getMessage.contains("DELETE FROM"), e.getMessage)
    } finally GraftCatalog.unregister("trc")
  }

  test("RESTORE TABLE TO VERSION AS OF rolls the head back as a NEW commit") {
    val t = mk("rst")                                   // v1: ids 1..60
    try {
      val sum1 = ManifestTable.read(spark, t).agg(sum("id")).head.getLong(0)
      spark.sql("INSERT OVERWRITE graft.rst SELECT id, 9, 0.0D FROM range(5)") // v2
      spark.sql("DELETE FROM graft.rst WHERE id >= 3")                         // v3
      assert(ManifestTable.read(spark, t).count() === 3)
      val out = spark.sql(
        "RESTORE TABLE graft.rst TO VERSION AS OF 1").collect()
      assert(out.length === 1 && out.head.getInt(0) === 4 &&
        out.head.getString(1) === "restore-1", out.mkString)
      // the head is v1's image again — and history is PRESERVED, not
      // rewritten: time travel still sees the overwrite and delete
      assert(ManifestTable.read(spark, t)
        .agg(sum("id")).head.getLong(0) === sum1)
      assert(ManifestTable.read(spark, t, 3).count() === 3)
      assert(ManifestTable.commitOp(spark, t).contains("restore"))
      // restoring to the current head is a reported no-op, not a
      // duplicate commit
      val noop = spark.sql("RESTORE graft.rst TO VERSION AS OF 4").head
      assert(noop.getString(1) === "noop-restore-4")
      assert(ManifestTable.currentVersion(spark, t) === 4)
      // a target-less RESTORE names the required clause
      val e = intercept[Exception](spark.sql("RESTORE TABLE graft.rst"))
      assert(e.getMessage.contains("TO VERSION AS OF"), e.getMessage)
      val e2 = intercept[Exception](
        spark.sql("RESTORE TABLE graft.ghost_rst TO VERSION AS OF 1"))
      assert(e2.getMessage.contains("no such registered table"))
    } finally GraftCatalog.unregister("rst")
  }

  test("RESTORE TO TIMESTAMP AS OF lands on the same version the read-side travel picks") {
    val t = mk("rstts")                                  // v1
    try {
      Thread.sleep(5)
      val cut = new java.sql.Timestamp(System.currentTimeMillis())
      Thread.sleep(5)
      spark.sql("INSERT OVERWRITE graft.rstts SELECT id, 1, 1.0D FROM range(4)") // v2
      val expect = ManifestTable.versionAsOf(spark, t, cut.getTime)
      assert(expect === 1)
      val out = spark.sql(
        s"RESTORE TABLE graft.rstts TO TIMESTAMP AS OF '$cut'").head
      assert(out.getString(1) === s"restore-$expect")
      assert(ManifestTable.read(spark, t).count() === 60)
      val e = intercept[Exception](spark.sql(
        "RESTORE graft.rstts TO TIMESTAMP AS OF 'not a time'"))
      assert(e.getMessage.contains("not a timestamp"), e.getMessage)
    } finally GraftCatalog.unregister("rstts")
  }

  test("CREATE TABLE … SHALLOW CLONE branches zero-copy; writes stay on the clone") {
    val t = mk("cln_src")                                // v1: 60 rows
    val dst = tmp("cln_dst")
    try {
      spark.sql("INSERT INTO graft.cln_src SELECT id + 100, 1, 2.0D FROM range(10)") // v2: 70
      val out = spark.sql("CREATE TABLE graft.cln_dst SHALLOW CLONE " +
        s"graft.cln_src LOCATION '$dst'").collect()
      assert(out.length === 1 && out.head.getInt(0) === 1 &&
        out.head.getString(1) === "shallow-clone(cln_src@head)", out.mkString)
      assert(spark.sql("SELECT count(*) AS n FROM graft.cln_dst")
        .head.getLong(0) === 70)
      // zero-copy: the clone's own data dir holds no donor bytes
      assert(!new java.io.File(dst, "data").exists() ||
        new java.io.File(dst, "data").listFiles().isEmpty)
      // writes diverge: the clone grows, the donor doesn't
      spark.sql("INSERT INTO graft.cln_dst SELECT id + 500, 2, 3.0D FROM range(5)")
      assert(spark.sql("SELECT count(*) FROM graft.cln_dst").head.getLong(0) === 75)
      assert(spark.sql("SELECT count(*) FROM graft.cln_src").head.getLong(0) === 70)
      // re-running without IF NOT EXISTS refuses; with it, adopts
      val e = intercept[Exception](spark.sql(
        s"CREATE TABLE graft.cln_dst SHALLOW CLONE graft.cln_src LOCATION '$dst'"))
      assert(e.getMessage.contains("already holds a table"), e.getMessage)
      spark.sql("CREATE TABLE IF NOT EXISTS graft.cln_dst SHALLOW CLONE " +
        s"graft.cln_src LOCATION '$dst'")
      assert(spark.sql("SELECT count(*) FROM graft.cln_dst").head.getLong(0) === 75)
      // DEEP CLONE refuses at parse time, naming the honest spelling
      val e2 = intercept[Exception](spark.sql(
        "CREATE TABLE graft.cln_deep DEEP CLONE graft.cln_src"))
      assert(e2.getMessage.contains("AS SELECT"), e2.getMessage)
    } finally {
      GraftCatalog.unregister("cln_src"); GraftCatalog.unregister("cln_dst")
    }
  }

  test("SHALLOW CLONE VERSION AS OF branches a historical snapshot") {
    val t = mk("clnv_src", n = 20)                       // v1: 20 rows
    val dst = tmp("clnv_dst")
    try {
      spark.sql("DELETE FROM graft.clnv_src WHERE id > 5")  // v2: 5 rows
      val out = spark.sql("CREATE TABLE graft.clnv_dst SHALLOW CLONE " +
        s"graft.clnv_src VERSION AS OF 1 LOCATION '$dst'").head
      assert(out.getString(1) === "shallow-clone(clnv_src@v1)")
      assert(spark.sql("SELECT count(*) FROM graft.clnv_dst")
        .head.getLong(0) === 20, "the clone is v1's image, pre-delete")
      assert(spark.sql("SELECT count(*) FROM graft.clnv_src")
        .head.getLong(0) === 5, "the donor keeps its own head")
    } finally {
      GraftCatalog.unregister("clnv_src"); GraftCatalog.unregister("clnv_dst")
    }
  }
}
