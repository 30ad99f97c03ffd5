package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{GraftCatalog, ManifestTable}

/** `CREATE TABLE graft.<name>` — the SQL bootstrap (r12 verdict gap
  * #1): a SQL-only user can now create, fill, alter, and query a
  * manifest table without ever touching the Scala API. Pins:
  * column-list CREATE with PARTITIONED BY (identity and hidden
  * transforms) and TBLPROPERTIES stats columns, stats collection
  * BEGINNING at the first insert (the config sidecar carries the set
  * across the empty-table gap), CTAS, CHECK constraints (parse-time
  * and enforce-time), IF NOT EXISTS, DROP TABLE's external-table
  * semantics, and the loud refusals. */
class SqlCreateTableSpec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_sqlct_$tag").toString + "/t"

  test("CREATE TABLE + INSERT + SELECT: full SQL lifecycle, stats begin at first insert") {
    val t = tmp("life")
    spark.sql(s"""CREATE TABLE graft.sqlct_life (
                 |  id BIGINT, grp STRING, price DOUBLE
                 |) PARTITIONED BY (grp, bucket(4, id))
                 |LOCATION '$t'
                 |TBLPROPERTIES ('graft.statsColumns' = 'id, price')""".stripMargin)
    try {
      assert(ManifestTable.currentVersion(spark, t) === 1,
        "CREATE must publish exactly one (empty) version")
      assert(ManifestTable.read(spark, t).count() === 0)
      assert(ManifestTable.partitionColumns(spark, t) === Seq("grp", "id_bucket"))
      assert(ManifestTable.partitionTransforms(spark, t)
        .map(pt => (pt.kind, pt.source, pt.n)) === Seq(("bucket", "id", 4L)))
      assert(ManifestTable.tableConfig(spark, t)
        .get("graft.statsColumns").contains("id, price"))
      spark.sql("""INSERT INTO graft.sqlct_life
                  |SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END,
                  |  id * 1.5D FROM range(100)""".stripMargin)
      assert(ManifestTable.currentVersion(spark, t) === 2)
      // the config sidecar carried the stats set across the empty gap:
      // the INSERT's files record id/price ranges without any caller
      // ever passing statsColumns
      val stats = ManifestTable.snapshotStats(spark, t)
      assert(stats.nonEmpty)
      assert(stats.values.forall(m => m.contains("id") && m.contains("price")),
        s"first INSERT must begin stats collection per TBLPROPERTIES, got ${stats.values.headOption}")
      val out = spark.sql(
        """SELECT grp, count(*) AS cnt, sum(price) AS sp
          |FROM graft.sqlct_life GROUP BY grp ORDER BY grp""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(out.toSeq === Seq(("a", 50L, 3675.0), ("b", 50L, 3750.0)))
    } finally GraftCatalog.unregister("sqlct_life")
  }

  test("IF NOT EXISTS adopts an existing table; plain CREATE refuses it") {
    val t = tmp("ine")
    spark.sql(s"CREATE TABLE graft.sqlct_ine (id BIGINT) LOCATION '$t'")
    try {
      val e = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.sqlct_ine (id BIGINT) LOCATION '$t'")
      }
      assert(e.getMessage.contains("already holds a table"))
      GraftCatalog.unregister("sqlct_ine")
      spark.sql(s"CREATE TABLE IF NOT EXISTS graft.sqlct_ine (id BIGINT) LOCATION '$t'")
      assert(ManifestTable.currentVersion(spark, t) === 1,
        "IF NOT EXISTS must adopt, not re-create")
      assert(GraftCatalog.lookup("sqlct_ine").contains(t))
    } finally GraftCatalog.unregister("sqlct_ine")
  }

  test("CTAS lays out and stats-tracks the query rows in one statement") {
    val t = tmp("ctas")
    spark.sql(s"""CREATE TABLE graft.sqlct_ctas
                 |PARTITIONED BY (grp)
                 |LOCATION '$t'
                 |TBLPROPERTIES ('graft.statsColumns' = 'id')
                 |AS SELECT id, CASE WHEN id % 3 = 0 THEN 'x' ELSE 'y' END AS grp
                 |FROM range(90)""".stripMargin)
    try {
      assert(ManifestTable.currentVersion(spark, t) === 1)
      assert(ManifestTable.partitionColumns(spark, t) === Seq("grp"))
      assert(ManifestTable.snapshotStats(spark, t).values
        .forall(_.contains("id")), "CTAS must collect the declared stats")
      assert(spark.sql("SELECT count(*) FROM graft.sqlct_ctas WHERE grp = 'x'")
        .collect().head.getLong(0) === 30L)
    } finally GraftCatalog.unregister("sqlct_ctas")
  }

  test("CHECK constraints attach at CREATE and refuse violating writes") {
    val t = tmp("chk")
    spark.sql(s"""CREATE TABLE graft.sqlct_chk (
                 |  id BIGINT, qty INT,
                 |  CONSTRAINT qty_pos CHECK (qty > 0)
                 |) LOCATION '$t'""".stripMargin)
    try {
      val e = intercept[Exception] {
        spark.sql("INSERT INTO graft.sqlct_chk VALUES (1, 0)")
      }
      assert(e.getMessage.contains("qty_pos"),
        s"violating INSERT must name the constraint: ${e.getMessage}")
      spark.sql("INSERT INTO graft.sqlct_chk VALUES (1, 5)")
      assert(ManifestTable.read(spark, t).count() === 1)
    } finally GraftCatalog.unregister("sqlct_chk")
  }

  test("a CTAS whose rows violate a declared CHECK refuses with zero bytes written") {
    // Spark's grammar has no CONSTRAINT clause on CTAS, so drive the
    // command directly — the pre-write validation must refuse BEFORE
    // any data lands (a refused create leaves nothing to vacuum)
    val t = tmp("chk2")
    import org.apache.spark.sql.functions.expr
    val q = spark.range(10).toDF("id").queryExecution.logical
    val e = intercept[Exception] {
      GraftCatalog.CreateCommand("graft.sqlct_chk2", "sqlct_chk2",
        new org.apache.spark.sql.types.StructType(), Nil, Some(t),
        Map.empty, Seq("all_small" -> "id < 5"), ignoreIfExists = false,
        query = Some(q)).run(spark)
    }
    assert(e.getMessage.contains("all_small"))
    assert(ManifestTable.versions(spark, t).isEmpty,
      "a refused CTAS must publish nothing")
    assert(!new java.io.File(t, "data").exists(),
      "a refused CTAS must write no data bytes")
    assert(GraftCatalog.lookup("sqlct_chk2").isEmpty)
  }

  test("DROP TABLE unregisters but never deletes; PURGE and missing names refuse") {
    val t = tmp("drop")
    spark.sql(s"CREATE TABLE graft.sqlct_drop (id BIGINT) LOCATION '$t'")
    spark.sql("INSERT INTO graft.sqlct_drop VALUES (7)")
    val purge = intercept[Exception] {
      spark.sql("DROP TABLE graft.sqlct_drop PURGE")
    }
    assert(purge.getMessage.contains("PURGE"))
    spark.sql("DROP TABLE graft.sqlct_drop")
    assert(GraftCatalog.lookup("sqlct_drop").isEmpty)
    // external-table semantics: every byte survives the DROP
    assert(ManifestTable.read(spark, t).collect().map(_.getLong(0)).toSeq === Seq(7L))
    val missing = intercept[Exception] {
      spark.sql("DROP TABLE graft.sqlct_drop")
    }
    assert(missing.getMessage.contains("no such registered table"))
    spark.sql("DROP TABLE IF EXISTS graft.sqlct_drop") // no-op, no error
  }

  test("racing CREATEs at the same fresh path produce exactly ONE v1 (no doubled CTAS rows)") {
    val t = tmp("race")
    val q = spark.range(5).toDF("id").queryExecution.logical
    def cmd = GraftCatalog.CreateCommand("graft.sqlct_race", "sqlct_race",
      new org.apache.spark.sql.types.StructType(), Nil, Some(t),
      Map.empty, Nil, ignoreIfExists = false, query = Some(q))
    // the interloper CREATE completes in full inside the loser's
    // commit window; the loser's txn gate must then adopt the winner's
    // v1 instead of appending a duplicate v2
    ManifestTable.beforeConditionalCommit = () => {
      ManifestTable.beforeConditionalCommit = () => ()
      cmd.run(spark); ()
    }
    try cmd.run(spark)
    finally {
      ManifestTable.beforeConditionalCommit = () => ()
      GraftCatalog.unregister("sqlct_race")
    }
    assert(ManifestTable.currentVersion(spark, t) === 1,
      "the CREATE race must resolve to exactly one version")
    assert(ManifestTable.read(spark, t).count() === 5,
      "the loser must never double-append the CTAS rows")
  }

  test("warehouse root resolves LOCATION-less creates; unset refuses loudly") {
    val w = java.nio.file.Files.createTempDirectory("graft_sqlct_wh").toString
    val prev = GraftCatalog.warehouse
    GraftCatalog.warehouse = None
    try {
      val e = intercept[Exception] {
        spark.sql("CREATE TABLE graft.sqlct_wh (id BIGINT)")
      }
      assert(e.getMessage.contains("LOCATION"))
      GraftCatalog.warehouse = Some(w)
      spark.sql("CREATE TABLE graft.sqlct_wh (id BIGINT)")
      assert(GraftCatalog.lookup("sqlct_wh").contains(s"$w/sqlct_wh"))
      assert(ManifestTable.currentVersion(spark, s"$w/sqlct_wh") === 1)
    } finally {
      GraftCatalog.warehouse = prev
      GraftCatalog.unregister("sqlct_wh")
    }
  }

  test("a shallow clone carries the table config: stats still begin at first insert") {
    val t = tmp("clcfg")
    spark.sql(s"""CREATE TABLE graft.sqlct_clcfg (id BIGINT, v DOUBLE)
                 |LOCATION '$t'
                 |TBLPROPERTIES ('graft.statsColumns' = 'id')""".stripMargin)
    try {
      val dst = tmp("clcfg2")
      ManifestTable.cloneShallow(spark, t, dst)
      assert(ManifestTable.tableConfig(spark, dst)
        .get("graft.statsColumns").contains("id"),
        "the clone must carry the donor's config sidecar")
      import spark.implicits._
      ManifestTable.commit(spark, dst, Seq((1L, 2.0)).toDF("id", "v"))
      // every ROW-BEARING file must carry id ranges (the CREATE's
      // zero-row file has no values to record a range of)
      val st = ManifestTable.snapshotStats(spark, dst)
      val rowBearing = st.values.filter(
        _.get("__graft_rows").exists(_._2 > 0))
      assert(rowBearing.nonEmpty && rowBearing.forall(_.contains("id")),
        s"the clone's first insert must begin stats collection per the carried config, got $st")
    } finally GraftCatalog.unregister("sqlct_clcfg")
  }

  test("SHOW CREATE TABLE round-trips: the emitted statement re-creates the table") {
    val t = tmp("sct")
    spark.sql(s"""CREATE TABLE graft.sqlct_sct (
                 |  id BIGINT, grp STRING, qty INT,
                 |  CONSTRAINT qty_pos CHECK (qty > 0)
                 |) PARTITIONED BY (grp, bucket(4, id))
                 |LOCATION '$t'
                 |TBLPROPERTIES ('graft.statsColumns' = 'id')""".stripMargin)
    try {
      val stmt = spark.sql("SHOW CREATE TABLE graft.sqlct_sct")
        .head.getString(0)
      assert(stmt.contains("id BIGINT") && stmt.contains("CONSTRAINT qty_pos") &&
        stmt.contains("PARTITIONED BY (grp, bucket(4, id))") &&
        stmt.contains("graft.statsColumns"), s"incomplete statement:\n$stmt")
      // the round-trip: run the emitted DDL at a fresh location under
      // a fresh name — the twin must carry the same logical face
      val t2 = tmp("sct2")
      val replay = stmt
        .replace("graft.sqlct_sct", "graft.sqlct_sct2")
        .replace(s"LOCATION '$t'", s"LOCATION '$t2'")
      spark.sql(replay)
      try {
        assert(ManifestTable.snapshotSchema(spark, t2).map(_.fieldNames.toSeq) ===
          ManifestTable.snapshotSchema(spark, t).map(_.fieldNames.toSeq))
        assert(ManifestTable.partitionColumns(spark, t2) ===
          ManifestTable.partitionColumns(spark, t))
        assert(ManifestTable.partitionTransforms(spark, t2)
          .map(pt => (pt.kind, pt.source, pt.n)) ===
          ManifestTable.partitionTransforms(spark, t)
            .map(pt => (pt.kind, pt.source, pt.n)))
        assert(ManifestTable.tableConfig(spark, t2)
          .get("graft.statsColumns").contains("id"))
        // the twin enforces the same CHECK
        val e = intercept[Exception](
          spark.sql("INSERT INTO graft.sqlct_sct2 VALUES (1, 'a', 0)"))
        assert(e.getMessage.contains("qty_pos"))
      } finally GraftCatalog.unregister("sqlct_sct2")
    } finally GraftCatalog.unregister("sqlct_sct")
    // after a rename, the emitted TBLPROPERTIES must not spell the
    // dead name — the replayed statement would refuse it
    val t3 = tmp("sct3")
    spark.sql(s"""CREATE TABLE graft.sqlct_sct3 (id BIGINT, v DOUBLE)
                 |LOCATION '$t3'
                 |TBLPROPERTIES ('graft.statsColumns' = 'v')""".stripMargin)
    try {
      ManifestTable.renameColumn(spark, t3, "v", "val")
      val renamedStmt = spark.sql("SHOW CREATE TABLE graft.sqlct_sct3")
        .head.getString(0)
      assert(!renamedStmt.contains("TBLPROPERTIES"),
        s"a stats config spelling only renamed columns must drop:\n$renamedStmt")
    } finally GraftCatalog.unregister("sqlct_sct3")
  }

  test("unsupported clauses refuse loudly: USING, TBLPROPERTIES, transforms, name clash") {
    val t = tmp("bad")
    val using = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.sqlct_bad (id BIGINT) USING parquet LOCATION '$t'")
    }
    assert(using.getMessage.contains("USING parquet"))
    val prop = intercept[Exception] {
      spark.sql(s"""CREATE TABLE graft.sqlct_bad (id BIGINT) LOCATION '$t'
                   |TBLPROPERTIES ('delta.appendOnly' = 'true')""".stripMargin)
    }
    assert(prop.getMessage.contains("delta.appendOnly"))
    val badProp = intercept[Exception] {
      spark.sql(s"""CREATE TABLE graft.sqlct_bad (id BIGINT) LOCATION '$t'
                   |TBLPROPERTIES ('graft.statsColumns' = 'nope')""".stripMargin)
    }
    assert(badProp.getMessage.contains("nope"))
    // a registered name pointing elsewhere is a conflict even with a
    // fresh location
    val t2 = tmp("bad2")
    GraftCatalog.register("sqlct_bad", t2)
    try {
      val clash = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.sqlct_bad (id BIGINT) LOCATION '$t'")
      }
      assert(clash.getMessage.contains("already registered"))
    } finally GraftCatalog.unregister("sqlct_bad")
    // nothing was created by any refusal
    assert(ManifestTable.versions(spark, t).isEmpty)
  }
}
