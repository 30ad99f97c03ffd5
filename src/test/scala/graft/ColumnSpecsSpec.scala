package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import graft.sources.{ColumnSpecs, GraftCatalog, ManifestTable}

/** Column write specs (r16): DEFAULT values, GENERATED ALWAYS AS
  * expressions, and IDENTITY columns — recorded as field metadata in
  * the versioned schema, filled/enforced by the SQL INSERT path,
  * recomputed by UPDATE, and (identity) high-water-mark-synced at
  * publish from the write's own recorded stats. */
class ColumnSpecsSpec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cspec_$tag").toString + "/t"

  private def withTable(name: String, ddl: String)(body: String => Unit): Unit = {
    val t = tmp(name)
    spark.sql(ddl.replace("__LOC__", t))
    try body(t) finally GraftCatalog.unregister(name)
  }

  // ---- DEFAULT ------------------------------------------------------

  test("column-list INSERT fills omitted DEFAULT columns; positional supplies them") {
    withTable("cs_def",
      """CREATE TABLE graft.cs_def (
        |  id BIGINT, status STRING DEFAULT 'open', score DOUBLE DEFAULT 1.5
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.sql("INSERT INTO graft.cs_def (id) VALUES (1)")
      spark.sql("INSERT INTO graft.cs_def (id, status) VALUES (2, 'closed')")
      spark.sql("INSERT INTO graft.cs_def VALUES (3, 'x', 9.0)")
      val got = ManifestTable.read(spark, t).collect()
        .map(r => (r.getAs[Long]("id"),
          (r.getAs[String]("status"), r.getAs[Double]("score")))).toMap
      assert(got === Map(
        1L -> ("open", 1.5), 2L -> ("closed", 1.5), 3L -> ("x", 9.0)))
    }
  }

  test("BY NAME INSERT fills omitted DEFAULT columns") {
    withTable("cs_defbn",
      """CREATE TABLE graft.cs_defbn (
        |  id BIGINT, status STRING DEFAULT 'open'
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.sql("INSERT INTO graft.cs_defbn BY NAME SELECT 7L AS id")
      assert(ManifestTable.read(spark, t).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("status")))
        .toSet === Set((7L, "open")))
    }
  }

  test("omitting a column WITHOUT a spec refuses with guidance") {
    withTable("cs_nodef",
      """CREATE TABLE graft.cs_nodef (
        |  id BIGINT, v DOUBLE, status STRING DEFAULT 'open'
        |) LOCATION '__LOC__'""".stripMargin) { _ =>
      val e = intercept[Exception] {
        spark.sql("INSERT INTO graft.cs_nodef (id) VALUES (1)") }
      assert(e.getMessage.contains("omits") && e.getMessage.contains("v"),
        e.getMessage)
    }
  }

  test("bad DEFAULT expressions refuse at CREATE") {
    // non-casting value
    val e1 = intercept[Exception] { spark.sql(
      s"CREATE TABLE graft.cs_bad1 (n INT DEFAULT 'abc') LOCATION '${tmp("b1")}'") }
    assert(e1.getMessage.contains("DEFAULT"), e1.getMessage)
    // a column reference
    val e2 = intercept[Exception] { spark.sql(
      s"CREATE TABLE graft.cs_bad2 (a INT, b INT DEFAULT a + 1) LOCATION '${tmp("b2")}'") }
    assert(e2.getMessage.contains("column-free"), e2.getMessage)
    // a subquery
    val e3 = intercept[Exception] { spark.sql(
      s"CREATE TABLE graft.cs_bad3 (a INT DEFAULT (SELECT 1)) LOCATION '${tmp("b3")}'") }
    assert(e3.getMessage.contains("subquer"), e3.getMessage)
    Seq("cs_bad1", "cs_bad2", "cs_bad3").foreach(GraftCatalog.unregister)
  }

  test("a niladic non-deterministic DEFAULT (current_timestamp) re-evaluates per insert") {
    withTable("cs_now",
      """CREATE TABLE graft.cs_now (
        |  id BIGINT, at TIMESTAMP DEFAULT current_timestamp()
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.sql("INSERT INTO graft.cs_now (id) VALUES (1)")
      val at = ManifestTable.read(spark, t).collect()(0).getAs[java.sql.Timestamp]("at")
      assert(at != null, "the default must evaluate to a real timestamp")
    }
  }

  test("ALTER COLUMN SET DEFAULT binds future inserts; DROP DEFAULT re-refuses omission") {
    withTable("cs_alt",
      """CREATE TABLE graft.cs_alt (
        |  id BIGINT, status STRING DEFAULT 'open'
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.sql("INSERT INTO graft.cs_alt (id) VALUES (1)")
      spark.sql("ALTER TABLE graft.cs_alt ALTER COLUMN status SET DEFAULT 'held'")
      // metadata-only: the edit spent one version, moved zero data
      assert(ManifestTable.commitOp(spark, t).contains("set-default"))
      spark.sql("INSERT INTO graft.cs_alt (id) VALUES (2)")
      val got = ManifestTable.read(spark, t).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toMap
      assert(got === Map(1L -> "open", 2L -> "held"))
      spark.sql("ALTER TABLE graft.cs_alt ALTER COLUMN status DROP DEFAULT")
      val e = intercept[Exception] {
        spark.sql("INSERT INTO graft.cs_alt (id) VALUES (3)") }
      assert(e.getMessage.contains("omits"), e.getMessage)
    }
  }

  test("the DEFAULT keyword works in VALUES rows and UPDATE SET") {
    withTable("cs_kw",
      """CREATE TABLE graft.cs_kw (
        |  id BIGINT, status STRING DEFAULT 'open', v DOUBLE
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      // positional VALUES with the keyword in the defaulted slot
      spark.sql("INSERT INTO graft.cs_kw VALUES (1, DEFAULT, 1.5)")
      // column-list VALUES, keyword + mixed explicit rows
      spark.sql(
        "INSERT INTO graft.cs_kw (id, status, v) VALUES (2, DEFAULT, 2.5), (3, 'x', 3.5)")
      val got = ManifestTable.read(spark, t).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toMap
      assert(got === Map(1L -> "open", 2L -> "open", 3L -> "x"))
      // SET c = DEFAULT re-applies the CURRENT recorded default
      spark.sql("ALTER TABLE graft.cs_kw ALTER COLUMN status SET DEFAULT 'held'")
      spark.sql("UPDATE graft.cs_kw SET status = DEFAULT WHERE id = 3")
      assert(ManifestTable.read(spark, t).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[String]("status")).toMap
        === Map(1L -> "open", 2L -> "open", 3L -> "held"))
      // keyword on a column without a DEFAULT refuses
      val e1 = intercept[Exception] {
        spark.sql("UPDATE graft.cs_kw SET v = DEFAULT WHERE id = 1") }
      assert(e1.getMessage.contains("records no DEFAULT"), e1.getMessage)
      val e2 = intercept[Exception] {
        spark.sql("INSERT INTO graft.cs_kw VALUES (4, 'y', DEFAULT)") }
      assert(e2.getMessage.contains("records no DEFAULT"), e2.getMessage)
    }
  }

  // REWRITTEN r17: ADD COLUMNS … DEFAULT now has the exists-default
  // read path (ExistsDefaultSpec owns the deep drills) — the r16
  // refusal pin becomes the new contract's smoke + the surviving
  // nested-field refusal.
  test("ADD COLUMNS with DEFAULT records the exists fill; nested stays refused") {
    withTable("cs_addd",
      "CREATE TABLE graft.cs_addd (id BIGINT) LOCATION '__LOC__'") { _ =>
      spark.sql("INSERT INTO graft.cs_addd VALUES (1)")
      spark.sql("ALTER TABLE graft.cs_addd ADD COLUMNS (s STRING DEFAULT 'x')")
      assert(spark.sql("SELECT s FROM graft.cs_addd").head().getString(0)
        == "x", "the pre-add row must surface the exists fill")
      spark.sql("ALTER TABLE graft.cs_addd ADD COLUMNS (st STRUCT<a: INT>)")
      val e = intercept[Exception] { spark.sql(
        "ALTER TABLE graft.cs_addd ADD COLUMNS (st.b INT DEFAULT 7)") }
      assert(e.getMessage.contains("top-level"), e.getMessage)
    }
  }

  // ---- GENERATED ALWAYS AS -------------------------------------------

  test("omitted GENERATED column computes; supplied values are equality-enforced") {
    withTable("cs_gen",
      """CREATE TABLE graft.cs_gen (
        |  a BIGINT, b BIGINT, total BIGINT GENERATED ALWAYS AS (a + b)
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.sql("INSERT INTO graft.cs_gen (a, b) VALUES (1, 2)")
      // supplied and CORRECT — passes the null-safe equality gate
      spark.sql("INSERT INTO graft.cs_gen VALUES (10, 20, 30)")
      val got = ManifestTable.read(spark, t).collect()
        .map(r => r.getAs[Long]("a") -> r.getAs[Long]("total")).toMap
      assert(got === Map(1L -> 3L, 10L -> 30L))
      // supplied and WRONG — refused, nothing written
      val v = ManifestTable.currentVersion(spark, t)
      val e = intercept[Exception] {
        spark.sql("INSERT INTO graft.cs_gen VALUES (5, 5, 11)") }
      assert(e.getMessage.contains("disagree"), e.getMessage)
      assert(ManifestTable.currentVersion(spark, t) == v,
        "a refused batch must publish nothing")
    }
  }

  test("GENERATED expression discipline at CREATE") {
    // referencing another GENERATED column
    val e1 = intercept[Exception] { spark.sql(
      s"""CREATE TABLE graft.cs_g1 (a BIGINT,
         |  b BIGINT GENERATED ALWAYS AS (a + 1),
         |  c BIGINT GENERATED ALWAYS AS (b + 1)) LOCATION '${tmp("g1")}'""".stripMargin) }
    assert(e1.getMessage.contains("GENERATED"), e1.getMessage)
    // non-deterministic
    val e2 = intercept[Exception] { spark.sql(
      s"""CREATE TABLE graft.cs_g2 (a BIGINT,
         |  r DOUBLE GENERATED ALWAYS AS (rand())) LOCATION '${tmp("g2")}'""".stripMargin) }
    assert(e2.getMessage.contains("non-deterministic"), e2.getMessage)
    // unknown column
    val e3 = intercept[Exception] { spark.sql(
      s"""CREATE TABLE graft.cs_g3 (a BIGINT,
         |  b BIGINT GENERATED ALWAYS AS (zz + 1)) LOCATION '${tmp("g3")}'""".stripMargin) }
    assert(e3.getMessage.contains("analysis refused"), e3.getMessage)
    Seq("cs_g1", "cs_g2", "cs_g3").foreach(GraftCatalog.unregister)
  }

  test("UPDATE recomputes GENERATED columns from the post-assignment row") {
    withTable("cs_genu",
      """CREATE TABLE graft.cs_genu (
        |  a BIGINT, b BIGINT, total BIGINT GENERATED ALWAYS AS (a + b)
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.sql("INSERT INTO graft.cs_genu (a, b) VALUES (1, 2), (10, 20)")
      spark.sql("UPDATE graft.cs_genu SET b = b * 100 WHERE a = 1")
      val got = ManifestTable.read(spark, t).collect()
        .map(r => r.getAs[Long]("a") -> r.getAs[Long]("total")).toMap
      assert(got === Map(1L -> 201L, 10L -> 30L),
        "the generated column must recompute over the POST-image")
      val e = intercept[Exception] {
        spark.sql("UPDATE graft.cs_genu SET total = 0 WHERE a = 1") }
      assert(e.getMessage.contains("recomputes"), e.getMessage)
    }
  }

  // ---- IDENTITY -------------------------------------------------------

  test("IDENTITY allocates unique values and the mark advances across inserts") {
    withTable("cs_id",
      """CREATE TABLE graft.cs_id (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
        |  v BIGINT
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.range(0, 1000, 1, 7).createOrReplaceTempView("cs_id_src")
      spark.sql("INSERT INTO graft.cs_id (v) SELECT id FROM cs_id_src")
      val ids1 = ManifestTable.read(spark, t).collect().map(_.getAs[Long]("id"))
      assert(ids1.length == 1000 && ids1.distinct.length == 1000,
        "identity values must be unique")
      assert(ids1.min == 10L, "the first allocation starts at START WITH")
      assert(ids1.forall(i => (i - 10L) % 2 == 0), "values follow the step")
      // tight-gap interleave: 1000 rows over 7 partitions allocate
      // ordinals <= ceil(1000/7)*7 = 1001
      assert(ids1.max <= 10L + 2L * 1001L, s"gap too large: ${ids1.max}")
      spark.sql("INSERT INTO graft.cs_id (v) SELECT id FROM cs_id_src LIMIT 10")
      val ids2 = ManifestTable.read(spark, t).collect().map(_.getAs[Long]("id"))
      assert(ids2.distinct.length == 1010, "the second batch must not collide")
      assert(ids2.sorted.takeRight(10).min > ids1.max,
        "the high-water mark must advance past the first batch")
    }
  }

  test("GENERATED ALWAYS AS IDENTITY refuses explicit values; positional skips it") {
    withTable("cs_ida",
      """CREATE TABLE graft.cs_ida (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY, v BIGINT
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      // positional insert supplies only the non-identity columns
      spark.sql("INSERT INTO graft.cs_ida VALUES (100), (200)")
      assert(ManifestTable.read(spark, t).collect()
        .map(_.getAs[Long]("id")).distinct.length == 2)
      val e = intercept[Exception] {
        spark.sql("INSERT INTO graft.cs_ida (id, v) VALUES (1, 1)") }
      assert(e.getMessage.contains("GENERATED ALWAYS AS IDENTITY"), e.getMessage)
      val e2 = intercept[Exception] {
        spark.sql("UPDATE graft.cs_ida SET id = 0 WHERE v = 100") }
      assert(e2.getMessage.contains("cannot be assigned"), e2.getMessage)
    }
  }

  test("GENERATED BY DEFAULT accepts explicit values and self-syncs the mark") {
    withTable("cs_idd",
      """CREATE TABLE graft.cs_idd (
        |  id BIGINT GENERATED BY DEFAULT AS IDENTITY, v BIGINT
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.sql("INSERT INTO graft.cs_idd (id, v) VALUES (5000, 1)")
      spark.sql("INSERT INTO graft.cs_idd (v) VALUES (2)")
      val ids = ManifestTable.read(spark, t).collect().map(_.getAs[Long]("id"))
      assert(ids.contains(5000L))
      assert(ids.filterNot(_ == 5000L).forall(_ > 5000L),
        s"allocation must resume past the explicit value, got ${ids.toSeq}")
    }
  }

  test("descending IDENTITY (negative step) allocates downward") {
    withTable("cs_idn",
      """CREATE TABLE graft.cs_idn (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 0 INCREMENT BY -5),
        |  v BIGINT
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.sql("INSERT INTO graft.cs_idn (v) VALUES (1), (2), (3)")
      val a = ManifestTable.read(spark, t).collect().map(_.getAs[Long]("id"))
      assert(a.max == 0L && a.distinct.length == 3 && a.forall(_ % 5 == 0))
      spark.sql("INSERT INTO graft.cs_idn (v) VALUES (4)")
      val b = ManifestTable.read(spark, t).collect().map(_.getAs[Long]("id"))
      assert(b.min < a.min, "a negative step must keep descending")
    }
  }

  test("IDENTITY declaration discipline") {
    val e1 = intercept[Exception] { spark.sql(
      s"CREATE TABLE graft.cs_i1 (id INT GENERATED ALWAYS AS IDENTITY) LOCATION '${tmp("i1")}'") }
    assert(e1.getMessage.contains("BIGINT"), e1.getMessage)
    // step 0 refuses in Spark's own parser (IDENTITY_COLUMNS_ILLEGAL_STEP);
    // ColumnSpecs.validateIdentity keeps the same gate for the Scala face
    val e2 = intercept[Exception] { spark.sql(
      s"""CREATE TABLE graft.cs_i2 (
         |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 0)
         |) LOCATION '${tmp("i2")}'""".stripMargin) }
    assert(e2.getMessage.toLowerCase.contains("step"), e2.getMessage)
    val e3 = intercept[Exception] { spark.sql(
      s"""CREATE TABLE graft.cs_i3 (
         |  id BIGINT GENERATED ALWAYS AS IDENTITY, v BIGINT
         |) PARTITIONED BY (id) LOCATION '${tmp("i3")}'""".stripMargin) }
    assert(e3.getMessage.contains("partition"), e3.getMessage)
    Seq("cs_i1", "cs_i2", "cs_i3").foreach(GraftCatalog.unregister)
  }

  test("specs survive INSERT OVERWRITE and ride time travel") {
    withTable("cs_tt",
      """CREATE TABLE graft.cs_tt (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY,
        |  status STRING DEFAULT 'open', v BIGINT
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.sql("INSERT INTO graft.cs_tt (v) VALUES (1), (2)")       // v2
      val hwmAtV2 = ManifestTable.snapshotSchema(spark, t)
        .flatMap(_.fields.find(_.name == "id"))
        .flatMap(ColumnSpecs.identityOf).flatMap(_.hwm)
      assert(hwmAtV2.isDefined, "the mark must be recorded after a write")
      spark.sql("INSERT OVERWRITE graft.cs_tt (v) VALUES (3)")       // v3
      // specs survived the schema-replacing overwrite
      spark.sql("INSERT INTO graft.cs_tt (v) VALUES (4)")            // v4
      val rows = ManifestTable.read(spark, t).collect()
      assert(rows.map(_.getAs[String]("status")).toSet === Set("open"))
      val ids = rows.map(_.getAs[Long]("id"))
      assert(ids.distinct.length == 2)
      assert(ids.min > hwmAtV2.get,
        "overwrite must NOT reset the mark — ids never recycle")
      // time travel reads the old spec state (v2's own mark)
      val v2Spec = ManifestTable.snapshotSchema(spark, t, 2)
        .flatMap(_.fields.find(_.name == "id")).flatMap(ColumnSpecs.identityOf)
      assert(v2Spec.flatMap(_.hwm) === hwmAtV2)
    }
  }

  test("SHOW CREATE TABLE round-trips the three spec clauses") {
    withTable("cs_show",
      """CREATE TABLE graft.cs_show (
        |  id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 7 INCREMENT BY 3),
        |  status STRING DEFAULT 'open',
        |  total BIGINT GENERATED ALWAYS AS (id + 1)
        |) LOCATION '__LOC__'""".stripMargin) { _ =>
      val stmt = spark.sql("SHOW CREATE TABLE graft.cs_show")
        .collect()(0).getString(0)
      assert(stmt.contains(
        "GENERATED BY DEFAULT AS IDENTITY (START WITH 7 INCREMENT BY 3)"), stmt)
      assert(stmt.contains("DEFAULT 'open'"), stmt)
      assert(stmt.contains("GENERATED ALWAYS AS (id + 1)"), stmt)
      // the statement REPLAYS: drop the registration, re-create at a
      // fresh path from the emitted DDL, insert, and the specs act
      val t2 = tmp("replay")
      val replay = stmt.replaceAll("LOCATION '[^']+'", s"LOCATION '$t2'")
        .replace("graft.cs_show", "graft.cs_show2")
      spark.sql(replay)
      try {
        spark.sql("INSERT INTO graft.cs_show2 (status) VALUES ('x')")
        val r = ManifestTable.read(spark, t2).collect()(0)
        assert(r.getAs[Long]("id") == 7L && r.getAs[Long]("total") == 8L)
      } finally GraftCatalog.unregister("cs_show2")
    }
  }

  test("a GENERATED column works as a partition column (partition-on-derived)") {
    withTable("cs_genp",
      """CREATE TABLE graft.cs_genp (
        |  k BIGINT, v DOUBLE,
        |  bucket3 BIGINT GENERATED ALWAYS AS (k % 3)
        |) PARTITIONED BY (bucket3) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.range(0, 30).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        .createOrReplaceTempView("cs_genp_src")
      spark.sql("INSERT INTO graft.cs_genp (k, v) SELECT * FROM cs_genp_src")
      // the computed column landed as the partition layout
      assert(ManifestTable.partitionColumns(spark, t) == Seq("bucket3"))
      assert(ManifestTable.snapshotFiles(spark, t)
        .filter(_.contains("part-")).forall(_.contains("bucket3=")),
        "generated partition values must land in the dir layout")
      val got = spark.sql(
        """SELECT bucket3, count(*) AS c FROM graft.cs_genp
          |GROUP BY bucket3 ORDER BY bucket3""".stripMargin).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(0L -> 10L, 1L -> 10L, 2L -> 10L))
    }
  }

  test("COPY INTO fills spec columns the landing files don't carry") {
    withTable("cs_copy",
      """CREATE TABLE graft.cs_copy (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY,
        |  k BIGINT, v DOUBLE,
        |  status STRING DEFAULT 'landed',
        |  twice DOUBLE GENERATED ALWAYS AS (v * 2)
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      val zone = java.nio.file.Files
        .createTempDirectory("graft_cs_zone").toString
      spark.range(0, 10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
        .write.mode("overwrite").parquet(zone)
      spark.sql(s"COPY INTO graft.cs_copy FROM '$zone/*' FILEFORMAT = PARQUET")
      val rows = ManifestTable.read(spark, t).collect()
      assert(rows.length == 10)
      assert(rows.map(_.getAs[Long]("id")).distinct.length == 10,
        "identity must allocate unique surrogate keys for landed rows")
      assert(rows.map(_.getAs[String]("status")).toSet === Set("landed"))
      assert(rows.forall(r => r.getAs[Double]("twice") ==
        r.getAs[Double]("v") * 2))
      // a landing zone carrying the generated column refuses
      val zone2 = java.nio.file.Files
        .createTempDirectory("graft_cs_zone2").toString
      spark.range(10, 12).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v",
          "CAST(0 AS DOUBLE) AS twice")
        .write.mode("overwrite").parquet(zone2)
      val e = intercept[Exception] { spark.sql(
        s"COPY INTO graft.cs_copy FROM '$zone2/*' FILEFORMAT = PARQUET") }
      assert(e.getMessage.contains("recomputes it"), e.getMessage)
    }
  }

  // ---- MERGE interplay (r16) -----------------------------------------

  test("MERGE fills IDENTITY/DEFAULT on insert, carries them on SET *, recomputes GENERATED") {
    import spark.implicits._
    withTable("cs_mrg",
      """CREATE TABLE graft.cs_mrg (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY,
        |  k BIGINT, v BIGINT,
        |  status STRING DEFAULT 'open',
        |  twice BIGINT GENERATED ALWAYS AS (v * 2)
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.sql("INSERT INTO graft.cs_mrg (k, v) VALUES (1, 10), (2, 20)")
      val idsBefore = ManifestTable.read(spark, t).collect()
        .map(r => r.getAs[Long]("k") -> r.getAs[Long]("id")).toMap
      Seq((2L, 99L), (3L, 30L)).toDF("k", "v")
        .createOrReplaceTempView("cs_mrg_src")
      spark.sql("""MERGE INTO graft.cs_mrg t USING cs_mrg_src s ON t.k = s.k
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
                  |""".stripMargin)
      val rows = ManifestTable.read(spark, t).collect()
        .map(r => r.getAs[Long]("k") ->
          ((r.getAs[Long]("id"), r.getAs[Long]("v"),
            r.getAs[String]("status"), r.getAs[Long]("twice")))).toMap
      // matched row: id CARRIED (not re-allocated), v updated, twice
      // recomputed over the post-image, default status carried
      assert(rows(2L)._1 == idsBefore(2L), "SET * must carry the identity")
      assert(rows(2L)._2 == 99L && rows(2L)._4 == 198L,
        s"generated must recompute post-update: ${rows(2L)}")
      assert(rows(2L)._3 == "open")
      // inserted row: fresh unique id, default filled, generated computed
      assert(rows(3L)._1 > 0 && rows(3L)._1 != rows(1L)._1 &&
        rows(3L)._1 != rows(2L)._1)
      assert(rows(3L)._3 == "open" && rows(3L)._4 == 60L)
      // untouched row intact
      assert(rows(1L) == ((idsBefore(1L), 10L, "open", 20L)))
    }
  }

  test("MERGE refuses sources carrying an ALWAYS identity and SETs of generated columns") {
    import spark.implicits._
    withTable("cs_mrgr",
      """CREATE TABLE graft.cs_mrgr (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY,
        |  k BIGINT, v BIGINT,
        |  twice BIGINT GENERATED ALWAYS AS (v * 2)
        |) LOCATION '__LOC__'""".stripMargin) { _ =>
      spark.sql("INSERT INTO graft.cs_mrgr (k, v) VALUES (1, 10)")
      Seq((1L, 2L, 5L)).toDF("id", "k", "v")
        .createOrReplaceTempView("cs_mrgr_bad")
      val e1 = intercept[Exception] { spark.sql(
        """MERGE INTO graft.cs_mrgr t USING cs_mrgr_bad s ON t.k = s.k
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin) }
      assert(e1.getMessage.contains("drop it from the source"), e1.getMessage)
      Seq((1L, 5L)).toDF("k", "v").createOrReplaceTempView("cs_mrgr_src")
      val e2 = intercept[Exception] { spark.sql(
        """MERGE INTO graft.cs_mrgr t USING cs_mrgr_src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET twice = 0""".stripMargin) }
      assert(e2.getMessage.contains("recomputes"), e2.getMessage)
    }
  }

  test("an ALWAYS-identity column is a legal merge KEY (update-by-surrogate-key CDC)") {
    import spark.implicits._
    withTable("cs_mrgk",
      """CREATE TABLE graft.cs_mrgk (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY, v BIGINT
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.sql("INSERT INTO graft.cs_mrgk (v) VALUES (10), (20)")
      val ids = ManifestTable.read(spark, t).collect()
        .map(r => r.getAs[Long]("v") -> r.getAs[Long]("id")).toMap
      // matched-only merge keyed ON the surrogate key: legal — the
      // source id is only COMPARED (and SET * writes it back equal)
      Seq((ids(10L), 11L)).toDF("id", "v")
        .createOrReplaceTempView("cs_mrgk_chg")
      spark.sql("""MERGE INTO graft.cs_mrgk t USING cs_mrgk_chg s
                  |ON t.id = s.id
                  |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
      val got = ManifestTable.read(spark, t).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("v")).toMap
      assert(got === Map(ids(10L) -> 11L, ids(20L) -> 20L))
      // the INSERT * arm fed by a source-carried id still refuses
      val e = intercept[Exception] { spark.sql(
        """MERGE INTO graft.cs_mrgk t USING cs_mrgk_chg s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin) }
      assert(e.getMessage.contains("INSERT * arm"), e.getMessage)
    }
  }

  test("MERGE INSERT * fills spec columns the source doesn't carry") {
    import spark.implicits._
    withTable("cs_mrgi",
      """CREATE TABLE graft.cs_mrgi (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY,
        |  k BIGINT, v BIGINT, status STRING DEFAULT 'open'
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      Seq((7L, 70L), (8L, 80L)).toDF("k", "v")
        .createOrReplaceTempView("cs_mrgi_src")
      spark.sql("""MERGE INTO graft.cs_mrgi t USING cs_mrgi_src s ON t.k = s.k
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val rows = ManifestTable.read(spark, t).collect()
      assert(rows.length == 2)
      assert(rows.map(_.getAs[Long]("id")).distinct.length == 2)
      assert(rows.map(_.getAs[String]("status")).toSet === Set("open"))
    }
  }

  test("the streaming-sink merge shape allocates surrogate keys for new rows") {
    import spark.implicits._
    withTable("cs_sink",
      """CREATE TABLE graft.cs_sink (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY,
        |  k BIGINT, v BIGINT
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      // exactly what ManifestSink.upsertBatch runs per micro-batch:
      // merge(batch, keys) with NO clause customization — the batch
      // carries no id column, so SET * carries the target's id for
      // matched rows and the insert image allocates fresh ones
      ManifestTable.merge(spark, t,
        Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), Seq("k"))
      val ids1 = ManifestTable.read(spark, t).collect()
        .map(r => r.getAs[Long]("k") -> r.getAs[Long]("id")).toMap
      assert(ids1.size == 2 && ids1.values.toSeq.distinct.length == 2)
      ManifestTable.merge(spark, t,
        Seq((2L, 99L), (3L, 30L)).toDF("k", "v"), Seq("k"))
      val rows = ManifestTable.read(spark, t).collect()
        .map(r => r.getAs[Long]("k") ->
          ((r.getAs[Long]("id"), r.getAs[Long]("v")))).toMap
      assert(rows(2L)._1 == ids1(2L) && rows(2L)._2 == 99L,
        "an upserted row keeps its surrogate key")
      assert(rows(3L)._1 != ids1(1L) && rows(3L)._1 != ids1(2L),
        "a new row allocates a fresh surrogate key")
    }
  }

  test("RESTORE rolls the identity mark back with the image — gaps only, never live duplicates") {
    withTable("cs_rst",
      """CREATE TABLE graft.cs_rst (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY, v BIGINT
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.sql("INSERT INTO graft.cs_rst (v) VALUES (1), (2)")   // v2: batch A
      val vA = ManifestTable.currentVersion(spark, t)
      val hwmA = ManifestTable.snapshotSchema(spark, t)
        .flatMap(_.fields.find(_.name == "id"))
        .flatMap(ColumnSpecs.identityOf).flatMap(_.hwm).get
      spark.sql("INSERT INTO graft.cs_rst (v) VALUES (3)")        // v3: batch B
      spark.sql(s"RESTORE TABLE graft.cs_rst TO VERSION AS OF $vA")
      // the mark is SNAPSHOT STATE: restore brings A's mark back —
      // new allocations may reuse the rolled-back batch B's ids (they
      // are not in the live image; ANSI identity promises no LIVE
      // duplicates, and history is exactly what RESTORE rewinds)
      val hwmR = ManifestTable.snapshotSchema(spark, t)
        .flatMap(_.fields.find(_.name == "id"))
        .flatMap(ColumnSpecs.identityOf).flatMap(_.hwm).get
      assert(hwmR == hwmA, "restore must bring the mark back with the image")
      spark.sql("INSERT INTO graft.cs_rst (v) VALUES (4)")        // batch C
      val ids = ManifestTable.read(spark, t).collect().map(_.getAs[Long]("id"))
      assert(ids.length == 3 && ids.distinct.length == 3,
        "the live image must hold no duplicate ids")
      assert(ids.max > hwmA, "post-restore allocation counts from the mark")
    }
  }

  test("RENAME/DROP of a generated expression's source column refuses") {
    withTable("cs_ref",
      """CREATE TABLE graft.cs_ref (
        |  a BIGINT, b BIGINT, total BIGINT GENERATED ALWAYS AS (a + b)
        |) LOCATION '__LOC__'""".stripMargin) { _ =>
      spark.sql("INSERT INTO graft.cs_ref (a, b) VALUES (1, 2)")
      val e1 = intercept[Exception] { spark.sql(
        "ALTER TABLE graft.cs_ref RENAME COLUMN a TO a2") }
      assert(e1.getMessage.contains("dangle"), e1.getMessage)
      val e2 = intercept[Exception] { spark.sql(
        "ALTER TABLE graft.cs_ref DROP COLUMN b") }
      assert(e2.getMessage.contains("drop it first"), e2.getMessage)
      // dropping the generated column itself frees its sources
      spark.sql("ALTER TABLE graft.cs_ref DROP COLUMN total")
      spark.sql("ALTER TABLE graft.cs_ref RENAME COLUMN a TO a2")
      spark.sql("ALTER TABLE graft.cs_ref DROP COLUMN b")
    }
  }

  test("SET/DROP DEFAULT refuses GENERATED and IDENTITY columns") {
    withTable("cs_altg",
      """CREATE TABLE graft.cs_altg (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY,
        |  t BIGINT GENERATED ALWAYS AS (id + 1), v BIGINT
        |) LOCATION '__LOC__'""".stripMargin) { _ =>
      val e1 = intercept[Exception] { spark.sql(
        "ALTER TABLE graft.cs_altg ALTER COLUMN id SET DEFAULT 1") }
      assert(e1.getMessage.contains("fills itself"), e1.getMessage)
      val e2 = intercept[Exception] { spark.sql(
        "ALTER TABLE graft.cs_altg ALTER COLUMN t SET DEFAULT 1") }
      assert(e2.getMessage.contains("fills itself"), e2.getMessage)
    }
  }
}
