package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: dot_product registered via SparkSessionExtensions. */
class GraftExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("dot_product is callable from SQL in an extensions-built session") {
    spark.range(1).count() // ensure the shared fixture context exists first
    // getOrCreate returns the default session (no extensions) if one is
    // set — clear it so a NEW session is built (reusing the JVM's
    // SparkContext) with GraftExtensions applied, then restore.
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = ext.sql(
        "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .collect().head.getDouble(0)
      assert(r === 32.0)
      val farr = ext.sql(
        "SELECT dot_product(CAST(array(1.0, 0.5) AS ARRAY<FLOAT>), CAST(array(2.0, 4.0) AS ARRAY<FLOAT>)) AS d")
        .collect().head.getDouble(0)
      assert(farr === 4.0)
      // minhash_signature / shingle_minhash: SQL results must be
      // hash-identical to the built-in xxhash64(s, i) chain.
      val sig = ext.sql(
        "SELECT minhash_signature(array('ab', 'cd'), 4) AS sig")
        .collect().head.getSeq[Long](0)
      val expected = ext.sql(
        """SELECT array(
          |  least(xxhash64('ab', 0), xxhash64('cd', 0)),
          |  least(xxhash64('ab', 1), xxhash64('cd', 1)),
          |  least(xxhash64('ab', 2), xxhash64('cd', 2)),
          |  least(xxhash64('ab', 3), xxhash64('cd', 3))) AS sig""".stripMargin)
        .collect().head.getSeq[Long](0)
      assert(sig === expected)
      val sh = ext.sql(
        "SELECT shingle_minhash(array('a', 'b', 'c'), 2, 3) AS sig")
        .collect().head.getSeq[Long](0)
      val shExpected = ext.sql(
        """SELECT array(
          |  least(xxhash64('a b', 0), xxhash64('b c', 0)),
          |  least(xxhash64('a b', 1), xxhash64('b c', 1)),
          |  least(xxhash64('a b', 2), xxhash64('b c', 2))) AS sig""".stripMargin)
        .collect().head.getSeq[Long](0)
      assert(sh === shExpected)
      // max_sim: SQL result must match the hand-computed cascade
      // (q=[1,0|0,2], c=[0,3|1,1], subDim 2 → max(0,1)+max(6,2)=7)
      val ms = ext.sql(
        "SELECT max_sim(array(1L, 0L, 0L, 2L), array(0L, 3L, 1L, 1L), 2) AS s")
        .collect().head.getLong(0)
      assert(ms === 7L)
      // non-literal k must be rejected (k shapes the output schema)
      intercept[Exception] {
        ext.sql("SELECT minhash_signature(array('x'), CAST(rand() * 4 AS INT))")
          .collect()
      }
      // do NOT stop ext — it shares the fixture's SparkContext.
    } finally {
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  test("lakehouse table-valued functions: graft_table / _at / history / changes from SQL") {
    spark.range(1).count()
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import ext.implicits._
      import graft.sources.{ManifestTable => M}
      val t = java.nio.file.Files.createTempDirectory("graft_tvf").toString
      M.commit(ext, t, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      val tsBase = M.commitTimeMs(ext, t).get
      M.upsert(ext, t, Seq((1L, "A"), (3L, "c")).toDF("id", "v"), Seq("id"))
      // head read, in FROM position, through the same analyzed plan
      val head = ext.sql(
        s"SELECT id, v FROM graft_table('$t') ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(head.toSeq === Seq((1L, "A"), (2L, "b"), (3L, "c")))
      // version + timestamp time travel
      val v1 = ext.sql(
        s"SELECT id, v FROM graft_table('$t', 1) ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(v1.toSeq === Seq((1L, "a"), (2L, "b")))
      val at = ext.sql(
        s"SELECT count(*) AS n FROM graft_table_at('$t', ${tsBase}L)")
        .collect().head.getLong(0)
      assert(at === 2L)
      // the audit trail and the change feed, joinable like any table
      val ops = ext.sql(
        s"SELECT op FROM graft_history('$t') ORDER BY version")
        .collect().map(_.getString(0))
      assert(ops.toSeq === Seq("append", "merge"))
      val changed = ext.sql(
        s"SELECT count(*) AS n FROM graft_changes('$t', 1)")
        .collect().head.getLong(0)
      assert(changed >= 2L, "the merge's churned rows flow through the CDF TVF")
      // TVFs compose with the rest of SQL: aggregate over a time-travel read
      val joined = ext.sql(
        s"""SELECT h.op, count(*) AS rows_at_head
           |FROM graft_table('$t') c CROSS JOIN graft_history('$t') h
           |WHERE h.version = 2 GROUP BY h.op""".stripMargin)
        .collect().head
      assert(joined.getString(0) === "merge" && joined.getLong(1) === 3L)
      // a non-literal path must be rejected, loudly
      intercept[Exception] {
        ext.sql("SELECT * FROM graft_table(concat('/no/', 'pe'))").collect()
      }
      // by-name TVFs (r14): a registered name works everywhere a path
      // does — 'graft.<name>' loudly, bare '<name>' when registered
      graft.sources.GraftCatalog.register("tvf_t", t)
      try {
        assert(ext.sql("SELECT count(*) FROM graft_table('graft.tvf_t')")
          .head.getLong(0) === 3L)
        assert(ext.sql("SELECT count(*) FROM graft_table('tvf_t', 1)")
          .head.getLong(0) === 2L)
        assert(ext.sql("SELECT count(*) FROM graft_history('graft.tvf_t')")
          .head.getLong(0) === 2L)
        assert(ext.sql("SELECT count(*) FROM graft_changes('tvf_t', 1)")
          .head.getLong(0) >= 2L)
        val e = intercept[Exception](ext.sql(
          "SELECT * FROM graft_history('graft.ghost_tvf')").collect())
        assert(e.getMessage.contains("no registered table"), e.getMessage)
      } finally graft.sources.GraftCatalog.unregister("tvf_t")
    } finally {
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  test("catalog names: FROM graft.<name> resolves to the live head; views win clashes") {
    spark.range(1).count()
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import ext.implicits._
      import graft.sources.{GraftCatalog, ManifestTable => M}
      val t = java.nio.file.Files.createTempDirectory("graft_cat").toString
      M.commit(ext, t, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      GraftCatalog.register("cat_orders", t)
      try {
        // named read == path read, through the same analyzed plan shape
        val byName = ext.sql("SELECT id, v FROM graft.cat_orders ORDER BY id")
          .collect().map(r => (r.getLong(0), r.getString(1)))
        assert(byName.toSeq === Seq((1L, "a"), (2L, "b")))
        // FRESHNESS: a later commit is visible through the same name
        // (a temp view would have frozen v1's file list)
        M.upsert(ext, t, Seq((1L, "A"), (3L, "c")).toDF("id", "v"), Seq("id"))
        val fresh = ext.sql("SELECT id, v FROM graft.cat_orders ORDER BY id")
          .collect().map(r => (r.getLong(0), r.getString(1)))
        assert(fresh.toSeq === Seq((1L, "A"), (2L, "b"), (3L, "c")))
        // bare one-part name resolves too
        assert(ext.sql("SELECT count(*) AS n FROM cat_orders")
          .collect().head.getLong(0) === 3L)
        // version time travel via the @v suffix — parity with read(v)
        val v1 = ext.sql("SELECT id, v FROM graft.`cat_orders@v1` ORDER BY id")
          .collect().map(r => (r.getLong(0), r.getString(1)))
        assert(v1.toSeq === Seq((1L, "a"), (2L, "b")))
        // names compose with ordinary SQL (joins, aggregates)
        val n = ext.sql(
          """SELECT count(*) AS n FROM graft.cat_orders a
            |JOIN graft.`cat_orders@v1` b USING (id)""".stripMargin)
          .collect().head.getLong(0)
        assert(n === 2L)
        // a temp view with the same bare name WINS (built-ins first)
        Seq((99L, "view")).toDF("id", "v").createOrReplaceTempView("cat_orders")
        try {
          assert(ext.sql("SELECT id FROM cat_orders").collect()
            .map(_.getLong(0)).toSeq === Seq(99L),
            "an existing view must never be shadowed by a registered name")
          // the two-part form still reaches the manifest table
          assert(ext.sql("SELECT count(*) AS n FROM graft.cat_orders")
            .collect().head.getLong(0) === 3L)
        } finally ext.catalog.dropTempView("cat_orders")
        // unregistered names fail with the standard resolution error
        intercept[Exception] {
          ext.sql("SELECT * FROM graft.never_registered").collect()
        }
      } finally GraftCatalog.unregister("cat_orders")
    } finally {
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  test("SQL write path: INSERT INTO / OVERWRITE graft.<name> commits through the manifest") {
    spark.range(1).count()
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import ext.implicits._
      import graft.sources.{GraftCatalog, ManifestTable => M}
      val t = java.nio.file.Files.createTempDirectory("graft_ins").toString + "/t"
      M.commit(ext, t, Seq((1L, "a")).toDF("id", "v"),
        statsColumns = Seq("id"))
      GraftCatalog.register("ins_t", t)
      try {
        // plain INSERT INTO appends — int literals safe-cast up to the
        // recorded long, through the widening lattice
        ext.sql("INSERT INTO graft.ins_t VALUES (2, 'b'), (3, 'c')")
        assert(M.read(ext, t).count() === 3)
        assert(M.commitOp(ext, t) === Some("append"))
        // an explicit REORDERED column list maps positionally
        ext.sql("INSERT INTO graft.ins_t (v, id) VALUES ('d', 4)")
        assert(ext.sql("SELECT v FROM graft.ins_t WHERE id = 4").collect()
          .map(_.getString(0)).toSeq === Seq("d"))
        // INSERT from a query; the read side of the same rule composes
        ext.sql("INSERT INTO graft.ins_t SELECT id + 10, v FROM graft.ins_t WHERE id <= 2")
        assert(M.read(ext, t).count() === 6)
        // OVERWRITE replaces the snapshot; time travel keeps history
        ext.sql("INSERT OVERWRITE graft.ins_t VALUES (9, 'z')")
        assert(M.read(ext, t).collect().map(_.getLong(0)).toSeq === Seq(9L))
        assert(M.read(ext, t, 1).count() === 1)
        // refusals, all loud: partial column list, arity drift,
        // time-travel target, unsafe narrowing
        intercept[Exception](ext.sql("INSERT INTO graft.ins_t (id) VALUES (5)"))
        intercept[Exception](ext.sql("INSERT INTO graft.ins_t VALUES (5)"))
        intercept[Exception](
          ext.sql("INSERT INTO graft.`ins_t@v1` VALUES (5, 'x')"))
        intercept[Exception](
          ext.sql("INSERT INTO graft.ins_t VALUES (5.5, 'x')"))
        // a partitioned table: SQL APPEND inherits the layout; SQL
        // OVERWRITE is DYNAMIC PARTITION OVERWRITE (r15) — only the
        // batch's partitions swap, as ONE atomic replace-where commit,
        // and untouched partitions carry by file reference
        val tp = java.nio.file.Files.createTempDirectory("graft_insp")
          .toString + "/t"
        M.commit(ext, tp, Seq((1L, 1, "a"), (2L, 2, "b")).toDF("id", "g", "v"),
          partitionBy = Seq("g"))
        GraftCatalog.register("ins_p", tp)
        try {
          ext.sql("INSERT INTO graft.ins_p VALUES (3, 1, 'c')")
          assert(M.read(ext, tp).count() === 3)
          assert(M.snapshotFiles(ext, tp).forall(_.contains("g=")),
            "a SQL append must inherit the partition layout")
          val keepG2 = M.snapshotFiles(ext, tp).filter(_.contains("g=2")).toSet
          ext.sql("INSERT OVERWRITE graft.ins_p VALUES (9, 1, 'z')")
          assert(M.commitOp(ext, tp).contains("replace-where"),
            "dynamic overwrite must land as ONE replace-where commit")
          assert(M.read(ext, tp).collect().map(_.getLong(0)).toSet
            === Set(9L, 2L),
            "the batch's partition (g=1) is replaced, g=2 survives")
          assert(M.snapshotFiles(ext, tp).filter(_.contains("g=2")).toSet
            === keepG2,
            "the untouched partition must carry by file reference")
        } finally GraftCatalog.unregister("ins_p")
      } finally GraftCatalog.unregister("ins_t")
    } finally {
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  test("SQL DELETE FROM and UPDATE graft.<name> run the pruned rewrite operators") {
    spark.range(1).count()
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import ext.implicits._
      import graft.sources.{GraftCatalog, ManifestTable => M}
      val t = java.nio.file.Files.createTempDirectory("graft_dml").toString + "/t"
      M.commit(ext, t,
        (1 to 50).map(i => (i.toLong, i.toDouble, s"r$i")).toDF("id", "v", "s"),
        statsColumns = Seq("id"))
      GraftCatalog.register("dml_t", t)
      try {
        ext.sql("UPDATE graft.dml_t SET v = v * 2, s = upper(s) WHERE id <= 5")
        assert(M.commitOp(ext, t) === Some("update"))
        val r3 = ext.sql("SELECT v, s FROM graft.dml_t WHERE id = 3").collect().head
        assert(r3.getDouble(0) === 6.0 && r3.getString(1) === "R3")
        assert(ext.sql("SELECT v FROM graft.dml_t WHERE id = 30")
          .collect().head.getDouble(0) === 30.0)
        // unqualified UPDATE (no WHERE) hits every row
        ext.sql("UPDATE graft.dml_t SET v = 0")
        assert(ext.sql("SELECT sum(v) AS s FROM graft.dml_t")
          .collect().head.getDouble(0) === 0.0)
        ext.sql("DELETE FROM graft.dml_t WHERE id % 2 = 0")
        assert(M.commitOp(ext, t) === Some("delete"))
        assert(ext.sql("SELECT count(*) AS n FROM graft.dml_t")
          .collect().head.getLong(0) === 25L)
        // time travel still sees every pre-DML image
        assert(M.read(ext, t, 1).count() === 50)
        // refusals: time-travel target, bad column, narrowing assignment
        intercept[Exception](
          ext.sql("DELETE FROM graft.`dml_t@v1` WHERE id = 1"))
        intercept[Exception](
          ext.sql("UPDATE graft.dml_t SET nope = 1"))
        intercept[Exception](
          ext.sql("UPDATE graft.dml_t SET id = 'abc'"))
        // a FOREIGN-qualified / deep-struct assignment must not
        // silently bind to the column named by its last part — but a
        // TARGET-table qualifier is standard SQL and accepted (r13,
        // AdviceR12Spec covers the alias/full-name spellings)
        intercept[Exception](
          ext.sql("UPDATE graft.dml_t SET other_t.v = 1"))
        intercept[Exception](
          ext.sql("UPDATE graft.dml_t SET dml_t.v.deep = 1"))
      } finally GraftCatalog.unregister("dml_t")
    } finally {
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  test("SQL ALTER TABLE: rename / add / drop / widen map to the metadata-only DDL") {
    spark.range(1).count()
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import ext.implicits._
      import graft.sources.{GraftCatalog, ManifestTable => M}
      val t = java.nio.file.Files.createTempDirectory("graft_alter").toString + "/t"
      M.commit(ext, t, (1 to 20).map(i => (i, i * 2.0)).toDF("id", "score"))
      GraftCatalog.register("alt_t", t)
      try {
        ext.sql("ALTER TABLE graft.alt_t RENAME COLUMN score TO quality")
        assert(M.commitOp(ext, t) === Some("rename-column"))
        assert(ext.sql("SELECT quality FROM graft.alt_t WHERE id = 3")
          .collect().head.getDouble(0) === 6.0)
        ext.sql("ALTER TABLE graft.alt_t ADD COLUMNS (note STRING)")
        assert(ext.sql("SELECT note FROM graft.alt_t WHERE id = 1")
          .collect().head.isNullAt(0))
        ext.sql("ALTER TABLE graft.alt_t ALTER COLUMN id TYPE BIGINT")
        assert(M.commitOp(ext, t) === Some("widen-column"))
        ext.sql("INSERT INTO graft.alt_t VALUES (3000000000, 1.0, 'big')")
        assert(ext.sql("SELECT max(id) AS m FROM graft.alt_t")
          .collect().head.getLong(0) === 3000000000L)
        ext.sql("ALTER TABLE graft.alt_t DROP COLUMN note")
        assert(!M.read(ext, t).columns.contains("note"))
        // IF EXISTS tolerates a missing column; the bare form refuses
        ext.sql("ALTER TABLE graft.alt_t DROP COLUMN IF EXISTS nope")
        intercept[Exception](
          ext.sql("ALTER TABLE graft.alt_t DROP COLUMN nope"))
        // refusals surface verbatim from the operators
        intercept[Exception]( // narrowing
          ext.sql("ALTER TABLE graft.alt_t ALTER COLUMN id TYPE INT"))
        intercept[Exception]( // NOT NULL add
          ext.sql("ALTER TABLE graft.alt_t ADD COLUMNS (x INT NOT NULL)"))
        intercept[Exception]( // rename to an existing name
          ext.sql("ALTER TABLE graft.alt_t RENAME COLUMN id TO quality"))
        intercept[Exception]( // DDL on a time-travel target
          ext.sql("ALTER TABLE graft.`alt_t@v1` RENAME COLUMN id TO k"))
      } finally GraftCatalog.unregister("alt_t")
    } finally {
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  test("SQL MERGE INTO graft.<name>: upsert, conditional update, delete clause") {
    spark.range(1).count()
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import ext.implicits._
      import graft.sources.{GraftCatalog, ManifestTable => M}
      val t = java.nio.file.Files.createTempDirectory("graft_mrg").toString + "/t"
      M.commit(ext, t,
        (1 to 10).map(i => (i.toLong, i * 1.0, s"r$i")).toDF("id", "v", "s"),
        statsColumns = Seq("id"))
      GraftCatalog.register("mrg_t", t)
      try {
        // plain upsert: update matches, insert the rest
        Seq((1L, 100.0, "u1"), (11L, 110.0, "n11"))
          .toDF("id", "v", "s").createOrReplaceTempView("chg1")
        ext.sql("""MERGE INTO graft.mrg_t AS t USING chg1 AS c ON t.id = c.id
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        assert(M.commitOp(ext, t) === Some("merge"))
        val m1 = M.read(ext, t).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(m1.size === 11 && m1(1L) === 100.0 && m1(11L) === 110.0 && m1(2L) === 2.0)
        // conditional update referencing BOTH sides + a delete clause
        Seq((2L, 1.0, "low"), (3L, 300.0, "hi"), (4L, 0.0, "kill"))
          .toDF("id", "v", "s").createOrReplaceTempView("chg2")
        ext.sql("""MERGE INTO graft.mrg_t AS t USING chg2 AS c ON t.id = c.id
                  |WHEN MATCHED AND c.s = 'kill' THEN DELETE
                  |WHEN MATCHED AND c.v > t.v THEN UPDATE SET *
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        val m2 = M.read(ext, t).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(!m2.contains(4L), "the delete clause must remove id=4")
        assert(m2(3L) === 300.0, "c.v > t.v must take the update")
        assert(m2(2L) === 2.0, "c.v < t.v must keep the target row")
        assert(m2.size === 10)
        // SQL first-match precedence: UPDATE listed BEFORE DELETE must
        // update a row both clauses match (the engine's delete-wins
        // default is narrowed by the rule)
        Seq((5L, 500.0, "kill")).toDF("id", "v", "s")
          .createOrReplaceTempView("chg3")
        ext.sql("""MERGE INTO graft.mrg_t t USING chg3 c ON t.id = c.id
                  |WHEN MATCHED AND c.v > t.v THEN UPDATE SET *
                  |WHEN MATCHED AND c.s = 'kill' THEN DELETE
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        val m3 = M.read(ext, t).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(m3(5L) === 500.0,
          "first-match order: the earlier UPDATE clause must win over DELETE")
        // expression keys (r15): `ON t.id = c.id + 1` evaluates the
        // mapped key against the RAW source frame (replacing c.id), so
        // the feed's rows land on their SHIFTED target keys — chg2's
        // ids (2, 3, 4) address targets (3, 4, 5)
        ext.sql(
          """MERGE INTO graft.mrg_t t USING chg2 c ON t.id = c.id + 1
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        val m4 = M.read(ext, t).collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(m4(3L) === 1.0 && m4(5L) === 0.0,
          "matched feed rows must land on their mapped key (c.id + 1)")
        assert(m4(4L) === 300.0,
          "an unmatched mapped key must INSERT under the mapped value")
        assert(m4.size === 11)
      } finally GraftCatalog.unregister("mrg_t")
    } finally {
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  test("standard SQL time travel, DESCRIBE TABLE, SHOW TABLES (r13 surface)") {
    import spark.implicits._
    import graft.sources.{GraftCatalog, ManifestTable => M}
    val t = java.nio.file.Files.createTempDirectory("graft_sqlsurf").toString + "/t"
    M.commit(spark, t, (1 to 10).map(i => (i.toLong, s"g${i % 2}", i * 1.0))
      .toDF("id", "g", "v"), partitionBy = Seq("g"), statsColumns = Seq("id"))
    val tsAfterV1 = System.currentTimeMillis()
    Thread.sleep(5)
    M.commit(spark, t, Seq((11L, "g0", 11.0)).toDF("id", "g", "v"))
    GraftCatalog.register("surf_t", t)
    try {
      // VERSION AS OF — the ANSI-ish spelling next to graft.`t@v1`
      assert(spark.sql("SELECT count(*) AS c FROM graft.surf_t VERSION AS OF 1")
        .head.getLong(0) === 10L)
      assert(spark.sql("SELECT count(*) AS c FROM graft.surf_t VERSION AS OF 2")
        .head.getLong(0) === 11L)
      // TIMESTAMP AS OF — resolves through versionAsOf
      val ts = new java.sql.Timestamp(tsAfterV1).toString
      assert(spark.sql(
        s"SELECT count(*) AS c FROM graft.surf_t TIMESTAMP AS OF '$ts'")
        .head.getLong(0) === 10L)
      // refusals: non-integer version; combining with the @v spelling
      intercept[Exception](spark.sql(
        "SELECT * FROM graft.surf_t VERSION AS OF 'abc'").collect())
      intercept[Exception](spark.sql(
        "SELECT * FROM graft.`surf_t@v1` VERSION AS OF 2").collect())
      // DESCRIBE: schema rows + partition section
      val desc = spark.sql("DESCRIBE TABLE graft.surf_t").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(desc.contains(("id", "bigint")) && desc.contains(("v", "double")))
      assert(desc.contains(("# Partition Information", "")) &&
        desc.contains(("g", "string")))
      // DESCRIBE EXTENDED: the metadata face
      val ext = spark.sql("DESCRIBE EXTENDED graft.surf_t").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      assert(ext.get("Location").contains(t) && ext.get("Version").contains("2"))
      // SHOW TABLES IN graft, with and without a pattern
      val shown = spark.sql("SHOW TABLES IN graft").collect()
        .map(r => (r.getString(1), r.getString(2))).toMap
      assert(shown.get("surf_t").contains(t))
      assert(spark.sql("SHOW TABLES IN graft LIKE 'surf*'").count() >= 1)
      assert(spark.sql("SHOW TABLES IN graft LIKE 'zzz*'").count() === 0)
    } finally GraftCatalog.unregister("surf_t")
  }

  test("matched-only MERGE and NOT MATCHED BY SOURCE DELETE (r13 arms)") {
    import spark.implicits._
    import graft.sources.{GraftCatalog, ManifestTable => M}
    val t = java.nio.file.Files.createTempDirectory("graft_mrg13").toString + "/t"
    M.commit(spark, t,
      (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v"),
      statsColumns = Seq("id"))
    GraftCatalog.register("mrg13_t", t)
    try {
      def image: Map[Long, Double] = M.read(spark, t).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // UPDATE-only: matches update, unmatched source rows do NOT insert
      Seq((2L, 200.0), (12L, 999.0)).toDF("id", "v")
        .createOrReplaceTempView("mo1")
      spark.sql("""MERGE INTO graft.mrg13_t t USING mo1 c ON t.id = c.id
                  |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      assert(M.currentVersion(spark, t) === 2)
      assert(image === (1 to 10).map(i =>
        i.toLong -> (if (i == 2) 200.0 else i * 1.0)).toMap,
        "UPDATE-only must update id=2 and must NOT insert id=12")
      // matched-only with zero matches: NO commit (deleteWhere contract)
      Seq((77L, 1.0)).toDF("id", "v").createOrReplaceTempView("mo2")
      spark.sql("""MERGE INTO graft.mrg13_t t USING mo2 c ON t.id = c.id
                  |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      assert(M.currentVersion(spark, t) === 2,
        "a matched-only merge matching nothing must commit no version")
      // DELETE-only
      Seq((3L, 0.0), (4L, 0.0)).toDF("id", "v").createOrReplaceTempView("mo3")
      spark.sql("""MERGE INTO graft.mrg13_t t USING mo3 c ON t.id = c.id
                  |WHEN MATCHED THEN DELETE""".stripMargin)
      assert(image.keySet === Set(1L, 2L, 5L, 6L, 7L, 8L, 9L, 10L))
      // conditioned BY SOURCE delete: only unmatched rows with id >= 9 go
      Seq((1L, 1.0), (2L, 200.0)).toDF("id", "v")
        .createOrReplaceTempView("mo4")
      spark.sql("""MERGE INTO graft.mrg13_t t USING mo4 c ON t.id = c.id
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED BY SOURCE AND t.id >= 9 THEN DELETE""".stripMargin)
      assert(image.keySet === Set(1L, 2L, 5L, 6L, 7L, 8L),
        "BY SOURCE AND id >= 9 must delete exactly 9 and 10")
      // the full mirror-sync idiom: UPDATE + INSERT + unconditional
      // BY SOURCE DELETE makes the target the source's exact image —
      // hash-checked against the DataFrame the source was built from
      val mirror = Seq((1L, 11.0), (6L, 66.0), (20L, 20.0))
        .toDF("id", "v")
      mirror.createOrReplaceTempView("mo5")
      spark.sql("""MERGE INTO graft.mrg13_t t USING mo5 c ON t.id = c.id
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED THEN INSERT *
                  |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      assert(image === mirror.collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap,
        "the three-arm merge must mirror the source exactly")
      // BY SOURCE UPDATE: the mark-stale idiom — unmatched rows the
      // feed stopped mentioning take the assignments
      Seq((1L, 0.0)).toDF("id", "v").createOrReplaceTempView("mo6")
      spark.sql("""MERGE INTO graft.mrg13_t t USING mo6 c ON t.id = c.id
                  |WHEN NOT MATCHED BY SOURCE AND t.v < 50.0D
                  |  THEN UPDATE SET v = -1.0D""".stripMargin)
      assert(image === Map(1L -> 11.0, 6L -> 66.0, 20L -> -1.0),
        "BY SOURCE UPDATE must mark exactly the unmatched rows under the condition")
      // precedence: UPDATE listed before DELETE wins overlapping rows
      spark.sql("""MERGE INTO graft.mrg13_t t USING mo6 c ON t.id = c.id
                  |WHEN NOT MATCHED BY SOURCE AND t.id = 6 THEN UPDATE SET v = 0.0D
                  |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
      assert(image === Map(1L -> 11.0, 6L -> 0.0),
        "first-match order: the earlier BY SOURCE UPDATE must win over DELETE")
      // refusals: a BY SOURCE condition referencing the source, and a
      // BY SOURCE UPDATE SET *
      val e = intercept[Exception](spark.sql(
        """MERGE INTO graft.mrg13_t t USING mo5 c ON t.id = c.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED BY SOURCE AND c.v > 0 THEN DELETE""".stripMargin))
      assert(e.getMessage.contains("target columns"),
        s"source refs in a BY SOURCE condition must refuse: ${e.getMessage}")
      val e2 = intercept[Exception](spark.sql(
        """MERGE INTO graft.mrg13_t t USING mo5 c ON t.id = c.id
          |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = c.v""".stripMargin))
      assert(e2.getMessage.contains("target columns"),
        s"a source-valued BY SOURCE assignment must refuse: ${e2.getMessage}")
    } finally GraftCatalog.unregister("mrg13_t")
  }

  test("MERGE explicit UPDATE SET lists: partial assignment, mixed target/source values, refusals") {
    import spark.implicits._
    import graft.sources.{GraftCatalog, ManifestTable => M}
    val t = java.nio.file.Files.createTempDirectory("graft_msl").toString + "/t"
    M.commit(spark, t,
      Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
        .toDF("id", "v", "s"), org.apache.spark.sql.SaveMode.Overwrite)
    GraftCatalog.register("msl_t", t)
    try {
      def image: Map[Long, (Double, String)] = M.read(spark, t).collect()
        .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
      Seq((1L, 5.0), (2L, -5.0), (9L, 99.0)).toDF("id", "dv")
        .createOrReplaceTempView("msl_c")
      // partial SET: v takes a value mixing BOTH sides (t.v + c.dv),
      // s stays untouched; the clause condition gates which matches
      // fire; no insert arm (source and target schemas differ)
      spark.sql("""MERGE INTO graft.msl_t t USING msl_c c ON t.id = c.id
                  |WHEN MATCHED AND c.dv > 0 THEN UPDATE SET v = t.v + c.dv
                  |""".stripMargin)
      assert(image === Map(1L -> ((15.0, "a")), 2L -> ((20.0, "b")),
        3L -> ((30.0, "c"))),
        "only the conditioned match reassigns, and only column v")
      // a full statement: SET list + INSERT * (schema-compatible
      // source), unqualified targets and a literal in the values
      Seq((2L, 1000.0, "src"), (7L, 70.0, "new")).toDF("id", "v", "s")
        .createOrReplaceTempView("msl_c2")
      spark.sql("""MERGE INTO graft.msl_t t USING msl_c2 c ON t.id = c.id
                  |WHEN MATCHED THEN UPDATE SET s = 'seen', v = c.v
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(image === Map(1L -> ((15.0, "a")), 2L -> ((1000.0, "seen")),
        3L -> ((30.0, "c")), 7L -> ((70.0, "new"))),
        "matched rows take the SET list; unmatched source rows insert")
      // refusals: the merge key, duplicates, unknown columns, and
      // non-widening types — all loud, nothing written
      val v0 = M.currentVersion(spark, t)
      val e1 = intercept[Exception](spark.sql(
        """MERGE INTO graft.msl_t t USING msl_c2 c ON t.id = c.id
          |WHEN MATCHED THEN UPDATE SET id = c.id + 1""".stripMargin))
      assert(e1.getMessage.contains("key"), e1.getMessage)
      val e2 = intercept[Exception](spark.sql(
        """MERGE INTO graft.msl_t t USING msl_c2 c ON t.id = c.id
          |WHEN MATCHED THEN UPDATE SET v = 1.0D, v = 2.0D""".stripMargin))
      assert(e2.getMessage.contains("twice"), e2.getMessage)
      val e3 = intercept[Exception](spark.sql(
        """MERGE INTO graft.msl_t t USING msl_c2 c ON t.id = c.id
          |WHEN MATCHED THEN UPDATE SET ghost = 1.0D""".stripMargin))
      assert(e3.getMessage.contains("ghost"), e3.getMessage)
      val e4 = intercept[Exception](spark.sql(
        """MERGE INTO graft.msl_t t USING msl_c2 c ON t.id = c.id
          |WHEN MATCHED THEN UPDATE SET v = c.s""".stripMargin))
      assert(e4.getMessage.contains("widening"), e4.getMessage)
      val e5 = intercept[Exception](spark.sql(
        """MERGE INTO graft.msl_t t USING msl_c2 c ON t.id = c.id
          |WHEN MATCHED THEN UPDATE SET v.nested = 1.0D""".stripMargin))
      assert(e5.getMessage.contains("whole target columns"), e5.getMessage)
      assert(M.currentVersion(spark, t) === v0,
        "refused statements must publish nothing")
    } finally GraftCatalog.unregister("msl_t")
  }

  test("MERGE insert arms: conditional INSERT * and column-list INSERT with typed nulls") {
    import spark.implicits._
    import graft.sources.{GraftCatalog, ManifestTable => M}
    val t = java.nio.file.Files.createTempDirectory("graft_mins").toString + "/t"
    M.commit(spark, t,
      Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("id", "v", "s"),
      org.apache.spark.sql.SaveMode.Overwrite)
    GraftCatalog.register("mins_t", t)
    try {
      def image: Map[Long, (Option[Double], Option[String])] =
        M.read(spark, t).collect().map(r => r.getLong(0) ->
          ((if (r.isNullAt(1)) None else Some(r.getDouble(1)),
            Option(r.getString(2))))).toMap
      Seq((1L, 99.0, "m"), (7L, 5.0, "lo"), (8L, 50.0, "hi"))
        .toDF("id", "v", "s").createOrReplaceTempView("mins_c")
      // conditional INSERT *: only the unmatched row passing the
      // SOURCE-side gate inserts; the matched row updates
      spark.sql("""MERGE INTO graft.mins_t t USING mins_c c ON t.id = c.id
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED AND c.v > 10 THEN INSERT *""".stripMargin)
      assert(image === Map(
        1L -> ((Some(99.0), Some("m"))), 2L -> ((Some(20.0), Some("b"))),
        8L -> ((Some(50.0), Some("hi")))),
        "id 7 must be gated out by the insert condition")
      // column-list INSERT: v unassigned → typed null; values are
      // source-frame expressions
      Seq((9L, 1.0, "nine")).toDF("id", "v", "s")
        .createOrReplaceTempView("mins_c2")
      spark.sql("""MERGE INTO graft.mins_t t USING mins_c2 c ON t.id = c.id
                  |WHEN NOT MATCHED THEN INSERT (id, s) VALUES (c.id, c.s)
                  |""".stripMargin)
      assert(image(9L) === ((None, Some("nine"))),
        "unassigned columns must insert as typed nulls")
      // refusals: a target reference in the insert side, unknown
      // assigned column — loud, nothing written
      val v0 = M.currentVersion(spark, t)
      val e1 = intercept[Exception](spark.sql(
        """MERGE INTO graft.mins_t t USING mins_c c ON t.id = c.id
          |WHEN NOT MATCHED AND t.v > 0 THEN INSERT *""".stripMargin))
      assert(e1.getMessage.contains("source columns"), e1.getMessage)
      val e2 = intercept[Exception](spark.sql(
        """MERGE INTO graft.mins_t t USING mins_c c ON t.id = c.id
          |WHEN NOT MATCHED THEN INSERT (ghost) VALUES (c.id)""".stripMargin))
      assert(e2.getMessage.contains("ghost"), e2.getMessage)
      assert(M.currentVersion(spark, t) === v0)
      // a CHECK constraint vets the typed nulls like any other row
      M.addConstraint(spark, t, "v_set", "v IS NOT NULL OR id < 100")
      val e3 = intercept[Exception](spark.sql(
        """MERGE INTO graft.mins_t t
          |USING (SELECT 200L AS id, 3.0D AS v, 'x' AS s) c ON t.id = c.id
          |WHEN NOT MATCHED THEN INSERT (id, s) VALUES (c.id, c.s)""".stripMargin))
      assert(e3.getMessage.contains("v_set"),
        s"the null-v insert must fail the CHECK: ${e3.getMessage}")
    } finally GraftCatalog.unregister("mins_t")
  }

  test("Resolution bails out early: plain relational statements never pay the rewrite walk") {
    import spark.implicits._
    import graft.sources.GraftCatalog
    val t = java.nio.file.Files.createTempDirectory("graft_extres").toString
    graft.sources.ManifestTable.commit(spark, t,
      Seq((1L, "a")).toDF("id", "v"))
    GraftCatalog.register("extres_t", t)
    try {
      def walks = GraftCatalog.resolutionWalks.get()
      // a relational statement naming no graft table: the rule's
      // pre-scan must reject it without a single rewrite walk, even
      // with a non-empty registry (r13 verdict watch item — this is
      // the per-statement cost that would grow with every new claimed
      // pattern)
      spark.range(10).toDF("x").createOrReplaceTempView("extres_plain")
      val before = walks
      spark.sql(
        """SELECT x, count(*) AS c FROM extres_plain
          |WHERE x > 2 GROUP BY x ORDER BY x""".stripMargin).collect()
      assert(walks === before,
        "a graft-free statement must never enter the Resolution rewrite")
      // a graft-naming statement DOES walk (the guard has no false
      // negatives), exactly as before
      spark.sql("SELECT * FROM graft.extres_t").collect()
      assert(walks > before,
        "a graft relation must still be claimed and rewritten")
    } finally GraftCatalog.unregister("extres_t")
  }
}
