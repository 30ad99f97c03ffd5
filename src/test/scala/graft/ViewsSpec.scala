package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import graft.sources.{GraftCatalog, ManifestTable}

/** SQL views over the graft namespace (r16): session-registered named
  * queries stored as TEXT and expanded at analysis — always reading
  * the referenced tables' CURRENT state. */
class ViewsSpec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_view_$tag").toString + "/t"

  private def freshTable(name: String, rows: Int = 4): String = {
    import spark.implicits._
    val t = tmp(name)
    ManifestTable.commit(spark, t,
      (1 to rows).map(i => (i.toLong, i * 10.0)).toDF("id", "v"),
      SaveMode.Overwrite)
    GraftCatalog.register(name, t)
    t
  }

  test("a view expands at analysis and always reads the current table state") {
    import spark.implicits._
    val t = freshTable("vw_base")
    try {
      spark.sql("""CREATE VIEW graft.vw_doubled AS
                  |SELECT id, v * 2 AS v2 FROM graft.vw_base WHERE id > 1""".stripMargin)
      assert(spark.sql("SELECT sum(v2) FROM graft.vw_doubled")
        .head().getDouble(0) == (20.0 + 30.0 + 40.0) * 2)
      // the view reads the table's NEW state with zero refresh ceremony
      ManifestTable.commit(spark, t, Seq((9L, 100.0)).toDF("id", "v"))
      assert(spark.sql("SELECT sum(v2) FROM graft.vw_doubled")
        .head().getDouble(0) == (20.0 + 30.0 + 40.0 + 100.0) * 2)
      // bare-name resolution works like tables
      assert(spark.sql("SELECT count(*) FROM vw_doubled").head().getLong(0) == 4)
    } finally {
      GraftCatalog.unregisterView("vw_doubled")
      GraftCatalog.unregister("vw_base")
    }
  }

  test("views nest, and a definition cycle refuses cleanly") {
    freshTable("vw_n1")
    try {
      spark.sql("CREATE VIEW graft.vw_a AS SELECT id FROM graft.vw_n1")
      spark.sql("CREATE VIEW graft.vw_b AS SELECT id + 1 AS id FROM graft.vw_a")
      assert(spark.sql("SELECT max(id) FROM graft.vw_b").head().getLong(0) == 5)
      // CREATE OR REPLACE that closes a cycle refuses AND rolls back
      val e = intercept[Exception] { spark.sql(
        "CREATE OR REPLACE VIEW graft.vw_a AS SELECT id FROM graft.vw_b") }
      assert(e.getMessage.contains("cyclic"), e.getMessage)
      assert(spark.sql("SELECT max(id) FROM graft.vw_b").head().getLong(0) == 5,
        "the refused swap must leave the old definition live")
    } finally {
      Seq("vw_a", "vw_b").foreach(GraftCatalog.unregisterView)
      GraftCatalog.unregister("vw_n1")
    }
  }

  test("a definition that does not analyze refuses at CREATE with rollback") {
    val e = intercept[Exception] { spark.sql(
      "CREATE VIEW graft.vw_bad AS SELECT * FROM graft.vw_no_such_table") }
    assert(e.getMessage.contains("does not analyze"), e.getMessage)
    assert(GraftCatalog.lookupView("vw_bad").isEmpty,
      "a refused CREATE VIEW must register nothing")
  }

  test("namespace discipline: views and tables collide loudly; OR REPLACE / IF NOT EXISTS") {
    freshTable("vw_tbl")
    try {
      val e1 = intercept[Exception] { spark.sql(
        "CREATE VIEW graft.vw_tbl AS SELECT 1 AS one") }
      assert(e1.getMessage.contains("registered TABLE"), e1.getMessage)
      spark.sql("CREATE VIEW graft.vw_dup AS SELECT 1 AS one")
      val e2 = intercept[Exception] { spark.sql(
        "CREATE VIEW graft.vw_dup AS SELECT 2 AS two") }
      assert(e2.getMessage.contains("OR REPLACE"), e2.getMessage)
      spark.sql("CREATE VIEW IF NOT EXISTS graft.vw_dup AS SELECT 2 AS two")
      assert(spark.sql("SELECT * FROM graft.vw_dup").columns.toSeq == Seq("one"),
        "IF NOT EXISTS keeps the existing definition")
      spark.sql("CREATE OR REPLACE VIEW graft.vw_dup AS SELECT 2 AS two")
      assert(spark.sql("SELECT * FROM graft.vw_dup").columns.toSeq == Seq("two"))
      val e3 = intercept[Exception] {
        GraftCatalog.register("vw_dup", "/tmp/nowhere") }
      assert(e3.getMessage.contains("collides with a registered view"))
    } finally {
      GraftCatalog.unregisterView("vw_dup")
      GraftCatalog.unregister("vw_tbl")
    }
  }

  test("ALTER VIEW AS swaps with rollback; DROP VIEW; SHOW VIEWS; SHOW CREATE replays") {
    freshTable("vw_alt_t")
    try {
      spark.sql("CREATE VIEW graft.vw_alt AS SELECT id FROM graft.vw_alt_t")
      spark.sql("ALTER VIEW graft.vw_alt AS SELECT id, v FROM graft.vw_alt_t")
      assert(spark.sql("SELECT * FROM graft.vw_alt").columns.length == 2)
      val e = intercept[Exception] { spark.sql(
        "ALTER VIEW graft.vw_alt AS SELECT zz FROM graft.vw_alt_t") }
      assert(e.getMessage.contains("does not analyze"), e.getMessage)
      assert(spark.sql("SELECT * FROM graft.vw_alt").columns.length == 2,
        "a refused ALTER must keep the old definition")
      // SHOW VIEWS lists it; the pattern filters
      val shown = spark.sql("SHOW VIEWS IN graft LIKE 'vw_al*'").collect()
      assert(shown.exists(_.getString(1) == "vw_alt"), shown.mkString(", "))
      // SHOW CREATE TABLE emits a replayable statement
      val stmt = spark.sql("SHOW CREATE TABLE graft.vw_alt")
        .collect()(0).getString(0)
      assert(stmt.startsWith("CREATE VIEW graft.vw_alt AS"), stmt)
      spark.sql("DROP VIEW graft.vw_alt")
      spark.sql(stmt)
      assert(spark.sql("SELECT * FROM graft.vw_alt").columns.length == 2)
      spark.sql("DROP VIEW graft.vw_alt")
      val e2 = intercept[Exception] { spark.sql("DROP VIEW graft.vw_alt") }
      assert(e2.getMessage.contains("no such view"), e2.getMessage)
      spark.sql("DROP VIEW IF EXISTS graft.vw_alt") // no-op, no error
      val e3 = intercept[Exception] { spark.sql("DROP VIEW graft.vw_alt_t") }
      assert(e3.getMessage.contains("that name is a TABLE"), e3.getMessage)
    } finally {
      GraftCatalog.unregisterView("vw_alt")
      GraftCatalog.unregister("vw_alt_t")
    }
  }

  test("filters on a view push through the expansion into the scan") {
    freshTable("vw_push_t", rows = 8)
    try {
      spark.sql("""CREATE VIEW graft.vw_push AS
                  |SELECT id, v * 2 AS v2 FROM graft.vw_push_t""".stripMargin)
      val p = spark.sql("SELECT v2 FROM graft.vw_push WHERE id = 3")
        .queryExecution.executedPlan.toString
      // the view boundary is transparent to Catalyst: the filter on
      // the view column lands in the parquet reader, and the scan
      // reads only the referenced columns
      assert(p.contains("PushedFilters: [IsNotNull(id), EqualTo(id,3)"),
        s"expected the view filter pushed to the scan in:\n$p")
      assert(p.contains("ReadSchema: struct<id:bigint,v:double>"),
        s"expected a pruned ReadSchema in:\n$p")
    } finally {
      GraftCatalog.unregisterView("vw_push")
      GraftCatalog.unregister("vw_push_t")
    }
  }

  test("SHOW COLUMNS answers for tables and views alike") {
    freshTable("vw_cols_t")
    try {
      spark.sql("""CREATE VIEW graft.vw_cols AS
                  |SELECT id, v * 2 AS v2 FROM graft.vw_cols_t""".stripMargin)
      assert(spark.sql("SHOW COLUMNS FROM graft.vw_cols_t").collect()
        .map(_.getString(0)).toSeq == Seq("id", "v"))
      assert(spark.sql("SHOW COLUMNS FROM graft.vw_cols").collect()
        .map(_.getString(0)).toSeq == Seq("id", "v2"))
    } finally {
      GraftCatalog.unregisterView("vw_cols")
      GraftCatalog.unregister("vw_cols_t")
    }
  }

  test("writes against a view refuse, pointing at its tables") {
    freshTable("vw_ro_t")
    try {
      spark.sql("CREATE VIEW graft.vw_ro AS SELECT id, v FROM graft.vw_ro_t")
      val e1 = intercept[Exception] { spark.sql(
        "INSERT INTO graft.vw_ro VALUES (7, 7.0)") }
      assert(e1.getMessage.contains("read-only"), e1.getMessage)
      val e2 = intercept[Exception] { spark.sql(
        "UPDATE graft.vw_ro SET v = 0 WHERE id = 1") }
      assert(e2.getMessage.contains("read-only"), e2.getMessage)
      val e3 = intercept[Exception] { spark.sql(
        "DELETE FROM graft.vw_ro WHERE id = 1") }
      assert(e3.getMessage.contains("read-only"), e3.getMessage)
    } finally {
      GraftCatalog.unregisterView("vw_ro")
      GraftCatalog.unregister("vw_ro_t")
    }
  }
}
