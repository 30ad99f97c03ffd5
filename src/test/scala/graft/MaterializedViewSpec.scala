package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import graft.sources.{GraftCatalog, ManifestTable}

/** Materialized views (r16): a manifest table whose defining query is
  * recorded in the config sidecar — REFRESH re-runs the text as ONE
  * atomic overwrite version; direct DML refuses. */
class MaterializedViewSpec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mv_$tag").toString + "/t"

  private def freshBase(name: String): String = {
    import spark.implicits._
    val t = tmp(name)
    ManifestTable.commit(spark, t,
      Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0))
        .toDF("id", "grp", "v"),
      SaveMode.Overwrite)
    GraftCatalog.register(name, t)
    t
  }

  test("REFRESH recomputes the image as ONE atomic overwrite; stale until then") {
    import spark.implicits._
    val base = freshBase("mv_base")
    val mt = tmp("mv_sum")
    try {
      spark.sql(s"""CREATE MATERIALIZED VIEW graft.mv_sums LOCATION '$mt'
                   |AS SELECT grp, sum(v) AS total FROM graft.mv_base
                   |GROUP BY grp""".stripMargin)
      def sums() = spark.sql("SELECT * FROM graft.mv_sums").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(sums() === Map("a" -> 30.0, "b" -> 30.0))
      // the base moves; the materialized image is STALE by contract
      ManifestTable.commit(spark, base, Seq((4L, "b", 70.0)).toDF("id", "grp", "v"))
      assert(sums() === Map("a" -> 30.0, "b" -> 30.0),
        "materialized = stale until REFRESH, that's the contract")
      val vBefore = ManifestTable.currentVersion(spark, mt)
      val out = spark.sql("REFRESH MATERIALIZED VIEW graft.mv_sums").collect()
      assert(out(0).getInt(0) == vBefore + 1,
        "refresh must spend exactly ONE version")
      assert(sums() === Map("a" -> 30.0, "b" -> 100.0))
      // the pre-refresh image stays time-travelable
      assert(ManifestTable.read(spark, mt, vBefore).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
        === Map("a" -> 30.0, "b" -> 30.0))
    } finally {
      GraftCatalog.unregister("mv_sums")
      GraftCatalog.unregister("mv_base")
    }
  }

  test("direct DML refuses; maintenance and REFRESH-only-on-mview discipline") {
    freshBase("mv_ro_base")
    val mt = tmp("mv_ro")
    try {
      spark.sql(s"""CREATE MATERIALIZED VIEW graft.mv_ro LOCATION '$mt'
                   |AS SELECT id, v FROM graft.mv_ro_base""".stripMargin)
      def refuses(sql: String): Unit = {
        val e = intercept[Exception] { spark.sql(sql) }
        assert(e.getMessage.contains("MATERIALIZED VIEW"), s"$sql => ${e.getMessage}")
      }
      refuses("INSERT INTO graft.mv_ro VALUES (9, 9.0)")
      refuses("UPDATE graft.mv_ro SET v = 0 WHERE id = 1")
      refuses("DELETE FROM graft.mv_ro WHERE id = 1")
      refuses("TRUNCATE TABLE graft.mv_ro")
      refuses("""MERGE INTO graft.mv_ro t USING graft.mv_ro_base s
                |ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
      // maintenance is NOT DML — the image is still a table
      val opt = spark.sql("OPTIMIZE graft.mv_ro").collect()(0)
      assert(opt.getString(1).startsWith("compact-small"))
      // REFRESH aimed at a plain table refuses with guidance
      val e = intercept[Exception] { spark.sql(
        "REFRESH MATERIALIZED VIEW graft.mv_ro_base") }
      assert(e.getMessage.contains("not a materialized view"), e.getMessage)
    } finally {
      GraftCatalog.unregister("mv_ro")
      GraftCatalog.unregister("mv_ro_base")
    }
  }

  test("SHOW CREATE emits the defining statement; mviews stack on views") {
    freshBase("mv_mix_base")
    val mt = tmp("mv_mix")
    try {
      spark.sql("""CREATE VIEW graft.mv_mix_v AS
                  |SELECT id, v * 2 AS v2 FROM graft.mv_mix_base""".stripMargin)
      // the defining query may read a TEXT view — expansion happens at
      // create/refresh analysis like any other read
      spark.sql(s"""CREATE MATERIALIZED VIEW graft.mv_mix LOCATION '$mt'
                   |AS SELECT sum(v2) AS s2 FROM graft.mv_mix_v""".stripMargin)
      assert(spark.sql("SELECT s2 FROM graft.mv_mix").head().getDouble(0) == 120.0)
      val stmt = spark.sql("SHOW CREATE TABLE graft.mv_mix")
        .collect()(0).getString(0)
      assert(stmt.startsWith("CREATE MATERIALIZED VIEW graft.mv_mix"), stmt)
      assert(stmt.contains("SELECT sum(v2) AS s2 FROM graft.mv_mix_v"), stmt)
    } finally {
      GraftCatalog.unregisterView("mv_mix_v")
      GraftCatalog.unregister("mv_mix")
      GraftCatalog.unregister("mv_mix_base")
    }
  }
}
