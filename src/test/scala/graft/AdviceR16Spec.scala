package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import graft.sources.{GraftCatalog, ManifestTable}

/** Pins the four r16 advisory findings.
  *
  *  - `MERGE … WHEN NOT MATCHED THEN INSERT *` with a source that
  *    carries EVERY spec-bearing column (the pass-through shape that
  *    previously skipped enforcement) still refuses a drifted
  *    GENERATED value and accepts an agreeing one;
  *  - supplied-GENERATED agree-checks pin the frame
  *    (localCheckpoint) before checking, so a nondeterministic
  *    source cannot pass the check on one sample and store another —
  *    the stored rows always satisfy the generated invariant;
  *  - concurrent head reads of a cache-enabled table never strand a
  *    persisted frame (at most ONE cached RDD per table survives a
  *    read race);
  *  - plain OPTIMIZE over a hand-corrupted 3-dimension
  *    `graft.clusterBy` config refuses cleanly instead of throwing a
  *    MatchError. */
class AdviceR16Spec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ar16_$tag").toString + "/t"

  private def withTable(name: String, ddl: String)(body: String => Unit): Unit = {
    val t = tmp(name)
    spark.sql(ddl.replace("__LOC__", t))
    try body(t) finally GraftCatalog.unregister(name)
  }

  // ---- MERGE INSERT * pass-through generated enforcement -----------

  test("MERGE INSERT * with a full-carry source refuses a drifted GENERATED value") {
    import spark.implicits._
    withTable("ar16_drift",
      """CREATE TABLE graft.ar16_drift (
        |  k BIGINT, v BIGINT, twice BIGINT GENERATED ALWAYS AS (v * 2)
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.sql("INSERT INTO graft.ar16_drift (k, v) VALUES (1, 10)")
      // source carries k, v AND twice — no spec column is missing, so
      // the star is a pass-through; the drifted twice must still refuse
      Seq((2L, 20L, 41L)).toDF("k", "v", "twice")
        .createOrReplaceTempView("ar16_drift_bad")
      val e = intercept[Exception] { spark.sql(
        """MERGE INTO graft.ar16_drift t USING ar16_drift_bad s ON t.k = s.k
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin) }
      assert(e.getMessage.contains("disagree") &&
        e.getMessage.contains("twice"), e.getMessage)
      // nothing was stored
      assert(ManifestTable.read(spark, t).count() == 1)
      // an AGREEING carried value inserts
      Seq((2L, 20L, 40L)).toDF("k", "v", "twice")
        .createOrReplaceTempView("ar16_drift_ok")
      spark.sql(
        """MERGE INTO graft.ar16_drift t USING ar16_drift_ok s ON t.k = s.k
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val got = ManifestTable.read(spark, t).collect()
        .map(r => r.getAs[Long]("k") -> r.getAs[Long]("twice")).toMap
      assert(got === Map(1L -> 20L, 2L -> 40L))
    }
  }

  // ---- supplied-GENERATED checks see the rows that get written -----

  test("INSERT from a nondeterministic source stores rows satisfying the generated invariant") {
    withTable("ar16_rand",
      """CREATE TABLE graft.ar16_rand (
        |  a BIGINT, b BIGINT GENERATED ALWAYS AS (a * 2)
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      // b derives from a inside the SOURCE plan; without pinning, the
      // agree-check and the write would each re-roll rand() and store
      // a's from a different execution than the ones checked
      spark.sql(
        """INSERT INTO graft.ar16_rand
          |SELECT a, a * 2 AS b FROM
          |  (SELECT CAST(floor(rand() * 1000000) AS BIGINT) AS a
          |   FROM range(500))""".stripMargin)
      val bad = ManifestTable.read(spark, t)
        .filter("b IS DISTINCT FROM a * 2").count()
      assert(bad == 0, s"$bad stored rows violate GENERATED ALWAYS AS (a*2)")
      assert(ManifestTable.read(spark, t).count() == 500)
    }
  }

  test("MERGE INSERT with an assigned generated column from a nondeterministic source stays consistent") {
    withTable("ar16_mrand",
      """CREATE TABLE graft.ar16_mrand (
        |  k BIGINT, v BIGINT, twice BIGINT GENERATED ALWAYS AS (v * 2)
        |) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.sql(
        """SELECT id AS k, CAST(floor(rand() * 1000) AS BIGINT) AS v
          |FROM range(200)""".stripMargin)
        .createOrReplaceTempView("ar16_mrand_src")
      // explicit column list ASSIGNING twice = s.v * 2: agree-check
      // runs against the pinned base, and the pinned rows are stored
      spark.sql(
        """MERGE INTO graft.ar16_mrand t USING ar16_mrand_src s ON t.k = s.k
          |WHEN NOT MATCHED THEN INSERT (k, v, twice)
          |  VALUES (s.k, s.v, s.v * 2)""".stripMargin)
      val bad = ManifestTable.read(spark, t)
        .filter("twice IS DISTINCT FROM v * 2").count()
      assert(bad == 0, s"$bad stored rows violate GENERATED ALWAYS AS (v*2)")
      assert(ManifestTable.read(spark, t).count() == 200)
    }
  }

  // ---- cache: racing head reads strand no blocks -------------------

  test("racing head reads of a cache-enabled table leave at most one cached frame") {
    import spark.implicits._
    val t = tmp("cacherace")
    ManifestTable.commit(spark, t,
      spark.range(1000).toDF("id"), SaveMode.Overwrite)
    ManifestTable.cacheTable(spark, t, eager = false)
    try {
      val before = spark.sparkContext.getPersistentRDDs.size
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val gate = new java.util.concurrent.CyclicBarrier(8)
        val futs = (1 to 8).map { _ =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = {
              gate.await() // maximize the window between get and put
              ManifestTable.read(spark, t).count()
            }
          })
        }
        assert(futs.map(_.get()).toSet === Set(1000L))
      } finally pool.shutdown()
      val after = spark.sparkContext.getPersistentRDDs.size
      assert(after <= before + 1,
        s"read race stranded ${after - before - 1} extra persisted frame(s)")
      assert(ManifestTable.isCached(spark, t))
    } finally ManifestTable.uncacheTable(spark, t)
  }

  // ---- OPTIMIZE over a corrupt clusterBy config refuses cleanly ----

  test("plain OPTIMIZE refuses a hand-corrupted 3-dimension clusterBy config") {
    import spark.implicits._
    withTable("ar16_cbad",
      """CREATE TABLE graft.ar16_cbad (a BIGINT, b BIGINT, c BIGINT)
        |CLUSTER BY (a, b) LOCATION '__LOC__'""".stripMargin) { t =>
      spark.sql("INSERT INTO graft.ar16_cbad VALUES (1, 2, 3)")
      // corrupt the config sidecar the way only a hand edit could
      val cfg = java.nio.file.Paths.get(t, "_manifests", "config.json")
      java.nio.file.Files.write(cfg,
        """{"graft.clusterBy":"a,b,c"}""".getBytes("UTF-8"))
      val e = intercept[IllegalArgumentException] {
        spark.sql("OPTIMIZE graft.ar16_cbad").collect() }
      assert(e.getMessage.contains("at most 2") &&
        e.getMessage.contains("graft.clusterBy"), e.getMessage)
    }
  }
}
