package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{GraftCatalog, ManifestTable}

/** `CREATE TABLE … CLUSTER BY (a[, b])` (r16): declarative clustering —
  * the columns are recorded in the config sidecar, stats-tracked from
  * the first insert (skipping on the clustered dims is the point), and
  * plain `OPTIMIZE` re-clusters on them (the declarative spelling of
  * ZORDER BY). */
class ClusterBySpec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_clby_$tag").toString + "/t"

  test("CLUSTER BY records, stats-tracks, and drives plain OPTIMIZE") {
    val t = tmp("basic")
    spark.sql(s"""CREATE TABLE graft.clby_t (id BIGINT, v DOUBLE)
                 |CLUSTER BY (id, v) LOCATION '$t'""".stripMargin)
    try {
      assert(ManifestTable.tableConfig(spark, t)
        .get("graft.clusterBy").contains("id,v"))
      spark.range(0, 1000, 1, 4)
        .selectExpr("id", "CAST(id * 1.5 AS DOUBLE) AS v")
        .createOrReplaceTempView("clby_src")
      spark.sql("INSERT INTO graft.clby_t SELECT * FROM clby_src")
      // clustered columns joined the stats-tracked set with NO
      // statsColumns declaration anywhere
      val stats = ManifestTable.snapshotStats(spark, t).values
        .filter(_.get("__graft_rows").exists(_._2 > 0)) // skip CREATE's empty file
      assert(stats.nonEmpty && stats.forall(m =>
        m.contains("id") && m.contains("v")),
        s"cluster columns must be stats-tracked from birth: $stats")
      // plain OPTIMIZE re-clusters on the recorded dimensions
      val r = spark.sql("OPTIMIZE graft.clby_t").collect()(0)
      assert(r.getString(1) == "cluster(id, v)", r.toString)
      assert(ManifestTable.read(spark, t).count() == 1000)
      // explicit ZORDER BY still overrides
      val r2 = spark.sql("OPTIMIZE graft.clby_t ZORDER BY (id)").collect()(0)
      assert(r2.getString(1) == "zorder(id)", r2.toString)
      // OPTIMIZE WHERE stays the region bin-pack, never a re-cluster
      val r3 = spark.sql("OPTIMIZE graft.clby_t WHERE id < 100").collect()(0)
      assert(r3.getString(1).startsWith("compact-small"), r3.toString)
    } finally GraftCatalog.unregister("clby_t")
  }

  test("CLUSTER BY declaration discipline") {
    // Spark's own parser already refuses the combination (the engine's
    // clusterSplit keeps the same gate for programmatic plans)
    val e1 = intercept[Exception] { spark.sql(
      s"""CREATE TABLE graft.clby_b1 (id BIGINT, p STRING)
         |PARTITIONED BY (p) CLUSTER BY (id) LOCATION '${tmp("b1")}'""".stripMargin) }
    assert(e1.getMessage.contains("Cannot specify both") ||
      e1.getMessage.contains("do not combine"), e1.getMessage)
    val e2 = intercept[Exception] { spark.sql(
      s"""CREATE TABLE graft.clby_b2 (a BIGINT, b BIGINT, c BIGINT)
         |CLUSTER BY (a, b, c) LOCATION '${tmp("b2")}'""".stripMargin) }
    assert(e2.getMessage.contains("at most 2"), e2.getMessage)
    val e3 = intercept[Exception] { spark.sql(
      s"""CREATE TABLE graft.clby_b3 (a BIGINT)
         |CLUSTER BY (zz) LOCATION '${tmp("b3")}'""".stripMargin) }
    assert(e3.getMessage.contains("unknown column"), e3.getMessage)
    Seq("clby_b1", "clby_b2", "clby_b3").foreach(GraftCatalog.unregister)
  }

  test("SHOW TBLPROPERTIES surfaces the config sidecar") {
    val t = tmp("props")
    spark.sql(s"""CREATE TABLE graft.clby_p (id BIGINT, v DOUBLE)
                 |CLUSTER BY (id)
                 |TBLPROPERTIES ('graft.statsColumns' = 'v')
                 |LOCATION '$t'""".stripMargin)
    try {
      val props = spark.sql("SHOW TBLPROPERTIES graft.clby_p").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.clusterBy").contains("id"), props.toString)
      assert(props.get("graft.statsColumns").contains("v"), props.toString)
      assert(spark.sql("SHOW TBLPROPERTIES graft.clby_p ('graft.clusterBy')")
        .collect()(0).getString(1) == "id")
      assert(spark.sql("SHOW TBLPROPERTIES graft.clby_p ('nope')")
        .collect()(0).getString(1).contains("does not have property"))
    } finally GraftCatalog.unregister("clby_p")
  }

  test("SHOW CREATE round-trips CLUSTER BY; REPLACE must re-spell it") {
    val t = tmp("show")
    spark.sql(s"""CREATE TABLE graft.clby_s (id BIGINT, v DOUBLE)
                 |CLUSTER BY (id) LOCATION '$t'""".stripMargin)
    try {
      val stmt = spark.sql("SHOW CREATE TABLE graft.clby_s")
        .collect()(0).getString(0)
      assert(stmt.contains("CLUSTER BY (id)"), stmt)
      assert(!stmt.contains("graft.clusterBy"),
        s"clustering is a clause, not a TBLPROPERTY: $stmt")
      // same CLUSTER BY re-spelled: idempotent replay passes
      spark.sql(s"""CREATE OR REPLACE TABLE graft.clby_s (id BIGINT, v DOUBLE)
                   |CLUSTER BY (id) LOCATION '$t'""".stripMargin)
      // different clustering: the config sidecar is create-time
      val e = intercept[Exception] { spark.sql(
        s"""CREATE OR REPLACE TABLE graft.clby_s (id BIGINT, v DOUBLE)
           |CLUSTER BY (v) LOCATION '$t'""".stripMargin) }
      assert(e.getMessage.contains("create-time"), e.getMessage)
    } finally GraftCatalog.unregister("clby_s")
  }
}
