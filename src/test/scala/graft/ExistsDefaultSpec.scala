package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col
import graft.sources.{ColumnSpecs, GraftCatalog, ManifestTable}

/** Exists-default ADD COLUMN (r17, the Delta allowColumnDefaults
  * shape): `ALTER TABLE … ADD COLUMNS (c T DEFAULT e)` records the
  * fill at ADD time — pre-add files surface the frozen literal on
  * READ (no backfill rewrite), post-add writers store real values
  * (including explicit NULL), and the same expression doubles as the
  * CURRENT default future inserts fill. */
class ExistsDefaultSpec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_exd_$tag").toString + "/t"

  private def freshTable(name: String, rows: Int = 3): String = {
    import spark.implicits._
    val t = tmp(name)
    ManifestTable.commit(spark, t,
      (1 to rows).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      SaveMode.Overwrite)
    GraftCatalog.register(name, t)
    t
  }

  test("pre-add rows read the fill; post-add rows read their values, NULL included") {
    val t = freshTable("exd_basic")
    try {
      spark.sql(
        "ALTER TABLE graft.exd_basic ADD COLUMNS (cat STRING DEFAULT 'legacy')")
      // every pre-add row surfaces the fill, not null
      val pre = spark.sql("SELECT id, cat FROM graft.exd_basic").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(pre === Map(1L -> "legacy", 2L -> "legacy", 3L -> "legacy"))
      // post-add: explicit value, omitted (current default), explicit NULL
      spark.sql("INSERT INTO graft.exd_basic VALUES (4, 'r4', 'fresh')")
      spark.sql("INSERT INTO graft.exd_basic (id, s) VALUES (5, 'r5')")
      spark.sql("INSERT INTO graft.exd_basic VALUES (6, 'r6', NULL)")
      val all = spark.sql("SELECT id, cat FROM graft.exd_basic").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(all === Map(1L -> Some("legacy"), 2L -> Some("legacy"),
        3L -> Some("legacy"), 4L -> Some("fresh"), 5L -> Some("legacy"),
        6L -> None),
        "explicit NULL must STAY null — the fill applies to pre-add files only")
      // filters and aggregates see the fill (constant-folded, per group)
      assert(spark.sql(
        "SELECT count(*) FROM graft.exd_basic WHERE cat = 'legacy'")
        .head().getLong(0) == 4L)
      assert(spark.sql(
        """SELECT cat, count(*) AS n FROM graft.exd_basic
          |GROUP BY cat ORDER BY cat NULLS FIRST""".stripMargin).collect()
        .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap ===
        Map(None -> 1L, Some("fresh") -> 1L, Some("legacy") -> 4L))
    } finally GraftCatalog.unregister("exd_basic")
  }

  test("the fill FREEZES at ADD time: current_timestamp() pins, rand() refuses") {
    val t = freshTable("exd_frz")
    try {
      spark.sql("ALTER TABLE graft.exd_frz ADD COLUMNS " +
        "(seen TIMESTAMP DEFAULT current_timestamp())")
      val field = ManifestTable.snapshotSchema(spark, t).get
        .fields.find(_.name == "seen").get
      val frozenLit = ColumnSpecs.existsDefaultOf(field).get
      assert(frozenLit.toUpperCase.startsWith("TIMESTAMP"),
        s"the exists-default must be a frozen literal, got: $frozenLit")
      // two reads, arbitrarily later, surface the SAME instant
      val a = spark.sql("SELECT seen FROM graft.exd_frz LIMIT 1").head().getTimestamp(0)
      Thread.sleep(5)
      val b = spark.sql("SELECT seen FROM graft.exd_frz LIMIT 1").head().getTimestamp(0)
      assert(a == b, "the exists fill must be one frozen instant")
      // the CURRENT default stays the live expression for inserts
      assert(ColumnSpecs.defaultOf(field).get.toLowerCase
        .contains("current_timestamp"))
      val e = intercept[Exception] { spark.sql(
        "ALTER TABLE graft.exd_frz ADD COLUMNS (x DOUBLE DEFAULT rand())") }
      assert(e.getMessage.contains("non-deterministic"), e.getMessage)
    } finally GraftCatalog.unregister("exd_frz")
  }

  test("refusals: column refs, non-casting values, nested targets") {
    freshTable("exd_ref")
    try {
      val e1 = intercept[Exception] { spark.sql(
        "ALTER TABLE graft.exd_ref ADD COLUMNS (x BIGINT DEFAULT id + 1)") }
      assert(e1.getMessage.contains("column-free"), e1.getMessage)
      val e2 = intercept[Exception] { spark.sql(
        "ALTER TABLE graft.exd_ref ADD COLUMNS (x INT DEFAULT 'abc')") }
      assert(e2.getMessage.contains("casts to"), e2.getMessage)
      spark.sql("ALTER TABLE graft.exd_ref ADD COLUMNS (st STRUCT<a: INT>)")
      val e3 = intercept[Exception] { spark.sql(
        "ALTER TABLE graft.exd_ref ADD COLUMNS (st.b INT DEFAULT 7)") }
      assert(e3.getMessage.contains("top-level"), e3.getMessage)
    } finally GraftCatalog.unregister("exd_ref")
  }

  test("UPDATE/DELETE predicates see the fill; rewrites bake it") {
    val t = freshTable("exd_dml")
    try {
      spark.sql(
        "ALTER TABLE graft.exd_dml ADD COLUMNS (cat STRING DEFAULT 'legacy')")
      spark.sql("INSERT INTO graft.exd_dml VALUES (4, 'r4', 'fresh')")
      // predicate on the filled column targets pre-add rows
      spark.sql("UPDATE graft.exd_dml SET s = 'seen' WHERE cat = 'legacy' AND id = 1")
      val got = spark.sql("SELECT id, s, cat FROM graft.exd_dml").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
      assert(got(1L) === (("seen", "legacy")),
        "the rewrite must BAKE the fill into the post-image")
      assert(got(2L) === (("r2", "legacy")) && got(4L) === (("r4", "fresh")))
      spark.sql("DELETE FROM graft.exd_dml WHERE cat = 'legacy' AND id = 2")
      assert(spark.sql("SELECT count(*) FROM graft.exd_dml").head().getLong(0) == 3L)
    } finally GraftCatalog.unregister("exd_dml")
  }

  test("compaction bakes the fill; expire of the ADD-era manifests cannot lose it") {
    val t = freshTable("exd_opt", rows = 5)
    try {
      spark.sql(
        "ALTER TABLE graft.exd_opt ADD COLUMNS (cat STRING DEFAULT 'legacy')")
      spark.sql("INSERT INTO graft.exd_opt VALUES (6, 'r6', 'fresh')")
      spark.sql("OPTIMIZE graft.exd_opt").collect()
      // post-compaction files are POST-add: values now physical
      val afterOpt = spark.sql(
        "SELECT count(*) FROM graft.exd_opt WHERE cat = 'legacy'")
        .head().getLong(0)
      assert(afterOpt == 5L, s"compaction must bake the fill, got $afterOpt")
      // expire everything but the head: the classification must
      // survive without any historical manifest (sidecar, not lineage)
      ManifestTable.expire(spark, t, keepLast = 1)
      assert(spark.sql(
        "SELECT count(*) FROM graft.exd_opt WHERE cat = 'legacy'")
        .head().getLong(0) == 5L)
    } finally GraftCatalog.unregister("exd_opt")
  }

  test("expire-survival holds even with pre-add files still LIVE at head") {
    val t = freshTable("exd_exp")
    try {
      spark.sql(
        "ALTER TABLE graft.exd_exp ADD COLUMNS (cat STRING DEFAULT 'legacy')")
      spark.sql("INSERT INTO graft.exd_exp VALUES (4, 'r4', 'fresh')")
      (1 to 3).foreach(i =>
        spark.sql(s"INSERT INTO graft.exd_exp VALUES (${10 + i}, 'x', 'new')"))
      ManifestTable.expire(spark, t, keepLast = 1) // ADD-era manifests gone
      val got = spark.sql("SELECT id, cat FROM graft.exd_exp WHERE id <= 3")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === Map(1L -> "legacy", 2L -> "legacy", 3L -> "legacy"),
        "pre-add files must keep their fill after the ADD version expires")
    } finally GraftCatalog.unregister("exd_exp")
  }

  test("SHALLOW CLONE carries the census; time travel respects the add boundary") {
    val t = freshTable("exd_cl")
    val preAddVersion = ManifestTable.currentVersion(spark, t)
    try {
      spark.sql(
        "ALTER TABLE graft.exd_cl ADD COLUMNS (cat STRING DEFAULT 'legacy')")
      // time travel: before the add there IS no column; after, the fill
      assert(!ManifestTable.read(spark, t, preAddVersion)
        .columns.contains("cat"))
      val c = tmp("exd_clone")
      spark.sql(s"CREATE TABLE graft.exd_cl2 SHALLOW CLONE graft.exd_cl " +
        s"LOCATION '$c'")
      val got = spark.sql("SELECT id, cat FROM graft.exd_cl2").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === Map(1L -> "legacy", 2L -> "legacy", 3L -> "legacy"),
        "the clone must classify the donor's pre-add files identically")
    } finally { cleanupNames() }
  }

  private def cleanupNames(): Unit =
    Seq("exd_cl", "exd_cl2").foreach(GraftCatalog.unregister)

  test("the fill is a codegen CONSTANT: filters on it fold instead of reaching the scan") {
    freshTable("exd_fold")
    try {
      spark.sql(
        "ALTER TABLE graft.exd_fold ADD COLUMNS (cat STRING DEFAULT 'legacy')")
      // all files are pre-add → the fill column is a literal: a match
      // folds the Filter away entirely …
      val hit = spark.sql(
        "SELECT id FROM graft.exd_fold WHERE cat = 'legacy'")
      assert(!hit.queryExecution.optimizedPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter]),
        s"a tautological fill filter must fold:\n" +
          hit.queryExecution.optimizedPlan)
      assert(hit.count() == 3)
      // … and a mismatch folds the whole scan to an empty relation
      val miss = spark.sql(
        "SELECT id FROM graft.exd_fold WHERE cat = 'other'")
      assert(miss.queryExecution.optimizedPlan.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
        s"a contradictory fill filter must fold to empty:\n" +
          miss.queryExecution.optimizedPlan)
      assert(miss.isEmpty)
    } finally GraftCatalog.unregister("exd_fold")
  }

  test("RENAME COLUMN on a filled column: the census keys by physical name and survives (r18)") {
    val t = freshTable("exd_ren")
    try {
      spark.sql(
        "ALTER TABLE graft.exd_ren ADD COLUMNS (cat STRING DEFAULT 'legacy')")
      spark.sql("INSERT INTO graft.exd_ren VALUES (4, 'r4', 'fresh')")
      spark.sql("ALTER TABLE graft.exd_ren RENAME COLUMN cat TO category")
      // pre-add files still classify (the census is keyed by the
      // PHYSICAL name, which a rename never changes)
      val all = spark.sql("SELECT id, category FROM graft.exd_ren").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(all === Map(1L -> Some("legacy"), 2L -> Some("legacy"),
        3L -> Some("legacy"), 4L -> Some("fresh")),
        "the exists fill must survive RENAME COLUMN")
      // the renamed column keeps filling omitted inserts
      spark.sql("INSERT INTO graft.exd_ren (id, s) VALUES (5, 'r5')")
      assert(spark.sql(
        "SELECT category FROM graft.exd_ren WHERE id = 5")
        .head().getString(0) == "legacy")
      // re-ADDing the VACATED name is a fresh column with its own
      // census — the old column's fill must not bleed into it
      spark.sql(
        "ALTER TABLE graft.exd_ren ADD COLUMNS (cat STRING DEFAULT 'second')")
      val pair = spark.sql(
        "SELECT category, cat FROM graft.exd_ren WHERE id = 1").head()
      assert(pair.getString(0) == "legacy" && pair.getString(1) == "second",
        s"censuses must not cross physical names: $pair")
    } finally GraftCatalog.unregister("exd_ren")
  }

  test("widenColumn over a filled column re-types the frozen literal (r18)") {
    import spark.implicits._
    import org.apache.spark.sql.types.LongType
    val t = tmp("exd_wid")
    ManifestTable.commit(spark, t,
      (1 to 3).map(i => (i.toLong, s"r$i")).toDF("id", "s"),
      SaveMode.Overwrite)
    GraftCatalog.register("exd_wid", t)
    try {
      spark.sql("ALTER TABLE graft.exd_wid ADD COLUMNS (qty INT DEFAULT 7)")
      spark.sql("INSERT INTO graft.exd_wid VALUES (4, 'r4', 9)")
      ManifestTable.widenColumn(spark, t, "qty", LongType)
      // pre-add fill surfaces AS LONG; stored int pages up-cast
      val got = spark.sql("SELECT id, qty FROM graft.exd_wid").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 7L, 2L -> 7L, 3L -> 7L, 4L -> 9L),
        "the frozen literal must re-type with the widened column")
      // omitted inserts keep filling at the widened type…
      spark.sql("INSERT INTO graft.exd_wid (id, s) VALUES (5, 'r5')")
      assert(spark.sql("SELECT qty FROM graft.exd_wid WHERE id = 5")
        .head().getLong(0) == 7L)
      // …and explicit values past int range store fine
      spark.sql("INSERT INTO graft.exd_wid VALUES (6, 'r6', 5000000000)")
      assert(spark.sql("SELECT sum(qty) AS s FROM graft.exd_wid")
        .head().getLong(0) == 7L * 4 + 9L + 5000000000L)
    } finally GraftCatalog.unregister("exd_wid")
  }

  test("SET/DROP DEFAULT edits the CURRENT default, never the exists fill") {
    freshTable("exd_set")
    try {
      spark.sql(
        "ALTER TABLE graft.exd_set ADD COLUMNS (cat STRING DEFAULT 'legacy')")
      spark.sql("ALTER TABLE graft.exd_set ALTER COLUMN cat SET DEFAULT 'v2'")
      spark.sql("INSERT INTO graft.exd_set (id, s) VALUES (4, 'r4')")
      spark.sql("ALTER TABLE graft.exd_set ALTER COLUMN cat DROP DEFAULT")
      val got = spark.sql("SELECT id, cat FROM graft.exd_set").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === Map(1L -> "legacy", 2L -> "legacy", 3L -> "legacy",
        4L -> "v2"),
        "pre-add rows keep the ORIGINAL frozen fill through default edits")
    } finally GraftCatalog.unregister("exd_set")
  }
}
