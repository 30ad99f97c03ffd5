package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col
import graft.sources.{GraftCatalog, ManifestTable}

/** Pins the r14 verdict's ranked asks.
  *
  *  1. dynamic `INSERT OVERWRITE` on partitioned tables (lowered to
  *     replaceWhere over the batch's partition tuples; untouched
  *     partitions carried by reference; unbounded/hidden-transform
  *     cases refused with guidance);
  *  2. quote-aware maintenance grammar (string literals carrying
  *     SELECT / ZORDER BY never mis-split) + backtick-quoted names;
  *  3. MERGE expression join keys (`ON t.k = s.k + 1`) with the key
  *     envelope on the EVALUATED values — incl. the reconcile race;
  *  5. `ALTER TABLE graft.a RENAME TO graft.b` (metadata-only; the
  *     old name errors with a pointer);
  *  7. CDC classification through replaceWhere (delete+insert, no
  *     spurious updates) and updateWhere (update_post). */
class Round15Spec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_r15_$tag").toString + "/t"

  /** ReconcileSpec's deterministic race harness: fire `interloper`
    * once at the first conditional-commit point; count derives. */
  private def raced[A](interloper: => Unit)(body: => A): (A, Int) = {
    var attempts = 0
    var fired = false
    var inside = false
    ManifestTable.beforeConditionalCommit = () => {
      if (!inside) {
        attempts += 1
        if (!fired) {
          fired = true; inside = true
          try interloper finally inside = false
        }
      }
    }
    try { val r = body; (r, attempts) }
    finally ManifestTable.beforeConditionalCommit = () => ()
  }

  // ---- 1. dynamic INSERT OVERWRITE ---------------------------------

  test("INSERT OVERWRITE on a partitioned table replaces exactly the batch's partitions") {
    import spark.implicits._
    val t = tmp("dyn")
    ManifestTable.commit(spark, t,
      Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "c", 4.0))
        .toDF("id", "p", "v"),
      SaveMode.Overwrite, partitionBy = Seq("p"))
    GraftCatalog.register("r15_dyn", t)
    try {
      val cFilesBefore = ManifestTable.snapshotFiles(spark, t)
        .filter(_.contains("p=c")).toSet
      Seq((10L, "a", 10.0), (30L, "b", 30.0)).toDF("id", "p", "v")
        .createOrReplaceTempView("v_r15_dyn")
      // positional assignment against the RECORDED order (identity
      // partition columns record last): (id, v, p)
      spark.sql("INSERT OVERWRITE graft.r15_dyn SELECT id, v, p FROM v_r15_dyn")
      assert(ManifestTable.commitOp(spark, t).contains("replace-where"),
        "dynamic overwrite must land as ONE atomic replaceWhere commit")
      assert(ManifestTable.currentVersion(spark, t) === 2)
      val rows = ManifestTable.read(spark, t)
        .select("id", "p", "v").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(rows === Set((10L, "a", 10.0), (30L, "b", 30.0), (4L, "c", 4.0)),
        "batch partitions replaced, untouched partition intact")
      val cFilesAfter = ManifestTable.snapshotFiles(spark, t)
        .filter(_.contains("p=c")).toSet
      assert(cFilesAfter === cFilesBefore,
        "untouched partitions must carry by file reference, not rewrite")
    } finally GraftCatalog.unregister("r15_dyn")
  }

  test("INSERT OVERWRITE refuses hidden-transform layouts and unbounded partition sets") {
    import spark.implicits._
    val t = tmp("dynref")
    ManifestTable.commit(spark, t,
      (0 until 4).map(i => (i.toLong, s"p${i % 2}")).toDF("id", "p"),
      SaveMode.Overwrite, partitionBy = Seq("p"))
    GraftCatalog.register("r15_dynref", t)
    try {
      // >1000 distinct partition tuples: enumerating the region
      // predicate stops paying for itself — refuse with guidance
      spark.range(1001)
        .select(col("id"), col("id").cast("string").as("p"))
        .createOrReplaceTempView("v_r15_wide")
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE graft.r15_dynref SELECT id, p FROM v_r15_wide")
      }
      assert(e.getMessage.contains("spans more than"), e.getMessage)
      // hidden transforms: the physical region is not spellable over
      // the read frame — point at REPLACE WHERE instead
      val t2 = tmp("dynbkt")
      spark.sql(s"""CREATE TABLE graft.r15_dynbkt (id BIGINT, p STRING)
                   |PARTITIONED BY (p, bucket(4, id))
                   |LOCATION '$t2'""".stripMargin)
      try {
        spark.sql("INSERT INTO graft.r15_dynbkt VALUES (1, 'a')")
        val e2 = intercept[Exception] {
          spark.sql("INSERT OVERWRITE graft.r15_dynbkt VALUES (2, 'a')")
        }
        assert(e2.getMessage.contains("REPLACE WHERE"), e2.getMessage)
      } finally GraftCatalog.unregister("r15_dynbkt")
    } finally GraftCatalog.unregister("r15_dynref")
  }

  // ---- 2. quote-aware grammar + backtick names ----------------------

  test("REPLACE WHERE splits the condition at the first SELECT outside string literals") {
    import spark.implicits._
    val t = tmp("qsel")
    ManifestTable.commit(spark, t,
      Seq((1L, "a SELECT b"), (2L, "other")).toDF("id", "note"),
      SaveMode.Overwrite)
    GraftCatalog.register("r15_qsel", t)
    try {
      Seq((10L, "a SELECT b")).toDF("id", "note")
        .createOrReplaceTempView("v_r15_qsel")
      spark.sql("INSERT INTO graft.r15_qsel REPLACE WHERE " +
        "note = 'a SELECT b' SELECT id, note FROM v_r15_qsel")
      val rows = ManifestTable.read(spark, t).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows === Set((10L, "a SELECT b"), (2L, "other")))
    } finally GraftCatalog.unregister("r15_qsel")
  }

  test("OPTIMIZE WHERE tolerates ZORDER-bearing string literals; backtick names reach the maintenance grammar") {
    import spark.implicits._
    val t = tmp("bt")
    ManifestTable.commit(spark, t,
      (0 until 20).map(i => (i.toLong, s"note ZORDER BY (v$i)"))
        .toDF("id", "note"),
      SaveMode.Overwrite, statsColumns = Seq("id"))
    // a name the plain identifier grammar cannot spell
    GraftCatalog.register("bt-table", t)
    try {
      // the literal contains 'ZORDER BY (' — the quote-aware scan must
      // treat the whole thing as the WHERE predicate
      spark.sql("OPTIMIZE graft.`bt-table` WHERE note = 'x ZORDER BY (v)'")
      // read-only maintenance statements through the backtick spelling
      assert(spark.sql("DESCRIBE DETAIL graft.`bt-table`").count() === 1)
      assert(spark.sql(
        "VACUUM graft.`bt-table` RETAIN 5 VERSIONS DRY RUN").count() >= 0)
      assert(spark.sql("DESCRIBE HISTORY graft.`bt-table`").count() >= 1)
      // and a real mutation: RESTORE by backtick name round-trips
      ManifestTable.commit(spark, t, Seq((100L, "late")).toDF("id", "note"))
      spark.sql("RESTORE TABLE graft.`bt-table` TO VERSION AS OF 1")
      assert(ManifestTable.read(spark, t).count() === 20)
    } finally GraftCatalog.unregister("bt-table")
  }

  // ---- 3. MERGE expression join keys --------------------------------

  test("MERGE ON t.k = s.k + 1 maps the source key; SET * and INSERT * land in the mapped space") {
    import spark.implicits._
    val t = tmp("mek")
    ManifestTable.commit(spark, t,
      Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("k", "v"),
      SaveMode.Overwrite, statsColumns = Seq("k"))
    GraftCatalog.register("r15_mek", t)
    try {
      // a key-mapped CDC feed: its key space is off by one
      Seq((9L, "A"), (19L, "B"), (99L, "new")).toDF("k", "v")
        .createOrReplaceTempView("v_r15_mek")
      spark.sql("""MERGE INTO graft.r15_mek AS t USING v_r15_mek AS s
                  |ON t.k = s.k + 1
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val rows = ManifestTable.read(spark, t).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows === Set((10L, "A"), (20L, "B"), (30L, "c"), (100L, "new")),
        "matched rows update IN their key (mapped), inserts land mapped")
      // reversed orientation and a source-aliased expression both parse
      spark.sql("""MERGE INTO graft.r15_mek AS t USING v_r15_mek AS s
                  |ON s.k + 1 = t.k
                  |WHEN MATCHED AND s.v = 'A' THEN DELETE""".stripMargin)
      assert(ManifestTable.read(spark, t).count() === 3)
      // a target-column reference on the expression side refuses loudly
      val e = intercept[Exception] {
        spark.sql("""MERGE INTO graft.r15_mek AS t USING v_r15_mek AS s
                    |ON t.k = t.k + 1
                    |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      }
      assert(e.getMessage.contains("SOURCE columns"), e.getMessage)
    } finally GraftCatalog.unregister("r15_mek")
  }

  test("expression-key merge races: mapped-key conflict re-derives, disjoint interloper reconciles") {
    import spark.implicits._
    val t = tmp("mekrace")
    ManifestTable.commit(spark, t, Seq((10L, "a")).toDF("k", "v"),
      statsColumns = Seq("k"))
    GraftCatalog.register("r15_mekrace", t)
    try {
      Seq((19L, "B")).toDF("k", "v").createOrReplaceTempView("v_r15_mekr")
      // the interloper appends the MAPPED key (19 + 1 = 20): carrying
      // the stale derivation would duplicate it — must re-derive
      val (_, attempts) = raced {
        ManifestTable.commit(spark, t, Seq((20L, "thief")).toDF("k", "v"))
      } {
        spark.sql("""MERGE INTO graft.r15_mekrace AS t USING v_r15_mekr AS s
                    |ON t.k = s.k + 1
                    |WHEN MATCHED THEN UPDATE SET *
                    |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      }
      assert(attempts === 2,
        s"an interloper holding the EVALUATED key must force a re-derive " +
          s"(saw $attempts derives)")
      val rows = ManifestTable.read(spark, t).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows === Set((10L, "a"), (20L, "B")),
        "the merge must serialize after the interloper and win key 20 once")
      // key-disjoint interloper: the derivation republishes, one derive
      Seq((29L, "C")).toDF("k", "v").createOrReplaceTempView("v_r15_mekr2")
      val (_, attempts2) = raced {
        ManifestTable.commit(spark, t, Seq((999L, "z")).toDF("k", "v"))
      } {
        spark.sql("""MERGE INTO graft.r15_mekrace AS t USING v_r15_mekr2 AS s
                    |ON t.k = s.k + 1
                    |WHEN MATCHED THEN UPDATE SET *
                    |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      }
      assert(attempts2 === 1,
        s"a key-disjoint interleave must reconcile (saw $attempts2 derives)")
      assert(ManifestTable.read(spark, t).count() === 4)
    } finally GraftCatalog.unregister("r15_mekrace")
  }

  // ---- 5. ALTER TABLE RENAME TO --------------------------------------

  test("ALTER TABLE graft.a RENAME TO graft.b: name moves, bytes and history stay") {
    import spark.implicits._
    val t = tmp("ren")
    spark.sql(s"""CREATE TABLE graft.r15_ren (id BIGINT, v STRING)
                 |LOCATION '$t'""".stripMargin)
    try {
      spark.sql("INSERT INTO graft.r15_ren VALUES (1, 'a'), (2, 'b')")
      spark.sql("INSERT INTO graft.r15_ren VALUES (3, 'c')")
      spark.sql("ALTER TABLE graft.r15_ren RENAME TO graft.r15_ren2")
      // new name answers; the directory never moved
      assert(GraftCatalog.lookup("r15_ren2").contains(t))
      assert(spark.sql("SELECT * FROM graft.r15_ren2").count() === 3)
      // history and time travel intact under the new name
      assert(spark.sql("DESCRIBE HISTORY graft.r15_ren2").count() === 3)
      assert(spark.sql("SELECT * FROM graft.`r15_ren2@v2`").count() === 2)
      // the old name refuses WITH guidance
      val e = intercept[Exception] {
        spark.sql("DESCRIBE DETAIL graft.r15_ren")
      }
      assert(e.getMessage.contains("renamed to graft.r15_ren2"), e.getMessage)
      // renaming onto a live name refuses
      val t3 = tmp("ren3")
      spark.sql(s"CREATE TABLE graft.r15_ren3 (id BIGINT) LOCATION '$t3'")
      val e2 = intercept[Exception] {
        spark.sql("ALTER TABLE graft.r15_ren2 RENAME TO graft.r15_ren3")
      }
      assert(e2.getMessage.contains("already registered"), e2.getMessage)
    } finally {
      GraftCatalog.unregister("r15_ren")
      GraftCatalog.unregister("r15_ren2")
      GraftCatalog.unregister("r15_ren3")
    }
  }

  // ---- 7. CDC classification through replaceWhere / updateWhere ------

  test("rowChanges: replaceWhere emits delete+insert for churned keys, nothing for identical survivors") {
    import spark.implicits._
    val t = tmp("cdc")
    def df(rows: (Long, String, String)*): DataFrame =
      rows.toDF("id", "v", "region")
    val v1 = ManifestTable.commit(spark, t,
      df((1L, "a", "r1"), (2L, "b", "r1"), (3L, "c", "r2")),
      SaveMode.Overwrite)
    // the swapped-in batch keeps key 2 BYTE-IDENTICAL, drops key 1,
    // adds key 4 — the feed must say delete(1), insert(4), and stay
    // silent on 2 (no spurious update from the physical rewrite)
    ManifestTable.replaceWhere(spark, t, col("region") === "r1",
      df((2L, "b", "r1"), (4L, "d", "r1")))
    val feed = ManifestTable.rowChanges(spark, t, v1, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(feed === Set((1L, "delete"), (4L, "insert")),
      s"replace-where must classify as delete+insert, got $feed")
    // updateWhere: a predicate update surfaces as update_post
    val v2 = ManifestTable.currentVersion(spark, t)
    ManifestTable.updateWhere(spark, t,
      Seq("v" -> org.apache.spark.sql.functions.lit("D2")),
      col("id") === 4L)
    val feed2 = ManifestTable.rowChanges(spark, t, v2, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
    assert(feed2 === Set((4L, "D2", "update_post")),
      s"updateWhere must classify as update_post, got $feed2")
  }
}
