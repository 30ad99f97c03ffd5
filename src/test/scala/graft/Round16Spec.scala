package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import graft.sources.{GraftCatalog, ManifestTable}

/** Pins the r15 verdict's ranked asks + the r15 advisory fixes.
  *
  *  - static `PARTITION (p = 'x'[, q])` INSERT (the r15 half-build,
  *    finished): typed-literal injection, OVERWRITE region scoping
  *    (all-static = ONE replaceWhere with zero enumeration passes;
  *    mixed = static slice ∧ dynamic-remainder enumeration), and the
  *    full refusal surface (wrong column, partial mention,
  *    unpartitioned table, transform layout, IF NOT EXISTS,
  *    non-casting value, null-casting value);
  *  - MERGE swap keys (`ON t.a = s.b AND t.b = s.a`) — every mapped
  *    key evaluates against the RAW source frame in one projection,
  *    never a sequential fold that would read a replaced column;
  *  - quote-aware statement scanning extended to double-quoted
  *    literals and backtick identifier runs;
  *  - rename hints survive chains (a→b→c points a at c) and clear
  *    when a name is re-registered. */
class Round16Spec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_r16_$tag").toString + "/t"

  // ---- static PARTITION: append ------------------------------------

  test("INSERT INTO … PARTITION (p = 'x') injects the typed static value") {
    import spark.implicits._
    val t = tmp("stat")
    ManifestTable.commit(spark, t,
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "p", "v"),
      SaveMode.Overwrite, partitionBy = Seq("p"))
    GraftCatalog.register("r16_stat", t)
    try {
      // the query carries ONLY the non-static columns, recorded order
      spark.sql(
        "INSERT INTO graft.r16_stat PARTITION (p = 'a') VALUES (3, 3.0)")
      val got = ManifestTable.read(spark, t)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("p")).toMap
      assert(got === Map(1L -> "a", 2L -> "b", 3L -> "a"))
      assert(ManifestTable.snapshotFiles(spark, t).forall(_.contains("p=")),
        "the injected static column must land in the partition layout")
    } finally GraftCatalog.unregister("r16_stat")
  }

  test("static PARTITION values are driver-validated typed literals") {
    import spark.implicits._
    val t = tmp("typed")
    ManifestTable.commit(spark, t,
      Seq((1L, 7, 1.0)).toDF("id", "p", "v"),
      SaveMode.Overwrite, partitionBy = Seq("p"))
    GraftCatalog.register("r16_typed", t)
    try {
      // '8' casts to the recorded INT partition type
      spark.sql("INSERT INTO graft.r16_typed PARTITION (p = '8') VALUES (2, 2.0)")
      assert(ManifestTable.read(spark, t)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("p")).toMap
        === Map(1L -> 7, 2L -> 8))
      // 'oops' does not — the STATEMENT fails, never a null partition
      val e = intercept[Exception](spark.sql(
        "INSERT INTO graft.r16_typed PARTITION (p = 'oops') VALUES (3, 3.0)"))
      assert(e.getMessage.contains("does not cast") ||
        Option(e.getCause).exists(_.getMessage.contains("does not cast")),
        e.getMessage)
      assert(ManifestTable.read(spark, t).count() === 2,
        "a refused statement must leave the table untouched")
    } finally GraftCatalog.unregister("r16_typed")
  }

  // ---- static PARTITION: OVERWRITE region --------------------------

  test("INSERT OVERWRITE … PARTITION (p = 'x') replaces exactly that region, no enumeration") {
    import spark.implicits._
    val t = tmp("ovr")
    ManifestTable.commit(spark, t,
      Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "c", 4.0))
        .toDF("id", "p", "v"),
      SaveMode.Overwrite, partitionBy = Seq("p"))
    GraftCatalog.register("r16_ovr", t)
    try {
      val keepBefore = ManifestTable.snapshotFiles(spark, t)
        .filterNot(_.contains("p=a")).toSet
      spark.sql(
        "INSERT OVERWRITE graft.r16_ovr PARTITION (p = 'a') VALUES (10, 10.0)")
      assert(ManifestTable.commitOp(spark, t).contains("replace-where"),
        "all-static overwrite must land as ONE replace-where commit")
      assert(ManifestTable.currentVersion(spark, t) === 2)
      val got = ManifestTable.read(spark, t)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("p")).toMap
      assert(got === Map(10L -> "a", 3L -> "b", 4L -> "c"))
      assert(ManifestTable.snapshotFiles(spark, t)
        .filterNot(_.contains("p=a")).toSet === keepBefore,
        "untouched partitions must carry by file reference")
    } finally GraftCatalog.unregister("r16_ovr")
  }

  test("mixed static+dynamic PARTITION overwrite scopes to static ∧ enumerated-dynamic") {
    import spark.implicits._
    val t = tmp("mix")
    ManifestTable.commit(spark, t,
      Seq((1L, "a", 1, 1.0), (2L, "a", 2, 2.0),
          (3L, "b", 1, 3.0), (4L, "b", 2, 4.0))
        .toDF("id", "p", "q", "v"),
      SaveMode.Overwrite, partitionBy = Seq("p", "q"))
    GraftCatalog.register("r16_mix", t)
    try {
      // static p='a', dynamic q: the batch only carries q=1, so
      // (a,2), (b,1), (b,2) must all survive. The query side is the
      // recorded order MINUS the static column — (id, v, q), dynamic
      // partition last, Hive's own column contract.
      spark.sql(
        """INSERT OVERWRITE graft.r16_mix PARTITION (p = 'a', q)
          |VALUES (10, 10.0, 1)""".stripMargin)
      assert(ManifestTable.commitOp(spark, t).contains("replace-where"))
      val got = ManifestTable.read(spark, t)
        .collect().map(r => r.getAs[Long]("id") ->
          ((r.getAs[String]("p"), r.getAs[Int]("q")))).toMap
      assert(got === Map(10L -> (("a", 1)), 2L -> (("a", 2)),
        3L -> (("b", 1)), 4L -> (("b", 2))),
        s"only the (a,1) region may be replaced, got $got")
    } finally GraftCatalog.unregister("r16_mix")
  }

  // ---- static PARTITION: the refusal surface -----------------------

  test("static PARTITION refusals: wrong column, partial mention, unpartitioned, transform, IF NOT EXISTS, null value") {
    import spark.implicits._
    val t = tmp("ref")
    ManifestTable.commit(spark, t,
      Seq((1L, "a", 1, 1.0)).toDF("id", "p", "q", "v"),
      SaveMode.Overwrite, partitionBy = Seq("p", "q"))
    GraftCatalog.register("r16_ref", t)
    val tFlat = tmp("ref_flat")
    ManifestTable.commit(spark, tFlat, Seq((1L, 1.0)).toDF("id", "v"),
      SaveMode.Overwrite)
    GraftCatalog.register("r16_ref_flat", tFlat)
    val tTr = tmp("ref_tr")
    ManifestTable.commit(spark, tTr, Seq((1L, 1.0)).toDF("id", "v"),
      SaveMode.Overwrite, partitionBy = Seq("bucket(4,id)"))
    GraftCatalog.register("r16_ref_tr", tTr)
    try {
      def refuse(sql: String, needle: String): Unit = {
        val e = intercept[Exception](spark.sql(sql))
        def all(x: Throwable): Seq[String] =
          if (x == null) Nil else Option(x.getMessage).toSeq ++ all(x.getCause)
        assert(all(e).exists(_.contains(needle)),
          s"expected '$needle' in: ${all(e).mkString(" | ")}")
      }
      refuse("INSERT INTO graft.r16_ref PARTITION (nope = 'x', q) VALUES (1, 1, 1.0)",
        "not a partition column")
      refuse("INSERT INTO graft.r16_ref PARTITION (p = 'x') VALUES (1, 1, 1.0)",
        "must mention every partition column")
      refuse("INSERT INTO graft.r16_ref_flat PARTITION (p = 'x') VALUES (1, 1.0)",
        "unpartitioned")
      refuse("INSERT INTO graft.r16_ref_tr PARTITION (id_bucket = '1') VALUES (1, 1.0)",
        "transform")
      refuse("INSERT INTO graft.r16_ref PARTITION (p = 'x', q = '1') IF NOT EXISTS VALUES (1, 1.0)",
        "IF NOT EXISTS")
      // a value that CASTS TO NULL is refused (null regions must be
      // written dynamically, where the row carries the null)
      val tInt = tmp("ref_int")
      ManifestTable.commit(spark, tInt, Seq((1L, 5, 1.0)).toDF("id", "p", "v"),
        SaveMode.Overwrite, partitionBy = Seq("p"))
      GraftCatalog.register("r16_ref_int", tInt)
      try refuse("INSERT INTO graft.r16_ref_int PARTITION (p = null) VALUES (2, 2.0)",
        "NULL")
      finally GraftCatalog.unregister("r16_ref_int")
    } finally Seq("r16_ref", "r16_ref_flat", "r16_ref_tr")
      .foreach(GraftCatalog.unregister)
  }

  // ---- MERGE swap keys (ADVICE r15: one projection, raw frame) -----

  test("MERGE ON t.a = s.b AND t.b = s.a evaluates both mapped keys against the raw source") {
    import spark.implicits._
    val t = tmp("swap")
    ManifestTable.commit(spark, t,
      Seq((1L, 2L, "t12"), (2L, 1L, "t21")).toDF("a", "b", "v"),
      SaveMode.Overwrite)
    GraftCatalog.register("r16_swap", t)
    try {
      // feed row (a=1, b=2) addresses target (a=2, b=1): a←s.b, b←s.a.
      // A sequential fold would compute b from the REPLACED a
      // (yielding (2,2) — a phantom insert); the single projection
      // lands the update on (2,1).
      Seq((1L, 2L, "S")).toDF("a", "b", "v").createOrReplaceTempView("r16_chg")
      spark.sql(
        """MERGE INTO graft.r16_swap t USING r16_chg s
          |ON t.a = s.b AND t.b = s.a
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val got = ManifestTable.read(spark, t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
      assert(got === Map((1L, 2L) -> "t12", (2L, 1L) -> "S"),
        s"swap-key merge must update (2,1), not insert a phantom (2,2): $got")
    } finally GraftCatalog.unregister("r16_swap")
  }

  // ---- quote-aware scanning: double quotes + backticks -------------

  test("REPLACE WHERE and OPTIMIZE tails ignore keywords inside double-quoted literals") {
    import spark.implicits._
    val t = tmp("dq")
    ManifestTable.commit(spark, t,
      Seq((1L, "SELECT me", 1.0), (2L, "plain", 2.0)).toDF("id", "note", "v"),
      SaveMode.Overwrite, statsColumns = Seq("id"))
    GraftCatalog.register("r16_dq", t)
    try {
      // Spark SQL's default treats "…" as a string literal — the
      // statement splitter must not split at the SELECT inside it
      spark.sql(
        """INSERT INTO graft.r16_dq REPLACE WHERE note = "SELECT me"
          |SELECT id, note, v * 10 AS v FROM graft.r16_dq WHERE note = "SELECT me"
          |""".stripMargin)
      val got = ManifestTable.read(spark, t)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("v")).toMap
      assert(got === Map(1L -> 10.0, 2L -> 2.0))
      // and an OPTIMIZE WHERE whose double-quoted literal carries
      // 'zorder by' — the tail splitter must not mistake it for a
      // ZORDER clause (which would refuse: WHERE+ZORDER don't compose)
      spark.sql(
        """OPTIMIZE graft.r16_dq WHERE note = "zorder by (id)"""")
      assert(ManifestTable.read(spark, t).count() === 2)
    } finally GraftCatalog.unregister("r16_dq")
  }

  // ---- [CREATE OR] REPLACE TABLE: the atomic swap -------------------

  test("CREATE OR REPLACE TABLE swaps schema, data, layout and constraints in ONE version") {
    val t = tmp("cor")
    GraftCatalog.unregister("r16_cor")
    spark.sql(s"""CREATE TABLE graft.r16_cor (
                 |  id BIGINT, qty INT,
                 |  CONSTRAINT qty_pos CHECK (qty > 0)
                 |) LOCATION '$t'""".stripMargin)
    try {
      spark.sql("INSERT INTO graft.r16_cor VALUES (1, 5)")
      val vBefore = ManifestTable.currentVersion(spark, t)
      // replace with a DIFFERENT schema, a partition layout, a new
      // constraint set, and CTAS rows — one statement, one version
      spark.sql(s"""CREATE OR REPLACE TABLE graft.r16_cor
                   |PARTITIONED BY (grp) LOCATION '$t'
                   |AS SELECT id * 10 AS id,
                   |  CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS grp
                   |FROM range(4)""".stripMargin)
      assert(ManifestTable.currentVersion(spark, t) === vBefore + 1,
        "the swap must spend exactly ONE version")
      val got = spark.sql("SELECT id, grp FROM graft.r16_cor ORDER BY id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
      assert(got === Seq(0L -> "even", 10L -> "odd", 20L -> "even",
        30L -> "odd"))
      assert(ManifestTable.partitionColumns(spark, t) === Seq("grp"),
        "REPLACE must install the new partition layout")
      // the old constraint set is GONE (nothing survives but history):
      // qty doesn't even exist; a write that would have violated the
      // old CHECK shape is judged only by the new (empty) set
      assert(ManifestTable.checkConstraints(spark, t).isEmpty,
        "an empty declared set must CLEAR the old constraints")
      // history intact: the pre-replace image answers under @v
      assert(spark.sql(
        s"SELECT qty FROM graft.`r16_cor@v$vBefore`").collect()
        .map(_.getInt(0)).toSeq === Seq(5))
    } finally GraftCatalog.unregister("r16_cor")
  }

  test("REPLACE TABLE refusals: missing table, moved LOCATION, changed TBLPROPERTIES, violated CHECK") {
    import spark.implicits._
    val t = tmp("rref")
    GraftCatalog.unregister("r16_rref")
    // plain REPLACE on a missing table refuses (ANSI); OR CREATE boots
    val e0 = intercept[Exception](spark.sql(
      s"REPLACE TABLE graft.r16_rref (id BIGINT) LOCATION '$t'"))
    assert(e0.getMessage.contains("CREATE OR REPLACE"), e0.getMessage)
    spark.sql(s"CREATE OR REPLACE TABLE graft.r16_rref (id BIGINT) LOCATION '$t'")
    try {
      spark.sql("INSERT INTO graft.r16_rref VALUES (1)")
      // a LOCATION naming a DIFFERENT directory is a loud conflict
      val t2 = tmp("rref2")
      val e1 = intercept[Exception](spark.sql(
        s"REPLACE TABLE graft.r16_rref (id BIGINT) LOCATION '$t2'"))
      assert(e1.getMessage.contains("never moves a table"), e1.getMessage)
      // TBLPROPERTIES can't change through REPLACE
      val e2 = intercept[Exception](spark.sql(
        s"""REPLACE TABLE graft.r16_rref (id BIGINT)
           |LOCATION '$t'
           |TBLPROPERTIES ('graft.statsColumns' = 'id')""".stripMargin))
      assert(e2.getMessage.contains("create-time"), e2.getMessage)
      // a CTAS violating the DECLARED check refuses with the table
      // untouched — validation precedes any write. Spark's grammar
      // has no CONSTRAINT clause on a CTAS, so drive the command
      // directly (the same pattern as SqlCreateTableSpec's CTAS pin)
      val q = spark.sql("SELECT -1L AS id").queryExecution.logical
      val e3 = intercept[Exception](
        GraftCatalog.ReplaceCommand("graft.r16_rref", "r16_rref",
          new org.apache.spark.sql.types.StructType(), Nil, Some(t),
          Map.empty, Seq("id_pos" -> "id > 0"), orCreate = true,
          Some(q)).run(spark))
      assert(e3.getMessage.contains("id_pos"), e3.getMessage)
      assert(spark.sql("SELECT id FROM graft.r16_rref").collect()
        .map(_.getLong(0)).toSeq === Seq(1L),
        "a refused REPLACE must leave the table exactly as it was")
    } finally GraftCatalog.unregister("r16_rref")
  }

  // ---- rename hint hygiene ------------------------------------------

  test("rename hints stay transitive across chains and clear on re-registration") {
    import spark.implicits._
    val ta = tmp("ren")
    ManifestTable.commit(spark, ta, Seq((1L, 1.0)).toDF("id", "v"),
      SaveMode.Overwrite)
    Seq("r16_ren_a", "r16_ren_b", "r16_ren_c").foreach(GraftCatalog.unregister)
    GraftCatalog.register("r16_ren_a", ta)
    try {
      spark.sql("ALTER TABLE graft.r16_ren_a RENAME TO graft.r16_ren_b")
      spark.sql("ALTER TABLE graft.r16_ren_b RENAME TO graft.r16_ren_c")
      // a → must point at LIVE c, not dead b
      val ea = intercept[Exception](spark.sql("DESCRIBE DETAIL graft.r16_ren_a"))
      assert(ea.getMessage.contains("renamed to graft.r16_ren_c"),
        s"chained hint must be transitive: ${ea.getMessage}")
      // re-registering b makes the name live again — no stale hint
      val tb = tmp("ren2")
      ManifestTable.commit(spark, tb, Seq((2L, 2.0)).toDF("id", "v"),
        SaveMode.Overwrite)
      GraftCatalog.register("r16_ren_b", tb)
      assert(spark.sql("SELECT count(*) AS c FROM graft.r16_ren_b")
        .head.getLong(0) === 1L,
        "a re-registered name must resolve, not hint at its past")
    } finally Seq("r16_ren_a", "r16_ren_b", "r16_ren_c")
      .foreach(GraftCatalog.unregister)
  }
}
