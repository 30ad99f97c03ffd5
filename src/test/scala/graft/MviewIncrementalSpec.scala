package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{Row, SaveMode}
import graft.sources.{GraftCatalog, ManifestTable, MviewIncremental}

/** Incremental materialized-view refresh (r17): the dirty-group
  * rescan. Every drill checks the invariant that MATTERS: after
  * REFRESH … INCREMENTAL, the image is ROW-IDENTICAL to a from-scratch
  * recompute of the defining query — across inserts, deletes (eager,
  * lazy-tombstone, deletion-vector), updates, NULL group keys, and
  * restart/restore edge cases — plus the refusal surface for
  * non-qualifying defining queries. */
class MviewIncrementalSpec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_mvi_$tag").toString + "/t"

  private def cleanup(names: String*): Unit =
    names.foreach(GraftCatalog.unregister)

  /** rows of the mview vs rows of its defining query recomputed now */
  private def assertExact(mview: String, definingSql: String): Unit = {
    val img = spark.sql(s"SELECT * FROM graft.$mview").collect().toSeq
      .map(_.toSeq).sortBy(_.mkString("|"))
    val full = spark.sql(definingSql).collect().toSeq
      .map(_.toSeq).sortBy(_.mkString("|"))
    assert(img === full, s"graft.$mview image drifted from its defining query")
  }

  private def refreshInc(mview: String): (Int, String) = {
    val r = spark.sql(s"REFRESH MATERIALIZED VIEW graft.$mview INCREMENTAL")
      .collect().head
    (r.getInt(0), r.getString(1))
  }

  test("prime → incremental → noop lifecycle stays exact through insert/update/delete") {
    import spark.implicits._
    val bt = tmp("life_b"); val mt = tmp("life_m")
    ManifestTable.commit(spark, bt,
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "c", 5L))
        .toDF("id", "grp", "v"), SaveMode.Overwrite)
    GraftCatalog.register("mvi_base", bt)
    val defSql = """SELECT grp, count(*) AS n, sum(v) AS total,
                   |  min(v) AS lo, max(v) AS hi, avg(v) AS mean
                   |FROM graft.mvi_base GROUP BY grp""".stripMargin
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_life LOCATION '$mt' AS $defSql")
      // CREATE records no marker — the first INCREMENTAL self-primes
      val (_, m1) = refreshInc("mvi_life")
      assert(m1 == "full", s"first incremental must self-prime, got $m1")
      assertExact("mvi_life", defSql)
      // churn: insert new group, grow one group, update another,
      // DELETE an entire group — min/max retraction included
      spark.sql("INSERT INTO graft.mvi_base VALUES (5, 'd', 50), (6, 'a', 1)")
      spark.sql("UPDATE graft.mvi_base SET v = 99 WHERE id = 3")
      spark.sql("DELETE FROM graft.mvi_base WHERE grp = 'c'")
      val (_, m2) = refreshInc("mvi_life")
      assert(m2 == "incremental", s"second refresh must be incremental, got $m2")
      assertExact("mvi_life", defSql)
      // group 'c' must be GONE (count reached zero)
      assert(spark.sql("SELECT * FROM graft.mvi_life WHERE grp = 'c'")
        .isEmpty, "a fully-deleted group must leave the image")
      // no churn → noop, and the image version must NOT advance
      val vBefore = ManifestTable.currentVersion(spark, mt)
      val (v3, m3) = refreshInc("mvi_life")
      assert(m3 == "noop" && v3 == vBefore,
        s"no base churn must spend no version: ($v3, $m3) vs $vBefore")
    } finally cleanup("mvi_life", "mvi_base")
  }

  test("incremental matches full recompute under WHERE, NULL group keys and expr groups") {
    import spark.implicits._
    val bt = tmp("null_b"); val mt = tmp("null_m")
    ManifestTable.commit(spark, bt,
      Seq((1L, Some("a"), 10L), (2L, None, 20L), (3L, Some("b"), 7L),
        (4L, None, 1L), (5L, Some("a"), 3L))
        .toDF("id", "grp", "v"), SaveMode.Overwrite)
    GraftCatalog.register("mvi_nb", bt)
    // WHERE gate + an EXPRESSION group key + NULL groups
    val defSql = """SELECT upper(grp) AS g, v % 2 AS parity, count(*) AS n,
                   |  sum(v) AS total
                   |FROM graft.mvi_nb WHERE v >= 2 GROUP BY upper(grp), v % 2""".stripMargin
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_null LOCATION '$mt' AS $defSql")
      refreshInc("mvi_null") // prime
      // churn hits the NULL group and crosses the WHERE boundary
      spark.sql("INSERT INTO graft.mvi_nb VALUES (6, NULL, 8), (7, 'b', 1)")
      spark.sql("UPDATE graft.mvi_nb SET v = 0 WHERE id = 2") // leaves WHERE set
      val (_, mode) = refreshInc("mvi_null")
      assert(mode == "incremental", mode)
      assertExact("mvi_null", defSql)
    } finally cleanup("mvi_null", "mvi_nb")
  }

  test("churn entirely OUTSIDE the WHERE clause is a noop (no version spent)") {
    import spark.implicits._
    val bt = tmp("out_b"); val mt = tmp("out_m")
    ManifestTable.commit(spark, bt,
      Seq((1L, "a", 100L), (2L, "b", 200L)).toDF("id", "grp", "v"),
      SaveMode.Overwrite)
    GraftCatalog.register("mvi_ob", bt)
    val defSql = "SELECT grp, sum(v) AS total FROM graft.mvi_ob " +
      "WHERE v >= 50 GROUP BY grp"
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_out LOCATION '$mt' AS $defSql")
      refreshInc("mvi_out")
      spark.sql("INSERT INTO graft.mvi_ob VALUES (3, 'a', 1), (4, 'z', 2)")
      val vBefore = ManifestTable.currentVersion(spark, mt)
      val (v, mode) = refreshInc("mvi_out")
      assert(mode == "noop" && v == vBefore,
        s"sub-WHERE churn must not rewrite the image: ($v, $mode)")
      assertExact("mvi_out", defSql)
    } finally cleanup("mvi_out", "mvi_ob")
  }

  test("sustained sub-WHERE churn re-pins the marker with a metadata-only commit (ADVICE r17)") {
    import spark.implicits._
    val bt = tmp("adv_b"); val mt = tmp("adv_m")
    ManifestTable.commit(spark, bt,
      Seq((1L, "a", 100L), (2L, "b", 200L)).toDF("id", "grp", "v"),
      SaveMode.Overwrite)
    GraftCatalog.register("mvi_advb", bt)
    val defSql = "SELECT grp, sum(v) AS total FROM graft.mvi_advb " +
      "WHERE v >= 50 GROUP BY grp"
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_adv LOCATION '$mt' AS $defSql")
      refreshInc("mvi_adv")
      val primed = ManifestTable.txnVersion(spark, mt,
        MviewIncremental.TxnApp).get
      // churn the base past the advance threshold — every row below
      // the WHERE slice, so the view's content never changes
      (1 to MviewIncremental.MarkerAdvanceVersions).foreach { i =>
        spark.sql(s"INSERT INTO graft.mvi_advb VALUES (${100 + i}, 'z', $i)")
      }
      val imgBefore = spark.sql("SELECT * FROM graft.mvi_adv").collect()
        .map(_.toSeq).sortBy(_.mkString("|")).toSeq
      val (_, mode) = refreshInc("mvi_adv")
      assert(mode == "noop", s"sub-WHERE churn stays a noop, got $mode")
      val marked = ManifestTable.txnVersion(spark, mt,
        MviewIncremental.TxnApp).get
      assert(marked == ManifestTable.currentVersion(spark, bt) &&
        marked > primed,
        s"a grown window must re-pin the marker at the base head: " +
          s"$primed -> $marked")
      // metadata-only: a 'marker' op, image rows untouched
      assert(ManifestTable.commitOp(spark, mt).contains("marker"))
      val imgAfter = spark.sql("SELECT * FROM graft.mvi_adv").collect()
        .map(_.toSeq).sortBy(_.mkString("|")).toSeq
      assert(imgAfter === imgBefore, "the marker commit must not touch rows")
      assertExact("mvi_adv", defSql)
      // below the threshold the noop stays publish-free, as before
      spark.sql("INSERT INTO graft.mvi_advb VALUES (999, 'z', 3)")
      val vBefore = ManifestTable.currentVersion(spark, mt)
      val (v2, mode2) = refreshInc("mvi_adv")
      assert(mode2 == "noop" && v2 == vBefore,
        s"short-window noop must not publish: ($v2, $mode2)")
    } finally cleanup("mvi_adv", "mvi_advb")
  }

  test("deletion-vector and lazy-tombstone deletes churn no file yet stay exact") {
    import spark.implicits._
    val bt = tmp("dv_b"); val mt = tmp("dv_m")
    ManifestTable.commit(spark, bt,
      spark.range(1, 101).selectExpr("id", "CAST(id % 5 AS STRING) AS grp",
        "id * 2 AS v"), SaveMode.Overwrite)
    GraftCatalog.register("mvi_dvb", bt)
    val defSql = "SELECT grp, count(*) AS n, sum(v) AS total " +
      "FROM graft.mvi_dvb GROUP BY grp"
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_dv LOCATION '$mt' AS $defSql")
      refreshInc("mvi_dv") // prime
      // a metadata-only scattered delete: files unchanged, rowset not
      val filesBefore = ManifestTable.snapshotFiles(spark, bt).toSet
      ManifestTable.deleteWhereVector(spark, bt,
        org.apache.spark.sql.functions.expr("id % 10 = 3"))
      assert(ManifestTable.snapshotFiles(spark, bt).toSet == filesBefore,
        "precondition: the deletion-vector delete must move no files")
      val (_, mode) = refreshInc("mvi_dv")
      assert(mode == "incremental", mode)
      assertExact("mvi_dv", defSql)
      // and a lazy predicate tombstone on top
      ManifestTable.deleteWhereLazy(spark, bt,
        org.apache.spark.sql.functions.expr("grp = '4'"))
      val (_, mode2) = refreshInc("mvi_dv")
      assert(mode2 == "incremental", mode2)
      assertExact("mvi_dv", defSql)
      assert(spark.sql("SELECT * FROM graft.mvi_dv WHERE grp = '4'").isEmpty)
    } finally cleanup("mvi_dv", "mvi_dvb")
  }

  test("plain REFRESH records the marker too — INCREMENTAL composes after it") {
    import spark.implicits._
    val bt = tmp("mk_b"); val mt = tmp("mk_m")
    ManifestTable.commit(spark, bt,
      Seq((1L, "a", 1L)).toDF("id", "grp", "v"), SaveMode.Overwrite)
    GraftCatalog.register("mvi_mkb", bt)
    val defSql = "SELECT grp, sum(v) AS total FROM graft.mvi_mkb GROUP BY grp"
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_mk LOCATION '$mt' AS $defSql")
      spark.sql("REFRESH MATERIALIZED VIEW graft.mvi_mk").collect()
      assert(ManifestTable.txnVersion(spark, mt, MviewIncremental.TxnApp)
        .isDefined, "plain REFRESH must record the base marker")
      spark.sql("INSERT INTO graft.mvi_mkb VALUES (2, 'b', 5)")
      val (_, mode) = refreshInc("mvi_mk")
      assert(mode == "incremental",
        s"after a marker-recording full refresh, INCREMENTAL must be " +
          s"incremental, got $mode")
      assertExact("mvi_mk", defSql)
    } finally cleanup("mvi_mk", "mvi_mkb")
  }

  test("RESTORE of the base puts the marker ahead — refresh falls back to full, stays exact") {
    import spark.implicits._
    val bt = tmp("rs_b"); val mt = tmp("rs_m")
    ManifestTable.commit(spark, bt,
      Seq((1L, "a", 1L)).toDF("id", "grp", "v"), SaveMode.Overwrite)
    GraftCatalog.register("mvi_rsb", bt)
    val defSql = "SELECT grp, sum(v) AS total FROM graft.mvi_rsb GROUP BY grp"
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_rs LOCATION '$mt' AS $defSql")
      spark.sql("INSERT INTO graft.mvi_rsb VALUES (2, 'b', 5)")
      spark.sql("INSERT INTO graft.mvi_rsb VALUES (3, 'c', 7)")
      refreshInc("mvi_rs") // marker at base v3
      spark.sql("RESTORE TABLE graft.mvi_rsb TO VERSION AS OF 2").collect()
      // base head is now 4 but its CONTENT is v2's; marker says v3 —
      // a naive delta would replay; the implementation must stay exact
      val (_, mode) = refreshInc("mvi_rs")
      assert(mode == "incremental" || mode == "full", mode)
      assertExact("mvi_rs", defSql)
    } finally cleanup("mvi_rs", "mvi_rsb")
  }

  test("refusal surface: joins, hidden group keys, subqueries, rand(), global aggs") {
    import spark.implicits._
    val bt = tmp("ref_b"); val mt = tmp("ref_m")
    ManifestTable.commit(spark, bt,
      Seq((1L, "a", 1L)).toDF("id", "grp", "v"), SaveMode.Overwrite)
    GraftCatalog.register("mvi_refb", bt)
    val dt = tmp("ref_d")
    ManifestTable.commit(spark, dt,
      Seq((1L, "x")).toDF("id", "nm"), SaveMode.Overwrite)
    GraftCatalog.register("mvi_refd", dt)
    def mview(tag: String, sql: String): String = {
      val p = tmp(tag)
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_$tag LOCATION '$p' AS $sql")
      s"mvi_$tag"
    }
    def refuse(name: String, needle: String): Unit = {
      val e = intercept[Exception] { refreshInc(name) }
      assert(e.getMessage.contains("does not qualify") &&
        e.getMessage.contains(needle), s"$name: ${e.getMessage}")
      // the honest full refresh still works
      spark.sql(s"REFRESH MATERIALIZED VIEW graft.$name").collect()
    }
    try {
      // r19: INNER joins (self-joins included — occurrence-level
      // telescoping) and LEFT OUTER with a single-table right side all
      // qualify now; what refuses is right/full outer and a LEFT
      // OUTER whose right side is itself a join tree (no sound
      // semi-restriction for the null-extension term there)
      refuse(mview("roj", """SELECT d.nm AS nm, count(*) AS n
        |FROM graft.mvi_refb a RIGHT JOIN graft.mvi_refd d ON a.id = d.id
        |GROUP BY d.nm""".stripMargin), "rescan as a whole")
      refuse(mview("foj", """SELECT a.grp AS grp, count(*) AS n
        |FROM graft.mvi_refb a FULL JOIN graft.mvi_refd d ON a.id = d.id
        |GROUP BY a.grp""".stripMargin), "rescan as a whole")
      refuse(mview("loj2", """SELECT a.grp AS grp, count(*) AS n
        |FROM graft.mvi_refb a
        |LEFT JOIN (graft.mvi_refd d JOIN graft.mvi_refb b ON d.id = b.id)
        |  ON a.id = d.id
        |GROUP BY a.grp""".stripMargin), "rescan as a whole")
      refuse(mview("h", "SELECT count(*) AS n FROM graft.mvi_refb GROUP BY grp"),
        "not in the SELECT list")
      refuse(mview("s", """SELECT grp, count(*) AS n FROM graft.mvi_refb
        |WHERE v < (SELECT max(v) FROM graft.mvi_refb)
        |GROUP BY grp""".stripMargin), "subquery")
      refuse(mview("g", "SELECT count(*) AS n, sum(v) AS t FROM graft.mvi_refb"),
        "GROUP BY aggregate")
      refuse(mview("r", """SELECT grp, count(*) AS n FROM graft.mvi_refb
        |WHERE rand() < 2 GROUP BY grp""".stripMargin), "non-deterministic")
    } finally cleanup("mvi_roj", "mvi_foj", "mvi_loj2", "mvi_h", "mvi_s",
      "mvi_g", "mvi_r", "mvi_refb", "mvi_refd")
  }

  test("left-outer MV (r19): null-extension flips both directions stay incremental — exact") {
    import spark.implicits._
    val ft = tmp("lo_f"); val dt = tmp("lo_d"); val mt = tmp("lo_m")
    // fact rows 3 and 4 start UNMATCHED (dim 30/40 absent) — they feed
    // the NULL-extended group
    ManifestTable.commit(spark, ft,
      Seq((1L, 10L, 5L), (2L, 20L, 7L), (3L, 30L, 11L), (4L, 40L, 13L))
        .toDF("id", "dim_id", "v"), SaveMode.Overwrite)
    ManifestTable.commit(spark, dt,
      Seq((10L, "red"), (20L, "blue")).toDF("dim_id", "cat"),
      SaveMode.Overwrite)
    GraftCatalog.register("mvi_lof", ft)
    GraftCatalog.register("mvi_lod", dt)
    // the WHERE references the DIM column too — on a null-extended row
    // it must evaluate with cat = NULL, which is exactly what the
    // null-form term substitutes into ancestor filters
    val defSql =
      """SELECT d.cat AS cat, count(*) AS n, sum(f.v) AS total
        |FROM graft.mvi_lof f LEFT JOIN graft.mvi_lod d
        |  ON f.dim_id = d.dim_id
        |WHERE f.v >= 2 AND coalesce(d.cat, 'none') <> 'drop'
        |GROUP BY d.cat""".stripMargin
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_lo LOCATION '$mt' AS $defSql")
      val (_, m1) = refreshInc("mvi_lo")
      assert(m1 == "full", m1)
      assertExact("mvi_lo", defSql)
      // FACT-only churn: one matched insert, one unmatched insert
      // (grows the NULL group), one delete out of the NULL group — a
      // left join is linear in the fact, plain substitution covers it
      spark.sql("INSERT INTO graft.mvi_lof VALUES (5, 10, 17), (6, 50, 19)")
      spark.sql("DELETE FROM graft.mvi_lof WHERE id = 4")
      val (_, m2) = refreshInc("mvi_lo")
      assert(m2 == "incremental", s"fact churn must stay incremental: $m2")
      assertExact("mvi_lo", defSql)
      // DIM-only churn, null→matched: dim 30 arrives, fact row 3 flips
      // OUT of the NULL group INTO 'green' — both groups must go dirty
      // (the matched form finds 'green', the semi+null form finds NULL)
      spark.sql("INSERT INTO graft.mvi_lod VALUES (30, 'green')")
      val (_, m3) = refreshInc("mvi_lo")
      assert(m3 == "incremental", s"dim arrival must stay incremental: $m3")
      assertExact("mvi_lo", defSql)
      // DIM-only churn, matched→null: dim 10 leaves, rows 1 and 5 flip
      // INTO the NULL group; 'red' must empty out of the image
      spark.sql("DELETE FROM graft.mvi_lod WHERE dim_id = 10")
      val (_, m4) = refreshInc("mvi_lo")
      assert(m4 == "incremental", s"dim departure must stay incremental: $m4")
      assertExact("mvi_lo", defSql)
      // dim relabel into the WHERE's excluded value: matched rows of
      // dim 20 drop from the view entirely (the ancestor filter sees
      // the new label via the matched form)
      spark.sql("UPDATE graft.mvi_lod SET cat = 'drop' WHERE dim_id = 20")
      val (_, m5) = refreshInc("mvi_lo")
      assert(m5 == "incremental", m5)
      assertExact("mvi_lo", defSql)
      // fact AND dim churn in one window telescope
      spark.sql("INSERT INTO graft.mvi_lof VALUES (7, 30, 23)")
      spark.sql("UPDATE graft.mvi_lod SET cat = 'teal' WHERE dim_id = 30")
      val (_, m6) = refreshInc("mvi_lo")
      assert(m6 == "incremental", s"two churned tables telescope: $m6")
      assertExact("mvi_lo", defSql)
    } finally cleanup("mvi_lo", "mvi_lof", "mvi_lod")
  }

  test("self-join MV (r19): occurrence-level telescoping, inner and left-outer — exact") {
    import spark.implicits._
    val bt = tmp("self_b"); val mt = tmp("self_m"); val lt = tmp("self_l")
    // a chain table: row id joins its predecessor id-1 — the
    // prior-period-comparison shape
    ManifestTable.commit(spark, bt,
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L))
        .toDF("id", "grp", "v"), SaveMode.Overwrite)
    GraftCatalog.register("mvi_self", bt)
    val innerSql =
      """SELECT a.grp AS grp, count(*) AS n, sum(a.v - b.v) AS growth
        |FROM graft.mvi_self a JOIN graft.mvi_self b ON a.id = b.id + 1
        |GROUP BY a.grp""".stripMargin
    val loSql =
      """SELECT a.grp AS grp, count(*) AS n, sum(coalesce(b.v, 0)) AS prior
        |FROM graft.mvi_self a LEFT JOIN graft.mvi_self b ON a.id = b.id + 1
        |GROUP BY a.grp""".stripMargin
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_selfi LOCATION '$mt' AS $innerSql")
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_selflo LOCATION '$lt' AS $loSql")
      assert(refreshInc("mvi_selfi")._2 == "full")
      assert(refreshInc("mvi_selflo")._2 == "full")
      assertExact("mvi_selfi", innerSql)
      assertExact("mvi_selflo", loSql)
      // churn hits BOTH occurrences of the one table: id 5 enters as a
      // left row (5 ⋈ 4) AND as a right row for a future 6; deleting
      // id 2 breaks the 3⋈2 pair and the 2⋈1 pair at once. The
      // telescoping chain T_h⋈ΔT + ΔT⋈T_s covers both with no ΔT⋈ΔT
      spark.sql("INSERT INTO graft.mvi_self VALUES (5, 'b', 50), (7, 'c', 70)")
      spark.sql("DELETE FROM graft.mvi_self WHERE id = 2")
      val (_, mi) = refreshInc("mvi_selfi")
      assert(mi == "incremental", s"self-join churn must stay incremental: $mi")
      assertExact("mvi_selfi", innerSql)
      val (_, ml) = refreshInc("mvi_selflo")
      assert(ml == "incremental", s"self-left-join churn must stay incremental: $ml")
      assertExact("mvi_selflo", loSql)
      // consecutive-id insert: 6 pairs with 5 on one side and 7 on the
      // other — the SAME inserted batch feeds both occurrences
      spark.sql("INSERT INTO graft.mvi_self VALUES (6, 'c', 60)")
      spark.sql("UPDATE graft.mvi_self SET v = 15 WHERE id = 1")
      assert(refreshInc("mvi_selfi")._2 == "incremental")
      assertExact("mvi_selfi", innerSql)
      assert(refreshInc("mvi_selflo")._2 == "incremental")
      assertExact("mvi_selflo", loSql)
    } finally cleanup("mvi_selfi", "mvi_selflo", "mvi_self")
  }

  test("star-join MV (r18): fact, dim, and multi-table churn all refresh incrementally — exact") {
    import spark.implicits._
    val ft = tmp("sj_f"); val dt = tmp("sj_d"); val mt = tmp("sj_m")
    ManifestTable.commit(spark, ft,
      Seq((1L, 10L, 5L), (2L, 10L, 7L), (3L, 20L, 11L), (4L, 30L, 1L))
        .toDF("id", "dim_id", "v"), SaveMode.Overwrite)
    ManifestTable.commit(spark, dt,
      Seq((10L, "red"), (20L, "blue"), (30L, "red")).toDF("dim_id", "cat"),
      SaveMode.Overwrite)
    GraftCatalog.register("mvi_sjf", ft)
    GraftCatalog.register("mvi_sjd", dt)
    val defSql =
      """SELECT d.cat AS cat, count(*) AS n, sum(f.v) AS total,
        |  min(f.v) AS lo, max(f.v) AS hi
        |FROM graft.mvi_sjf f JOIN graft.mvi_sjd d ON f.dim_id = d.dim_id
        |WHERE f.v >= 2 GROUP BY d.cat""".stripMargin
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_sj LOCATION '$mt' AS $defSql")
      val (_, m1) = refreshInc("mvi_sj")
      assert(m1 == "full", m1)
      assertExact("mvi_sj", defSql)
      // FACT churn: grow two groups, retract a min/max, delete a row
      spark.sql("INSERT INTO graft.mvi_sjf VALUES (5, 20, 100), (6, 30, 9)")
      spark.sql("UPDATE graft.mvi_sjf SET v = 50 WHERE id = 1")
      spark.sql("DELETE FROM graft.mvi_sjf WHERE id = 3")
      val (_, m2) = refreshInc("mvi_sj")
      assert(m2 == "incremental", s"fact churn must stay incremental: $m2")
      assertExact("mvi_sj", defSql)
      // sub-WHERE fact churn is still a publish-free noop
      spark.sql("INSERT INTO graft.mvi_sjf VALUES (7, 10, 0)")
      val (_, m3) = refreshInc("mvi_sj")
      assert(m3 == "noop", m3)
      assertExact("mvi_sj", defSql)
      // DIM churn: re-labeling a category moves WHOLE groups between
      // keys. The join is linear in the dim too, so the dim's delta —
      // joined to the fact pinned at head — locates every moved group
      // (old label via the left rows, new label via the entered rows)
      // and the refresh stays INCREMENTAL and exact (r18: any single
      // churned table is the delta source, whatever its position)
      spark.sql("UPDATE graft.mvi_sjd SET cat = 'green' WHERE dim_id = 30")
      val (_, m4) = refreshInc("mvi_sj")
      assert(m4 == "incremental", s"single-table dim churn qualifies: $m4")
      assertExact("mvi_sj", defSql)
      // fact churn right after stays incremental (markers all re-pinned)
      spark.sql("INSERT INTO graft.mvi_sjf VALUES (8, 20, 13)")
      val (_, m5) = refreshInc("mvi_sj")
      assert(m5 == "incremental", m5)
      assertExact("mvi_sj", defSql)
      // BOTH the fact and a dim churned in one window: the telescoping
      // terms (Δfact ⋈ dim@marker ∪ fact@head ⋈ Δdim) cover the cross
      // effects — still INCREMENTAL, still exact
      spark.sql("INSERT INTO graft.mvi_sjf VALUES (9, 10, 40)")
      spark.sql("UPDATE graft.mvi_sjd SET cat = 'blue' WHERE dim_id = 30")
      val (_, m6) = refreshInc("mvi_sj")
      assert(m6 == "incremental",
        s"two churned tables must telescope, not recompute: $m6")
      assertExact("mvi_sj", defSql)
    } finally cleanup("mvi_sj", "mvi_sjf", "mvi_sjd")
  }

  test("star-join MV with a FACT group key: the envelope prunes the fact rescan (r18)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ft = tmp("sjp_f"); val dt = tmp("sjp_d"); val mt = tmp("sjp_m")
    val facts = for { k <- Seq("a", "b", "c", "d"); i <- 1 to 40 }
      yield (k, (i % 3).toLong + 10L, i.toLong)
    ManifestTable.commit(spark, ft,
      facts.toDF("k", "dim_id", "v").repartitionByRange(4, col("k")),
      SaveMode.Overwrite, statsColumns = Seq("k"))
    ManifestTable.commit(spark, dt,
      Seq((10L, 2L), (11L, 3L), (12L, 5L)).toDF("dim_id", "w"),
      SaveMode.Overwrite)
    GraftCatalog.register("mvi_sjpf", ft)
    GraftCatalog.register("mvi_sjpd", dt)
    // the group key is a QUALIFIED fact column — attribution through
    // the FROM alias lets the envelope prune the fact read
    val defSql = """SELECT f.k AS k, count(*) AS n, sum(d.w) AS tw
                   |FROM graft.mvi_sjpf f
                   |JOIN graft.mvi_sjpd d ON f.dim_id = d.dim_id
                   |GROUP BY f.k""".stripMargin
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_sjp LOCATION '$mt' AS $defSql")
      refreshInc("mvi_sjp")
      val totalFiles = ManifestTable.read(spark, ft).inputFiles.length
      assert(totalFiles >= 4)
      spark.sql("INSERT INTO graft.mvi_sjpf VALUES ('d', 11, 999)")
      val (_, mode) = refreshInc("mvi_sjp")
      assert(mode == "incremental", mode)
      assertExact("mvi_sjp", defSql)
      assert(MviewIncremental.lastRescanFiles >= 1 &&
        MviewIncremental.lastRescanFiles < totalFiles,
        s"the fact-key envelope must prune the join rescan: listed " +
          s"${MviewIncremental.lastRescanFiles} of >= $totalFiles")
      // a DIM-owned group key never prunes the fact (attribution bails)
      val mt2 = tmp("sjp_m2")
      spark.sql(s"""CREATE MATERIALIZED VIEW graft.mvi_sjp2 LOCATION '$mt2' AS
                   |SELECT d.w AS w, count(*) AS n
                   |FROM graft.mvi_sjpf f
                   |JOIN graft.mvi_sjpd d ON f.dim_id = d.dim_id
                   |GROUP BY d.w""".stripMargin)
      refreshInc("mvi_sjp2")
      spark.sql("INSERT INTO graft.mvi_sjpf VALUES ('a', 10, 7)")
      val (_, m2) = refreshInc("mvi_sjp2")
      assert(m2 == "incremental", m2)
      assert(MviewIncremental.lastRescanFiles == -1,
        "a dim-owned key must keep the unpruned pinned read + semi join")
      assertExact("mvi_sjp2",
        """SELECT d.w AS w, count(*) AS n
          |FROM graft.mvi_sjpf f
          |JOIN graft.mvi_sjpd d ON f.dim_id = d.dim_id
          |GROUP BY d.w""".stripMargin)
    } finally cleanup("mvi_sjp", "mvi_sjp2", "mvi_sjpf", "mvi_sjpd")
  }

  test("the pruned single-key path stays exact with NULL group keys in the churn") {
    import spark.implicits._
    val bt = tmp("pn_b"); val mt = tmp("pn_m")
    ManifestTable.commit(spark, bt,
      Seq((1L, Some("a"), 1L), (2L, None, 2L), (3L, Some("b"), 3L))
        .toDF("id", "grp", "v"), SaveMode.Overwrite)
    GraftCatalog.register("mvi_pnb", bt)
    // ONE plain group column → the readWhere IN-pruning path; the
    // churn hits BOTH a named group and the NULL group, so the
    // predicate must carry the `OR grp IS NULL` branch
    val defSql = "SELECT grp, count(*) AS n, sum(v) AS total " +
      "FROM graft.mvi_pnb GROUP BY grp"
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_pn LOCATION '$mt' AS $defSql")
      refreshInc("mvi_pn")
      spark.sql("INSERT INTO graft.mvi_pnb VALUES (4, NULL, 10), (5, 'a', 20)")
      spark.sql("DELETE FROM graft.mvi_pnb WHERE id = 2")
      val (_, mode) = refreshInc("mvi_pn")
      assert(mode == "incremental", mode)
      assertExact("mvi_pn", defSql)
      assert(spark.sql("SELECT total FROM graft.mvi_pn WHERE grp IS NULL")
        .head().getLong(0) == 10L)
    } finally cleanup("mvi_pn", "mvi_pnb")
  }

  test("HAVING views maintain incrementally: groups enter AND leave the image (r18)") {
    import spark.implicits._
    val bt = tmp("hv_b"); val mt = tmp("hv_m")
    ManifestTable.commit(spark, bt,
      Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
          (4L, "b", 5L), (5L, "b", 6L), (6L, "c", 7L))
        .toDF("id", "grp", "v"), SaveMode.Overwrite)
    GraftCatalog.register("mvi_hvb", bt)
    // only groups with >= 3 rows appear in the image
    val defSql = """SELECT grp, count(*) AS n, sum(v) AS total
                   |FROM graft.mvi_hvb GROUP BY grp
                   |HAVING count(*) >= 3""".stripMargin
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_hv LOCATION '$mt' AS $defSql")
      val (_, m1) = refreshInc("mvi_hv")
      assert(m1 == "full", m1)
      assertExact("mvi_hv", defSql)
      assert(spark.sql("SELECT grp FROM graft.mvi_hv").collect()
        .map(_.getString(0)).toSet === Set("a"))
      // group 'b' crosses the HAVING threshold upward, 'a' falls BELOW
      // it — the rescan must add one image row and retire another
      spark.sql("INSERT INTO graft.mvi_hvb VALUES (7, 'b', 8)")
      spark.sql("DELETE FROM graft.mvi_hvb WHERE id = 1")
      val (_, m2) = refreshInc("mvi_hv")
      assert(m2 == "incremental", m2)
      assertExact("mvi_hv", defSql)
      assert(spark.sql("SELECT grp FROM graft.mvi_hv").collect()
        .map(_.getString(0)).toSet === Set("b"),
        "a must leave (2 rows) and b must enter (3 rows)")
      // untouched sub-threshold group 'c' stays out; churn on it below
      // the threshold keeps it out and stays incremental
      spark.sql("INSERT INTO graft.mvi_hvb VALUES (8, 'c', 9)")
      val (_, m3) = refreshInc("mvi_hv")
      assert(m3 == "incremental", m3)
      assertExact("mvi_hv", defSql)
      // a non-deterministic HAVING refuses (checked on the WHOLE plan)
      val mt2 = tmp("hv_m2")
      spark.sql(s"""CREATE MATERIALIZED VIEW graft.mvi_hvr LOCATION '$mt2' AS
                   |SELECT grp, count(*) AS n FROM graft.mvi_hvb
                   |GROUP BY grp HAVING count(*) > rand() * 2""".stripMargin)
      val e = intercept[Exception](refreshInc("mvi_hvr"))
      assert(e.getMessage.contains("non-deterministic"), e.getMessage)
    } finally cleanup("mvi_hv", "mvi_hvr", "mvi_hvb")
  }

  test("multi-key dirty pruning (r18): files outside the per-column envelope never list") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val bt = tmp("mk_b"); val mt = tmp("mk_m")
    val rows = for { k1 <- Seq("a", "b", "c", "d"); i <- 1 to 50 }
      yield (k1, (i % 5).toLong, i.toLong)
    ManifestTable.commit(spark, bt,
      rows.toDF("k1", "k2", "v").repartitionByRange(4, col("k1")),
      SaveMode.Overwrite, statsColumns = Seq("k1", "k2"))
    GraftCatalog.register("mvi_mkb", bt)
    val defSql = "SELECT k1, k2, count(*) AS n, sum(v) AS total " +
      "FROM graft.mvi_mkb GROUP BY k1, k2"
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_mk LOCATION '$mt' AS $defSql")
      refreshInc("mvi_mk")
      val totalFiles = ManifestTable.read(spark, bt).inputFiles.length
      assert(totalFiles >= 4, s"layout must spread keys: $totalFiles files")
      // churn ONE key region: the per-column envelope is
      // k1 IN ('d') AND k2 IN (1, 2) — files holding a/b/c never list
      spark.sql("INSERT INTO graft.mvi_mkb VALUES ('d', 1, 1000), ('d', 2, 2000)")
      val (_, mode) = refreshInc("mvi_mk")
      assert(mode == "incremental", mode)
      assertExact("mvi_mk", defSql)
      assert(MviewIncremental.lastRescanFiles >= 1 &&
        MviewIncremental.lastRescanFiles < totalFiles,
        s"the 2-key envelope must prune the rescan: listed " +
          s"${MviewIncremental.lastRescanFiles} of >= $totalFiles")
      // a NULL in a dirty tuple: that column's clause carries IS NULL
      spark.sql("INSERT INTO graft.mvi_mkb VALUES ('d', NULL, 7)")
      val (_, m2) = refreshInc("mvi_mk")
      assert(m2 == "incremental", m2)
      assertExact("mvi_mk", defSql)
      assert(spark.sql(
        "SELECT total FROM graft.mvi_mk WHERE k1 = 'd' AND k2 IS NULL")
        .head().getLong(0) == 7L)
    } finally cleanup("mvi_mk", "mvi_mkb")
  }

  test("dirty-group rescan really is partial: clean-group image rows survive by copy") {
    import spark.implicits._
    val bt = tmp("part_b"); val mt = tmp("part_m")
    ManifestTable.commit(spark, bt,
      Seq((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 3L)).toDF("id", "grp", "v"),
      SaveMode.Overwrite)
    GraftCatalog.register("mvi_pb", bt)
    val defSql = "SELECT grp, sum(v) AS total FROM graft.mvi_pb GROUP BY grp"
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.mvi_part LOCATION '$mt' AS $defSql")
      refreshInc("mvi_part")
      spark.sql("INSERT INTO graft.mvi_pb VALUES (4, 'a', 10)")
      val (_, mode) = refreshInc("mvi_part")
      assert(mode == "incremental", mode)
      assertExact("mvi_part", defSql)
      assert(spark.sql("SELECT total FROM graft.mvi_part WHERE grp = 'a'")
        .head().getLong(0) == 11L)
    } finally cleanup("mvi_part", "mvi_pb")
  }
}
