package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.sources.ManifestTable

/** COLUMN MAPPING (sources/ManifestTable.scala renameColumn /
  * PhysNameKey) — the Delta columnMapping idiom: the recorded schema
  * carries each column's stable PHYSICAL (on-disk) name in field
  * metadata, so RENAME is a pure schema edit (zero data moves, files
  * of every era keep reading), re-adding a dropped name can take
  * fresh storage (the name-based resurrection caveat, fixed), and a
  * mapping-bearing root stamps the `colmap` protocol feature — the
  * r11 gate's first real client. */
class ColumnMappingSpec extends AnyFunSuite with SparkFixture {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft_colmap").toString + "/t"

  private def df3(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, i * 2.0, s"r$i")).toDF("id", "score", "s")
  }

  test("rename is metadata-only: every era reads, appends speak the new name") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t, df3(50), statsColumns = Seq("score"))
    val filesBefore = ManifestTable.snapshotFiles(spark, t)
    assert(ManifestTable.renameColumn(spark, t, "score", "quality") === 2)
    assert(ManifestTable.commitOp(spark, t) === Some("rename-column"))
    assert(ManifestTable.snapshotFiles(spark, t) === filesBefore,
      "rename must move zero data")
    assert(ManifestTable.tableFeatures(spark, t).contains("colmap"),
      "a mapping-bearing root must stamp the colmap feature")
    val got = ManifestTable.read(spark, t)
    assert(got.columns.toSeq === Seq("id", "quality", "s"))
    assert(got.filter($"id" === 7L).head.getDouble(1) === 14.0,
      "old files read their bytes under the new logical name")
    // appends speak the NEW name; the OLD one no longer resolves
    ManifestTable.commit(spark, t,
      Seq((51L, 999.0, "x")).toDF("id", "quality", "s"))
    assert(ManifestTable.read(spark, t).count() === 51)
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t, Seq((52L, 1.0, "y")).toDF("id", "score", "s"))
    }
    // time travel reads v1 under ITS schema — the old name
    assert(ManifestTable.read(spark, t, 1).columns.toSeq ===
      Seq("id", "score", "s"))
    assert(ManifestTable.read(spark, t, 1)
      .filter($"id" === 7L).head.getDouble(1) === 14.0)
    // rename chains and rename-back both work — physical stays put
    ManifestTable.renameColumn(spark, t, "quality", "rank")
    ManifestTable.renameColumn(spark, t, "rank", "score")
    val back = ManifestTable.read(spark, t)
    assert(back.columns.toSeq === Seq("id", "score", "s"))
    assert(back.filter($"id" === 51L).head.getDouble(1) === 999.0)
  }

  test("filters on the logical name push down to the physical parquet scan") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t, df3(100))
    ManifestTable.renameColumn(spark, t, "score", "quality")
    // the rename is a Project over the scan — Catalyst must push the
    // logical-name predicate THROUGH it, reaching parquet as a filter
    // on the physical name (codegen'd scan-level skipping, row-group
    // stats, the lot — a rename must not cost pushdown)
    val plan = ManifestTable.read(spark, t)
      .filter($"quality" > 50.0).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("score"),
      s"expected the quality predicate pushed down as physical 'score', got:\n$plan")
  }

  test("stats keys re-spell with the rename: pruning fires on the new name") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t,
      (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
        .repartitionByRange(5, col("id")),
      statsColumns = Seq("id"))
    ManifestTable.renameColumn(spark, t, "id", "key")
    val total = ManifestTable.snapshotFiles(spark, t).size
    val hit = ManifestTable.readWhere(spark, t, col("key") === 7L)
    assert(hit.count() === 1)
    assert(hit.inputFiles.length < total,
      "re-keyed stats must keep pruning on the renamed column")
    // null-count keys re-spell too: IS NULL pruning stays sound
    assert(ManifestTable.readWhere(spark, t, col("key").isNull).count() === 0)
  }

  test("rewrites after a rename: delete, update, compact keep the mapping") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t, df3(60), statsColumns = Seq("score"))
    ManifestTable.renameColumn(spark, t, "score", "quality")
    ManifestTable.deleteWhere(spark, t, col("quality") > 100.0) // ids 51+
    // deletion vectors exercise the (file, row-position) tagging path
    // on a MAPPED read — `_metadata` must survive the rename Project
    ManifestTable.deleteWhereVector(spark, t, col("id") === 50L)
    ManifestTable.materializeDeletes(spark, t)
    ManifestTable.updateWhere(spark, t,
      Seq("quality" -> (col("quality") + 0.5)), col("id") === 1L)
    ManifestTable.compact(spark, t, targetFiles = 1)
    val got = ManifestTable.read(spark, t)
    assert(got.columns.toSeq === Seq("id", "quality", "s"))
    assert(got.count() === 49)
    assert(got.filter($"id" === 1L).head.getDouble(1) === 2.5)
    assert(got.filter($"id" === 10L).head.getDouble(1) === 20.0)
    assert(ManifestTable.tableFeatures(spark, t).contains("colmap"),
      "rewrites carry the mapping (and its gate) forward")
    // an overwrite records a FRESH schema: mapping gone, gate dropped
    ManifestTable.commit(spark, t, df3(5), SaveMode.Overwrite)
    assert(!ManifestTable.tableFeatures(spark, t).contains("colmap"),
      "a mapping-free schema must drop the colmap gate (derived, not inherited)")
    assert(ManifestTable.read(spark, t).columns.toSeq === Seq("id", "score", "s"))
  }

  test("refusals: transform / bloom / constraint-referenced / collisions") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t,
      (1 to 40).map(i => (i.toLong, i % 4, i.toDouble)).toDF("id", "g", "v"),
      partitionBy = Seq("g"), statsColumns = Seq("id"))
    ManifestTable.addConstraint(spark, t, "v_pos", "v > 0")
    intercept[IllegalArgumentException](
      ManifestTable.renameColumn(spark, t, "v", "val"))
    ManifestTable.dropConstraint(spark, t, "v_pos")
    ManifestTable.renameColumn(spark, t, "v", "val") // now fine
    intercept[IllegalArgumentException]( // existing name
      ManifestTable.renameColumn(spark, t, "id", "val"))
    intercept[IllegalArgumentException]( // reserved
      ManifestTable.renameColumn(spark, t, "id", "__f"))

    val t2 = fresh()
    ManifestTable.commit(spark, t2,
      (1 to 40).map(i => (i.toLong, s"u$i")).toDF("id", "name"),
      partitionBy = Seq("bucket(4,id)"))
    intercept[IllegalArgumentException](
      ManifestTable.renameColumn(spark, t2, "id", "key"))
    ManifestTable.addBloom(spark, t2, Seq("name"))
    intercept[IllegalArgumentException](
      ManifestTable.renameColumn(spark, t2, "name", "uname"))

    // physical-collision guards: after rename a→b, logical 'a' still
    // NAMES b's storage — re-adding it plainly would alias the bytes
    val t3 = fresh()
    ManifestTable.commit(spark, t3, Seq((1L, 5.0)).toDF("id", "a"))
    ManifestTable.renameColumn(spark, t3, "a", "b")
    intercept[IllegalArgumentException](
      ManifestTable.addColumn(spark, t3, "a", LongType))
    intercept[IllegalArgumentException]( // evolution path, same hazard
      ManifestTable.commit(spark, t3,
        Seq((2L, 1.0, 9L)).toDF("id", "b", "a"), mergeSchema = true))
    // freshStorage dodges the collision: new storage, null history
    ManifestTable.addColumn(spark, t3, "a", LongType, freshStorage = true)
    val r = ManifestTable.read(spark, t3).head
    assert(r.getDouble(1) === 5.0 && r.isNullAt(2),
      "the fresh-storage re-add must NOT resurrect b's bytes")
  }

  test("IDENTITY partition column rename (r13): dirs keep the physical key") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t,
      (1 to 40).map(i => (i.toLong, s"g${i % 4}", i.toDouble)).toDF("id", "g", "v"),
      partitionBy = Seq("g"), statsColumns = Seq("id"))
    val filesBefore = ManifestTable.snapshotFiles(spark, t)
    assert(ManifestTable.renameColumn(spark, t, "g", "grp") === 2)
    assert(ManifestTable.snapshotFiles(spark, t) === filesBefore,
      "a partition-column rename must move zero data")
    assert(ManifestTable.partitionColumns(spark, t) === Seq("grp"),
      "the manifest layout must re-spell to the new logical name")
    // reads surface the new name with the partition values intact
    val got = ManifestTable.read(spark, t)
    assert(got.columns.contains("grp") && !got.columns.contains("g"))
    assert(got.filter($"grp" === "g1").count() === 10)
    // partition pruning fires on the NEW name (stats re-keyed)
    val pruned = ManifestTable.readWhere(spark, t, col("grp") === "g2")
    assert(pruned.inputFiles.length < filesBefore.size,
      "partition pruning must keep firing under the new name")
    assert(pruned.count() === 10)
    // appends speak the new name — and land under the PHYSICAL (old)
    // dir key, so the whole lineage keeps one dir grammar
    ManifestTable.commit(spark, t,
      Seq((41L, "g9", 1.0)).toDF("id", "grp", "v"))
    val newFile = (ManifestTable.snapshotFiles(spark, t).toSet --
      filesBefore.toSet).head
    assert(newFile.contains("/g=g9/"),
      s"new files must spell the physical dir key, got $newFile")
    assert(ManifestTable.readWhere(spark, t, col("grp") === "g9")
      .head.getLong(0) === 41L)
    // the old spelling no longer resolves for appends
    intercept[Exception](ManifestTable.commit(spark, t,
      Seq((42L, "gX", 1.0)).toDF("id", "g", "v")))
    // time travel reads v1 under ITS layout — the old name
    assert(ManifestTable.read(spark, t, 1).columns.contains("g"))
    // an UPDATE moving rows between partitions still lays out right
    ManifestTable.updateWhere(spark, t,
      Seq("grp" -> lit("g0")), col("id") === 41L)
    assert(ManifestTable.readWhere(spark, t, col("grp") === "g0")
      .collect().map(_.getLong(0)).toSet.contains(41L))
    assert(ManifestTable.readWhere(spark, t, col("grp") === "g9").count() === 0)
  }

  test("the change feed spans a PARTITION-column rename: values, not nulls") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t,
      (1 to 12).map(i => (i.toLong, s"g${i % 3}", i * 1.0)).toDF("id", "g", "v"),
      partitionBy = Seq("g"), statsColumns = Seq("id")) // v1: dirs g=...
    ManifestTable.renameColumn(spark, t, "g", "grp") // v2
    ManifestTable.commit(spark, t,
      Seq((13L, "g9", 13.0)).toDF("id", "grp", "v")) // v3, physical dirs g=
    // changes() across the rename: the v1 group's partition values
    // must surface under the NEW name — derived from the physical dir
    // key, never nulled as a missing data column
    val ch = ManifestTable.changes(spark, t, 0)
    assert(ch.columns.contains("grp"))
    val m = ch.collect().map(r => r.getLong(0) -> r.getAs[String]("grp")).toMap
    assert(m(4L) === "g1",
      "pre-rename groups must carry their REAL partition values under the new name")
    assert(m(13L) === "g9")
    assert(ch.filter(col("grp").isNull).count() === 0)
    // rowChanges' pre side reads a pre-rename file the same way
    ManifestTable.updateWhere(spark, t,
      Seq("v" -> lit(0.0)), col("id") === 2L) // v4 rewrites a v1 file
    val rc = ManifestTable.rowChanges(spark, t, 1, keys = Seq("id"))
      .filter(col("id") === 2L).collect()
    assert(rc.nonEmpty && rc.forall(_.getAs[String]("grp") == "g2"),
      "the pre-image must keep its partition value across the rename")
  }

  test("freshStorage re-add: the name-based resurrection caveat, fixed") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t, Seq((1L, "a", 99L)).toDF("id", "v", "score"))
    ManifestTable.dropColumn(spark, t, "score")
    ManifestTable.addColumn(spark, t, "score", LongType, freshStorage = true)
    // the old file physically holds score=99 — fresh storage must NOT
    // surface it (contrast ColumnEvolutionSpec's documented caveat for
    // the plain re-add)
    assert(ManifestTable.read(spark, t).select("score").head.isNullAt(0))
    assert(ManifestTable.tableFeatures(spark, t).contains("colmap"))
    // and new appends write/read the fresh storage fine
    ManifestTable.commit(spark, t, Seq((2L, "b", 7L)).toDF("id", "v", "score"))
    assert(ManifestTable.read(spark, t).orderBy("id").collect()
      .map(r => if (r.isNullAt(2)) -1L else r.getLong(2)).toSeq === Seq(-1L, 7L))
  }

  test("the change feed spans a rename: old groups re-spell to the new name") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t, df3(10)) // v1, files under 'score'
    ManifestTable.renameColumn(spark, t, "score", "quality") // v2
    ManifestTable.commit(spark, t,
      Seq((11L, 111.0, "n")).toDF("id", "quality", "s")) // v3
    val ch = ManifestTable.changes(spark, t, 0)
    assert(ch.columns.toSeq === Seq("id", "quality", "s"))
    val m = ch.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(3L) === 6.0, "v1-era rows must carry their REAL values " +
      "under the new name, not nulls")
    assert(m(11L) === 111.0)
    // rowChanges across the rename: the pre-image keeps its values
    ManifestTable.updateWhere(spark, t,
      Seq("quality" -> lit(0.0)), col("id") === 2L) // v4 rewrite
    val rc = ManifestTable.rowChanges(spark, t, 1, keys = Seq("id"))
      .filter(col("id") === 2L).orderBy("_change_type").collect()
    assert(rc.exists(r => r.getAs[String]("_change_type") == "update_post" &&
      r.getAs[Double]("quality") == 0.0))
  }

  test("mapping composes with type widening: rename then widen, both eras read") {
    import spark.implicits._
    import org.apache.spark.sql.types.LongType
    val t = fresh()
    // int32 era under the ORIGINAL name
    ManifestTable.commit(spark, t,
      (1 to 30).map(i => (i, s"r$i")).toDF("n", "s"), statsColumns = Seq("n"))
    ManifestTable.renameColumn(spark, t, "n", "key")
    ManifestTable.widenColumn(spark, t, "key", LongType)
    // widened era under the NEW name — beyond int32
    ManifestTable.commit(spark, t, Seq((5_000_000_000L, "big")).toDF("key", "s"))
    val got = ManifestTable.read(spark, t)
    assert(got.schema("key").dataType === LongType)
    assert(got.count() === 31)
    assert(got.agg(max("key")).head.getLong(0) === 5_000_000_000L)
    assert(got.filter(col("key") === 7L).head.getString(1) === "r7",
      "int32 pages under the old physical name must read as long " +
        "under the new logical name — mapping and widening stack")
    // and the stats still prune across both evolutions
    val hit = ManifestTable.readWhere(spark, t, col("key") === 7L)
    assert(hit.inputFiles.length < ManifestTable.snapshotFiles(spark, t).size)
  }

  test("clone and restore carry the mapping with the schema") {
    import spark.implicits._
    val t = fresh(); val dst = fresh()
    ManifestTable.commit(spark, t, df3(20), statsColumns = Seq("score"))
    ManifestTable.renameColumn(spark, t, "score", "quality")
    ManifestTable.cloneShallow(spark, t, dst)
    val c = ManifestTable.read(spark, dst)
    assert(c.columns.toSeq === Seq("id", "quality", "s"))
    assert(c.filter($"id" === 4L).head.getDouble(1) === 8.0)
    assert(ManifestTable.tableFeatures(spark, dst).contains("colmap"))
    // restore to the pre-rename image brings the old schema (and no gate)
    ManifestTable.restore(spark, t, 1)
    assert(ManifestTable.read(spark, t).columns.toSeq === Seq("id", "score", "s"))
    assert(!ManifestTable.tableFeatures(spark, t).contains("colmap"))
  }

  private def dfNested(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, (i * 2.0, s"tag$i")))
      .toDF("id", "meta")
      .select(col("id"), col("meta").cast("struct<a:double,b:string>").as("meta"))
  }

  test("NESTED rename (r13): meta.a -> meta.x is the same pure schema edit") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t, dfNested(20), statsColumns = Seq("id"))
    val filesBefore = ManifestTable.snapshotFiles(spark, t)
    assert(ManifestTable.renameColumnPath(spark, t, Seq("meta", "a"), "x") === 2)
    assert(ManifestTable.snapshotFiles(spark, t) === filesBefore,
      "a nested rename must move zero data")
    assert(ManifestTable.tableFeatures(spark, t).contains("colmap"),
      "a nested mapping must stamp the colmap feature too")
    val got = ManifestTable.read(spark, t)
    assert(got.schema("meta").dataType.simpleString === "struct<x:double,b:string>")
    assert(got.filter($"id" === 7L).select($"meta.x").head.getDouble(0) === 14.0,
      "old files read their nested bytes under the new logical name")
    // appends speak the NEW nested name and land under the OLD
    // physical one — the read then maps them back (write/read invert)
    ManifestTable.commit(spark, t,
      Seq((21L, (42.0, "n"))).toDF("id", "meta")
        .select(col("id"), col("meta").cast("struct<x:double,b:string>").as("meta")))
    val all = ManifestTable.read(spark, t)
    assert(all.count() === 21)
    assert(all.filter($"id" === 21L).select($"meta.x").head.getDouble(0) === 42.0)
    // the appended file physically stores 'a', not 'x' (stable storage)
    val newFile = (ManifestTable.snapshotFiles(spark, t).toSet -- filesBefore).head
    val raw = spark.read.parquet(s"$t/$newFile")
    assert(raw.schema("meta").dataType.simpleString === "struct<a:double,b:string>",
      "new files must store under the stable physical nested name")
    // time travel reads v1 under ITS schema — the old nested name
    assert(ManifestTable.read(spark, t, 1).schema("meta")
      .dataType.simpleString === "struct<a:double,b:string>")
    // rewrites keep the mapping: update a row, both eras still read
    ManifestTable.updateWhere(spark, t,
      Seq("id" -> (col("id") + 100L)), col("id") === 1L)
    val upd = ManifestTable.read(spark, t)
    assert(upd.filter($"id" === 101L).select($"meta.x").head.getDouble(0) === 2.0,
      "a rewrite must carry nested values through the physical rename")
    // and MERGE (the union path): an upsert through the mapped schema
    ManifestTable.upsert(spark, t,
      Seq((2L, (222.0, "up")), (50L, (500.0, "ins"))).toDF("id", "meta")
        .select(col("id"), col("meta").cast("struct<x:double,b:string>").as("meta")),
      Seq("id"))
    val m = ManifestTable.read(spark, t)
    assert(m.filter($"id" === 2L).select($"meta.x").head.getDouble(0) === 222.0)
    assert(m.filter($"id" === 50L).select($"meta.b").head.getString(0) === "ins")
    assert(m.filter($"id" === 7L).select($"meta.x").head.getDouble(0) === 14.0,
      "kept rows must survive a merge under the nested mapping")
  }

  test("NESTED rename through SQL and the change feed") {
    import spark.implicits._
    import graft.sources.GraftCatalog
    val t = fresh()
    ManifestTable.commit(spark, t, dfNested(5))
    GraftCatalog.register("cm_nested", t)
    try {
      spark.sql("ALTER TABLE graft.cm_nested RENAME COLUMN meta.a TO x")
      assert(ManifestTable.snapshotSchema(spark, t).get("meta")
        .dataType.simpleString === "struct<x:double,b:string>")
      // the change feed re-spells the v1 group's nested field: values,
      // not nulls, under the to-version spelling
      val ch = ManifestTable.changes(spark, t, 0)
      assert(ch.schema("meta").dataType.simpleString === "struct<x:double,b:string>")
      assert(ch.filter($"id" === 3L).select($"meta.x").head.getDouble(0) === 6.0,
        "v1-era nested values must surface under the new name in the feed")
    } finally GraftCatalog.unregister("cm_nested")
  }

  test("NESTED rename inside array elements and map values (r13)") {
    import spark.implicits._
    val t = fresh()
    // tags: array<struct<a,b>>, props: map<string, struct<p,q>>
    ManifestTable.commit(spark, t,
      (1 to 8).map(i => (i.toLong, Seq((i * 1.0, s"t$i")), Map("k" -> (i, s"v$i"))))
        .toDF("id", "tags", "props")
        .select(col("id"),
          col("tags").cast("array<struct<a:double,b:string>>").as("tags"),
          col("props").cast("map<string,struct<p:int,q:string>>").as("props")))
    val filesBefore = ManifestTable.snapshotFiles(spark, t)
    // a.element.b addressing, the Delta spelling
    ManifestTable.renameColumnPath(spark, t, Seq("tags", "element", "a"), "score")
    ManifestTable.renameColumnPath(spark, t, Seq("props", "value", "p"), "prio")
    assert(ManifestTable.snapshotFiles(spark, t) === filesBefore,
      "array/map-interior renames must move zero data")
    val got = ManifestTable.read(spark, t)
    assert(got.schema("tags").dataType.simpleString ===
      "array<struct<score:double,b:string>>")
    assert(got.schema("props").dataType.simpleString ===
      "map<string,struct<prio:int,q:string>>")
    assert(got.filter($"id" === 3L)
      .select(element_at($"tags", 1).getField("score")).head.getDouble(0) === 3.0,
      "old bytes must read under the new element-field name")
    assert(got.filter($"id" === 3L)
      .select(element_at($"props", "k").getField("prio")).head.getInt(0) === 3)
    // appends speak the new spelling and store the physical one
    ManifestTable.commit(spark, t,
      Seq((9L, Seq((99.0, "n")), Map("k" -> (9, "v9"))))
        .toDF("id", "tags", "props")
        .select(col("id"),
          col("tags").cast("array<struct<score:double,b:string>>").as("tags"),
          col("props").cast("map<string,struct<prio:int,q:string>>").as("props")))
    assert(ManifestTable.read(spark, t).count() === 9)
    val newFile = (ManifestTable.snapshotFiles(spark, t).toSet --
      filesBefore.toSet).head
    assert(spark.read.parquet(s"$t/$newFile").schema("tags")
      .dataType.simpleString === "array<struct<a:double,b:string>>",
      "new files must store the stable physical element-field name")
  }

  test("NESTED rename refusals: siblings, arrays, constraint references") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t, dfNested(5))
    // sibling name collision
    val e1 = intercept[IllegalArgumentException](
      ManifestTable.renameColumnPath(spark, t, Seq("meta", "a"), "b"))
    assert(e1.getMessage.contains("already exists"))
    // path through a non-struct
    val e2 = intercept[IllegalArgumentException](
      ManifestTable.renameColumnPath(spark, t, Seq("id", "a"), "b"))
    assert(e2.getMessage.contains("does not address"))
    // a CHECK constraint naming the nested field blocks its rename
    ManifestTable.addConstraint(spark, t, "a_pos", "meta.a > 0")
    val e3 = intercept[IllegalArgumentException](
      ManifestTable.renameColumnPath(spark, t, Seq("meta", "a"), "x"))
    assert(e3.getMessage.contains("a_pos"))
    ManifestTable.dropConstraint(spark, t, "a_pos")
    assert(ManifestTable.renameColumnPath(spark, t, Seq("meta", "a"), "x") > 0)
  }

  // ---- nested ADD / DROP / WIDEN (r14, the r13 verdict gap #7) ------

  private def nestedTable(): String = {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t,
      (1 to 20).map(i => (i.toLong, (i, s"b$i"))).toDF("id", "s"),
      SaveMode.Overwrite)
    t
  }

  test("nested ADD: old files read the new field as null; time travel keeps the old shape") {
    import spark.implicits._
    val t = nestedTable()
    assert(ManifestTable.addColumnsAt(spark, t,
      Seq(Seq("s", "c") -> LongType)) === 2)
    // old rows: s.c is null through parquet schema clipping
    val got = ManifestTable.read(spark, t)
    assert(got.select($"s.c").collect().forall(_.isNullAt(0)),
      "pre-add rows must read the nested field as null")
    assert(got.filter($"id" === 3L).select($"s._1").head.getInt(0) === 3,
      "the old nested fields still read their bytes")
    // an append carries values for BOTH eras to mix in one scan
    // (tuple-built, so nested fields are NOT NULL — the append check
    // must not care: nullability is not part of the type contract)
    ManifestTable.commit(spark, t,
      Seq((100L, (100, "new", 777L))).toDF("id", "s")
        .select($"id", struct($"s._1", $"s._2", $"s._3".as("c")).as("s")))
    val mixed = ManifestTable.read(spark, t)
    assert(mixed.filter($"id" === 100L).select($"s.c").head.getLong(0) === 777L)
    assert(mixed.filter($"id" === 3L).select($"s.c").head.isNullAt(0))
    // time travel: v1's recorded schema has NO s.c
    val v1 = ManifestTable.read(spark, t, 1)
    assert(!v1.schema("s").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.contains("c"),
      "the pre-add snapshot keeps its own shape")
    assert(v1.count() === 20)
  }

  test("nested re-add after a nested rename needs fresh storage (no byte resurrection at depth)") {
    import spark.implicits._
    val t = nestedTable()
    // rename s._1 -> s.z: physical storage stays '_1'
    assert(ManifestTable.renameColumnPath(spark, t, Seq("s", "_1"), "z") === 2)
    // plain re-add of the physical spelling: two fields would read the
    // same bytes — refused, exactly like top-level
    val e = intercept[Exception](ManifestTable.addColumnsAt(spark, t,
      Seq(Seq("s", "_1") -> org.apache.spark.sql.types.IntegerType)))
    assert(e.getMessage.contains("freshStorage"), e.getMessage)
    // fresh storage: uuid-suffixed physical name; old bytes stay with z
    assert(ManifestTable.addColumnsAt(spark, t,
      Seq(Seq("s", "_1") -> org.apache.spark.sql.types.IntegerType),
      freshStorage = true) === 3)
    val got = ManifestTable.read(spark, t)
    assert(got.filter($"id" === 5L).select($"s.z").head.getInt(0) === 5,
      "the renamed field keeps its bytes")
    assert(got.select($"s._1").collect().forall(_.isNullAt(0)),
      "the re-added field must NOT resurrect the old bytes")
  }

  test("nested DROP: field gone, last-field and constraint references refuse") {
    import spark.implicits._
    val t = nestedTable()
    ManifestTable.addConstraint(spark, t, "b_set", "s._2 IS NOT NULL")
    val e0 = intercept[Exception](
      ManifestTable.dropColumnsAt(spark, t, Seq(Seq("s", "_2"))))
    assert(e0.getMessage.contains("b_set"),
      s"a constraint-referenced nested field must refuse: ${e0.getMessage}")
    ManifestTable.dropConstraint(spark, t, "b_set")
    assert(ManifestTable.dropColumnsAt(spark, t, Seq(Seq("s", "_2"))) > 0)
    val got = ManifestTable.read(spark, t)
    assert(got.schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq === Seq("_1"))
    assert(got.count() === 20)
    // the struct's last field cannot go (an empty struct is unwritable)
    val e1 = intercept[Exception](
      ManifestTable.dropColumnsAt(spark, t, Seq(Seq("s", "_1"))))
    assert(e1.getMessage.contains("last field"), e1.getMessage)
  }

  test("nested WIDEN: int→long at depth, old pages up-cast; non-widening refuses") {
    import spark.implicits._
    val t = nestedTable()
    assert(ManifestTable.widenColumnsAt(spark, t,
      Seq(Seq("s", "_1") -> LongType)) === 2)
    val got = ManifestTable.read(spark, t)
    assert(got.schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("_1")
      .dataType === LongType)
    assert(got.filter($"id" === 9L).select($"s._1").head.getLong(0) === 9L,
      "old int32 pages must up-cast at depth")
    val e = intercept[Exception](ManifestTable.widenColumnsAt(spark, t,
      Seq(Seq("s", "_2") -> LongType)))
    assert(e.getMessage.contains("widen"), e.getMessage)
  }

  test("nested DDL through SQL: ADD COLUMNS (s.c), DROP COLUMN s._2, ALTER COLUMN s._1 TYPE, array interiors") {
    import spark.implicits._
    import graft.sources.GraftCatalog
    val t = fresh()
    ManifestTable.commit(spark, t,
      (1 to 10).map(i => (i.toLong, (i, s"b$i"), Seq((i, i * 1.0f))))
        .toDF("id", "s", "arr"), SaveMode.Overwrite)
    GraftCatalog.register("cm_nested", t)
    try {
      spark.sql("ALTER TABLE graft.cm_nested ADD COLUMNS (s.c BIGINT)")
      spark.sql("ALTER TABLE graft.cm_nested ALTER COLUMN s._1 TYPE BIGINT")
      spark.sql("ALTER TABLE graft.cm_nested DROP COLUMN s._2")
      // inside an array element's struct, Delta path spelling
      spark.sql("ALTER TABLE graft.cm_nested ADD COLUMNS (arr.element.tag STRING)")
      spark.sql("ALTER TABLE graft.cm_nested ALTER COLUMN arr.element._2 TYPE DOUBLE")
      val got = spark.sql("SELECT id, s._1 AS a, s.c AS c, arr FROM graft.cm_nested")
      assert(got.filter($"id" === 4L).head.getLong(1) === 4L)
      assert(got.filter($"id" === 4L).head.isNullAt(2))
      val arr = spark.sql(
        "SELECT arr[0]._2 AS f, arr[0].tag AS tag FROM graft.cm_nested WHERE id = 4")
        .head
      assert(arr.getDouble(0) === 4.0 && arr.isNullAt(1),
        "array-interior widen + add must read old elements correctly")
      // IF EXISTS resolves nested paths too
      spark.sql("ALTER TABLE graft.cm_nested DROP COLUMN IF EXISTS s.ghost")
      val e = intercept[Exception](
        spark.sql("ALTER TABLE graft.cm_nested DROP COLUMN s.ghost"))
      assert(e.getMessage.contains("ghost"), e.getMessage)
    } finally GraftCatalog.unregister("cm_nested")
  }
}
