package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.{GraftCatalog, ManifestTable}

/** Partition evolution (sources/ManifestTable.scala setPartitionSpec)
  * — the Iceberg spec-evolution idiom: a metadata-only commit changes
  * the layout for FUTURE writes, zero files move, and a snapshot that
  * mixes layout eras reads exactly (each era under its own
  * data-vs-path column split, grouped from the paths alone). Rewrites
  * localize files toward the head spec; time travel reads each
  * version under its own layout. */
class PartitionEvolutionSpec extends AnyFunSuite with SparkFixture {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft_pevo").toString + "/t"

  private def rows(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, i % 3, i.toDouble)).toDF("id", "p", "v")
  }

  test("flat → identity: old files read p from data, new from dirs, one exact table") {
    val t = fresh()
    ManifestTable.commit(spark, t, rows(1 to 30), SaveMode.Overwrite,
      statsColumns = Seq("id"))                          // v1: flat era
    val flatFiles = ManifestTable.snapshotFiles(spark, t)
    assert(flatFiles.forall(!_.contains("p=")), "flat era has no dirs")
    val v = ManifestTable.setPartitionSpec(spark, t, Seq("p"))
    assert(v === 2, "evolution is one metadata commit")
    assert(ManifestTable.snapshotFiles(spark, t).toSet === flatFiles.toSet,
      "evolution moves ZERO files")
    assert(ManifestTable.partitionColumns(spark, t) === Seq("p"))
    assert(ManifestTable.commitOp(spark, t).contains("set-partition-spec"))
    ManifestTable.commit(spark, t, rows(31 to 60))       // v3: hive era
    val mixed = ManifestTable.snapshotFiles(spark, t)
    assert(mixed.exists(_.contains("p=")) && mixed.exists(!_.contains("p=")),
      "the snapshot now spans two eras")
    // the mixed-era read is EXACT: every row, correct p everywhere
    val got = ManifestTable.read(spark, t).orderBy("id").collect()
    assert(got.length === 60)
    assert(got.forall(r => r.getInt(1) === (r.getLong(0) % 3).toInt),
      "old rows read p from parquet data, new rows from their dirs")
    // time travel: v1 still reads as the flat era it was
    assert(ManifestTable.read(spark, t, 1).count() === 30)
  }

  test("identity → flat: the reverse direction is just another era") {
    val t = fresh()
    ManifestTable.commit(spark, t, rows(1 to 30), SaveMode.Overwrite,
      partitionBy = Seq("p"), statsColumns = Seq("id"))  // v1: hive era
    ManifestTable.setPartitionSpec(spark, t, Nil)        // v2: → flat
    assert(ManifestTable.partitionColumns(spark, t).isEmpty)
    ManifestTable.commit(spark, t, rows(31 to 60))       // v3: flat era
    // create-time partitioned tables record partition columns LAST —
    // select by name, the order here is the create-time convention
    val got = ManifestTable.read(spark, t).select("id", "p", "v")
      .orderBy("id").collect()
    assert(got.length === 60)
    assert(got.forall(r => r.getInt(1) === (r.getLong(0) % 3).toInt),
      "hive-era rows derive p from dirs, flat-era rows read it from data")
  }

  test("evolution to a hidden transform: new files cluster by it, pruning fires per era") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t,
      (1 to 40).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
        .repartitionByRange(4, col("id")),
      SaveMode.Overwrite, statsColumns = Seq("id"))      // v1: flat
    ManifestTable.setPartitionSpec(spark, t, Seq("bucket(4, id)"))
    assert(ManifestTable.partitionTransforms(spark, t).map(_.kind) ===
      Seq("bucket"))
    ManifestTable.commit(spark, t,
      (41 to 80).map(i => (i.toLong, i.toDouble)).toDF("id", "v"))
    assert(ManifestTable.snapshotFiles(spark, t).exists(_.contains("id_bucket=")),
      "new files lay out under the hidden transform")
    val all = ManifestTable.read(spark, t)
    assert(all.count() === 80)
    assert(all.columns.toSeq === Seq("id", "v"),
      "the hidden layout column never surfaces")
    // stats pruning is era-agnostic: a point read keeps the one
    // flat-era range file + the new era's matching bucket files only
    assert(ManifestTable.readWhere(spark, t, col("id") === 5L).count() === 1)
    assert(ManifestTable.readWhere(spark, t, col("id") === 77L).count() === 1)
  }

  test("DML spans eras; rewrites localize toward the head spec") {
    val t = fresh()
    ManifestTable.commit(spark, t, rows(1 to 30), SaveMode.Overwrite,
      statsColumns = Seq("id"))                          // flat era
    ManifestTable.setPartitionSpec(spark, t, Seq("p"))
    ManifestTable.commit(spark, t, rows(31 to 60))       // hive era
    // a delete whose victims live in BOTH eras
    ManifestTable.deleteWhere(spark, t, col("id") % 10 === 0L)
    val got = ManifestTable.read(spark, t).orderBy("id").collect()
    assert(got.length === 54)
    assert(got.forall(r => r.getLong(0) % 10 != 0))
    assert(got.forall(r => r.getInt(1) === (r.getLong(0) % 3).toInt),
      "rewritten survivors keep exact p values in both eras")
    // the rewrite wrote its files under the HEAD spec: every file that
    // left the flat era re-landed partitioned
    val after = ManifestTable.snapshotFiles(spark, t)
    val newOnes = after.filterNot(ManifestTable
      .snapshotFiles(spark, t, 3).contains)
    assert(newOnes.nonEmpty && newOnes.forall(_.contains("p=")),
      s"victim rewrites must localize to the new era: $newOnes")
    // full compact finishes the migration: ONE era remains
    ManifestTable.compact(spark, t, targetFiles = 2)
    assert(ManifestTable.snapshotFiles(spark, t).forall(_.contains("p=")),
      "compact localizes every file to the head spec")
    assert(ManifestTable.read(spark, t).count() === 54)
  }

  test("refusals: unknown column, unsound transform source, collision, renamed column") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t,
      Seq((1L, "a", 1.0)).toDF("id", "s", "v"), SaveMode.Overwrite)
    val e1 = intercept[IllegalArgumentException](
      ManifestTable.setPartitionSpec(spark, t, Seq("ghost")))
    assert(e1.getMessage.contains("ghost"))
    val e2 = intercept[IllegalArgumentException](
      ManifestTable.setPartitionSpec(spark, t, Seq("days(s)")))
    assert(e2.getMessage.contains("prune mapping"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      ManifestTable.setPartitionSpec(spark, t, Seq("truncate(10, s)")))
    assert(e3.getMessage.contains("prune mapping"), e3.getMessage)
    // a renamed column's physical dir layer would disagree with the
    // new spec's dirs — refused with the workaround named
    ManifestTable.renameColumn(spark, t, "s", "s2")
    val e4 = intercept[IllegalArgumentException](
      ManifestTable.setPartitionSpec(spark, t, Seq("s2")))
    assert(e4.getMessage.contains("column mapping"), e4.getMessage)
    // …but a renamed TRANSFORM SOURCE is fine: the dirs spell the
    // target name and the derivation addresses the logical column
    ManifestTable.setPartitionSpec(spark, t, Seq("bucket(4, s2)"))
    ManifestTable.commit(spark, t,
      Seq((2L, "b", 2.0)).toDF("id", "s2", "v"))
    assert(ManifestTable.snapshotFiles(spark, t)
      .exists(_.contains("s2_bucket=")))
    assert(ManifestTable.read(spark, t).count() === 2)
    // same-spec call is a no-op, not a version
    val head = ManifestTable.currentVersion(spark, t)
    assert(ManifestTable.setPartitionSpec(spark, t,
      Seq("bucket(4, s2)")) === head)
  }

  test("REPLACE WHERE spans eras: victims in both, the batch lands head-era") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t, rows(1 to 30), SaveMode.Overwrite,
      statsColumns = Seq("id"))                          // flat era
    ManifestTable.setPartitionSpec(spark, t, Seq("p"))
    ManifestTable.commit(spark, t, rows(31 to 60))       // hive era
    // the region p=1 has rows in BOTH eras; the reload must claim all
    ManifestTable.replaceWhere(spark, t, col("p") === 1,
      Seq((101L, 1, 0.1), (102L, 1, 0.2)).toDF("id", "p", "v"))
    val got = ManifestTable.read(spark, t).select("id", "p", "v")
      .orderBy("id").collect()
    assert(got.count(_.getInt(1) == 1) === 2,
      "the region equals the batch across BOTH eras")
    assert(got.length === 42, "40 out-of-region rows + the 2-row batch")
    assert(got.filter(_.getInt(1) != 1).forall(r =>
      r.getInt(1) === (r.getLong(0) % 3).toInt),
      "out-of-region rows keep exact values in both eras")
    // the reload's files landed under the HEAD spec
    assert(ManifestTable.snapshotFiles(spark, t)
      .filter(_.contains("p=1")).nonEmpty)
  }

  test("the change feed and MERGE cross an evolution boundary exactly") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t, rows(1 to 10), SaveMode.Overwrite,
      statsColumns = Seq("id"))                          // v1: flat era
    ManifestTable.setPartitionSpec(spark, t, Seq("p"))   // v2
    ManifestTable.commit(spark, t, rows(11 to 20))       // v3: hive era
    // upsert whose matches live in BOTH eras; inserts land hive-era
    ManifestTable.upsert(spark, t,
      Seq((1L, 1, 99.0), (15L, 0, 88.0), (25L, 1, 77.0))
        .toDF("id", "p", "v"), Seq("id"))                // v4
    val got = ManifestTable.read(spark, t).select("id", "p", "v")
      .orderBy("id").collect()
    assert(got.length === 21)
    assert(got.find(_.getLong(0) == 1L).get.getDouble(2) === 99.0)
    assert(got.find(_.getLong(0) == 15L).get.getDouble(2) === 88.0)
    assert(got.find(_.getLong(0) == 25L).get.getDouble(2) === 77.0)
    // the change feed spans the evolution: every version's files read
    // under their OWN era, p exact everywhere
    val feed = ManifestTable.changes(spark, t, 0).select("id", "p")
      .collect()
    assert(feed.nonEmpty && feed.forall(r =>
      r.getInt(1) === (r.getLong(0) % 3).toInt),
      "change-feed rows must carry exact partition values in every era")
  }

  test("SQL face: ALTER TABLE … SET PARTITION SPEC, round trip through reads") {
    val t = fresh()
    ManifestTable.commit(spark, t, rows(1 to 20), SaveMode.Overwrite,
      statsColumns = Seq("id"))
    GraftCatalog.register("pevo", t)
    try {
      val out = spark.sql(
        "ALTER TABLE graft.pevo SET PARTITION SPEC (p)").head
      assert(out.getInt(0) === 2 &&
        out.getString(1) === "set-partition-spec(p)")
      spark.sql("INSERT INTO graft.pevo SELECT id + 100 AS id, " +
        "CAST(id % 3 AS INT) AS p, 1.0D AS v FROM range(10)")
      assert(spark.sql("SELECT count(*) FROM graft.pevo").head.getLong(0) === 30)
      assert(spark.sql(
        "SELECT count(*) FROM graft.pevo WHERE p = 1").head.getLong(0) > 0)
      // back to flat through SQL; the spec list may be empty
      val back = spark.sql(
        "ALTER TABLE graft.pevo SET PARTITION SPEC ()").head
      assert(back.getString(1) === "set-partition-spec(flat)")
      assert(spark.sql("SELECT count(*) FROM graft.pevo").head.getLong(0) === 30)
    } finally GraftCatalog.unregister("pevo")
  }
}
