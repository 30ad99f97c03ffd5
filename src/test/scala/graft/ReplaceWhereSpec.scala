package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** REPLACE WHERE (sources/ManifestTable.scala replaceWhere) — the
  * idempotent region reload: one committed version that deletes the
  * predicate region and inserts the batch, whose rows must all fall
  * inside the region. The cost-model assertions mirror
  * UpdateWhereSpec's: only match-holding files rewrite, untouched
  * files carry by reference, and the batch rides the append
  * discipline (exact schema, CHECK validation). */
class ReplaceWhereSpec extends AnyFunSuite with SparkFixture {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft_rpw").toString + "/t"

  test("replace rewrites only region files; the region equals the batch") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t,
      (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
        .repartitionByRange(5, col("id")),
      SaveMode.Overwrite, statsColumns = Seq("id"))
    val before = ManifestTable.snapshotFiles(spark, t)
    val ver = ManifestTable.replaceWhere(spark, t, col("id") <= 20L,
      Seq((1L, 111.0), (2L, 222.0)).toDF("id", "v"))
    assert(ver === 2)
    assert(ManifestTable.commitOp(spark, t) === Some("replace-where"))
    val after = ManifestTable.snapshotFiles(spark, t)
    val carried = after.count(before.contains)
    assert(carried >= 3,
      s"files outside the region must carry by reference ($carried)")
    val got = ManifestTable.read(spark, t).orderBy("id").collect()
    assert(got.length === 82, "the 20-row region becomes the 2-row batch")
    assert(got.take(2).map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((1L, 111.0), (2L, 222.0)), "the region equals the batch")
    assert(got.drop(2).forall(r => r.getDouble(1) === r.getLong(0).toDouble),
      "rows outside the region are untouched")
  }

  test("batch rows outside the region refuse before any write") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t, Seq((1L, 1.0)).toDF("id", "v"))
    val dataDirs = new java.io.File(t, "data").listFiles().length
    val e = intercept[IllegalArgumentException](
      ManifestTable.replaceWhere(spark, t, col("id") < 10L,
        Seq((50L, 5.0)).toDF("id", "v")))
    assert(e.getMessage.contains("OUTSIDE the predicate region"))
    assert(ManifestTable.currentVersion(spark, t) === 1)
    assert(new java.io.File(t, "data").listFiles().length === dataDirs,
      "a refused replace must write zero bytes")
  }

  test("append discipline: schema mismatch and CHECK violations refuse") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t, Seq((1L, 1.0)).toDF("id", "v"))
    ManifestTable.addConstraint(spark, t, "v_pos", "v >= 0")
    val e = intercept[IllegalArgumentException](
      ManifestTable.replaceWhere(spark, t, col("id") === 1L,
        Seq((1L, "wrong")).toDF("id", "v")))
    assert(e.getMessage.contains("schema mismatch"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      ManifestTable.replaceWhere(spark, t, col("id") === 1L,
        Seq((1L, -5.0)).toDF("id", "v")))
    assert(e2.getMessage.contains("v_pos"), e2.getMessage)
    assert(ManifestTable.currentVersion(spark, t) === 2,
      "refused replaces leave the head (v2 = the constraint) untouched")
  }

  test("empty batch = region delete; empty region = plain insert; both-empty = no-op") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t,
      Seq((1L, 1.0), (50L, 50.0)).toDF("id", "v"),
      statsColumns = Seq("id"))
    // empty region + empty batch: no new version
    assert(ManifestTable.replaceWhere(spark, t, col("id") > 1000L,
      Seq.empty[(Long, Double)].toDF("id", "v")) === 1)
    // empty region + rows: a plain insert into the region
    ManifestTable.replaceWhere(spark, t, col("id") === 7L,
      Seq((7L, 7.0)).toDF("id", "v"))
    assert(ManifestTable.read(spark, t).count() === 3)
    // rows in region + empty batch: a region delete
    ManifestTable.replaceWhere(spark, t, col("id") === 7L,
      Seq.empty[(Long, Double)].toDF("id", "v"))
    assert(ManifestTable.read(spark, t).orderBy("id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 50L))
  }

  test("identity-partitioned region reload keeps the layout; other partitions carry") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t,
      (1 to 30).map(i => (i.toLong, i % 3, i.toDouble)).toDF("id", "p", "v"),
      SaveMode.Overwrite, partitionBy = Seq("p"), statsColumns = Seq("id"))
    val before = ManifestTable.snapshotFiles(spark, t)
    ManifestTable.replaceWhere(spark, t, col("p") === 1,
      Seq((101L, 1, 0.5), (102L, 1, 0.6)).toDF("id", "p", "v"))
    val after = ManifestTable.snapshotFiles(spark, t)
    assert(before.filterNot(_.contains("p=1")).forall(after.contains),
      "partitions outside the region must carry by reference")
    assert(after.filterNot(before.contains).forall(_.contains("p=1")),
      "new files must land under the region's partition dirs")
    assert(ManifestTable.read(spark, t).filter(col("p") === 1)
      .orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(101L, 102L))
    assert(ManifestTable.read(spark, t).count() === 22,
      "20 untouched rows + the 2-row batch")
    // partition pruning still fires on the reloaded region
    assert(ManifestTable.readWhere(spark, t, col("id") === 101L)
      .count() === 1)
  }
}
