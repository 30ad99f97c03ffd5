package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** UPDATE-by-predicate (sources/ManifestTable.scala updateWhere) — the
  * Delta UPDATE shape: only files containing matching rows are
  * rewritten (assignments applied to the matches, their neighbors
  * carried verbatim), untouched files carry by reference, assignment
  * types go through the widening lattice or refuse, updated rows
  * re-validate CHECK constraints, and hidden/identity layouts survive
  * like every other rewrite. */
class UpdateWhereSpec extends AnyFunSuite with SparkFixture {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft_upd").toString + "/t"

  test("update rewrites only affected files; neighbors and untouched files carry") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t,
      (1 to 100).map(i => (i.toLong, i.toDouble, s"r$i")).toDF("id", "v", "s")
        .repartitionByRange(5, col("id")),
      SaveMode.Overwrite, statsColumns = Seq("id"))
    val before = ManifestTable.snapshotFiles(spark, t)
    // ids 1–20 live in ~1 range-file; the other ~4 files are untouched
    val ver = ManifestTable.updateWhere(spark, t,
      Seq("v" -> (col("v") * 10)), col("id") <= 20L)
    assert(ver === 2)
    assert(ManifestTable.commitOp(spark, t) === Some("update"))
    val after = ManifestTable.snapshotFiles(spark, t)
    val carried = after.count(before.contains)
    assert(carried >= 3, s"untouched files must carry by reference ($carried)")
    val got = ManifestTable.read(spark, t).orderBy("id").collect()
    assert(got.length === 100)
    assert(got.take(20).forall(r => r.getDouble(1) === r.getLong(0) * 10.0),
      "matching rows take the assignment")
    assert(got.drop(20).forall(r => r.getDouble(1) === r.getLong(0).toDouble),
      "non-matching rows — including neighbors in rewritten files — are untouched")
    assert(got.forall(r => r.getString(2) == s"r${r.getLong(0)}"),
      "unassigned columns carry verbatim")
    // no match → no commit, same contract as deleteWhere
    assert(ManifestTable.updateWhere(spark, t,
      Seq("v" -> lit(0.0)), col("id") > 1000L) === 2)
  }

  test("NULL predicate updates nothing; multiple assignments apply together") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t,
      Seq((1L, Some(5.0), "a"), (2L, None, "b"), (3L, Some(7.0), "c"))
        .toDF("id", "v", "s"))
    // v > 6 is NULL for id=2 — that row must stay untouched (SQL
    // three-valued logic: NULL is not TRUE)
    ManifestTable.updateWhere(spark, t,
      Seq("s" -> upper(col("s")), "v" -> (col("v") + 1)), col("v") > 6.0)
    val got = ManifestTable.read(spark, t).orderBy("id").collect()
    assert(got.map(_.getString(2)).toSeq === Seq("a", "b", "C"))
    assert(got(2).getDouble(1) === 8.0)
    assert(got(1).isNullAt(1))
  }

  test("assignment types: widening-lattice casts in, anything else refused") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t, Seq((1L, 2.5)).toDF("id", "v"))
    // int literal into a long column widens implicitly
    ManifestTable.updateWhere(spark, t, Seq("id" -> lit(7)), col("id") === 1L)
    assert(ManifestTable.read(spark, t).head.getLong(0) === 7L)
    // string into a double column refuses, loudly, before any write
    val e = intercept[IllegalArgumentException](
      ManifestTable.updateWhere(spark, t, Seq("v" -> lit("x")), col("id") === 7L))
    assert(e.getMessage.contains("widening"), e.getMessage)
    // unknown column refuses
    intercept[IllegalArgumentException](
      ManifestTable.updateWhere(spark, t, Seq("nope" -> lit(1)), lit(true)))
    assert(ManifestTable.currentVersion(spark, t) === 2)
  }

  test("an update minting a CHECK violation is refused before any data is written") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t,
      (1 to 10).map(i => (i.toLong, i.toDouble)).toDF("id", "v"))
    ManifestTable.addConstraint(spark, t, "v_pos", "v > 0")
    val head = ManifestTable.currentVersion(spark, t)
    intercept[IllegalArgumentException](
      ManifestTable.updateWhere(spark, t,
        Seq("v" -> lit(-1.0)), col("id") === 3L))
    assert(ManifestTable.currentVersion(spark, t) === head,
      "the refused update must not commit")
    // a satisfying update passes
    ManifestTable.updateWhere(spark, t, Seq("v" -> lit(99.0)), col("id") === 3L)
    assert(ManifestTable.read(spark, t).filter(col("id") === 3L)
      .head.getDouble(1) === 99.0)
  }

  test("updating an identity partition column moves rows between dirs") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t,
      (1 to 40).map(i => (i.toLong, i % 4, s"r$i")).toDF("id", "g", "s"),
      partitionBy = Seq("g"))
    ManifestTable.updateWhere(spark, t,
      Seq("g" -> lit(9)), col("g") === 2)
    val got = ManifestTable.read(spark, t)
    assert(got.filter(col("g") === 2).count() === 0)
    assert(got.filter(col("g") === 9).count() === 10)
    assert(ManifestTable.snapshotFiles(spark, t).exists(_.contains("g=9")),
      "moved rows must land in their new partition dir")
    // partition pruning still works on the moved value
    val hit = ManifestTable.readWhere(spark, t, col("g") === 9)
    assert(hit.count() === 10)
  }

  test("hidden-transform layouts survive; DV'd rows do not resurrect") {
    import spark.implicits._
    val t = fresh()
    ManifestTable.commit(spark, t,
      (1 to 60).map(i => (i.toLong, i.toDouble)).toDF("id", "v"),
      partitionBy = Seq("bucket(4,id)"), statsColumns = Seq("id"))
    ManifestTable.deleteWhereVector(spark, t, col("id") === 5L)
    ManifestTable.updateWhere(spark, t,
      Seq("v" -> (col("v") + 1000)), col("id") <= 10L)
    val got = ManifestTable.read(spark, t)
    assert(got.count() === 59, "the DV'd row must not resurrect through the rewrite")
    assert(got.filter(col("id") === 3L).head.getDouble(1) === 1003.0)
    assert(got.filter(col("id") === 30L).head.getDouble(1) === 30.0)
    assert(ManifestTable.snapshotFiles(spark, t).forall(_.contains("id_bucket=")),
      "the hidden layout must survive the update rewrite")
    // the hidden target is unassignable — not a schema column
    intercept[IllegalArgumentException](
      ManifestTable.updateWhere(spark, t,
        Seq("id_bucket" -> lit(0L)), lit(true)))
  }
}
