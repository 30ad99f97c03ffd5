package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.sources.ManifestTable

/** Metadata-only column evolution (sources/ManifestTable.scala
  * addColumn / dropColumn): schema changes as O(manifest) commits —
  * zero data files move, old files read an added column as null, a
  * dropped column disappears from every reader while its bytes stay
  * untouched on disk. */
class ColumnEvolutionSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_colevo").toString

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  test("addColumn is metadata-only: old files read null, new appends carry values") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    val filesBefore = ManifestTable.snapshotFiles(spark, t)
    assert(ManifestTable.addColumn(spark, t, "score", LongType) === 2)
    assert(ManifestTable.snapshotFiles(spark, t) === filesBefore)
    assert(ManifestTable.commitOp(spark, t) === Some("add-column"))
    import spark.implicits._
    ManifestTable.commit(spark, t,
      Seq((3L, "c", 30L)).toDF("id", "v", "score"))
    val got = ManifestTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq === Seq((1L, -1L), (2L, -1L), (3L, 30L)))
  }

  test("dropColumn removes the column from every reader; stats entries stripped") {
    val t = freshTable()
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    ManifestTable.commit(spark, t,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "v", "score"),
      SaveMode.Overwrite, statsColumns = Seq("id", "score"))
    val filesBefore = ManifestTable.snapshotFiles(spark, t)
    ManifestTable.dropColumn(spark, t, "score")
    assert(ManifestTable.snapshotFiles(spark, t) === filesBefore)
    assert(ManifestTable.read(spark, t).columns.toSeq === Seq("id", "v"))
    assert(ManifestTable.snapshotStats(spark, t).values
      .forall(!_.contains("score")), "dropped column's stats must go")
    // time travel still sees the column
    assert(ManifestTable.read(spark, t, 1).columns.contains("score"))
  }

  test("drop is refused for partition columns and referenced constraints/tombstones") {
    val t = freshTable()
    import spark.implicits._
    ManifestTable.commit(spark, t,
      Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "p"),
      partitionBy = Seq("p"))
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, t, "p")
    }
    val t2 = freshTable()
    ManifestTable.commit(spark, t2, df(1L -> "a"))
    ManifestTable.addConstraint(spark, t2, "v_set", "v IS NOT NULL")
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, t2, "v")
    }
    ManifestTable.dropConstraint(spark, t2, "v_set")
    val t3 = freshTable()
    ManifestTable.commit(spark, t3, df(1L -> "del", 2L -> "keep"))
    ManifestTable.deleteWhereLazy(spark, t3, col("v") === "del")
    intercept[IllegalArgumentException] {
      ManifestTable.dropColumn(spark, t3, "v")
    }
    ManifestTable.materializeDeletes(spark, t3)
    ManifestTable.dropColumn(spark, t3, "v")
    assert(ManifestTable.read(spark, t3).columns.toSeq === Seq("id"))
    assert(ManifestTable.read(spark, t3).count() === 1)
  }

  test("add/drop/re-add: the name-based mapping caveat is real and documented") {
    val t = freshTable()
    import spark.implicits._
    ManifestTable.commit(spark, t, Seq((1L, "a", 99L)).toDF("id", "v", "score"))
    ManifestTable.dropColumn(spark, t, "score")
    ManifestTable.addColumn(spark, t, "score", LongType)
    // the old file physically holds score=99 — name-based mapping
    // surfaces it again (the documented pre-column-mapping behavior)
    val got = ManifestTable.read(spark, t).select("score").collect().head
    assert(got.getLong(0) === 99L)
  }

  test("Spark's parquet reader up-casts narrower pages under a widened read schema") {
    // promoted r11 probe 1 — the enabling fact for metadata-only type
    // widening: files written int32/float read correctly under a
    // long/double schema with zero rewrite. This is what makes
    // widenColumn a manifest edit instead of a 100 TB rewrite.
    import spark.implicits._
    import org.apache.spark.sql.types._
    val d = freshTable() + "/w"
    Seq((1, 1.5f), (2, 2.5f)).toDF("k", "x").write.parquet(d)
    val widened = StructType(Seq(
      StructField("k", LongType), StructField("x", DoubleType)))
    val rows = spark.read.schema(widened).parquet(d).orderBy("k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5))
    // byte/short → int, int → double
    Seq((1.toShort, 7)).toDF("s", "i").write.mode("overwrite").parquet(d)
    val w2 = StructType(Seq(StructField("s", IntegerType),
      StructField("i", DoubleType)))
    val r2 = spark.read.schema(w2).parquet(d).collect().head
    assert(r2.getInt(0) == 1 && r2.getDouble(1) == 7.0)
  }

  test("widenColumn is metadata-only: old int32 files read as long, appends carry long") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val t = freshTable()
    ManifestTable.commit(spark, t,
      (1 to 100).map(i => (i, i.toFloat / 2)).toDF("id", "x")
        .repartition(4, col("id")),
      statsColumns = Seq("id"))
    val filesBefore = ManifestTable.snapshotFiles(spark, t)
    val statsBefore = ManifestTable.snapshotStats(spark, t)
    assert(ManifestTable.widenColumn(spark, t, "id", LongType) === 2)
    assert(ManifestTable.widenColumn(spark, t, "x", DoubleType) === 3)
    assert(ManifestTable.commitOp(spark, t) === Some("widen-column"))
    assert(ManifestTable.snapshotFiles(spark, t) === filesBefore,
      "widening must move zero data")
    assert(ManifestTable.snapshotStats(spark, t) === statsBefore,
      "widening is value-preserving — recorded ranges stay exact")
    val sch = ManifestTable.read(spark, t).schema
    assert(sch("id").dataType === LongType && sch("x").dataType === DoubleType)
    // the widened era holds values the old type could not
    ManifestTable.commit(spark, t,
      Seq((3_000_000_000L, 9.25)).toDF("id", "x"))
    val got = ManifestTable.read(spark, t)
    assert(got.count() === 101)
    assert(got.agg(max("id")).head.getLong(0) === 3_000_000_000L)
    assert(got.filter(col("id") === 7L).agg(sum("x")).head.getDouble(0) === 3.5)
    // strict append discipline: a narrow batch is refused post-widen
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t, Seq((5, 1.0f)).toDF("id", "x"))
    }
    // stats pruning still fires across the era boundary: an old-era
    // point lookup drops the new-era file
    val total = ManifestTable.snapshotFiles(spark, t).size
    val hit = ManifestTable.readWhere(spark, t, col("id") === 7L)
    assert(hit.count() === 1)
    assert(hit.inputFiles.length < total,
      "old-era ranges must keep pruning after the widen")
  }

  test("narrowing and lossy changes are refused; unknown column is refused") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val t = freshTable()
    ManifestTable.commit(spark, t,
      Seq((1L, 2.5, "a")).toDF("id", "x", "s"))
    def refused(name: String, to: DataType): Unit = {
      val e = intercept[IllegalArgumentException](
        ManifestTable.widenColumn(spark, t, name, to))
      assert(e.getMessage.contains("widen"), e.getMessage)
    }
    refused("id", IntegerType)   // narrowing
    refused("id", DoubleType)    // lossy above 2^53
    refused("x", FloatType)      // narrowing
    refused("s", LongType)       // no embedding at all
    refused("id", StringType)    // not a widening even though lossless
    intercept[IllegalArgumentException](
      ManifestTable.widenColumn(spark, t, "nope", LongType))
    assert(ManifestTable.currentVersion(spark, t) === 1,
      "every refusal must leave the table untouched")
  }

  test("hash-sensitive columns refuse to widen: bucket source, bloom-indexed") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val t = freshTable()
    ManifestTable.commit(spark, t,
      (1 to 50).map(i => (i, s"u$i")).toDF("id", "name"),
      partitionBy = Seq("bucket(4,id)"))
    val e = intercept[IllegalArgumentException](
      ManifestTable.widenColumn(spark, t, "id", LongType))
    assert(e.getMessage.contains("bucket"), e.getMessage)

    val t2 = freshTable()
    ManifestTable.commit(spark, t2,
      (1 to 50).map(i => (i, s"u$i")).toDF("id", "name"),
      statsColumns = Seq("id"))
    ManifestTable.addBloom(spark, t2, Seq("id"))
    val e2 = intercept[IllegalArgumentException](
      ManifestTable.widenColumn(spark, t2, "id", LongType))
    assert(e2.getMessage.contains("bloom"), e2.getMessage)
    // the documented path out: drop the config, widen, re-add
    ManifestTable.dropBloom(spark, t2)
    ManifestTable.widenColumn(spark, t2, "id", LongType)
    ManifestTable.addBloom(spark, t2, Seq("id"))
    assert(ManifestTable.read(spark, t2).schema("id").dataType === LongType)
    assert(ManifestTable.read(spark, t2).count() === 50)

    // an IDENTITY partition column widens fine — its pruning rides
    // type-agnostic degenerate double ranges
    val t3 = freshTable()
    ManifestTable.commit(spark, t3,
      (1 to 60).map(i => (i.toLong, i % 3, s"r$i")).toDF("id", "g", "s"),
      partitionBy = Seq("g"))
    ManifestTable.widenColumn(spark, t3, "g", LongType)
    val pr = ManifestTable.readWhere(spark, t3, col("g") === 1L)
    assert(pr.count() === 20)
    assert(pr.inputFiles.length < ManifestTable.snapshotFiles(spark, t3).size,
      "partition pruning must survive the widen")
  }
}
