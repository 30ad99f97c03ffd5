package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** Metadata-only `count(*)` (sources/ManifestTable.scala rowCount —
  * the Delta numRecords / metadata-only-query idiom): per-file row
  * counts recorded by the write-time stats pass, summed from the
  * manifest alone, exact under deletion vectors, and refused (None,
  * never a wrong number) whenever metadata does not fully determine
  * the answer. */
class RowCountSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_rc").toString

  private def df(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"v$i")).toDF("id", "v")
  }

  test("count from metadata equals the scan, across appends") {
    val t = freshDir()
    ManifestTable.commit(spark, t, df(100).repartition(4),
      statsColumns = Seq("id"))
    assert(ManifestTable.rowCount(spark, t) === Some(100L))
    ManifestTable.commit(spark, t, df(50).withColumn("id", col("id") + 1000),
      statsColumns = Seq("id"))
    assert(ManifestTable.rowCount(spark, t) === Some(150L))
    assert(ManifestTable.read(spark, t).count() === 150L)
  }

  test("a stats-less table cannot answer from metadata — None, not wrong") {
    val t = freshDir()
    // no stats, no bloom: the write-time pass never runs, files carry
    // no row stat
    ManifestTable.commit(spark, t, df(100))
    assert(ManifestTable.rowCount(spark, t).isEmpty)
    // …but appends onto a stats-tracked table DO carry the row stat
    // (derived commits re-collect the head's stats set), so one
    // stats-less v1 is the only way to an uncounted lineage
    val t2 = freshDir()
    ManifestTable.commit(spark, t2, df(100), statsColumns = Seq("id"))
    ManifestTable.commit(spark, t2, df(7).withColumn("id", col("id") + 500))
    assert(ManifestTable.rowCount(spark, t2) === Some(107L))
  }

  test("deletion vectors subtract exactly; tombstones refuse until materialized") {
    val t = freshDir()
    ManifestTable.commit(spark, t, df(100).repartition(4),
      statsColumns = Seq("id"))
    ManifestTable.deleteWhereVector(spark, t, col("id") % 10 === 0)
    assert(ManifestTable.rowCount(spark, t) === Some(90L))
    ManifestTable.deleteWhereLazy(spark, t, col("id") < 20)
    assert(ManifestTable.rowCount(spark, t).isEmpty,
      "a pending tombstone's hidden-row count is unknown")
    ManifestTable.materializeDeletes(spark, t)
    val expect = ManifestTable.read(spark, t).count()
    assert(ManifestTable.rowCount(spark, t) === Some(expect))
  }

  test("a full delete leaves a countable empty snapshot") {
    val t = freshDir()
    ManifestTable.commit(spark, t, df(10), statsColumns = Seq("id"))
    ManifestTable.deleteWhere(spark, t, lit(true))
    assert(ManifestTable.rowCount(spark, t) === Some(0L))
  }

  test("clones carry the row stat; time travel counts the old image") {
    val src = freshDir(); val dst = freshDir()
    ManifestTable.commit(spark, src, df(60), statsColumns = Seq("id"))
    ManifestTable.commit(spark, src, df(40).withColumn("id", col("id") + 100),
      statsColumns = Seq("id"))
    ManifestTable.cloneShallow(spark, src, dst)
    assert(ManifestTable.rowCount(spark, dst) === Some(100L))
    assert(ManifestTable.rowCount(spark, src, version = 1) === Some(60L))
  }
}
