package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.{ManifestTable, Tables}

/** Partition columns in the manifest table (r9): `commit(partitionBy)`
  * writes the Hive `<col>=<value>/` layout, the manifest records the
  * partition spec AND every file's partition values as degenerate
  * [v, v] stats ranges — so partition pruning is stats pruning, one
  * mechanism, and it COMPOSES with data-column range skipping. These
  * tests pin the layout, the read path (partition columns materialize
  * from the path, typed by the recorded schema), pruning and its
  * stacking, layout enforcement on append, and that the derived
  * commits (deleteWhere / upsert / compact) preserve the layout. */
class PartitionedTableSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_part").toString

  private val sf = "/root/testdata/sf0.001"

  test("partitioned commit: hive layout on disk, partition column materializes on read") {
    val t = freshTable()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    ManifestTable.commit(spark, t, docs, SaveMode.Overwrite,
      partitionBy = Seq("lang"))
    assert(ManifestTable.partitionColumns(spark, t) === Seq("lang"))
    // files live under data/<uuid>/lang=<v>/
    val files = ManifestTable.snapshotFiles(spark, t)
    assert(files.nonEmpty && files.forall(_.matches("data/[^/]+/lang=[^/]+/.+\\.parquet")),
      s"unexpected layout: ${files.take(3)}")
    // the partition column reads back with values and the right type
    val got = ManifestTable.read(spark, t)
    assert(got.schema("lang").dataType === org.apache.spark.sql.types.StringType)
    val want = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val have = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(have === want)
  }

  test("partition equality prunes to the owning files and stacks with data-column ranges") {
    val t = freshTable()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      // several files per partition value, doc_id-clustered inside
      .repartitionByRange(3, col("doc_id"))
    ManifestTable.commit(spark, t, docs, SaveMode.Overwrite,
      partitionBy = Seq("lang"), statsColumns = Seq("doc_id"))
    val total = ManifestTable.snapshotFiles(spark, t).size
    // partition equality alone
    val en = ManifestTable.readWhere(spark, t, col("lang") === "en")
    assert(en.inputFiles.length < total,
      s"partition equality kept ${en.inputFiles.length}/$total")
    assert(en.inputFiles.forall(_.contains("lang=en")))
    assert(en.count() ===
      Tables.documents(spark, sf).filter(col("lang") === "en").count())
    // stacked: partition equality ∧ doc_id range prunes FURTHER
    val boxed = ManifestTable.readWhere(spark, t,
      col("lang") === "en" && col("doc_id") < 100)
    assert(boxed.inputFiles.length < en.inputFiles.length,
      s"range did not stack: ${boxed.inputFiles.length} vs ${en.inputFiles.length}")
    assert(boxed.count() === Tables.documents(spark, sf)
      .filter(col("lang") === "en" && col("doc_id") < 100).count())
    // partition IN-list / OR prunes through the same machinery
    val two = ManifestTable.readWhere(spark, t,
      col("lang") === "en" || col("lang") === "fr")
    assert(two.inputFiles.length < total)
    assert(two.count() === Tables.documents(spark, sf)
      .filter(col("lang").isin("en", "fr")).count())
  }

  test("append inherits the layout; a divergent partitionBy is refused; overwrite replaces it") {
    val t = freshTable()
    import spark.implicits._
    val a = Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("id", "p", "v")
    ManifestTable.commit(spark, t, a, SaveMode.Overwrite, partitionBy = Seq("p"))
    // plain append (no partitionBy) inherits and keeps the layout
    ManifestTable.commit(spark, t, Seq((3L, "x", 3.0)).toDF("id", "p", "v"))
    assert(ManifestTable.snapshotFiles(spark, t).forall(_.contains("/p=")))
    assert(ManifestTable.partitionColumns(spark, t) === Seq("p"))
    assert(ManifestTable.read(spark, t).count() === 3)
    // divergent layout on append: refused loudly
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t, Seq((4L, "z", 4.0)).toDF("id", "p", "v"),
        partitionBy = Seq("v"))
    }
    // overwrite replaces the layout (back to flat)
    ManifestTable.commit(spark, t, a, SaveMode.Overwrite)
    assert(ManifestTable.partitionColumns(spark, t) === Nil)
    assert(ManifestTable.read(spark, t).count() === 2)
  }

  test("deleteWhere and upsert preserve the partition layout and stay exact") {
    val t = freshTable()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    ManifestTable.commit(spark, t, docs, SaveMode.Overwrite,
      partitionBy = Seq("lang"))
    // delete one language; only lang=de files should be touched
    val before = ManifestTable.snapshotFiles(spark, t).toSet
    ManifestTable.deleteWhere(spark, t, col("lang") === "de")
    val after = ManifestTable.snapshotFiles(spark, t)
    assert(before.filterNot(_.contains("lang=de")).forall(after.contains),
      "non-matching partitions must carry by reference")
    assert(after.forall(_.contains("lang=")), "layout lost in rewrite")
    assert(ManifestTable.read(spark, t).filter(col("lang") === "de").count() === 0)
    // upsert keyed rows; layout survives, values land
    ManifestTable.upsert(spark, t,
      docs.filter(col("lang") === "en" && col("doc_id") < 50)
        .withColumn("n_chars", col("n_chars") + 7),
      Seq("doc_id"))
    assert(ManifestTable.snapshotFiles(spark, t).forall(_.contains("lang=")))
    val got = ManifestTable.read(spark, t)
      .filter(col("lang") === "en" && col("doc_id") < 50)
      .agg(sum(col("n_chars"))).collect().head.getLong(0)
    val want = docs.filter(col("lang") === "en" && col("doc_id") < 50)
      .agg(sum(col("n_chars") + 7)).collect().head.getLong(0)
    assert(got === want)
  }

  test("compact on a partitioned table keeps the layout and collapses per-partition small files") {
    val t = freshTable()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .repartition(6) // 6 tasks × |langs| partition files: the explosion
    ManifestTable.commit(spark, t, docs, SaveMode.Overwrite,
      partitionBy = Seq("lang"))
    val before = ManifestTable.snapshotFiles(spark, t).size
    val langs = Tables.documents(spark, sf).select("lang").distinct().count()
    assert(before > langs, s"fixture should start with small files: $before")
    ManifestTable.compact(spark, t, targetFiles = 4)
    val after = ManifestTable.snapshotFiles(spark, t)
    assert(after.size.toLong === langs,
      s"partitioned compact should land one file per value: ${after.size}")
    assert(after.forall(_.contains("lang=")))
    assert(ManifestTable.read(spark, t).count() === docs.count())
  }

  test("numeric and date partition values prune typed predicates; special chars round-trip") {
    val t = freshTable()
    import spark.implicits._
    // numeric partition column: path value "7" must prune col === 7
    val n = (0 until 40).map(i => (i.toLong, i % 4, s"r$i")).toDF("id", "bucket", "s")
    ManifestTable.commit(spark, t, n, SaveMode.Overwrite, partitionBy = Seq("bucket"))
    val one = ManifestTable.readWhere(spark, t, col("bucket") === 2)
    assert(one.inputFiles.forall(_.contains("bucket=2")))
    assert(one.count() === 10)
    // date partition column: epoch-day encoding matches DateType literals
    val t2 = freshTable()
    val d = Seq(("2024-01-01", 1L), ("2024-01-01", 2L), ("2024-02-01", 3L))
      .toDF("ds", "id").select(col("ds").cast("date").as("day"), col("id"))
    ManifestTable.commit(spark, t2, d, SaveMode.Overwrite, partitionBy = Seq("day"))
    val jan = ManifestTable.readWhere(spark, t2,
      col("day") === java.sql.Date.valueOf("2024-01-01"))
    assert(jan.inputFiles.forall(_.contains("day=2024-01-01")))
    assert(jan.count() === 2)
    // a partition value needing path-escaping round-trips (no pruning
    // claims needed — correctness of read-back is the bar)
    val t3 = freshTable()
    val esc = Seq(("a/b:c", 1L), ("plain", 2L)).toDF("p", "id")
    ManifestTable.commit(spark, t3, esc, SaveMode.Overwrite, partitionBy = Seq("p"))
    val got = ManifestTable.read(spark, t3).select("p", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("a/b:c", 1L), ("plain", 2L)))
    val weird = ManifestTable.readWhere(spark, t3, col("p") === "a/b:c")
    assert(weird.count() === 1)
  }
}
