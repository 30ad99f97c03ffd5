package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** Manifest size tracking + incremental bin-packing OPTIMIZE
  * (sources/ManifestTable.scala compactSmall): per-file byte sizes are
  * recorded in the manifest at write time (the Delta log idiom — a
  * 100 TB OPTIMIZE plans from metadata, it never stats 100k files),
  * and compactSmall rewrites ONLY the files under the threshold,
  * one conditional commit per bin, skipping bins an interleaved
  * writer invalidated instead of aborting the pass. */
class SmallFileCompactionSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_smallfiles").toString

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  private def bigDf(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (100_000L + i, s"payload-$i")).toDF("id", "v")
      .repartition(1)
  }

  test("per-file byte sizes are recorded at commit and match the files on disk") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    ManifestTable.commit(spark, t, df(3L -> "c"))
    val sizes = ManifestTable.snapshotSizes(spark, t)
    val files = ManifestTable.snapshotFiles(spark, t)
    assert(sizes.keySet === files.toSet, "every snapshot file needs a recorded size")
    sizes.foreach { case (rel, len) =>
      val actual = new java.io.File(t, rel).length()
      assert(len === actual, s"$rel: recorded $len, on disk $actual")
    }
  }

  test("sizes survive a rewriting upsert: every head file keeps a size entry") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    ManifestTable.commit(spark, t, df(3L -> "c"))
    ManifestTable.upsert(spark, t, df(1L -> "A"), Seq("id"))
    val sizes = ManifestTable.snapshotSizes(spark, t)
    assert(sizes.keySet === ManifestTable.snapshotFiles(spark, t).toSet)
  }

  test("the reserved size column name is refused as a data column") {
    val t = freshTable()
    val bad = df(1L -> "a").withColumn("__graft_bytes", lit(1L))
    val e = intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t, bad)
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("compactSmall repacks only sub-threshold files; large files carry by reference") {
    val t = freshTable()
    ManifestTable.commit(spark, t, bigDf(5000)) // one well-sized file
    (1 to 4).foreach(i => ManifestTable.commit(spark, t, df(i.toLong -> s"s$i")))
    val before = ManifestTable.snapshotFiles(spark, t)
    val sizes = ManifestTable.snapshotSizes(spark, t)
    val big = sizes.maxBy(_._2)._1
    val smallBytes = sizes.filter(_._1 != big).values.sum
    assert(sizes(big) > 5000 && sizes.filterNot(_._1 == big).forall(_._2 < 5000),
      s"fixture broken: sizes $sizes")
    val bins = ManifestTable.compactSmall(spark, t,
      minFileBytes = 5000, maxBinBytes = 1L << 20)
    assert(bins === 1, "four small files pack into one bin")
    val after = ManifestTable.snapshotFiles(spark, t)
    assert(after.contains(big), "the large file must carry by reference, not rewrite")
    assert(after.size === 2, s"expected big + one packed file, got $after")
    // rewritten bytes ≈ the small files only — O(small), not O(table)
    val newFile = (after.toSet -- before.toSet).head
    val newLen = ManifestTable.snapshotSizes(spark, t)(newFile)
    assert(newLen < sizes(big) + smallBytes,
      "the packed file must not contain the large file's rows")
    val got = ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got.size === 5004)
    assert(got(1L) === "s1" && got(100_001L) === "payload-1")
  }

  test("no-op cases: empty table, nothing small enough, a single small file") {
    val t = freshTable()
    assert(ManifestTable.compactSmall(spark, t) === 0, "empty table")
    ManifestTable.commit(spark, t, df(1L -> "a"))
    assert(ManifestTable.compactSmall(spark, t,
      minFileBytes = 5000) === 0, "a singleton bin gains nothing")
    ManifestTable.commit(spark, t, df(2L -> "b"))
    assert(ManifestTable.compactSmall(spark, t,
      minFileBytes = 1) === 0, "nothing under the threshold")
    assert(ManifestTable.read(spark, t).count() === 2)
  }

  test("partitioned tables: bins never mix partition values") {
    val t = freshTable()
    (1 to 3).foreach { i =>
      ManifestTable.commit(spark, t,
        df(i.toLong -> "x", (10 + i).toLong -> "y")
          .withColumn("p", when(col("id") < 10, "a").otherwise("b")),
        partitionBy = Seq("p"))
    }
    val bins = ManifestTable.compactSmall(spark, t,
      minFileBytes = 5000, maxBinBytes = 1L << 20)
    assert(bins === 2, "one bin per partition value, committed separately")
    val after = ManifestTable.snapshotFiles(spark, t)
    assert(after.size === 2, s"one packed file per partition, got $after")
    assert(after.forall(f => f.contains("p=a") || f.contains("p=b")))
    val got = ManifestTable.read(spark, t)
    assert(got.count() === 6)
    assert(got.filter(col("p") === "a").count() === 3)
  }

  test("an interleaved append reconciles; an interleaved rewrite of a bin file skips the bin") {
    // append case: the bin commit loses the slot but carries the
    // interloper's file by reference
    val t = freshTable()
    (1 to 3).foreach(i => ManifestTable.commit(spark, t, df(i.toLong -> s"s$i")))
    var fired = false
    var inside = false
    ManifestTable.beforeConditionalCommit = () => {
      if (!fired && !inside) {
        fired = true; inside = true
        try ManifestTable.commit(spark, t, df(50L -> "new"))
        finally inside = false
      }
    }
    try {
      val bins = ManifestTable.compactSmall(spark, t, minFileBytes = 5000)
      assert(bins === 1)
    } finally ManifestTable.beforeConditionalCommit = () => ()
    val got = ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(1L -> "s1", 2L -> "s2", 3L -> "s3", 50L -> "new"))

    // rewrite case: an interloper upsert rewrites a bin member — the
    // bin is stale and must be SKIPPED, its data discarded, the pass
    // reporting 0 bins; the upsert's image wins
    val t2 = freshTable()
    (1 to 3).foreach(i => ManifestTable.commit(spark, t2, df(i.toLong -> s"s$i")))
    fired = false
    ManifestTable.beforeConditionalCommit = () => {
      if (!fired && !inside) {
        fired = true; inside = true
        try ManifestTable.upsert(spark, t2, df(2L -> "UP"), Seq("id"))
        finally inside = false
      }
    }
    try {
      val bins = ManifestTable.compactSmall(spark, t2, minFileBytes = 5000)
      assert(bins === 0, "a bin whose member was rewritten must be skipped")
    } finally ManifestTable.beforeConditionalCommit = () => ()
    val got2 = ManifestTable.read(spark, t2).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got2 === Map(1L -> "s1", 2L -> "UP", 3L -> "s3"))
    // and the skipped bin left no orphan data dir behind
    val referenced = (1 to ManifestTable.currentVersion(spark, t2))
      .flatMap(v => ManifestTable.snapshotFiles(spark, t2, v))
      .map(_.split("/")(1)).toSet
    val onDisk = new java.io.File(t2, "data").listFiles().map(_.getName).toSet
    assert(onDisk === referenced)
  }
}
