package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.ManifestTable

/** Scratch probes for round-11 design decisions — deleted before commit. */
class ProbeR11Spec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_probe_r11_$tag"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(d))
    d
  }

  test("probe 1: Spark 4 parquet read widens int32 files under a long/double schema") {
    import spark.implicits._
    val d = tmp("widen")
    Seq((1, 1.5f), (2, 2.5f)).toDF("k", "x").write.parquet(d)
    val widened = StructType(Seq(
      StructField("k", LongType), StructField("x", DoubleType)))
    val rows = spark.read.schema(widened).parquet(d)
      .orderBy("k").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5))
    // also byte/short → int, int → double
    Seq((1.toShort, 7)).toDF("s", "i").write.mode("overwrite").parquet(d)
    val w2 = StructType(Seq(StructField("s", IntegerType), StructField("i", DoubleType)))
    val r2 = spark.read.schema(w2).parquet(d).collect().head
    assert(r2.getInt(0) == 1 && r2.getDouble(1) == 7.0)
  }

  test("probe 2: copyInto already bloom-indexes ingested files") {
    import spark.implicits._
    val t = tmp("cibloom_t"); val landing = tmp("cibloom_l")
    val df = (0 until 64).map(i => (i.toLong, s"u$i")).toDF("id", "name")
    ManifestTable.commit(spark, t, df.limit(0), SaveMode.Overwrite,
      statsColumns = Seq("id"))
    ManifestTable.addBloom(spark, t, Seq("name"), bits = 1L << 12, k = 4)
    df.repartition(8, col("id")).write.parquet(s"$landing/b1")
    ManifestTable.copyInto(spark, t, s"$landing/*")
    val total = ManifestTable.snapshotFiles(spark, t).size
    val hit = ManifestTable.readWhere(spark, t, col("name") === "u3")
    info(s"files kept ${hit.inputFiles.length} of $total")
    assert(hit.collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(hit.inputFiles.length < total,
      "bloom pruning should fire on copyInto'd files with no OPTIMIZE")
  }

  test("probe 3: addBloom on a segmented table carries segments by reference") {
    import spark.implicits._
    val t = tmp("segbloom")
    spark.sparkContext.hadoopConfiguration.setInt(
      ManifestTable.SegmentFilesKey, 10)
    try {
      val df = (0 until 200).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
      ManifestTable.commit(spark, t, df.repartition(40), SaveMode.Overwrite,
        statsColumns = Seq("id"))
      val segsBefore = ManifestTable.snapshotSegments(spark, t)
      assert(segsBefore.nonEmpty, "table should be segmented")
      ManifestTable.addBloom(spark, t, Seq("id"))
      val segsAfter = ManifestTable.snapshotSegments(spark, t)
      info(s"before=${segsBefore.size} after=${segsAfter.size} " +
        s"carried=${segsAfter.count(segsBefore.contains)}")
      assert(segsAfter.toSet == segsBefore.toSet,
        "a config-only commit should carry every segment by reference")
    } finally spark.sparkContext.hadoopConfiguration.unset(
      ManifestTable.SegmentFilesKey)
  }

  test("probe 4: compact on a transform-partitioned table (hidden target not in read)") {
    import spark.implicits._
    val t = tmp("compacthidden")
    val df = (0 until 100).map(i => (i.toLong, i % 7, s"r$i")).toDF("id", "g", "s")
    ManifestTable.commit(spark, t, df.repartition(10), SaveMode.Overwrite,
      partitionBy = Seq("bucket(4,id)"), statsColumns = Seq("id", "g"))
    // does plain compact survive the hidden layout column?
    ManifestTable.compact(spark, t, targetFiles = 2)
    assert(ManifestTable.read(spark, t).count() == 100)
    assert(ManifestTable.partitionTransforms(spark, t).nonEmpty)
  }
}
