package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.{col, udf}
import graft.sources.{GraftCatalog, ManifestTable}

object AdviceR14Spec {
  // per-call counter for the non-deterministic-batch drill: each
  // evaluation of the UDF plan yields FRESH values, so the batch's
  // contents differ between replaceWhere's validation pass and its
  // write pass — exactly the hazard ADVICE r14 names
  val calls = new java.util.concurrent.atomic.AtomicLong
}

/** Pins the ADVICE r14 findings.
  *
  *  - medium: SHOW PARTITIONS row counts follow rowCount's honesty
  *    rule — DV-hidden rows subtracted, null under a pending
  *    lazy-delete tombstone (never an overstated number);
  *  - lows: TRUNCATE is a metadata-only empty-snapshot publish (no
  *    data read or written), replaceWhere's written image re-filters
  *    on the region predicate so a non-deterministic source cannot
  *    leak out-of-region rows, DESCRIBE DETAIL's size total is
  *    all-or-null like ShowPartitions, and the parser splits
  *    REPLACE WHERE / OPTIMIZE WHERE clause boundaries quote-aware
  *    (a string literal carrying SELECT / ZORDER BY never mis-splits
  *    — covered with the backtick grammar in Round15Spec). */
class AdviceR14Spec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_advr14_$tag").toString + "/t"

  // ---- medium: SHOW PARTITIONS vs deletion vectors / tombstones ----

  test("SHOW PARTITIONS subtracts DV-hidden rows and nulls under a pending tombstone") {
    import spark.implicits._
    val t = tmp("sp")
    // ids 0..49 land in p=a, 50..99 in p=b; id stats give the delete
    // paths their file pruning, so each delete targets ONE partition
    ManifestTable.commit(spark, t,
      (0 until 100).map(i => (i.toLong, if (i < 50) "a" else "b"))
        .toDF("id", "p"),
      SaveMode.Overwrite, partitionBy = Seq("p"),
      statsColumns = Seq("id"))
    GraftCatalog.register("advr14_sp", t)
    try {
      def census(): Map[String, Option[Long]] =
        spark.sql("SHOW PARTITIONS graft.advr14_sp").collect()
          .map(r => r.getString(0) ->
            (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      assert(census() === Map("p=a" -> Some(50L), "p=b" -> Some(50L)))
      // a vector delete hides 10 rows of p=a: per-file ordinal counts
      // are exact metadata, so the census SUBTRACTS them
      ManifestTable.deleteWhereVector(spark, t, col("id") < 10)
      assert(census() === Map("p=a" -> Some(40L), "p=b" -> Some(50L)),
        "DV-hidden rows must be subtracted from the partition census")
      // a pending lazy-delete tombstone targets p=b's files (id-stat
      // pruned): its hidden-row count is unknown until materialized,
      // so the targeted partition reports null — never a wrong number
      ManifestTable.deleteWhereLazy(spark, t, col("id") >= 90)
      val c = census()
      assert(c("p=a") === Some(40L),
        "an untargeted partition keeps its exact count")
      assert(c("p=b") === None,
        "a partition holding tombstone-targeted files must report null")
      // consistency with the table-level honesty rule
      assert(ManifestTable.rowCount(spark, t).isEmpty)
    } finally GraftCatalog.unregister("advr14_sp")
  }

  // ---- low: TRUNCATE is metadata-only ------------------------------

  test("TRUNCATE TABLE publishes an empty snapshot without touching data; history intact") {
    import spark.implicits._
    val t = tmp("tr")
    ManifestTable.commit(spark, t,
      (0 until 500).map(i => (i.toLong, if (i % 2 == 0) "x" else "y"))
        .toDF("id", "p"),
      SaveMode.Overwrite, partitionBy = Seq("p"))
    ManifestTable.addConstraint(spark, t, "pos", "id >= 0")
    GraftCatalog.register("advr14_tr", t)
    def dataFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(t, "data")).map(_.getPath).toSet
    }
    try {
      val before = dataFiles()
      spark.sql("TRUNCATE TABLE graft.advr14_tr")
      assert(ManifestTable.currentVersion(spark, t) === 3)
      assert(ManifestTable.commitOp(spark, t).contains("truncate"))
      assert(ManifestTable.read(spark, t).count() === 0)
      assert(ManifestTable.rowCount(spark, t) === Some(0L),
        "the truncated head must be metadata-countable")
      assert(dataFiles() === before,
        "truncate must neither write nor delete any data file")
      // layout and constraints carried: the next append inherits both
      assert(ManifestTable.partitionColumns(spark, t) === Seq("p"))
      intercept[Exception] {
        ManifestTable.commit(spark, t, Seq((-1L, "x")).toDF("id", "p"))
      }
      // time travel and restore still see the pre-truncate image
      assert(ManifestTable.read(spark, t, 2).count() === 500)
      // an already-empty table truncates as a no-op (no new version)
      spark.sql("TRUNCATE TABLE graft.advr14_tr")
      assert(ManifestTable.currentVersion(spark, t) === 3,
        "truncating an empty table must not commit")
    } finally GraftCatalog.unregister("advr14_tr")
  }

  // ---- low: replaceWhere's write-time region guard ------------------

  test("replaceWhere cannot leak out-of-region rows from a non-deterministic batch") {
    import spark.implicits._
    val t = tmp("nd")
    ManifestTable.commit(spark, t,
      Seq((1L, 2L), (2L, 50L)).toDF("id", "v"), SaveMode.Overwrite)
    // 4 rows whose v is a FRESH counter value per evaluation: the
    // validation pass sees 0..3 (all inside region v < 4 — it passes),
    // the write pass sees 4..7 (all OUTSIDE the region)
    AdviceR14Spec.calls.set(0)
    val next = udf(() => AdviceR14Spec.calls.getAndIncrement())
    val batch = spark.range(4)
      .select((col("id") + 1000L).as("id"), next().as("v"))
    ManifestTable.replaceWhere(spark, t, col("v") < 4L, batch)
    val rows = ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!rows.exists { case (id, v) => id >= 1000L && v >= 4L },
      s"out-of-region rows from the re-evaluated batch leaked: $rows")
    assert(rows.contains((2L, 50L)),
      "rows outside the region must be untouched")
    assert(!rows.exists(_._1 == 1L),
      "in-region pre-image rows must be replaced away")
  }

  // ---- low: DESCRIBE DETAIL size honesty ----------------------------

  test("DESCRIBE DETAIL size_in_bytes is null when any file lacks a recorded size") {
    import spark.implicits._
    val t = tmp("dd")
    ManifestTable.commit(spark, t,
      (0 until 10).map(i => (i.toLong, i.toString)).toDF("id", "s"),
      SaveMode.Overwrite)
    GraftCatalog.register("advr14_dd", t)
    try {
      val full = spark.sql("DESCRIBE DETAIL graft.advr14_dd").collect().head
      assert(!full.isNullAt(5) && full.getLong(5) > 0L)
      // forge a LEGACY file: strip one file's size stat from the
      // manifest (the shape an old engine version would have written)
      val mp = java.nio.file.Paths.get(t, "_manifests", "v00000001.json")
      val text = new String(java.nio.file.Files.readAllBytes(mp), "UTF-8")
      val edited = text.replaceFirst(
        "\"__graft_bytes\"\\s*:\\s*\\[[^\\]]*\\]\\s*,?", "")
      assert(edited != text, "the fixture must actually strip a size stat")
      java.nio.file.Files.write(mp, edited.getBytes("UTF-8"))
      val row = spark.sql("DESCRIBE DETAIL graft.advr14_dd").collect().head
      assert(row.isNullAt(5),
        "a legacy no-size file must null the total, not undercount it")
    } finally GraftCatalog.unregister("advr14_dd")
  }
}
