package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.operators.LakehouseQueries.zkey16
import graft.sources.{ManifestTable, Tables}

/** Manifest-level data skipping (sources/ManifestTable.scala readRange/
  * pruneFiles): the pruning ZOrderSkipSpec computes by hand from
  * per-file parquet stats, moved behind the table format's own read
  * path — recorded at write time in the manifest, applied BEFORE Spark
  * lists or opens any file. These tests pin (1) that strictly fewer
  * files than the snapshot holds reach the reader, (2) that pruning
  * never loses a qualifying row, (3) that stats survive the derived
  * commits (upsert / deleteWhere / compact), and (4) the judged
  * c29 lifecycle's skip payoff on the z-ordered layout. */
class StatsSkipSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_skip").toString

  test("readRange prunes on manifest stats: fewer files listed, same qualifying rows") {
    val t = freshTable()
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"))
    ManifestTable.commit(spark, t,
      ord.repartitionByRange(8, col("o_orderkey")), SaveMode.Overwrite,
      statsColumns = Seq("o_orderkey"))
    val ranges = Seq(("o_orderkey", 100.0, 800.0))
    val (kept, total) = ManifestTable.pruneFiles(spark, t, ranges)
    assert(total === 8)
    assert(kept.nonEmpty && kept.size < total,
      s"expected pruning on a range-clustered layout: kept ${kept.size}/$total")
    val prunedDf = ManifestTable.readRange(spark, t, ranges)
    // the SCAN itself receives only the kept files — the pruning is
    // I/O-level, not a post-scan filter
    assert(prunedDf.inputFiles.length === kept.size)
    val pruned = prunedDf.filter(col("o_orderkey").between(100, 800)).count()
    val full = ManifestTable.read(spark, t)
      .filter(col("o_orderkey").between(100, 800)).count()
    assert(pruned === full && full > 0)
  }

  test("IS NULL keeps only nullCount>0 files; IS NOT NULL drops all-null files; no stat keeps all") {
    val t = freshTable()
    import spark.implicits._
    val allNull = Seq(1L, 2L).toDF("id")
      .withColumn("v", lit(null).cast("string"))
    val mixed = Seq((3L, "x"), (4L, null.asInstanceOf[String])).toDF("id", "v")
    val noNull = Seq((5L, "y"), (6L, "z")).toDF("id", "v")
    ManifestTable.commit(spark, t, allNull.coalesce(1), SaveMode.Overwrite,
      statsColumns = Seq("id", "v"))
    ManifestTable.commit(spark, t, mixed.coalesce(1))
    ManifestTable.commit(spark, t, noNull.coalesce(1))
    assert(ManifestTable.snapshotFiles(spark, t).size === 3)
    val isNull = ManifestTable.readWhere(spark, t, col("v").isNull)
    assert(isNull.inputFiles.length === 2,
      "IS NULL must receive only the all-null and mixed files")
    assert(isNull.collect().map(_.getLong(0)).toSet === Set(1L, 2L, 4L))
    val notNull = ManifestTable.readWhere(spark, t, col("v").isNotNull)
    assert(notNull.inputFiles.length === 2,
      "IS NOT NULL must receive only the mixed and no-null files")
    assert(notNull.collect().map(_.getLong(0)).toSet === Set(3L, 5L, 6L))
    // a table without null stats keeps every file (conservative)
    val t2 = freshTable()
    ManifestTable.commit(spark, t2, noNull.coalesce(1), SaveMode.Overwrite)
    val unstats = ManifestTable.readWhere(spark, t2, col("v").isNull)
    assert(unstats.inputFiles.length === 1, "stat-less files are never null-pruned")
    assert(unstats.count() === 0)
  }

  test("null-count stats survive rewrites and compose with range constraints") {
    val t = freshTable()
    import spark.implicits._
    val df = (1L to 40L).map(i =>
        (i, if (i % 4 == 0) null.asInstanceOf[String] else s"s$i"))
      .toDF("id", "v")
    ManifestTable.commit(spark, t,
      df.repartitionByRange(4, col("id")), SaveMode.Overwrite,
      statsColumns = Seq("id", "v"))
    // AND of a range and a nullness constraint: both prune; result exact
    val got = ManifestTable.readWhere(spark, t,
      col("id") <= 10L && col("v").isNull)
    assert(got.inputFiles.length < 4, "the range side must still prune")
    assert(got.collect().map(_.getLong(0)).toSet === Set(4L, 8L))
    // a compaction rewrite keeps collecting null stats for its output
    ManifestTable.compact(spark, t, targetFiles = 2)
    val after = ManifestTable.readWhere(spark, t, col("v").isNull)
    assert(after.collect().map(_.getLong(0)).toSet
      === (4L to 40L by 4).toSet)
    val stats = ManifestTable.snapshotStats(spark, t)
    assert(stats.values.exists(_.contains(ManifestTable.NullsKeyPrefix + "v")),
      "rewritten files must carry fresh null counts")
  }

  test("a column without recorded stats is never pruned (conservative keep)") {
    val t = freshTable()
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"))
    ManifestTable.commit(spark, t,
      ord.repartitionByRange(4, col("o_orderkey")), SaveMode.Overwrite,
      statsColumns = Seq("o_orderkey"))
    val (kept, total) = ManifestTable.pruneFiles(spark, t,
      Seq(("o_totalprice", 0.0, 1.0))) // no stats for this column
    assert(kept.size === total, "stats-less column must keep every file")
  }

  test("an empty intersection keeps zero files and reads an empty frame with the table schema") {
    val t = freshTable()
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"))
    ManifestTable.commit(spark, t,
      ord.repartitionByRange(4, col("o_orderkey")), SaveMode.Overwrite,
      statsColumns = Seq("o_orderkey"))
    val ranges = Seq(("o_orderkey", -100.0, -1.0))
    val (kept, _) = ManifestTable.pruneFiles(spark, t, ranges)
    assert(kept.isEmpty)
    val df = ManifestTable.readRange(spark, t, ranges)
    assert(df.count() === 0)
    assert(df.columns.toSeq === Seq("o_orderkey", "o_totalprice"))
  }

  test("stats survive the table lifecycle: upsert and deleteWhere keep collecting the same columns") {
    val t = freshTable()
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    ManifestTable.commit(spark, t,
      ord.repartitionByRange(4, col("o_orderkey")), SaveMode.Overwrite,
      statsColumns = Seq("o_orderkey"))
    ManifestTable.upsert(spark, t,
      ord.filter(col("o_orderkey") <= 100)
        .withColumn("o_totalprice", col("o_totalprice") + 1),
      Seq("o_orderkey"))
    val afterUpsert = ManifestTable.snapshotStats(spark, t)
    assert(afterUpsert.nonEmpty &&
      afterUpsert.values.forall(_.contains("o_orderkey")),
      "upsert must re-collect the head's stats columns for its rewrite")
    ManifestTable.deleteWhere(spark, t, col("o_orderkey") > 5000)
    val afterDelete = ManifestTable.snapshotStats(spark, t)
    assert(afterDelete.nonEmpty &&
      afterDelete.values.forall(_.contains("o_orderkey")))
    // and the pruned read still equals the full filtered read
    val ranges = Seq(("o_orderkey", 50.0, 200.0))
    val pruned = ManifestTable.readRange(spark, t, ranges)
      .filter(col("o_orderkey").between(50, 200)).count()
    val full = ManifestTable.read(spark, t)
      .filter(col("o_orderkey").between(50, 200)).count()
    assert(pruned === full && full > 0)
  }

  test("readWhere derives the skip from the predicate itself; unrecognized shapes prune nothing") {
    val t = freshTable()
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"))
    ManifestTable.commit(spark, t,
      ord.repartitionByRange(8, col("o_orderkey")), SaveMode.Overwrite,
      statsColumns = Seq("o_orderkey"))
    val pred = col("o_orderkey") >= 100 && col("o_orderkey") <= 800 &&
      col("o_totalprice") > 0 // no stats for this one — no constraint
    val df = ManifestTable.readWhere(spark, t, pred)
    assert(df.inputFiles.length < 8, "predicate-derived pruning did not engage")
    val want = ManifestTable.read(spark, t).filter(pred).count()
    assert(df.count() === want && want > 0)
    // a DOUBLE literal against the bigint column makes the analyzer
    // cast the ATTRIBUTE side — extraction must see through the
    // lossless numeric up-cast or the skip silently dies
    val predCast = col("o_orderkey") >= 100.0 && col("o_orderkey") <= 800.0
    val dfCast = ManifestTable.readWhere(spark, t, predCast)
    assert(dfCast.inputFiles.length < 8,
      "attr-side up-cast defeated predicate extraction")
    assert(dfCast.count() ===
      ManifestTable.read(spark, t).filter(predCast).count())
    // extraction unit checks on resolved catalyst nodes (what the
    // optimized Filter condition holds): conjunct folding, flipped
    // literal side, equality, and the conservative no-ops
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val (x, y, s) = (UnresolvedAttribute("x"), UnresolvedAttribute("y"),
      UnresolvedAttribute("s"))
    assert(ManifestTable.extractRanges(
      And(And(GreaterThan(x, Literal(5)), LessThan(Literal(3), x)),
        LessThanOrEqual(x, Literal(10))))
      === Seq(("x", 5.0, 10.0)))
    assert(ManifestTable.extractRanges(EqualTo(x, Literal(7)))
      === Seq(("x", 7.0, 7.0)))
    assert(ManifestTable.extractRanges(
      Or(GreaterThan(x, Literal(5)), LessThan(y, Literal(2)))).isEmpty,
      "OR must not constrain")
    assert(ManifestTable.extractRanges(GreaterThan(x, y)).isEmpty)
    // string literals constrain in enc-space (r8 string stats)
    assert(ManifestTable.extractRanges(EqualTo(s, Literal.create("a")))
      === Seq(("s", ManifestTable.stringBound("a"), ManifestTable.stringBound("a"))))
    // IN-list bounds by its min/max; an opaque element voids the bound
    assert(ManifestTable.extractRanges(
      In(x, Seq(Literal(7), Literal(3), Literal(9))))
      === Seq(("x", 3.0, 9.0)))
    assert(ManifestTable.extractRanges(In(x, Seq(Literal(7), y))).isEmpty)
    // null-safe equality: non-null literal constrains, null does not
    assert(ManifestTable.extractRanges(EqualNullSafe(x, Literal(5)))
      === Seq(("x", 5.0, 5.0)))
    assert(ManifestTable.extractRanges(
      EqualNullSafe(x, Literal.create(null, org.apache.spark.sql.types.IntegerType))).isEmpty)
  }

  test("OR branches prune through the DNF extractor (r9): disjunct union, not abandonment") {
    val t = freshTable()
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"))
    ManifestTable.commit(spark, t,
      ord.repartitionByRange(8, col("o_orderkey")), SaveMode.Overwrite,
      statsColumns = Seq("o_orderkey"))
    // same-column equality disjunction: only the files owning either
    // value survive — the shape `status = 'A' OR status = 'B'` takes
    val p1 = col("o_orderkey") === 10 || col("o_orderkey") === 5900
    val df1 = ManifestTable.readWhere(spark, t, p1)
    assert(df1.inputFiles.length < 8,
      s"OR of two point lookups kept ${df1.inputFiles.length}/8 files")
    assert(df1.count() === ManifestTable.read(spark, t).filter(p1).count())
    // same-column open ranges: a < lo OR a > hi keeps only the edges
    val p2 = col("o_orderkey") < 300 || col("o_orderkey") > 5500
    val df2 = ManifestTable.readWhere(spark, t, p2)
    assert(df2.inputFiles.length < 8)
    assert(df2.count() === ManifestTable.read(spark, t).filter(p2).count())
    // mixed-column OR: o_totalprice carries no stats, so ITS branch is
    // unconstrained and the union must keep every file — sound, never
    // wrong
    val p3 = col("o_orderkey") === 10 || col("o_totalprice") > 0
    val df3 = ManifestTable.readWhere(spark, t, p3)
    assert(df3.inputFiles.length === 8,
      "an unconstrained OR branch must disable pruning")
    assert(df3.count() === ManifestTable.read(spark, t).filter(p3).count())
    // unit checks on the catalyst shapes
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val (x, y) = (UnresolvedAttribute("x"), UnresolvedAttribute("y"))
    // hull of `x=1 OR x=5` is x ∈ [1, 5]
    assert(ManifestTable.extractRanges(
      Or(EqualTo(x, Literal(1)), EqualTo(x, Literal(5))))
      === Seq(("x", 1.0, 5.0)))
    // DNF keeps the disjuncts distinct (a file with x-range [2,4]
    // intersects the hull but NO disjunct)
    assert(ManifestTable.extractDnf(
      Or(EqualTo(x, Literal(1)), EqualTo(x, Literal(5))))
      === Seq(Map("x" -> (1.0, 1.0)), Map("x" -> (5.0, 5.0))))
    // AND distributes over OR (cross-product): (x=1 OR x=5) AND y>2
    assert(ManifestTable.extractDnf(
      And(Or(EqualTo(x, Literal(1)), EqualTo(x, Literal(5))),
        GreaterThan(y, Literal(2))))
      === Seq(Map("x" -> (1.0, 1.0), "y" -> (2.0, Double.PositiveInfinity)),
        Map("x" -> (5.0, 5.0), "y" -> (2.0, Double.PositiveInfinity))))
    // an unrecognizable branch is universal and absorbs the whole OR
    assert(ManifestTable.extractDnf(
      Or(EqualTo(x, Literal(1)), GreaterThan(x, y)))
      === Seq(Map.empty[String, (Double, Double)]))
    // a too-wide OR fan collapses to the universal DNF, not an error
    val wide = (1 to 40).map(i => EqualTo(x, Literal(i)): Expression)
      .reduce(Or(_, _))
    assert(ManifestTable.extractDnf(wide) === Seq(Map.empty[String, (Double, Double)]))
  }

  test("string columns stats-track via the order-preserving prefix encoding; string predicates prune") {
    val t = freshTable()
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    ManifestTable.commit(spark, t,
      ord.repartitionByRange(6, col("o_orderstatus"), col("o_orderkey")),
      SaveMode.Overwrite, statsColumns = Seq("o_orderstatus"))
    // equality on a status value: only the files whose enc-range owns it
    val df = ManifestTable.readWhere(spark, t, col("o_orderstatus") === "F")
    val (kept, total) = ManifestTable.pruneFiles(spark, t,
      Seq(("o_orderstatus",
        ManifestTable.stringBound("F"), ManifestTable.stringBound("F"))))
    assert(total === 6 && kept.size < total,
      s"status-clustered layout must prune a status equality: ${kept.size}/$total")
    assert(df.count() === ord.filter(col("o_orderstatus") === "F").count())
    // a string RANGE predicate prunes and stays exact too
    val r = ManifestTable.readWhere(spark, t,
      col("o_orderstatus") >= "O" && col("o_orderstatus") <= "P")
    assert(r.count() ===
      ord.filter(col("o_orderstatus") >= "O" && col("o_orderstatus") <= "P").count())
  }

  test("the write-side string encoding equals the JVM twin for every shape of string") {
    // the soundness of string pruning rests on BOTH sides encoding
    // identically — one-file-per-commit makes the recorded (mn,mx)
    // directly comparable to stringBound
    val t = freshTable()
    import spark.implicits._
    val samples = Seq("", "a", "ab", "abcdefgh", "zz", "élément", "F")
    samples.zipWithIndex.foreach { case (s, i) =>
      ManifestTable.commit(spark, t,
        Seq((i.toLong, s)).toDF("id", "s").coalesce(1),
        statsColumns = Seq("s"),
        mode = if (i == 0) SaveMode.Overwrite else SaveMode.Append)
    }
    val recorded = ManifestTable.snapshotStats(spark, t)
      .values.flatMap(_.get("s")).toSet
    assert(recorded === samples.map(s =>
      (ManifestTable.stringBound(s), ManifestTable.stringBound(s))).toSet)
    // and the encoding is monotone on a sorted sample
    val sorted = samples.sorted
    assert(sorted.map(ManifestTable.stringBound) === sorted.map(ManifestTable.stringBound).sorted)
  }

  test("append continuity: a stats-tracking table keeps collecting stats through plain appends") {
    val t = freshTable()
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"))
    ManifestTable.commit(spark, t,
      ord.filter(col("o_orderkey") <= 1000), SaveMode.Overwrite,
      statsColumns = Seq("o_orderkey"))
    // no statsColumns on the append — tracking must continue anyway
    ManifestTable.commit(spark, t, ord.filter(col("o_orderkey") > 1000))
    val stats = ManifestTable.snapshotStats(spark, t)
    val files = ManifestTable.snapshotFiles(spark, t)
    assert(files.nonEmpty &&
      files.forall(f => stats.get(f).exists(_.contains("o_orderkey"))),
      s"append decayed stats coverage: ${stats.size}/${files.size} files have stats")
  }

  test("deleteWhere auto-prunes its victim scan from the predicate itself (no scanRanges needed)") {
    val t = freshTable()
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"))
    ManifestTable.commit(spark, t,
      ord.repartitionByRange(8, col("o_orderkey")), SaveMode.Overwrite,
      statsColumns = Seq("o_orderkey"))
    val before = ManifestTable.snapshotFiles(spark, t)
    val (candidates, total) = ManifestTable.pruneFiles(spark, t,
      Seq(("o_orderkey", 100.0, 300.0)))
    assert(candidates.size < total)
    ManifestTable.deleteWhere(spark, t, col("o_orderkey").between(100, 300))
    val after = ManifestTable.snapshotFiles(spark, t).toSet
    // files the predicate's own range cannot touch carried by reference
    assert(before.filterNot(candidates.contains).forall(after.contains))
    assert(ManifestTable.read(spark, t).count() ===
      ord.filter(!col("o_orderkey").between(100, 300)).count())
  }

  test("deleteWhere scanRanges: the victim scan skips non-intersecting files; the delete is exact") {
    val t = freshTable()
    val ord = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"))
    ManifestTable.commit(spark, t,
      ord.repartitionByRange(8, col("o_orderkey")), SaveMode.Overwrite,
      statsColumns = Seq("o_orderkey"))
    val before = ManifestTable.snapshotFiles(spark, t)
    val (candidates, total) = ManifestTable.pruneFiles(spark, t,
      Seq(("o_orderkey", 100.0, 300.0)))
    assert(candidates.size < total)
    ManifestTable.deleteWhere(spark, t,
      col("o_orderkey").between(100, 300),
      scanRanges = Seq(("o_orderkey", 100.0, 300.0)))
    val after = ManifestTable.snapshotFiles(spark, t).toSet
    // non-candidate files carried by reference, untouched
    assert(before.filterNot(candidates.contains).forall(after.contains))
    // the delete itself is exact
    val got = ManifestTable.read(spark, t).count()
    val want = ord.filter(!col("o_orderkey").between(100, 300)).count()
    assert(got === want)
  }

  test("timestamp columns stats-track via the epoch-seconds cast: time-range scans prune files") {
    // the ingest-time pattern a 100 TB event table lives on: files
    // arrive roughly time-clustered, the manifest records ts ranges
    // (as epoch-second doubles — writeData's cast covers numerics AND
    // timestamps), and a time-boxed read prunes to the files owning
    // the window
    val t = freshTable()
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("value"))
    ManifestTable.commit(spark, t,
      ev.repartitionByRange(8, col("ts")), SaveMode.Overwrite,
      statsColumns = Seq("ts"))
    val Array(mn, mx) = ev
      .agg(min(col("ts").cast("double")), max(col("ts").cast("double")))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    val (lo, hi) = (mn + 0.1 * (mx - mn), mn + 0.2 * (mx - mn))
    val (kept, total) = ManifestTable.pruneFiles(spark, t, Seq(("ts", lo, hi)))
    assert(total === 8)
    assert(kept.nonEmpty && kept.size < total,
      s"time-clustered layout must prune a time box: kept ${kept.size}/$total")
    val pruned = ManifestTable.readRange(spark, t, Seq(("ts", lo, hi)))
      .filter(col("ts").cast("double").between(lo, hi)).count()
    val full = ev.filter(col("ts").cast("double").between(lo, hi)).count()
    assert(pruned === full && full > 0)
  }

  test("c29 layout: OPTIMIZE-ZORDER records 2-D ranges that prune a 2-D box (the judged lifecycle's payoff)") {
    val t = freshTable()
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    ManifestTable.commit(spark, t,
      li.repartitionByRange(16, col("l_orderkey"), col("l_linenumber")),
      SaveMode.Overwrite)
    // pre-OPTIMIZE: no stats recorded, nothing prunes
    val box = Seq(("l_partkey", 100.0, 400.0), ("l_suppkey", 10.0, 40.0))
    val (keptBefore, totalBefore) = ManifestTable.pruneFiles(spark, t, box)
    assert(keptBefore.size === totalBefore)
    ManifestTable.compact(spark, t, targetFiles = 16,
      sortBy = Seq(zkey16(col("l_partkey"), col("l_suppkey"))),
      statsColumns = Seq("l_partkey", "l_suppkey"))
    val (kept, total) = ManifestTable.pruneFiles(spark, t, box)
    assert(total === 16)
    assert(kept.size <= total / 2,
      s"z-order + stats pruned too little: ${kept.size}/$total files eligible")
    val prunedDf = ManifestTable.readRange(spark, t, box)
    assert(prunedDf.inputFiles.length === kept.size)
    val pruned = prunedDf
      .filter(col("l_partkey").between(100, 400) &&
        col("l_suppkey").between(10, 40)).count()
    val full = li.filter(col("l_partkey").between(100, 400) &&
      col("l_suppkey").between(10, 40)).count()
    assert(pruned === full && full > 0)
  }

  test("TIMESTAMP_NTZ range predicates prune in SECONDS, not raw µs (r10 fix)") {
    // the NTZ literal's internal Long is µs; before the fix it fell
    // through leafBounds' generic Number case and produced a bound
    // ~10^6 times past every file's epoch-seconds stats — readWhere
    // pruned ALL files and returned wrong empty results
    val t = freshTable()
    import spark.implicits._
    val rows = (0 until 96).map(h =>
      (h.toLong, java.time.LocalDateTime.of(2024, 1, 1 + h / 24, h % 24, 0)))
      .toDF("id", "ts") // LocalDateTime encodes as TIMESTAMP_NTZ
    assert(rows.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    ManifestTable.commit(spark, t, rows.repartitionByRange(4, col("id")),
      SaveMode.Overwrite, statsColumns = Seq("ts"))
    val cut = java.time.LocalDateTime.of(2024, 1, 3, 0, 0)
    val got = ManifestTable.readWhere(spark, t, col("ts") >= lit(cut))
    assert(got.count() === 48L, "NTZ range read must not lose rows")
    assert(got.inputFiles.length < 4,
      "and must still prune the out-of-range files")
    // IN over NTZ literals (InSet path once the list is large)
    val ins = (0 until 12).map(i => java.time.LocalDateTime.of(2024, 1, 1, i, 0))
    val gotIn = ManifestTable.readWhere(spark, t, col("ts").isin(ins: _*))
    assert(gotIn.count() === 12L)
  }
}
