package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** HIDDEN PARTITIONING — Iceberg-style partition transforms
  * (sources/ManifestTable.scala parseTransform/transformCol/
  * transformDnfAugment/bucketDnfOf): the layout column is derived
  * (`days(ts)`, `bucket(n, c)`, `truncate(w, c)`), recorded in the
  * manifest, recomputed by every writer, INVISIBLE to reads, and
  * pruned through by predicates on the source column alone. */
class HiddenPartitioningSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_hidden").toString

  private def events(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 3, 1 + i % 10, i % 24, 0)),
        s"u${i % 7}")
    }.toDF("id", "ts", "user")
  }

  test("days(ts): layout column stays hidden; ts predicates prune partitions") {
    val t = freshDir()
    ManifestTable.commit(spark, t, events(960), SaveMode.Overwrite,
      partitionBy = Seq("days(ts)"))
    val got = ManifestTable.read(spark, t)
    assert(got.columns.toSeq === Seq("id", "ts", "user"),
      "the derived ts_day column must never surface")
    assert(got.count() === 960L)
    // 10 day-partitions on disk
    assert(ManifestTable.snapshotFiles(spark, t)
      .flatMap(_.split("/").find(_.startsWith("ts_day="))).distinct.size === 10)
    val total = ManifestTable.snapshotFiles(spark, t).size
    val cut = java.sql.Timestamp.valueOf("2024-03-08 00:00:00")
    val pruned = ManifestTable.readWhere(spark, t, col("ts") >= lit(cut))
    assert(pruned.inputFiles.length < total,
      "a ts range must prune day partitions WITHOUT naming ts_day")
    assert(pruned.count() ===
      ManifestTable.read(spark, t).filter(col("ts") >= lit(cut)).count())
  }

  test("bucket(8, id): point lookups prune to one bucket; IN to the hull") {
    val t = freshDir()
    ManifestTable.commit(spark, t, events(4000), SaveMode.Overwrite,
      partitionBy = Seq("bucket(8,id)"))
    val total = ManifestTable.snapshotFiles(spark, t).size
    assert(total >= 8)
    val hit = ManifestTable.readWhere(spark, t, col("id") === 1234L)
    assert(hit.count() === 1L)
    assert(hit.inputFiles.length <= total / 4,
      s"a point lookup should read ~1 of 8 buckets, read ${hit.inputFiles.length}/$total")
    val in2 = ManifestTable.readWhere(spark, t, col("id").isin(5L, 3999L))
    assert(in2.count() === 2L)
    assert(in2.inputFiles.length < total)
  }

  test("truncate(1000, id): range scans prune width-aligned partitions") {
    val t = freshDir()
    ManifestTable.commit(spark, t, events(4000), SaveMode.Overwrite,
      partitionBy = Seq("truncate(1000,id)"))
    val total = ManifestTable.snapshotFiles(spark, t).size
    val pruned = ManifestTable.readWhere(spark, t,
      col("id").between(1500L, 1700L))
    assert(pruned.count() === 201L)
    assert(pruned.inputFiles.length < total)
    assert(ManifestTable.read(spark, t).columns.toSeq ===
      Seq("id", "ts", "user"))
  }

  test("rewrites preserve the hidden layout with zero call-site cooperation") {
    val t = freshDir()
    import spark.implicits._
    ManifestTable.commit(spark, t, events(800), SaveMode.Overwrite,
      partitionBy = Seq("bucket(4,id)"))
    // the upsert frame carries ONLY source columns — writeData must
    // re-derive id_bucket from the recorded transform
    ManifestTable.upsert(spark, t,
      Seq((7L,
        java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), "REWRITTEN"))
        .toDF("id", "ts", "user"),
      Seq("id"))
    val hit = ManifestTable.readWhere(spark, t, col("id") === 7L)
    assert(hit.collect().map(_.getString(2)).toSeq === Seq("REWRITTEN"))
    // the rewritten file landed back under a bucket dir and pruning
    // still works
    assert(ManifestTable.snapshotFiles(spark, t)
      .forall(_.contains("id_bucket=")))
    assert(hit.inputFiles.length <
      ManifestTable.snapshotFiles(spark, t).size)
  }

  test("appends inherit the transform; divergence is refused") {
    val t = freshDir()
    ManifestTable.commit(spark, t, events(100), SaveMode.Overwrite,
      partitionBy = Seq("bucket(4,id)"))
    import spark.implicits._
    val more = (10000 until 10100).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-04-01 00:00:00"), "x"))
      .toDF("id", "ts", "user")
    ManifestTable.commit(spark, t, more) // bare append inherits
    assert(ManifestTable.read(spark, t).count() === 200L)
    assert(ManifestTable.partitionTransforms(spark, t)
      .map(_.kind) === Seq("bucket"))
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t, more, partitionBy = Seq("bucket(8,id)"))
    }
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t, more, partitionBy = Seq("days(ts)"))
    }
  }

  test("restore and shallow clone carry the transform record") {
    val src = freshDir(); val dst = freshDir()
    ManifestTable.commit(spark, src, events(200), SaveMode.Overwrite,
      partitionBy = Seq("bucket(4,id)"))
    ManifestTable.commit(spark, src, events(100), SaveMode.Overwrite) // flat v2
    assert(ManifestTable.partitionTransforms(spark, src).isEmpty,
      "an overwrite to a flat layout clears the record")
    ManifestTable.restore(spark, src, 1)
    assert(ManifestTable.partitionTransforms(spark, src).map(_.kind) ===
      Seq("bucket"), "restore brings the target's layout record back")
    ManifestTable.cloneShallow(spark, src, dst)
    assert(ManifestTable.partitionTransforms(spark, dst).map(_.kind) ===
      Seq("bucket"))
    val hit = ManifestTable.readWhere(spark, dst, col("id") === 42L)
    assert(hit.count() === 1L)
    assert(hit.inputFiles.length <
      ManifestTable.snapshotFiles(spark, dst).size)
  }

  test("months(ts) / hours(ts): calendar granularities prune and stay hidden") {
    val t = freshDir()
    import spark.implicits._
    // 6 months of daily rows
    val rows = (0 until 180).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(i)))
    }.toDF("id", "ts")
    ManifestTable.commit(spark, t, rows, SaveMode.Overwrite,
      partitionBy = Seq("months(ts)"))
    assert(ManifestTable.snapshotFiles(spark, t)
      .flatMap(_.split("/").find(_.startsWith("ts_month="))).distinct.size === 6)
    val total = ManifestTable.snapshotFiles(spark, t).size
    val cut = java.sql.Timestamp.valueOf("2024-05-15 00:00:00")
    val pruned = ManifestTable.readWhere(spark, t, col("ts") >= lit(cut))
    assert(pruned.count() === rows.filter(col("ts") >= lit(cut)).count())
    assert(pruned.inputFiles.length < total,
      "a May cut must drop the Jan–Apr month partitions")
    assert(ManifestTable.read(spark, t).columns.toSeq === Seq("id", "ts"))
    // hours on a narrow window
    val t2 = freshDir()
    val hrs = (0 until 48).map(h =>
      (h.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(h))))
      .toDF("id", "ts")
    ManifestTable.commit(spark, t2, hrs, SaveMode.Overwrite,
      partitionBy = Seq("hours(ts)"))
    val h1 = ManifestTable.readWhere(spark, t2,
      col("ts") === java.sql.Timestamp.valueOf("2024-01-01 07:00:00"))
    assert(h1.count() === 1L)
    assert(h1.inputFiles.length <= 2)
  }

  test("years(date): a DATE source prunes through the day-number stats domain") {
    val t = freshDir()
    import spark.implicits._
    val rows = (0 until 40).map(i =>
      (i.toLong, java.sql.Date.valueOf(s"${2018 + i % 5}-0${1 + i % 9}-15")))
      .toDF("id", "d")
    ManifestTable.commit(spark, t, rows, SaveMode.Overwrite,
      partitionBy = Seq("years(d)"))
    val total = ManifestTable.snapshotFiles(spark, t).size
    val pruned = ManifestTable.readWhere(spark, t,
      col("d") >= lit(java.sql.Date.valueOf("2021-01-01")))
    assert(pruned.count() ===
      rows.filter(col("d") >= lit(java.sql.Date.valueOf("2021-01-01"))).count())
    assert(pruned.inputFiles.length < total)
  }

  test("identity and transform columns mix; target collisions are refused") {
    val t = freshDir()
    ManifestTable.commit(spark, t, events(400), SaveMode.Overwrite,
      partitionBy = Seq("user", "bucket(4,id)"))
    val got = ManifestTable.read(spark, t)
    assert(got.columns.toSeq.sorted === Seq("id", "ts", "user"),
      "identity column surfaces, hidden target does not")
    val pruned = ManifestTable.readWhere(spark, t,
      col("user") === "u3" && col("id") === 3L)
    assert(pruned.count() === 1L)
    assert(pruned.inputFiles.length <
      ManifestTable.snapshotFiles(spark, t).size / 2,
      "identity and bucket pruning must compose")
    intercept[IllegalArgumentException] {
      val bad = events(10).withColumn("id_bucket", lit(1))
      ManifestTable.commit(spark, freshDir(), bad, SaveMode.Overwrite,
        partitionBy = Seq("bucket(4,id)"))
    }
  }

  test("the table-CREATING append records the transform (review r10 fix)") {
    val t = freshDir()
    // default SaveMode.Append on a fresh table — the path every
    // pipeline's first write takes
    ManifestTable.commit(spark, t, events(200),
      partitionBy = Seq("bucket(4,id)"))
    assert(ManifestTable.partitionTransforms(spark, t).map(_.kind) ===
      Seq("bucket"), "layout memory must survive the creating append")
    // a later bare append inherits instead of crashing on the missing
    // derived column; a rewrite re-derives it
    import spark.implicits._
    ManifestTable.commit(spark, t,
      (9000 until 9050).map(i => (i.toLong,
        java.sql.Timestamp.valueOf("2024-05-01 00:00:00"), "x"))
        .toDF("id", "ts", "user"))
    ManifestTable.upsert(spark, t,
      Seq((9001L, java.sql.Timestamp.valueOf("2024-05-01 00:00:00"), "UP"))
        .toDF("id", "ts", "user"), Seq("id"))
    assert(ManifestTable.read(spark, t).count() === 250L)
    val hit = ManifestTable.readWhere(spark, t, col("id") === 9001L)
    assert(hit.collect().map(_.getString(2)).toSeq === Seq("UP"))
    assert(hit.inputFiles.length <
      ManifestTable.snapshotFiles(spark, t).size)
  }

  test("a string-sourced range transform is refused — two numeric spaces cannot mix") {
    val t = freshDir()
    // truncate/days on a string column would WRITE through the double
    // cast but PRUNE through the stringBound prefix encoding —
    // silently pruning live files; refused at the commit instead
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t, events(10), SaveMode.Overwrite,
        partitionBy = Seq("truncate(4,user)"))
    }
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t, events(10), SaveMode.Overwrite,
        partitionBy = Seq("days(id)")) // days needs a time type
    }
    // bucket hashes anything — a string source is fine there
    ManifestTable.commit(spark, t, events(100), SaveMode.Overwrite,
      partitionBy = Seq("bucket(4,user)"))
    val hit = ManifestTable.readWhere(spark, t, col("user") === "u3")
    assert(hit.count() ===
      ManifestTable.read(spark, t).filter(col("user") === "u3").count())
    assert(hit.inputFiles.length <
      ManifestTable.snapshotFiles(spark, t).size)
  }

  test("a mid-merge transform change forces a re-derive, never a mislaid reconcile") {
    val t = freshDir()
    ManifestTable.commit(spark, t, events(200), SaveMode.Overwrite,
      partitionBy = Seq("bucket(2,id)"))
    import spark.implicits._
    @volatile var fired = false
    ManifestTable.beforeConditionalCommit = () => {
      if (!fired) {
        fired = true
        // same target NAME, different bucket count: the partBy list
        // cannot distinguish the layouts — only the transform record can
        ManifestTable.commit(spark, t, events(200), SaveMode.Overwrite,
          partitionBy = Seq("bucket(4,id)"))
      }
    }
    try {
      // INSERT-ONLY merge: removed = ∅, so the reconcile gate's
      // file-survival checks all pass trivially — only the transform
      // comparison can force the re-derive (the review's exact case)
      ManifestTable.merge(spark, t,
        Seq((999999L, java.sql.Timestamp.valueOf("2024-03-01 00:00:00"),
          "INSERTED")).toDF("id", "ts", "user"), Seq("id"))
    } finally ManifestTable.beforeConditionalCommit = () => ()
    assert(fired)
    // the inserted row's file must be laid out under the NEW transform:
    // a bucket(4) point lookup must both FIND it and PRUNE to its
    // bucket — a reconcile of the bucket(2)-laid file would record
    // partition stats the bucket(4) literal mapping prunes away
    val hit = ManifestTable.readWhere(spark, t, col("id") === 999999L)
    assert(hit.collect().map(_.getString(2)).toSeq === Seq("INSERTED"))
    assert(hit.inputFiles.length <
      ManifestTable.snapshotFiles(spark, t).size)
    assert(ManifestTable.read(spark, t).count() === 201L)
  }

  test("DDL cannot create a column that collides with a transform target") {
    val t = freshDir()
    ManifestTable.commit(spark, t, events(100), SaveMode.Overwrite,
      partitionBy = Seq("bucket(4,id)"))
    // addColumn("id_bucket") would let a later batch carry its OWN
    // layout values — refused like the batch-column collision is
    intercept[IllegalArgumentException] {
      ManifestTable.addColumn(spark, t, "id_bucket",
        org.apache.spark.sql.types.LongType)
    }
    // an append whose batch smuggles the target is refused too
    import spark.implicits._
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t,
        events(5).withColumn("id_bucket", lit(0L)))
    }
  }

  test("OPTIMIZE on a transform-partitioned table recomputes the hidden layout") {
    // promoted r11 probe 4 — the regression pin for the r11 compact
    // fix: the hidden target is NOT in the read frame, so shuffling
    // "on the partition columns" must recompute it through the shared
    // transform expression or compact dies on an unresolvable column.
    import spark.implicits._
    val t = freshDir()
    val data = (0 until 100).map(i => (i.toLong, i % 7, s"r$i")).toDF("id", "g", "s")
    ManifestTable.commit(spark, t, data.repartition(10), SaveMode.Overwrite,
      partitionBy = Seq("bucket(4,id)"), statsColumns = Seq("id", "g"))
    ManifestTable.compact(spark, t, targetFiles = 2)
    assert(ManifestTable.read(spark, t).count() == 100)
    assert(ManifestTable.partitionTransforms(spark, t).nonEmpty,
      "the transform record must survive the rewrite")
    // the compacted files still live under the hidden layout's dirs
    assert(ManifestTable.snapshotFiles(spark, t)
      .forall(_.contains("id_bucket=")), "compact must preserve the layout")
  }

  test("compact(sortBy) on a months() table: z-order WITHIN partitions, both prunes stack") {
    // closes r10 verdict item 4: z-order × hidden partitioning
    // COMPOSED. The calendar transform owns the directory layout; the
    // sortBy key clusters rows within each month so per-file ranges on
    // it are tight — and one read prunes through BOTH: the month dirs
    // via the transform's monotone mapping, the survivors via the
    // sort key's recorded ranges.
    import spark.implicits._
    val t = freshDir()
    val n = 4000
    val data = (0 until n).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1 + i % 6, 1 + i % 28, i % 24, 0)),
        (i * 37 % n).toLong) // scattered sort key
    }.toDF("id", "ts", "k")
    ManifestTable.commit(spark, t, data.repartition(12), SaveMode.Overwrite,
      partitionBy = Seq("months(ts)"), statsColumns = Seq("k"))
    val monthsBefore = ManifestTable.snapshotFiles(spark, t)
      .flatMap(_.split("/").find(_.startsWith("ts_month="))).distinct.sorted
    // targetFiles comfortably above the 6 month values: each month
    // splits into ~3 k-contiguous files — the within-value clustering
    // under test
    ManifestTable.compact(spark, t, targetFiles = 18, sortBy = Seq(col("k")))
    val files = ManifestTable.snapshotFiles(spark, t)
    val monthsAfter = files
      .flatMap(_.split("/").find(_.startsWith("ts_month="))).distinct.sorted
    assert(monthsAfter == monthsBefore,
      "the hidden calendar layout must survive a sorted OPTIMIZE")
    assert(ManifestTable.read(spark, t).count() == n)
    // z-order payoff: each month now holds k-clustered files, so a
    // k-range predicate prunes WITHIN the months a ts predicate keeps
    val total = files.size
    val both = ManifestTable.readWhere(spark, t,
      col("ts") >= lit(java.sql.Timestamp.valueOf("2024-05-01 00:00:00")) &&
        col("k") < 400L)
    val tsOnly = ManifestTable.readWhere(spark, t,
      col("ts") >= lit(java.sql.Timestamp.valueOf("2024-05-01 00:00:00")))
    assert(tsOnly.inputFiles.length < total,
      s"month pruning must drop files (${tsOnly.inputFiles.length}/$total)")
    assert(both.inputFiles.length < tsOnly.inputFiles.length,
      s"the k range must prune WITHIN surviving months " +
        s"(${both.inputFiles.length} vs ts-only ${tsOnly.inputFiles.length})")
    assert(both.count() ==
      data.filter($"ts" >= lit(java.sql.Timestamp.valueOf("2024-05-01 00:00:00"))
        && $"k" < 400L).count())
  }
}
