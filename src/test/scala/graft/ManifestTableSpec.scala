package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** Manifest-commit protocol (sources/ManifestTable.scala): snapshot
  * isolation over raw parquet. The torn-write drill is the point —
  * data files on disk with no manifest must be invisible. */
class ManifestTableSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_mtab").toString

  import org.apache.spark.sql.DataFrame
  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  test("append commits compose snapshots; reads see exactly the committed union") {
    val t = freshTable()
    assert(ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b")) === 1)
    assert(ManifestTable.commit(spark, t, df(3L -> "c")) === 2)
    val got = ManifestTable.read(spark, t).orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("overwrite replaces the snapshot; time travel still reads v1") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    ManifestTable.commit(spark, t, df(9L -> "z"), SaveMode.Overwrite)
    assert(ManifestTable.read(spark, t).count() === 1)
    assert(ManifestTable.read(spark, t, version = 1).count() === 2)
  }

  test("readers never see a half-commit: orphan data files without a manifest are invisible") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    // simulate a writer crash between data write and manifest publish:
    // a full parquet directory appears under data/ with NO manifest
    df(100L -> "torn", 101L -> "torn").write
      .mode(SaveMode.ErrorIfExists).parquet(s"$t/data/crashed-writer")
    val got = ManifestTable.read(spark, t).collect()
    assert(got.length === 1 && got.head.getLong(0) === 1L,
      "orphan files leaked into a read")
    // and the next commit does not resurrect them
    ManifestTable.commit(spark, t, df(2L -> "b"))
    assert(ManifestTable.read(spark, t).count() === 2)
  }

  test("upsert replaces matched keys, inserts the rest, as ONE atomic snapshot") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "old", 2L -> "keep"))
    val v = ManifestTable.upsert(spark, t, df(1L -> "new", 3L -> "ins"), Seq("id"))
    val got = ManifestTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
    // pre-image intact at the previous version (snapshot isolation)
    assert(ManifestTable.read(spark, t, version = v - 1)
      .filter(col("v") === "old").count() === 1)
  }

  test("a crashed writer's temp manifest is invisible — not a parse crash") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    // simulate a crash between temp-manifest write and the rename
    val stray = new java.io.File(new java.io.File(t, "_manifests"), ".tmp-dead-2.json")
    val w = new java.io.PrintWriter(stray)
    try w.write("""{"version": 2, "files": ["/nowhere.parquet"]}""") finally w.close()
    assert(ManifestTable.currentVersion(spark, t) === 1)
    assert(ManifestTable.read(spark, t).count() === 1)
    // and the next commit lands on v2 normally
    assert(ManifestTable.commit(spark, t, df(2L -> "b")) === 2)
  }

  test("deleteWhere rewrites only affected files; untouched files carry over by reference") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))          // file set A
    ManifestTable.commit(spark, t, df(3L -> "c", 4L -> "d"))          // file set B
    val before = ManifestTable.snapshotFiles(spark, t)
    val v = ManifestTable.deleteWhere(spark, t, col("id") === 3L)
    assert(v === 3)
    val got = ManifestTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a"), (2L, "b"), (4L, "d")))
    // file-level pruning: commit-1's files (no row matched) must appear
    // UNCHANGED in the new snapshot; commit-2's were rewritten
    val after = ManifestTable.snapshotFiles(spark, t).toSet
    val carried = before.toSet.intersect(after)
    assert(carried.nonEmpty, "expected untouched files carried by reference")
    assert(ManifestTable.read(spark, t, version = v - 1).count() === 4,
      "pre-delete snapshot must stay readable (time travel)")
    // no matching rows -> no new version
    assert(ManifestTable.deleteWhere(spark, t, col("id") === 999L) === v)
  }

  test("deleteWhere keeps rows whose predicate is NULL (SQL DELETE semantics)") {
    import spark.implicits._
    val t = freshTable()
    val rows = Seq((1L, Some(5)), (2L, None), (3L, Some(-1)))
      .toDF("id", "score") // row 2: score IS NULL -> pred NULL -> keep
    ManifestTable.commit(spark, t, rows)
    ManifestTable.deleteWhere(spark, t, col("score") < 0)
    assert(ManifestTable.read(spark, t).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L),
      "a NULL predicate row was dropped from a rewritten file")
  }

  test("deleteWhere relative-path mapping survives a moved table root") {
    // manifests store table-relative paths: physically relocating the
    // whole table directory must leave every version readable
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    ManifestTable.deleteWhere(spark, t, col("id") === 1L)
    val moved = freshTable() + "_moved"
    java.nio.file.Files.move(java.nio.file.Paths.get(t),
      java.nio.file.Paths.get(moved))
    assert(ManifestTable.read(spark, moved).collect().map(_.getLong(0)).toSeq
      === Seq(2L))
    assert(ManifestTable.read(spark, moved, version = 1).count() === 2)
  }

  test("expire keeps the last N versions and reclaims unreferenced data dirs") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"), SaveMode.Overwrite)  // v1
    ManifestTable.commit(spark, t, df(2L -> "b"), SaveMode.Overwrite)  // v2 (orphans v1's files)
    ManifestTable.commit(spark, t, df(3L -> "c"))                      // v3 = v2+new
    // plus a crashed writer's orphan dir — expire must reclaim it too
    df(99L -> "junk").write.parquet(s"$t/data/crashed-orphan")
    ManifestTable.expire(spark, t, keepLast = 2)
    assert(ManifestTable.versions(spark, t) === Seq(2, 3))
    assert(intercept[IllegalArgumentException](
      ManifestTable.read(spark, t, version = 1)).getMessage.contains("expired"))
    // head and its predecessor unaffected
    assert(ManifestTable.read(spark, t).orderBy("id").collect()
      .map(_.getString(1)).toSeq === Seq("b", "c"))
    assert(ManifestTable.read(spark, t, version = 2).count() === 1)
    // v1's data dir and the crashed orphan are gone; referenced dirs survive
    val dirs = new java.io.File(t, "data").listFiles().map(_.getName).toSet
    assert(!dirs.contains("crashed-orphan"))
    val referenced = ManifestTable.versions(spark, t)
      .flatMap(v => ManifestTable.snapshotFiles(spark, t, v))
      .map(_.split("/")(1)).toSet
    assert(dirs === referenced, "exactly the referenced data dirs survive")
  }

  test("expire with a retention grace spares a fresh in-flight writer's dir, reclaims old garbage") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"), SaveMode.Overwrite)   // v1
    ManifestTable.commit(spark, t, df(2L -> "b"), SaveMode.Overwrite)   // v2 (orphans v1's files)
    // an in-flight writer: data fully written, manifest not yet
    // published — with a grace window this dir must SURVIVE the vacuum
    df(50L -> "inflight").write.parquet(s"$t/data/inflight-writer")
    // old crashed garbage: backdate its mtimes beyond the grace
    df(99L -> "junk").write.parquet(s"$t/data/old-crash")
    val old = new java.io.File(t, "data/old-crash")
    val past = System.currentTimeMillis() - 3600_000L
    (old +: old.listFiles().toSeq).foreach(_.setLastModified(past))
    ManifestTable.expire(spark, t, keepLast = 1, graceMs = 600_000L)
    val dirs = new java.io.File(t, "data").listFiles().map(_.getName).toSet
    assert(dirs.contains("inflight-writer"), "grace window violated: fresh dir reclaimed")
    assert(!dirs.contains("old-crash"), "backdated garbage should be reclaimed")
    // v1's superseded dir is also old? No — just written. It survives
    // the grace too (correct: conservative), but NOT a zero-grace run:
    ManifestTable.expire(spark, t, keepLast = 1)
    val dirs2 = new java.io.File(t, "data").listFiles().map(_.getName).toSet
    assert(!dirs2.contains("inflight-writer"),
      "zero grace keeps the r5 reclaim-everything semantics")
    assert(ManifestTable.read(spark, t).collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("a scheme-prefixed table root (file://) commits, merges, and time-travels") {
    // the relative-path manifests must qualify against an EXPLICIT
    // scheme URI, not just bare local paths — the non-default-FS story
    val t = java.nio.file.Files.createTempDirectory("graft_mtab_uri").toUri.toString
      .stripSuffix("/") + "/tbl"
    assert(t.startsWith("file:///"))
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    ManifestTable.upsert(spark, t, df(2L -> "B", 3L -> "c"), Seq("id"))
    assert(ManifestTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a"), (2L, "B"), (3L, "c")))
    assert(ManifestTable.read(spark, t, version = 1).count() === 2)
  }

  test("append with a divergent schema is refused; overwrite replaces the schema") {
    import spark.implicits._
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    val widened = Seq((2L, "b", 3.5)).toDF("id", "v", "extra")
    val e = intercept[IllegalArgumentException](
      ManifestTable.commit(spark, t, widened))
    assert(e.getMessage.contains("schema mismatch"))
    assert(ManifestTable.currentVersion(spark, t) === 1,
      "refused append must not commit a version")
    // same columns, different type — also refused
    val retyped = Seq((3, "c")).toDF("id", "v") // id is Int, table has Long
    assert(intercept[IllegalArgumentException](
      ManifestTable.commit(spark, t, retyped)).getMessage.contains("schema mismatch"))
    // overwrite is the sanctioned schema-change path
    assert(ManifestTable.commit(spark, t, widened, SaveMode.Overwrite) === 2)
    assert(ManifestTable.read(spark, t).columns.sorted.toSeq === Seq("extra", "id", "v"))
  }

  test("changes() returns exactly the appended rows; upsert changes are the rewritten snapshot") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))                      // v1
    ManifestTable.commit(spark, t, df(2L -> "b"))                      // v2
    ManifestTable.commit(spark, t, df(3L -> "c"))                      // v3
    assert(ManifestTable.changes(spark, t, sinceVersion = 1).orderBy("id")
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 3L))
    assert(ManifestTable.changes(spark, t, 1, toVersion = 2)
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
    assert(ManifestTable.changes(spark, t, 3).count() === 0) // empty, typed
    assert(ManifestTable.changes(spark, t, 3).columns.toSeq === Seq("id", "v"))
    // an upsert rewrites only the TOUCHED files (r8): each single-row
    // commit made one file, so the feed after upserting key 2 is that
    // key's rewritten file — keys 1 and 3 carry by reference, outside
    // the feed
    ManifestTable.upsert(spark, t, df(2L -> "B"), Seq("id"))           // v4
    assert(ManifestTable.changes(spark, t, 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((2L, "B")))
    // row-level delta via the documented time-travel anti-join
    val delta = ManifestTable.changes(spark, t, 3)
      .except(ManifestTable.read(spark, t, version = 3))
    assert(delta.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((2L, "B")))
    // and the untouched keys are still at head, via their carried files
    assert(ManifestTable.read(spark, t).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("compact collapses the head's small files into one, preserves rows, leaves time travel intact") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    ManifestTable.commit(spark, t, df(2L -> "b"))
    ManifestTable.commit(spark, t, df(3L -> "c"))
    val before = ManifestTable.snapshotFiles(spark, t)
    assert(before.size >= 3, "setup: head should reference several small files")
    val v = ManifestTable.compact(spark, t, targetFiles = 1,
      sortBy = Seq(col("id")))
    assert(v === 4)
    assert(ManifestTable.snapshotFiles(spark, t).size === 1)
    assert(ManifestTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // pre-compaction version still reads the original small files
    assert(ManifestTable.read(spark, t, version = 3).count() === 3)
    assert(ManifestTable.snapshotFiles(spark, t, 3) === before)
    // and expire afterwards reclaims the superseded small files
    ManifestTable.expire(spark, t, keepLast = 1)
    val dirs = new java.io.File(t, "data").listFiles().map(_.getName).toSet
    assert(dirs.size === 1, s"expected only the compacted dir, got $dirs")
  }

  test("two concurrent appenders: gap-free monotonic versions, both snapshots in the lineage") {
    val t = freshTable()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    // 2 writers x 3 appends racing for version slots; link(2)-exclusive
    // publish means exactly one wins each slot and the loser recomposes
    val fa = Future((1 to 3).map(i => ManifestTable.commit(spark, t, df(i.toLong -> "A"))))
    val fb = Future((1 to 3).map(i => ManifestTable.commit(spark, t, df((10 + i).toLong -> "B"))))
    val versions = Await.result(fa, 5.minutes) ++ Await.result(fb, 5.minutes)
    pool.shutdown()
    assert(versions.sorted === Seq(1, 2, 3, 4, 5, 6), s"got $versions")
    // every append survived into the head snapshot — no lost updates
    val ids = ManifestTable.read(spark, t).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L, 11L, 12L, 13L))
    // and the lineage is strictly growing: each version adds one file set
    val sizes = (1 to 6).map(v => ManifestTable.snapshotFiles(spark, t, v).size)
    assert(sizes === sizes.sorted && sizes.distinct === sizes,
      s"snapshot file counts must strictly grow: $sizes")
  }

  test("two concurrent upserters on the SAME key: no lost update, one key at head") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "base", 2L -> "keep"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val fa = Future(ManifestTable.upsert(spark, t, df(1L -> "A", 3L -> "insA"), Seq("id")))
    val fb = Future(ManifestTable.upsert(spark, t, df(1L -> "B", 4L -> "insB"), Seq("id")))
    val (va, vb) = (Await.result(fa, 5.minutes), Await.result(fb, 5.minutes))
    pool.shutdown()
    assert(Set(va, vb) === Set(2, 3), s"got $va, $vb")
    val got = ManifestTable.read(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    // the conditional commit forces the loser to re-derive against the
    // winner's head: BOTH inserts survive (a stale-read merge would
    // have dropped the winner's), and key 1 holds exactly the later value
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got(2L) === "keep" && got(3L) === "insA" && got(4L) === "insB")
    assert(ManifestTable.read(spark, t).filter(col("id") === 1L).count() === 1)
  }

  test("compact racing an upsert: no committed version loses the upsert; compact lands or aborts cleanly") {
    // maintenance must never clobber data: compact's conditional commit
    // either wins a slot whose base already includes the upsert, or
    // loses the race and ABORTS (no retry — retrying would republish
    // the pre-upsert image). Run the race several times; assert the
    // invariant on every committed version at or above the upsert's.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.util.{Failure, Success, Try}
    (1 to 3).foreach { round =>
      val t = freshTable()
      ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
      ManifestTable.commit(spark, t, df(3L -> "c"))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val fUp = Future(ManifestTable.upsert(spark, t,
        df(2L -> "UP", 4L -> "ins"), Seq("id")))
      val fCo = Future(Try(ManifestTable.compact(spark, t, targetFiles = 1)))
      val vUp = Await.result(fUp, 5.minutes)
      val co = Await.result(fCo, 5.minutes)
      pool.shutdown()
      co match {
        case Success(vCo) => assert(vCo !== vUp, s"round $round: slot collision")
        case Failure(e) =>
          assert(e.isInstanceOf[java.util.ConcurrentModificationException],
            s"round $round: compact must abort with CME, got $e")
      }
      val head = ManifestTable.currentVersion(spark, t)
      (vUp to head).foreach { v =>
        val got = ManifestTable.read(spark, t, v).collect()
          .map(r => (r.getLong(0), r.getString(1))).toMap
        assert(got === Map(1L -> "a", 2L -> "UP", 3L -> "c", 4L -> "ins"),
          s"round $round: version $v lost the upsert (compact=$co, upsert=$vUp)")
      }
    }
  }

  test("a legacy absolute-path manifest is re-relativized; unknown path formats fail loudly") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    val files = ManifestTable.snapshotFiles(spark, t)
    def writeManifest(v: Int, paths: Seq[String]): Unit = {
      val w = new java.io.PrintWriter(
        new java.io.File(new java.io.File(t, "_manifests"), f"v$v%08d.json"))
      try w.write(
        s"""{\n  "version": $v,\n  "files": [\n${paths.map(p => s"""    "$p"""").mkString(",\n")}\n  ]\n}""")
      finally w.close()
    }
    // v2 in the pre-r5 format: absolute paths to the same data files
    writeManifest(2, files.map(f => s"$t/$f"))
    assert(ManifestTable.read(spark, t, version = 2).count() === 2,
      "legacy absolute paths must be re-relativized, not silently skipped")
    assert(ManifestTable.snapshotFiles(spark, t, 2).toSet === files.toSet)
    // v3 with a path that is neither relative nor a data/-tailed
    // absolute path: explicit format error, not an empty read
    writeManifest(3, Seq("/else/where/part-0.parquet"))
    val e = intercept[IllegalArgumentException](ManifestTable.read(spark, t, version = 3))
    assert(e.getMessage.contains("manifest format"))
  }

  test("changes() on a never-committed table is empty — consumers start at lastSeen = 0") {
    val t = freshTable()
    assert(ManifestTable.changes(spark, t, sinceVersion = 0).count() === 0)
  }

  test("the link(2) commit point is atomic-exclusive ACROSS PROCESSES, not just threads") {
    // the scaladoc claims the local commit point is exclusive "for any
    // number of local processes" — the thread races above share a JVM,
    // so prove the OS primitive itself: N separate processes race
    // hard-linking their own temp manifests into ONE version slot;
    // exactly one may win, and the slot must hold that winner's bytes
    // intact (link is all-or-nothing — no interleaving possible).
    (1 to 3).foreach { round =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft_link_race_$round")
      val slot = dir.resolve("v00000001.json")
      val procs = (1 to 8).map { i =>
        val tmp = dir.resolve(s".tmp-$i.json")
        java.nio.file.Files.write(tmp, s"""{"writer": $i}""".getBytes("UTF-8"))
        // bash sleep-barrier packs the 8 link attempts tightly together
        new ProcessBuilder("bash", "-c",
          s"sleep 0.2; exec ln '$tmp' '$slot'").start()
      }
      val exits = procs.map(_.waitFor())
      assert(exits.count(_ == 0) === 1,
        s"round $round: exactly one ln must win the slot, exits=$exits")
      val content = new String(java.nio.file.Files.readAllBytes(slot), "UTF-8")
      assert(content.matches("""\{"writer": \d\}"""),
        s"round $round: torn or foreign slot content: $content")
    }
  }

  test("publish gate: object-store schemes are refused without the explicit opt-in") {
    ManifestTable.requireAtomicPublish("hdfs", optIn = false)   // atomic rename: fine
    ManifestTable.requireAtomicPublish("s3a", optIn = true)     // explicit opt-in: fine
    val e = intercept[IllegalArgumentException](
      ManifestTable.requireAtomicPublish("s3a", optIn = false))
    assert(e.getMessage.contains("no atomic-exclusive"))
    intercept[IllegalArgumentException](
      ManifestTable.requireAtomicPublish("gs", optIn = false))
  }

  test("optimistic concurrency: a squatted version slot forces a retry, not a clobber") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    // squat v2 by hand (a concurrent writer's committed manifest)
    val dir = new java.io.File(t, "_manifests")
    val squat = new java.io.File(dir, "v00000002.json")
    val w = new java.io.PrintWriter(squat)
    try w.write("""{"version": 2, "files": []}""") finally w.close()
    // this writer must land on v3, leave v2 untouched, and recompose
    // its append against the NEW head — v2 emptied the table, so v3 is
    // squat-snapshot + new file = 1 row (not a lost-update 2)
    assert(ManifestTable.commit(spark, t, df(2L -> "b")) === 3)
    assert(scala.io.Source.fromFile(squat).mkString.contains("\"files\": []"))
    assert(ManifestTable.read(spark, t).count() === 1)
  }

  import org.apache.spark.sql.functions.{col, lit}

  private def dfN(rows: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v", "x")
  }

  private def readN(t: String): Set[(Long, String, Double)] =
    ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("merge clauses: delete wins over update; unconditional otherwise; unmatched inserts") {
    val t = freshTable()
    ManifestTable.commit(spark, t,
      dfN((1L, "a", 1.0), (2L, "b", -1.0), (3L, "c", 0.0)))
    // src doubles x; delete matched negatives, update matched where src
    // x beats current (x>0), keep the rest (x=0); key 4 inserts
    ManifestTable.merge(spark, t,
      dfN((1L, "A", 2.0), (2L, "B", -2.0), (3L, "C", 0.0), (4L, "D", 4.0)),
      Seq("id"),
      whenMatchedUpdate = Some(col("_src.x") > col("x")),
      whenMatchedDelete = Some(col("_src.x") < 0))
    assert(readN(t) === Set(
      (1L, "A", 2.0),  // updated (2.0 > 1.0)
      // 2 deleted (-2.0 < 0)
      (3L, "c", 0.0),  // kept: neither clause fired (0.0 > 0.0 false)
      (4L, "D", 4.0))) // inserted
  }

  test("merge delete-only: whenMatchedUpdate = false leaves non-deleted matches untouched") {
    val t = freshTable()
    ManifestTable.commit(spark, t, dfN((1L, "a", 1.0), (2L, "b", 2.0)))
    ManifestTable.merge(spark, t,
      dfN((1L, "ZAP", 9.0), (2L, "ZAP", 9.0)),
      Seq("id"),
      whenMatchedUpdate = Some(lit(false)),
      whenMatchedDelete = Some(col("x") > 1.5)) // target column: pre-image x
    assert(readN(t) === Set((1L, "a", 1.0))) // 2 deleted; 1 NOT renamed
  }

  test("merge: a NULL clause condition is false (no silent delete or update)") {
    val t = freshTable()
    ManifestTable.commit(spark, t, dfN((1L, "a", 1.0)))
    ManifestTable.merge(spark, t, dfN((1L, "A", 9.0)), Seq("id"),
      whenMatchedUpdate = Some(lit(null).cast("boolean")),
      whenMatchedDelete = Some(lit(null).cast("boolean")))
    assert(readN(t) === Set((1L, "a", 1.0)))
  }

  test("mergeSchema append widens: old files read the new column as null; time travel keeps the narrow schema") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    ManifestTable.commit(spark, t, dfN((2L, "b", 5.0)), mergeSchema = true)
    val head = ManifestTable.read(spark, t)
    assert(head.columns.toSeq === Seq("id", "v", "x"))
    val got = head.collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    assert(got === Set((1L, "a", None), (2L, "b", Some(5.0))))
    // pre-evolution version still reads its own (narrow) schema
    assert(ManifestTable.read(spark, t, version = 1).columns.toSeq === Seq("id", "v"))
    // retype is refused even under mergeSchema
    import spark.implicits._
    val retyped = Seq((3L, 7)).toDF("id", "v") // v: int, table has string
    intercept[IllegalArgumentException](
      ManifestTable.commit(spark, t, retyped, mergeSchema = true))
  }

  test("rowChanges classifies insert / update_post / delete by key; identical survivors are absent") {
    val t = freshTable()
    val v1 = ManifestTable.commit(spark, t,
      dfN((1L, "keep", 1.0), (2L, "upd", 2.0), (3L, "del", 3.0)))
    // upsert rewrites the whole table (key 1 carried verbatim), then a
    // delete removes key 3 — the feed must show exactly two changes
    ManifestTable.upsert(spark, t, dfN((2L, "upd", 20.0), (4L, "new", 4.0)), Seq("id"))
    ManifestTable.deleteWhere(spark, t, col("id") === 3L)
    val feed = ManifestTable.rowChanges(spark, t, v1, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3))).toSet
    assert(feed === Set(
      (2L, "upd", 20.0, "update_post"),
      (3L, "del", 3.0, "delete"),
      (4L, "new", 4.0, "insert")))
  }

  test("rowChanges from version 0 is all-insert; empty range is empty") {
    val t = freshTable()
    val v1 = ManifestTable.commit(spark, t, dfN((1L, "a", 1.0)))
    val all = ManifestTable.rowChanges(spark, t, 0, Seq("id")).collect()
    assert(all.map(_.getString(3)).toSeq === Seq("insert"))
    assert(ManifestTable.rowChanges(spark, t, v1, Seq("id")).count() === 0)
  }

  test("merge with mergeSchema widens: kept rows null the added column; retype still refused") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    // updates add column x; key 2 replaced (gets x), key 1 kept (null x),
    // key 3 inserts (has x)
    ManifestTable.merge(spark, t,
      dfN((2L, "B", 2.0), (3L, "c", 3.0)), Seq("id"), mergeSchema = true)
    val head = ManifestTable.read(spark, t)
    assert(head.columns.toSeq === Seq("id", "v", "x"))
    val got = head.collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    assert(got === Set(
      (1L, "a", None), (2L, "B", Some(2.0)), (3L, "c", Some(3.0))))
    // retype refused even under evolution
    import spark.implicits._
    intercept[IllegalArgumentException](
      ManifestTable.merge(spark, t, Seq((4L, 9)).toDF("id", "v"),
        Seq("id"), mergeSchema = true))
    // strict mode still refuses a divergent batch outright
    intercept[Exception](
      ManifestTable.merge(spark, t, Seq((5L, "e")).toDF("id", "v"), Seq("id")))
  }

  test("rowChanges across a schema evolution: both sides compare under the TO-version schema") {
    val t = freshTable()
    val v1 = ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    // widen with x, and rewrite key 2 through the widened schema — key 1
    // stays only in the pre-evolution file
    ManifestTable.commit(spark, t, dfN((3L, "c", 3.0)), mergeSchema = true)
    ManifestTable.upsert(spark, t,
      dfN((2L, "B", 2.0), (3L, "c", 3.0)), Seq("id"))
    val feed = ManifestTable.rowChanges(spark, t, v1, Seq("id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)), r.getString(3)))
      .toSet
    // key 1: carried verbatim (null x on both sides of the comparison)
    // → absent; key 2: gained a value for x → update_post; key 3: new
    assert(feed === Set(
      (2L, "B", Some(2.0), "update_post"),
      (3L, "c", Some(3.0), "insert")))
  }

  test("a stats column literally named 'files' cannot shadow the files section (ADVICE r8)") {
    // the stats block precedes the files section and repeats raw column
    // names as keys — before the lastIndexOf anchor, a column named
    // `files` made snapshotFiles return Nil and expire() then reclaimed
    // LIVE data. This pins the whole blast radius: listing, read, expire.
    val t = freshTable()
    import spark.implicits._
    val rows = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("id", "files") // a legitimate, if unfortunate, column name
    ManifestTable.commit(spark, t, rows, statsColumns = Seq("files"))
    assert(ManifestTable.snapshotFiles(spark, t).nonEmpty,
      "stats key shadowed the files section")
    assert(ManifestTable.read(spark, t).count() === 3)
    // stats for the column are still recorded and usable
    val stats = ManifestTable.snapshotStats(spark, t)
    assert(stats.values.exists(_.contains("files")))
    // expire must NOT treat the data dirs as unreferenced
    ManifestTable.expire(spark, t, keepLast = 1)
    assert(ManifestTable.read(spark, t).count() === 3)
    // and a column name the grammar cannot carry is refused at the write
    intercept[IllegalArgumentException](
      ManifestTable.commit(spark, t,
        Seq((4L, 1.0)).toDF("id", "files").withColumnRenamed("files", "a\"b"),
        statsColumns = Seq("a\"b"), mode = SaveMode.Overwrite))
  }

  test("timestamp-as-of: strictly increasing commit times resolve every instant to one version (r9)") {
    val t = freshTable()
    // burst of commits, almost certainly sharing wall-clock ms — the
    // parentMs+1 adjustment must keep the recorded times strictly
    // increasing anyway, or as-of resolution ties arbitrarily
    ManifestTable.commit(spark, t, df(1L -> "a"))
    ManifestTable.commit(spark, t, df(2L -> "b"))
    ManifestTable.commit(spark, t, df(3L -> "c"))
    val ms = ManifestTable.versions(spark, t)
      .map(v => ManifestTable.commitTimeMs(spark, t, v).get)
    assert(ms === ms.sorted && ms.distinct.size === ms.size,
      s"commit times must be strictly increasing, got $ms")
    // exact-instant resolution: as-of each commit's own time IS that
    // version (Delta's TIMESTAMP AS OF rule: newest version ≤ instant)
    ManifestTable.versions(spark, t).foreach { v =>
      assert(ManifestTable.versionAsOf(spark, t,
        ManifestTable.commitTimeMs(spark, t, v).get) === v)
    }
    // between commits: still the earlier version
    assert(ManifestTable.versionAsOf(spark, t, ms(1) - 1) === 1)
    // far future: the head
    assert(ManifestTable.versionAsOf(spark, t, ms.last + 1000000L) === 3)
    // before the first commit: the table did not exist — loud error
    intercept[IllegalArgumentException] {
      ManifestTable.versionAsOf(spark, t, ms.head - 1)
    }
    // and the read itself returns the as-of snapshot's rows
    val rows = ManifestTable.readAsOf(spark, t, ms(1)).collect()
      .map(_.getLong(0)).toSet
    assert(rows === Set(1L, 2L))
  }

  test("timestamp-as-of after expire: resolution works over the surviving tail") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    ManifestTable.commit(spark, t, df(2L -> "b"))
    ManifestTable.commit(spark, t, df(3L -> "c"))
    val msHead = ManifestTable.commitTimeMs(spark, t, 3).get
    ManifestTable.expire(spark, t, keepLast = 2)
    // the expired v1's instant now predates every surviving version
    intercept[IllegalArgumentException] {
      ManifestTable.versionAsOf(spark, t,
        ManifestTable.commitTimeMs(spark, t, 2).get - 1)
    }
    assert(ManifestTable.versionAsOf(spark, t, msHead) === 3)
  }

  test("changes() across a schema evolution reads under the TO-version schema (ADVICE r8)") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    // v2 widens with x: the feed range 0→2 spans the evolution, so a
    // footer-inferred read could drop x or null it nondeterministically
    ManifestTable.commit(spark, t, dfN((2L, "b", 5.0)), mergeSchema = true)
    val feed = ManifestTable.changes(spark, t, 0)
    assert(feed.columns.toSeq === Seq("id", "v", "x"),
      "feed schema must be the to-version recorded schema")
    val got = feed.collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    assert(got === Set((1L, "a", None), (2L, "b", Some(5.0))),
      "the evolved column's values must survive the feed read")
  }

  test("vacuum vs in-flight readers: a reader outliving retention FAILS LOUDLY, never reads wrong data (r10)") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "old"), SaveMode.Overwrite)
    ManifestTable.commit(spark, t, df(2L -> "new"), SaveMode.Overwrite)
    // an in-flight reader pinned to v1 — its plan holds v1's files
    val held = ManifestTable.read(spark, t, 1)
    assert(held.count() === 1) // live before the vacuum
    // the operator vacuums past the reader (keepLast=1, no grace):
    // v1's manifest and files are reclaimed
    ManifestTable.expire(spark, t, keepLast = 1)
    // THE CONTRACT (Delta's VACUUM stance): retention (keepLast +
    // graceMs) is the operator's promise to readers; a reader slower
    // than the window fails LOUDLY mid-action — a missing-file error,
    // never a silently empty or partial result.
    val e = intercept[Exception] { held.count() }
    def chain(x: Throwable): Seq[Throwable] =
      if (x == null) Nil else x +: chain(x.getCause)
    assert(chain(e).exists(c =>
      c.isInstanceOf[java.io.FileNotFoundException] ||
        Option(c.getMessage).exists(m =>
          m.contains("does not exist") || m.contains("FileNotFound") ||
            m.contains("not found"))),
      s"must fail as a missing-file error, got: $e")
    // the head is untouched; fresh reads keep working
    assert(ManifestTable.read(spark, t).collect()
      .map(_.getString(1)).toSeq === Seq("new"))
    // and a fresh read of the expired version fails loudly at plan time
    intercept[IllegalArgumentException] { ManifestTable.read(spark, t, 1) }
    // graceMs is the minReaderRetention guard: a vacuum with a grace
    // window longer than the reader's age reclaims NOTHING it may hold
    val t2 = freshTable()
    ManifestTable.commit(spark, t2, df(1L -> "old"), SaveMode.Overwrite)
    ManifestTable.commit(spark, t2, df(2L -> "new"), SaveMode.Overwrite)
    val held2 = ManifestTable.read(spark, t2, 1)
    ManifestTable.expire(spark, t2, keepLast = 1, graceMs = 60L * 60 * 1000)
    assert(held2.count() === 1,
      "a grace window covering the reader's lifetime must keep its files alive")
  }
}
