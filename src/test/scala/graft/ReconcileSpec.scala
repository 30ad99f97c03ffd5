package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** Deterministic commit-reconciliation drills (the Delta
  * OptimisticTransaction shape, sources/ManifestTable.scala
  * reconcilePublish): a conditional writer that loses its commit race
  * republishes its already-derived result when the interleaved commits
  * are file- and key-disjoint, and falls back to a full re-derive
  * exactly when they are not. The `beforeConditionalCommit` seam fires
  * an interloper commit at the precise race point, so each path runs
  * deterministically; the spec counts derive attempts to tell a
  * reconcile (1) from a re-derive (2). The stochastic twin — liveness
  * under a sustained append+merge+OPTIMIZE storm — is Stress
  * `maintenance_drill`. */
class ReconcileSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_reconcile").toString

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  private def headMap(t: String): Map[Long, String] =
    ManifestTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  /** Run `body` with `interloper` fired once, at the first
    * conditional-commit point; returns (result, deriveAttempts).
    * Hook calls made BY the interloper itself don't count (an
    * interloper upsert passes the same seam). */
  private def raced[A](interloper: => Unit)(body: => A): (A, Int) = {
    var attempts = 0
    var fired = false
    var inside = false
    ManifestTable.beforeConditionalCommit = () => {
      if (!inside) {
        attempts += 1
        if (!fired) {
          fired = true; inside = true
          try interloper finally inside = false
        }
      }
    }
    try { val r = body; (r, attempts) }
    finally ManifestTable.beforeConditionalCommit = () => ()
  }

  test("merge reconciles a key-disjoint interleaved append: one derive, both effects land") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"),
      statsColumns = Seq("id"))
    val (v, attempts) = raced {
      ManifestTable.commit(spark, t, df(10L -> "x"))
    } {
      ManifestTable.upsert(spark, t, df(1L -> "A", 5L -> "ins"), Seq("id"))
    }
    assert(v === 3, "merge must serialize after the interloper's v2")
    assert(attempts === 1,
      s"key-disjoint interleave must reconcile, not re-derive (saw $attempts derives)")
    assert(headMap(t) === Map(1L -> "A", 2L -> "b", 5L -> "ins", 10L -> "x"))
  }

  test("merge re-derives when the interleaved commit holds one of its source keys") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    val (v, attempts) = raced {
      // interloper inserts the very key this merge carries: carrying the
      // stale derivation would DUPLICATE key 5 (the merge classified it
      // as an insert against a snapshot that didn't have it)
      ManifestTable.commit(spark, t, df(5L -> "other"))
    } {
      ManifestTable.upsert(spark, t, df(5L -> "mine"), Seq("id"))
    }
    assert(v === 3)
    assert(attempts === 2,
      s"a source-key conflict must force a re-derive (saw $attempts derives)")
    assert(headMap(t) === Map(1L -> "a", 5L -> "mine"))
    assert(ManifestTable.read(spark, t).filter(col("id") === 5L).count() === 1,
      "re-derive must reclassify the insert as an update — never duplicate the key")
  }

  test("deleteWhere reconciles an append whose rows can't match the predicate") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "del", 2L -> "keep"))
    val (v, attempts) = raced {
      ManifestTable.commit(spark, t, df(10L -> "keep2"))
    } {
      ManifestTable.deleteWhere(spark, t, col("id") === 1L)
    }
    assert(v === 3)
    assert(attempts === 1,
      s"non-matching interleave must reconcile (saw $attempts derives)")
    assert(headMap(t) === Map(2L -> "keep", 10L -> "keep2"))
  }

  test("deleteWhere re-derives when interleaved rows match the predicate") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "keep", 8L -> "del"))
    val (v, attempts) = raced {
      ManifestTable.commit(spark, t, df(9L -> "alsoDel"))
    } {
      ManifestTable.deleteWhere(spark, t, col("id") >= 8L)
    }
    assert(v === 3)
    assert(attempts === 2,
      s"matching interleaved rows must force a re-derive (saw $attempts derives)")
    // the delete serializes AFTER the append: the interloper's matching
    // row is deleted too — a carried publish would have left it alive
    assert(headMap(t) === Map(1L -> "keep"))
  }

  test("replaceWhere reconciles a region-disjoint interleaved append") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "old", 20L -> "keep"))
    val (v, attempts) = raced {
      ManifestTable.commit(spark, t, df(30L -> "other"))
    } {
      ManifestTable.replaceWhere(spark, t, col("id") < 10L,
        df(1L -> "new", 2L -> "new2"))
    }
    assert(v === 3, "replace must serialize after the interloper's v2")
    assert(attempts === 1,
      s"region-disjoint interleave must reconcile, not re-derive (saw $attempts derives)")
    assert(headMap(t) === Map(1L -> "new", 2L -> "new2",
      20L -> "keep", 30L -> "other"))
  }

  test("replaceWhere re-derives when interleaved rows fall inside the region") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "old", 20L -> "keep"))
    val (v, attempts) = raced {
      ManifestTable.commit(spark, t, df(2L -> "inRegion"))
    } {
      ManifestTable.replaceWhere(spark, t, col("id") < 10L,
        df(1L -> "new"))
    }
    assert(v === 3)
    assert(attempts === 2,
      s"in-region interleaved rows must force a re-derive (saw $attempts derives)")
    // the replace serializes AFTER the append: the interloper's
    // in-region row is replaced away too — a carried publish would
    // have leaked it into the reloaded region
    assert(headMap(t) === Map(1L -> "new", 20L -> "keep"))
  }

  test("updateWhere reconciles an append whose rows can't match the predicate") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "old", 2L -> "keep"))
    val (v, attempts) = raced {
      ManifestTable.commit(spark, t, df(10L -> "other"))
    } {
      ManifestTable.updateWhere(spark, t,
        Seq("v" -> lit("new")), col("id") === 1L)
    }
    assert(v === 3, "update must serialize after the interloper's v2")
    assert(attempts === 1,
      s"non-matching interleave must reconcile, not re-derive (saw $attempts derives)")
    assert(headMap(t) === Map(1L -> "new", 2L -> "keep", 10L -> "other"))
  }

  test("updateWhere re-derives when interleaved rows match the predicate") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "keep", 8L -> "old"))
    val (v, attempts) = raced {
      ManifestTable.commit(spark, t, df(9L -> "alsoOld"))
    } {
      ManifestTable.updateWhere(spark, t,
        Seq("v" -> lit("new")), col("id") >= 8L)
    }
    assert(v === 3)
    assert(attempts === 2,
      s"matching interleaved rows must force a re-derive (saw $attempts derives)")
    // the update serializes AFTER the append: the interloper's matching
    // row is updated too — a carried publish would have silently
    // missed it (the lost-update anomaly the conflicts closure exists
    // to prevent)
    assert(headMap(t) === Map(1L -> "keep", 8L -> "new", 9L -> "new"))
  }

  test("updateWhere re-derives when the interloper rewrote a victim file") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "old", 2L -> "keep"))
    val (v, attempts) = raced {
      // the interloper upserts the very row this update targets: its
      // rewrite replaces the victim file, so carrying the stale
      // derivation would resurrect the pre-upsert image of key 1
      ManifestTable.upsert(spark, t, df(1L -> "upserted"), Seq("id"))
    } {
      ManifestTable.updateWhere(spark, t,
        Seq("v" -> lit("new")), col("id") === 1L)
    }
    assert(v === 3)
    assert(attempts === 2,
      s"a victim-file rewrite must force a re-derive (saw $attempts derives)")
    // serialized order: upsert lands v2, then the update applies to it
    assert(headMap(t) === Map(1L -> "new", 2L -> "keep"))
  }

  test("compact reconciles an interleaved append: compacted base plus carried new files") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    ManifestTable.commit(spark, t, df(2L -> "b"))
    val (v, attempts) = raced {
      ManifestTable.commit(spark, t, df(3L -> "c"))
    } {
      ManifestTable.compact(spark, t, targetFiles = 1)
    }
    assert(v === 4)
    assert(attempts === 1)
    assert(headMap(t) === Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // the interloper's files ride along uncompacted (the Delta
    // OPTIMIZE-vs-ingest rule: they are merely not yet compacted)
    val interloperFiles = ManifestTable.snapshotFiles(spark, t, 3).toSet --
      ManifestTable.snapshotFiles(spark, t, 2).toSet
    val headFiles = ManifestTable.snapshotFiles(spark, t, 4).toSet
    assert(interloperFiles.subsetOf(headFiles),
      "reconciled OPTIMIZE must carry the interloper's files by reference")
    assert((headFiles -- interloperFiles).size === 1,
      "the compacted base must be the single target file")
  }

  test("compact aborts loudly when the interleaved commit rewrote a base file") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    val ((), attempts) = raced {
      ManifestTable.upsert(spark, t, df(1L -> "UP"), Seq("id"))
    } {
      intercept[java.util.ConcurrentModificationException] {
        ManifestTable.compact(spark, t, targetFiles = 1)
      }
      ()
    }
    assert(attempts === 1)
    // the upsert's image survives untouched, and the aborted compaction
    // deleted its own data dir on the way out: only referenced uuid
    // dirs remain on disk
    assert(headMap(t) === Map(1L -> "UP", 2L -> "b"))
    val referenced = (1 to ManifestTable.currentVersion(spark, t))
      .flatMap(v => ManifestTable.snapshotFiles(spark, t, v))
      .map(_.split("/")(1)).toSet
    val onDisk = new java.io.File(t, "data").listFiles().map(_.getName).toSet
    assert(onDisk === referenced,
      "an aborted compaction must not leave an orphan data dir behind")
  }

  test("a BY SOURCE delete merge re-derives on ANY interleaved append") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"),
      statsColumns = Seq("id"))
    val (v, attempts) = raced {
      // the appended row's key is NOT in the merge source — a plain
      // merge would reconcile, but a BY SOURCE delete serialized after
      // the append must delete this very row
      ManifestTable.commit(spark, t, df(10L -> "x"))
    } {
      ManifestTable.merge(spark, t, df(1L -> "A"), Seq("id"),
        whenNotMatchedBySourceDelete =
          Some(org.apache.spark.sql.functions.lit(true)))
    }
    assert(v === 3)
    assert(attempts === 2,
      s"BY SOURCE delete must re-derive on an interleaved append (saw $attempts)")
    assert(headMap(t) === Map(1L -> "A"),
      "serialized after the append, the BY SOURCE delete must remove id=10 too")
  }

  test("merge reconciles across SEVERAL interleaved commits in one republish") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"), statsColumns = Seq("id"))
    val (v, attempts) = raced {
      ManifestTable.commit(spark, t, df(20L -> "x"))
      ManifestTable.commit(spark, t, df(30L -> "y"))
    } {
      ManifestTable.upsert(spark, t, df(1L -> "A"), Seq("id"))
    }
    assert(v === 4, "merge must land right after both interloper commits")
    assert(attempts === 1)
    assert(headMap(t) === Map(1L -> "A", 20L -> "x", 30L -> "y"))
  }
}
