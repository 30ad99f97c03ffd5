package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** COPY INTO — idempotent file ingestion (sources/ManifestTable.scala
  * copyInto): each landing file is consumed exactly once, re-runs
  * no-op, the ledger survives compactions and version expiry, orphan
  * ledgers of lost-race ingests are never read and get swept, and an
  * overwritten landing file re-ingests as new content. */
class CopyIntoSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_copy").toString

  private def df(lo: Int, hi: Int): DataFrame = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"v$i")).toDF("id", "v")
  }

  private def land(dir: String, name: String, d: DataFrame): Unit = {
    // one plain parquet file per landing batch, stable name
    val tmp = java.nio.file.Files.createTempDirectory("graft_land_tmp").toString
    d.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(dir, name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  test("ingests each landing file once; re-runs are no-ops; new files ingest incrementally") {
    val landing = freshDir(); val t = freshDir()
    land(landing, "a.parquet", df(0, 100))
    land(landing, "b.parquet", df(100, 150))
    val v1 = ManifestTable.copyInto(spark, t, s"$landing/*.parquet")
    assert(v1 === 1)
    assert(ManifestTable.read(spark, t).count() === 150L)
    // exact re-run: no new version, no new rows
    assert(ManifestTable.copyInto(spark, t, s"$landing/*.parquet") === 1)
    assert(ManifestTable.read(spark, t).count() === 150L)
    // a third landing file arrives: only IT is ingested
    land(landing, "c.parquet", df(150, 170))
    val v2 = ManifestTable.copyInto(spark, t, s"$landing/*.parquet")
    assert(v2 === 2)
    assert(ManifestTable.read(spark, t).count() === 170L)
    assert(ManifestTable.read(spark, t).select("id").distinct().count() === 170L,
      "no row ingested twice")
  }

  test("the ledger survives compaction and expiry of the ingesting version") {
    val landing = freshDir(); val t = freshDir()
    land(landing, "a.parquet", df(0, 50))
    ManifestTable.copyInto(spark, t, s"$landing/*.parquet",
      statsColumns = Seq("id"))
    ManifestTable.compact(spark, t, targetFiles = 1) // rewrites every file
    ManifestTable.expire(spark, t, keepLast = 1)     // drops the ingest version
    // the memory is table state, not file state: still a no-op
    assert(ManifestTable.copyInto(spark, t, s"$landing/*.parquet") ===
      ManifestTable.currentVersion(spark, t))
    assert(ManifestTable.read(spark, t).count() === 50L)
  }

  test("an overwritten landing file re-ingests as new content") {
    val landing = freshDir(); val t = freshDir()
    land(landing, "a.parquet", df(0, 10))
    ManifestTable.copyInto(spark, t, s"$landing/*.parquet")
    Thread.sleep(5) // ensure a distinct mtime
    land(landing, "a.parquet", df(10, 30))
    ManifestTable.copyInto(spark, t, s"$landing/*.parquet")
    // both generations' rows are present (append semantics)
    assert(ManifestTable.read(spark, t).count() === 30L)
  }

  test("schema discipline: a divergent landing file is refused before any write") {
    val landing = freshDir(); val t = freshDir()
    land(landing, "a.parquet", df(0, 10))
    ManifestTable.copyInto(spark, t, s"$landing/*.parquet")
    val landing2 = freshDir()
    import spark.implicits._
    land(landing2, "bad.parquet",
      Seq((1, "x", 3.0)).toDF("id", "v", "extra"))
    intercept[IllegalArgumentException] {
      ManifestTable.copyInto(spark, t, s"$landing2/*.parquet")
    }
    assert(ManifestTable.read(spark, t).count() === 10L)
  }

  test("expire sweeps orphan ledgers; referenced ones stay") {
    val landing = freshDir(); val t = freshDir()
    land(landing, "a.parquet", df(0, 10))
    ManifestTable.copyInto(spark, t, s"$landing/*.parquet")
    // plant an orphan (a crashed ingest's leftover)
    val orphan = new java.io.File(t, "_manifests/ingest/orphan.json")
    java.nio.file.Files.write(orphan.toPath,
      """{"sources":[{"p":"/nope","l":1,"m":1}]}""".getBytes)
    ManifestTable.expire(spark, t, keepLast = 1)
    val left = new java.io.File(t, "_manifests/ingest").listFiles()
      .filter(_.getName.endsWith(".json")).map(_.getName).toSeq
    assert(!left.contains("orphan.json"), "orphan ledger must be swept")
    assert(left.size === 1, "the referenced ledger must survive")
    // and the orphan never poisoned the dedup set
    land(landing, "b.parquet", df(10, 20))
    ManifestTable.copyInto(spark, t, s"$landing/*.parquet")
    assert(ManifestTable.read(spark, t).count() === 20L)
  }

  test("a shallow clone carries the ingestion memory — no re-ingest doubling") {
    val landing = freshDir(); val src = freshDir(); val dst = freshDir()
    land(landing, "a.parquet", df(0, 30))
    ManifestTable.copyInto(spark, src, s"$landing/*.parquet")
    ManifestTable.cloneShallow(spark, src, dst)
    // the exact same command against the CLONE must be a no-op …
    assert(ManifestTable.copyInto(spark, dst, s"$landing/*.parquet") === 1)
    assert(ManifestTable.read(spark, dst).count() === 30L)
    // … while a genuinely new landing file still ingests
    land(landing, "b.parquet", df(30, 40))
    ManifestTable.copyInto(spark, dst, s"$landing/*.parquet")
    assert(ManifestTable.read(spark, dst).count() === 40L)
    assert(ManifestTable.read(spark, src).count() === 30L, "donor untouched")
  }

  test("two concurrent copyInto runs of one landing zone ingest each source once") {
    val landing = freshDir(); val t = freshDir()
    (0 until 6).foreach(i => land(landing, s"f$i.parquet",
      df(i * 100, i * 100 + 100)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val tasks = (0 until 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int =
            ManifestTable.copyInto(spark, t, s"$landing/*.parquet",
              maxAttempts = 10)
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    // whatever the interleaving: every row exactly once
    assert(ManifestTable.read(spark, t).count() === 600L)
    assert(ManifestTable.read(spark, t).select("id").distinct().count() === 600L,
      "a lost-race ingest must not double any source file")
    // and a third run is a strict no-op
    val v = ManifestTable.currentVersion(spark, t)
    assert(ManifestTable.copyInto(spark, t, s"$landing/*.parquet") === v)
  }

  test("copyInto into a hidden-partitioned table derives the layout") {
    val landing = freshDir(); val t = freshDir()
    import spark.implicits._
    ManifestTable.commit(spark, t, df(0, 40),
      org.apache.spark.sql.SaveMode.Overwrite,
      partitionBy = Seq("bucket(4,id)"))
    land(landing, "more.parquet", df(1000, 1040))
    ManifestTable.copyInto(spark, t, s"$landing/*.parquet")
    assert(ManifestTable.read(spark, t).count() === 80L)
    assert(ManifestTable.snapshotFiles(spark, t).forall(_.contains("id_bucket=")),
      "ingested files must land under the hidden layout")
    val hit = ManifestTable.readWhere(spark, t, col("id") === 1005L)
    assert(hit.count() === 1L)
    assert(hit.inputFiles.length <
      ManifestTable.snapshotFiles(spark, t).size)
  }
}
