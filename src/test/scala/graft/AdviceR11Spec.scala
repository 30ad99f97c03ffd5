package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** Pins the three ADVICE lows carried open through r11 (verdict item 4):
  *  1. copyInto REFUSES extra source columns instead of silently
  *     projecting them away (data loss the adjacent contract denied);
  *  2. cloneShallow treats a ledger at a version-less destination as
  *     crash debris — swept and retried, not a FileAlreadyExists dead
  *     end forever;
  *  3. bloomSidecar negative-caches ABSENT sidecars, so point lookups
  *     on a table with pre-config history stop paying O(configless
  *     uuids) stat RPCs per query (sound: a sidecar is written before
  *     the manifest that references its uuid, so absence is permanent).
  */
class AdviceR11Spec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_advr11_$tag").toString + "/t"

  test("copyInto refuses a source column the table schema lacks") {
    import spark.implicits._
    val t = tmp("cix")
    val landing = tmp("cixl")
    val df = (0 until 20).map(i => (i.toLong, s"u$i")).toDF("id", "name")
    ManifestTable.commit(spark, t, df.limit(0), SaveMode.Overwrite)
    df.withColumn("extra", lit(1)).coalesce(1)
      .write.parquet(s"$landing/b1")
    val e = intercept[IllegalArgumentException](
      ManifestTable.copyInto(spark, t, s"$landing/*"))
    assert(e.getMessage.contains("extra"), e.getMessage)
    assert(ManifestTable.currentVersion(spark, t) == 1,
      "the refused batch must not commit")
    // the fixed landing zone ingests normally
    def rmRf(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRf); f.delete(); ()
    }
    rmRf(new java.io.File(s"$landing/b1"))
    df.coalesce(1).write.parquet(s"$landing/b2")
    ManifestTable.copyInto(spark, t, s"$landing/*")
    assert(ManifestTable.read(spark, t).count() == 20)
  }

  test("cloneShallow sweeps crash debris at a version-less destination and retries") {
    import spark.implicits._
    val t = tmp("clsrc")
    val dst = tmp("cldst")
    val df = (0 until 30).map(i => (i.toLong, i * 3.0)).toDF("id", "v")
    ManifestTable.commit(spark, t, df, SaveMode.Overwrite,
      statsColumns = Seq("id"))
    // simulate the crash window: a prior clone attempt died AFTER the
    // exclusive externs create (and a copied ingest ledger) but BEFORE
    // the v1 publish — the destination has a ledger and zero manifests
    val mdir = java.nio.file.Paths.get(s"$dst/_manifests")
    java.nio.file.Files.createDirectories(mdir.resolve("ingest"))
    java.nio.file.Files.write(mdir.resolve("externs.json"),
      """{"externs":{"dead-beef":"/nowhere"}}""".getBytes("UTF-8"))
    java.nio.file.Files.write(
      mdir.resolve("ingest").resolve("debris.json"),
      """{"sources":[]}""".getBytes("UTF-8"))
    // age the debris past the staleness window (ADVICE r12): only a
    // STALE version-less ledger is debris — a fresh one could be an
    // in-flight clone (AdviceR12Spec pins that refusal)
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - ManifestTable.cloneDebrisStaleMs - 60000)
    java.nio.file.Files.setLastModifiedTime(mdir.resolve("externs.json"), old)
    // pre-fix: FileAlreadyExistsException forever; post-fix: the
    // debris is swept (it can belong to no published clone — a
    // published clone has v1) and the clone lands
    val v = ManifestTable.cloneShallow(spark, t, dst)
    assert(v == 1)
    assert(ManifestTable.read(spark, dst).count() == 30)
    // the swept debris ledger is gone — the clone's extern map is the
    // donor's, not the dead attempt's
    assert(!ManifestTable.externRoots(spark, dst).contains("dead-beef"))
  }

  test("missing bloom sidecars are negative-cached: second lookup costs zero sidecar stats") {
    import spark.implicits._
    val t = tmp("bneg")
    val df = (0 until 200).map(i => (i.toLong, s"u$i")).toDF("id", "name")
    // pre-config history: v1's files have no sidecar and never will
    ManifestTable.commit(spark, t, df.repartition(6, col("id")),
      SaveMode.Overwrite, statsColumns = Seq("id"))
    ManifestTable.addBloom(spark, t, Seq("name"), bits = 1L << 12, k = 4)
    def lookupStats(): Long = {
      val before = ManifestTable.bloomSidecarStats.get()
      ManifestTable.readWhere(spark, t, col("name") === "u17").collect()
      ManifestTable.bloomSidecarStats.get() - before
    }
    val first = lookupStats()
    assert(first >= 1,
      s"the first lookup must probe the configless uuid's sidecar once, got $first")
    val second = lookupStats()
    assert(second == 0,
      s"a repeated lookup must re-stat no absent sidecar (negative cache), got $second")
    // correctness unchanged: configless files stay conservatively kept
    assert(ManifestTable.readWhere(spark, t, col("name") === "u17")
      .collect().map(_.getLong(0)).toSeq == Seq(17L))
  }
}
