package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** Pins the ADVICE r12 medium: cloneShallow's crash-debris sweep must
  * not race a concurrent clone to the same fresh destination.
  *  1. a FRESH version-less ledger is refused loudly (it is just as
  *     likely an in-flight clone as crash debris) — only a ledger
  *     older than the staleness window is swept (AdviceR11Spec pins
  *     the sweep itself, now with a backdated mtime);
  *  2. a winner whose in-flight ledger was swept in the pre-publish
  *     window verifies and REWRITES it after v1 lands — a published
  *     clone is never left ledger-less;
  *  3. a loser whose destination gained a v1 deletes NOTHING on the
  *     way out — its leftover extern entries are inert at a plain
  *     writer's table, and deleting could strand a winning clone.
  */
class AdviceR12Spec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_advr12_$tag").toString + "/t"

  private def donor(n: Int): String = {
    import spark.implicits._
    val t = tmp("donor")
    val df = (0 until n).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    ManifestTable.commit(spark, t, df, SaveMode.Overwrite,
      statsColumns = Seq("id"))
    t
  }

  test("a fresh version-less ledger is an in-flight clone, not debris: refused loudly") {
    val src = donor(10)
    val dst = tmp("fresh")
    val mdir = java.nio.file.Paths.get(s"$dst/_manifests")
    java.nio.file.Files.createDirectories(mdir)
    java.nio.file.Files.write(mdir.resolve("externs.json"),
      """{"externs":{"in-flight":"/elsewhere"}}""".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      ManifestTable.cloneShallow(spark, src, dst)
    }
    assert(e.getMessage.contains("in flight") &&
      e.getMessage.contains("staleness"),
      s"refusal must name the in-flight possibility and the window: ${e.getMessage}")
    // the in-flight ledger was NOT touched
    assert(java.nio.file.Files.exists(mdir.resolve("externs.json")))
  }

  test("winner rewrites a ledger swept mid-publish: a published clone is never ledger-less") {
    val src = donor(25)
    val dst = tmp("repair")
    val ledger = java.nio.file.Paths.get(s"$dst/_manifests/externs.json")
    ManifestTable.beforePublishLink = () => {
      // the racer's mis-judged sweep lands between our ledger create
      // and our v1 link
      java.nio.file.Files.deleteIfExists(ledger); ()
    }
    try {
      assert(ManifestTable.cloneShallow(spark, src, dst) === 1)
    } finally ManifestTable.beforePublishLink = () => ()
    assert(java.nio.file.Files.exists(ledger),
      "the winner must verify-and-rewrite its swept ledger after v1 lands")
    // extern resolution works: the clone reads the donor's bytes
    assert(ManifestTable.read(spark, dst).count() === 25)
  }

  test("loser deletes nothing once the destination has a v1") {
    import spark.implicits._
    val src = donor(10)
    val dst = tmp("loser")
    val ledger = java.nio.file.Paths.get(s"$dst/_manifests/externs.json")
    val interloper = (100 until 103).map(i => (i.toLong, s"w$i")).toDF("id", "w")
    ManifestTable.beforePublishLink = () => {
      // a plain writer claims the fresh path's v1 while our clone is
      // mid-publish; fire once (the interloper passes this seam too)
      ManifestTable.beforePublishLink = () => ()
      ManifestTable.commit(spark, dst, interloper)
    }
    try {
      intercept[IllegalStateException] {
        ManifestTable.cloneShallow(spark, src, dst)
      }
    } finally ManifestTable.beforePublishLink = () => ()
    // the loser left the winner's table fully intact — and its own
    // leftover extern entries are inert (no winner uuid matches them)
    assert(java.nio.file.Files.exists(ledger),
      "cleanup must not delete once a v1 exists at the destination")
    assert(ManifestTable.read(spark, dst).count() === 3)
    assert(ManifestTable.currentVersion(spark, dst) === 1)
  }
}
