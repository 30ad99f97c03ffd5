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

  test("UPDATE accepts alias- and table-qualified SET targets; foreign/nested refuse") {
    import spark.implicits._
    import graft.sources.GraftCatalog
    val t = tmp("updq")
    ManifestTable.commit(spark, t,
      (1 to 6).map(i => (i.toLong, i * 1.0)).toDF("id", "v"),
      SaveMode.Overwrite, statsColumns = Seq("id"))
    GraftCatalog.register("advr12_upd", t)
    try {
      def vals: Map[Long, Double] = ManifestTable.read(spark, t).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // standard SQL: target qualified by the bare table name
      spark.sql("UPDATE graft.advr12_upd SET advr12_upd.v = 10.0D WHERE id = 1")
      assert(vals(1L) === 10.0)
      // by the full graft-qualified name
      spark.sql("UPDATE graft.advr12_upd SET graft.advr12_upd.v = 20.0D WHERE id = 2")
      assert(vals(2L) === 20.0)
      // by an explicit alias
      spark.sql("UPDATE graft.advr12_upd AS x SET x.v = 30.0D WHERE x.id = 3")
      assert(vals(3L) === 30.0)
      // a foreign qualifier and a nested path still refuse loudly
      val e1 = intercept[Exception](
        spark.sql("UPDATE graft.advr12_upd SET other.v = 1.0D WHERE id = 4"))
      assert(e1.getMessage.contains("whole top-level columns"))
      val e2 = intercept[Exception](
        spark.sql("UPDATE graft.advr12_upd SET v.nested.deep = 1.0D WHERE id = 4"))
      assert(e2.getMessage.contains("whole top-level columns"))
      assert(vals(4L) === 4.0, "refused statements must change nothing")
      // DELETE with an alias-qualified condition works the same way
      spark.sql("DELETE FROM graft.advr12_upd AS y WHERE y.id = 6")
      assert(!vals.contains(6L))
    } finally GraftCatalog.unregister("advr12_upd")
  }

  test("multi-column ALTER is statement-atomic: one version, all-or-nothing") {
    import spark.implicits._
    import graft.sources.GraftCatalog
    val t = tmp("altm")
    ManifestTable.commit(spark, t,
      Seq((1, 2.0f, "x")).toDF("a", "b", "c"), SaveMode.Overwrite)
    GraftCatalog.register("advr12_alt", t)
    try {
      def ver = ManifestTable.currentVersion(spark, t)
      def sch = ManifestTable.snapshotSchema(spark, t).get
      // two ADDs land as ONE version
      spark.sql("ALTER TABLE graft.advr12_alt ADD COLUMNS (d INT, e STRING)")
      assert(ver === 2 && sch.fieldNames.toSeq === Seq("a", "b", "c", "d", "e"))
      // a failing column ANYWHERE fails the whole statement untouched:
      // f is fine alone, but c already exists
      val before = ver
      intercept[Exception](spark.sql(
        "ALTER TABLE graft.advr12_alt ADD COLUMNS (f INT, c INT)"))
      assert(ver === before && !sch.fieldNames.contains("f"),
        "a half-failing ADD COLUMNS must leave the table untouched")
      // two widens, ONE version; a bad widen in the list fails both
      spark.sql("ALTER TABLE graft.advr12_alt ALTER COLUMN a TYPE BIGINT, b TYPE DOUBLE")
      assert(ver === 3)
      assert(sch("a").dataType.typeName === "long" &&
        sch("b").dataType.typeName === "double")
      intercept[Exception](spark.sql(
        "ALTER TABLE graft.advr12_alt ALTER COLUMN d TYPE BIGINT, c TYPE INT"))
      assert(ver === 3 && sch("d").dataType.typeName === "integer")
      // two drops, ONE version; IF EXISTS filters missing names but
      // still drops the present ones atomically
      spark.sql("ALTER TABLE graft.advr12_alt DROP COLUMNS IF EXISTS (d, e, ghost)")
      assert(ver === 4 && sch.fieldNames.toSeq === Seq("a", "b", "c"))
    } finally GraftCatalog.unregister("advr12_alt")
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
