package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** CHECK constraints (sources/ManifestTable.scala addConstraint /
  * dropConstraint / checkConstraints): table-level invariants recorded
  * in the manifest, validated BEFORE any data is written, carried by
  * every publish path, restored with the table state — the Delta
  * `ALTER TABLE ADD CONSTRAINT` contract. */
class ConstraintSpec extends AnyFunSuite with SparkFixture {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_checks").toString

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "v")
  }

  test("addConstraint validates the existing table; violating tables are refused") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", -5L -> "neg"))
    val e = intercept[IllegalArgumentException] {
      ManifestTable.addConstraint(spark, t, "id_positive", "id > 0")
    }
    assert(e.getMessage.contains("id_positive"))
    assert(ManifestTable.currentVersion(spark, t) === 1, "refused add commits nothing")
    ManifestTable.deleteWhere(spark, t, col("id") < 0)
    assert(ManifestTable.addConstraint(spark, t, "id_positive", "id > 0") === 3)
    assert(ManifestTable.checkConstraints(spark, t) === Map("id_positive" -> "id > 0"))
  }

  test("commit enforces CHECK before writing: a refused batch leaves no version and no garbage") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    ManifestTable.addConstraint(spark, t, "id_positive", "id > 0")
    ManifestTable.commit(spark, t, df(2L -> "ok"))
    val dirsBefore = new java.io.File(t, "data").listFiles().map(_.getName).toSet
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t, df(-9L -> "bad"))
    }
    assert(ManifestTable.currentVersion(spark, t) === 3)
    val dirsAfter = new java.io.File(t, "data").listFiles().map(_.getName).toSet
    assert(dirsAfter === dirsBefore, "refusal must happen before any data lands")
  }

  test("SQL CHECK null semantics: NULL passes, only FALSE violates") {
    val t = freshTable()
    import spark.implicits._
    ManifestTable.commit(spark, t,
      Seq((Some(1L), "a")).toDF("id", "v"))
    ManifestTable.addConstraint(spark, t, "id_positive", "id > 0")
    // a null id makes `id > 0` NULL — the standard says that PASSES
    ManifestTable.commit(spark, t,
      Seq((None: Option[Long], "nullrow")).toDF("id", "v"))
    assert(ManifestTable.read(spark, t).count() === 2)
  }

  test("merge enforces CHECK on the post-image") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a", 2L -> "b"))
    ManifestTable.addConstraint(spark, t, "no_junk", "v != 'junk'")
    ManifestTable.upsert(spark, t, df(1L -> "fine"), Seq("id"))
    intercept[IllegalArgumentException] {
      ManifestTable.upsert(spark, t, df(2L -> "junk", 7L -> "ok"), Seq("id"))
    }
    val got = ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(1L -> "fine", 2L -> "b"), "refused merge changes nothing")
  }

  test("constraints are carried by every publish path and dropped explicitly") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    ManifestTable.addConstraint(spark, t, "id_positive", "id > 0")
    ManifestTable.commit(spark, t, df(2L -> "b"))
    ManifestTable.upsert(spark, t, df(1L -> "A"), Seq("id"))
    ManifestTable.deleteWhere(spark, t, col("id") === 2L)
    ManifestTable.compact(spark, t, targetFiles = 1)
    ManifestTable.commit(spark, t, df(3L -> "c"))
    ManifestTable.compactSmall(spark, t, minFileBytes = 5000)
    assert(ManifestTable.checkConstraints(spark, t) ===
      Map("id_positive" -> "id > 0"),
      "every writer path must carry the constraint forward")
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t, df(-1L -> "bad"))
    }
    ManifestTable.dropConstraint(spark, t, "id_positive")
    ManifestTable.commit(spark, t, df(-1L -> "now ok"))
    assert(ManifestTable.read(spark, t).filter(col("id") === -1L).count() === 1)
  }

  test("restore brings back the target version's constraint set") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a")) // v1: unconstrained
    ManifestTable.addConstraint(spark, t, "id_positive", "id > 0") // v2
    ManifestTable.restore(spark, t, 1) // v3: v1's state, constraint gone
    assert(ManifestTable.checkConstraints(spark, t) === Map.empty)
    ManifestTable.commit(spark, t, df(-2L -> "fine"))
    assert(ManifestTable.read(spark, t).count() === 2)
  }

  test("arbitrary SQL text round-trips through the manifest") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    val gnarly = """v NOT IN ('bad "quote"', 'worse\path', 'comma,brace}')"""
    ManifestTable.addConstraint(spark, t, "gnarly name, quoted \"x\"", gnarly)
    assert(ManifestTable.checkConstraints(spark, t) ===
      Map("gnarly name, quoted \"x\"" -> gnarly))
    intercept[IllegalArgumentException] {
      ManifestTable.commit(spark, t, df(9L -> "comma,brace}"))
    }
  }

  test("a constraint added mid-derive forces the merge to re-validate, not carry") {
    val t = freshTable()
    ManifestTable.commit(spark, t, df(1L -> "a"))
    var fired = false
    var inside = false
    ManifestTable.beforeConditionalCommit = () => {
      if (!fired && !inside) {
        fired = true; inside = true
        try ManifestTable.addConstraint(spark, t, "no_junk", "v != 'junk'")
        finally inside = false
      }
    }
    try {
      // the merge derived and validated BEFORE the constraint existed;
      // reconcile must refuse (constraint sets differ) and the
      // re-derive must then reject the batch under the new constraint
      intercept[IllegalArgumentException] {
        ManifestTable.upsert(spark, t, df(5L -> "junk"), Seq("id"))
      }
    } finally ManifestTable.beforeConditionalCommit = () => ()
    val got = ManifestTable.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got === Map(1L -> "a"))
    assert(ManifestTable.checkConstraints(spark, t) === Map("no_junk" -> "v != 'junk'"))
  }
}
