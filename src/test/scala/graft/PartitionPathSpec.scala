package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.ManifestTable

/** r19 optimization: partition columns derived from
  * `_metadata.file_path` go through the fused, per-file-memoized
  * graft.functions.PartitionPathValue instead of the per-row
  * regexp + double-url_decode chain. These tests pin equality of the
  * two paths (`-Dgraft.partPathFused=false` pins the chain) across the
  * writer's whole escaping surface. */
class PartitionPathSpec extends AnyFunSuite with SparkFixture {

  private def fresh(): String =
    java.nio.file.Files.createTempDirectory("graft_ppath").toString

  private def withFused[A](on: Boolean)(body: => A): A = {
    val k = "graft.partPathFused"
    val old = sys.props.get(k)
    sys.props(k) = on.toString
    try body finally old match {
      case Some(v) => sys.props(k) = v
      case None => sys.props -= k
    }
  }

  test("fused partition derivation equals the built-in chain on adversarial values") {
    import spark.implicits._
    // every escaping hazard: space, '+', '%', '=', '/', ':', unicode,
    // a value that LOOKS like the null marker's neighbor, and NULL
    // (written as __HIVE_DEFAULT_PARTITION__)
    // (a unicode value is not writable on this JVM's POSIX file
    // encoding — an FS limit predating this change — so the unicode
    // decode path is pinned at the expression level instead, via the
    // %-escaped spelling "%C3%BC" below)
    val vals = Seq("plain", "with space", "a+b", "50%off", "k=v", "a/b",
      "c:d", "%C3%BC", "a++b", "__HIVE_DEFAULT_partition__", null)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "k")
    val t = fresh()
    ManifestTable.commit(spark, t, df, SaveMode.Overwrite,
      partitionBy = Seq("k"))
    def readAll(fused: Boolean): Seq[(Long, Option[String])] = withFused(fused) {
      ManifestTable.read(spark, t).select("id", "k").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq.sortBy(_._1)
    }
    val a = readAll(true)
    val b = readAll(false)
    assert(a === b)
    // and both must round-trip the written values exactly
    assert(a === vals.zipWithIndex.map { case (v, i) => (i.toLong, Option(v)) })
  }

  test("typed (non-string) partition values derive identically") {
    import spark.implicits._
    val df = (1 to 40).map(i => (i.toLong, i % 4, java.sql.Date.valueOf(f"202${i % 3}%d-01-0${i % 9 + 1}%d")))
      .toDF("id", "bucket", "d")
    val t = fresh()
    ManifestTable.commit(spark, t, df, SaveMode.Overwrite,
      partitionBy = Seq("bucket", "d"))
    def sums(fused: Boolean) = withFused(fused) {
      ManifestTable.read(spark, t)
        .groupBy("bucket").agg(count(lit(1)).as("n"), max("d").as("mx"))
        .orderBy("bucket").collect().map(_.toSeq).toSeq
    }
    assert(sums(true) === sums(false))
  }
}
