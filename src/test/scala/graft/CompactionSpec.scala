package graft

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

/** c13_compaction's point is the FILE count, which the DuckDB oracle
  * can't see: the naive partitioned write fans every shuffle task into
  * every partition dir; the compaction rewrite leaves ~one file per
  * partition value.
  */
class CompactionSpec extends AnyFunSuite with SparkFixture {

  private def parquetFiles(dir: String): Map[String, Int] = {
    val root = new File(dir)
    assert(root.isDirectory, s"missing $dir")
    root.listFiles().filter(_.isDirectory).map { p =>
      p.getName -> p.listFiles().count(_.getName.endsWith(".parquet"))
    }.toMap
  }

  test("compaction rewrite collapses the small-file explosion to one file per partition") {
    val q = SparkEntry.queries("c13_compaction")
    q(spark, "/root/testdata/sf0.001").collect() // runs both writes
    val base = s"${sys.props("java.io.tmpdir")}/graft_c13_sf0.001"
    val raw = parquetFiles(s"$base/raw")
    val compact = parquetFiles(s"$base/compact")
    assert(raw.keySet === compact.keySet)
    // naive write: one file per (task × partition-value) it received
    assert(raw.values.sum > compact.values.sum,
      s"expected fewer files after compaction: raw=$raw compact=$compact")
    assert(compact.values.forall(_ === 1), s"compacted dirs: $compact")
  }
}
