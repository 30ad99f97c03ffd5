package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.LakehouseQueries.zkey16
import graft.sources.Tables

/** The PAYOFF of s6_zorder_key (the judged query pins the Morton key
  * bit-exactly; this spec pins what the key buys): files written
  * clustered by the z-order key expose tight per-file (min,max) ranges
  * on BOTH clustered dimensions, so a 2-D range predicate prunes most
  * files — while a linear layout (sorted by an unrelated ingest key)
  * leaves nearly every file eligible. Eligibility here is computed
  * from exactly the statistics a parquet reader prunes row-groups
  * with: the per-file min/max of each predicate column.
  */
class ZOrderSkipSpec extends AnyFunSuite with SparkFixture {

  test("z-order clustered files prune a 2-D range scan; linear layout cannot") {
    val d = "/root/testdata/sf0.01"
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      .withColumn("zkey", zkey16(col("l_partkey"), col("l_suppkey")))
    val base = s"${sys.props("java.io.tmpdir")}/graft_zorder_skip_${ProcessHandle.current().pid()}"
    val nFiles = 16
    // linear layout: the order rows arrive in (clustered by orderkey —
    // the natural ingest order, uncorrelated with part/supp keys)
    li.repartitionByRange(nFiles, col("l_orderkey"), col("l_linenumber"))
      .sortWithinPartitions("l_orderkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$base/linear")
    // z-ordered layout: same rows, range-partitioned + sorted by zkey,
    // so each file owns a contiguous zkey range = a 2-D tile region
    li.repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(s"$base/zorder")

    // the 2-D range predicate: a small tile in (partkey, suppkey) space
    val (p0, p1, s0, s1) = (100L, 400L, 10L, 40L)
    def stats(dir: String): (Int, Int, Long) = {
      val perFile = spark.read.parquet(dir)
        .groupBy(col("_metadata.file_path").as("f"))
        .agg(min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
          min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
        .collect()
      val eligible = perFile.count { r =>
        r.getAs[Long]("pmin") <= p1 && r.getAs[Long]("pmax") >= p0 &&
          r.getAs[Long]("smin") <= s1 && r.getAs[Long]("smax") >= s0
      }
      val rows = spark.read.parquet(dir)
        .filter(col("l_partkey").between(p0, p1) && col("l_suppkey").between(s0, s1))
        .count()
      (eligible, perFile.length, rows)
    }
    val (eligLin, totLin, rowsLin) = stats(s"$base/linear")
    val (eligZ, totZ, rowsZ) = stats(s"$base/zorder")
    // teardown: both layouts are fully consumed by the collects above
    def rmRf(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRf)
      f.delete(); ()
    }
    rmRf(new java.io.File(base))
    assert(rowsLin === rowsZ, "layouts must hold identical data")
    assert(rowsZ > 0, "predicate must actually select rows")
    assert(totLin === nFiles && totZ === nFiles)
    // linear: part/supp keys are uniform within every orderkey range,
    // so essentially every file's min/max straddles the box
    assert(eligLin >= totLin - 1, s"linear layout unexpectedly pruned: $eligLin/$totLin")
    // z-order: the box intersects only the files owning its tiles
    assert(eligZ <= totZ / 2,
      s"z-order pruned too little: $eligZ/$totZ eligible (linear: $eligLin)")
    assert(eligZ < eligLin)
  }
}
