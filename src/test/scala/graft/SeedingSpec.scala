package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** k-means seed selection (Similarity.seedTable): the driver path
  * (collect ≤ k rows) and the distributed two-phase-rank path (used
  * when k exceeds seedDriverCap) must produce the SAME seed set with
  * the SAME numbering — the fallback is exact, not approximate, so
  * crossing the cap can never change a clustering. */
class SeedingSpec extends AnyFunSuite with SparkFixture {

  private def ids(xs: Long*) = {
    import spark.implicits._
    xs.toDF("vec_id")
  }

  test("distributed seed ranking is bit-identical to the driver path") {
    // sparse, unordered, negative-including id domain
    val xe = ids(77L, -3L, 1000000L, 12L, 500L, 0L, 999999L, 13L, -100L, 42L)
    val k = 6
    val driver = Similarity.seedTable(xe, k) // k <= default cap
    val dist = Similarity.seedTable(xe, k, cap = 2) // force distributed path
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(asSet(driver) === asSet(dist))
    // the seed set is the k smallest ids numbered 0..k-1 in id order
    assert(asSet(dist) === Set((-100L, 0), (-3L, 1), (0L, 2), (12L, 3), (13L, 4), (42L, 5)))
  }

  test("distributed path handles dense ids, k larger than bucket count, duplicates") {
    import spark.implicits._
    val xe = (0L until 2000L).flatMap(i => Seq(i, i)).toDF("vec_id") // dup rows
    val k = 1500
    val dist = Similarity.seedTable(xe, k, cap = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._2)
    assert(dist.length === k)
    assert(dist.map(_._1).toSeq === (0L until 1500L))
    assert(dist.map(_._2).toSeq === (0 until 1500))
  }

  test("empty corpus yields an empty seed table on both paths") {
    val xe = ids()
    assert(Similarity.seedTable(xe, 5).count() === 0)
    assert(Similarity.seedTable(xe, 5, cap = 1).count() === 0)
  }
}
