package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SimHash

/** B2 SimHash fingerprints: identical → equal, near → close, far → far. */
class SimHashSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def hashOf(texts: String*): Seq[Long] =
    texts.toDF("text").select(SimHash.simhash(col("text"))).collect().map(_.getLong(0)).toSeq

  test("identical texts hash identically; hamming(a,a)=0") {
    val Seq(a, b) = hashOf("spark makes big data simple", "spark makes big data simple")
    assert(a === b)
    val d = Seq((a, b)).toDF("x", "y")
      .select(SimHash.hamming(col("x"), col("y"))).collect().head
      .getAs[Number](0).longValue()
    assert(d === 0L)
  }

  test("near-duplicates are closer than unrelated texts") {
    val Seq(base, near, far) = hashOf(
      "the quick brown fox jumps over the lazy dog every single day",
      "the quick brown fox jumps over the lazy dog every single night",
      "orthogonal corpus describing compilers linkers loaders and assemblers")
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(base, near) < ham(base, far))
    assert(ham(base, near) <= 8) // one token changed out of twelve
  }
}
