package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch accuracy (g11) and ANN recall quality (b4 variants) —
  * approximate operators need measured error bounds, not just "runs". */
class AggSketchSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.01"

  test("g11: HLL user estimate within 5% of exact per event_type") {
    val approx = SparkEntry.queries("g11_sketches")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("ANN recall@3 vs exact cosine top-k") {
    def neighbors(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val exact = SparkEntry.queries("b3_cosine_topk")(spark, sf)
      .filter(col("rnk") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    // floors set from measured values (LSH 0.87 with Hamming-1
    // multi-probe — was 0.37 single-probe; IVF 0.90) minus margin.
    for ((name, floor) <- Seq("b4_lsh_ann" -> 0.6, "b4_ivf_ann" -> 0.5)) {
      val approx = neighbors(name)
      val recalls = exact.toSeq.map { case (q, truth) =>
        approx.get(q).map(a => a.intersect(truth).size.toDouble / truth.size).getOrElse(0.0)
      }
      val mean = recalls.sum / recalls.length
      info(f"$name mean recall@3 = $mean%.2f over ${recalls.length} queries")
      assert(mean >= floor, f"$name mean recall@3 $mean%.2f below floor $floor")
    }
  }
}
