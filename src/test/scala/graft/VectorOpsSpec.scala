package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorOps

/** B3/F8 vector primitives: dot/norm/cosine laws + centroid UDAF. */
class VectorOpsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("dot, norm, cosine on known vectors") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(
      VectorOps.dot(col("a"), col("b")).as("d"),
      VectorOps.norm(col("a")).as("na"),
      VectorOps.cosine(col("a"), col("b")).as("c")).collect().head
    assert(math.abs(r.getDouble(0) - 32.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-9)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-9)
  }

  test("cosine(v, v) ≈ 1 and symmetry") {
    val df = Seq((Seq(0.3f, -1.2f, 2.5f, 0.01f), Seq(1.5f, 0.2f, -0.7f, 3.0f))).toDF("a", "b")
    val r = df.select(
      VectorOps.cosine(col("a"), col("a")).as("self"),
      (VectorOps.cosine(col("a"), col("b")) - VectorOps.cosine(col("b"), col("a"))).as("asym"))
      .collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("centroid aggregates per group with partial merge") {
    val df = Seq(
      (0, Seq(1.0f, 10.0f)), (0, Seq(3.0f, 20.0f)),
      (1, Seq(5.0f, 5.0f))
    ).toDF("label", "embedding").repartition(3) // force multi-partition merge
    val out = df.groupBy("label").agg(VectorOps.centroid(col("embedding")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(0) === Seq(2.0, 15.0))
    assert(out(1) === Seq(5.0, 5.0))
  }
}
