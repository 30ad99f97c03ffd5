package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorOps

/** Native DotProduct expression: correctness vs the HOF formulation,
  * float/double mixing, null handling, codegen + interpreted paths. */
class DotProductSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the higher-order-function dot on float arrays") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(100)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val diff = df.select(
      (VectorOps.dot(col("a"), col("b")) - hofDot(col("a"), col("b"))).as("d"))
      .agg(max(abs(col("d")))).collect().head.getDouble(0)
    assert(diff === 0.0) // exact, not approximate: same accumulation order
  }

  test("mixed float/double arrays and literal planes") {
    val df = Seq(Seq(1.0f, 2.0f, 3.0f)).toDF("a")
    val plane = typedlit(Seq(0.5, -1.0, 2.0))
    val r = df.select(VectorOps.dot(col("a"), plane)).collect().head.getDouble(0)
    assert(math.abs(r - (0.5 - 2.0 + 6.0)) < 1e-12)
  }

  test("mismatched dimensions yield null (matches zip_with null-pad), both paths") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    // HOF reference: zip_with pads with null -> product null -> sum null.
    val hof = df.select(hofDot(col("a"), col("b"))).collect().head
    assert(hof.isNullAt(0))
    val gen = df.select(VectorOps.dot(col("a"), col("b"))).collect().head
    assert(gen.isNullAt(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(VectorOps.dot(col("a"), col("b"))).collect().head
      assert(interp.isNullAt(0))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null array yields null") {
    val df = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
    val r = df.select(VectorOps.dot(col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    val df = Seq((Seq(1.5f, -2.5f), Seq(4.0f, 0.5f))).toDF("a", "b")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try df.select(VectorOps.dot(col("a"), col("b"))).collect().head.getDouble(0)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val gen = df.select(VectorOps.dot(col("a"), col("b"))).collect().head.getDouble(0)
    assert(interp === gen)
    assert(math.abs(gen - (6.0 - 1.25)) < 1e-12)
  }
}
