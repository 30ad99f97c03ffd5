package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.operators.MinHash

/** Property tests (SURVEY.md §5.3.2) for the shingle/text primitives. */
object ShinglesProps extends Properties("shingles") {

  private lazy val spark = SparkFixture.session
  import spark.implicits._

  private val token = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")
  private val tokens = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, token))

  property("count = max(nTokens - 2, 1) for n=3") = forAll(tokens) { ws =>
    val text = ws.mkString(" ")
    val n = Seq(text).toDF("text")
      .select(size(MinHash.shingles(col("text"), 3))).collect().head.getInt(0)
    n == math.max(ws.length - 2, 1)
  }

  property("every 3-shingle is a substring of the text") = forAll(tokens) { ws =>
    val text = ws.mkString(" ")
    val sh = Seq(text).toDF("text")
      .select(MinHash.shingles(col("text"), 3)).collect().head.getSeq[String](0)
    sh.forall(text.contains)
  }
}
