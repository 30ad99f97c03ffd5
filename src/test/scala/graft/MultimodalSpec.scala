package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Multimodal

/** B6 multimodal decode plumbing: byte semantics, partition-wise map. */
class MultimodalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("decodeStub derives byte-based features; short payloads get null brightness") {
    val docs = Seq(
      (1L, "abcdefghijklmnop-and-more-bytes"), // 31 bytes
      (2L, "short"),                           // 5 bytes → brightness None
      (3L, "héllo wörld — multibyte test doc") // non-ASCII: bytes ≠ chars
    ).toDF("doc_id", "text")
    val out = Multimodal.decodeStub(spark, Multimodal.withPayload(docs))
      .collect().map(m => m.doc_id -> m).toMap

    assert(out(1L).n_bytes === 31)
    assert(out(1L).width === 1 + 31 % 64)
    assert(out(1L).height === 1 + (31 / 64) % 64)
    val expB = "abcdefghijklmnop".getBytes("UTF-8").map(_.toDouble).sum / 16.0 / 255.0
    assert(math.abs(out(1L).brightness.get - expB) < 1e-12)

    assert(out(2L).brightness === None)

    val bytes3 = "héllo wörld — multibyte test doc".getBytes("UTF-8")
    assert(out(3L).n_bytes === bytes3.length) // byte length, not char count
  }

  test("resizeStub preserves aspect ratio inside the box") {
    val docs = Seq((1L, "a" * 200)).toDF("doc_id", "text") // w=9, h=4
    val out = Multimodal.resizeStub(
      Multimodal.decodeStub(spark, Multimodal.withPayload(docs)), maxSide = 3)
      .collect().head
    assert(out._1 === 1L)
    assert(math.max(out._2, out._3) === 3)
    assert(out._2 >= 1 && out._3 >= 1)
  }

  test("decoded features survive downstream relational ops") {
    val docs = Seq((1L, "a" * 40), (2L, "b" * 40), (3L, "c" * 100)).toDF("doc_id", "text")
    val agg = Multimodal.decodeStub(spark, Multimodal.withPayload(docs)).toDF()
      .groupBy("width").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(agg(1 + 40 % 64) === 2L)
    assert(agg(1 + 100 % 64) === 1L)
  }
}
