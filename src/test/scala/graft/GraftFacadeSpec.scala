package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The public facade: a reference user's workflow through graft.Graft. */
class GraftFacadeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("dedup + similarity + text analysis through the facade") {
    val docs = Graft.tables.documents(spark, sf)
    assert(Graft.dedupExact(docs).count() > 0)
    assert(Graft.dedupFuzzy(docs).columns.toSeq === Seq("doc_id", "dup_group"))
    val emb = Graft.tables.embeddings(spark, sf)
    val topk = Graft.cosineTopK(emb, col("vec_id") < 3, k = 2).collect()
    assert(topk.length === 6)
    val toks = docs.select(Graft.tokenCount(col("text")).as("n"),
      Graft.tokenCountBpe(col("text")).as("nb")).collect()
    assert(toks.forall(r => r.getInt(1) >= r.getInt(0))) // BPE splits punct
  }

  test("curation through the facade: scrub, split, repetition, quantize, contamination") {
    val docs = Graft.tables.documents(spark, sf)
    val pii = docs.select(
      Graft.piiCount(concat(col("text"), lit(" a@b.co"))).as("n"),
      Graft.scrubPii(concat(col("text"), lit(" a@b.co"))).as("clean"))
    assert(pii.filter(col("n") =!= 1).count() === 0)
    assert(pii.filter(col("clean").rlike("@")).count() === 0)
    val splits = docs.select(Graft.splitAssign(col("doc_id")).as("s"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(Graft.repetitionScores(docs).count() > 0)
    val emb = Graft.tables.embeddings(spark, sf)
    val q = emb.select(size(Graft.quantize(col("embedding"))).as("n")).collect()
    assert(q.forall(_.getInt(0) === 64))
    assert(Graft.contamination(docs, col("doc_id") % 7 === 0, n = 3).count() > 0)
  }

  test("facade session builder registers dot_product for SQL") {
    val prev = org.apache.spark.sql.SparkSession.getDefaultSession
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    try {
      val s = Graft.session(master = "local[2]", shufflePartitions = 2)
      val r = s.sql("SELECT dot_product(array(1.0D,2.0D), array(3.0D,4.0D)) d")
        .collect().head.getDouble(0)
      assert(r === 11.0)
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      prev.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
    }
  }
}
