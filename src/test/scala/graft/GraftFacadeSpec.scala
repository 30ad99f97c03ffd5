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
