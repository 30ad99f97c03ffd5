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

  test("PQ ANN and hourly gap-fill through the facade") {
    val emb = Graft.tables.embeddings(spark, sf)
    val pq = Graft.annPq(emb, col("vec_id") < 3, shortlist = 10, topK = 2).collect()
    assert(pq.nonEmpty)
    assert(pq.forall(r => r.getLong(0) != r.getLong(2))) // no self-pairs
    val ev = Graft.tables.events(spark, sf)
    val gf = Graft.gapFillHourly(ev, col("user_id") < 5)
    // every user's spine is contiguous: row count == span hours + 1
    val bad = gf.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        ((unix_millis(max(col("h"))) - unix_millis(min(col("h")))) / 3600000L + 1).as("want"))
      .filter(col("n") =!= col("want")).count()
    assert(bad === 0)
    // filled rows carry the previous observation, so v_fill is never
    // null after the first observed hour
    assert(gf.filter(col("filled") && col("v_fill").isNull).count() === 0)
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

  test("lakehouse lifecycle through the facade: commit, upsert, delete, feed, travel, compact, expire") {
    val t = java.nio.file.Files.createTempDirectory("graft_facade_tbl").toString
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val v1 = Graft.commitTable(spark, t, base,
      org.apache.spark.sql.SaveMode.Overwrite)
    assert(v1 === 1)
    Graft.upsertTable(spark, t, Seq((2L, "B"), (4L, "d")).toDF("id", "v"), Seq("id"))
    Graft.deleteFromTable(spark, t, col("id") === 3L)
    assert(Graft.readTable(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a"), (2L, "B"), (4L, "d")))
    assert(Graft.readTable(spark, t, version = v1).count() === 3) // time travel
    // the feed is churn-bounded (r8 touched-file MERGE): the mutated
    // keys' post-images are provably in it; carried-along neighbors are
    // layout-dependent, so the consumer restricts to its batch's keys
    val feed = Graft.changeFeed(spark, t, sinceVersion = v1).distinct()
      .filter(col("id").isin(2L, 4L)).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(feed.toSeq === Seq((2L, "B"), (4L, "d")))
    val vc = Graft.compactTable(spark, t, sortBy = Seq(col("id")))
    assert(Graft.readTable(spark, t, vc).count() === 3)
    Graft.expireTable(spark, t, keepLast = 1)
    assert(Graft.readTable(spark, t).count() === 3)
    // r8 surface: conditional merge, row CDF, predicate-skipping read
    val vm = Graft.mergeTable(spark, t,
      Seq((2L, "BB"), (9L, "i")).toDF("id", "v"), Seq("id"),
      whenMatchedDelete = Some(col("id") === 2L))
    assert(Graft.readTable(spark, t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
      === Seq((1L, "a"), (4L, "d"), (9L, "i")))
    val cdf = Graft.rowChangeFeed(spark, t, vm - 1, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
    assert(cdf.toSeq === Seq((2L, "delete"), (9L, "insert")))
    assert(Graft.readTableWhere(spark, t, col("id") >= 4L).collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(4L, 9L))
  }

  test("packing and extreme-scale index fallbacks through the facade") {
    val docs = Graft.tables.documents(spark, sf)
    val packed = Graft.packSequences(docs)
    assert(packed.columns.toSeq === Seq("doc_id", "n_tokens", "pack_id", "pack_offset"))
    assert(packed.count() === docs.count())
    val emb = Graft.tables.embeddings(spark, sf)
    val (codes, cent) = Graft.kmeansSampled(emb, k = 4, iters = 2, sampleCap = 30L)
    val assigned = Graft.assignTwoLevel(codes, cent, stride = 2, wProbe = 1)
    assert(assigned.select("vec_id").distinct().count() === assigned.count())
    assert(assigned.count() > 0)
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
