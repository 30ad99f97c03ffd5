package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior: operators must terminate cleanly (empty
  * or partial results, never throw) on empty frames, under-populated
  * clusters, unmatched stages, and single-row corpora — the states a
  * 100 TB pipeline hits on its first/last shard of the day.
  */
class EdgeCaseSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def events(rows: (Long, String, Long, String, Double)*) =
    rows.map { case (id, t, u, tpe, v) =>
      (id, java.sql.Timestamp.valueOf(t), u, tpe, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("sessionize on an empty frame yields no sessions") {
    val empty = events().filter(lit(false))
    assert(graft.operators.Analytics.sessionize(empty).count() === 0)
  }

  test("funnel with a stage type that never occurs reports stage 0 for every user") {
    val ev = events(
      (1L, "2026-01-01 10:00:00", 1L, "view", 1.0),
      (2L, "2026-01-01 10:01:00", 2L, "click", 1.0))
    val out = graft.operators.Analytics.funnel(ev, Seq("nope"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 0, 2L -> 0))
  }

  test("kmeans with fewer vectors than k terminates with the populated clusters") {
    val vecs = Seq(
      (0L, Array.fill(4)(1.0f)),
      (1L, Array.fill(4)(-1.0f))).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.kmeansQuantized(vecs, k = 4, iters = 2)
      .collect()
    assert(out.map(_.getLong(1)).sum === 2L)
    assert(out.length <= 4)
  }

  test("ivfVerified with fewer vectors than k still returns each query's neighbors") {
    val vecs = Seq(
      (0L, Array.fill(4)(1.0f)),
      (1L, Array(1.0f, 1.0f, 1.0f, 0.9f)),
      (2L, Array.fill(4)(-1.0f))).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity
      .ivfVerified(vecs, col("vec_id") < 3, k = 4, iters = 2, nProbe = 2)
      .collect()
    // every query finds at least its probed-cell co-members; no self-pairs
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) != r.getLong(2)))
  }

  test("ivfVerified with an empty query set is empty, not a crash") {
    val vecs = Seq(
      (0L, Array.fill(4)(1.0f)),
      (1L, Array.fill(4)(-1.0f))).toDF("vec_id", "embedding")
    assert(graft.operators.Similarity
      .ivfVerified(vecs, lit(false), k = 2, iters = 1).count() === 0)
  }

  test("pqVerified under-populated codebook (k > corpus) still answers; no self-pairs") {
    val vecs = Seq(
      (0L, Array.fill(8)(1.0f)),
      (1L, Array(1.0f, 1.0f, 1.0f, 0.9f, 1.0f, 1.0f, 1.0f, 0.9f)),
      (2L, Array.fill(8)(-1.0f))).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity
      .pqVerified(vecs, col("vec_id") < 3, subDim = 4, k = 16, iters = 2,
        shortlist = 10, topK = 2)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) != r.getLong(2)))
    // 0 and 1 are near-identical, 2 is their antipode: each of 0/1 must
    // rank the other first by the exact-dot refine
    val first = out.filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(first(0L) === 1L && first(1L) === 0L)
  }

  test("pqVerified with an empty query set is empty, not a crash") {
    val vecs = Seq(
      (0L, Array.fill(8)(1.0f)),
      (1L, Array.fill(8)(-1.0f))).toDF("vec_id", "embedding")
    assert(graft.operators.Similarity
      .pqVerified(vecs, lit(false), subDim = 4, k = 2, iters = 1).count() === 0)
  }

  test("maxSimTopK with an empty query set is empty, not a crash") {
    val vecs = Seq(
      (0L, Array.fill(16)(1.0f)),
      (1L, Array.fill(16)(-1.0f))).toDF("vec_id", "embedding")
    assert(graft.operators.Similarity
      .maxSimTopK(vecs, lit(false), subDim = 8).count() === 0)
  }

  test("maxSimTopK on a 2-vector corpus returns the single cross pair both ways") {
    val vecs = Seq(
      (0L, Array.fill(16)(1.0f)),
      (1L, Array.fill(16)(1.0f))).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity
      .maxSimTopK(vecs, lit(true), subDim = 8, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSet === Set((0L, 1L, out.head._3), (1L, 0L, out.head._3)))
    // identical unit-ish vectors: score = m × subDim × code² > 0
    assert(out.head._3 > 0L)
  }

  test("LSH candidate pairs on a single-doc corpus is empty") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    assert(graft.operators.MinHash.candidatePairs(docs, "doc_id", "text").count() === 0)
  }

  test("curation pipeline with no qualifying language returns an empty rollup") {
    val docs = Seq((1L, "some text here", "fr", "src"))
      .toDF("doc_id", "text", "lang", "source")
    assert(graft.operators.Curation.pipeline(docs).count() === 0)
  }

  test("weighted-sample key is null-safe on the empty corpus") {
    val docs = Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "n_chars")
    val out = docs.withColumn("key",
      round(-log(graft.operators.Curation.hashUniform(col("doc_id"), ":t")) /
        col("n_chars").cast("double"), 9))
      .orderBy("key").limit(5)
    assert(out.count() === 0)
  }
}
