package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Similarity}

/** Sample-trained k-means (Similarity.kmeansStateSampled) — the
  * extreme-scale fallback the SCALE.md SemDeDup/IVF notes promise:
  * centroids learn on a bounded deterministic hash-sample, the full
  * corpus only pays the assignment pass. */
class KmeansSampleSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"
  private def emb = graft.sources.Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  test("below the cap the sampled trainer IS the exact trainer (bit-identical)") {
    val (xeA, centA) = Similarity.kmeansState(emb, k = 4, iters = 2)
    val (xeB, centB) = Similarity.kmeansStateSampled(emb, k = 4, iters = 2,
      sampleCap = 1000000L)
    assert(centB.orderBy("cid", "pos").collect().toSeq
      === centA.orderBy("cid", "pos").collect().toSeq)
    assert(xeB.count() === xeA.count())
  }

  test("above the cap: bounded training set, full-corpus assignment, deterministic") {
    val cap = 60L
    val n = emb.count()
    assert(n > cap, s"fixture too small: $n")
    // the training set the trainer derives internally — bounded and
    // deterministic by the md5 thinning
    val keepRate = cap.toDouble / n
    val sampleN = emb.filter(
      Curation.hashUniform(col("vec_id"), ":kmsample") < keepRate).count()
    assert(sampleN > 0 && sampleN <= 2 * cap,
      s"hash-sample should be ~$cap rows, got $sampleN")
    val (xe, cent) = Similarity.kmeansStateSampled(emb, k = 4, iters = 2,
      sampleCap = cap)
    // centroid table is bounded model state: k × dim rows
    val dim = xe.agg(max("pos")).first().getInt(0) + 1
    assert(cent.count() <= 4L * dim)
    // EVERY corpus vector (nonzero-norm) gets exactly one cell
    val nonzero = emb.filter(graft.functions.VectorOps.norm(col("embedding")) > 0).count()
    val assigned = Similarity.cellDistances(xe, cent).filter(col("__rn") === 1)
    assert(assigned.count() === nonzero)
    assert(assigned.select("vec_id").distinct().count() === nonzero)
    // pure function of (corpus, params): a second invocation is identical
    val (_, cent2) = Similarity.kmeansStateSampled(emb, k = 4, iters = 2,
      sampleCap = cap)
    assert(cent.orderBy("cid", "pos").collect().toSeq
      === cent2.orderBy("cid", "pos").collect().toSeq)
  }

  test("sampled PQ codebook: bounded model state, every corpus vector gets m sub-codes") {
    val cap = 60L
    val subDim = 8
    val (xe, cent) = Similarity.pqStateSampled(emb, subDim = subDim, k = 16,
      iters = 2, sampleCap = cap)
    val dim = xe.agg(max("pos")).first().getInt(0) + 1
    val m = dim / subDim
    assert(cent.count() <= 16L * dim, "codebook must stay k x dim model state")
    val nonzero = emb.filter(graft.functions.VectorOps.norm(col("embedding")) > 0).count()
    val codes = Similarity.pqAssign(xe, cent)
    assert(codes.count() === nonzero * m,
      s"every vector needs exactly m=$m sub-codes")
    assert(codes.groupBy("vec_id").count().filter(col("count") =!= m).count() === 0)
    // below the cap: identical to the exact trainer
    val (_, exactCent) = Similarity.pqStateSampled(emb, subDim = subDim, k = 16,
      iters = 2, sampleCap = 1000000L)
    val (_, exactCent2) = Similarity.pqStateSampled(emb, subDim = subDim, k = 16,
      iters = 2, sampleCap = 1000000L)
    assert(exactCent.orderBy("sub", "cid", "pos").collect().toSeq
      === exactCent2.orderBy("sub", "cid", "pos").collect().toSeq)
  }
}
