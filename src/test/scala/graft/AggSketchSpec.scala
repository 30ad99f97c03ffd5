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
    // multi-probe — was 0.37 single-probe; IVF 0.90; oracle-checked
    // IVF twin 0.90 — int8-dot rerank ≈ cosine on the normalized
    // codes; PQ 0.93 with the top-100 ADC shortlist reranked exactly
    // — raw ADC order alone measured 0.23) minus margin.
    // composed IVF+PQ measured 0.83: it pays BOTH approximations
    // (probed-cell pruning AND code quantization), the price of
    // scanning only probed cells through m-byte codes.
    for ((name, floor) <- Seq("b4_lsh_ann" -> 0.6, "b4_ivf_ann" -> 0.5,
        "b4_ivf_verified" -> 0.6, "b4_pq_verified" -> 0.7,
        "b4_ivfpq_verified" -> 0.6)) {
      val approx = neighbors(name)
      val recalls = exact.toSeq.map { case (q, truth) =>
        approx.get(q).map(a => a.intersect(truth).size.toDouble / truth.size).getOrElse(0.0)
      }
      val mean = recalls.sum / recalls.length
      info(f"$name mean recall@3 = $mean%.2f over ${recalls.length} queries")
      assert(mean >= floor, f"$name mean recall@3 $mean%.2f below floor $floor")
    }
  }

  test("g16: unioned per-type HLL sketches estimate global distinct within 5%") {
    val row = SparkEntry.queries("g16_hll_merge")(spark, sf).collect().head
    val est = row.getLong(0)
    val globalExact = graft.sources.Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(math.abs(est - globalExact).toDouble / globalExact < 0.05,
      s"union estimate $est vs exact $globalExact")
    // the per-type sum can only overcount (users overlap across
    // types) — compare against the exact global distinct, not the
    // sketch estimate, so an in-bounds HLL over-estimate cannot fail
    // the suite
    assert(row.getLong(1) >= globalExact)
  }

  test("b4_kmeans separates planted clusters and is run-stable") {
    import spark.implicits._
    // two tight planted clusters far apart; seeds 0 and 1 land one in
    // each, so k=2 must recover the planting exactly
    val vecs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i, Array.fill(8)(base + (i % 5) * 0.001f))
    }.toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.kmeansQuantized(vecs, k = 2, iters = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).sorted === Array(0, 1))
    assert(out.map(_._2).sum === 40L)
    assert(out.forall(_._2 === 20L), s"expected 20/20 split: ${out.toSeq}")
    // tight clusters → near-zero inertia (micro-units of squared-code
    // scale); and a re-run is bit-stable
    assert(out.forall(_._3 < 100L * 1000000))
    val again = graft.operators.Similarity.kmeansQuantized(vecs, k = 2, iters = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(_._1) === out.sortBy(_._1))
  }

  test("b2_jaccard_est: slot-agreement estimate tracks exact jaccard") {
    val rows = SparkEntry.queries("b2_jaccard_est")(spark, sf)
      .collect()
      .map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // estimates are valid probabilities and the corpus-wide mean error
    // is small (measured 0.0011 at sf0.01 — the corpus is mostly
    // dissimilar pairs, where the 8-slot estimator must read ~0)
    assert(rows.forall { case (e, x, _) => e >= 0 && e <= 1 && x >= 0 && x <= 1 })
    val meanErr = rows.map(_._3).sum / rows.length
    info(f"mean |est - exact| = $meanErr%.4f over ${rows.length} pairs")
    assert(meanErr < 0.05, f"estimator mean error $meanErr%.4f")
  }
}
