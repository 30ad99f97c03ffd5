package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Round-3 retrieval/curation additions: SemDeDup semantic dedup,
  * MaxSim late interaction, repeated-span detection, bitmap exact
  * distinct, rolling z-score anomalies, and the LATERAL SQL surface.
  * Planted-input semantics first, then invariants on the judged
  * queries over the real testdata.
  */
class RetrievalSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.01"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** embeddings-shaped frame from 64-dim float rows. */
  private def embDF(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }
  /** Orthogonal block vectors: seed s occupies dims [16s, 16s+16) —
    * distinct seeds (mod 4) have dot exactly 0, so only planted copies
    * can cross the near-dup threshold. */
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(64)(i => if (i / 16 == seed % 4) 1f + (i % 16) * 0.01f else 0f)

  test("semanticDedup removes the planted copy, keeps the lower id") {
    // ids 0..3 distinct directions, id 10 = exact copy of id 1
    val e = embDF(Seq(0L -> vec(0), 1L -> vec(1), 2L -> vec(2),
      3L -> vec(3), 10L -> vec(1)))
    val removed = Similarity.semanticDedup(e, k = 2, iters = 1).collect()
    assert(removed.map(_.getLong(0)).toSeq === Seq(10L))
    assert(removed.head.getLong(2) === 1L) // kept_id = the smaller id
    // an identical pair's int8-code dot is the squared code norm ≈ 127²
    assert(removed.head.getLong(3) >= 15000L)
  }

  test("index memo: rewriting the stateKey data in place invalidates the cached state") {
    val dir = java.nio.file.Files.createTempDirectory("graft_memo_fp").toString
    def write(rows: Seq[(Long, Array[Float])]): Unit =
      embDF(rows).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def members(): Long = {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      Similarity.kmeansQuantized(e, k = 2, iters = 1, stateKey = Some(dir))
        .agg(sum("n_members")).first().getLong(0)
    }
    write(Seq(0L -> vec(0), 1L -> vec(1), 2L -> vec(2)))
    assert(members() === 3L)
    // in-place rewrite with MORE vectors: a fingerprint-less memo would
    // keep serving the 3-member state (the r4 behavior the advisor
    // flagged); the listing fingerprint must retrain on the new bytes
    write(Seq(0L -> vec(0), 1L -> vec(1), 2L -> vec(2),
      3L -> vec(3), 4L -> vec(0), 5L -> vec(1)))
    assert(members() === 6L)
  }

  test("b2_semantic_dedup: removed ids are unique, partners are smaller, dots over threshold") {
    val rows = q("b2_semantic_dedup").collect()
    assert(rows.nonEmpty, "expected at least one semantic near-dup at sf0.01")
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getLong(2) < r.getLong(0)) // kept_id < vec_id
      assert(r.getLong(3) >= 5000L)
    }
  }

  test("maxSimTopK ranks an exact copy first with the self-similarity score") {
    val e = embDF(Seq(0L -> vec(5), 1L -> vec(5), 2L -> vec(6), 3L -> vec(7)))
    val top = Similarity.maxSimTopK(e, col("vec_id") === 0, topK = 3).collect()
    assert(top.head.getLong(2) === 1L) // the copy wins
    // score of the copy = sum over subs of each sub-vector's squared
    // norm = the full squared code norm (max is attained at alignment)
    val self = top.head.getLong(3)
    assert(self >= 15000L)
    // MaxSim dominates the aligned dot for every other candidate
    assert(top.forall(_.getLong(3) <= self))
  }

  test("b3_maxsim: 3 ranked neighbors per query, scores non-increasing") {
    val rows = q("b3_maxsim").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3))
      val scores = rs.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(scores.sliding(2).forall(p => p(0) >= p(1)))
    }
  }

  test("b1_span_dedup flags planted shared spans and only those") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_span_test"
    import spark.implicits._
    val shared = (1 to 8).map(i => s"tok$i").mkString(" ")
    Seq(
      (1L, s"alpha beta gamma $shared one two three"),
      (2L, s"$shared delta epsilon zeta eta theta iota"),
      (3L, "only unique words appear in this third document here now")
    ).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("b1_span_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // docs 1 and 2 share exactly the one 8-token span; doc 3 shares none
    assert(out(1L)._2 === 1L)
    assert(out(2L)._2 === 1L)
    assert(out(3L)._2 === 0L)
    // span counts: n_tokens - 7 sliding positions (14, 14, 10 tokens)
    assert(out(1L)._1 === 7L)
    assert(out(2L)._1 === 7L)
    assert(out(3L)._1 === 3L)
  }

  test("g18_bitmap_distinct matches countDistinct exactly, including the merged '*' row") {
    val rows = q("g18_bitmap_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = graft.sources.Tables.events(spark, sf)
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) => assert(rows(k) === n, s"type $k") }
    val global = ev.select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(rows("*") === global)
  }

  test("w13_anomaly: baselines exclude the current row, flags agree with z") {
    val rows = q("w13_anomaly").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(2)
      assert(n >= 4 && n <= 8)
      if (!r.isNullAt(4) && !r.isNullAt(5)) {
        val z = r.getDouble(4)
        // away from the threshold the flag must agree with |z| >= 2
        if (math.abs(math.abs(z) - 2.0) > 1e-3)
          assert(r.getBoolean(5) === (math.abs(z) >= 2.0), s"row $r")
      }
    }
    // anomalies exist in this data and are a small minority
    val flagged = rows.count(r => !r.isNullAt(5) && r.getBoolean(5))
    assert(flagged > 0 && flagged < rows.length / 2)
  }

  test("q2_lateral: top-2 orders per customer match the window formulation") {
    val rows = q("q2_lateral").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val byCust = rows.groupBy(_._1)
    assert(byCust.values.forall(_.length <= 2))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expected = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_custkey") <= 100)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.toSet === expected)
  }
}
