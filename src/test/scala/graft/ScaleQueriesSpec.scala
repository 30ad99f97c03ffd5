package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IvfAnn

/** Scale patterns: bucketed join must be exchange-free; salted join
  * must equal the unsalted result; IVF quantizer must be deterministic
  * and assign to the nearest centroid. */
class ScaleQueriesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("c6: bucketed sort-merge join plans without a shuffle exchange") {
    val df = SparkEntry.queries("c6_bucketed_join")(spark, sf)
    // the groupBy after the join shuffles — assert no exchange BELOW the
    // SortMergeJoin instead: find the join node and check its subtree.
    // AdaptiveSparkPlanExec hides its input plan from TreeNode.collect —
    // unwrap it before searching.
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val smj = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.nonEmpty, s"expected SortMergeJoin in:\n$plan")
    val exchangesUnderJoin = smj.head.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchangesUnderJoin.isEmpty,
      s"bucketed join must not shuffle its inputs:\n${smj.head}")
  }

  test("j9: salted join result equals the plain join") {
    val salted = SparkEntry.queries("j9_salted_skew_join")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val plain = SparkEntry.queries("j8_sort_merge")(spark, sf) // same join, unsalted
    val plainAgg = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(QueryRegistry.dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(salted === plainAgg)
  }

  test("IVF: assignment picks the nearest centroid") {
    val cs = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq(
      (1L, Seq(0.9f, 0.1f)),  // nearest to centroid 0
      (2L, Seq(0.2f, 1.5f))   // nearest to centroid 1
    ).toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"), IvfAnn.assign(col("embedding"), cs).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) === 0)
    assert(got(2L) === 1)
  }

  test("IVF: centroids are deterministic across repeated runs") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val a = IvfAnn.centroids(emb, 4, 2)
    val b = IvfAnn.centroids(emb.repartition(7), 4, 2)
    assert(a === b) // rounding makes the quantizer partitioning-stable
  }

  test("IVF topK returns k neighbors per query from the query's cell") {
    val out = IvfAnn.topK(graft.sources.Tables.embeddings(spark, sf), 5, 3, 4, 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet.subsetOf((0L until 5L).toSet))
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length).toSeq)
      assert(rows.length <= 3)
    }
  }
}
