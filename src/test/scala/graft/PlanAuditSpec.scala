package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: the optimizer wins SCALE.md claims
  * (pushdown, pruning, broadcast/SMJ selection, top-k) must survive
  * future query edits. String-level checks over the formatted plan. */
class PlanAuditSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("c1: column pruning reaches the parquet reader") {
    val p = plan("c1_scan_projection")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"),
      s"expected 3-column ReadSchema in:\n$p")
  }

  test("p2: filters push down to the scan") {
    // plan toString elides long lists — assert on the stable prefix
    val p = plan("p2_filters")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), IsNotNull(l_shipdate)"),
      s"expected pushed filters in:\n$p")
  }

  test("j1: dimension side broadcasts") {
    assert(plan("j1_broadcast_join").contains("BroadcastHashJoin"))
  }

  test("j8: merge hint yields sort-merge join") {
    assert(plan("j8_sort_merge").contains("SortMergeJoin"))
  }

  test("s1: global top-k plans TakeOrderedAndProject, not a full sort") {
    assert(plan("s1_top_n").contains("TakeOrderedAndProject"))
  }

  test("g1: aggregation is two-phase (partial before the shuffle)") {
    val p = plan("g1_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial"), s"no partial agg in:\n$p")
  }

  test("b9_decontaminate: eval-gram side broadcasts, corpus side never shuffles for the join") {
    val p = plan("b9_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"eval grams should broadcast:\n$p")
  }

  test("b9_pii_scrub and b9_train_test_split are shuffle-free row pipelines (sort excepted)") {
    for (name <- Seq("b9_pii_scrub", "b9_train_test_split")) {
      val p = plan(name)
      // the only exchange allowed is the final rangepartitioning sort
      assert(!p.contains("Exchange hashpartitioning"),
        s"$name should have no hash shuffle:\n$p")
    }
  }

  test("b5_tfidf: document-frequency table joins by broadcast, corpus count by 1-row BNLJ") {
    val p = plan("b5_tfidf")
    assert(p.contains("BroadcastHashJoin"), s"df-table join should broadcast:\n$p")
  }

  test("b7_chunk: generator-only — no hash-partition shuffle anywhere") {
    val p = plan("b7_chunk")
    assert(!p.contains("hashpartitioning"), s"chunking must not shuffle:\n$p")
    assert(p.contains("Generate"), "expected an explode Generate node")
  }

  test("s6_zorder_key: bit interleave stays inside whole-stage codegen") {
    // AQE shows codegen spans only in the final plan — execute first.
    val df = SparkEntry.queries("s6_zorder_key")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // '*(n)' is the WholeStageCodegen span marker in the final plan;
    // the interleave must stay a plain Project of built-in bit ops.
    assert(p.contains("*("), s"no codegen span in final plan:\n$p")
    assert(p.contains("shiftleft"), s"zkey expression not inlined:\n$p")
    assert(!p.contains("hashpartitioning"), s"zkey must not add a hash shuffle:\n$p")
  }

  test("no accidental cartesian products anywhere") {
    for (name <- SparkEntry.queries.keys.toSeq.sorted
         if name != "j7_cross" && name != "b3_cosine_topk") {
      // j7 is the sanctioned bounded cross join; b3 broadcasts a 10-row
      // query set through a nested-loop by design.
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
    }
  }
}
