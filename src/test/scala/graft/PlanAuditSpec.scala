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
