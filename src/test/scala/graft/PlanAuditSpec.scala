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

  test("b9_lm_perplexity: the LM model table joins by broadcast") {
    val p = plan("b9_lm_perplexity")
    assert(p.contains("BroadcastHashJoin"), s"model table should broadcast:\n$p")
  }

  test("b9_domain_mix: rate table broadcasts — corpus never shuffles for the join") {
    val p = plan("b9_domain_mix")
    assert(p.contains("BroadcastHashJoin"), s"rate table should broadcast:\n$p")
  }

  test("b9_quality_classifier is a shuffle-free scan pass (sort excepted)") {
    val p = plan("b9_quality_classifier")
    assert(!p.contains("Exchange hashpartitioning"),
      s"classifier should be a pure row pipeline:\n$p")
  }

  test("w6_funnel: three dependent windows + per-user agg share ONE user_id shuffle") {
    val p = plan("w6_funnel")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n === 1, s"expected exactly one hash exchange:\n$p")
  }

  test("w8_sessionization: lag + running sum + session collapse share ONE user_id shuffle") {
    // HashPartitioning(user_id) must satisfy the (user_id, session_idx)
    // clustered distribution of the final groupBy — a second exchange
    // here would reshuffle the whole corpus per sessionization pass.
    val p = plan("w8_sessionization")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n === 1, s"expected exactly one hash exchange:\n$p")
  }

  test("g15_regression: window min + moment agg share ONE user_id shuffle") {
    val p = plan("g15_regression")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n === 1, s"expected exactly one hash exchange:\n$p")
  }

  test("b5_vocab / b5_entropy: corpus agg map-side combines (partial before shuffle)") {
    // the (key, token) hash-agg must be two-phase: a partial
    // HashAggregate below its exchange is what turns a corpus-sized
    // shuffle into a vocab-sized one at 100 TB.
    for (name <- Seq("b5_vocab", "b5_entropy")) {
      val p = plan(name)
      assert(p.contains("HashAggregate"), s"$name should hash-aggregate:\n$p")
      assert(p.contains("partial_count"), s"$name should have a partial aggregate:\n$p")
    }
  }

  test("w11_time_weighted / b5_fertility / b1_url_dedup: ONE corpus-sized hash shuffle each") {
    for (name <- Seq("w11_time_weighted", "b5_fertility", "b1_url_dedup")) {
      val p = plan(name)
      val n = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(n === 1, s"$name expected exactly one hash exchange:\n$p")
    }
  }

  test("w9_attribution: the corpus shuffles once; the channel rollup exchange is post-aggregation") {
    // Exchange 1 = the user_id window (corpus-sized, unavoidable).
    // Exchange 2 = the per-channel rollup — it must sit ABOVE a partial
    // HashAggregate so only channel-count rows move.
    val p = plan("w9_attribution")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n === 2, s"expected two hash exchanges (window + tiny rollup):\n$p")
    assert(p.contains("partial"), s"channel rollup must map-side combine:\n$p")
  }

  test("w10_transitions: shuffle sizes shrink stage over stage — lag, pair agg, row-normalize") {
    // 3 exchanges: user_id lag (corpus), (prev,next) count (post-partial,
    // transition-matrix-sized), prev-row normalize window (matrix-sized).
    // A 4th exchange means someone reshuffled the corpus.
    val p = plan("w10_transitions")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 3, s"expected at most three hash exchanges:\n$p")
    assert(p.contains("partial"), s"pair agg must map-side combine:\n$p")
  }

  test("b4_kmeans assignment pass: centroid table broadcasts — the corpus never shuffles for the join") {
    // b4_kmeans's own executed plan truncates at the localCheckpoints
    // (each iteration materializes), so auditing it would only ever see
    // the LAST pass. Audit the per-iteration building block directly on
    // non-checkpointed inputs — this is the join shape every Lloyd
    // iteration runs.
    import org.apache.spark.sql.functions._
    val xe = graft.sources.Tables.embeddings(spark, sf)
      .filter(graft.functions.VectorOps.norm(col("embedding")) > 0)
      .select(col("vec_id"),
        posexplode(graft.operators.Curation.quantize(col("embedding"))))
      .toDF("vec_id", "pos", "xv")
    val cent = xe.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cid"), col("pos"),
        (col("xv") * 1000000L).as("cv_micro"))
    val p = graft.operators.Similarity.cellDistances(xe, cent)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"centroid join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no corpus-sized join shuffle allowed:\n$p")
  }

  test("b4_pq_verified final stage: codes join the broadcast ADC table — no corpus shuffle for the scan") {
    // like b4_kmeans, the full query truncates at localCheckpoints; the
    // judged plan is the post-codebook stage. Its two joins — codes ⋈
    // LUT and shortlist ⋈ codes-for-rerank — must both broadcast the
    // bounded query-derived side; the only corpus-sized exchanges are
    // the per-(vector,sub) aggregations.
    val p = plan("b4_pq_verified")
    assert(p.contains("BroadcastHashJoin"), s"ADC lookup must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no corpus-sized join shuffle in the ADC scan:\n$p")
  }

  test("f13_hof: array lambdas are a shuffle-free scan pass (sort excepted)") {
    val p = plan("f13_hof")
    assert(!p.contains("hashpartitioning"),
      s"in-row lambda evaluation must not shuffle:\n$p")
  }

  test("b9_weighted_sample: top-k cut is TakeOrderedAndProject, not a global sort") {
    val p = plan("b9_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"weighted sample must heap-select, not globally sort:\n$p")
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

  test("runtime bloom-filter injection triggers on selective shuffle joins") {
    // The 100 TB lever this pins down: when a selective dim filter
    // feeds a SHUFFLE join, Catalyst pre-filters the fact side with a
    // bloom filter of the dim keys — a semi-join reduction before the
    // shuffle moves fact rows. Conditions (worth knowing at scale):
    // the join must not be broadcast-able, and the fact scan must
    // exceed applicationSideScanSizeThreshold (10 GB default — lowered
    // here because sf0.1 is MB-scale).
    import org.apache.spark.sql.functions._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.1")
      val ord = graft.sources.Tables.orders(spark, "/root/testdata/sf0.1")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter_agg") && p.contains("might_contain"),
        s"expected injected runtime bloom filter in:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("b3_maxsim: in-row MaxSim over the broadcast query set — no corpus-sized shuffle") {
    // the m×m max/sum cascade is codegen'd array HOFs inside the
    // broadcast pair join; the only exchange allowed is the top-k
    // window over n·|Q| SCORED pairs (plus the final output sort)
    val p = plan("b3_maxsim")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"expected the bounded query side to broadcast:\n$p")
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 1, s"expected at most the scored-pair window exchange:\n$p")
  }

  test("b2_semantic_dedup: centroid table broadcasts; the pair join never broadcasts the corpus") {
    val p = plan("b2_semantic_dedup")
    // the within-cell pair join must be a shuffle join on cid (both
    // sides are corpus-sized) — a broadcast there would ship the corpus
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"expected a shuffle join for the within-cell pairs:\n$p")
  }

  test("w13_anomaly: all three rolling aggregates share ONE user_id window pass") {
    val p = plan("w13_anomaly")
    val n = "Window".r.findAllIn(p).length
    assert(n <= 2, s"expected one Window operator (n_prev/s1/s2 fused):\n$p")
    val ex = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(ex === 1, s"expected exactly one hash exchange:\n$p")
  }

  test("q2_lateral decorrelates: ranking join, no per-row subquery loop") {
    val p = plan("q2_lateral")
    assert(!p.contains("CartesianProduct"), s"lateral stayed correlated:\n$p")
    assert(p.contains("Window") || p.contains("TakeOrdered") || p.contains("Limit"),
      s"expected a decorrelated ranking shape:\n$p")
  }

  test("no judged plan contains a partition-less Window") {
    // A Window with an empty partitionSpec serializes its ENTIRE input
    // through one task — b7_pack's r3 plan did exactly that (the
    // driver bench's "No Partition Defined" warnings) and would die at
    // 100 TB. Bounded-input global windows (the k-row k-means seed
    // table) sit below localCheckpoints and never reach a judged plan,
    // so any hit here is a real scale bug, not noise.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val df = SparkEntry.queries(name)(spark, sf)
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$name plans a partition-less Window:\n${df.queryExecution.optimizedPlan}")
    }
  }

  test("t8_interval_join: both event sides share ONE user_id shuffle tier; no corpus broadcast") {
    // the batch twin must keep the streaming plan's shape: shuffle each
    // side once on the equi key (user_id), interval-filter per key —
    // never broadcast a corpus-sized side, never a nested loop.
    val p = plan("t8_interval_join")
    // the interval predicate must ride an EQUI-join on user_id (hash or
    // sort-merge — at sf0.001 the planner may rightly broadcast the
    // tiny filtered side; at scale the same plan shuffles both sides
    // once), never degrade to a nested loop over the corpus
    assert(p.contains("Join") && p.contains("user_id"),
      s"expected an equi-join keyed on user_id:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval must ride the equi-join as a post-filter, not a BNLJ:\n$p")
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
