package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryRegistry._
import graft.sources.Tables

/** Aggregation and window functions — SURVEY.md §2.C G1–G7, W1–W4.
  * All group-bys ride Spark's partial/final HashAggregate (map-side
  * combine before the shuffle); windows shuffle once on the partition
  * key. Every output is totally ordered for the driver's hash-compare.
  */
object AggWindowQueries {

  /** G1 / flagship: TPC-H Q1-shaped pricing summary. */
  def pricingSummary: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(28,6)"))
          .cast("double").as("sum_disc_price"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
          .cast("decimal(28,6)")).cast("double").as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val pricingSummarySql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |${dsumSql("l_quantity")} AS sum_qty,
       |${dsumSql("l_extendedprice")} AS sum_base_price,
       |CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
       |CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
       |round(avg(l_quantity), 4) AS avg_qty,
       |round(avg(l_extendedprice), 4) AS avg_price,
       |round(avg(l_discount), 4) AS avg_disc,
       |count(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  val entries: Seq[Entry] = Seq(
    Entry("g1_pricing_summary", pricingSummary, Some(pricingSummarySql)),

    // G2: distinct aggregate (expand + two-phase agg under the hood).
    Entry(
      "g2_distinct_agg",
      (s, d) =>
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
             |FROM events GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin)
    ),

    // G3: approx_count_distinct (HLL++) — deterministic for fixed data but
    // not SQL-equivalent; declared without oracle (rows-only check).
    Entry(
      "g3_approx_distinct",
      (s, d) =>
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(approx_count_distinct(col("user_id")).as("approx_users"))
          .orderBy("event_type"),
      None
    ),

    // G4: rollup + grouping_id.
    Entry(
      "g4_rollup",
      (s, d) =>
        Tables.orders(s, d)
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"),
               grouping_id().as("gid"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
              |${dsumSql("o_totalprice")} AS sum_price,
              |CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
              |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
              |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // G4b: cube.
    Entry(
      "g4_cube",
      (s, d) =>
        Tables.lineitem(s, d)
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
    ),

    // G5: conditional aggregation — sum(CASE), count_if.
    Entry(
      "g5_conditional_agg",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_linestatus")
          .agg(
            sum(when(col("l_returnflag") === "A", col("l_extendedprice")).cast("decimal(28,6)"))
              .cast("double").as("sum_returned"),
            count_if(col("l_quantity") > 25).as("n_bulk"),
            count(lit(1)).as("n_all"))
          .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |CAST(sum(CAST(CASE WHEN l_returnflag = 'A' THEN l_extendedprice END AS DECIMAL(28,6))) AS DOUBLE) AS sum_returned,
             |CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
             |count(*) AS n_all
             |FROM lineitem GROUP BY 1 ORDER BY l_linestatus NULLS FIRST""".stripMargin)
    ),

    // G6: max_by / ordered collect (unordered collect_list is
    // non-deterministic → always sort_array; SURVEY.md §5.3).
    Entry(
      "g6_maxby_collect",
      (s, d) =>
        Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(
            max_by(col("n_name"), col("n_nationkey")).as("max_key_nation"),
            min_by(col("n_name"), col("n_nationkey")).as("min_key_nation"),
            array_join(sort_array(collect_list(col("n_name"))), ",").as("nations"))
          .orderBy("r_name"),
      Some("""SELECT r_name, arg_max(n_name, n_nationkey) AS max_key_nation,
             |arg_min(n_name, n_nationkey) AS min_key_nation,
             |string_agg(n_name, ',' ORDER BY n_name) AS nations
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1 ORDER BY r_name NULLS FIRST""".stripMargin)
    ),

    // G7: having.
    Entry(
      "g7_having",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
          .filter(col("n_orders") >= 12)
          .orderBy("o_custkey"),
      Some(s"""SELECT o_custkey, count(*) AS n_orders, ${dsumSql("o_totalprice")} AS spend
              |FROM orders GROUP BY 1 HAVING count(*) >= 12
              |ORDER BY o_custkey NULLS FIRST""".stripMargin)
    ),

    // W1: ranking trio. rank/dense_rank rank over a tie-prone key
    // (p_size) — peers are deterministic; row_number gets a full
    // tie-breaker of its own.
    Entry(
      "w1_ranking",
      (s, d) => {
        val peers = Window.partitionBy("p_brand").orderBy(col("p_size").desc)
        val total = Window.partitionBy("p_brand").orderBy(col("p_size").desc, col("p_partkey").asc)
        Tables.part(s, d)
          .select(
            col("p_brand"), col("p_partkey"), col("p_size"),
            rank().over(peers).as("rnk"),
            dense_rank().over(peers).as("drnk"),
            row_number().over(total).as("rn"))
          .orderBy("p_brand", "rn")
      },
      Some("""SELECT p_brand, p_partkey, p_size,
             |rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS rnk,
             |dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS drnk,
             |row_number() OVER (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey) AS rn
             |FROM part ORDER BY p_brand NULLS FIRST, rn NULLS FIRST""".stripMargin)
    ),

    // W2: lag/lead over per-user event sequences.
    Entry(
      "w2_lag_lead",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .select(
            col("user_id"), col("event_id"), col("event_type"),
            round(col("value") - lag(col("value"), 1).over(w), 4).as("value_delta"),
            lead(col("event_type"), 1).over(w).as("next_type"),
            first(col("event_type")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_type"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, event_type,
             |round(value - lag(value, 1) OVER w, 4) AS value_delta,
             |lead(event_type, 1) OVER w AS next_type,
             |first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type
             |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id NULLS FIRST, event_id NULLS FIRST""".stripMargin)
    ),

    // W3: frame specs — a ROWS frame with a full tie-break, and a RANGE
    // frame over a numeric day offset (peers included regardless of
    // order, so no tie-break needed on the range key).
    Entry(
      "w3_frames",
      (s, d) => {
        val day = datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
        val rowsW = Window.partitionBy("o_custkey").orderBy(col("epoch_day").asc, col("o_orderkey").asc)
          .rowsBetween(-3, 0)
        val rangeW = Window.partitionBy("o_custkey").orderBy(col("epoch_day").asc)
          .rangeBetween(-30, 0)
        Tables.orders(s, d)
          .withColumn("epoch_day", day)
          .select(
            col("o_custkey"), col("o_orderkey"), col("epoch_day"),
            sum(col("o_totalprice").cast("decimal(28,6)")).over(rowsW).cast("double").as("last4_spend"),
            sum(col("o_totalprice").cast("decimal(28,6)")).over(rangeW).cast("double").as("spend_30d"))
          .orderBy("o_custkey", "epoch_day", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS epoch_day,
             |CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) OVER (PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)), o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS last4_spend,
             |CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) OVER (PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
             |FROM orders
             |ORDER BY o_custkey NULLS FIRST, epoch_day NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin)
    ),

    // G9: statistical aggregates. Rounded to 4: variance/correlation
    // merge order differs across engines in the low bits.
    Entry(
      "g9_stats",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
            round(var_samp(col("l_extendedprice")), 4).as("var_price"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
            round(covar_samp(col("l_quantity"), col("l_discount")), 4).as("cov_qd"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |round(stddev_samp(l_quantity), 4) AS sd_qty,
             |round(var_samp(l_extendedprice), 4) AS var_price,
             |round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
             |round(covar_samp(l_quantity, l_discount), 4) AS cov_qd,
             |count(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag NULLS FIRST""".stripMargin)
    ),

    // G11: mergeable sketches — the 100 TB pattern for distinct counts
    // and quantiles: per-partition DataSketches HLL sketches merge
    // associatively (partial agg before the shuffle, union across
    // partitions/days), unlike exact COUNT(DISTINCT)'s expand-shuffle.
    // Non-SQL (sketch estimates); accuracy asserted vs exact counts in
    // AggSketchSpec.
    Entry(
      "g11_sketches",
      (s, d) =>
        Tables.events(s, d)
          .groupBy("event_type")
          .agg(
            hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("approx_users"),
            round(percentile_approx(col("value"), lit(0.5), lit(1000)), 4).as("p50_value"),
            count(lit(1)).as("n"))
          .orderBy("event_type"),
      None
    ),

    // G10: pivot — explicit value list (never pivot on unbounded
    // cardinality at scale; the value list bounds the output schema).
    Entry(
      "g10_pivot",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_linestatus")
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(dsum(col("l_quantity")))
          .orderBy("l_linestatus"),
      Some(s"""SELECT l_linestatus,
              |CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) FILTER (WHERE l_returnflag = 'A') AS DOUBLE) AS "A",
              |CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) FILTER (WHERE l_returnflag = 'N') AS DOUBLE) AS "N",
              |CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS "R"
              |FROM lineitem GROUP BY 1 ORDER BY l_linestatus NULLS FIRST""".stripMargin)
    ),

    // G13: fixed-width histogram — 10 equal buckets over the observed
    // [min, max] of o_totalprice. The 1-row bounds aggregate crosses in
    // as a broadcast, so the fact side is one scan + one partial-agg
    // pass at any scale. least(...,9) folds the x == max row into the
    // top bucket on both engines.
    Entry(
      "g13_histogram",
      (s, d) => {
        val bounds = Tables.orders(s, d)
          .agg(min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
        Tables.orders(s, d)
          .crossJoin(broadcast(bounds))
          .select(least(
            floor((col("o_totalprice") - col("mn")) / ((col("mx") - col("mn")) / 10.0))
              .cast("long"), lit(9L)).as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .orderBy("bucket")
      },
      Some("""WITH s AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders)
             |SELECT least(CAST(floor((o_totalprice - mn) / ((mx - mn) / 10.0)) AS BIGINT), 9) AS bucket,
             |count(*) AS n
             |FROM orders, s GROUP BY 1 ORDER BY bucket NULLS FIRST""".stripMargin)
    ),

    // W5: distribution window functions — ntile over a total order,
    // percent_rank/cume_dist over a tie-prone key (peers deterministic).
    Entry(
      "w5_distribution",
      (s, d) => {
        val total = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
        val peers = Window.partitionBy("o_orderstatus").orderBy(col("o_orderpriority").asc)
        Tables.orders(s, d)
          .select(
            col("o_orderstatus"), col("o_orderkey"),
            ntile(4).over(total).as("quartile"),
            round(percent_rank().over(peers), 6).as("prk"),
            round(cume_dist().over(peers), 6).as("cd"))
          .orderBy("o_orderstatus", "o_orderkey")
      },
      Some("""SELECT o_orderstatus, o_orderkey,
             |CAST(ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile,
             |round(percent_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority), 6) AS prk,
             |round(cume_dist() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority), 6) AS cd
             |FROM orders
             |ORDER BY o_orderstatus NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin)
    ),

    // W4: top-k per group.
    Entry(
      "w4_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
             |SELECT o_custkey, o_orderkey, o_totalprice,
             |row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |FROM orders) WHERE rn <= 3
             |ORDER BY o_custkey NULLS FIRST, rn NULLS FIRST""".stripMargin)
    ),

    // W6: ordered funnel analysis — per user, the furthest stage of
    // view → click-after-view → purchase-after-that reached, with the
    // stage timestamps (µs epoch; events are µs-granular so the ns→µs
    // read conversion is lossless). Three chained windowed minima over
    // the SAME user partition: one shuffle total, the dependent
    // thresholds (t2 needs t1, t3 needs t2) ride the same exchange.
    // The final per-user collapse reuses that partitioning too — at
    // 100 TB of events this is a single shuffle on user_id, with
    // window state bounded per user.
    Entry(
      "w6_funnel",
      (s, d) =>
        Analytics.funnel(Tables.events(s, d), Seq("view", "click", "purchase"))
          .select(col("user_id"), col("stage"),
            unix_micros(col("t1")).as("view_us"),
            unix_micros(col("t2")).as("click_us"),
            unix_micros(col("t3")).as("purchase_us"))
          .orderBy("user_id"),
      Some("""WITH a AS (SELECT user_id, ts, event_type,
             |    min(CASE WHEN event_type = 'view' THEN ts END)
             |      OVER (PARTITION BY user_id) AS t1 FROM events),
             |b AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
             |      OVER (PARTITION BY user_id) AS t2 FROM a),
             |c AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
             |      OVER (PARTITION BY user_id) AS t3 FROM b)
             |SELECT user_id,
             |  CASE WHEN max(t3) IS NOT NULL THEN 3 WHEN max(t2) IS NOT NULL THEN 2
             |       WHEN max(t1) IS NOT NULL THEN 1 ELSE 0 END AS stage,
             |  epoch_us(max(t1)) AS view_us, epoch_us(max(t2)) AS click_us,
             |  epoch_us(max(t3)) AS purchase_us
             |FROM c GROUP BY user_id
             |ORDER BY user_id NULLS FIRST""".stripMargin)
    ),

    // W7: cohort retention — users grouped by first-activity week
    // (the cohort), then distinct active users per (cohort, week
    // offset). Two aggregations sharing the user_id shuffle (the
    // cohort join is a fact⋈per-user-aggregate equi-join on the same
    // key). Cohort weeks are emitted as µs epochs, never raw dates
    // (driver hash-compare rule); date_trunc('week') starts Monday in
    // both engines, and week offsets divide exactly on week
    // boundaries.
    Entry(
      "w7_cohort",
      (s, d) =>
        Analytics.cohortRetention(Tables.events(s, d))
          .orderBy("cohort_us", "week_offset"),
      Some("""WITH e AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
             |c AS (SELECT user_id, min(wk) AS cw FROM e GROUP BY 1)
             |SELECT epoch_us(CAST(cw AS TIMESTAMP)) AS cohort_us,
             |  CAST((epoch_us(CAST(wk AS TIMESTAMP)) - epoch_us(CAST(cw AS TIMESTAMP)))
             |    / 604800000000 AS INT) AS week_offset,
             |  count(DISTINCT e.user_id) AS n_users
             |FROM e JOIN c USING (user_id)
             |GROUP BY cw, wk
             |ORDER BY cohort_us NULLS FIRST, week_offset NULLS FIRST""".stripMargin)
    ),

    // W8: gap-based sessionization — the canonical gaps-and-islands
    // shape: lag → new-session flag → running sum → collapse. All
    // four steps ride ONE user_id exchange (HashPartitioning(user_id)
    // satisfies the (user_id, session_idx) clustered distribution, so
    // the final groupBy adds no shuffle — pinned in PlanAuditSpec).
    // value sums go through the DECIMAL(28,6) accumulator; DuckDB's
    // window SUM of INTEGER is HUGEINT, hence the BIGINT cast.
    Entry(
      "w8_sessionization",
      (s, d) =>
        Analytics.sessionize(Tables.events(s, d))
          .orderBy("user_id", "session_idx"),
      Some(s"""WITH e AS (SELECT user_id, event_id, event_type, value,
             |  epoch_us(ts) AS us FROM events),
             |f AS (SELECT *, CASE WHEN us - lag(us) OVER w > 1800000000
             |    OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |g AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
             |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |    AS session_idx FROM f)
             |SELECT user_id, session_idx, count(*) AS n_events,
             |  min(us) AS start_us, max(us) AS end_us,
             |  ${dsumSql("value")} AS sum_value,
             |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
             |FROM g GROUP BY user_id, session_idx
             |ORDER BY user_id NULLS FIRST, session_idx NULLS FIRST""".stripMargin)
    ),

    // W9: last-touch attribution — each purchase is credited to the
    // user's most recent preceding non-purchase event (channel), via
    // last_value(IGNORE NULLS) over a ROWS frame ending 1 PRECEDING.
    // One user_id shuffle feeds the window; the channel rollup is
    // channel-cardinality. Purchases with no preceding touch fall in
    // the 'none' bucket. Revenue sums ride DECIMAL(28,6); latency
    // sums are exact integer µs.
    Entry(
      "w9_attribution",
      (s, d) =>
        Analytics.attribution(Tables.events(s, d)).orderBy("channel"),
      Some(s"""WITH e AS (SELECT user_id, event_id, event_type, value,
             |  epoch_us(ts) AS us FROM events),
             |a AS (SELECT *,
             |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
             |    IGNORE NULLS) OVER w AS src_type,
             |  last_value(CASE WHEN event_type <> 'purchase' THEN us END
             |    IGNORE NULLS) OVER w AS src_us
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |SELECT coalesce(src_type, 'none') AS channel,
             |  count(*) AS n_purchases,
             |  ${dsumSql("value")} AS revenue,
             |  CAST(sum(us - src_us) AS BIGINT) AS latency_us_total
             |FROM a WHERE event_type = 'purchase'
             |GROUP BY coalesce(src_type, 'none')
             |ORDER BY channel NULLS FIRST""".stripMargin)
    ),

    // G15: per-user least-squares trend (value vs days-since-first-
    // event) computed from first principles — NOT regr_slope, whose
    // internal float sums are aggregation-order-dependent and would
    // drift between engines. Each moment (Σx, Σy, Σx², Σxy) rides the
    // DECIMAL(28,6) accumulator; the closed-form slope/intercept then
    // divide identical doubles identically. Degenerate users (n<3 or
    // zero x-variance) are filtered on the SAME den expression both
    // sides.
    Entry(
      "g15_regression",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
        val w = Window.partitionBy("user_id")
        val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / col("den")
        ev.withColumn("x",
            (col("us") - min(col("us")).over(w)).cast("double") / lit(86400e6))
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n"),
            dsum(col("x")).as("sx"), dsum(col("value")).as("sy"),
            dsum(col("x") * col("x")).as("sxx"),
            dsum(col("x") * col("value")).as("sxy"))
          .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
          .filter(col("n") >= 3 && col("den") > 1e-9)
          .select(col("user_id"), col("n"),
            round(slope, 6).as("slope"),
            round((col("sy") - slope * col("sx")) / col("n"), 6).as("intercept"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
             |d AS (SELECT user_id, value,
             |  CAST(us - min(us) OVER (PARTITION BY user_id) AS DOUBLE)
             |    / 86400000000.0 AS x FROM e),
             |a AS (SELECT user_id, count(*) AS n,
             |  ${dsumSql("x")} AS sx, ${dsumSql("value")} AS sy,
             |  ${dsumSql("x * x")} AS sxx, ${dsumSql("x * value")} AS sxy
             |  FROM d GROUP BY user_id),
             |b AS (SELECT *, n * sxx - sx * sx AS den FROM a)
             |SELECT user_id, n,
             |  round((n * sxy - sx * sy) / den, 6) AS slope,
             |  round((sy - ((n * sxy - sx * sy) / den) * sx) / n, 6) AS intercept
             |FROM b WHERE n >= 3 AND den > 1e-9
             |ORDER BY user_id NULLS FIRST""".stripMargin)
    ),

    // W10: behavior-flow transition matrix — per-user lag pairs
    // (prev event type → next) rolled into global counts and row-
    // normalized probabilities. One user_id exchange for the lag; the
    // transition agg is (types×types)-sized, so its shuffle is
    // constant-size at any corpus scale. Probabilities divide two
    // exact longs as doubles — identical IEEE division both engines.
    Entry(
      "w10_transitions",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        ev.withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("next"))
          .agg(count(lit(1)).as("n"))
          .withColumn("p",
            round(col("n").cast("double") /
              sum(col("n")).over(Window.partitionBy("prev")).cast("double"), 6))
          .orderBy("prev", "next")
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |  epoch_us(ts) AS us FROM events),
             |t AS (SELECT lag(event_type) OVER (PARTITION BY user_id
             |    ORDER BY us, event_id) AS prev, event_type AS next FROM e),
             |c AS (SELECT prev, next, count(*) AS n FROM t
             |  WHERE prev IS NOT NULL GROUP BY prev, next)
             |SELECT prev, next, n,
             |  round(CAST(n AS DOUBLE) /
             |    CAST(sum(n) OVER (PARTITION BY prev) AS DOUBLE), 6) AS p
             |FROM c ORDER BY prev NULLS FIRST, next NULLS FIRST""".stripMargin)
    ),

    // G16: mergeable DataSketches HLL — the sketch-union pattern that
    // makes distinct counting compose at 100 TB: per-partition (here
    // per-event-type) sketches are built independently, then UNIONED
    // (not recounted) into a global estimate. Declared rows-only (the
    // sketch is approximate and DuckDB-inexpressible); AggSketchSpec
    // bounds the union estimate against the exact distinct count.
    Entry(
      "g16_hll_merge",
      (s, d) => {
        val sketches = Tables.events(s, d)
          .groupBy("event_type")
          .agg(hll_sketch_agg(col("user_id")).as("sk"),
            countDistinct(col("user_id")).as("exact_per_type"))
        sketches.agg(
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"),
          sum(col("exact_per_type")).as("sum_per_type"),
          count(lit(1)).as("n_sketches"))
      },
      None
    ),

    // W11: time-weighted average — the step-function integral (each
    // value holds until the user's next event; VWAP-style metric).
    // value·dt products ride the DECIMAL(28,6) accumulator; the span
    // is an exact integer-µs sum, so the final division is one IEEE
    // op on identical numbers. Same one-exchange shape as W8: lead +
    // collapse share the user_id partitioning.
    Entry(
      "w11_time_weighted",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("value"))
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        ev.withColumn("next_us", lead(col("us"), 1).over(w))
          .filter(col("next_us").isNotNull)
          .withColumn("dt", col("next_us") - col("us"))
          .groupBy("user_id")
          .agg(dsum(col("value") * col("dt")).as("area"),
            sum(col("dt")).as("span_us"))
          .filter(col("span_us") > 0)
          .select(col("user_id"), col("span_us"),
            round(col("area") / col("span_us").cast("double"), 6).as("twa"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS (SELECT user_id, event_id, value,
             |  epoch_us(ts) AS us FROM events),
             |x AS (SELECT *, lead(us) OVER (PARTITION BY user_id
             |    ORDER BY us, event_id) AS next_us FROM e),
             |a AS (SELECT user_id,
             |    ${dsumSql("value * (next_us - us)")} AS area,
             |    CAST(sum(next_us - us) AS BIGINT) AS span_us
             |  FROM x WHERE next_us IS NOT NULL GROUP BY user_id)
             |SELECT user_id, span_us,
             |  round(area / CAST(span_us AS DOUBLE), 6) AS twa
             |FROM a WHERE span_us > 0
             |ORDER BY user_id NULLS FIRST""".stripMargin)
    ),

    // W12: time-series gap-fill — per-user hourly resample: generate
    // the hour spine between each user's first and last active hour,
    // left-join the observed hourly sums, carry the last observation
    // forward (LOCF, exact — no interpolation arithmetic to drift).
    // The spine is a generator off a per-user 2-row aggregate; the
    // fill shares the one user_id exchange with the join. At 100 TB
    // the spine is O(users × span-hours) — rows are created AFTER
    // aggregation, never corpus-sized.
    Entry(
      "w12_gapfill",
      (s, d) =>
        Analytics.gapFillHourly(Tables.events(s, d), col("user_id") < 50)
          .select(col("user_id"), unix_millis(col("h")).as("h_ms"),
            round(col("v_fill"), 4).as("v_fill"), col("filled"))
          .orderBy("user_id", "h_ms"),
      Some(s"""WITH e AS (SELECT user_id, date_trunc('hour', ts) AS h,
             |    ${dsumSql("value")} AS v
             |  FROM events WHERE user_id < 50 GROUP BY 1, 2),
             |s AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM e GROUP BY 1),
             |sp AS (SELECT user_id, unnest(generate_series(h0, h1,
             |    INTERVAL 1 HOUR)) AS h FROM s),
             |j AS (SELECT sp.user_id, sp.h, e.v FROM sp
             |  LEFT JOIN e ON e.user_id = sp.user_id AND e.h = sp.h)
             |SELECT user_id, epoch_ms(h) AS h_ms,
             |  round(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
             |    ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             |    AS v_fill,
             |  v IS NULL AS filled
             |FROM j ORDER BY user_id NULLS FIRST, h_ms NULLS FIRST""".stripMargin)
    ),

    // G18: EXACT mergeable distinct counting via bitmaps — the precise
    // twin of the approximate G16 HLL union. User ids map to (bucket,
    // bit) positions; per-(type, bucket) bitmaps build with one hash
    // agg, per-type counts are bitmap popcounts, and the '*' row
    // demonstrates the merge law: OR-ing the per-type bitmaps yields
    // the exact global distinct WITHOUT rescanning rows — at 100 TB
    // bitmaps compose across partitions/days exactly like sketches,
    // but with no error bar. Oracle: plain count(DISTINCT).
    Entry(
      "g18_bitmap_distinct",
      (s, d) => {
        val bm = Tables.events(s, d)
          .select(col("event_type"), col("user_id"))
          .withColumn("buck", expr("bitmap_bucket_number(user_id)"))
          .groupBy("event_type", "buck")
          .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"))
        val perType = bm.groupBy("event_type")
          .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
        val global = bm.groupBy("buck")
          .agg(expr("bitmap_or_agg(bm)").as("obm"))
          .agg(sum(expr("bitmap_count(obm)")).as("n_users"))
          .select(lit("*").as("event_type"), col("n_users"))
        perType.unionByName(global).orderBy("event_type")
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY 1
             |UNION ALL
             |SELECT '*' AS event_type, count(DISTINCT user_id) AS n_users
             |FROM events
             |ORDER BY event_type NULLS FIRST""".stripMargin)
    ),

    // W13: rolling z-score anomaly detection — each event scored
    // against its user's trailing 8-event window (current row
    // excluded: the candidate must not contaminate its own baseline).
    // Window sums ride the exact DECIMAL(28,6) accumulator, so the
    // mean/variance inputs are bit-identical across engines and the
    // remaining double ops (one sqrt, two divisions) are IEEE-exact;
    // the anomaly gate thresholds the ROUNDED score (§7.4 discipline).
    // All three rolling aggregates sit in ONE select over the shared
    // WindowSpec — chained withColumns would interleave Projects (the
    // decimal-cast inputs) between Window nodes and block Catalyst's
    // CollapseWindow, planning three Window passes instead of one
    // (PlanAuditSpec asserts the fused shape). Variance is clamped at
    // 0 before the sqrt (floating error can drive it epsilon-negative
    // for a constant baseline → NaN std → NaN z, which both engines'
    // NaN-greatest ordering would flag as an anomaly); z is gated on
    // std > 0 (null otherwise) so zero-variance rows are unflaggable.
    Entry(
      "w13_anomaly",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-8, -1)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .select(col("event_id"), col("user_id"), col("value"),
            count(col("value")).over(w).as("n_prev"),
            sum(col("value").cast("decimal(28,6)")).over(w).cast("double").as("s1"),
            sum((col("value") * col("value")).cast("decimal(28,6)")).over(w).cast("double").as("s2"))
          .filter(col("n_prev") >= 4)
          .withColumn("mean", col("s1") / col("n_prev"))
          .withColumn("std",
            sqrt(greatest(lit(0.0),
              (col("s2") - col("s1") * col("s1") / col("n_prev")) / (col("n_prev") - 1))))
          .withColumn("z",
            when(col("std") > 0.0, (col("value") - col("mean")) / col("std")))
          .select(col("event_id"), col("user_id"), col("n_prev"),
            round(col("mean"), 6).as("roll_mean"),
            round(col("z"), 4).as("z"),
            (abs(round(col("z"), 6)) >= 2.0).as("is_anomaly"))
          .orderBy("event_id")
      },
      Some("""WITH b AS (SELECT event_id, user_id, value,
             |    count(value) OVER w AS n_prev,
             |    CAST(sum(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS s1,
             |    CAST(sum(CAST(value * value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS s2
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)),
             |s AS (SELECT event_id, user_id, value, n_prev, s1 / n_prev AS mean,
             |    sqrt(greatest(0.0, (s2 - s1 * s1 / n_prev) / (n_prev - 1))) AS std
             |  FROM b WHERE n_prev >= 4),
             |z AS (SELECT event_id, user_id, n_prev, mean,
             |    CASE WHEN std > 0 THEN (value - mean) / std END AS z
             |  FROM s)
             |SELECT event_id, user_id, n_prev,
             |  round(mean, 6) AS roll_mean, round(z, 4) AS z,
             |  abs(round(z, 6)) >= 2.0 AS is_anomaly
             |FROM z ORDER BY event_id NULLS FIRST""".stripMargin)
    ),

    // Q_QUALIFY (r19, VERDICT r18 ask #7): the analyst top-k-per-group
    // spelling — `QUALIFY rank <= k` — expanded by GraftSqlParser into
    // the compute-then-filter form (window predicates project as a
    // helper column, alias predicates filter one level up). Both
    // forms in one query: the inner SELECT qualifies on a window
    // function directly; the DuckDB oracle runs its NATIVE QUALIFY on
    // the same text shape. Plan-wise the expansion IS w4's subquery
    // plan — one window shuffle, filter above — so nothing is lost at
    // 100 TB versus the hand-written spelling.
    Entry(
      "q_qualify",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("v_qualify_orders")
        s.sql("""SELECT o_custkey, o_orderkey, o_totalprice,
                |  row_number() OVER (PARTITION BY o_custkey
                |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
                |FROM v_qualify_orders
                |QUALIFY row_number() OVER (PARTITION BY o_custkey
                |    ORDER BY o_totalprice DESC, o_orderkey) <= 2
                |ORDER BY o_custkey, rn""".stripMargin)
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  row_number() OVER (PARTITION BY o_custkey
             |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |FROM orders
             |QUALIFY row_number() OVER (PARTITION BY o_custkey
             |    ORDER BY o_totalprice DESC, o_orderkey) <= 2
             |ORDER BY o_custkey NULLS FIRST, rn NULLS FIRST""".stripMargin)
    ),

    // Q_QUALIFY_CTE (r19 session 2): QUALIFY inside a CTE BODY — the
    // deep (paren-group) claim, oracle'd by DuckDB's native QUALIFY
    // in the same position. Top-3 orders per customer filtered in the
    // CTE, rolled up outside: proves the rewritten body composes with
    // the outer aggregate exactly as the hand-written subquery would.
    Entry(
      "q_qualify_cte",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("v_qualify_cte_orders")
        s.sql(s"""WITH top AS (
                 |  SELECT o_custkey, o_orderkey, o_totalprice
                 |  FROM v_qualify_cte_orders
                 |  QUALIFY row_number() OVER (PARTITION BY o_custkey
                 |    ORDER BY o_totalprice DESC, o_orderkey) <= 3)
                 |SELECT o_custkey, count(*) AS n,
                 |  ${dsumSql("o_totalprice")} AS sum_top
                 |FROM top GROUP BY o_custkey
                 |ORDER BY o_custkey""".stripMargin)
      },
      Some(s"""WITH top AS (
             |  SELECT o_custkey, o_orderkey, o_totalprice
             |  FROM orders
             |  QUALIFY row_number() OVER (PARTITION BY o_custkey
             |    ORDER BY o_totalprice DESC, o_orderkey) <= 3)
             |SELECT o_custkey, count(*) AS n,
             |  ${dsumSql("o_totalprice")} AS sum_top
             |FROM top GROUP BY o_custkey
             |ORDER BY o_custkey NULLS FIRST""".stripMargin)
    ),

    // Q_GROUP_BY_ALL (r19): GROUP BY ALL — group by every
    // non-aggregate SELECT expression. Spark's parser carries it
    // natively; this entry pins that the engine's SQL surface (with
    // the injected parser in front) preserves it, oracle'd by DuckDB's
    // native GROUP BY ALL. (DuckDB cannot combine it with QUALIFY yet,
    // so the alias-form QUALIFY is pinned in Round19Spec against
    // Spark's own subquery spelling instead.)
    Entry(
      "q_group_by_all",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("v_gba_orders")
        s.sql(s"""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
                 |  ${dsumSql("o_totalprice")} AS sum_price
                 |FROM v_gba_orders
                 |GROUP BY ALL
                 |ORDER BY o_orderpriority, o_orderstatus""".stripMargin)
      },
      Some(s"""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
             |  ${dsumSql("o_totalprice")} AS sum_price
             |FROM orders
             |GROUP BY ALL
             |ORDER BY o_orderpriority NULLS FIRST,
             |  o_orderstatus NULLS FIRST""".stripMargin)
    )
  )
}
