package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryRegistry._
import graft.sources.Tables

/** Join shapes — SURVEY.md §2.C J1–J8. Covers the reference's A10 fact
  * join ([R] etl.py: log events ⋈ songs/artists on title/name equality).
  *
  * 100 TB stance (SURVEY.md §7.5): dimension sides are broadcast
  * explicitly; the as-of join (J6) is a single-shuffle window scan, not a
  * self-join; the only cross join (J7) is over two bounded dims.
  */
object JoinQueries {

  val entries: Seq[Entry] = Seq(
    // J1: fact ⋈ dim equi-join, dim side broadcast (part = 200 rows; at
    // 100 TB the dim is still small — broadcast is the right physical plan).
    Entry(
      "j1_broadcast_join",
      (s, d) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
          .orderBy("p_brand"),
      Some(s"""SELECT p_brand, ${dsumSql("l_quantity")} AS sum_qty, count(*) AS cnt
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |GROUP BY p_brand ORDER BY p_brand NULLS FIRST""".stripMargin)
    ),

    // J2: multi-way chain (TPC-H Q5 shape) — Catalyst reorders; small dims
    // broadcast, the orders⋈lineitem spine shuffles on the join key once.
    Entry(
      "j2_multiway",
      (s, d) => {
        val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(28,6)")
        Tables.customer(s, d)
          .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .groupBy("r_name", "n_name")
          .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("cnt"))
          .orderBy("r_name", "n_name")
      },
      Some("""SELECT r_name, n_name,
             |CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
             |count(*) AS cnt
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY r_name, n_name ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)
    ),

    // J3: left outer — customers keep their row even with zero orders.
    Entry(
      "j3_left_outer",
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey", "c_name")
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY 1, 2 ORDER BY c_custkey NULLS FIRST""".stripMargin)
    ),

    // J3b: full outer over pre-aggregated sides (nulls on both flanks).
    Entry(
      "j3_full_outer",
      (s, d) => {
        val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("ck"))
          .agg(count(lit(1)).as("nc"))
        val p = Tables.supplier(s, d).groupBy(col("s_nationkey").as("sk"))
          .agg(count(lit(1)).as("ns"))
        c.join(p, col("ck") === col("sk"), "full_outer")
          .select(coalesce(col("ck"), col("sk")).as("k"), col("nc"), col("ns"))
          .orderBy("k")
      },
      Some("""WITH c AS (SELECT c_nationkey AS ck, count(*) AS nc FROM customer GROUP BY 1),
             |s AS (SELECT s_nationkey AS sk, count(*) AS ns FROM supplier GROUP BY 1)
             |SELECT coalesce(ck, sk) AS k, nc, ns FROM c FULL OUTER JOIN s ON ck = sk
             |ORDER BY k NULLS FIRST""".stripMargin)
    ),

    // J4: left semi — customers having at least one urgent order.
    Entry(
      "j4_semi",
      (s, d) => {
        val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        Tables.customer(s, d)
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey NULLS FIRST""".stripMargin)
    ),

    // J4b: left anti — customers with no orders at all.
    Entry(
      "j4_anti",
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey NULLS FIRST""".stripMargin)
    ),

    // J5: range join — equi on the order key plus a 90-day ship window,
    // so it stays a hash join with a residual non-equi predicate (never a
    // bare theta join that would nested-loop at scale).
    Entry(
      "j5_range_join",
      (s, d) =>
        Tables.orders(s, d)
          .join(
            Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .groupBy(unix_millis(date_trunc("month", col("o_orderdate").cast("timestamp"))).as("om"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy("om"),
      Some("""SELECT epoch_ms(date_trunc('month', o_orderdate)) AS om, count(*) AS cnt
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
             |GROUP BY 1 ORDER BY om NULLS FIRST""".stripMargin)
    ),

    // J6: as-of join — for each purchase, the latest view at-or-before it
    // per user. One window scan over a single shuffle on user_id; the
    // classic self-join formulation would be quadratic per user at scale.
    Entry(
      "j6_asof",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn(
            "last_view_ms",
            last(when(col("event_type") === "view", unix_millis(col("ts"))), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "last_view_ms")
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, last_view_ms FROM (
             |SELECT user_id, event_id, event_type,
             |last_value(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END IGNORE NULLS)
             |OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ms
             |FROM events) WHERE event_type = 'purchase'
             |ORDER BY user_id NULLS FIRST, event_id NULLS FIRST""".stripMargin)
    ),

    // J10: null-safe equi-join (<=>): NULL keys match each other —
    // still hash-joinable (null-safe equality is an equi predicate),
    // unlike an OR-of-IS-NULL rewrite which would nested-loop.
    Entry(
      "j10_null_safe_join",
      (s, d) => {
        val a = Tables.customer(s, d)
          .select(when(col("c_nationkey") < 5, lit(null)).otherwise(col("c_nationkey")).as("ka"))
        val b = Tables.supplier(s, d)
          .select(when(col("s_nationkey") < 5, lit(null)).otherwise(col("s_nationkey")).as("kb"))
        a.join(b, col("ka") <=> col("kb"))
          .groupBy("ka")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("ka").asc_nulls_first)
      },
      Some("""WITH a AS (SELECT CASE WHEN c_nationkey < 5 THEN NULL ELSE c_nationkey END AS ka FROM customer),
             |b AS (SELECT CASE WHEN s_nationkey < 5 THEN NULL ELSE s_nationkey END AS kb FROM supplier)
             |SELECT ka, count(*) AS n_pairs FROM a JOIN b ON ka IS NOT DISTINCT FROM kb
             |GROUP BY 1 ORDER BY ka NULLS FIRST""".stripMargin)
    ),

    // J6b: two-table as-of join — each event attributed to the user's
    // latest at-or-before order. Implemented as a union-merge: tag both
    // streams, one shuffle on the user key, a single ordered window
    // scan carries the last order forward (kind 0 sorts before kind 1
    // at equal timestamps → the boundary is inclusive, matching ASOF's
    // <=). The per-user self-join formulation would be quadratic; this
    // is one shuffle + one sort regardless of fan-out. Ties (several
    // orders on one date) emit the date itself, so the result is
    // deterministic. Oracle: DuckDB's native ASOF LEFT JOIN.
    Entry(
      "j6b_asof_join",
      (s, d) => {
        val o = Tables.orders(s, d).select(
          col("o_custkey").as("uid"),
          col("o_orderdate").cast("timestamp").as("t"),
          lit(null).cast("long").as("event_id"),
          lit(0).as("kind"))
        val e = Tables.events(s, d).select(
          col("user_id").as("uid"),
          col("ts").as("t"),
          col("event_id"),
          lit(1).as("kind"))
        val w = Window.partitionBy("uid").orderBy(col("t").asc, col("kind").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        o.unionByName(e)
          .withColumn("last_order_ms",
            last(when(col("kind") === 0, unix_millis(col("t"))), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(col("event_id"), col("uid").as("user_id"), col("last_order_ms"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, e.user_id, epoch_ms(o.o_orderdate) AS last_order_ms
             |FROM events e ASOF LEFT JOIN orders o
             |ON e.user_id = o.o_custkey AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)
             |ORDER BY event_id NULLS FIRST""".stripMargin)
    ),

    // J7: cross join — only legal over bounded dims (5 × 25 rows).
    Entry(
      "j7_cross",
      (s, d) =>
        Tables.region(s, d).crossJoin(Tables.nation(s, d))
          .select("r_name", "n_name")
          .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
             |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)
    ),

    // J8: force sort-merge on the big⋈big spine via hint — the physical
    // plan 100 TB would pick anyway once both sides exceed broadcast size.
    Entry(
      "j8_sort_merge",
      (s, d) =>
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d).hint("merge"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("o_orderpriority"),
      Some(s"""SELECT o_orderpriority, ${dsumSql("l_quantity")} AS sum_qty
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY 1 ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // J11: interval-overlap join (range × range — j5 is point-in-range)
    // — user sessions overlapping per-type "campaign" windows (first
    // occurrence + 2 h). The scale path is the classic bucket-equi
    // decomposition: both interval sets explode to the hour buckets
    // they cover, the join is an EQUI join on bucket with the overlap
    // predicate as residual, and pair dedup collapses multi-bucket
    // matches — never a nested-loop theta join. The campaign side is
    // type-cardinality → broadcast; sessions explode to ~1 bucket each
    // (30-min gap cap keeps spans short). DuckDB replays with the
    // direct theta join — same semantics, feasible at oracle scale.
    Entry(
      "j11_interval_overlap",
      (s, d) => {
        val H = 3600L * 1000000L
        val sess = Analytics.sessionize(Tables.events(s, d))
          .select(col("user_id"), col("session_idx"), col("start_us"), col("end_us"))
        val camp = Tables.events(s, d)
          .groupBy("event_type")
          .agg(min(unix_micros(col("ts"))).as("c0"))
          .select(col("event_type"), col("c0"), (col("c0") + 2 * H).as("c1"))
        val sb = sess.withColumn("bkt",
          explode(sequence(expr(s"start_us DIV $H"), expr(s"end_us DIV $H"))))
        val cb = camp.withColumn("bkt",
          explode(sequence(expr(s"c0 DIV $H"), expr(s"c1 DIV $H"))))
        sb.join(broadcast(cb), Seq("bkt"))
          .filter(col("start_us") <= col("c1") && col("c0") <= col("end_us"))
          .select("user_id", "session_idx", "event_type").distinct()
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_sessions"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy("event_type")
      },
      Some(s"""WITH e AS (SELECT user_id, event_id, event_type, value,
             |  epoch_us(ts) AS us FROM events),
             |f AS (SELECT *, CASE WHEN us - lag(us) OVER w > 1800000000
             |    OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |g AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
             |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |    AS session_idx FROM f),
             |sess AS (SELECT user_id, session_idx, min(us) AS start_us,
             |    max(us) AS end_us FROM g GROUP BY 1, 2),
             |camp AS (SELECT event_type, min(epoch_us(ts)) AS c0,
             |    min(epoch_us(ts)) + ${2 * 3600L * 1000000L} AS c1
             |  FROM events GROUP BY 1),
             |hits AS (SELECT DISTINCT s.user_id, s.session_idx, c.event_type
             |  FROM sess s JOIN camp c
             |    ON s.start_us <= c.c1 AND c.c0 <= s.end_us)
             |SELECT event_type, count(*) AS n_sessions,
             |  count(DISTINCT user_id) AS n_users
             |FROM hits GROUP BY 1 ORDER BY event_type NULLS FIRST""".stripMargin)
    )
  )
}
