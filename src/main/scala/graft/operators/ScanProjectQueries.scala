package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryRegistry._
import graft.sources.Tables

/** Scans, projection, filter, sort/limit, set ops — SURVEY.md §2.C rows
  * C1–C4, P1–P2, S1–S3. Covers the reference's A1/A2/A3/A4/A5/A9 surface
  * ([R] etl.py: read.json glob → select/alias/filter → partitioned
  * parquet write). All scans are declarative so Catalyst pushes filters
  * and prunes columns down to the parquet reader (SURVEY.md §4.2).
  */
object ScanProjectQueries {

  val entries: Seq[Entry] = Seq(
    // C1: plain parquet scan + projection. Column pruning: only 3 of 11
    // lineitem columns should appear in ReadSchema.
    Entry(
      "c1_scan_projection",
      (s, d) =>
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST""".stripMargin)
    ),

    // C2: glob-path scan (reference A1 reads `song_data/*/*/*/*.json`).
    Entry(
      "c2_glob_scan",
      (s, d) =>
        s.read.parquet(s"$d/event*.parquet")
          .select("event_id", "event_type")
          .orderBy("event_id"),
      Some("SELECT event_id, event_type FROM events ORDER BY event_id NULLS FIRST")
    ),

    // C14: dirty-record ingestion — every 7th props payload is
    // corrupted at the head, then parsed permissively: valid rows keep
    // their extracted field, malformed rows surface as valid=false
    // instead of failing the job (crawl data is never clean). Spark's
    // PERMISSIVE from_json yields a struct with null FIELDS on
    // malformed input (never a null struct), so validity is defined at
    // field level — every clean record here carries k, making
    // k-extraction ≡ DuckDB's json_valid.
    Entry(
      "c14_dirty_ingest",
      (s, d) => {
        val j = when(col("event_id") % 7 === 0, concat(lit("{broken"), col("props")))
          .otherwise(col("props"))
        Tables.events(s, d)
          .select(col("event_id"), from_json(j, lit("k INT")).as("p"))
          .select(col("event_id"),
            col("p.k").isNotNull.as("valid"),
            col("p.k").as("k"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, json_valid(j) AS valid,
             |CASE WHEN json_valid(j) THEN CAST(json_extract(j, '$.k') AS INT) END AS k
             |FROM (SELECT event_id,
             |  CASE WHEN event_id % 7 = 0 THEN '{broken' || props ELSE props END AS j
             |  FROM events) t
             |ORDER BY event_id NULLS FIRST""".stripMargin)
    ),

    // C3: JSON-in-string extraction over events.props.
    Entry(
      "c3_json_extract",
      (s, d) =>
        Tables.events(s, d)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").as("k_str"),
            get_json_object(col("props"), "$.k").cast("int").as("k_int"))
          .orderBy("event_id"),
      Some("""SELECT event_id, json_extract_string(props, '$.k') AS k_str,
             |CAST(json_extract_string(props, '$.k') AS INT) AS k_int
             |FROM events ORDER BY event_id NULLS FIRST""".stripMargin)
    ),

    // C4: partitioned parquet write → re-read with partition pruning
    // (reference A2: write.partitionBy(...).mode("overwrite").parquet).
    // Oracle runs the equivalent query on the original table — the
    // roundtrip must be lossless.
    Entry(
      "c4_partitioned_roundtrip",
      (s, d) => {
        val out = s"${sys.props("java.io.tmpdir")}/graft_c4_${new java.io.File(d).getName}"
        Tables.lineitem(s, d)
          .withColumn("ship_year", year(col("l_shipdate")))
          // one writer per partition value: without this, every one of
          // the N shuffle tasks writes a file into every ship_year dir
          // (N×years small files — the classic small-file explosion).
          .repartition(col("ship_year"))
          .write.mode("overwrite").partitionBy("ship_year").parquet(out)
        s.read.parquet(out)
          .filter(col("ship_year").between(1996, 1998))
          .groupBy("ship_year", "l_returnflag")
          .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("ship_year", "l_returnflag")
      },
      Some(s"""SELECT year(l_shipdate) AS ship_year, l_returnflag, count(*) AS cnt,
              |${dsumSql("l_quantity")} AS sum_qty
              |FROM lineitem WHERE year(l_shipdate) BETWEEN 1996 AND 1998
              |GROUP BY 1, 2 ORDER BY ship_year NULLS FIRST, l_returnflag NULLS FIRST""".stripMargin)
    ),

    // C8: CSV roundtrip with an EXPLICIT schema — the 100 TB ingest
    // stance (schema inference over CSV reads the data twice and
    // guesses; a declared StructType reads once and fails fast).
    Entry(
      "c8_csv_ingest",
      (s, d) => {
        import org.apache.spark.sql.types._
        val out = s"${sys.props("java.io.tmpdir")}/graft_c8_${new java.io.File(d).getName}"
        Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
          .write.mode("overwrite").option("header", "true").csv(out)
        val schema = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_totalprice", DoubleType)))
        s.read.schema(schema).option("header", "true").csv(out)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
          .orderBy("o_orderstatus")
      },
      Some(s"""SELECT o_orderstatus, count(*) AS n, ${dsumSql("o_totalprice")} AS sum_price
              |FROM orders GROUP BY 1 ORDER BY o_orderstatus NULLS FIRST""".stripMargin)
    ),

    // C9: ORC roundtrip — the second columnar at-rest format Spark
    // ships natively; written sorted-by-key within files so min/max
    // stripe statistics stay selective.
    Entry(
      "c9_orc_roundtrip",
      (s, d) => {
        val out = s"${sys.props("java.io.tmpdir")}/graft_c9_${new java.io.File(d).getName}"
        Tables.customer(s, d).sortWithinPartitions("c_custkey")
          .write.mode("overwrite").orc(out)
        s.read.orc(out)
          .filter(col("c_acctbal") > 0)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
          .orderBy("c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, count(*) AS n, ${dsumSql("c_acctbal")} AS sum_bal
              |FROM customer WHERE c_acctbal > 0
              |GROUP BY 1 ORDER BY c_mktsegment NULLS FIRST""".stripMargin)
    ),

    // C10: schema evolution — a later batch adds a column; mergeSchema
    // reconciles the footers and back-fills nulls (the data-lake
    // reality the reference's overwrite-only pipeline never faces).
    Entry(
      "c10_schema_evolution",
      (s, d) => {
        val out = s"${sys.props("java.io.tmpdir")}/graft_c10_${new java.io.File(d).getName}"
        val c = Tables.customer(s, d)
        // modulo split: both batches non-empty at every scale factor
        c.filter(col("c_custkey") % 2 === 0).select("c_custkey", "c_name")
          .write.mode("overwrite").parquet(s"$out/batch=1")
        c.filter(col("c_custkey") % 2 === 1).select("c_custkey", "c_name", "c_acctbal")
          .write.mode("overwrite").parquet(s"$out/batch=2")
        s.read.option("mergeSchema", "true").option("basePath", out).parquet(out)
          .groupBy("batch")
          .agg(count(lit(1)).as("n"), count(col("c_acctbal")).as("n_bal"))
          .orderBy("batch")
      },
      Some("""SELECT 1 AS batch, count(*) AS n, 0 AS n_bal FROM customer WHERE c_custkey % 2 = 0
             |UNION ALL
             |SELECT 2, count(*), count(c_acctbal) FROM customer WHERE c_custkey % 2 = 1
             |ORDER BY batch""".stripMargin)
    ),

    // C7: deterministic systematic sample — key-mod filtering instead of
    // rand(): reproducible across runs/engines, pushes down to the scan,
    // and at 100 TB gives an unbiased ~5% slice without a shuffle (the
    // standard trick for training-data subsampling pipelines).
    Entry(
      "c7_systematic_sample",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(pmod(col("l_orderkey"), lit(97)) < 5)
          .agg(count(lit(1)).as("n_sampled"),
               dsum(col("l_quantity")).as("sum_qty"),
               countDistinct(col("l_orderkey")).as("n_orders")),
      Some(s"""SELECT count(*) AS n_sampled, ${dsumSql("l_quantity")} AS sum_qty,
              |count(DISTINCT l_orderkey) AS n_orders
              |FROM lineitem WHERE l_orderkey % 97 < 5""".stripMargin)
    ),

    // C15: stratified fixed-quota sampling — exactly k docs per
    // (source, lang) stratum, chosen by md5 order (deterministic,
    // coordination-free "random"). This is how eval/holdout sets are
    // carved from a training corpus with guaranteed per-stratum
    // representation. One shuffle on the stratum key; the per-stratum
    // heap is k-bounded, so at 100 TB the window state is
    // O(strata × k), not O(corpus).
    Entry(
      "c15_stratified_sample",
      (s, d) =>
        Curation.stratifiedSample(
            Tables.documents(s, d).select(col("source"), col("lang"), col("doc_id")),
            Seq("source", "lang"), 3, "doc_id")
          .orderBy("source", "lang", "doc_id"),
      Some("""SELECT source, lang, doc_id FROM (
             |  SELECT source, lang, doc_id,
             |    row_number() OVER (PARTITION BY source, lang
             |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':strat'), doc_id) AS rn
             |  FROM documents)
             |WHERE rn <= 3
             |ORDER BY source NULLS FIRST, lang NULLS FIRST, doc_id NULLS FIRST""".stripMargin)
    ),

    // P1: projection + rename + computed column (reference A4/A9).
    // Revenue rounds through an exact DECIMAL(28,6): double products land
    // on exact .xx5 half-way points where Spark's HALF_UP and DuckDB's
    // rounding disagree (ADVICE.md r01); the decimal path makes both
    // engines round the same exact value.
    Entry(
      "p1_project_compute",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(
            col("l_orderkey").as("okey"),
            col("l_linenumber").as("line"),
            round((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast("decimal(28,6)"), 2).cast("double").as("revenue"),
            (col("l_quantity") + lit(1.0)).as("qty_plus1"))
          .orderBy("okey", "line"),
      Some("""SELECT l_orderkey AS okey, l_linenumber AS line,
             |CAST(round(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)), 2) AS DOUBLE) AS revenue,
             |l_quantity + 1.0 AS qty_plus1
             |FROM lineitem ORDER BY okey NULLS FIRST, line NULLS FIRST""".stripMargin)
    ),

    // P2: predicate zoo — AND/OR, BETWEEN, IN, LIKE, IS NULL (reference A5).
    Entry(
      "p2_filters",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(
            col("l_quantity").between(10, 20) &&
            col("l_returnflag").isin("A", "R") &&
            (col("l_linestatus") === "F" || col("l_discount") < 0.05) &&
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            nullif(col("l_returnflag"), lit("N")).isNotNull &&
            col("l_returnflag").like("%A%"))
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
             |WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A','R')
             |AND (l_linestatus = 'F' OR l_discount < 0.05)
             |AND l_shipdate >= TIMESTAMP '1997-01-01'
             |AND nullif(l_returnflag, 'N') IS NOT NULL
             |AND l_returnflag LIKE '%A%'
             |ORDER BY l_orderkey NULLS FIRST, l_linenumber NULLS FIRST""".stripMargin)
    ),

    // S1: global top-k — Spark plans TakeOrderedAndProject, no full sort.
    Entry(
      "s1_top_n",
      (s, d) =>
        Tables.orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .limit(100),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS FIRST LIMIT 100""".stripMargin)
    ),

    // S2: unionByName of two heterogeneous projections.
    Entry(
      "s2_union",
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(lit("cust").as("kind"), col("c_name").as("name"), col("c_acctbal").as("bal"))
        val p = Tables.supplier(s, d)
          .select(col("s_acctbal").as("bal"), lit("supp").as("kind"), col("s_name").as("name"))
        c.unionByName(p).orderBy("kind", "name")
      },
      Some("""SELECT 'cust' AS kind, c_name AS name, c_acctbal AS bal FROM customer
             |UNION ALL SELECT 'supp', s_name, s_acctbal FROM supplier
             |ORDER BY kind NULLS FIRST, name NULLS FIRST""".stripMargin)
    ),

    // S2b: UNION with set semantics (distinct across inputs).
    Entry(
      "s2_union_distinct",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_nationkey").as("k"))
        val p = Tables.supplier(s, d).select(col("s_nationkey").as("k"))
        c.union(p).distinct().orderBy("k")
      },
      Some("""SELECT c_nationkey AS k FROM customer
             |UNION SELECT s_nationkey FROM supplier
             |ORDER BY k NULLS FIRST""".stripMargin)
    ),

    // S4: multiset (bag) semantics — EXCEPT ALL / INTERSECT ALL keep
    // duplicate multiplicity, unlike S3's set semantics.
    Entry(
      "s4_multiset_ops",
      (s, d) => {
        val a = Tables.lineitem(s, d).select(col("l_quantity").cast("int").as("q")).filter(col("q") <= 10)
        val b = Tables.lineitem(s, d).select(col("l_quantity").cast("int").as("q")).filter(col("q").between(5, 15))
        val ex = a.exceptAll(b).groupBy("q").agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
        val in = a.intersectAll(b).groupBy("q").agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
        ex.unionByName(in).orderBy("op", "q")
      },
      Some("""WITH a AS (SELECT CAST(l_quantity AS INT) AS q FROM lineitem WHERE l_quantity <= 10),
             |b AS (SELECT CAST(l_quantity AS INT) AS q FROM lineitem WHERE l_quantity BETWEEN 5 AND 15),
             |ex AS (SELECT q, count(*) AS n, 'except_all' AS op FROM (SELECT q FROM a EXCEPT ALL SELECT q FROM b) GROUP BY q),
             |ia AS (SELECT q, count(*) AS n, 'intersect_all' AS op FROM (SELECT q FROM a INTERSECT ALL SELECT q FROM b) GROUP BY q)
             |SELECT * FROM ex UNION ALL SELECT * FROM ia
             |ORDER BY op NULLS FIRST, q NULLS FIRST""".stripMargin)
    ),

    // S5: limit + offset pagination over a total order.
    Entry(
      "s5_limit_offset",
      (s, d) =>
        Tables.orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .select("o_orderkey", "o_totalprice")
          .offset(100)
          .limit(50),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS FIRST
             |LIMIT 50 OFFSET 100""".stripMargin)
    ),

    // S3: intersect / except (set semantics).
    Entry(
      "s3_intersect_except",
      (s, d) => {
        val ck = Tables.customer(s, d).select(col("c_nationkey").as("k"))
        val sk = Tables.supplier(s, d).select(col("s_nationkey").as("k"))
        val both = ck.intersect(sk).select(lit("both").as("kind"), col("k"))
        val only = ck.except(sk).select(lit("cust_only").as("kind"), col("k"))
        both.unionByName(only).orderBy("kind", "k")
      },
      Some("""WITH b AS (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier),
             |e AS (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)
             |SELECT 'both' AS kind, k FROM b UNION ALL SELECT 'cust_only' AS kind, k FROM e
             |ORDER BY kind NULLS FIRST, k NULLS FIRST""".stripMargin)
    ),

    // C17: table profiling — the ANALYZE/data-quality primitive: one
    // long-format stats row per column (nulls, exact distinct, min,
    // max as canonical strings). ONE scan computes every column's
    // aggregates (Catalyst evaluates them as a single multi-aggregate
    // pass — at 100 TB profiling must not scan per column); the
    // long-format pivot is a constant-size literal explode on the
    // 1-row aggregate output. Doubles are rounded before string-
    // rendering so both engines print identical canonical text.
    Entry(
      "c17_profile",
      (s, d) => {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        def canon(c: org.apache.spark.sql.Column) = c.cast("string")
        // one aggregate branch per profiled column (r19, guide §2):
        // the single-aggregate spelling with four exact countDistincts
        // expanded the scan 5× and pushed 3M rows through a
        // sort-aggregate (the round's slowest task stage); per-column
        // branches each scan just their column (columnar parquet reads
        // nothing else), keep every distinct count a plain two-level
        // hash agg, and the union is 4 rows. Output identical.
        cols.map { c =>
          val v0 = col(c)
          val v = if (c == "o_totalprice") round(v0, 4) else v0
          spread(Tables.orders(s, d))
            .select(v.as(c))
            .agg(
              count(lit(1)).as("n_rows"),
              sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
              countDistinct(col(c)).as("n_distinct"),
              canon(min(col(c))).as("min_val"),
              canon(max(col(c))).as("max_val"))
            .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
              col("n_distinct"), col("min_val"), col("max_val"))
        }.reduce(_ unionByName _)
          .orderBy("column")
      },
      Some("""WITH a AS (SELECT count(*) AS n_rows,
             |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_n,
             |  count(DISTINCT o_orderkey) AS k_d,
             |  CAST(min(o_orderkey) AS VARCHAR) AS k_mn, CAST(max(o_orderkey) AS VARCHAR) AS k_mx,
             |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_n,
             |  count(DISTINCT o_custkey) AS c_d,
             |  CAST(min(o_custkey) AS VARCHAR) AS c_mn, CAST(max(o_custkey) AS VARCHAR) AS c_mx,
             |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_n,
             |  count(DISTINCT o_orderstatus) AS s_d,
             |  min(o_orderstatus) AS s_mn, max(o_orderstatus) AS s_mx,
             |  CAST(sum(CASE WHEN round(o_totalprice, 4) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t_n,
             |  count(DISTINCT round(o_totalprice, 4)) AS t_d,
             |  CAST(min(round(o_totalprice, 4)) AS VARCHAR) AS t_mn,
             |  CAST(max(round(o_totalprice, 4)) AS VARCHAR) AS t_mx
             |  FROM orders)
             |SELECT 'o_custkey' AS "column", n_rows, c_n AS n_nulls, c_d AS n_distinct,
             |  c_mn AS min_val, c_mx AS max_val FROM a
             |UNION ALL SELECT 'o_orderkey', n_rows, k_n, k_d, k_mn, k_mx FROM a
             |UNION ALL SELECT 'o_orderstatus', n_rows, s_n, s_d, s_mn, s_mx FROM a
             |UNION ALL SELECT 'o_totalprice', n_rows, t_n, t_d, t_mn, t_mx FROM a
             |ORDER BY "column" NULLS FIRST""".stripMargin)
    )
  )
}
