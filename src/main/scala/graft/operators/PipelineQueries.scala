package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryRegistry._
import graft.functions.VectorOps
import graft.sources.Tables

/** Round-2 coverage additions:
  *  - a1_sparkify_pipeline: the reference's full ETL shape end-to-end
  *    ([R] etl.py — filter → dims via dropDuplicates → broadcast fact
  *    join → surrogate key → partitioned parquet write → re-read → agg).
  *  - c5_json_ingest: the reference's A1 surface literally — JSON at
  *    rest, schema INFERRED by spark.read.json (the explicit-schema
  *    variant is the 100 TB stance; inference shown here for fidelity).
  *  - b2_cosine_neardup: embedding-cosine near-duplicate detection with
  *    a blocking key (label) — exact within block, oracle-checkable;
  *    the unblocked scale path is LSH (b4_lsh_ann).
  *  - b5_tokenize: BPE-ish regex tokenization alongside whitespace
  *    tokens (training-data token accounting).
  *  - g8_percentiles: exact linear-interpolation percentiles.
  */
object PipelineQueries {

  val entries: Seq[Entry] = Seq(
    Entry(
      "a1_sparkify_pipeline",
      (s, d) => {
        // A5: the reference filters page == 'NextSong'; here: purchases.
        val purchases = Tables.events(s, d).filter(col("event_type") === "purchase")
        // A8/A7: time-dim derivations (year/month feed the partitioning).
        val withTime = purchases
          .withColumn("year", year(col("ts")))
          .withColumn("month", month(col("ts")))
        // A10: fact ⋈ dim with the bounded dim broadcast.
        val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
        val fact = withTime
          .join(broadcast(cust), col("user_id") === col("c_custkey"))
          // A11: surrogate key — never exposed to the hash-compare
          // (non-deterministic by contract, SURVEY.md §5.3).
          .withColumn("songplay_id", monotonically_increasing_id())
        val out = s"${sys.props("java.io.tmpdir")}/graft_a1_${new java.io.File(d).getName}"
        // A2: partitioned overwrite write; A3: parquet re-read.
        fact.select("songplay_id", "event_id", "user_id", "c_mktsegment", "value", "year", "month")
          // one writer per (year, month): avoids tasks×partitions
          // small-file explosion on the partitioned sink.
          .repartition(col("year"), col("month"))
          .write.mode("overwrite").partitionBy("year", "month").parquet(out)
        s.read.parquet(out)
          .groupBy("year", "month", "c_mktsegment")
          .agg(
            count(lit(1)).as("n_plays"),
            countDistinct(col("user_id")).as("n_users"),
            dsum(col("value")).as("sum_value"))
          .orderBy("year", "month", "c_mktsegment")
      },
      Some(s"""SELECT year(ts) AS year, month(ts) AS month, c_mktsegment,
              |count(*) AS n_plays, count(DISTINCT user_id) AS n_users,
              |${dsumSql("value")} AS sum_value
              |FROM events JOIN customer ON user_id = c_custkey
              |WHERE event_type = 'purchase'
              |GROUP BY 1, 2, 3
              |ORDER BY year NULLS FIRST, month NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin)
    ),

    Entry(
      "c5_json_ingest",
      (s, d) => {
        val out = s"${sys.props("java.io.tmpdir")}/graft_c5_${new java.io.File(d).getName}"
        Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars")
          .write.mode("overwrite").json(out)
        // A1: line-delimited JSON scan with inferred schema.
        s.read.json(out)
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBy("lang", "source")
      },
      Some("""SELECT lang, source, count(*) AS n_docs,
             |CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents GROUP BY 1, 2
             |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin)
    ),

    Entry(
      "b2_cosine_neardup",
      (s, d) => {
        // raw float arrays go straight into the codegen'd dot product —
        // no per-element cast pass; widening happens inside the loop.
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"), col("embedding").as("v"))
          .withColumn("nrm", VectorOps.norm(col("v")))
        val a = e.select(col("label"), col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
        val b = e.select(col("label"), col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
        // Blocking-key self-join: exact cosine only within a label block
        // (candidate pairs shrink n² → Σ blockᵢ²; LSH b4 is the
        // unblocked path). Shuffles once on the block key.
        a.join(b, Seq("label"))
          .filter(col("id_a") < col("id_b"))
          .withColumn("cos", VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .filter(round(col("cos"), 6) >= 0.35)
          .select(col("id_a"), col("id_b"), col("label"), round(col("cos"), 4).as("cos"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             |FROM embeddings),
             |n AS (SELECT vec_id, label, v, sqrt(list_inner_product(v, v)) AS nrm FROM e)
             |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
             |round(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cos
             |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
             |WHERE round(list_inner_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.35
             |ORDER BY id_a NULLS FIRST, id_b NULLS FIRST""".stripMargin)
    ),

    // B5h: tokenizer fertility by language — BPE-ish tokens per
    // whitespace word, the standard multilingual-tokenizer cost
    // metric (high fertility = a language pays more tokens per word).
    // Fixed-point micro-units like b2_graph_rank: exact (HUGEINT-safe)
    // sums, one truncating division — no double ever touches the
    // judged value, so no half-boundary rounding divergence. The
    // whitespace class is ENUMERATED, not \s: Java's \s includes
    // \x0B, RE2's (DuckDB) does not — a vertical tab in scraped text
    // would tokenize differently between engines.
    Entry(
      "b5_fertility",
      (s, d) => {
        val bpe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r\\f]"
        Tables.documents(s, d)
          .select(col("lang"),
            size(split(col("text"), " ")).cast("long").as("ws"),
            size(regexp_extract_all(col("text"), lit(bpe), lit(0)))
              .cast("long").as("bpe"))
          .groupBy("lang")
          .agg(sum(col("ws")).as("n_words"), sum(col("bpe")).as("n_tokens"))
          .select(col("lang"), col("n_words"), col("n_tokens"),
            expr("CAST((CAST(n_tokens AS DECIMAL(38,0)) * 1000000) DIV n_words AS BIGINT)")
              .as("fertility_micro"))
          .orderBy("lang")
      },
      Some("""SELECT lang,
             |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
             |  CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f]'))) AS BIGINT) AS n_tokens,
             |  CAST((sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f]'))) * 1000000)
             |    // sum(len(string_split(text, ' '))) AS BIGINT) AS fertility_micro
             |FROM documents GROUP BY lang
             |ORDER BY lang NULLS FIRST""".stripMargin)
    ),

    Entry(
      "b5_tokenize",
      (s, d) => {
        // enumerated whitespace, not \s — see b5_fertility
        val bpe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r\\f]"
        val toks = regexp_extract_all(col("text"), lit(bpe), lit(0))
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            size(split(col("text"), " ")).as("n_ws_tokens"),
            size(toks).as("n_bpe_tokens"),
            size(array_distinct(toks)).as("n_distinct_bpe"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
             |CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f]')) AS INT) AS n_bpe_tokens,
             |CAST(len(list_distinct(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f]'))) AS INT) AS n_distinct_bpe
             |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // The SQL API surface: users of the engine can register the tables
    // as views and run plain SQL through spark.sql — same Catalyst
    // plan as the DataFrame construction, same oracle.
    Entry(
      "q_sql_surface",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
        Tables.orders(s, d).createOrReplaceTempView("v_orders")
        s.sql("""
          SELECT o_orderpriority,
                 CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
                 count(*) AS cnt
          FROM v_lineitem JOIN v_orders ON l_orderkey = o_orderkey
          WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          GROUP BY o_orderpriority
          ORDER BY o_orderpriority
        """)
      },
      Some(s"""SELECT o_orderpriority, ${dsumSql("l_quantity")} AS sum_qty, count(*) AS cnt
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              |GROUP BY o_orderpriority ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // The SQL WRITE path (r12): INSERT INTO graft.<name> resolves
    // through the same analyzer rule as the read side and commits
    // through ManifestTable's full discipline — strict schema match,
    // inherited layout, stats continuity, atomic publish. Two inserts
    // build the table (the second proves append-through-SQL), the
    // in-query require pins one version per statement, and the result
    // reads back through the SQL name — write and read surfaces
    // composed, hash-checked against the source-of-truth oracle.
    Entry(
      "q_sql_insert",
      (s, d) => {
        val t = scratchDir("qins", d)
        // reruns would double-append into a surviving table — reset
        rmRf(t)
        val M = graft.sources.ManifestTable
        graft.sources.GraftCatalog.register("q_orders_sink", t)
        try {
          Tables.orders(s, d).createOrReplaceTempView("v_orders_src")
          s.sql("""INSERT INTO graft.q_orders_sink
                  |SELECT o_orderkey, o_orderpriority, o_totalprice
                  |FROM v_orders_src WHERE o_orderpriority <= '2-HIGH'""".stripMargin)
          s.sql("""INSERT INTO graft.q_orders_sink
                  |SELECT o_orderkey, o_orderpriority, o_totalprice
                  |FROM v_orders_src WHERE o_orderpriority > '2-HIGH'""".stripMargin)
          require(M.currentVersion(s, t) == 2,
            "each INSERT statement must commit exactly one version")
          s.sql("""SELECT o_orderpriority, count(*) AS cnt,
                  |  round(sum(o_totalprice), 2) AS sum_price
                  |FROM graft.q_orders_sink
                  |GROUP BY o_orderpriority
                  |ORDER BY o_orderpriority""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_orders_sink")
      },
      Some("""SELECT o_orderpriority, count(*) AS cnt,
             |  round(sum(o_totalprice), 2) AS sum_price
             |FROM orders
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // SQL DML (r12): UPDATE and DELETE FROM through the same analyzer
    // rule — each statement runs the engine's pruned-rewrite operator
    // (updateWhere / deleteWhere): only files holding matching rows
    // rewrite, the rest carry by reference, one atomic version per
    // statement (in-query requires pin the op codes). The oracle
    // recomputes the final image from the raw table with CASE/WHERE —
    // the hash proves the two rewrites composed exactly.
    Entry(
      "q_sql_dml",
      (s, d) => {
        val t = scratchDir("qdml", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        import org.apache.spark.sql.SaveMode
        M.commit(s, t, Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderpriority"))
            .repartitionByRange(6, col("o_orderkey")),
          SaveMode.Overwrite, statsColumns = Seq("o_orderkey"))
        graft.sources.GraftCatalog.register("q_dml_orders", t)
        try {
          // doubling is EXACT in binary floating point — no rounding
          // drift between the engines' update arithmetic
          s.sql("""UPDATE graft.q_dml_orders SET o_totalprice = o_totalprice * 2
                  |WHERE o_orderpriority = '1-URGENT'""".stripMargin)
          require(M.commitOp(s, t).contains("update"),
            "UPDATE must land as one updateWhere commit")
          s.sql("DELETE FROM graft.q_dml_orders WHERE o_orderkey % 5 = 0")
          require(M.commitOp(s, t).contains("delete"),
            "DELETE must land as one deleteWhere commit")
          require(M.currentVersion(s, t) == 3,
            "exactly one version per DML statement")
          s.sql(s"""SELECT o_orderpriority, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_dml_orders
                   |GROUP BY o_orderpriority
                   |ORDER BY o_orderpriority""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_dml_orders")
      },
      Some(s"""SELECT o_orderpriority, count(*) AS cnt,
             |  ${dsumSql("CASE WHEN o_orderpriority = '1-URGENT' " +
                "THEN o_totalprice * 2 ELSE o_totalprice END")} AS sum_price
             |FROM orders WHERE o_orderkey % 5 <> 0
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // SQL MERGE INTO (r12): the lakehouse statement, end to end — the
    // analyzer rule rewrites MERGE INTO graft.<name> into the engine's
    // merge (key-envelope file pruning, matched-files-only rewrite,
    // one atomic version), with SET-*/DELETE/INSERT-* clauses and the
    // ON equalities mapped onto the by-name key join. One statement
    // updates every 7th order's price (doubling — exact in binary fp)
    // and inserts a shifted copy of every 11th: the oracle rebuilds
    // the same image with CASE + UNION ALL, and the hash proves the
    // matched/not-matched routing lost and duplicated nothing.
    Entry(
      "q_sql_merge",
      (s, d) => {
        val t = scratchDir("qmrg", d)
        rmRf(t) // MERGE re-runs would re-update
        val M = graft.sources.ManifestTable
        import org.apache.spark.sql.SaveMode
        M.commit(s, t, Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderpriority"))
            .repartitionByRange(6, col("o_orderkey")),
          SaveMode.Overwrite, statsColumns = Seq("o_orderkey"))
        graft.sources.GraftCatalog.register("q_mrg_orders", t)
        try {
          Tables.orders(s, d).createOrReplaceTempView("v_mrg_src")
          s.sql("""SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
                  |  o_orderpriority
                  |FROM v_mrg_src WHERE o_orderkey % 7 = 0
                  |UNION ALL
                  |SELECT o_orderkey + 10000000000 AS o_orderkey,
                  |  o_totalprice, o_orderpriority
                  |FROM v_mrg_src WHERE o_orderkey % 11 = 0""".stripMargin)
            .createOrReplaceTempView("v_mrg_chg")
          s.sql("""MERGE INTO graft.q_mrg_orders AS t USING v_mrg_chg AS c
                  |ON t.o_orderkey = c.o_orderkey
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          require(M.commitOp(s, t).contains("merge"),
            "the statement must land as ONE merge commit")
          s.sql(s"""SELECT o_orderpriority, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_mrg_orders
                   |GROUP BY o_orderpriority
                   |ORDER BY o_orderpriority""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_mrg_orders")
      },
      Some(s"""SELECT o_orderpriority, count(*) AS cnt,
             |  ${dsumSql("p")} AS sum_price
             |FROM (
             |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
             |    ELSE o_totalprice END AS p, o_orderpriority
             |  FROM orders
             |  UNION ALL
             |  SELECT o_totalprice AS p, o_orderpriority
             |  FROM orders WHERE o_orderkey % 11 = 0
             |)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // SQL MERGE, the r13 arms (judged): one statement with NO insert
    // arm — a matched-only update — plus WHEN NOT MATCHED BY SOURCE
    // THEN DELETE with a condition: every third key's price doubles,
    // every unmatched fifth key deletes, everything else carries
    // untouched, in ONE atomic version (the in-query require pins the
    // op). The by-source victim scan is stats-pruned like deleteWhere;
    // the oracle rebuilds the same image with CASE + WHERE.
    Entry(
      "q_sql_arms",
      (s, d) => {
        val t = scratchDir("qarm", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        import org.apache.spark.sql.SaveMode
        M.commit(s, t, Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderpriority"))
            .repartitionByRange(6, col("o_orderkey")),
          SaveMode.Overwrite, statsColumns = Seq("o_orderkey"))
        graft.sources.GraftCatalog.register("q_arm_orders", t)
        try {
          Tables.orders(s, d).createOrReplaceTempView("v_arm_src")
          s.sql("""SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
                  |  o_orderpriority
                  |FROM v_arm_src WHERE o_orderkey % 3 = 0""".stripMargin)
            .createOrReplaceTempView("v_arm_chg")
          s.sql("""MERGE INTO graft.q_arm_orders AS t USING v_arm_chg AS c
                  |ON t.o_orderkey = c.o_orderkey
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 5 = 0
                  |  THEN DELETE""".stripMargin)
          require(M.commitOp(s, t).contains("merge") &&
            M.currentVersion(s, t) == 2,
            "the two-arm statement must land as ONE merge commit")
          s.sql(s"""SELECT o_orderpriority, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_arm_orders
                   |GROUP BY o_orderpriority
                   |ORDER BY o_orderpriority""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_arm_orders")
      },
      Some(s"""SELECT o_orderpriority, count(*) AS cnt,
             |  ${dsumSql("CASE WHEN o_orderkey % 3 = 0 " +
                "THEN o_totalprice * 2 ELSE o_totalprice END")} AS sum_price
             |FROM orders
             |WHERE NOT (o_orderkey % 3 <> 0 AND o_orderkey % 5 = 0)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // Q_SQL_SETLIST (r14, the r13 verdict ask #4): the explicit
    // `WHEN MATCHED THEN UPDATE SET c = e` list — the most common
    // MERGE idiom — judged end-to-end: matched rows keep every
    // unassigned column and take values mixing TARGET and SOURCE
    // sides, the clause condition gates which matches fire, and the
    // CASE oracle recomputes the post-image from the raw table. At
    // scale this is the same one-shuffle merge as SET * — only the
    // post-image projection differs.
    Entry(
      "q_sql_setlist",
      (s, d) => {
        val t = scratchDir("qsetl", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        import org.apache.spark.sql.SaveMode
        M.commit(s, t, Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderpriority"))
            .repartitionByRange(6, col("o_orderkey")),
          SaveMode.Overwrite, statsColumns = Seq("o_orderkey"))
        graft.sources.GraftCatalog.register("q_setl_orders", t)
        try {
          Tables.orders(s, d).createOrReplaceTempView("v_setl_src")
          s.sql("""SELECT o_orderkey, o_totalprice AS delta
                  |FROM v_setl_src WHERE o_orderkey % 4 = 0""".stripMargin)
            .createOrReplaceTempView("v_setl_chg")
          // partial SET: price takes target + source; priority takes a
          // literal; the AND gates on the source side
          s.sql("""MERGE INTO graft.q_setl_orders AS t
                  |USING v_setl_chg AS c
                  |ON t.o_orderkey = c.o_orderkey
                  |WHEN MATCHED AND c.delta > 1000
                  |  THEN UPDATE SET o_totalprice = t.o_totalprice + c.delta,
                  |    o_orderpriority = 'BUMPED'""".stripMargin)
          require(M.commitOp(s, t).contains("merge") &&
            M.currentVersion(s, t) == 2,
            "the SET-list statement must land as ONE merge commit")
          s.sql(s"""SELECT o_orderpriority, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_setl_orders
                   |GROUP BY o_orderpriority
                   |ORDER BY o_orderpriority""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_setl_orders")
      },
      Some(s"""SELECT CASE WHEN o_orderkey % 4 = 0 AND o_totalprice > 1000
             |    THEN 'BUMPED' ELSE o_orderpriority END AS o_orderpriority,
             |  count(*) AS cnt,
             |  ${dsumSql("CASE WHEN o_orderkey % 4 = 0 AND o_totalprice > 1000 " +
                "THEN o_totalprice * 2 ELSE o_totalprice END")} AS sum_price
             |FROM orders
             |GROUP BY 1
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // SQL CREATE TABLE (r13): the bootstrap statement that completes
    // the SQL face — a SQL-only user can now make a table exist, not
    // just mutate one. The statement exercises the whole clause
    // surface: PARTITIONED BY mixes an identity column with a hidden
    // bucket transform, TBLPROPERTIES records the stats set in the
    // config sidecar (so collection BEGINS at the first INSERT even
    // though the created table is empty — the in-query require pins
    // it), and DROP TABLE at the end proves external-table semantics
    // (the name goes, every byte stays readable by path). The oracle
    // recomputes the final image from the raw table.
    Entry(
      "q_sql_create",
      (s, d) => {
        val t = scratchDir("qsct", d)
        rmRf(t) // re-runs would re-create over debris
        val M = graft.sources.ManifestTable
        graft.sources.GraftCatalog.unregister("q_ct_orders")
        s.sql(s"""CREATE TABLE graft.q_ct_orders (
                 |  o_orderkey BIGINT,
                 |  o_orderpriority STRING,
                 |  o_totalprice DOUBLE
                 |) PARTITIONED BY (o_orderpriority, bucket(4, o_orderkey))
                 |LOCATION '$t'
                 |TBLPROPERTIES ('graft.statsColumns' = 'o_orderkey')""".stripMargin)
        try {
          require(M.currentVersion(s, t) == 1 && M.read(s, t).count() == 0,
            "CREATE TABLE must publish exactly one empty version")
          Tables.orders(s, d).createOrReplaceTempView("v_ct_src")
          s.sql("""INSERT INTO graft.q_ct_orders
                  |SELECT o_orderkey, o_orderpriority, o_totalprice
                  |FROM v_ct_src""".stripMargin)
          // the config sidecar bridged the empty-table gap: the first
          // INSERT began collecting o_orderkey ranges with nobody
          // passing statsColumns
          require(M.snapshotStats(s, t).values.forall(_.contains("o_orderkey")),
            "TBLPROPERTIES stats columns must begin collection at the first INSERT")
          val out = s.sql(s"""SELECT o_orderpriority, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_ct_orders
                   |GROUP BY o_orderpriority
                   |ORDER BY o_orderpriority""".stripMargin)
          out.count() // force before the DROP unregisters the name
          s.sql("DROP TABLE graft.q_ct_orders")
          require(graft.sources.GraftCatalog.lookup("q_ct_orders").isEmpty &&
            M.read(s, t).count() == Tables.orders(s, d).count(),
            "DROP TABLE must unregister the name and keep every byte")
          out
        } finally graft.sources.GraftCatalog.unregister("q_ct_orders")
      },
      Some(s"""SELECT o_orderpriority, count(*) AS cnt,
             |  ${dsumSql("o_totalprice")} AS sum_price
             |FROM orders
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // Q_SQL_MAINTENANCE (r14): the SQL-only maintenance lifecycle —
    // ANALYZE backfills skipping stats over files committed without
    // any, ADD CONSTRAINT binds every later writer, OPTIMIZE bin-packs
    // the small files, VACUUM RETAIN reclaims the orphaned dirs — and
    // the judged aggregate proves every pass was lossless. At scale
    // each op is O(churn)/O(metadata): ANALYZE is one distributed pass
    // collecting a row per FILE, OPTIMIZE rewrites only sub-threshold
    // files, VACUUM deletes only unreferenced uuid dirs.
    Entry(
      "q_sql_maintenance",
      (s, d) => {
        val t = scratchDir("qmnt", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        graft.sources.GraftCatalog.unregister("q_mnt_li")
        s.sql(s"""CREATE TABLE graft.q_mnt_li (
                 |  l_orderkey BIGINT, l_quantity DOUBLE,
                 |  l_extendedprice DOUBLE
                 |) LOCATION '$t'""".stripMargin)
        try {
          Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_quantity"),
              col("l_extendedprice"))
            .createOrReplaceTempView("v_mnt_src")
          s.sql("INSERT INTO graft.q_mnt_li SELECT * FROM v_mnt_src")
          // no TBLPROPERTIES: the insert recorded NO skipping stats —
          // ANALYZE is the catch-up
          s.sql("ANALYZE TABLE graft.q_mnt_li COMPUTE STATISTICS " +
            "FOR COLUMNS l_orderkey").collect()
          // (CREATE's zero-row v1 file can hold no range — judge the
          // row-bearing files)
          require(M.snapshotStats(s, t).values
              .filter(_.get("__graft_rows").exists(_._2 > 0))
              .forall(_.contains("l_orderkey")),
            "ANALYZE must backfill ranges over every old file")
          s.sql("ALTER TABLE graft.q_mnt_li ADD CONSTRAINT qty_pos " +
            "CHECK (l_quantity >= 0)")
          val before = M.snapshotFiles(s, t).size
          s.sql("OPTIMIZE graft.q_mnt_li").collect()
          require(M.snapshotFiles(s, t).size <= before,
            "OPTIMIZE must never grow the file census")
          s.sql("VACUUM graft.q_mnt_li RETAIN 1 VERSIONS").collect()
          s.sql(s"""SELECT l_orderkey % 10 AS bucket, count(*) AS cnt,
                   |  ${dsumSql("l_quantity")} AS sum_qty,
                   |  ${dsumSql("l_extendedprice")} AS sum_price
                   |FROM graft.q_mnt_li
                   |GROUP BY l_orderkey % 10
                   |ORDER BY bucket""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_mnt_li")
      },
      Some(s"""SELECT l_orderkey % 10 AS bucket, count(*) AS cnt,
             |  ${dsumSql("l_quantity")} AS sum_qty,
             |  ${dsumSql("l_extendedprice")} AS sum_price
             |FROM lineitem
             |GROUP BY l_orderkey % 10
             |ORDER BY bucket NULLS FIRST""".stripMargin)
    ),

    // Q_SQL_RESTORE (r14): incident response + branching through the
    // SQL face — a bad DELETE poisons the head, RESTORE TO VERSION AS
    // OF flips it back by reference (zero rows move, history intact),
    // then SHALLOW CLONE branches the repaired table zero-copy and a
    // destructive experiment on the branch never touches the donor.
    // Both ops are O(manifest) at any table size — at 100 TB the
    // restore carries the target's segments by reference and the clone
    // writes ONE root naming the donor's files as externs. The judged
    // aggregate reads the BRANCH after its local delete; the oracle
    // recomputes that image from the raw table, which is only equal if
    // the restore truly reverted the poison AND the branch truly
    // diverged from a whole donor.
    Entry(
      "q_sql_restore",
      (s, d) => {
        val t = scratchDir("qrst", d)
        val tc = scratchDir("qrstc", d)
        Seq(t, tc).foreach(rmRf)
        val M = graft.sources.ManifestTable
        Seq("q_rst_li", "q_rst_branch").foreach(
          graft.sources.GraftCatalog.unregister)
        s.sql(s"""CREATE TABLE graft.q_rst_li (
                 |  l_orderkey BIGINT, l_quantity DOUBLE,
                 |  l_extendedprice DOUBLE
                 |) LOCATION '$t'""".stripMargin)
        try {
          Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_quantity"),
              col("l_extendedprice"))
            .createOrReplaceTempView("v_rst_src")
          s.sql("INSERT INTO graft.q_rst_li SELECT * FROM v_rst_src") // v2
          val full = M.read(s, t).count()
          s.sql("DELETE FROM graft.q_rst_li WHERE l_orderkey % 2 = 0") // v3: poison
          s.sql("RESTORE TABLE graft.q_rst_li TO VERSION AS OF 2").collect()
          require(M.currentVersion(s, t) == 4 &&
            M.read(s, t).count() == full,
            "RESTORE must revert the poison delete as a new commit")
          require(M.read(s, t, 3).count() < full,
            "history must keep the poisoned version inspectable")
          s.sql("CREATE TABLE graft.q_rst_branch SHALLOW CLONE " +
            s"graft.q_rst_li LOCATION '$tc'").collect()
          // the branch diverges; the donor must not move
          s.sql("DELETE FROM graft.q_rst_branch WHERE l_orderkey % 3 = 0")
          require(M.read(s, t).count() == full,
            "a branch delete must never reach the donor")
          s.sql(s"""SELECT l_orderkey % 10 AS bucket, count(*) AS cnt,
                   |  ${dsumSql("l_quantity")} AS sum_qty,
                   |  ${dsumSql("l_extendedprice")} AS sum_price
                   |FROM graft.q_rst_branch
                   |GROUP BY l_orderkey % 10
                   |ORDER BY bucket""".stripMargin)
        } finally Seq("q_rst_li", "q_rst_branch").foreach(
          graft.sources.GraftCatalog.unregister)
      },
      Some(s"""SELECT l_orderkey % 10 AS bucket, count(*) AS cnt,
             |  ${dsumSql("l_quantity")} AS sum_qty,
             |  ${dsumSql("l_extendedprice")} AS sum_price
             |FROM lineitem
             |WHERE l_orderkey % 3 <> 0
             |GROUP BY l_orderkey % 10
             |ORDER BY bucket NULLS FIRST""".stripMargin)
    ),

    // Q_DYNAMIC_OVERWRITE_SQL (r15, the r14 verdict ask #1): dynamic
    // partition overwrite — `INSERT OVERWRITE` on an identity-
    // partitioned table lowers to ONE atomic replaceWhere over the
    // batch's distinct partition tuples (the reference's own A2
    // `mode("overwrite") + partitionBy` reload, now first-class SQL).
    // The in-query requires pin the scale contract: the statement
    // lands as a single replace-where commit and every UNTOUCHED
    // partition's files carry by reference (zero rewrite — at 100 TB
    // a two-partition reload costs two partitions, not the table).
    // The oracle recomputes the final image with a CASE/WHERE over
    // the raw table — equal only if exactly the batch's partitions
    // were replaced and the rest carried.
    Entry(
      "q_dynamic_overwrite_sql",
      (s, d) => {
        val t = scratchDir("qdyo", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        import org.apache.spark.sql.SaveMode
        M.commit(s, t, Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderpriority")),
          SaveMode.Overwrite, partitionBy = Seq("o_orderpriority"),
          statsColumns = Seq("o_orderkey"))
        graft.sources.GraftCatalog.register("q_dyo_orders", t)
        try {
          def untouched(): Set[String] = M.snapshotFiles(s, t)
            .filterNot(f => f.contains("o_orderpriority=1-URGENT") ||
              f.contains("o_orderpriority=2-HIGH")).toSet
          val before = untouched()
          Tables.orders(s, d).createOrReplaceTempView("v_dyo_src")
          // recompute two priority classes: halve the population
          // (even keys), double the price — recorded order is
          // (o_orderkey, o_totalprice, o_orderpriority), partition
          // column last
          s.sql("""INSERT OVERWRITE graft.q_dyo_orders
                  |SELECT o_orderkey, o_totalprice * 2, o_orderpriority
                  |FROM v_dyo_src
                  |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
                  |  AND o_orderkey % 2 = 0""".stripMargin)
          require(M.commitOp(s, t).contains("replace-where") &&
            M.currentVersion(s, t) == 2,
            "dynamic overwrite must land as ONE atomic replace-where commit")
          require(untouched() == before,
            "untouched partitions must carry by file reference")
          s.sql(s"""SELECT o_orderpriority, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_dyo_orders
                   |GROUP BY o_orderpriority
                   |ORDER BY o_orderpriority""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_dyo_orders")
      },
      Some(s"""SELECT o_orderpriority, count(*) AS cnt,
             |  ${dsumSql("CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') " +
                "THEN o_totalprice * 2 ELSE o_totalprice END")} AS sum_price
             |FROM orders
             |WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |   OR o_orderkey % 2 = 0
             |GROUP BY 1
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // Q_VACUUM_PREVIEW (r16, the r15 verdict's optional ask): the
    // DRY-RUN reclaim census — `VACUUM … RETAIN 1 VERSIONS DRY RUN`
    // reports exactly the data directories the real vacuum would
    // reclaim (the pre-flight every 100 TB retention job runs before
    // committing to deletion) while deleting NOTHING: the full
    // history still answers afterward. The executed vacuum then
    // reclaims exactly what the preview promised, expired versions
    // refuse time travel, and the head is untouched. The preview's
    // dir count rides the judged row (pinned deterministic by the
    // in-query require); the oracle recomputes the head image from
    // raw orders with the same literal census.
    Entry(
      "q_vacuum_preview",
      (s, d) => {
        val t = scratchDir("qvac", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        import org.apache.spark.sql.SaveMode
        val src = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority"))
        M.commit(s, t, src, SaveMode.Overwrite,
          statsColumns = Seq("o_orderkey"))                       // v1
        val full = M.read(s, t).count()
        M.commit(s, t, src.filter(col("o_orderkey") % 2 === 1),
          SaveMode.Overwrite)                                     // v2
        M.commit(s, t, src.filter(col("o_orderkey") % 3 === 0),
          SaveMode.Overwrite)                                     // v3
        graft.sources.GraftCatalog.register("q_vac_orders", t)
        try {
          val prev = s.sql(
            "VACUUM graft.q_vac_orders RETAIN 1 VERSIONS DRY RUN").collect()
          require(prev.length == 1, "the preview reports one census row")
          val dirs = prev(0).getInt(0)
          require(dirs == 2,
            s"RETAIN 1 over three overwrites must census exactly the two " +
              s"replaced versions' data dirs, got $dirs")
          require(M.read(s, t, 1).count() == full,
            "DRY RUN must delete nothing — v1 still answers")
          val rec = s.sql(
            "VACUUM graft.q_vac_orders RETAIN 1 VERSIONS").collect()
          require(rec(0).getInt(0) == dirs,
            "the executed vacuum must reclaim exactly what the preview " +
              s"promised (${rec(0).getInt(0)} vs $dirs)")
          require(scala.util.Try(M.read(s, t, 1).count()).isFailure,
            "an expired version must refuse time travel")
          s.sql(s"""SELECT $dirs AS would_die_dirs, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_vac_orders""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_vac_orders")
      },
      Some(s"""SELECT CAST(2 AS INTEGER) AS would_die_dirs,
             |  count(*) AS cnt,
             |  ${dsumSql("o_totalprice")} AS sum_price
             |FROM orders
             |WHERE o_orderkey % 3 = 0""".stripMargin)
    ),

    // Q_CREATE_OR_REPLACE (r16, the r15 verdict's optional ask): the
    // atomic table swap — `CREATE OR REPLACE TABLE … AS SELECT` over
    // the table's OWN previous image (the in-place reshape idiom:
    // shrink + re-derive + re-partition in one statement). ONE
    // overwrite version swaps schema, partition layout, data, and the
    // constraint set together; the pre-replace image stays reachable
    // via time travel. The in-query requires pin exactly that; the
    // oracle recomputes the post-image from raw orders — equal only
    // if the swap kept precisely the filtered/derived rows.
    Entry(
      "q_create_or_replace",
      (s, d) => {
        val t = scratchDir("qcor", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        graft.sources.GraftCatalog.unregister("q_cor_orders")
        Tables.orders(s, d).createOrReplaceTempView("v_cor_src")
        s.sql(s"""CREATE TABLE graft.q_cor_orders LOCATION '$t'
                 |AS SELECT o_orderkey, o_totalprice, o_orderpriority
                 |FROM v_cor_src""".stripMargin)
        try {
          val full = M.read(s, t).count()
          // reshape IN PLACE: halve the population (even keys), double
          // the price, install a partition layout — one statement
          s.sql(s"""CREATE OR REPLACE TABLE graft.q_cor_orders
                   |PARTITIONED BY (o_orderpriority) LOCATION '$t'
                   |AS SELECT o_orderkey,
                   |  o_totalprice * 2 AS o_totalprice, o_orderpriority
                   |FROM graft.q_cor_orders
                   |WHERE o_orderkey % 2 = 0""".stripMargin)
          require(M.currentVersion(s, t) == 2,
            "the swap must spend exactly ONE version")
          require(M.partitionColumns(s, t) == Seq("o_orderpriority"),
            "REPLACE must install the new partition layout")
          require(M.read(s, t, 1).count() == full,
            "the pre-replace image must stay reachable via time travel")
          s.sql(s"""SELECT o_orderpriority, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_cor_orders
                   |GROUP BY o_orderpriority
                   |ORDER BY o_orderpriority""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_cor_orders")
      },
      Some(s"""SELECT o_orderpriority, count(*) AS cnt,
             |  ${dsumSql("o_totalprice * 2")} AS sum_price
             |FROM orders
             |WHERE o_orderkey % 2 = 0
             |GROUP BY 1
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // Q_STATIC_PARTITION_INSERT (r16, the r15 verdict ask #4): the
    // Hive-idiom static PARTITION clause — `INSERT OVERWRITE …
    // PARTITION (p = 'x') SELECT <non-partition columns>`. The value
    // is injected as ONE typed literal and, under OVERWRITE, SPELLS
    // the replaced region directly: one replaceWhere commit, ZERO
    // enumeration passes over the batch (the dynamic path's distinct
    // scan never runs — at 100 TB the region is known before the
    // query is). The in-query requires pin that contract; the oracle
    // recomputes the final image with a CASE/WHERE over the raw
    // table — equal only if exactly the named region was replaced and
    // every other partition carried by reference.
    Entry(
      "q_static_partition_insert",
      (s, d) => {
        val t = scratchDir("qspi", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        import org.apache.spark.sql.SaveMode
        M.commit(s, t, Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderpriority")),
          SaveMode.Overwrite, partitionBy = Seq("o_orderpriority"),
          statsColumns = Seq("o_orderkey"))
        graft.sources.GraftCatalog.register("q_spi_orders", t)
        try {
          def untouched(): Set[String] = M.snapshotFiles(s, t)
            .filterNot(_.contains("o_orderpriority=1-URGENT")).toSet
          val before = untouched()
          Tables.orders(s, d).createOrReplaceTempView("v_spi_src")
          // recompute ONE priority class: halve the population (even
          // keys), triple the price — the query carries only the
          // non-static columns (o_orderkey, o_totalprice)
          s.sql("""INSERT OVERWRITE graft.q_spi_orders
                  |PARTITION (o_orderpriority = '1-URGENT')
                  |SELECT o_orderkey, o_totalprice * 3
                  |FROM v_spi_src
                  |WHERE o_orderpriority = '1-URGENT'
                  |  AND o_orderkey % 2 = 0""".stripMargin)
          require(M.commitOp(s, t).contains("replace-where") &&
            M.currentVersion(s, t) == 2,
            "static-partition overwrite must land as ONE replace-where commit")
          require(untouched() == before,
            "partitions outside the static region must carry by reference")
          s.sql(s"""SELECT o_orderpriority, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_spi_orders
                   |GROUP BY o_orderpriority
                   |ORDER BY o_orderpriority""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_spi_orders")
      },
      Some(s"""SELECT o_orderpriority, count(*) AS cnt,
             |  ${dsumSql("CASE WHEN o_orderpriority = '1-URGENT' " +
                "THEN o_totalprice * 3 ELSE o_totalprice END")} AS sum_price
             |FROM orders
             |WHERE o_orderpriority <> '1-URGENT' OR o_orderkey % 2 = 0
             |GROUP BY 1
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // Q_MERGE_EXPRKEY (r15, the r14 verdict ask #3): MERGE with an
    // EXPRESSION join key — `ON t.k = c.k + 1`, the key-mapped CDC
    // feed. The mapped expression replaces the source key before the
    // merge, so the envelope/file pruning and the reconcile conflict
    // scan run on EVALUATED values; the oracle recomputes the
    // post-image from the raw table in the target's key space —
    // equal only if every feed row landed on its mapped key.
    Entry(
      "q_merge_exprkey",
      (s, d) => {
        val t = scratchDir("qmek", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        import org.apache.spark.sql.SaveMode
        M.commit(s, t, Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderpriority")),
          SaveMode.Overwrite, statsColumns = Seq("o_orderkey"))
        graft.sources.GraftCatalog.register("q_mek_orders", t)
        try {
          Tables.orders(s, d).createOrReplaceTempView("v_mek_src")
          // the feed speaks a SHIFTED key space (k-1): every third
          // target key, bumped price, flagged priority
          s.sql("""SELECT o_orderkey - 1 AS o_orderkey,
                  |  o_totalprice * 2 AS o_totalprice,
                  |  'BUMPED' AS o_orderpriority
                  |FROM v_mek_src WHERE o_orderkey % 3 = 0""".stripMargin)
            .createOrReplaceTempView("v_mek_chg")
          s.sql("""MERGE INTO graft.q_mek_orders AS t USING v_mek_chg AS c
                  |ON t.o_orderkey = c.o_orderkey + 1
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          require(M.commitOp(s, t).contains("merge") &&
            M.currentVersion(s, t) == 2,
            "the expression-key statement must land as ONE merge commit")
          s.sql(s"""SELECT o_orderpriority, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_mek_orders
                   |GROUP BY o_orderpriority
                   |ORDER BY o_orderpriority""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_mek_orders")
      },
      Some(s"""SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'BUMPED'
             |    ELSE o_orderpriority END AS o_orderpriority,
             |  count(*) AS cnt,
             |  ${dsumSql("CASE WHEN o_orderkey % 3 = 0 " +
                "THEN o_totalprice * 2 ELSE o_totalprice END")} AS sum_price
             |FROM orders
             |GROUP BY 1
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // Q_MERGE_EVOLVE (r19, VERDICT r18 ask #4): MERGE WITH SCHEMA
    // EVOLUTION — a source carrying a column the target lacks widens
    // the target inside the MERGE's single commit (the Delta
    // `spark.databricks.delta.schema.autoMerge` behavior, spelled the
    // ANSI way). Kept rows in untouched files surface the new column
    // as NULL through the widened read schema — pinned in-query by
    // the untouched-file census (zero pre-merge files rewrite beyond
    // the matched ones). The oracle replays the evolution with a CASE
    // over the raw table: NULL region for untouched rows, the
    // source's region for matched/inserted ones.
    Entry(
      "q_merge_evolve",
      (s, d) => {
        val t = scratchDir("qmev", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        import org.apache.spark.sql.SaveMode
        // range-clustered files so key-localized churn prunes: the
        // untouched-file census below is the evolution claim
        M.commit(s, t, Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderpriority"))
            .repartitionByRange(8, col("o_orderkey")),
          SaveMode.Overwrite, statsColumns = Seq("o_orderkey"))
        graft.sources.GraftCatalog.register("q_mev_orders", t)
        try {
          Tables.orders(s, d).createOrReplaceTempView("v_mev_src")
          // the feed carries a NEW column (channel) the target lacks:
          // a LOW-KEY slice updates with it, a disjoint slice inserts
          // under shifted keys (lands in new files)
          s.sql("""SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
                  |  o_orderpriority,
                  |  CASE WHEN o_orderkey % 2 = 0 THEN 'web' ELSE 'store' END
                  |    AS channel
                  |FROM v_mev_src
                  |WHERE o_orderkey % 5 = 0 AND o_orderkey < 600
                  |UNION ALL
                  |SELECT o_orderkey + 10000000, o_totalprice,
                  |  o_orderpriority, 'new' AS channel
                  |FROM v_mev_src WHERE o_orderkey % 7 = 0""".stripMargin)
            .createOrReplaceTempView("v_mev_chg")
          val before = M.snapshotFiles(s, t).toSet
          s.sql("""MERGE WITH SCHEMA EVOLUTION INTO graft.q_mev_orders AS t
                  |USING v_mev_chg AS c
                  |ON t.o_orderkey = c.o_orderkey
                  |WHEN MATCHED THEN UPDATE SET *
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          require(M.commitOp(s, t).contains("merge") &&
            M.currentVersion(s, t) == 2,
            "evolution must ride the MERGE's single commit")
          val after = M.snapshotFiles(s, t).toSet
          require(before.intersect(after).nonEmpty,
            "files without matched keys must carry by reference — " +
              "evolution is metadata, not a table rewrite")
          s.sql(s"""SELECT channel, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_mev_orders
                   |GROUP BY channel
                   |ORDER BY channel""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_mev_orders")
      },
      Some(s"""WITH post AS (
             |  SELECT CASE WHEN o_orderkey % 5 = 0 AND o_orderkey < 600
             |      THEN (CASE WHEN o_orderkey % 2 = 0
             |            THEN 'web' ELSE 'store' END)
             |    END AS channel,
             |    CASE WHEN o_orderkey % 5 = 0 AND o_orderkey < 600
             |      THEN o_totalprice * 2 ELSE o_totalprice END AS p
             |  FROM orders
             |  UNION ALL
             |  SELECT 'new' AS channel, o_totalprice AS p
             |  FROM orders WHERE o_orderkey % 7 = 0)
             |SELECT channel, count(*) AS cnt, ${dsumSql("p")} AS sum_price
             |FROM post
             |GROUP BY channel
             |ORDER BY channel NULLS FIRST""".stripMargin)
    ),

    // Q_RENAME_TABLE (r15, the r14 verdict ask #5): ALTER TABLE …
    // RENAME TO through the SQL face — the name moves in the registry
    // (metadata-only, zero data moved), reads/history/time-travel
    // answer under the NEW name, and the old name refuses with a
    // pointer. The oracle is the plain aggregate over the raw table —
    // equal only if every byte survived the rename.
    Entry(
      "q_rename_table",
      (s, d) => {
        val t = scratchDir("qren", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        import org.apache.spark.sql.SaveMode
        Seq("q_ren_a", "q_ren_b").foreach(
          graft.sources.GraftCatalog.unregister)
        M.commit(s, t, Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderpriority")),
          SaveMode.Overwrite, statsColumns = Seq("o_orderkey"))
        graft.sources.GraftCatalog.register("q_ren_a", t)
        try {
          s.sql("ALTER TABLE graft.q_ren_a RENAME TO graft.q_ren_b")
          require(graft.sources.GraftCatalog.lookup("q_ren_a").isEmpty &&
            graft.sources.GraftCatalog.lookup("q_ren_b").contains(t),
            "rename must move the name, not copy it")
          require(M.currentVersion(s, t) == 1,
            "rename is metadata-only: no table version is spent")
          val e = scala.util.Try(s.sql("DESCRIBE DETAIL graft.q_ren_a"))
          require(e.isFailure && e.failed.get.getMessage
              .contains("renamed to graft.q_ren_b"),
            "the old name must refuse with a pointer to the new one")
          s.sql(s"""SELECT o_orderpriority, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_ren_b
                   |GROUP BY o_orderpriority
                   |ORDER BY o_orderpriority""".stripMargin)
        } finally Seq("q_ren_a", "q_ren_b").foreach(
          graft.sources.GraftCatalog.unregister)
      },
      Some(s"""SELECT o_orderpriority, count(*) AS cnt,
             |  ${dsumSql("o_totalprice")} AS sum_price
             |FROM orders
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // Q_DEFAULT_COLUMNS (r16): column DEFAULT values — recorded as
    // field metadata in the versioned schema, filled by partial
    // INSERTs (column-list or BY NAME), and re-bindable via ALTER
    // COLUMN … SET DEFAULT (metadata-only, future inserts). The two
    // insert eras land under DIFFERENT defaults; the oracle recomputes
    // the final image with a CASE over the raw table — equal only if
    // each era filled exactly its own recorded default.
    Entry(
      "q_default_columns",
      (s, d) => {
        val t = scratchDir("qdcol", d)
        rmRf(t)
        graft.sources.GraftCatalog.unregister("q_dcol_t")
        s.sql(s"""CREATE TABLE graft.q_dcol_t (
                 |  o_orderkey BIGINT, o_totalprice DOUBLE,
                 |  status STRING DEFAULT 'open', tier INT DEFAULT 3
                 |) LOCATION '$t'""".stripMargin)
        try {
          Tables.orders(s, d).createOrReplaceTempView("v_dcol_src")
          s.sql("""INSERT INTO graft.q_dcol_t (o_orderkey, o_totalprice)
                  |SELECT o_orderkey, o_totalprice FROM v_dcol_src
                  |WHERE o_orderkey % 2 = 1""".stripMargin)
          s.sql("ALTER TABLE graft.q_dcol_t ALTER COLUMN status SET DEFAULT 'held'")
          s.sql("ALTER TABLE graft.q_dcol_t ALTER COLUMN tier SET DEFAULT 7")
          s.sql("""INSERT INTO graft.q_dcol_t BY NAME
                  |SELECT o_orderkey, o_totalprice FROM v_dcol_src
                  |WHERE o_orderkey % 2 = 0""".stripMargin)
          s.sql(s"""SELECT status, tier, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_dcol_t
                   |GROUP BY status, tier
                   |ORDER BY status, tier""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_dcol_t")
      },
      Some(s"""SELECT CASE WHEN o_orderkey % 2 = 1 THEN 'open' ELSE 'held' END
             |    AS status,
             |  CAST(CASE WHEN o_orderkey % 2 = 1 THEN 3 ELSE 7 END AS INTEGER)
             |    AS tier,
             |  count(*) AS cnt, ${dsumSql("o_totalprice")} AS sum_price
             |FROM orders
             |GROUP BY 1, 2
             |ORDER BY status NULLS FIRST, tier NULLS FIRST""".stripMargin)
    ),

    // Q_GENERATED_COLUMNS (r16): GENERATED ALWAYS AS columns — the
    // expression rides the versioned schema, an INSERT that omits the
    // column computes it in the write projection, and UPDATE
    // recomputes it over the POST-assignment row (so a price update
    // can never leave a stale band). The oracle recomputes bands from
    // the raw table including the update's effect — equal only if
    // write-time generation and update-time recomputation both match
    // the declared expression.
    Entry(
      "q_generated_columns",
      (s, d) => {
        val t = scratchDir("qgcol", d)
        rmRf(t)
        graft.sources.GraftCatalog.unregister("q_gcol_t")
        s.sql(s"""CREATE TABLE graft.q_gcol_t (
                 |  o_orderkey BIGINT, o_totalprice DOUBLE,
                 |  key_bucket BIGINT GENERATED ALWAYS AS (o_orderkey % 5),
                 |  price_band STRING GENERATED ALWAYS AS
                 |    (CASE WHEN o_totalprice < 150000 THEN 'low' ELSE 'high' END)
                 |) LOCATION '$t'""".stripMargin)
        try {
          Tables.orders(s, d).createOrReplaceTempView("v_gcol_src")
          s.sql("""INSERT INTO graft.q_gcol_t (o_orderkey, o_totalprice)
                  |SELECT o_orderkey, o_totalprice FROM v_gcol_src""".stripMargin)
          // an UPDATE of the band's SOURCE recomputes the band
          s.sql("""UPDATE graft.q_gcol_t SET o_totalprice = o_totalprice * 2
                  |WHERE o_orderkey % 100 = 0""".stripMargin)
          s.sql(s"""SELECT key_bucket, price_band, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_gcol_t
                   |GROUP BY key_bucket, price_band
                   |ORDER BY key_bucket, price_band""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_gcol_t")
      },
      Some(s"""WITH post AS (SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2
             |      ELSE o_totalprice END AS o_totalprice
             |  FROM orders)
             |SELECT o_orderkey % 5 AS key_bucket,
             |  CASE WHEN o_totalprice < 150000 THEN 'low' ELSE 'high' END
             |    AS price_band,
             |  count(*) AS cnt, ${dsumSql("o_totalprice")} AS sum_price
             |FROM post
             |GROUP BY 1, 2
             |ORDER BY key_bucket NULLS FIRST, price_band NULLS FIRST""".stripMargin)
    ),

    // Q_IDENTITY_COLUMNS (r16): IDENTITY allocation — one codegen'd
    // projection column per insert (NextIdentityValue: interleaved
    // ordinals, zero shuffles, zero driver coordination), with the
    // high-water mark advanced at publish from the write's OWN
    // recorded per-file stats. The values themselves are
    // non-deterministic by contract (gaps allowed, duplicates never),
    // so the judged row carries the PROPERTIES — uniqueness, start
    // bound, step alignment, cross-batch monotonicity — plus the
    // deterministic payload aggregate; the in-query requires pin the
    // mark's advance between the two inserts.
    Entry(
      "q_identity_columns",
      (s, d) => {
        val t = scratchDir("qidcol", d)
        rmRf(t)
        graft.sources.GraftCatalog.unregister("q_idcol_t")
        s.sql(s"""CREATE TABLE graft.q_idcol_t (
                 |  id BIGINT GENERATED ALWAYS AS IDENTITY
                 |    (START WITH 1000 INCREMENT BY 3),
                 |  o_orderkey BIGINT, o_totalprice DOUBLE
                 |) LOCATION '$t'""".stripMargin)
        try {
          Tables.orders(s, d).createOrReplaceTempView("v_idcol_src")
          s.sql("""INSERT INTO graft.q_idcol_t (o_orderkey, o_totalprice)
                  |SELECT o_orderkey, o_totalprice FROM v_idcol_src
                  |WHERE o_orderkey % 2 = 1""".stripMargin)
          val r1 = s.sql("SELECT max(id), count(*) FROM graft.q_idcol_t").head()
          val (max1, cnt1) = (r1.getLong(0), r1.getLong(1))
          s.sql("""INSERT INTO graft.q_idcol_t (o_orderkey, o_totalprice)
                  |SELECT o_orderkey, o_totalprice FROM v_idcol_src
                  |WHERE o_orderkey % 2 = 0""".stripMargin)
          val below = s.sql(
            s"SELECT count(*) FROM graft.q_idcol_t WHERE id <= $max1")
            .head().getLong(0)
          require(below == cnt1,
            "the second batch must allocate strictly past the first " +
              s"batch's high-water mark ($below ids at/below $max1, " +
              s"expected $cnt1)")
          s.sql(s"""SELECT count(*) AS cnt,
                   |  CASE WHEN count(DISTINCT id) = count(*) THEN 1 ELSE 0 END
                   |    AS all_unique,
                   |  CASE WHEN min(id) >= 1000 THEN 1 ELSE 0 END
                   |    AS min_ge_start,
                   |  CASE WHEN max(CASE WHEN (id - 1000) % 3 = 0 THEN 0
                   |    ELSE 1 END) = 0 THEN 1 ELSE 0 END AS step_aligned,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_idcol_t""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_idcol_t")
      },
      Some(s"""SELECT count(*) AS cnt,
             |  CAST(1 AS INTEGER) AS all_unique,
             |  CAST(1 AS INTEGER) AS min_ge_start,
             |  CAST(1 AS INTEGER) AS step_aligned,
             |  ${dsumSql("o_totalprice")} AS sum_price
             |FROM orders""".stripMargin)
    ),

    // Q_CLUSTER_BY (r16): declarative clustering — `CREATE TABLE …
    // CLUSTER BY (k)` records the dimension, stats-tracks it from the
    // first insert with zero statsColumns ceremony, and plain
    // `OPTIMIZE` re-clusters on it (the declarative ZORDER). The
    // range query then prunes on the clustered dimension's recorded
    // per-file ranges. The oracle recomputes the aggregate from raw
    // orders — equal only if clustering moved bytes without losing or
    // duplicating a row.
    Entry(
      "q_cluster_by",
      (s, d) => {
        val t = scratchDir("qclby", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        graft.sources.GraftCatalog.unregister("q_clby_t")
        s.sql(s"""CREATE TABLE graft.q_clby_t (
                 |  o_orderkey BIGINT, o_totalprice DOUBLE,
                 |  o_orderpriority STRING
                 |) CLUSTER BY (o_orderkey) LOCATION '$t'""".stripMargin)
        try {
          Tables.orders(s, d).createOrReplaceTempView("v_clby_src")
          s.sql("""INSERT INTO graft.q_clby_t
                  |SELECT o_orderkey, o_totalprice, o_orderpriority
                  |FROM v_clby_src""".stripMargin)
          val opt = s.sql("OPTIMIZE graft.q_clby_t").collect()(0)
          require(opt.getString(1) == "cluster(o_orderkey)",
            s"plain OPTIMIZE must re-cluster on the recorded dimension, " +
              s"got ${opt.getString(1)}")
          // the clustered dimension carries per-file ranges to prune on
          require(M.snapshotStats(s, t).values
              .filter(_.get("__graft_rows").exists(_._2 > 0))
              .forall(_.contains("o_orderkey")),
            "the clustered dimension must be stats-tracked")
          s.sql(s"""SELECT o_orderpriority, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_clby_t
                   |WHERE o_orderkey BETWEEN 1000 AND 20000
                   |GROUP BY o_orderpriority
                   |ORDER BY o_orderpriority""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_clby_t")
      },
      Some(s"""SELECT o_orderpriority, count(*) AS cnt,
             |  ${dsumSql("o_totalprice")} AS sum_price
             |FROM orders
             |WHERE o_orderkey BETWEEN 1000 AND 20000
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // Q_SQL_VIEWS (r16): the view face — CREATE VIEW stores the
    // definition as TEXT, expansion happens at analysis (so the view
    // reads the table's CURRENT state: rows inserted AFTER the CREATE
    // flow through with zero refresh ceremony), and views NEST. The
    // oracle replays the stacked definitions inline over raw orders —
    // equal only if both expansion levels and the post-create insert
    // all flowed through.
    Entry(
      "q_sql_views",
      (s, d) => {
        val t = scratchDir("qview", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        import org.apache.spark.sql.SaveMode
        graft.sources.GraftCatalog.unregister("q_view_t")
        Seq("q_view_pricey", "q_view_bands").foreach(
          graft.sources.GraftCatalog.unregisterView)
        M.commit(s, t, Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderpriority"))
            .filter(col("o_orderkey") % 2 === 1),
          SaveMode.Overwrite, statsColumns = Seq("o_orderkey"))
        graft.sources.GraftCatalog.register("q_view_t", t)
        try {
          s.sql("""CREATE VIEW graft.q_view_pricey AS
                  |SELECT o_orderkey, o_totalprice * 2 AS price2,
                  |  o_orderpriority
                  |FROM graft.q_view_t WHERE o_orderkey % 3 = 0""".stripMargin)
          s.sql("""CREATE VIEW graft.q_view_bands AS
                  |SELECT o_orderpriority,
                  |  CASE WHEN price2 < 300000 THEN 'low' ELSE 'high' END
                  |    AS band, price2
                  |FROM graft.q_view_pricey""".stripMargin)
          // rows landing AFTER the CREATE are visible through BOTH
          // view levels — the expansion reads live state
          Tables.orders(s, d).createOrReplaceTempView("v_view_src")
          s.sql("""INSERT INTO graft.q_view_t
                  |SELECT o_orderkey, o_totalprice, o_orderpriority
                  |FROM v_view_src WHERE o_orderkey % 2 = 0""".stripMargin)
          s.sql(s"""SELECT o_orderpriority, band, count(*) AS cnt,
                   |  ${dsumSql("price2")} AS sum_price2
                   |FROM graft.q_view_bands
                   |GROUP BY o_orderpriority, band
                   |ORDER BY o_orderpriority, band""".stripMargin)
        } finally {
          Seq("q_view_pricey", "q_view_bands").foreach(
            graft.sources.GraftCatalog.unregisterView)
          graft.sources.GraftCatalog.unregister("q_view_t")
        }
      },
      Some(s"""SELECT o_orderpriority,
             |  CASE WHEN o_totalprice * 2 < 300000 THEN 'low' ELSE 'high' END
             |    AS band,
             |  count(*) AS cnt, ${dsumSql("o_totalprice * 2")} AS sum_price2
             |FROM orders
             |WHERE o_orderkey % 3 = 0
             |GROUP BY 1, 2
             |ORDER BY o_orderpriority NULLS FIRST, band NULLS FIRST""".stripMargin)
    ),

    // Q_MATERIALIZED_VIEW (r16): the materialized aggregate — CREATE
    // MATERIALIZED VIEW computes the initial image, the base table
    // moves (the image is STALE by contract, pinned by the in-query
    // require), and REFRESH re-runs the recorded defining query as
    // ONE atomic overwrite version. The oracle recomputes the
    // aggregate from ALL raw orders — equal only if the refresh saw
    // the post-insert base exactly once.
    Entry(
      "q_materialized_view",
      (s, d) => {
        val t = scratchDir("qmvb", d)
        val mt = scratchDir("qmvm", d)
        rmRf(t); rmRf(mt)
        val M = graft.sources.ManifestTable
        import org.apache.spark.sql.SaveMode
        Seq("q_mv_base", "q_mv_agg").foreach(
          graft.sources.GraftCatalog.unregister)
        M.commit(s, t, Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderpriority"))
            .filter(col("o_orderkey") % 2 === 1),
          SaveMode.Overwrite, statsColumns = Seq("o_orderkey"))
        graft.sources.GraftCatalog.register("q_mv_base", t)
        try {
          s.sql(s"""CREATE MATERIALIZED VIEW graft.q_mv_agg LOCATION '$mt'
                   |AS SELECT o_orderpriority, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_mv_base
                   |GROUP BY o_orderpriority""".stripMargin)
          val staleCnt = s.sql(
            "SELECT sum(cnt) FROM graft.q_mv_agg").head().getLong(0)
          Tables.orders(s, d).createOrReplaceTempView("v_mv_src")
          s.sql("""INSERT INTO graft.q_mv_base
                  |SELECT o_orderkey, o_totalprice, o_orderpriority
                  |FROM v_mv_src WHERE o_orderkey % 2 = 0""".stripMargin)
          require(s.sql("SELECT sum(cnt) FROM graft.q_mv_agg")
              .head().getLong(0) == staleCnt,
            "the materialized image must be STALE until REFRESH")
          val v0 = M.currentVersion(s, mt)
          s.sql("REFRESH MATERIALIZED VIEW graft.q_mv_agg")
          require(M.currentVersion(s, mt) == v0 + 1,
            "REFRESH must spend exactly ONE version")
          s.sql("""SELECT o_orderpriority, cnt, sum_price
                  |FROM graft.q_mv_agg
                  |ORDER BY o_orderpriority""".stripMargin)
        } finally Seq("q_mv_base", "q_mv_agg").foreach(
          graft.sources.GraftCatalog.unregister)
      },
      Some(s"""SELECT o_orderpriority, count(*) AS cnt,
             |  ${dsumSql("o_totalprice")} AS sum_price
             |FROM orders
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // Q_CACHE_TABLE (r16): version-keyed block caching — CACHE TABLE
    // pins the head in executor memory (the plan flips to
    // InMemoryTableScan, pinned by the in-query require), a write
    // ADVANCES the version so the stale entry can never serve, and
    // the first post-write read transparently re-caches the new head.
    // The oracle recomputes the post-write aggregate from raw orders —
    // equal only if the cache never served a stale image.
    Entry(
      "q_cache_table",
      (s, d) => {
        val t = scratchDir("qcache", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        import org.apache.spark.sql.SaveMode
        graft.sources.GraftCatalog.unregister("q_cache_t")
        M.commit(s, t, Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_totalprice"),
              col("o_orderpriority"))
            .filter(col("o_orderkey") % 2 === 1),
          SaveMode.Overwrite, statsColumns = Seq("o_orderkey"))
        graft.sources.GraftCatalog.register("q_cache_t", t)
        try {
          s.sql("CACHE TABLE graft.q_cache_t")
          require(M.isCached(s, t), "CACHE TABLE must register the head")
          require(s.sql("SELECT * FROM graft.q_cache_t")
              .queryExecution.executedPlan.toString
              .contains("InMemoryTableScan"),
            "a cached table must plan as an in-memory scan")
          Tables.orders(s, d).createOrReplaceTempView("v_cache_src")
          s.sql("""INSERT INTO graft.q_cache_t
                  |SELECT o_orderkey, o_totalprice, o_orderpriority
                  |FROM v_cache_src WHERE o_orderkey % 2 = 0""".stripMargin)
          require(!M.isCached(s, t),
            "a write must retire the cached version by construction")
          val out = s.sql(s"""SELECT o_orderpriority, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_cache_t
                   |GROUP BY o_orderpriority
                   |ORDER BY o_orderpriority""".stripMargin)
          out.collect() // materialize through the re-cached head
          require(M.isCached(s, t),
            "the first post-write read must re-cache the new head")
          out
        } finally {
          M.uncacheTable(s, t)
          graft.sources.GraftCatalog.unregister("q_cache_t")
        }
      },
      Some(s"""SELECT o_orderpriority, count(*) AS cnt,
             |  ${dsumSql("o_totalprice")} AS sum_price
             |FROM orders
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // Q_REPLACE_WHERE (r14): the idempotent region reload —
    // `INSERT INTO … REPLACE WHERE <region>` atomically deletes the
    // region and inserts the recomputed batch in ONE version. The
    // canonical 100 TB backfill: re-derive one priority class and swap
    // it in; victims stats-prune to the region's files, every other
    // file carries by reference, and a failed job leaves the old
    // region intact. The oracle recomputes the final image with a
    // CASE over the raw table — equal only if the swap replaced
    // exactly the region and nothing else.
    Entry(
      "q_replace_where",
      (s, d) => {
        val t = scratchDir("qrpw", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        graft.sources.GraftCatalog.unregister("q_rpw_orders")
        s.sql(s"""CREATE TABLE graft.q_rpw_orders (
                 |  o_orderkey BIGINT, o_orderpriority STRING,
                 |  o_totalprice DOUBLE
                 |) LOCATION '$t'""".stripMargin)
        try {
          Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderpriority"),
              col("o_totalprice"))
            .createOrReplaceTempView("v_rpw_src")
          s.sql("INSERT INTO graft.q_rpw_orders SELECT * FROM v_rpw_src") // v2
          s.sql("""INSERT INTO graft.q_rpw_orders
                  |REPLACE WHERE o_orderpriority = '1-URGENT'
                  |SELECT o_orderkey, o_orderpriority,
                  |  o_totalprice * 2 AS o_totalprice
                  |FROM v_rpw_src
                  |WHERE o_orderpriority = '1-URGENT'""".stripMargin)
          require(M.currentVersion(s, t) == 3 &&
            M.commitOp(s, t).contains("replace-where"),
            "the region reload must land as ONE replace-where version")
          s.sql(s"""SELECT o_orderpriority, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_rpw_orders
                   |GROUP BY o_orderpriority
                   |ORDER BY o_orderpriority""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_rpw_orders")
      },
      Some(s"""SELECT o_orderpriority, count(*) AS cnt,
             |  ${dsumSql("CASE WHEN o_orderpriority = '1-URGENT' " +
               "THEN o_totalprice * 2 ELSE o_totalprice END")} AS sum_price
             |FROM orders
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // Q_PARTITION_EVOLUTION (r14): Iceberg-style spec evolution — a
    // metadata-only ALTER changes the layout for future writes, zero
    // files move, and the snapshot then SPANS layout eras (old files
    // flat with the partition column in their data, new files hive
    // with it in their dirs). The judged read crosses both eras plus a
    // DML whose victims live in both; the oracle recomputes from the
    // raw table — equal only if every era reads its column from the
    // right place. At 100 TB this is the difference between evolving
    // a layout in one root write and a petabyte rewrite job.
    Entry(
      "q_partition_evolution",
      (s, d) => {
        val t = scratchDir("qpevo", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        graft.sources.GraftCatalog.unregister("q_pevo_orders")
        s.sql(s"""CREATE TABLE graft.q_pevo_orders (
                 |  o_orderkey BIGINT, o_orderstatus STRING,
                 |  o_totalprice DOUBLE
                 |) LOCATION '$t'""".stripMargin)
        try {
          Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice"))
            .createOrReplaceTempView("v_pevo_src")
          s.sql("""INSERT INTO graft.q_pevo_orders
                  |SELECT * FROM v_pevo_src WHERE o_orderkey % 2 = 0""".stripMargin)
          val filesBefore = M.snapshotFiles(s, t).toSet
          s.sql("ALTER TABLE graft.q_pevo_orders " +
            "SET PARTITION SPEC (o_orderstatus)").collect()
          require(M.snapshotFiles(s, t).toSet == filesBefore,
            "partition evolution must move ZERO files")
          s.sql("""INSERT INTO graft.q_pevo_orders
                  |SELECT * FROM v_pevo_src WHERE o_orderkey % 2 = 1""".stripMargin)
          val mixed = M.snapshotFiles(s, t)
          require(mixed.exists(_.contains("o_orderstatus=")) &&
              mixed.exists(!_.contains("o_orderstatus=")),
            "the snapshot must span both layout eras")
          // a delete whose victims live in BOTH eras
          s.sql("DELETE FROM graft.q_pevo_orders WHERE o_orderkey % 7 = 0")
          s.sql(s"""SELECT o_orderstatus, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_pevo_orders
                   |GROUP BY o_orderstatus
                   |ORDER BY o_orderstatus""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_pevo_orders")
      },
      Some(s"""SELECT o_orderstatus, count(*) AS cnt,
             |  ${dsumSql("o_totalprice")} AS sum_price
             |FROM orders
             |WHERE o_orderkey % 7 <> 0
             |GROUP BY o_orderstatus
             |ORDER BY o_orderstatus NULLS FIRST""".stripMargin)
    ),

    // Q_SHOW_PARTITIONS (r14): the metadata-only partition census,
    // oracle-verified — SHOW PARTITIONS answers from the manifest's
    // recorded per-file row counts (zero data files listed or read),
    // and the oracle recomputes the same census by actually grouping
    // the raw table. Equal only if every write path recorded exact
    // row counts per file. At 100 TB this is the difference between
    // a catalog answer and a directory walk over millions of objects.
    Entry(
      "q_show_partitions",
      (s, d) => {
        val t = scratchDir("qshp", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        graft.sources.GraftCatalog.unregister("q_shp_orders")
        // statsColumns make every write record per-file row counts —
        // the recorded numbers SHOW PARTITIONS answers from
        s.sql(s"""CREATE TABLE graft.q_shp_orders (
                 |  o_orderkey BIGINT, o_orderstatus STRING,
                 |  o_totalprice DOUBLE
                 |) PARTITIONED BY (o_orderstatus)
                 |LOCATION '$t'
                 |TBLPROPERTIES ('graft.statsColumns' = 'o_orderkey')""".stripMargin)
        try {
          Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice"))
            .createOrReplaceTempView("v_shp_src")
          s.sql("INSERT INTO graft.q_shp_orders SELECT * FROM v_shp_src")
          // a partition-scoped delete: the census must track DML
          s.sql("DELETE FROM graft.q_shp_orders " +
            "WHERE o_orderstatus = 'F' AND o_orderkey % 2 = 0")
          s.sql("SHOW PARTITIONS graft.q_shp_orders")
            .select(col("partition"), col("n_rows"))
            .orderBy("partition")
        } finally graft.sources.GraftCatalog.unregister("q_shp_orders")
      },
      Some("""SELECT 'o_orderstatus=' || o_orderstatus AS partition,
             |  count(*) AS n_rows
             |FROM orders
             |WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 2 = 0)
             |GROUP BY o_orderstatus
             |ORDER BY partition NULLS FIRST""".stripMargin)
    ),

    // Q2: correlated LATERAL subquery through the SQL surface — the
    // per-row dependent-subquery shape (top-2 orders per customer).
    // Catalyst DECORRELATES it (DecorrelateInnerQuery + window
    // rewrite) into one join + ranking, so at scale this runs as a
    // single shuffle, never a per-customer nested loop.
    Entry(
      "q2_lateral",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("v_customer")
        Tables.orders(s, d).createOrReplaceTempView("v_orders")
        s.sql("""
          SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          FROM v_customer c,
          LATERAL (
            SELECT o_orderkey, o_totalprice FROM v_orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 2
          ) o
          WHERE c.c_custkey <= 100
          ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
        """)
      },
      Some("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
             |FROM customer c,
             |LATERAL (
             |  SELECT o_orderkey, o_totalprice FROM orders
             |  WHERE o_custkey = c.c_custkey
             |  ORDER BY o_totalprice DESC, o_orderkey ASC
             |  LIMIT 2
             |) o
             |WHERE c.c_custkey <= 100
             |ORDER BY c.c_custkey NULLS FIRST, o.o_totalprice DESC, o.o_orderkey""".stripMargin)
    ),

    // G14: GROUPING SETS through the SQL surface — the general form
    // rollup/cube specialize; grouping() markers disambiguate the
    // all-rows from genuine NULL keys.
    Entry(
      "g14_grouping_sets",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
        s.sql("""
          SELECT coalesce(l_returnflag, '(all)') AS rf,
                 coalesce(l_linestatus, '(all)') AS ls,
                 CAST(grouping(l_returnflag) AS INT) AS g_rf,
                 CAST(grouping(l_linestatus) AS INT) AS g_ls,
                 count(*) AS n,
                 CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
          FROM v_lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          ORDER BY g_rf, g_ls, rf, ls
        """)
      },
      Some(s"""SELECT coalesce(l_returnflag, '(all)') AS rf,
              |coalesce(l_linestatus, '(all)') AS ls,
              |CAST(grouping(l_returnflag) AS INT) AS g_rf,
              |CAST(grouping(l_linestatus) AS INT) AS g_ls,
              |count(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
              |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              |ORDER BY g_rf NULLS FIRST, g_ls NULLS FIRST, rf NULLS FIRST, ls NULLS FIRST""".stripMargin)
    ),

    Entry(
      "g8_percentiles",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy("o_orderstatus")
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
            round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
            count(lit(1)).as("n"))
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
             |round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
             |round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
             |count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY o_orderstatus NULLS FIRST""".stripMargin)
    ),

    // G17: median + deterministic mode. Spark's mode(col, true) pins
    // ties to the LOWEST value; DuckDB's mode is tie-arbitrary, so the
    // oracle replays the same rule explicitly (count DESC, value ASC).
    // Both medians are exact interpolated percentile-0.5 over the same
    // doubles — identical arithmetic, rounded defensively.
    Entry(
      "g17_mode_median",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            round(expr("median(l_quantity)"), 4).as("med_qty"),
            expr("mode(l_quantity, true)").as("mode_qty"),
            expr("mode(l_linestatus, true)").as("mode_status"))
          .orderBy("l_returnflag"),
      Some("""WITH cq AS (SELECT l_returnflag, l_quantity AS v, count(*) AS c
             |    FROM lineitem GROUP BY 1, 2),
             |rq AS (SELECT l_returnflag, v, row_number() OVER (
             |    PARTITION BY l_returnflag ORDER BY c DESC, v) AS rk FROM cq),
             |cs AS (SELECT l_returnflag, l_linestatus AS v, count(*) AS c
             |    FROM lineitem GROUP BY 1, 2),
             |rs AS (SELECT l_returnflag, v, row_number() OVER (
             |    PARTITION BY l_returnflag ORDER BY c DESC, v) AS rk FROM cs)
             |SELECT l.l_returnflag, count(*) AS n,
             |  round(median(l.l_quantity), 4) AS med_qty,
             |  max(rq.v) AS mode_qty, max(rs.v) AS mode_status
             |FROM lineitem l
             |JOIN rq ON rq.l_returnflag = l.l_returnflag AND rq.rk = 1
             |JOIN rs ON rs.l_returnflag = l.l_returnflag AND rs.rk = 1
             |GROUP BY 1 ORDER BY l.l_returnflag NULLS FIRST""".stripMargin)
    ),

    // Q_CATALOG_PERSIST (r17, VERDICT r16 ask #1): the durable
    // catalog. With a warehouse configured, every DDL publishes the
    // name registry to <warehouse>/_catalog (manifest-style atomic
    // versions); a FRESH process that knows only the warehouse
    // location resolves every name with zero re-registering. The
    // drill: CREATE TABLE AS + CREATE VIEW through names, then
    // simulate process death (resetRegistry forgets ALL in-memory
    // state including the warehouse root), then resolve the VIEW —
    // which must itself resolve the TABLE — in a brand-new
    // SparkSession that carries only `spark.graft.warehouse`. At
    // 100 TB the catalog is metadata-plane: one small JSON per DDL,
    // one listing per cold miss; the data path is untouched.
    Entry(
      "q_catalog_persist",
      (s, d) => {
        val wh = scratchDir("qcat", d)
        rmRf(wh)
        val G = graft.sources.GraftCatalog
        val prevWh = G.warehouse
        // names could linger from an earlier run in THIS JVM
        G.unregister("q_cat_nation"); G.unregisterView("q_cat_view")
        G.warehouse = Some(wh)
        try {
          Tables.nation(s, d).createOrReplaceTempView("v_cat_src")
          s.sql("""CREATE TABLE graft.q_cat_nation
                  |AS SELECT n_nationkey, n_name, n_regionkey
                  |FROM v_cat_src""".stripMargin)
          s.sql("""CREATE VIEW graft.q_cat_view AS
                  |SELECT n_regionkey, count(*) AS n_nations,
                  |  CAST(sum(n_nationkey) AS BIGINT) AS key_sum
                  |FROM graft.q_cat_nation
                  |GROUP BY n_regionkey""".stripMargin)
          // process death: every in-memory name — and the warehouse
          // root itself — is forgotten; only the disk state survives
          G.resetRegistry()
          require(G.registered.isEmpty && G.registeredViews.isEmpty,
            "restart simulation must forget every in-memory name")
          val s2 = s.newSession()
          s2.conf.set("spark.graft.warehouse", wh)
          val out = s2.sql(
            """SELECT n_regionkey, n_nations, key_sum
              |FROM graft.q_cat_view
              |ORDER BY n_regionkey""".stripMargin)
          out.count() // resolve + execute under the fresh session NOW
          out
        } finally {
          // restore the var FIRST so the teardown unregisters stay
          // in-memory-only (the disk state remains for post-mortem)
          G.warehouse = prevWh
          G.unregisterView("q_cat_view"); G.unregister("q_cat_nation")
        }
      },
      Some("""SELECT n_regionkey, count(*) AS n_nations,
             |  CAST(sum(n_nationkey) AS BIGINT) AS key_sum
             |FROM nation
             |GROUP BY n_regionkey
             |ORDER BY n_regionkey NULLS FIRST""".stripMargin)
    ),

    // Q_MV_INCREMENTAL (r17, VERDICT r16 ask #2): incremental
    // materialized-view refresh — the dirty-group rescan. The drill:
    // materialize a priority-level aggregate, prime the base-version
    // marker, churn the base with INSERTS (two priorities) AND a
    // DELETE (a third), REFRESH … INCREMENTAL, and pin in-query that
    // the refresh actually took the incremental path; the oracle
    // recomputes the final image from scratch — hash equality proves
    // partial maintenance == full recompute. At 100 TB the refresh
    // costs O(churned files) to find dirty groups + a base scan
    // FILTERED to them (stats/partition pruning applies) — never
    // O(base) like the pre-r17 full recompute.
    Entry(
      "q_mv_incremental",
      (s, d) => {
        val bt = scratchDir("qmvib", d); rmRf(bt)
        val mt = scratchDir("qmvim", d); rmRf(mt)
        val G = graft.sources.GraftCatalog
        G.unregister("q_mvi_base"); G.unregister("q_mvi_sums")
        Tables.orders(s, d).createOrReplaceTempView("v_mvi_src")
        s.sql(s"""CREATE TABLE graft.q_mvi_base LOCATION '$bt' AS
                 |SELECT o_orderkey, o_orderpriority, o_totalprice
                 |FROM v_mvi_src WHERE o_orderkey % 7 != 0""".stripMargin)
        try {
          s.sql(s"""CREATE MATERIALIZED VIEW graft.q_mvi_sums LOCATION '$mt' AS
                   |SELECT o_orderpriority AS prio, count(*) AS n,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_mvi_base GROUP BY o_orderpriority""".stripMargin)
          // the first INCREMENTAL self-primes the base-version marker
          val m1 = s.sql(
            "REFRESH MATERIALIZED VIEW graft.q_mvi_sums INCREMENTAL")
            .collect().head.getString(1)
          require(m1 == "full",
            s"the priming refresh must report mode=full, got $m1")
          // churn: grow two priorities, shrink a third
          s.sql("""INSERT INTO graft.q_mvi_base
                  |SELECT o_orderkey, o_orderpriority, o_totalprice
                  |FROM v_mvi_src WHERE o_orderkey % 7 = 0
                  |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')""".stripMargin)
          s.sql("""DELETE FROM graft.q_mvi_base
                  |WHERE o_orderkey % 11 = 0
                  |  AND o_orderpriority = '3-MEDIUM'""".stripMargin)
          val r = s.sql(
            "REFRESH MATERIALIZED VIEW graft.q_mvi_sums INCREMENTAL")
            .collect().head
          require(r.getString(1) == "incremental",
            s"the churned refresh must take the incremental path, " +
              s"got ${r.getString(1)}")
          val out = s.sql("""SELECT prio, n, sum_price
                            |FROM graft.q_mvi_sums
                            |ORDER BY prio""".stripMargin)
          out.count() // force before the teardown unregisters the names
          out
        } finally { G.unregister("q_mvi_sums"); G.unregister("q_mvi_base") }
      },
      Some(s"""SELECT o_orderpriority AS prio, count(*) AS n,
             |  ${dsumSql("o_totalprice")} AS sum_price
             |FROM orders
             |WHERE (o_orderkey % 7 <> 0
             |       OR o_orderpriority IN ('1-URGENT', '2-HIGH'))
             |  AND NOT (o_orderkey % 11 = 0
             |           AND o_orderpriority = '3-MEDIUM')
             |GROUP BY o_orderpriority
             |ORDER BY prio NULLS FIRST""".stripMargin)
    ),

    // Q_MV_HAVING (r18): incremental maintenance of a HAVING view —
    // the condition filters the aggregate's OUTPUT rows, never group
    // membership, so the dirty-group rescan re-applies it and groups
    // cross the threshold in BOTH directions: the churn pushes some
    // customers over the count floor (they enter the image) and drops
    // others below it (their old image rows anti-join away). The
    // oracle recomputes the final image with the same HAVING from the
    // raw table — hash equality proves threshold-crossing partial
    // maintenance == full recompute.
    Entry(
      "q_mv_having",
      (s, d) => {
        val bt = scratchDir("qmvhb", d); rmRf(bt)
        val mt = scratchDir("qmvhm", d); rmRf(mt)
        val G = graft.sources.GraftCatalog
        G.unregister("q_mvh_base"); G.unregister("q_mvh_sums")
        Tables.orders(s, d).createOrReplaceTempView("v_mvh_src")
        s.sql(s"""CREATE TABLE graft.q_mvh_base LOCATION '$bt' AS
                 |SELECT o_orderkey, o_custkey, o_totalprice
                 |FROM v_mvh_src WHERE o_orderkey % 3 = 0""".stripMargin)
        try {
          s.sql(s"""CREATE MATERIALIZED VIEW graft.q_mvh_sums LOCATION '$mt' AS
                   |SELECT o_custkey AS cust, count(*) AS cnt,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_mvh_base GROUP BY o_custkey
                   |HAVING count(*) >= 9""".stripMargin)
          val m1 = s.sql(
            "REFRESH MATERIALIZED VIEW graft.q_mvh_sums INCREMENTAL")
            .collect().head.getString(1)
          require(m1 == "full",
            s"the priming refresh must report mode=full, got $m1")
          // churn: grow most customers (threshold crossings upward)
          // and shrink a keyed slice (crossings downward)
          s.sql("""INSERT INTO graft.q_mvh_base
                  |SELECT o_orderkey, o_custkey, o_totalprice
                  |FROM v_mvh_src WHERE o_orderkey % 3 = 1""".stripMargin)
          s.sql("DELETE FROM graft.q_mvh_base WHERE o_orderkey % 5 = 0")
          val r = s.sql(
            "REFRESH MATERIALIZED VIEW graft.q_mvh_sums INCREMENTAL")
            .collect().head
          require(r.getString(1) == "incremental",
            s"the churned refresh must take the incremental path, " +
              s"got ${r.getString(1)}")
          val out = s.sql("""SELECT cust, cnt, sum_price
                            |FROM graft.q_mvh_sums
                            |ORDER BY cust""".stripMargin)
          out.count() // force before the teardown unregisters the names
          out
        } finally { G.unregister("q_mvh_sums"); G.unregister("q_mvh_base") }
      },
      Some(s"""SELECT o_custkey AS cust, count(*) AS cnt,
             |  ${dsumSql("o_totalprice")} AS sum_price
             |FROM orders
             |WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 5 <> 0
             |GROUP BY o_custkey
             |HAVING count(*) >= 9
             |ORDER BY cust NULLS FIRST""".stripMargin)
    ),

    // Q_MV_INCREMENTAL_JOIN (r18, VERDICT r17 ask #3): incremental
    // refresh for the STAR-JOIN shape — fact ⋈ dim ⋈ dim GROUP BY, the
    // production MV form. The image records one marker per joined
    // table; when only the FACT churned (dim markers at head), an
    // inner join is linear in the fact, so dirty groups = the defining
    // query replayed over the fact's delta with dims pinned at head,
    // and only those groups rescan. The drill: materialize a
    // nation-level revenue rollup over orders ⋈ customer ⋈ nation,
    // prime, churn ONLY the fact (insert two nations' worth + a keyed
    // delete), refresh INCREMENTAL, and pin in-query that the refresh
    // took the incremental path; the oracle recomputes the final image
    // from scratch — hash equality proves partial maintenance == full
    // recompute through a 3-table join. At 100 TB the dims pin at
    // head (broadcast-sized) and the fact rescan is restricted to the
    // dirty nations — never O(fact) like a full recompute.
    Entry(
      "q_mv_incremental_join",
      (s, d) => {
        val ft = scratchDir("qmvjf", d); rmRf(ft)
        val ct = scratchDir("qmvjc", d); rmRf(ct)
        val nt = scratchDir("qmvjn", d); rmRf(nt)
        val mt = scratchDir("qmvjm", d); rmRf(mt)
        val G = graft.sources.GraftCatalog
        Seq("q_mvj_fact", "q_mvj_cust", "q_mvj_nat", "q_mvj_sums")
          .foreach(G.unregister)
        Tables.orders(s, d).createOrReplaceTempView("v_mvj_orders")
        s.sql(s"""CREATE TABLE graft.q_mvj_fact LOCATION '$ft' AS
                 |SELECT o_orderkey, o_custkey, o_totalprice
                 |FROM v_mvj_orders WHERE o_orderkey % 7 != 0""".stripMargin)
        graft.sources.ManifestTable.commit(s, ct,
          Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          org.apache.spark.sql.SaveMode.Overwrite)
        G.register("q_mvj_cust", ct)
        graft.sources.ManifestTable.commit(s, nt,
          Tables.nation(s, d).select(col("n_nationkey"), col("n_name")),
          org.apache.spark.sql.SaveMode.Overwrite)
        G.register("q_mvj_nat", nt)
        try {
          s.sql(s"""CREATE MATERIALIZED VIEW graft.q_mvj_sums LOCATION '$mt' AS
                   |SELECT n.n_name AS nation, count(*) AS cnt,
                   |  ${dsumSql("f.o_totalprice")} AS sum_price
                   |FROM graft.q_mvj_fact f
                   |JOIN graft.q_mvj_cust c ON f.o_custkey = c.c_custkey
                   |JOIN graft.q_mvj_nat n ON c.c_nationkey = n.n_nationkey
                   |GROUP BY n.n_name""".stripMargin)
          val m1 = s.sql(
            "REFRESH MATERIALIZED VIEW graft.q_mvj_sums INCREMENTAL")
            .collect().head.getString(1)
          require(m1 == "full",
            s"the priming refresh must report mode=full, got $m1")
          // FACT-only churn: two nations grow, a keyed slice shrinks
          s.sql("""INSERT INTO graft.q_mvj_fact
                  |SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
                  |FROM v_mvj_orders o
                  |JOIN graft.q_mvj_cust c ON o.o_custkey = c.c_custkey
                  |JOIN graft.q_mvj_nat n ON c.c_nationkey = n.n_nationkey
                  |WHERE o.o_orderkey % 7 = 0
                  |  AND n.n_name IN ('CHINA', 'INDIA')""".stripMargin)
          s.sql("""DELETE FROM graft.q_mvj_fact
                  |WHERE o_orderkey % 11 = 0 AND o_custkey % 4 = 0""".stripMargin)
          val r = s.sql(
            "REFRESH MATERIALIZED VIEW graft.q_mvj_sums INCREMENTAL")
            .collect().head
          require(r.getString(1) == "incremental",
            s"the fact-churned refresh must take the incremental path, " +
              s"got ${r.getString(1)}")
          val out = s.sql("""SELECT nation, cnt, sum_price
                            |FROM graft.q_mvj_sums
                            |ORDER BY nation""".stripMargin)
          out.count() // force before the teardown unregisters the names
          out
        } finally Seq("q_mvj_sums", "q_mvj_fact", "q_mvj_cust", "q_mvj_nat")
          .foreach(G.unregister)
      },
      Some(s"""SELECT n_name AS nation, count(*) AS cnt,
             |  ${dsumSql("o_totalprice")} AS sum_price
             |FROM orders o
             |JOIN customer c ON o.o_custkey = c.c_custkey
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |WHERE (o.o_orderkey % 7 <> 0
             |       OR n.n_name IN ('CHINA', 'INDIA'))
             |  AND NOT (o.o_orderkey % 11 = 0 AND o.o_custkey % 4 = 0)
             |GROUP BY n_name
             |ORDER BY nation NULLS FIRST""".stripMargin)
    ),

    // Q_MV_OUTER_JOIN (r19, VERDICT r18 ask #2): incremental refresh
    // through a LEFT OUTER join — the fact-enriched-with-optional-dim
    // MV, the most common production shape after plain aggregates. The
    // hard part is NULL-EXTENSION RETRACTION: a dim row arriving flips
    // its fact rows out of the NULL group into the dim-keyed group; a
    // dim row leaving flips them back. The dim-churn term therefore
    // emits BOTH key shapes (matched via the join flipped to INNER
    // over Δdim; null-extended via LEFT-SEMI + the dim's columns
    // nulled). The drill churns the FACT and then the DIM in both
    // flip directions, pins the incremental path in-query, and the
    // oracle recomputes the final image from scratch — hash equality
    // proves null-extension maintenance == full recompute. At 100 TB
    // the dim delta is tiny and the fact rescan restricts to flipped
    // groups — never O(fact).
    Entry(
      "q_mv_outer_join",
      (s, d) => {
        val ft = scratchDir("qmvof", d); rmRf(ft)
        val ct = scratchDir("qmvoc", d); rmRf(ct)
        val mt = scratchDir("qmvom", d); rmRf(mt)
        val G = graft.sources.GraftCatalog
        Seq("q_mvo_fact", "q_mvo_cust", "q_mvo_sums").foreach(G.unregister)
        Tables.orders(s, d).createOrReplaceTempView("v_mvo_orders")
        Tables.customer(s, d).createOrReplaceTempView("v_mvo_cust")
        s.sql(s"""CREATE TABLE graft.q_mvo_fact LOCATION '$ft' AS
                 |SELECT o_orderkey, o_custkey, o_totalprice
                 |FROM v_mvo_orders WHERE o_orderkey % 7 != 0""".stripMargin)
        // only 2/3 of customers exist at first — 1/3 of fact rows are
        // null-extended from the start
        s.sql(s"""CREATE TABLE graft.q_mvo_cust LOCATION '$ct' AS
                 |SELECT c_custkey, c_nationkey
                 |FROM v_mvo_cust WHERE c_custkey % 3 != 0""".stripMargin)
        try {
          s.sql(s"""CREATE MATERIALIZED VIEW graft.q_mvo_sums LOCATION '$mt' AS
                   |SELECT c.c_nationkey AS nat, count(*) AS cnt,
                   |  ${dsumSql("f.o_totalprice")} AS sum_price
                   |FROM graft.q_mvo_fact f
                   |LEFT JOIN graft.q_mvo_cust c ON f.o_custkey = c.c_custkey
                   |GROUP BY c.c_nationkey""".stripMargin)
          val m1 = s.sql(
            "REFRESH MATERIALIZED VIEW graft.q_mvo_sums INCREMENTAL")
            .collect().head.getString(1)
          require(m1 == "full",
            s"the priming refresh must report mode=full, got $m1")
          // FACT churn: a left join is linear in the fact side
          s.sql("""INSERT INTO graft.q_mvo_fact
                  |SELECT o_orderkey, o_custkey, o_totalprice
                  |FROM v_mvo_orders
                  |WHERE o_orderkey % 7 = 0 AND o_custkey % 2 = 0""".stripMargin)
          s.sql("DELETE FROM graft.q_mvo_fact WHERE o_orderkey % 13 = 0")
          val r1 = s.sql(
            "REFRESH MATERIALIZED VIEW graft.q_mvo_sums INCREMENTAL")
            .collect().head.getString(1)
          require(r1 == "incremental",
            s"fact churn through a LEFT JOIN must stay incremental, got $r1")
          // DIM churn, BOTH flip directions in one window: arriving
          // customers adopt their null-extended orders; departing
          // customers orphan theirs back into the NULL group
          s.sql("""INSERT INTO graft.q_mvo_cust
                  |SELECT c_custkey, c_nationkey FROM v_mvo_cust
                  |WHERE c_custkey % 3 = 0 AND c_custkey % 2 = 0""".stripMargin)
          s.sql("DELETE FROM graft.q_mvo_cust WHERE c_custkey % 5 = 0")
          val r2 = s.sql(
            "REFRESH MATERIALIZED VIEW graft.q_mvo_sums INCREMENTAL")
            .collect().head.getString(1)
          require(r2 == "incremental",
            s"dim churn through a LEFT JOIN must stay incremental, got $r2")
          val out = s.sql("""SELECT nat, cnt, sum_price
                            |FROM graft.q_mvo_sums
                            |ORDER BY nat""".stripMargin)
          out.count() // force before the teardown unregisters the names
          out
        } finally Seq("q_mvo_sums", "q_mvo_fact", "q_mvo_cust")
          .foreach(G.unregister)
      },
      Some(s"""WITH fact AS (
             |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |  WHERE (o_orderkey % 7 <> 0
             |         OR (o_orderkey % 7 = 0 AND o_custkey % 2 = 0))
             |    AND o_orderkey % 13 <> 0),
             |dim AS (
             |  SELECT c_custkey, c_nationkey FROM customer
             |  WHERE (c_custkey % 3 <> 0 OR c_custkey % 2 = 0)
             |    AND c_custkey % 5 <> 0)
             |SELECT c.c_nationkey AS nat, count(*) AS cnt,
             |  ${dsumSql("f.o_totalprice")} AS sum_price
             |FROM fact f LEFT JOIN dim c ON f.o_custkey = c.c_custkey
             |GROUP BY c.c_nationkey
             |ORDER BY nat NULLS FIRST""".stripMargin)
    ),

    // Q_MV_SELF_JOIN (r19, VERDICT r18 ask #5): incremental refresh
    // through a SELF-join — the prior-period-comparison view. The
    // telescoping identity T_h⋈T_h − T_s⋈T_s = T_h⋈ΔT + ΔT⋈T_s steps
    // one OCCURRENCE at a time (earlier occurrences at head, later at
    // the marker), so a churned self-joined table contributes one
    // LINEAR term per occurrence and no quadratic ΔT⋈ΔT ever forms.
    // The drill churns rows that pair on BOTH sides of the join
    // (consecutive order keys), pins the incremental path in-query,
    // and the oracle recomputes the final image from scratch.
    Entry(
      "q_mv_self_join",
      (s, d) => {
        val bt = scratchDir("qmvsb", d); rmRf(bt)
        val mt = scratchDir("qmvsm", d); rmRf(mt)
        val G = graft.sources.GraftCatalog
        Seq("q_mvs_base", "q_mvs_pairs").foreach(G.unregister)
        Tables.orders(s, d).createOrReplaceTempView("v_mvs_orders")
        s.sql(s"""CREATE TABLE graft.q_mvs_base LOCATION '$bt' AS
                 |SELECT o_orderkey, o_custkey, o_totalprice
                 |FROM v_mvs_orders WHERE o_orderkey % 4 != 3""".stripMargin)
        try {
          s.sql(s"""CREATE MATERIALIZED VIEW graft.q_mvs_pairs LOCATION '$mt' AS
                   |SELECT a.o_custkey AS cust, count(*) AS n,
                   |  ${dsumSql("a.o_totalprice + b.o_totalprice")} AS pair_price
                   |FROM graft.q_mvs_base a
                   |JOIN graft.q_mvs_base b ON a.o_orderkey = b.o_orderkey + 1
                   |GROUP BY a.o_custkey""".stripMargin)
          val m1 = s.sql(
            "REFRESH MATERIALIZED VIEW graft.q_mvs_pairs INCREMENTAL")
            .collect().head.getString(1)
          require(m1 == "full",
            s"the priming refresh must report mode=full, got $m1")
          // churn pairs on BOTH occurrences: an inserted key k joins
          // k-1 as the left row and k+1 as the right row; a deleted
          // key breaks both its pairs
          s.sql("""INSERT INTO graft.q_mvs_base
                  |SELECT o_orderkey, o_custkey, o_totalprice
                  |FROM v_mvs_orders
                  |WHERE o_orderkey % 4 = 3 AND o_orderkey % 3 = 0""".stripMargin)
          s.sql("DELETE FROM graft.q_mvs_base WHERE o_orderkey % 17 = 0")
          val r = s.sql(
            "REFRESH MATERIALIZED VIEW graft.q_mvs_pairs INCREMENTAL")
            .collect().head.getString(1)
          require(r == "incremental",
            s"self-join churn must stay incremental, got $r")
          val out = s.sql("""SELECT cust, n, pair_price
                            |FROM graft.q_mvs_pairs
                            |ORDER BY cust""".stripMargin)
          out.count() // force before the teardown unregisters the names
          out
        } finally Seq("q_mvs_pairs", "q_mvs_base").foreach(G.unregister)
      },
      Some(s"""WITH base AS (
             |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |  WHERE (o_orderkey % 4 <> 3
             |         OR (o_orderkey % 4 = 3 AND o_orderkey % 3 = 0))
             |    AND o_orderkey % 17 <> 0)
             |SELECT a.o_custkey AS cust, count(*) AS n,
             |  ${dsumSql("a.o_totalprice + b.o_totalprice")} AS pair_price
             |FROM base a JOIN base b ON a.o_orderkey = b.o_orderkey + 1
             |GROUP BY a.o_custkey
             |ORDER BY cust NULLS FIRST""".stripMargin)
    ),

    // Q_ADD_COLUMN_DEFAULT (r17, VERDICT r16 ask #4): backfill-free
    // schema growth — `ADD COLUMNS (c T DEFAULT e)` records the fill
    // at ADD time (zero data moves — pinned in-query by the unchanged
    // file census); pre-add files surface the frozen literal on read,
    // post-add inserts store real values, and ONE aggregate spans
    // both eras. The oracle replays the fill with a CASE over the raw
    // table. At 100 TB this is the difference between a new column
    // being one manifest commit and being a full table rewrite.
    Entry(
      "q_add_column_default",
      (s, d) => {
        val t = scratchDir("qacd", d)
        rmRf(t)
        val M = graft.sources.ManifestTable
        graft.sources.GraftCatalog.unregister("q_acd_orders")
        Tables.orders(s, d).createOrReplaceTempView("v_acd_src")
        s.sql(s"""CREATE TABLE graft.q_acd_orders LOCATION '$t' AS
                 |SELECT o_orderkey, o_totalprice FROM v_acd_src
                 |WHERE o_orderkey % 3 = 0""".stripMargin)
        try {
          val filesBefore = M.snapshotFiles(s, t).toSet
          s.sql("""ALTER TABLE graft.q_acd_orders
                  |ADD COLUMNS (channel STRING DEFAULT 'legacy')""".stripMargin)
          require(M.snapshotFiles(s, t).toSet == filesBefore,
            "ADD COLUMNS … DEFAULT must be metadata-only — zero files move")
          s.sql("""INSERT INTO graft.q_acd_orders
                  |SELECT o_orderkey, o_totalprice, o_orderpriority
                  |FROM v_acd_src WHERE o_orderkey % 3 = 1""".stripMargin)
          s.sql(s"""SELECT channel, count(*) AS n,
                   |  ${dsumSql("o_totalprice")} AS sum_price
                   |FROM graft.q_acd_orders
                   |GROUP BY channel
                   |ORDER BY channel""".stripMargin)
        } finally graft.sources.GraftCatalog.unregister("q_acd_orders")
      },
      Some(s"""SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'legacy'
             |            ELSE o_orderpriority END AS channel,
             |  count(*) AS n,
             |  ${dsumSql("o_totalprice")} AS sum_price
             |FROM orders
             |WHERE o_orderkey % 3 IN (0, 1)
             |GROUP BY 1
             |ORDER BY channel NULLS FIRST""".stripMargin)
    )
  )
}
