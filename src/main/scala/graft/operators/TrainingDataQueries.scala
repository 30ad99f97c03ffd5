package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryRegistry._
import graft.sources.Tables

/** Training-data preparation operators (SURVEY.md §2.B round-3
  * additions): TF-IDF term scoring, token-budget sequence packing, and
  * fixed-width document chunking — the corpus-shaping steps between
  * dedup/quality filtering and tokenizer output in an LLM pipeline.
  *
  * Scale stance: TF-IDF is two hash aggregations plus a broadcast of
  * the 1-row corpus count — the document-frequency table is vocabulary-
  * sized (tiny vs the corpus), so the join broadcasts. Chunking is a
  * pure per-row generator (no shuffle). Packing computes its global
  * running sum as a two-phase parallel prefix sum (bucket-local
  * windows + driver-prefixed broadcast offsets) — no partition-less
  * Window anywhere, so the shape survives 100 TB.
  */
object TrainingDataQueries {

  /** Prefix-sum bucket width for [[packAssignments]], derived from the
    * observed doc_id RANGE (ADVICE r6): buckets are id ranges, so a
    * count-derived width bounds the subtotal table only when ids are
    * dense — snowflake-style ids, heavy deletions, or ids spaced wider
    * than the bucket put one doc per bucket and the driver collect
    * approaches n rows. Width = span/4096 + 1 bounds NON-EMPTY buckets
    * by ≤ 4098 by construction, for ANY id density (the same sizing
    * [[Similarity.seedTable]]'s distributed path uses). The span goes
    * through BigInt so an id domain covering more than half the Long
    * range (hashed ids) cannot overflow into a negative width.
    */
  def packBucketWidth(lo: Long, hi: Long): Long =
    ((BigInt(hi) - BigInt(lo)) / 4096 + 1).max(64).toLong

  /** Two-phase parallel prefix sum for token-budget sequence packing.
    * Phase 1 buckets doc_ids into contiguous ranges of
    * [[packBucketWidth]] ids and runs the running sum PER BUCKET (all
    * buckets in parallel); the per-bucket subtotals — bounded ≤ ~4096
    * rows regardless of corpus size — prefix-sum on the driver and
    * broadcast back as each bucket's starting offset. Output is
    * identical to a global Window.orderBy cumulative sum (the oracle
    * computes exactly that) but never serializes the corpus through
    * one task. Returns the plan plus the driver-subtotal row count so
    * Stress can assert the bound under replication.
    */
  def packAssignments(docs: org.apache.spark.sql.DataFrame,
                      budget: Long = 2048L): (org.apache.spark.sql.DataFrame, Int) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mm = docs.agg(min(col("doc_id")).cast("long").as("lo"),
      max(col("doc_id")).cast("long").as("hi")).first()
    val width = if (mm.isNullAt(0)) 64L else packBucketWidth(mm.getLong(0), mm.getLong(1))
    // bucket by doc_id DIV width (no lo-subtraction: monotone in
    // doc_id, and immune to the (hi - lo) subtraction overflowing when
    // the id domain spans more than half the Long range)
    val t = docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"doc_id div $width"))
    val subs = t.groupBy("bucket").agg(sum(col("n_tokens")).as("bsum"))
      .orderBy("bucket").collect()
    var acc = 0L
    val offs = subs.toSeq.map { r =>
      val o = (r.getLong(0), acc); acc += r.getLong(1); o
    }
    val wLocal = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = t.join(broadcast(offs.toDF("bucket", "boff")), Seq("bucket"))
      .withColumn("cum_before",
        col("boff") + sum(col("n_tokens")).over(wLocal) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"cum_before div $budget").as("pack_id"),
        (col("cum_before") % budget).as("pack_offset"))
    (out, subs.length)
  }

  val entries: Seq[Entry] = Seq(

    // B5e: TF-IDF top-3 terms per document. Ranking compares the
    // ROUNDED score (6 dp) with the term as tie-break: ln() differs in
    // the last ulp across engines, and mathematically-equal scores
    // (2·ln(x) vs ln(x²)) must not rank differently on either side.
    Entry(
      "b5_tfidf",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
        val dfw = words.groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val rk = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("w").asc)
        tf.join(broadcast(dfw), "w")
          .crossJoin(broadcast(n))
          .withColumn("tfidf",
            round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
          .withColumn("rk", row_number().over(rk))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("w"), col("tfidf"))
          .orderBy("doc_id", "rk")
      },
      Some("""WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
             |tf AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY 1, 2),
             |df AS (SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY 1),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT tf.doc_id, tf.w,
             |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
             |  FROM tf JOIN df USING (w) CROSS JOIN n),
             |ranked AS (
             |  SELECT doc_id, w, tfidf,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, w ASC) AS rk
             |  FROM scored)
             |SELECT doc_id, CAST(rk AS INT) AS rk, w, tfidf FROM ranked WHERE rk <= 3
             |ORDER BY doc_id NULLS FIRST, rk NULLS FIRST""".stripMargin)
    ),

    // B7a: sequence packing — assign documents (in doc_id order) to
    // fixed token-budget packs by running token count; pack_id and the
    // document's offset inside its pack come straight from the
    // cumulative sum. Budget 2048 whitespace tokens.
    //
    // The cumulative sum is a TWO-PHASE PARALLEL PREFIX SUM, not a
    // global window: a partition-less Window.orderBy serializes the
    // whole corpus through ONE task (the r3 plan did exactly that —
    // correct at sf0.1, dead at 100 TB). Phase 1 buckets doc_ids into
    // contiguous ranges and runs the running sum PER BUCKET (all
    // buckets in parallel); the per-bucket token subtotals — one tiny
    // row per bucket — prefix-sum on the driver (the same bounded
    // model-state collect class as IvfAnn's centroids) and broadcast
    // back as each bucket's starting offset. Identical output to the
    // global window, embarrassingly parallel; the bucket width is
    // CORPUS-DERIVED (packBucketWidth: max(64, n/4096)) so the driver
    // table is bounded ≤ ~4096 rows at any corpus size — the output is
    // invariant to the width, so the oracle stays the plain global
    // window. Stress's pack_b7 row measures the bound under
    // replication. See packAssignments above.
    Entry(
      "b7_pack",
      (s, d) =>
        packAssignments(Tables.documents(s, d))._1.orderBy("doc_id"),
      Some("""WITH t AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
             |FROM documents),
             |c AS (SELECT doc_id, n_tokens,
             |  sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    - n_tokens AS cum_before
             |  FROM t)
             |SELECT doc_id, n_tokens, CAST(cum_before // 2048 AS BIGINT) AS pack_id,
             |  CAST(cum_before % 2048 AS BIGINT) AS pack_offset
             |FROM c ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B7b: fixed-width chunking — split every document into 80-char
    // windows (context-window shaping); generator-only, no shuffle.
    // greatest(...,1) keeps empty documents as one empty chunk on both
    // engines (Spark sequence(0,-1) would run DESCENDING otherwise).
    Entry(
      "b7_chunk",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), col("text"),
            greatest(ceil(length(col("text")) / 80.0).cast("long"), lit(1L)).as("n_chunks"))
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(0L), col("n_chunks") - 1)).as("i"))
          .select(
            col("doc_id"),
            col("i").cast("int").as("chunk_idx"),
            col("text").substr((col("i") * 80 + 1).cast("int"), lit(80)).as("chunk"))
          .withColumn("chunk_len", length(col("chunk")))
          .orderBy("doc_id", "chunk_idx"),
      Some("""WITH c AS (SELECT doc_id, text,
             |greatest(CAST(ceil(length(text) / 80.0) AS BIGINT), 1) AS n_chunks FROM documents)
             |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
             |substring(text, CAST(i*80+1 AS INT), 80) AS chunk,
             |CAST(length(substring(text, CAST(i*80+1 AS INT), 80)) AS INT) AS chunk_len
             |FROM c, unnest(range(0, n_chunks)) AS u(i)
             |ORDER BY doc_id NULLS FIRST, chunk_idx NULLS FIRST""".stripMargin)
    ),

    // B7c: deterministic training-shard assignment — the LAST step of
    // every corpus pipeline: give each document a pseudo-random but
    // fully reproducible shard (md5-mod, the stateless hashUniform
    // discipline — any executor routes any row, re-runs and
    // late-arriving data land identically) and a deterministic
    // position within its shard. This IS the training-data writer
    // shape at 100 TB: ONE hash shuffle on shard + a within-shard
    // sort (what `repartition(shard).sortWithinPartitions` executes) —
    // no global sort, no partition-less window, shard sizes
    // binomially even. Judged output pins the whole function: per
    // shard, the doc count, char mass, hash range, and an
    // order-signature Σ hk·rank that moves if ANY document lands in a
    // different shard OR position.
    Entry(
      "b7_shard",
      (s, d) => {
        val nShards = 8
        val hk = conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":shard"))), 1, 8), 16, 10).cast("long")
        Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
          .withColumn("hk", hk)
          .withColumn("shard", (col("hk") % nShards).cast("int"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("shard").orderBy(col("hk"), col("doc_id"))))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            min(col("hk")).as("min_hk"), max(col("hk")).as("max_hk"),
            sum(col("hk") * col("rn")).as("order_sig"))
          .orderBy("shard")
      },
      Some("""WITH h AS (SELECT doc_id, n_chars,
             |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
             |      || ':shard'), 1, 8)) AS BIGINT) AS hk
             |  FROM documents),
             |w AS (SELECT *, CAST(hk % 8 AS INT) AS shard,
             |    row_number() OVER (PARTITION BY hk % 8
             |      ORDER BY hk, doc_id) AS rn
             |  FROM h)
             |SELECT shard, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  min(hk) AS min_hk, max(hk) AS max_hk,
             |  CAST(sum(hk * rn) AS BIGINT) AS order_sig
             |FROM w GROUP BY shard
             |ORDER BY shard NULLS FIRST""".stripMargin)
    ),

    // B5f: BM25 relevance scoring — the classic lexical retrieval
    // scorer (Robertson/Spärck Jones; k1=1.2, b=0.75) for a fixed
    // 3-term query over the corpus. tf/df/dl/avgdl all reduce from
    // exact integer aggregates; the per-term float score is cast to
    // DECIMAL(28,6) before the per-doc sum (summation-order-proof,
    // like every dsum) and ranking uses the ROUNDED score with doc_id
    // tie-break (ln() ulp discipline, same as b5_tfidf). Scale shape:
    // term postings shrink to the 3 query terms at the first filter;
    // df and corpus stats are broadcast scalars; the top-20 cut is
    // TakeOrderedAndProject, never a global sort.
    Entry(
      "b5_bm25",
      (s, d) => {
        val terms = Seq("vector", "hash", "merge")
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("tk"))
        val dd = docs.select(col("doc_id"), size(col("tk")).cast("long").as("dl"), col("tk"))
        val tf = dd.select(col("doc_id"), col("dl"), explode(col("tk")).as("w"))
          .filter(col("w").isin(terms: _*))
          .groupBy("doc_id", "dl", "w").agg(count(lit(1)).as("tf"))
        val dfw = tf.groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
        val st = docs.agg(count(lit(1)).as("n_docs"),
          sum(size(col("tk")).cast("long")).as("sum_dl"))
        tf.join(broadcast(dfw), "w")
          .crossJoin(broadcast(st))
          .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
          .withColumn("s",
            log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
              (col("tf") * lit(2.2)) /
              (col("tf") + lit(1.2) *
                (lit(1.0) - lit(0.75) + lit(0.75) * col("dl").cast("double") / col("avgdl"))))
          .groupBy("doc_id")
          .agg(round(sum(col("s").cast("decimal(28,6)")).cast("double"), 6).as("score"),
            count(lit(1)).as("n_terms"))
          .orderBy(col("score").desc, col("doc_id").asc)
          .limit(20)
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             |tf AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, w, count(*) AS tf
             |  FROM (SELECT doc_id, tk, unnest(tk) AS w FROM d) h
             |  WHERE w IN ('vector', 'hash', 'merge') GROUP BY 1, 2, 3),
             |dfw AS (SELECT w, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
             |st AS (SELECT count(*) AS n_docs,
             |    CAST(sum(CAST(len(tk) AS BIGINT)) AS BIGINT) AS sum_dl FROM d),
             |sc AS (SELECT tf.doc_id,
             |    ln((st.n_docs - dfw.df + 0.5) / (dfw.df + 0.5) + 1.0) *
             |      (tf.tf * 2.2) /
             |      (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(tf.dl AS DOUBLE) /
             |        (CAST(st.sum_dl AS DOUBLE) / st.n_docs))) AS s
             |  FROM tf JOIN dfw USING (w) CROSS JOIN st)
             |SELECT doc_id,
             |  round(CAST(sum(CAST(s AS DECIMAL(28,6))) AS DOUBLE), 6) AS score,
             |  count(*) AS n_terms
             |FROM sc GROUP BY 1
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)
    ),

    // B5j: the full iterative BPE merge loop — b5_bpe_pairs is round
    // 1's statistic; this learns the merge TABLE (Sennrich et al.
    // 2016): one corpus pass to the word vocabulary, then N
    // vocab-table rounds of count-weighted pair stats → total
    // tie-break selection → merge rewrite. Non-SQL by contract (round
    // k's learned pair feeds round k+1's sequential list rewrite —
    // not expressible in DuckDB); BpeSpec pins hand-computed merge
    // sequences, the lexicographic tie-break, early stop, and the
    // train→tokenize round trip.
    Entry(
      "b5_bpe_train",
      (s, d) => Bpe.trainMerges(Tables.documents(s, d), 8),
      None
    ),

    // B5k: the CONSUMER pass of the trained tokenizer — encode the
    // whole corpus with the merge table b5_bpe_train produced and emit
    // per-document token statistics (arrays never leave the plan —
    // §5.3 hash-compare discipline). The merge table is bounded model
    // state (≤ nMerges rows, driver-collected, broadcast inside the
    // map lambda's closure); the encode itself is one shuffle-free
    // corpus pass, so at 100 TB tokenization cost is a single scan —
    // the shape every production tokenizer job has. Rows-only by
    // design (the symbolic merge loop has no SQL twin); BpeSpec pins
    // encode determinism across parallelism and the lossless
    // concat-round-trip property.
    Entry(
      "b5_bpe_tokenize",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val merges = Bpe.trainMerges(docs, 8).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
        Bpe.tokenize(docs, merges)
          .select(col("id").as("doc_id"),
            size(col("tokens")).as("n_tokens"),
            size(array_distinct(col("tokens"))).as("n_distinct"),
            coalesce(array_max(transform(col("tokens"), t => length(t))),
              lit(0)).as("max_token_len"))
          .orderBy("doc_id")
      },
      None
    ),

    // B1c: repeated-SPAN detection — the substring-level dedup signal
    // of "Deduplicating Training Data Makes Language Models Better"
    // (Lee et al. 2022): every 8-token sliding span is fingerprinted;
    // a span position is duplicated when its fingerprint occurs in ≥ 2
    // DISTINCT documents. Per-document output: span count, duplicated
    // positions, and the duplication ratio — the gate a curation
    // pipeline thresholds on. Scale shape: one generator pass (no
    // shuffle) to spans, one hash agg over fingerprints, one equi-join
    // back — span fingerprints are 32-byte md5s, so the shuffled bytes
    // are O(tokens), independent of document length skew.
    Entry(
      "b1_span_dedup",
      (s, d) => {
        // the per-span `array_join(slice(tk, i, 8), " ")` equals the
        // 8-word shingle byte-slice (single-space split re-joined by
        // single spaces IS the original substring) — so the span text
        // comes from the fused one-pass MinHash.shingles (r19, §2 of
        // OPTIMIZATION_r19.md) instead of an int-sequence explode plus
        // a fresh array + joined string per span. The ≥8-word gate
        // guarantees the whole-text fallback branch never fires, so
        // span count (n_words - 7) and bytes are identical.
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .filter(size(split(col("text"), " ")) >= 8)
        val spans = docs
          .select(col("doc_id"),
            explode(graft.operators.MinHash.shingles(col("text"), 8)).as("sp"))
          .select(col("doc_id"), md5(col("sp")).as("h"))
        val dupSpans = spans.groupBy("h")
          .agg(countDistinct(col("doc_id")).as("nd"))
        spans.join(dupSpans, Seq("h"))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_spans"),
            count_if(col("nd") >= 2).as("n_dup"),
            round(count_if(col("nd") >= 2).cast("double") / count(lit(1)), 6)
              .as("dup_ratio"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
             |  WHERE len(string_split(text, ' ')) >= 8),
             |s AS (SELECT doc_id, md5(array_to_string(tk[i:i+7], ' ')) AS h
             |  FROM t, unnest(range(1, len(tk) - 6)) AS u(i)),
             |d AS (SELECT h, count(DISTINCT doc_id) AS nd FROM s GROUP BY 1)
             |SELECT s.doc_id, count(*) AS n_spans,
             |  CAST(count_if(d.nd >= 2) AS BIGINT) AS n_dup,
             |  round(CAST(count_if(d.nd >= 2) AS DOUBLE) / count(*), 6) AS dup_ratio
             |FROM s JOIN d USING (h) GROUP BY s.doc_id
             |ORDER BY doc_id NULLS FIRST""".stripMargin)
    )
  )
}
