package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryRegistry._
import graft.sources.Tables

/** Corpus-curation operators (round-3 additions to SURVEY.md §2.B):
  * benchmark decontamination, PII redaction, repetition-based quality
  * gating, deterministic train/val/test splitting, and embedding
  * normalization/quantization — the standard curation passes between
  * raw crawl and tokenizer in an LLM data pipeline.
  *
  * Scale stance:
  *  - decontamination is an n-gram equi-join where the eval side is
  *    benchmark-sized (thousands of docs), so it broadcasts; the
  *    corpus side streams through one generator + one partial-agg
  *    pass. At 100 TB the gram strings become xxhash64 longs (the
  *    join key shrinks ~10×); the judged query keeps raw strings so
  *    DuckDB can reproduce it.
  *  - PII scrubbing / repetition scoring are pure per-row codegen'd
  *    string pipelines — no shuffle, fully parallel.
  *  - the split is a stateless hash of the key: any executor can
  *    route any row with no coordination, reshuffling, or lookup
  *    table, and the assignment is stable under re-runs and late
  *    data — the property that matters when the corpus is rebuilt
  *    incrementally.
  */
object CurationQueries {

  /** Email-ish and planted-phone patterns, portable across Java regex
    * (Spark) and RE2 (DuckDB): no lookaround, no backrefs. */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
  private val PhoneRe = "\\+1-555-[0-9]{4}"

  val entries: Seq[Entry] = Seq(

    // B9a: benchmark decontamination — flag every training document
    // sharing at least one 4-word gram with the eval subset
    // (doc_id % 97 == 0 stands in for the benchmark set; 4-word grams
    // are what this corpus's vocabulary needs for a non-trivial hit
    // rate — real pipelines use 8-13). Output: the contaminated doc
    // and how many distinct eval grams it shares.
    Entry(
      "b9_decontaminate",
      (s, d) => {
        val grams = Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 4)
          .select(col("doc_id"),
            explode(sequence(lit(1), size(col("ws")) - 3)).as("i"),
            col("ws"))
          .select(col("doc_id"),
            array_join(slice(col("ws"), col("i"), lit(4)), " ").as("ng"))
        val evalGrams = grams.filter(col("doc_id") % 97 === 0)
          .select("ng").distinct()
        grams.filter(col("doc_id") % 97 =!= 0)
          .select("doc_id", "ng").distinct()
          .join(broadcast(evalGrams), "ng")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shared"))
          .orderBy("doc_id")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, array_to_string(list_slice(ws, i, i + 3), ' ') AS ng
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t,
             |       unnest(range(1, greatest(len(ws) - 3, 0) + 1)) AS u(i)),
             |ev AS (SELECT DISTINCT ng FROM g WHERE doc_id % 97 = 0),
             |tr AS (SELECT DISTINCT doc_id, ng FROM g WHERE doc_id % 97 <> 0)
             |SELECT tr.doc_id, count(*) AS n_shared
             |FROM tr JOIN ev USING (ng)
             |GROUP BY tr.doc_id ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B9b: PII redaction — plant a synthetic email+phone per document
    // (derived from doc_id, so both engines build the identical text),
    // count the hits, scrub them, and prove the cleaned tail carries
    // the placeholders.
    Entry(
      "b9_pii_scrub",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            concat(col("text"), lit(" contact user"), col("doc_id"),
              lit("@example.com or +1-555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("raw"))
          .select(col("doc_id"),
            size(regexp_extract_all(col("raw"), lit(EmailRe), lit(0))).as("n_email"),
            size(regexp_extract_all(col("raw"), lit(PhoneRe), lit(0))).as("n_phone"),
            regexp_replace(regexp_replace(col("raw"), EmailRe, "<EMAIL>"),
              PhoneRe, "<PHONE>").as("clean"))
          .select(col("doc_id"), col("n_email"), col("n_phone"),
            substring(col("clean"), -34, 34).as("clean_tail"))
          .orderBy("doc_id"),
      Some(s"""WITH r AS (
             |  SELECT doc_id,
             |    text || ' contact user' || doc_id || '@example.com or +1-555-' ||
             |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(raw, '$EmailRe')) AS INT) AS n_email,
             |  CAST(len(regexp_extract_all(raw, '\\+1-555-[0-9]{4}')) AS INT) AS n_phone,
             |  right(regexp_replace(regexp_replace(raw, '$EmailRe', '<EMAIL>', 'g'),
             |    '\\+1-555-[0-9]{4}', '<PHONE>', 'g'), 34) AS clean_tail
             |FROM r ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B9c: repetition quality gate (Gopher-style) — per document, the
    // share of all bigrams taken by the single most repeated bigram;
    // high ratio = boilerplate/spam. Tie-break inside the doc is by
    // count only (the ratio is max-count / total, no bigram emitted,
    // so ties cannot diverge between engines).
    Entry(
      "b9_repetition",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .filter(size(col("ws")) >= 2)
          .select(col("doc_id"),
            explode(transform(sequence(lit(2), size(col("ws"))),
              i => concat(element_at(col("ws"), i - 1), lit(" "),
                element_at(col("ws"), i)))).as("bg"))
          .groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id")
          .agg(max(col("cnt")).as("top_cnt"),
            sum(col("cnt")).as("n_bigrams"))
          .select(col("doc_id"), col("top_cnt"), col("n_bigrams"),
            round(col("top_cnt") / col("n_bigrams"), 6).as("rep_ratio"),
            (col("top_cnt") / col("n_bigrams") > 0.2).as("flagged"))
          .orderBy("doc_id"),
      Some("""WITH b AS (
             |  SELECT doc_id, unnest(list_transform(range(2, len(ws) + 1),
             |    i -> ws[i - 1] || ' ' || ws[i])) AS bg
             |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t
             |  WHERE len(ws) >= 2),
             |c AS (SELECT doc_id, bg, count(*) AS cnt FROM b GROUP BY 1, 2)
             |SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS n_bigrams,
             |  round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS rep_ratio,
             |  CAST(max(cnt) AS DOUBLE) / sum(cnt) > 0.2 AS flagged
             |FROM c GROUP BY doc_id ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B9d: deterministic train/val/test split — first hex char of
    // md5(doc_id || salt): 0-9ab train (12/16), c-d val (2/16),
    // e-f test (2/16). Pure per-row hash: stable under re-runs,
    // shuffle-free, and identical on any engine with md5.
    Entry(
      "b9_train_test_split",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            substring(md5(concat(col("doc_id").cast("string"), lit(":graft"))), 1, 1).as("h"))
          .select(col("doc_id"),
            when(col("h") < "c", "train")
              .when(col("h") < "e", "val")
              .otherwise("test").as("split"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CASE WHEN h < 'c' THEN 'train' WHEN h < 'e' THEN 'val'
             |       ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |        substring(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 1) AS h
             |      FROM documents) t
             |ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B9e: embedding L2 norm + symmetric int8 quantization — the
    // storage/serving transform for ANN shards. Emits the norm and the
    // quantized-vector checksum (sum of int8 codes) rather than the
    // array itself (driver hash-compare rule: no raw arrays in judged
    // output). floor(x+0.5) not round(): both engines floor
    // identically on IEEE doubles, while round() half-even/half-up
    // conventions differ.
    Entry(
      "b9_norm_quantize",
      (s, d) => {
        val sq = aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, v) => acc + v)
        Tables.embeddings(s, d)
          .withColumn("l2raw", sqrt(sq))
          .select(col("vec_id"),
            round(col("l2raw"), 6).as("l2"),
            aggregate(
              transform(col("embedding"),
                x => floor(x.cast("double") * 127 / nullif(col("l2raw"), lit(0.0)) + 0.5)
                  .cast("long")),
              lit(0L), (acc, v) => acc + v).as("qsum"))
          .orderBy("vec_id")
      },
      Some("""WITH n AS (
             |  SELECT vec_id, embedding,
             |    sqrt(list_aggregate(list_transform(embedding,
             |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS l2raw
             |  FROM embeddings)
             |SELECT vec_id, round(l2raw, 6) AS l2,
             |  CAST(list_aggregate(list_transform(embedding,
             |    x -> CAST(floor(CAST(x AS DOUBLE) * 127 / nullif(l2raw, 0) + 0.5) AS BIGINT)),
             |    'sum') AS BIGINT) AS qsum
             |FROM n ORDER BY vec_id NULLS FIRST""".stripMargin)
    )
  )
}
