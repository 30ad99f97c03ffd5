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

  import Curation.{EmailRe, PhoneRe}

  val entries: Seq[Entry] = Seq(

    // B9a: benchmark decontamination — flag every training document
    // sharing at least one 4-word gram with the eval subset
    // (doc_id % 97 == 0 stands in for the benchmark set; 4-word grams
    // are what this corpus's vocabulary needs for a non-trivial hit
    // rate — real pipelines use 8-13). Output: the contaminated doc
    // and how many distinct eval grams it shares.
    Entry(
      "b9_decontaminate",
      (s, d) =>
        Curation.contamination(Tables.documents(s, d), col("doc_id") % 97 === 0)
          .orderBy("doc_id"),
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
            Curation.scrubPii(col("raw")).as("clean"))
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
        Curation.repetitionScores(Tables.documents(s, d))
          .select(col("doc_id"), col("top_cnt"), col("n_bigrams"), col("rep_ratio"),
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

    // B9f: text cleaning — lowercase, strip punctuation, collapse
    // whitespace, drop stopwords. The normalize-before-everything pass
    // of a crawl pipeline; pure per-row regex + array ops, no shuffle.
    Entry(
      "b9_clean_text",
      (s, d) => {
        val stop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
        val norm = regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]+", " "), " +", " ")
        Tables.documents(s, d)
          .select(col("doc_id"),
            array_join(
              filter(split(norm, " "),
                w => !w.isin(stop: _*) && w =!= ""), " ").as("clean"))
          .select(col("doc_id"), col("clean"),
            size(split(col("clean"), " ")).as("n_tokens"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, clean,
             |CAST(len(string_split(clean, ' ')) AS INT) AS n_tokens
             |FROM (SELECT doc_id,
             |  array_to_string(list_filter(
             |    string_split(regexp_replace(regexp_replace(lower(text),
             |      '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g'), ' '),
             |    w -> w NOT IN ('the','a','an','and','or','of','to','in','is','it')
             |         AND w <> ''), ' ') AS clean
             |  FROM documents) t
             |ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B9d: deterministic train/val/test split — first hex char of
    // md5(doc_id || salt): 0-9ab train (12/16), c-d val (2/16),
    // e-f test (2/16). Pure per-row hash: stable under re-runs,
    // shuffle-free, and identical on any engine with md5.
    Entry(
      "b9_train_test_split",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), Curation.splitAssign(col("doc_id")).as("split"))
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
          .select(col("vec_id"),
            round(sqrt(sq), 6).as("l2"),
            aggregate(Curation.quantize(col("embedding")),
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
