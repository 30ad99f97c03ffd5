package graft.operators

import org.apache.spark.sql.expressions.Window
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
             |SELECT doc_id, max(cnt) AS top_cnt, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
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

    // B9g: domain mixing — resample the corpus toward a target domain
    // mixture (DoReMi/Pile-style reweighting). Each source gets a
    // literal mixture weight; the keep-rate per source is
    // min(1, target_share * total / n_docs), and the keep decision is
    // a stateless md5-derived uniform in [0,1) — so any executor
    // routes any row with no coordination and the sample is stable
    // under re-runs. At 100 TB the rate table is domain-cardinality
    // (broadcast); the corpus side is one scan + one partial agg.
    Entry(
      "b9_domain_mix",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val weight = lit(1) + (substring(col("source"), 4, 10).cast("int") % 4)
        val rates = Curation.mixRates(docs, weight, "source")
        val kept = Curation.domainMix(docs, weight, "source", "doc_id")
          .groupBy("source").agg(count(lit(1)).as("n_kept"))
        rates.join(kept, Seq("source"), "left")
          .select(col("source"), col("n_docs"), col("w"),
            round(col("rate"), 6).as("rate"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"))
          .orderBy("source")
      },
      Some("""WITH c AS (
             |  SELECT source, count(*) AS n_docs,
             |    1 + (CAST(substring(source, 4) AS INT) % 4) AS w
             |  FROM documents GROUP BY 1),
             |t AS (SELECT sum(n_docs) AS total, sum(w) AS sum_w FROM c),
             |r AS (SELECT source, n_docs, w,
             |        least(1.0, CAST(w AS DOUBLE) / sum_w * total / n_docs) AS rate
             |      FROM c, t),
             |k AS (SELECT d.source, count(*) AS n_kept
             |      FROM documents d JOIN r USING (source)
             |      WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 8)) AS BIGINT)
             |            / 4294967296.0 < rate
             |      GROUP BY 1)
             |SELECT source, n_docs, w, round(rate, 6) AS rate,
             |  coalesce(n_kept, 0) AS n_kept
             |FROM r LEFT JOIN k USING (source)
             |ORDER BY source NULLS FIRST""".stripMargin)
    ),

    // B9h: model-based quality gate — a fastText/CCNet-style LINEAR
    // classifier over per-document features (sqrt token count,
    // type-token ratio, stopword ratio, mean word length) with fixed
    // literal weights; keep = logit > 0. Every op in the feature and
    // score pipeline is IEEE-exact (sqrt and division are correctly
    // rounded; no exp/log), so both engines produce bit-identical
    // doubles and the decision boundary cannot drift. Per-row codegen'd
    // pipeline: zero shuffle — at 100 TB this is a pure scan pass, and
    // swapping literal weights for a broadcast weight vector is the
    // only change a trained model needs.
    Entry(
      "b9_quality_classifier",
      (s, d) => {
        val logit = Curation.qualityLogit(col("n_tok"), col("ttr"),
          col("stop_ratio"), col("mean_wlen"))
        Curation.qualityFeatures(Tables.documents(s, d))
          .select(col("doc_id"), col("n_tok"),
            round(col("ttr"), 6).as("ttr"),
            round(col("stop_ratio"), 6).as("stop_ratio"),
            round(col("mean_wlen"), 6).as("mean_wlen"),
            round(logit, 6).as("score"),
            (logit > 0).as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    CAST(len(ws) AS INT) AS n_tok,
             |    CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS ttr,
             |    CAST(len(list_filter(ws, w -> w IN
             |      ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
             |      / len(ws) AS stop_ratio,
             |    CAST(len(replace(text, ' ', '')) AS DOUBLE) / len(ws) AS mean_wlen
             |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents) t)
             |SELECT doc_id, n_tok, round(ttr, 6) AS ttr,
             |  round(stop_ratio, 6) AS stop_ratio, round(mean_wlen, 6) AS mean_wlen,
             |  round(-2.0 + 0.35 * sqrt(CAST(n_tok AS DOUBLE)) + 2.0 * ttr
             |    - 1.2 * stop_ratio + 0.15 * mean_wlen, 6) AS score,
             |  (-2.0 + 0.35 * sqrt(CAST(n_tok AS DOUBLE)) + 2.0 * ttr
             |    - 1.2 * stop_ratio + 0.15 * mean_wlen) > 0 AS keep
             |FROM f ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B9j: within-corpus n-gram novelty — for every document, the
    // share of its distinct 4-grams whose FIRST occurrence (minimum
    // doc_id) is this document. Low-novelty docs are boilerplate /
    // internal near-copies; this is the corpus-internal complement of
    // b9_decontaminate's external eval check. Plan: one gram
    // generator + distinct, one groupBy(gram) min, one equi-join back
    // on the gram, one per-doc agg. The gram table here is
    // corpus-sized, so unlike decontamination the join is a genuine
    // shuffle hash join on the gram key — at 100 TB the gram strings
    // become xxhash64 longs (~10× narrower shuffle rows); the judged
    // query keeps raw strings so DuckDB can replay it.
    Entry(
      "b9_novelty",
      (s, d) =>
        Curation.noveltyScores(Tables.documents(s, d)).orderBy("doc_id"),
      Some("""WITH g AS (
             |  SELECT DISTINCT doc_id, ng FROM (
             |    SELECT doc_id, array_to_string(list_slice(ws, i, i + 3), ' ') AS ng
             |    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t,
             |         unnest(range(1, greatest(len(ws) - 3, 0) + 1)) AS u(i))),
             |f AS (SELECT ng, min(doc_id) AS first_doc FROM g GROUP BY 1)
             |SELECT g.doc_id, count(*) AS n_grams,
             |  count(*) FILTER (WHERE f.first_doc = g.doc_id) AS n_novel,
             |  round(CAST(count(*) FILTER (WHERE f.first_doc = g.doc_id) AS DOUBLE)
             |    / count(*), 6) AS novelty
             |FROM g JOIN f USING (ng)
             |GROUP BY g.doc_id ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B9i: LM-based quality scoring (CCNet-style) — train a bigram
    // language model on the corpus itself (two hash aggregations),
    // then score every document by average log-probability and
    // perplexity under that model. High-ppl documents are the
    // out-of-distribution / garbage candidates a crawl pipeline
    // drops or down-weights. Per-bigram log-probs go through the
    // DECIMAL(28,6) exact-sum convention so Spark's partial-agg order
    // cannot drift from DuckDB's sequential sum. At 100 TB the model
    // table is vocabulary²-bounded (≪ corpus; broadcast or
    // hash-joined), and training + scoring are two scans — this is
    // the same plan shape a real KenLM-filter pass has, with the
    // model swapped for a learned one.
    Entry(
      "b9_lm_perplexity",
      (s, d) =>
        Curation.lmPerplexity(Tables.documents(s, d)).orderBy("doc_id"),
      Some(s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |b AS (SELECT doc_id, unnest(list_transform(range(2, len(ws) + 1),
             |        i -> ws[i - 1] || ' ' || ws[i])) AS bg
             |      FROM w WHERE len(ws) >= 2),
             |c AS (SELECT bg, count(*) AS cnt FROM b GROUP BY 1),
             |p AS (SELECT bg, CAST(cnt AS DOUBLE) /
             |        sum(cnt) OVER (PARTITION BY string_split(bg, ' ')[1]) AS prob
             |      FROM c),
             |s AS (SELECT doc_id, ${dsumSql("ln(prob)")} AS slp,
             |        count(*) AS n_bigrams
             |      FROM b JOIN p USING (bg) GROUP BY doc_id)
             |SELECT doc_id, n_bigrams, round(slp / n_bigrams, 6) AS avg_lp,
             |  round(exp(-(slp / n_bigrams)), 4) AS ppl
             |FROM s ORDER BY doc_id NULLS FIRST""".stripMargin)
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
    ),

    // B9k: the full curation pipeline as ONE query — language gate →
    // normalization → repetition/length quality gate → exact dedup →
    // md5 split → per-(split, source) doc/token accounting. Every
    // stage is individually judged elsewhere; this entry proves the
    // composition (one lazy plan, corpus scanned once) matches the
    // same composition replayed stage-by-stage in DuckDB.
    Entry(
      "b9_pipeline",
      (s, d) =>
        Curation.pipeline(Tables.documents(s, d))
          .orderBy("split", "source"),
      Some("""WITH en AS (SELECT doc_id, source,
             |    trim(regexp_replace(regexp_replace(lower(text),
             |      '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g')) AS t
             |  FROM documents WHERE lang = 'en'),
             |bg AS (SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bg
             |  FROM (SELECT doc_id, string_split(t, ' ') AS ws FROM en) x,
             |       unnest(range(1, len(ws))) AS u(i)),
             |rep AS (SELECT doc_id,
             |    round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS rep_ratio
             |  FROM (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2) c
             |  GROUP BY 1),
             |q AS (SELECT en.* FROM en JOIN rep USING (doc_id)
             |  WHERE len(string_split(t, ' ')) >= 20 AND rep_ratio <= 0.2),
             |k AS (SELECT * FROM (SELECT *, row_number() OVER (
             |    PARTITION BY md5(t) ORDER BY doc_id) AS rn FROM q) y
             |  WHERE rn = 1),
             |s AS (SELECT *, CASE WHEN h < 'c' THEN 'train'
             |    WHEN h < 'e' THEN 'val' ELSE 'test' END AS split
             |  FROM (SELECT *, substring(md5(CAST(doc_id AS VARCHAR) || ':graft'),
             |    1, 1) AS h FROM k) z)
             |SELECT split, source, count(*) AS n_docs,
             |  CAST(sum(len(string_split(t, ' '))) AS BIGINT) AS n_tokens
             |FROM s GROUP BY split, source
             |ORDER BY split NULLS FIRST, source NULLS FIRST""".stripMargin)
    ),

    // B1c: URL-canonicalization dedup (RefinedWeb-style): documents
    // reached via scheme/www/tracking-param variants of the same URL
    // are duplicates. A synthetic URL is planted per doc_id (so both
    // engines build identical inputs; %3 adds www., %2 adds tracking
    // params, %200 forces real collisions); canonical = lowercased
    // host sans www. + path sans query. Spark exercises the built-in
    // parse_url; DuckDB replays it with regexes. Stateless per-row
    // canonicalization + one hash-agg — at 100 TB the canonical
    // string becomes the dedup shuffle key exactly like b1's digest.
    Entry(
      "b1_url_dedup",
      (s, d) => {
        val url = concat(lit("https://"),
          when(col("doc_id") % 3 === 0, lit("www.")).otherwise(lit("")),
          lit("site"), (col("doc_id") % 200).cast("string"),
          lit(".example.com/page/"), (col("doc_id") % 50).cast("string"),
          when(col("doc_id") % 2 === 0,
            concat(lit("?utm_source=x&ref="), col("doc_id").cast("string")))
            .otherwise(lit("")))
        Tables.documents(s, d)
          .select(col("doc_id"), url.as("url"))
          .select(col("doc_id"),
            concat(
              regexp_replace(lower(parse_url(col("url"), lit("HOST"))),
                "^www\\.", ""),
              lower(parse_url(col("url"), lit("PATH")))).as("canonical_url"))
          .groupBy("canonical_url")
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_id"))
          .orderBy("canonical_url")
      },
      Some("""WITH u AS (SELECT doc_id,
             |  'https://' || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END ||
             |  'site' || (doc_id % 200) || '.example.com/page/' || (doc_id % 50) ||
             |  CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x&ref=' || doc_id
             |       ELSE '' END AS url FROM documents),
             |c AS (SELECT doc_id,
             |  regexp_replace(lower(regexp_extract(url, 'https?://([^/?]+)', 1)),
             |    '^www\.', '') ||
             |  lower(regexp_extract(url, 'https?://[^/?]+([^?]*)', 1)) AS canonical_url
             |  FROM u)
             |SELECT canonical_url, count(*) AS n_docs, min(doc_id) AS keeper_id
             |FROM c GROUP BY canonical_url
             |ORDER BY canonical_url NULLS FIRST""".stripMargin)
    ),

    // B9l: weighted priority sampling (exponential-clocks / A-ES):
    // key_i = -ln(u_i) / w_i with u_i a stateless md5 uniform — the
    // k smallest keys ARE a weighted sample without replacement, and
    // any executor can score any row. u gets a half-ulp shift
    // ((h + 0.5) / 2^32) so it can never be exactly 0 — Spark's
    // log(0) would return a NULL that sorts into the sample while
    // DuckDB's ln(0) errors outright. keys are rounded to 9 dp on
    // BOTH sides so a libm ulp difference can never flip the top-k
    // cut; ties (equal rounded keys) break on doc_id. The top-k
    // itself is TakeOrderedAndProject — distributed heap-select, no
    // global sort, no single-partition window. Weight = n_chars, so
    // long docs are overrepresented; the per-source rollup makes that
    // visible and keeps raw sample rows out of the judged output.
    Entry(
      "b9_weighted_sample",
      (s, d) => {
        val u = (conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":wsample"))), 1, 8), 16, 10).cast("long").cast("double") + 0.5) /
          lit(4294967296.0)
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("key",
            round(-log(u) / col("n_chars").cast("double"), 9))
          .orderBy(col("key").asc, col("doc_id").asc).limit(200)
          .groupBy("source")
          .agg(count(lit(1)).as("n_sampled"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy("source")
      },
      Some("""WITH k AS (SELECT doc_id, source, n_chars,
             |  round(-ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
             |      || ':wsample'), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0)
             |    / CAST(n_chars AS DOUBLE), 9) AS key
             |  FROM documents),
             |s AS (SELECT * FROM k ORDER BY key, doc_id LIMIT 200)
             |SELECT source, count(*) AS n_sampled,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM s GROUP BY source
             |ORDER BY source NULLS FIRST""".stripMargin)
    )
  )
}
