package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryRegistry._
import graft.functions.VectorOps
import graft.sources.Tables

/** LLM-training-data pipeline operators — SURVEY.md §2.B. Dedup (exact,
  * MinHash+LSH, SimHash, n-gram Jaccard), similarity search (exact +
  * LSH-bucketed ANN), text analysis (token stats, quality, language-ID,
  * fingerprinting). The scale paths: dedup and ANN bucket before joining
  * (never all-pairs); the exact top-k broadcasts only the bounded query
  * set; everything is built-in expressions except where typed state is
  * genuinely needed.
  */
object LlmQueries {

  private def words(c: org.apache.spark.sql.Column) = split(c, " ")

  // Shared DuckDB replay of the all-integer k-means state
  // (Similarity.kmeansState): quantize → seed → (assign → update) × 2.
  // b4_kmeans aggregates the final assignment; b4_ivf_verified probes
  // from the same c2 centroids — ONE definition, two consumers, so the
  // twins cannot drift. Sums run in DuckDB's HUGEINT (mirroring the
  // Spark side's DECIMAL(38,0) accumulators).
  private def kmAssignSql(c: String, xT: String = "x") =
    s"""SELECT vec_id, cid, dist FROM (
       |  SELECT vec_id, cid, dist, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |  FROM (SELECT $xT.vec_id, c.cid,
       |      CAST(sum(($xT.xv * 1000000 - c.cv_micro) *
       |               ($xT.xv * 1000000 - c.cv_micro)) AS BIGINT) AS dist
       |    FROM $xT JOIN $c c USING (pos)
       |    GROUP BY $xT.vec_id, c.cid) d) r
       |WHERE rn = 1""".stripMargin
  private def kmUpdateSql(a: String, xT: String = "x") =
    s"""SELECT cid, pos,
       |  CAST((sum(xv) * 1000000) // count(*) AS BIGINT) AS cv_micro
       |FROM $xT JOIN $a USING (vec_id) GROUP BY cid, pos""".stripMargin
  // Shared quantize prefix (x = int8 codes) — consumed by the k-means/
  // IVF state, the PQ codebook replay, and the corpus-scaled SemDeDup.
  private val xSql =
    s"""WITH x AS (SELECT vec_id, i - 1 AS pos,
       |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 127 / nullif(l2, 0)
       |      + 0.5) AS BIGINT) AS xv
       |  FROM (SELECT vec_id, embedding,
       |      sqrt(list_aggregate(list_transform(embedding,
       |        v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), 'sum')) AS l2
       |    FROM embeddings) e,
       |    unnest(range(1, len(embedding) + 1)) AS u(i)
       |  WHERE l2 > 0)""".stripMargin
  // Fixed-k seed table (sd = k smallest ids numbered 0..k-1) for the
  // b4 index family, and the corpus-scaled variant replaying
  // Similarity.semanticCells: k = greatest(4, ceil(n/500)) computed
  // from the SAME nonzero-norm count the Spark entry uses, so the two
  // engines derive identical k at every scale factor.
  private val kmBaseSql =
    s"""$xSql,
       |sd AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1
       |    AS INT) AS cid
       |  FROM (SELECT DISTINCT vec_id FROM x ORDER BY vec_id LIMIT 4) q)""".stripMargin
  private val semSeedSql =
    s"""kk AS (SELECT greatest(4, CAST(ceil(count(DISTINCT vec_id) / 500.0)
       |    AS BIGINT)) AS k FROM x),
       |sd AS (SELECT vec_id, cid FROM (
       |    SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1
       |      AS INT) AS cid
       |    FROM (SELECT DISTINCT vec_id FROM x) q) r, kk
       |  WHERE r.cid < kk.k)""".stripMargin
  private val kmChainSql =
    s"""c0 AS (SELECT sd.cid, x.pos, x.xv * 1000000 AS cv_micro
       |  FROM x JOIN sd USING (vec_id)),
       |a1 AS (${kmAssignSql("c0")}),
       |c1 AS (${kmUpdateSql("a1")}),
       |a2 AS (${kmAssignSql("c1")}),
       |c2 AS (${kmUpdateSql("a2")})""".stripMargin
  private val kmStateSql = s"$kmBaseSql,\n$kmChainSql"
  // k-parameterized variant (the chain itself is k-independent: it
  // iterates whatever cids the seed table carries)
  private def kmStateSqlK(k: Int) =
    s"""$xSql,
       |sd AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1
       |    AS INT) AS cid
       |  FROM (SELECT DISTINCT vec_id FROM x ORDER BY vec_id LIMIT $k) q),
       |$kmChainSql""".stripMargin

  // DuckDB replay of the per-subspace PQ codebook training
  // (Similarity.pqVerified): the k-means assign/update pair with the
  // extra (sub = pos // PqSubDim) grouping level and its own PqK-seed
  // table. Same all-integer arithmetic, same tie rules.
  private val PqSubDim = 8
  private val PqK = 16
  private val PqShortlist = 100
  private def pqAssignSql(c: String) =
    s"""SELECT vec_id, sub, cid FROM (
       |  SELECT vec_id, sub, cid, row_number() OVER (
       |    PARTITION BY vec_id, sub ORDER BY dist, cid) AS rn
       |  FROM (SELECT x.vec_id, c.sub, c.cid,
       |      CAST(sum((x.xv * 1000000 - c.cv_micro) *
       |               (x.xv * 1000000 - c.cv_micro)) AS BIGINT) AS dist
       |    FROM x JOIN $c c USING (pos)
       |    GROUP BY x.vec_id, c.sub, c.cid) d) r
       |WHERE rn = 1""".stripMargin
  private def pqUpdateSql(a: String) =
    s"""SELECT CAST(pos // $PqSubDim AS INT) AS sub, cid, pos,
       |  CAST((sum(xv) * 1000000) // count(*) AS BIGINT) AS cv_micro
       |FROM x JOIN $a a ON x.vec_id = a.vec_id AND x.pos // $PqSubDim = a.sub
       |GROUP BY cid, pos""".stripMargin
  private val pqChainSql =
    s"""psd AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1
       |    AS INT) AS cid
       |  FROM (SELECT DISTINCT vec_id FROM x ORDER BY vec_id LIMIT $PqK) q),
       |pc0 AS (SELECT CAST(x.pos // $PqSubDim AS INT) AS sub, psd.cid, x.pos,
       |    x.xv * 1000000 AS cv_micro
       |  FROM x JOIN psd USING (vec_id)),
       |pa1 AS (${pqAssignSql("pc0")}),
       |pc1 AS (${pqUpdateSql("pa1")}),
       |pa2 AS (${pqAssignSql("pc1")}),
       |pc2 AS (${pqUpdateSql("pa2")})""".stripMargin
  private val pqStateSql = s"$kmBaseSql,\n$pqChainSql"

  val entries: Seq[Entry] = Seq(
    // B1: exact dedup by normalized text hash — hash-groupBy, partial agg
    // before the shuffle; the survivor is the smallest doc_id.
    Entry(
      "b1_exact_dedup",
      (s, d) =>
        Tables.documents(s, d)
          .groupBy(md5(lower(trim(col("text")))).as("h"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
          .select("doc_id", "n_copies")
          .orderBy("doc_id"),
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS n_copies
             |FROM documents GROUP BY md5(lower(trim(text)))
             |ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B1b: INCREMENTAL exact dedup — the daily-ingest shape: a new
    // batch (fresh docs plus a planted re-crawl of every fifth
    // existing doc under a new id) is deduplicated AGAINST the
    // existing corpus with a left-anti join on the normalized text
    // digest, without ever re-clustering the corpus itself. At
    // 100 TB the corpus side never broadcasts — the anti-join
    // shuffles 16-byte digests (~1% of corpus bytes), or degrades to
    // a bloom-filter pre-filter of the batch when even that is too
    // much; assignment is per-row and idempotent, so re-running an
    // ingest cannot double-admit.
    Entry(
      "b1_incremental_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("h", substring(md5(concat(col("doc_id").cast("string"), lit(":inc"))), 1, 1))
        val corpus = docs.filter(col("h") < "c")
        val newBatch = docs.filter(col("h") >= "c")
          .select(col("doc_id").as("new_id"), col("text"))
          .union(corpus.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 10000000L).as("new_id"), col("text")))
        Curation.dedupAgainst(newBatch, corpus)
          .select(col("new_id"))
          .orderBy("new_id")
      },
      Some("""WITH s AS (SELECT doc_id, text,
             |    substring(md5(CAST(doc_id AS VARCHAR) || ':inc'), 1, 1) AS h
             |  FROM documents),
             |old AS (SELECT DISTINCT md5(lower(trim(text))) AS dh FROM s WHERE h < 'c'),
             |newb AS (SELECT doc_id AS new_id, text FROM s WHERE h >= 'c'
             |         UNION ALL
             |         SELECT doc_id + 10000000, text FROM s WHERE h < 'c' AND doc_id % 5 = 0)
             |SELECT new_id FROM newb
             |WHERE NOT EXISTS (SELECT 1 FROM old
             |                  WHERE old.dh = md5(lower(trim(newb.text))))
             |ORDER BY new_id NULLS FIRST""".stripMargin)
    ),

    // B2: MinHash+LSH fuzzy dedup — band-bucket join, no all-pairs
    // comparison (non-SQL; semantics unit-tested on planted near-dups).
    Entry(
      "b2_minhash_dedup",
      (s, d) =>
        MinHash.dupGroups(Tables.documents(s, d), "doc_id", "text", 0.5)
          .orderBy("doc_id"),
      None
    ),

    // B2a': the same fuzzy-dedup pipeline, ORACLE-CHECKED end-to-end.
    // The production path above hashes with the codegen'd xxhash64
    // expressions (not DuckDB-expressible); this variant derives the
    // 8-slot signature from md5 — one digest per shingle, slot i =
    // min over shingles of hex chars [4i, 4i+4) — so DuckDB replays
    // shingle → signature → 4-band LSH buckets → slot-agreement
    // filter → connected components (recursive CTE) bit-for-bit.
    Entry(
      "b2_minhash_md5_groups",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val slotCols = (0 until 8).map(i => min(substring(col("dg"), i * 4 + 1, 4)).as(s"s$i"))
        // spread (r19): the shingle explode + md5 otherwise runs inside
        // the single-row-group scan task — serial on any core count
        val sig = spread(docs)
          .select(col("doc_id"),
            explode(array_distinct(MinHash.shingles(lower(trim(col("text"))), 3))).as("g"))
          .select(col("doc_id"), md5(col("g")).as("dg"))
          .groupBy("doc_id")
          .agg(slotCols.head, slotCols.tail: _*)
        val slots = (0 until 8).map(i => col(s"s$i"))
        val bands = sig.select(col("doc_id") +: slots :+
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("band"), concat(col(s"s${2 * b}"), col(s"s${2 * b + 1}")).as("bk"))): _*)).as("bs"): _*)
          .select(col("doc_id") +: slots :+ col("bs.band").as("band") :+ col("bs.bk").as("bk"): _*)
          .transform(graft.QueryRegistry.ckpt)
        val a = bands.toDF(bands.columns.map(c => if (c == "band" || c == "bk") c else s"a_$c"): _*)
        val b = bands.toDF(bands.columns.map(c => if (c == "band" || c == "bk") c else s"b_$c"): _*)
        val agree = (0 until 8).map(i =>
          when(col(s"a_s$i") === col(s"b_s$i"), 1).otherwise(0)).reduce(_ + _)
        val pairs = a.join(b, Seq("band", "bk"))
          .filter(col("a_doc_id") < col("b_doc_id"))
          .filter(agree >= 4)
          .select(col("a_doc_id").as("doc_a"), col("b_doc_id").as("doc_b"))
          .distinct()
          .transform(graft.QueryRegistry.ckpt)
        val members = pairs.select(col("doc_a").as("doc_id"))
          .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
        val comp = MinHash.connectedComponents(members, pairs)
          .select(col("doc_id").as("m_id"), col("dup_group").as("m_grp"))
        docs.select(col("doc_id"))
          .join(comp, col("doc_id") === col("m_id"), "left")
          .select(col("doc_id"), coalesce(col("m_grp"), col("doc_id")).as("dup_group"))
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE
             |w AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM documents),
             |sh AS (SELECT doc_id, CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
             |       ELSE list_transform(range(1, len(ws) - 1), i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]) END AS gs
             |       FROM w),
             |dig AS (SELECT DISTINCT doc_id, md5(unnest(gs)) AS dg FROM sh),
             |sig AS (SELECT doc_id,
             |  min(substring(dg,1,4)) AS s0, min(substring(dg,5,4)) AS s1,
             |  min(substring(dg,9,4)) AS s2, min(substring(dg,13,4)) AS s3,
             |  min(substring(dg,17,4)) AS s4, min(substring(dg,21,4)) AS s5,
             |  min(substring(dg,25,4)) AS s6, min(substring(dg,29,4)) AS s7
             |  FROM dig GROUP BY doc_id),
             |bands AS (SELECT doc_id, s0,s1,s2,s3,s4,s5,s6,s7, b,
             |  CASE b WHEN 0 THEN s0||s1 WHEN 1 THEN s2||s3
             |         WHEN 2 THEN s4||s5 ELSE s6||s7 END AS bk
             |  FROM sig, unnest(range(0, 4)) AS u(b)),
             |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM bands a JOIN bands b ON a.b = b.b AND a.bk = b.bk AND a.doc_id < b.doc_id
             |  WHERE (CASE WHEN a.s0=b.s0 THEN 1 ELSE 0 END + CASE WHEN a.s1=b.s1 THEN 1 ELSE 0 END +
             |         CASE WHEN a.s2=b.s2 THEN 1 ELSE 0 END + CASE WHEN a.s3=b.s3 THEN 1 ELSE 0 END +
             |         CASE WHEN a.s4=b.s4 THEN 1 ELSE 0 END + CASE WHEN a.s5=b.s5 THEN 1 ELSE 0 END +
             |         CASE WHEN a.s6=b.s6 THEN 1 ELSE 0 END + CASE WHEN a.s7=b.s7 THEN 1 ELSE 0 END) >= 4),
             |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
             |          UNION ALL SELECT id_b, id_a FROM pairs),
             |walk(doc_id, lbl) AS (
             |  SELECT doc_id, doc_id FROM documents
             |  UNION
             |  SELECT e.src, k.lbl FROM edges e JOIN walk k ON e.dst = k.doc_id WHERE k.lbl < e.src
             |)
             |SELECT doc_id, min(lbl) AS dup_group FROM walk GROUP BY doc_id
             |ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B2b: exact n-gram Jaccard between adjacent doc pairs (the verify
    // step a fuzzy-dedup pipeline runs on LSH candidates).
    Entry(
      "b2_ngram_jaccard",
      (s, d) => {
        // shingle once (interpreted HOF — both join sides would
        // re-shingle the corpus otherwise); spread (r19): shingling
        // otherwise runs inside the single scan task
        val docs = spread(Tables.documents(s, d))
          .select(col("doc_id"), array_distinct(MinHash.shingles(col("text"), 3)).as("g"))
          .transform(graft.QueryRegistry.ckpt)
        val a = docs.select((col("doc_id")).as("doc_a"), col("g").as("ga"))
        val b = docs.select((col("doc_id") - 1).as("doc_a"), col("doc_id").as("doc_b"), col("g").as("gb"))
        a.join(b, "doc_a")
          .select(
            col("doc_a"), col("doc_b"),
            round(MinHash.setJaccard(col("ga"), col("gb")), 6).as("jaccard"))
          .orderBy("doc_a")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
             |g AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
             |ELSE list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END) AS grams
             |FROM w)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
             |len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
             |FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
             |ORDER BY doc_a NULLS FIRST""".stripMargin)
    ),

    // B2f: prefix-filtered similarity join (PPJoin-style) — the exact
    // set-similarity-join technique: shingle sets ordered by global
    // document frequency (rarest first), each doc indexed only by its
    // PREFIX (n − ceil(t·n) + 1 rarest shingles); two docs can reach
    // Jaccard ≥ t only if their prefixes share a shingle, so the
    // candidate join touches rare-shingle collisions instead of all
    // pairs. Candidates then verify exactly. The DuckDB oracle computes
    // the BRUTE-FORCE definition (inverted-index intersection counts,
    // no prefix restriction) — the hash match PROVES the prefix filter
    // dropped no qualifying pair. Complements LSH: exact (no recall
    // loss) where LSH is probabilistic.
    Entry(
      "b2_prefix_join",
      (s, d) =>
        MinHash.prefixJoin(Tables.documents(s, d), t = 0.5)
          .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jaccard"))
          .orderBy("doc_a", "doc_b"),
      Some("""WITH w AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM documents),
             |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
             |  ELSE list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END) AS g
             |  FROM w),
             |ex AS (SELECT doc_id, len(g) AS n, unnest(g) AS s FROM sh),
             |i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    max(a.n) AS na, max(b.n) AS nb, count(*) AS ix
             |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b,
             |  round(CAST(ix AS DOUBLE) / (na + nb - ix), 6) AS jaccard
             |FROM i
             |WHERE round(CAST(ix AS DOUBLE) / (na + nb - ix), 6) >= 0.5
             |ORDER BY doc_a NULLS FIRST, doc_b NULLS FIRST""".stripMargin)
    ),

    // B2e: MinHash Jaccard ESTIMATE vs exact — the sketch-accuracy
    // query: per adjacent doc pair, the 8-slot md5-minhash agreement
    // fraction (the estimator LSH banding thresholds on) next to the
    // exact shingle Jaccard and the absolute error. The estimate needs
    // only the 32-byte signatures — at 100 TB the exact column is the
    // audit (computable for sampled pairs), the estimate is what every
    // candidate pair actually pays for. Oracle replays both sides.
    Entry(
      "b2_jaccard_est",
      (s, d) => {
        // spread (r19): shingling otherwise runs inside the single scan task
        val docs = spread(Tables.documents(s, d))
          .select(col("doc_id"),
            array_distinct(MinHash.shingles(lower(trim(col("text"))), 3)).as("g"))
          .transform(graft.QueryRegistry.ckpt)
        val sig = docs
          .select(col("doc_id"), explode(col("g")).as("gr"))
          .select(col("doc_id"), md5(col("gr")).as("dg"))
          .groupBy("doc_id")
          .agg((0 until 8).map(i => min(substring(col("dg"), i * 4 + 1, 4)).as(s"s$i")).head,
            (0 until 8).map(i => min(substring(col("dg"), i * 4 + 1, 4)).as(s"s$i")).tail: _*)
        val withSig = docs.join(sig, "doc_id")
        val a = withSig.toDF(withSig.columns.map(c => s"a_$c"): _*)
        val b = withSig.toDF(withSig.columns.map(c => s"b_$c"): _*)
        val agree = (0 until 8).map(i =>
          when(col(s"a_s$i") === col(s"b_s$i"), 1).otherwise(0)).reduce(_ + _)
        a.join(b, col("b_doc_id") === col("a_doc_id") + 1)
          .select(
            col("a_doc_id").as("doc_a"), col("b_doc_id").as("doc_b"),
            (agree.cast("double") / 8).as("est_j"),
            MinHash.setJaccard(col("a_g"), col("b_g")).as("exact_j"))
          .select(col("doc_a"), col("doc_b"),
            round(col("est_j"), 6).as("est_j"),
            round(col("exact_j"), 6).as("exact_j"),
            round(abs(col("est_j") - col("exact_j")), 6).as("abs_err"))
          .orderBy("doc_a")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM documents),
             |g AS (SELECT doc_id, list_distinct(CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
             |  ELSE list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END) AS grams
             |  FROM w),
             |dig AS (SELECT DISTINCT doc_id, md5(unnest(grams)) AS dg FROM g),
             |sig AS (SELECT doc_id,
             |  min(substring(dg,1,4)) AS s0, min(substring(dg,5,4)) AS s1,
             |  min(substring(dg,9,4)) AS s2, min(substring(dg,13,4)) AS s3,
             |  min(substring(dg,17,4)) AS s4, min(substring(dg,21,4)) AS s5,
             |  min(substring(dg,25,4)) AS s6, min(substring(dg,29,4)) AS s7
             |  FROM dig GROUP BY doc_id),
             |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  CAST(CASE WHEN sa.s0=sb.s0 THEN 1 ELSE 0 END + CASE WHEN sa.s1=sb.s1 THEN 1 ELSE 0 END +
             |       CASE WHEN sa.s2=sb.s2 THEN 1 ELSE 0 END + CASE WHEN sa.s3=sb.s3 THEN 1 ELSE 0 END +
             |       CASE WHEN sa.s4=sb.s4 THEN 1 ELSE 0 END + CASE WHEN sa.s5=sb.s5 THEN 1 ELSE 0 END +
             |       CASE WHEN sa.s6=sb.s6 THEN 1 ELSE 0 END + CASE WHEN sa.s7=sb.s7 THEN 1 ELSE 0 END
             |    AS DOUBLE) / 8 AS est_j,
             |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
             |    len(list_distinct(list_concat(a.grams, b.grams))) AS exact_j
             |  FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
             |  JOIN sig sa ON sa.doc_id = a.doc_id
             |  JOIN sig sb ON sb.doc_id = b.doc_id)
             |SELECT doc_a, doc_b, round(est_j, 6) AS est_j,
             |  round(exact_j, 6) AS exact_j,
             |  round(abs(est_j - exact_j), 6) AS abs_err
             |FROM p ORDER BY doc_a NULLS FIRST""".stripMargin)
    ),

    // B2c: edit distance between adjacent doc pairs — the character-
    // level verify step for dedup candidates (exact Levenshtein; both
    // engines implement the classic DP).
    Entry(
      "b2_edit_distance",
      (s, d) => {
        // Levenshtein is O(|a|·|b|) per pair — bound it to the 100-char
        // prefix (how production dedup verify uses it: a cheap prefix
        // gate before any full-text distance).
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), substring(col("text"), 1, 100).as("t"))
        val a = docs.select(col("doc_id").as("doc_a"), col("t").as("ta"))
        val b = docs.select((col("doc_id") - 1).as("doc_a"), col("doc_id").as("doc_b"), col("t").as("tb"))
        a.join(b, "doc_a")
          .select(col("doc_a"), col("doc_b"),
            levenshtein(col("ta"), col("tb")).as("edit_dist"),
            length(col("ta")).as("len_a"))
          .orderBy("doc_a")
      },
      Some("""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |CAST(levenshtein(left(a.text, 100), left(b.text, 100)) AS INT) AS edit_dist,
             |length(left(a.text, 100)) AS len_a
             |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
             |ORDER BY doc_a NULLS FIRST""".stripMargin)
    ),

    // B3: exact top-k cosine similarity — bounded query set broadcast
    // against the full corpus; norms precomputed once per side; double
    // math identical to the oracle's list_inner_product.
    Entry(
      "b3_cosine_topk",
      (s, d) => Similarity.cosineTopK(Tables.embeddings(s, d), col("vec_id") < 10, k = 5),
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
             |sims AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
             |list_inner_product(q.v, c.v) / (q.nrm * c.nrm) AS sim
             |FROM n q CROSS JOIN n c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id)
             |SELECT qid, rnk, cid AS nid, round(sim, 4) AS sim FROM (
             |SELECT qid, cid, sim, row_number() OVER (PARTITION BY qid ORDER BY round(sim, 6) DESC, cid) AS rnk FROM sims)
             |WHERE rnk <= 5 ORDER BY qid NULLS FIRST, rnk NULLS FIRST""".stripMargin)
    ),

    // B4: approximate NN via multi-table random-hyperplane LSH — L=6
    // independent tables of B=6 sign bits; a query's candidates are the
    // union over tables of its bucket-mates. (A single wide signature
    // has recall ≈ 0 here: for a ~60° true neighbor every one of 8
    // hyperplanes must agree, p ≈ (2/3)^8 — measured and fixed; per-
    // table collision is now (2/3)^6 with 6 chances.) Equi-join on
    // (table, bucket), pair-dedup, exact rerank — the O(n²) all-pairs
    // scan never happens (non-SQL; recall floor asserted in
    // AggSketchSpec).
    Entry(
      "b4_lsh_ann",
      (s, d) => {
        val L = 6; val B = 6
        val rnd = new scala.util.Random(42)
        val planes: Seq[Seq[Double]] = Seq.fill(L * B)(Seq.fill(64)(rnd.nextGaussian()))
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").as("v"))
          .withColumn("nrm", VectorOps.norm(col("v")))
        val tables = array((0 until L).map { t =>
          val bits = (0 until B).map { i =>
            when(VectorOps.dot(col("v"), typedlit(planes(t * B + i))) >= 0, lit(1 << i)).otherwise(lit(0))
          }.reduce(_ + _)
          struct(lit(t).as("tbl"), bits.as("bkt"))
        }: _*)
        val b = e.withColumn("bk", explode(tables))
          .select(col("bk.tbl").as("tbl"), col("bk.bkt").as("bkt"),
            col("vec_id"), col("v"), col("nrm"))
        // Multi-probe: each query also probes the B buckets at Hamming
        // distance 1 (one sign bit flipped) — near-boundary neighbors
        // land there. Only the bounded query side expands (×(B+1)
        // before broadcast); the corpus side stays one row per table.
        val probes = array(col("bkt") +: (0 until B).map(i =>
          col("bkt").bitwiseXOR(lit(1 << i))): _*)
        val q = b.filter(col("vec_id") < 10)
          .withColumn("bkt", explode(probes))
          .select(col("tbl"), col("bkt"), col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
        val c = b.select(col("tbl"), col("bkt"), col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
        val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
        c.join(broadcast(q), Seq("tbl", "bkt"))
          .filter(col("qid") =!= col("cid"))
          .select(col("qid"), col("cid"),
            (VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
          .groupBy("qid", "cid").agg(max(col("sim")).as("sim")) // dedupe pairs seen in >1 table
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("qid"), col("rnk"), col("cid").as("nid"), round(col("sim"), 4).as("sim"))
          .orderBy("qid", "rnk")
      },
      None
    ),

    // B4': approximate NN, ORACLE-CHECKED twin — the same bucketed
    // random-hyperplane design as b4_lsh_ann, but the hyperplanes are
    // small INTEGER vectors inlined as literals into BOTH engines
    // (integer components survive decimal text exactly; the Gaussian
    // planes of the production path don't), so DuckDB replays code
    // assignment, bucket join, and exact rerank bit-for-bit.
    Entry(
      "b4_ann_verified",
      (s, d) => {
        val L = 4; val B = 6
        val rnd = new scala.util.Random(7)
        val planes: Seq[Seq[Int]] =
          Seq.fill(L * B)(Seq.fill(64)(rnd.nextInt(31) - 15))
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").as("v"))
          .withColumn("nrm", VectorOps.norm(col("v")))
        val tables = array((0 until L).map { t =>
          val bits = (0 until B).map { i =>
            when(VectorOps.dot(col("v"),
              typedlit(planes(t * B + i).map(_.toDouble))) >= 0, lit(1 << i)).otherwise(lit(0))
          }.reduce(_ + _)
          struct(lit(t).as("tbl"), bits.as("bkt"))
        }: _*)
        val b = e.withColumn("bk", explode(tables))
          .select(col("bk.tbl").as("tbl"), col("bk.bkt").as("bkt"),
            col("vec_id"), col("v"), col("nrm"))
        val q = b.filter(col("vec_id") < 10)
          .select(col("tbl"), col("bkt"), col("vec_id").as("qid"),
            col("v").as("qv"), col("nrm").as("qn"))
        val c = b.select(col("tbl"), col("bkt"), col("vec_id").as("cid"),
          col("v").as("cv"), col("nrm").as("cn"))
        val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
        c.join(broadcast(q), Seq("tbl", "bkt"))
          .filter(col("qid") =!= col("cid"))
          .select(col("qid"), col("cid"),
            (VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
          .groupBy("qid", "cid").agg(max(col("sim")).as("sim"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("qid"), col("rnk"), col("cid").as("nid"), round(col("sim"), 4).as("sim"))
          .orderBy("qid", "rnk")
      },
      Some {
        val L = 4; val B = 6
        val rnd = new scala.util.Random(7)
        val planes: Seq[Seq[Int]] =
          Seq.fill(L * B)(Seq.fill(64)(rnd.nextInt(31) - 15))
        def planeLit(p: Seq[Int]) = p.map(x => s"$x.0").mkString("[", ", ", "]")
        val codeSelects = (0 until L).map { t =>
          val bits = (0 until B).map { i =>
            s"(CASE WHEN list_inner_product(v, ${planeLit(planes(t * B + i))}) >= 0 THEN ${1 << i} ELSE 0 END)"
          }.mkString(" + ")
          s"SELECT vec_id, v, nrm, $t AS tbl, $bits AS bkt FROM n"
        }.mkString("\n|UNION ALL\n|")
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
           |codes AS (
           |$codeSelects),
           |sims AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
           |  max(list_inner_product(q.v, c.v) / (q.nrm * c.nrm)) AS sim
           |  FROM codes q JOIN codes c ON q.tbl = c.tbl AND q.bkt = c.bkt
           |  WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
           |  GROUP BY 1, 2)
           |SELECT qid, rnk, cid AS nid, round(sim, 4) AS sim FROM (
           |  SELECT qid, cid, sim,
           |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS rnk
           |  FROM sims)
           |WHERE rnk <= 3 ORDER BY qid NULLS FIRST, rnk NULLS FIRST""".stripMargin
      }
    ),

    // B5: per-document text analysis — token count, average token length,
    // stopword ratio, simple quality score.
    Entry(
      "b5_text_stats",
      (s, d) => {
        val w = words(col("text"))
        val stop = typedlit(Seq("the", "a", "of", "and", "to", "in", "is", "on"))
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            size(w).as("n_tokens"),
            round(aggregate(transform(w, t => length(t).cast("double")), lit(0.0), _ + _) /
              size(w), 4).as("avg_token_len"),
            round(size(filter(w, t => array_contains(stop, t))).cast("double") /
              size(w), 4).as("stopword_ratio"),
            (size(w) >= 20 && length(col("text")) >= 100).as("quality_pass"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             |round(list_sum(list_transform(string_split(text, ' '), t -> CAST(length(t) AS DOUBLE))) /
             |len(string_split(text, ' ')), 4) AS avg_token_len,
             |round(CAST(len(list_filter(string_split(text, ' '),
             |t -> list_contains(['the','a','of','and','to','in','is','on'], t))) AS DOUBLE) /
             |len(string_split(text, ' ')), 4) AS stopword_ratio,
             |(len(string_split(text, ' ')) >= 20 AND length(text) >= 100) AS quality_pass
             |FROM documents ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B5b: language-ID n-gram/stopword heuristic with a deterministic
    // tie rule (a real lang-ID model would sit behind the same shape).
    Entry(
      "b5_langid",
      (s, d) => {
        val w = words(lower(col("text")))
        def hits(ws: Seq[String]) =
          size(filter(w, t => array_contains(typedlit(ws), t)))
        val en = hits(Seq("the", "and", "of", "a"))
        val es = hits(Seq("el", "la", "de", "que"))
        val de = hits(Seq("der", "die", "das", "und"))
        Tables.documents(s, d)
          .select(
            col("doc_id"), col("lang"),
            when(de > en && de > es, "de").when(es > en, "es").otherwise("en").as("pred_lang"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (SELECT doc_id, lang,
             |len(list_filter(string_split(lower(text),' '), t -> list_contains(['the','and','of','a'], t))) AS en,
             |len(list_filter(string_split(lower(text),' '), t -> list_contains(['el','la','de','que'], t))) AS es,
             |len(list_filter(string_split(lower(text),' '), t -> list_contains(['der','die','das','und'], t))) AS de
             |FROM documents)
             |SELECT doc_id, lang,
             |CASE WHEN de > en AND de > es THEN 'de' WHEN es > en THEN 'es' ELSE 'en' END AS pred_lang
             |FROM h ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B5c: document fingerprint — lexicographic min of shingle digests
    // (winnowing-style representative hash, join-key friendly).
    Entry(
      "b5_fingerprint",
      (s, d) =>
        // explode → codegen'd md5 → min-agg beats md5 inside an
        // interpreted transform lambda: every expression stays in
        // whole-stage codegen and the min partial-aggregates before the
        // (per-doc single row) shuffle.
        // spread (r19): the explode + md5 otherwise runs inside the
        // single-row-group scan task — serial on any core count
        spread(Tables.documents(s, d))
          .select(col("doc_id"), explode(MinHash.shingles(col("text"), 3)).as("sh"))
          .groupBy("doc_id")
          .agg(min(md5(col("sh"))).as("fingerprint"))
          .orderBy("doc_id"),
      Some("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents)
             |SELECT doc_id,
             |list_min(list_transform(CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
             |ELSE list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) END,
             |sh -> md5(sh))) AS fingerprint
             |FROM w ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B5d: rolling-hash document fingerprint — polynomial (Rabin-Karp)
    // hash over the first 32 UTF-8 bytes, the O(1)-update hash family
    // used for content-defined chunking. Byte extraction mirrors the
    // b6 hex-pair trick so both engines hash identical bytes.
    Entry(
      "b5_rolling_hash",
      (s, d) => {
        val byteAt = (i: org.apache.spark.sql.Column) =>
          conv(hex(col("payload").substr(i, lit(1))), 16, 10).cast("long")
        Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .select(
            col("doc_id"),
            // Empty payload: Spark sequence(1, 0) is DESCENDING [1, 0]
            // and DuckDB list_reduce errors on an empty list
            // (ADVICE.md r02) — both sides define hash("") = 0.
            when(length(col("payload")) === 0, lit(0L)).otherwise(
              aggregate(
                sequence(lit(1), least(length(col("payload")), lit(32))),
                lit(0L),
                (acc, i) => (acc * 131 + byteAt(i)) % 1000000007L)).as("rhash"))
          .orderBy("doc_id")
      },
      // list_prepend(0, bytes) makes list_reduce a fold with init 0 —
      // identical to Spark's aggregate (0*131+b1 = b1) and never
      // applied to an empty list, so hash("") = 0 on both engines.
      Some("""WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
             |least(octet_length(encode(text)), 32) AS n FROM documents)
             |SELECT doc_id,
             |list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, n + 1), i ->
             |CAST((strpos('0123456789ABCDEF', substring(hx, CAST(2*i-1 AS INT), 1)) - 1) * 16 +
             |(strpos('0123456789ABCDEF', substring(hx, CAST(2*i AS INT), 1)) - 1) AS BIGINT))),
             |(a, b) -> (a * 131 + b) % 1000000007) AS rhash
             |FROM h ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B5i: BPE pair statistics — the first tokenizer-training step:
    // corpus-wide adjacent character-pair frequencies within
    // whitespace words (the merge a byte-pair encoder would apply
    // first), top-20 with full tie-breaks. Generator → hash agg with
    // map-side combine (post-combine state is pair-vocabulary-sized,
    // like b5_vocab) → TakeOrderedAndProject.
    Entry(
      "b5_bpe_pairs",
      (s, d) =>
        Tables.documents(s, d)
          .select(explode(split(lower(col("text")), " ")).as("w"))
          .filter(length(col("w")) >= 2)
          .select(explode(sequence(lit(1), length(col("w")) - 1)).as("i"), col("w"))
          .select(col("w").substr(col("i"), lit(2)).as("pair"))
          .groupBy("pair")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("pair").asc)
          .limit(20),
      Some("""WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS w
             |    FROM documents),
             |p AS (SELECT substring(w, CAST(i AS INT), 2) AS pair
             |  FROM w, unnest(range(1, length(w))) AS u(i)
             |  WHERE length(w) >= 2)
             |SELECT pair, count(*) AS cnt FROM p GROUP BY pair
             |ORDER BY cnt DESC NULLS LAST, pair NULLS FIRST LIMIT 20""".stripMargin)
    ),

    // B5h: readability scoring — Flesch reading-ease and Flesch-Kincaid
    // grade from whole-doc counts (words, sentences, vowel-group
    // syllable proxy). The three counts are exact integers from
    // identical regex semantics ('[aeiouy]+' and '[.!?]' mean the same
    // in Java regex and RE2), so the score arithmetic is the same IEEE
    // doubles on both engines; rounded defensively.
    Entry(
      "b5_readability",
      (s, d) => {
        val nWords = size(split(col("text"), " "))
        val nSents = greatest(lit(1),
          size(filter(split(col("text"), "[.!?]"), x => length(trim(x)) > 0)))
        val nSyll = greatest(lit(1),
          size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0))))
        Tables.documents(s, d)
          .select(col("doc_id"),
            nWords.as("n_words"), nSents.as("n_sents"), nSyll.as("n_syll"))
          .select(col("doc_id"), col("n_words"), col("n_sents"), col("n_syll"),
            round(lit(206.835)
              - lit(1.015) * col("n_words").cast("double") / col("n_sents")
              - lit(84.6) * col("n_syll").cast("double") / col("n_words"), 4)
              .as("flesch_ease"),
            round(lit(0.39) * col("n_words").cast("double") / col("n_sents")
              + lit(11.8) * col("n_syll").cast("double") / col("n_words")
              - lit(15.59), 4).as("fk_grade"))
          .orderBy("doc_id")
      },
      Some("""WITH c AS (SELECT doc_id,
             |    CAST(len(string_split(text, ' ')) AS INT) AS n_words,
             |    CAST(greatest(1, len(list_filter(string_split_regex(text, '[.!?]'),
             |      x -> length(trim(x)) > 0))) AS INT) AS n_sents,
             |    CAST(greatest(1, len(regexp_extract_all(lower(text), '[aeiouy]+'))) AS INT) AS n_syll
             |  FROM documents)
             |SELECT doc_id, n_words, n_sents, n_syll,
             |round(206.835 - 1.015 * CAST(n_words AS DOUBLE) / n_sents
             |  - 84.6 * CAST(n_syll AS DOUBLE) / n_words, 4) AS flesch_ease,
             |round(0.39 * CAST(n_words AS DOUBLE) / n_sents
             |  + 11.8 * CAST(n_syll AS DOUBLE) / n_words - 15.59, 4) AS fk_grade
             |FROM c ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B6: multimodal/binary columns carried through relational ops —
    // opaque bytes + typed metadata survive a join and an aggregation
    // without exploding.
    Entry(
      "b6_binary_carry",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"), col("n_chars"))
        val emb = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
        docs.join(emb, col("doc_id") === col("vec_id"))
          .groupBy("label")
          .agg(
            count(lit(1)).as("cnt"),
            sum(length(col("payload"))).as("sum_bytes"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy("label")
      },
      Some("""SELECT label, count(*) AS cnt,
             |CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
             |CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents JOIN embeddings ON doc_id = vec_id
             |GROUP BY label ORDER BY label NULLS FIRST""".stripMargin)
    ),

    // B5f: per-source vocabulary profile (Zipf-style corpus analysis)
    // — token count, vocabulary size, type-token ratio, the modal
    // token (deterministic tie-break: count DESC, token ASC) and the
    // head mass carried by the top-10 types. Two shuffles total:
    // (source, tok) hash-agg with map-side combine (the corpus-sized
    // one, combine ratio ≈ tokens/vocab), then the vocab-sized window
    // + final collapse share one hashpartitioning(source) exchange.
    Entry(
      "b5_vocab",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = Tables.documents(s, d)
          .select(col("source"), explode(words(col("text"))).as("tok"))
          .filter(length(col("tok")) > 0)
        val counts = tok.groupBy("source", "tok").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("source").orderBy(col("n").desc, col("tok"))
        counts.withColumn("rk", row_number().over(w))
          .groupBy("source")
          .agg(
            sum(col("n")).as("n_tokens"),
            count(lit(1)).as("vocab_size"),
            round(count(lit(1)).cast("double") / sum(col("n")), 6).as("ttr"),
            max(when(col("rk") === 1, col("tok"))).as("top_token"),
            round(max(when(col("rk") === 1, col("n"))).cast("double") /
              sum(col("n")), 6).as("top_share"),
            round(sum(when(col("rk") <= 10, col("n")).otherwise(0L)).cast("double") /
              sum(col("n")), 6).as("top10_mass"))
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT source, tok FROM (
             |    SELECT source, unnest(string_split(text, ' ')) AS tok
             |    FROM documents) u WHERE len(tok) > 0),
             |c AS (SELECT source, tok, count(*) AS n FROM t GROUP BY 1, 2),
             |r AS (SELECT *, row_number() OVER (
             |    PARTITION BY source ORDER BY n DESC, tok) AS rk FROM c)
             |SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
             |  count(*) AS vocab_size,
             |  round(CAST(count(*) AS DOUBLE) / sum(n), 6) AS ttr,
             |  max(CASE WHEN rk = 1 THEN tok END) AS top_token,
             |  round(CAST(max(CASE WHEN rk = 1 THEN n END) AS DOUBLE) / sum(n), 6)
             |    AS top_share,
             |  round(CAST(sum(CASE WHEN rk <= 10 THEN n ELSE 0 END) AS DOUBLE)
             |    / sum(n), 6) AS top10_mass
             |FROM r GROUP BY source
             |ORDER BY source NULLS FIRST""".stripMargin)
    ),

    // B5g: per-document token entropy — the Shannon-entropy quality
    // signal (low entropy = repetitive/templated text). Each term
    // p·ln p rides the DECIMAL(28,6) accumulator, so Spark's partial
    // aggregation order and DuckDB's sequential order cannot drift;
    // the 1e-6 term quantization also absorbs any ulp-level ln()
    // difference between the engines. Same two-agg shape as b5_vocab:
    // (doc, tok) count with map-side combine, then window + collapse
    // on one doc_id exchange.
    Entry(
      "b5_entropy",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(words(col("text"))).as("tok"))
          .filter(length(col("tok")) > 0)
        val p = col("n") / col("ntok")
        tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
          .withColumn("ntok",
            sum(col("n")).over(Window.partitionBy("doc_id")))
          .groupBy("doc_id")
          .agg(
            max(col("ntok")).as("n_tokens"),
            count(lit(1)).as("n_types"),
            round(-dsum(p * log(p)), 6).as("entropy_nats"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, tok FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |    FROM documents) u WHERE len(tok) > 0),
             |c AS (SELECT doc_id, tok, count(*) AS n FROM t GROUP BY 1, 2),
             |g AS (SELECT *, sum(n) OVER (PARTITION BY doc_id) AS ntok FROM c)
             |SELECT doc_id, CAST(max(ntok) AS BIGINT) AS n_tokens,
             |  count(*) AS n_types,
             |  round(-${dsumSql("(CAST(n AS DOUBLE) / ntok) * ln(CAST(n AS DOUBLE) / ntok)")}, 6)
             |    AS entropy_nats
             |FROM g GROUP BY doc_id
             |ORDER BY doc_id NULLS FIRST""".stripMargin)
    ),

    // B4c: oracle-checked distributed k-means (2 Lloyd iterations,
    // k=4, init = the k smallest surviving ids) over int8-quantized
    // embeddings. All-integer state (micro-unit centroids via DIV,
    // exact long squared distances) makes every assignment
    // total-ordered and engine-independent with NO rounding anywhere
    // — DuckDB replays init → assign → update → assign → update →
    // assign CTE-by-CTE and the cluster sizes and inertia
    // hash-match. The honest-scale twin of the rows-only b4_ivf_ann
    // quantizer.
    Entry(
      "b4_kmeans",
      (s, d) =>
        Similarity.kmeansQuantized(Tables.embeddings(s, d), stateKey = Some(d)).orderBy("cid"),
      Some(
        s"""$kmStateSql,
           |a3 AS (${kmAssignSql("c2")})
           |SELECT cid, count(*) AS n_members,
           |  CAST(sum(dist) // 1000000 AS BIGINT) AS inertia_micro
           |FROM a3 GROUP BY cid ORDER BY cid NULLS FIRST""".stripMargin)
    ),

    // B4c': SAMPLE-TRAINED k-means, ORACLE-CHECKED end to end — the
    // extreme-scale training fallback (kmeansStateSampled) judged,
    // not just spec'd: centroids learn on a deterministic md5-thinned
    // ~40-vector sample (the stateless hashUniform discipline — the
    // identical '0x'||md5 arithmetic lands in the oracle, so both
    // engines draw the SAME sample), then the FULL corpus is assigned
    // against them. DuckDB replays thinning → seed → 2 Lloyd rounds
    // on the sample → full-corpus assignment bit-for-bit. This is the
    // 100 TB shape: training cost capped at the sample, the corpus
    // pays one assignment pass. sampleCap=40 is sized to FORCE the
    // thinned path at every test SF (sf0.001's 50 vectors included);
    // the production default is 200k — at n ≤ cap the trainer
    // short-circuits to exact training, and the oracle agrees by
    // construction (rate ≥ 1 keeps every row).
    Entry(
      "b4_kmeans_sampled",
      (s, d) => {
        val (xe, cent) = Similarity.kmeansStateSampled(Tables.embeddings(s, d),
          k = 4, iters = 2, sampleCap = 40, stateKey = Some(d))
        Similarity.cellDistances(xe, cent)
          .filter(col("__rn") === 1)
          .groupBy("cid")
          .agg(count(lit(1)).as("n_members"),
            expr("CAST(sum(CAST(dist AS DECIMAL(38,0))) DIV 1000000 AS BIGINT)")
              .as("inertia_micro"))
          .orderBy("cid")
      },
      Some(
        s"""$xSql,
           |rate AS (SELECT 40.0 / count(*) AS r FROM embeddings),
           |xs AS (SELECT x.* FROM x, rate
           |  WHERE CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)
           |      || ':kmsample'), 1, 8)) AS BIGINT) / 4294967296.0 < rate.r),
           |sd AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1
           |    AS INT) AS cid
           |  FROM (SELECT DISTINCT vec_id FROM xs ORDER BY vec_id LIMIT 4) q),
           |c0 AS (SELECT sd.cid, xs.pos, xs.xv * 1000000 AS cv_micro
           |  FROM xs JOIN sd USING (vec_id)),
           |a1 AS (${kmAssignSql("c0", "xs")}),
           |c1 AS (${kmUpdateSql("a1", "xs")}),
           |a2 AS (${kmAssignSql("c1", "xs")}),
           |c2 AS (${kmUpdateSql("a2", "xs")}),
           |af AS (${kmAssignSql("c2", "x")})
           |SELECT cid, count(*) AS n_members,
           |  CAST(sum(dist) // 1000000 AS BIGINT) AS inertia_micro
           |FROM af GROUP BY cid ORDER BY cid NULLS FIRST""".stripMargin)
    ),

    // B4t: TWO-LEVEL (coarse→fine) cell assignment, ORACLE-CHECKED —
    // the IVF-pruned assignment pass for corpus-scaled k
    // (Similarity.assignTwoLevel) judged end to end: every 3rd fine
    // centroid serves as a coarse representative, vectors probe their
    // 2 nearest representatives, and exact integer distances are
    // computed ONLY against fine cells routed there — O(n·√k·d) where
    // exact assignment is O(n·k·d). All-integer, so DuckDB replays
    // training (k=8), centroid routing, vector probing, the pruned
    // candidate distances, and the final argmin bit-for-bit. The
    // id_sum column pins exact per-cell MEMBERSHIP: any vector
    // landing in a different cell moves the hash.
    Entry(
      "b4_twolevel_verified",
      (s, d) => {
        val (xe, cent) = Similarity.kmeansState(Tables.embeddings(s, d),
          k = 8, iters = 2, stateKey = Some(d))
        Similarity.assignTwoLevel(xe, cent, stride = 3, wProbe = 2)
          .groupBy("cid")
          .agg(count(lit(1)).as("n_members"), sum(col("vec_id")).as("id_sum"))
          .orderBy("cid")
      },
      Some(
        s"""${kmStateSqlK(8)},
           |co AS (SELECT cid AS ccid, pos, cv_micro AS cc_micro
           |  FROM c2 WHERE cid % 3 = 0),
           |f2d AS (SELECT f.cid, co.ccid,
           |    CAST(sum((f.cv_micro - co.cc_micro) *
           |             (f.cv_micro - co.cc_micro)) AS BIGINT) AS d
           |  FROM c2 f JOIN co USING (pos) GROUP BY f.cid, co.ccid),
           |f2c AS (SELECT cid, ccid FROM (SELECT cid, ccid, row_number()
           |    OVER (PARTITION BY cid ORDER BY d, ccid) AS rn FROM f2d) r
           |  WHERE rn = 1),
           |v2d AS (SELECT x.vec_id, co.ccid,
           |    CAST(sum((x.xv * 1000000 - co.cc_micro) *
           |             (x.xv * 1000000 - co.cc_micro)) AS BIGINT) AS d
           |  FROM x JOIN co USING (pos) GROUP BY x.vec_id, co.ccid),
           |v2c AS (SELECT vec_id, ccid FROM (SELECT vec_id, ccid, row_number()
           |    OVER (PARTITION BY vec_id ORDER BY d, ccid) AS rn FROM v2d) r
           |  WHERE rn <= 2),
           |cc AS (SELECT v.vec_id, f.cid FROM v2c v JOIN f2c f USING (ccid)),
           |ad AS (SELECT cc.vec_id, cc.cid,
           |    CAST(sum((x.xv * 1000000 - c.cv_micro) *
           |             (x.xv * 1000000 - c.cv_micro)) AS BIGINT) AS dist
           |  FROM cc JOIN x ON x.vec_id = cc.vec_id
           |          JOIN c2 c ON c.cid = cc.cid AND c.pos = x.pos
           |  GROUP BY cc.vec_id, cc.cid),
           |af AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, row_number()
           |    OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM ad) z
           |  WHERE rn = 1)
           |SELECT cid, count(*) AS n_members,
           |  CAST(sum(vec_id) AS BIGINT) AS id_sum
           |FROM af GROUP BY cid ORDER BY cid NULLS FIRST""".stripMargin)
    ),

    // B4''': IVF ANN, ORACLE-CHECKED end to end — coarse quantizer =
    // the all-integer b4_kmeans state, probe ranking = the same exact
    // long cell distance (nProbe=2 of k=4 cells), rerank = exact
    // integer dot product of the int8 codes. No float anywhere, so
    // DuckDB replays index build, probing, and rerank bit-for-bit —
    // the verified twin of the rows-only b4_ivf_ann scale path.
    Entry(
      "b4_ivf_verified",
      (s, d) =>
        Similarity.ivfVerified(Tables.embeddings(s, d), col("vec_id") < 10,
          stateKey = Some(d)),
      Some(
        s"""$kmStateSql,
           |d3 AS (SELECT vec_id, cid, dist, row_number() OVER (
           |    PARTITION BY vec_id ORDER BY dist, cid) AS rn
           |  FROM (SELECT x.vec_id, c.cid,
           |      CAST(sum((x.xv * 1000000 - c.cv_micro) *
           |               (x.xv * 1000000 - c.cv_micro)) AS BIGINT) AS dist
           |    FROM x JOIN c2 c USING (pos)
           |    GROUP BY x.vec_id, c.cid) d),
           |cells AS (SELECT vec_id, cid FROM d3 WHERE rn = 1),
           |probes AS (SELECT vec_id AS qid, cid FROM d3
           |  WHERE vec_id < 10 AND rn <= 2),
           |cand AS (SELECT p.qid, c.vec_id AS nid
           |  FROM probes p JOIN cells c USING (cid) WHERE c.vec_id <> p.qid),
           |dots AS (SELECT cand.qid, cand.nid,
           |    CAST(sum(cx.xv * qx.xv) AS BIGINT) AS dot
           |  FROM cand JOIN x cx ON cx.vec_id = cand.nid
           |            JOIN x qx ON qx.vec_id = cand.qid AND qx.pos = cx.pos
           |  GROUP BY cand.qid, cand.nid)
           |SELECT qid, rnk, nid, dot FROM (
           |  SELECT qid, nid, dot, CAST(row_number() OVER (
           |    PARTITION BY qid ORDER BY dot DESC, nid) AS INT) AS rnk
           |  FROM dots) r
           |WHERE rnk <= 3 ORDER BY qid NULLS FIRST, rnk NULLS FIRST""".stripMargin)
    ),

    // B4'''': product-quantization ANN (PQ/ADC + exact refine),
    // ORACLE-CHECKED end to end — per-subspace integer codebooks
    // (8 subspaces × 16 cells, trained with the b4_kmeans Lloyd
    // arithmetic), vectors stored as 8 sub-codes, queries scored via
    // an exact-integer ADC lookup table; the ADC top-100 shortlist is
    // reranked by the exact integer dot product (FAISS refine stage —
    // measured recall@3 0.93 vs 0.23 for raw ADC order on sf0.01).
    // No float anywhere: DuckDB replays codebook training, code
    // assignment, LUT build, ADC scan, and rerank bit-for-bit. The
    // residency-compression half of a FAISS-style IVF+PQ index
    // (b4_ivf_verified is the scan-pruning half).
    Entry(
      "b4_pq_verified",
      (s, d) =>
        Similarity.pqVerified(Tables.embeddings(s, d), col("vec_id") < 10,
          stateKey = Some(d)),
      Some(
        s"""$pqStateSql,
           |p3 AS (${pqAssignSql("pc2")}),
           |lut AS (SELECT q.vec_id AS qid, c.sub, c.cid,
           |    CAST(sum((q.xv * 1000000 - c.cv_micro) *
           |             (q.xv * 1000000 - c.cv_micro)) AS BIGINT) AS ldist
           |  FROM x q JOIN pc2 c USING (pos)
           |  WHERE q.vec_id < 10 GROUP BY 1, 2, 3),
           |adc AS (SELECT l.qid, a.vec_id AS nid,
           |    CAST(sum(l.ldist) AS BIGINT) AS adist
           |  FROM p3 a JOIN lut l ON l.sub = a.sub AND l.cid = a.cid
           |  WHERE a.vec_id <> l.qid GROUP BY 1, 2),
           |short AS (SELECT qid, nid FROM (
           |    SELECT qid, nid, row_number() OVER (
           |      PARTITION BY qid ORDER BY adist, nid) AS srn
           |    FROM adc) s
           |  WHERE srn <= $PqShortlist),
           |dots AS (SELECT short.qid, short.nid,
           |    CAST(sum(cx.xv * qx.xv) AS BIGINT) AS dot
           |  FROM short JOIN x cx ON cx.vec_id = short.nid
           |             JOIN x qx ON qx.vec_id = short.qid AND qx.pos = cx.pos
           |  GROUP BY 1, 2)
           |SELECT qid, rnk, nid, dot FROM (
           |  SELECT qid, nid, dot, CAST(row_number() OVER (
           |    PARTITION BY qid ORDER BY dot DESC, nid) AS INT) AS rnk
           |  FROM dots) r
           |WHERE rnk <= 3 ORDER BY qid NULLS FIRST, rnk NULLS FIRST""".stripMargin)
    ),

    // B4''''': the COMPOSED IVF+PQ index, oracle-checked end to end —
    // the full FAISS-style design assembled from the two verified
    // halves: IVF cells prune the scan (candidates = members of the
    // query's nProbe cells), PQ sub-codes shrink what the scan reads
    // (m ADC lookups per candidate), exact int8-dot refine of the ADC
    // shortlist. One DuckDB query replays BOTH index builds plus
    // probing, the restricted ADC scan, and the rerank bit-for-bit.
    Entry(
      "b4_ivfpq_verified",
      (s, d) =>
        Similarity.ivfPqVerified(Tables.embeddings(s, d), col("vec_id") < 10,
          stateKey = Some(d)),
      Some(
        s"""$kmBaseSql,
           |$kmChainSql,
           |$pqChainSql,
           |d3 AS (SELECT vec_id, cid, dist, row_number() OVER (
           |    PARTITION BY vec_id ORDER BY dist, cid) AS rn
           |  FROM (SELECT x.vec_id, c.cid,
           |      CAST(sum((x.xv * 1000000 - c.cv_micro) *
           |               (x.xv * 1000000 - c.cv_micro)) AS BIGINT) AS dist
           |    FROM x JOIN c2 c USING (pos)
           |    GROUP BY x.vec_id, c.cid) d),
           |cells AS (SELECT vec_id, cid FROM d3 WHERE rn = 1),
           |probes AS (SELECT vec_id AS qid, cid FROM d3
           |  WHERE vec_id < 10 AND rn <= 2),
           |cand AS (SELECT p.qid, c.vec_id AS nid
           |  FROM probes p JOIN cells c USING (cid) WHERE c.vec_id <> p.qid),
           |p3 AS (${pqAssignSql("pc2")}),
           |lut AS (SELECT q.vec_id AS qid, c.sub, c.cid,
           |    CAST(sum((q.xv * 1000000 - c.cv_micro) *
           |             (q.xv * 1000000 - c.cv_micro)) AS BIGINT) AS ldist
           |  FROM x q JOIN pc2 c USING (pos)
           |  WHERE q.vec_id < 10 GROUP BY 1, 2, 3),
           |adc AS (SELECT cand.qid, cand.nid,
           |    CAST(sum(l.ldist) AS BIGINT) AS adist
           |  FROM cand JOIN p3 a ON a.vec_id = cand.nid
           |            JOIN lut l ON l.qid = cand.qid
           |                     AND l.sub = a.sub AND l.cid = a.cid
           |  GROUP BY 1, 2),
           |short AS (SELECT qid, nid FROM (
           |    SELECT qid, nid, row_number() OVER (
           |      PARTITION BY qid ORDER BY adist, nid) AS srn
           |    FROM adc) s
           |  WHERE srn <= 50),
           |dots AS (SELECT short.qid, short.nid,
           |    CAST(sum(cx.xv * qx.xv) AS BIGINT) AS dot
           |  FROM short JOIN x cx ON cx.vec_id = short.nid
           |             JOIN x qx ON qx.vec_id = short.qid AND qx.pos = cx.pos
           |  GROUP BY 1, 2)
           |SELECT qid, rnk, nid, dot FROM (
           |  SELECT qid, nid, dot, CAST(row_number() OVER (
           |    PARTITION BY qid ORDER BY dot DESC, nid) AS INT) AS rnk
           |  FROM dots) r
           |WHERE rnk <= 3 ORDER BY qid NULLS FIRST, rnk NULLS FIRST""".stripMargin)
    ),

    // B2': SemDeDup-style SEMANTIC dedup (cluster-then-compare): the
    // all-integer k-means cells bound the pairwise comparison (Σ cellᵢ²
    // candidates, never n²) and the exact int8-code dot decides
    // near-duplication — a vector is removed when a smaller-id cell
    // mate scores ≥ 5000 (≈ cosine 0.31 at the 127-norm code scale).
    // Every stage is integer-exact, so DuckDB replays clustering, pair
    // scoring, and survivor choice bit-for-bit. The cell count SCALES
    // WITH THE CORPUS (Similarity.semanticCells: k = max(4, ceil(n/500))
    // over nonzero-norm vectors; same formula in the twin's kk CTE), so
    // within-cell pair work stays ~n·500 — linear — instead of the
    // ~n²/k a fixed k degrades to; the count that derives k is a
    // single-column scan, amortized by the per-JVM index memo.
    Entry(
      "b2_semantic_dedup",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val n = emb.filter(VectorOps.norm(col("embedding")) > 0).count()
        Similarity.semanticDedup(emb, k = Similarity.semanticCells(n),
          stateKey = Some(d))
      },
      Some(
        s"""$xSql,
           |$semSeedSql,
           |$kmChainSql,
           |a3 AS (${kmAssignSql("c2")}),
           |dots AS (SELECT aa.cid, aa.vec_id AS id_a, ab.vec_id AS id_b,
           |    CAST(sum(xa.xv * xb.xv) AS BIGINT) AS dot
           |  FROM a3 aa JOIN a3 ab ON aa.cid = ab.cid AND aa.vec_id < ab.vec_id
           |       JOIN x xa ON xa.vec_id = aa.vec_id
           |       JOIN x xb ON xb.vec_id = ab.vec_id AND xb.pos = xa.pos
           |  GROUP BY 1, 2, 3
           |  HAVING sum(xa.xv * xb.xv) >= 5000)
           |SELECT vec_id, cell, kept_id, dot FROM (
           |  SELECT id_b AS vec_id, cid AS cell, id_a AS kept_id, dot,
           |    row_number() OVER (PARTITION BY id_b ORDER BY dot DESC, id_a) AS rn
           |  FROM dots) r
           |WHERE rn = 1 ORDER BY vec_id NULLS FIRST""".stripMargin)
    ),

    // B3': ColBERT-style late-interaction retrieval (MaxSim): each
    // embedding acts as 8 token sub-vectors of 8 dims; score(q, d) =
    // Σ_qsub max_dsub (qsub · dsub) over the exact int8 codes. The
    // interaction is asymmetric and non-linear (max inside sum), so it
    // is NOT expressible as one dot product — the defining operator of
    // multi-vector retrieval. Bounded query side broadcasts; sub-dots
    // combine map-side; all-integer scores rank totally.
    Entry(
      "b3_maxsim",
      (s, d) =>
        Similarity.maxSimTopK(Tables.embeddings(s, d), col("vec_id") < 5),
      Some(
        s"""$kmBaseSql
           |, xs AS (SELECT vec_id, pos, xv, CAST(pos // 8 AS INT) AS sub,
           |    CAST(pos % 8 AS INT) AS off FROM x),
           |sdt AS (SELECT q.vec_id AS qid, c.vec_id AS nid, q.sub AS qsub,
           |    c.sub AS dsub, CAST(sum(q.xv * c.xv) AS BIGINT) AS sdot
           |  FROM xs q JOIN xs c ON q.off = c.off AND c.vec_id <> q.vec_id
           |  WHERE q.vec_id < 5 GROUP BY 1, 2, 3, 4),
           |ms AS (SELECT qid, nid, qsub, max(sdot) AS msim
           |  FROM sdt GROUP BY 1, 2, 3),
           |sc AS (SELECT qid, nid, CAST(sum(msim) AS BIGINT) AS score
           |  FROM ms GROUP BY 1, 2)
           |SELECT qid, rnk, nid, score FROM (
           |  SELECT qid, nid, score, CAST(row_number() OVER (
           |    PARTITION BY qid ORDER BY score DESC, nid) AS INT) AS rnk
           |  FROM sc) r
           |WHERE rnk <= 3 ORDER BY qid NULLS FIRST, rnk NULLS FIRST""".stripMargin)
    ),

    // B3'': reciprocal-rank fusion — the standard hybrid-retrieval
    // combiner (Cormack et al. 2009): two rankers' top-10 lists (exact
    // cosine + MaxSim late interaction) fuse by Σ 1e6 DIV (60 + rank).
    // Contributions are integer micro-units, so the fused ranking is
    // total and engine-exact; a candidate missing from one list simply
    // contributes 0 (the full-outer join IS the fusion semantics).
    Entry(
      "b3_rrf_fusion",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cos = Similarity.cosineTopK(e, col("vec_id") < 5, k = 10)
          .select(col("qid"), col("nid"), col("rnk").as("rc"))
        val ms = Similarity.maxSimTopK(e, col("vec_id") < 5, topK = 10)
          .select(col("qid"), col("nid"), col("rnk").as("rm"))
        val w = Window.partitionBy("qid").orderBy(col("rrf_micro").desc, col("nid").asc)
        cos.join(ms, Seq("qid", "nid"), "full_outer")
          .withColumn("rrf_micro",
            coalesce(expr("CAST(1000000 DIV (60 + rc) AS BIGINT)"), lit(0L)) +
              coalesce(expr("CAST(1000000 DIV (60 + rm) AS BIGINT)"), lit(0L)))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select(col("qid"), col("rnk"), col("nid"), col("rrf_micro"))
          .orderBy("qid", "rnk")
      },
      Some(
        s"""$kmBaseSql
           |, xs AS (SELECT vec_id, pos, xv, CAST(pos // 8 AS INT) AS sub,
           |    CAST(pos % 8 AS INT) AS off FROM x),
           |sdt AS (SELECT q.vec_id AS qid, c.vec_id AS nid, q.sub AS qsub,
           |    c.sub AS dsub, CAST(sum(q.xv * c.xv) AS BIGINT) AS sdot
           |  FROM xs q JOIN xs c ON q.off = c.off AND c.vec_id <> q.vec_id
           |  WHERE q.vec_id < 5 GROUP BY 1, 2, 3, 4),
           |msc AS (SELECT qid, nid, CAST(sum(msim) AS BIGINT) AS score FROM (
           |    SELECT qid, nid, qsub, max(sdot) AS msim FROM sdt GROUP BY 1, 2, 3) m
           |  GROUP BY 1, 2),
           |mr AS (SELECT qid, nid, rm FROM (
           |    SELECT qid, nid, CAST(row_number() OVER (
           |      PARTITION BY qid ORDER BY score DESC, nid) AS INT) AS rm
           |    FROM msc) r WHERE rm <= 10),
           |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
           |sims AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
           |    list_inner_product(q.v, c.v) / (q.nrm * c.nrm) AS sim
           |  FROM n q CROSS JOIN n c WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
           |cr AS (SELECT qid, nid, rc FROM (
           |    SELECT qid, nid, CAST(row_number() OVER (
           |      PARTITION BY qid ORDER BY round(sim, 6) DESC, nid) AS INT) AS rc
           |    FROM sims) r WHERE rc <= 10),
           |f AS (SELECT qid, nid,
           |    CAST(coalesce(1000000 // (60 + rc), 0) +
           |         coalesce(1000000 // (60 + rm), 0) AS BIGINT) AS rrf_micro
           |  FROM cr FULL OUTER JOIN mr USING (qid, nid))
           |SELECT qid, rnk, nid, rrf_micro FROM (
           |  SELECT qid, nid, rrf_micro, CAST(row_number() OVER (
           |    PARTITION BY qid ORDER BY rrf_micro DESC, nid) AS INT) AS rnk
           |  FROM f) r
           |WHERE rnk <= 5 ORDER BY qid NULLS FIRST, rnk NULLS FIRST""".stripMargin)
    )
  )
}
