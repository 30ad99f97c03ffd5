package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable corpus-curation transforms — the implementations behind
  * the judged b9 queries (CurationQueries) and the Graft facade.
  * Scale notes per operator in SCALE.md §Corpus curation.
  */
object Curation {

  /** Email-ish and planted-phone patterns, portable across Java regex
    * (Spark) and RE2 (DuckDB): no lookaround, no backrefs. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
  val PhoneRe = "\\+1-555-[0-9]{4}"

  /** (id, n-word gram) rows for every document with >= n words —
    * generator-only, no shuffle. `extra` columns are carried through. */
  def wordGrams(docs: DataFrame, n: Int, idCol: String, textCol: String,
                extra: Seq[String] = Nil): DataFrame = {
    val keep = (idCol +: extra).map(col)
    docs.select(keep :+ split(col(textCol), " ").as("ws"): _*)
      .filter(size(col("ws")) >= n)
      .select(keep ++ Seq(
        explode(sequence(lit(1), size(col("ws")) - (n - 1))).as("i"), col("ws")): _*)
      .select(keep :+ array_join(slice(col("ws"), col("i"), lit(n)), " ").as("ng"): _*)
  }

  /** Benchmark decontamination: for each training doc (isEval = false)
    * the number of distinct n-grams it shares with the eval set.
    * The eval side is benchmark-sized, so it broadcasts. */
  def contamination(docs: DataFrame, isEval: Column, n: Int = 4,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = wordGrams(docs.withColumn("__eval", isEval), n, idCol, textCol,
      extra = Seq("__eval"))
    val evalGrams = grams.filter(col("__eval")).select("ng").distinct()
    grams.filter(!col("__eval"))
      .select(col(idCol), col("ng")).distinct()
      .join(broadcast(evalGrams), "ng")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Redact emails and planted phone numbers. */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** Count of PII hits (emails + phones) in the raw text. */
  def piiCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0))) +
      size(regexp_extract_all(text, lit(PhoneRe), lit(0)))

  /** Per-doc Gopher-style repetition score: share of all bigrams taken
    * by the most repeated bigram (docs with >= 2 words). */
  def repetitionScores(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    docs.select(col(idCol), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(2), size(col("ws"))),
          i => concat(element_at(col("ws"), i - 1), lit(" "),
            element_at(col("ws"), i)))).as("bg"))
      .groupBy(idCol, "bg").agg(count(lit(1)).as("cnt"))
      .groupBy(idCol)
      .agg(max(col("cnt")).as("top_cnt"), sum(col("cnt")).as("n_bigrams"))
      .select(col(idCol), col("top_cnt"), col("n_bigrams"),
        round(col("top_cnt") / col("n_bigrams"), 6).as("rep_ratio"))

  /** Deterministic train/val/test assignment from the first hex char
    * of md5(key || salt): 12/16 train, 2/16 val, 2/16 test. Stateless
    * per-row hash — stable under re-runs and incremental rebuilds. */
  def splitAssign(key: Column, salt: String = ":graft"): Column = {
    val h = substring(md5(concat(key.cast("string"), lit(salt))), 1, 1)
    when(h < "c", "train").when(h < "e", "val").otherwise("test")
  }

  /** Symmetric int8 quantization codes for a float-array embedding:
    * floor(x * 127 / ||v|| + 0.5) per element (null-safe on zero
    * vectors). */
  def quantize(vec: Column): Column = {
    val l2 = sqrt(aggregate(
      transform(vec, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    transform(vec,
      x => floor(x.cast("double") * 127 / nullif(l2, lit(0.0)) + 0.5).cast("long"))
  }

  /** md5-derived uniform in [0, 1) from a row key — the stateless
    * "random" behind every sampling/mixing decision here: any executor
    * routes any row with no RNG state, and decisions survive re-runs
    * and late-arriving shards unchanged. */
  def hashUniform(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /** Per-stratum keep-rates toward a target mixture (DoReMi/Pile-style
    * reweighting): rate = min(1, (w/Σw) · N / n_stratum). Output is
    * stratum-cardinality — broadcast it. */
  def mixRates(docs: DataFrame, weight: Column, stratumCol: String): DataFrame = {
    val counts = docs.groupBy(stratumCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("w", weight)
    val tots = counts.agg(sum("n_docs").as("total"), sum("w").as("sum_w"))
    counts.crossJoin(broadcast(tots))
      .select(col(stratumCol), col("n_docs"), col("w"),
        least(lit(1.0),
          col("w").cast("double") / col("sum_w") * col("total") / col("n_docs"))
          .as("rate"))
  }

  /** Resample a corpus toward the target mixture: one scan, one small
    * broadcast, a stateless per-row keep decision. */
  def domainMix(docs: DataFrame, weight: Column, stratumCol: String,
                keyCol: String, salt: String = ":mix"): DataFrame =
    docs.join(broadcast(mixRates(docs, weight, stratumCol)
        .select(stratumCol, "rate")), Seq(stratumCol))
      .filter(hashUniform(col(keyCol), salt) < col("rate"))

  /** Stopword list shared by the quality features and text cleaning. */
  val QualityStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Per-document linear-classifier features — every op IEEE-exact
    * (division/sqrt only), so scores are bit-identical across engines. */
  def qualityFeatures(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val toks = split(col(textCol), " ")
    docs.select(col(idCol), col(textCol),
        size(toks).as("n_tok"),
        size(array_distinct(toks)).as("n_distinct"),
        size(filter(toks, w => w.isin(QualityStopwords: _*))).as("n_stop"))
      .select(col(idCol), col("n_tok"),
        (col("n_distinct").cast("double") / col("n_tok")).as("ttr"),
        (col("n_stop").cast("double") / col("n_tok")).as("stop_ratio"),
        (length(translate(col(textCol), " ", "")).cast("double") / col("n_tok"))
          .as("mean_wlen"))
  }

  /** fastText/CCNet-style linear quality logit over the features of
    * [[qualityFeatures]]; keep = logit > 0. Swap the literal weights
    * for a broadcast trained vector without changing the plan shape. */
  def qualityLogit(nTok: Column, ttr: Column, stopRatio: Column,
                   meanWlen: Column): Column =
    lit(-2.0) + lit(0.35) * sqrt(nTok.cast("double")) +
      lit(2.0) * ttr - lit(1.2) * stopRatio + lit(0.15) * meanWlen

  /** Corpus-trained bigram-LM scoring: per-doc average log-prob and
    * perplexity under the corpus's own bigram model (two hash aggs +
    * one broadcast join; log-probs summed through the exact DECIMAL
    * accumulator so partial-agg order cannot drift). */
  def lmPerplexity(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val inst = docs
      .select(col(idCol), split(col(textCol), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(2), size(col("ws"))),
          i => concat(element_at(col("ws"), i - 1), lit(" "),
            element_at(col("ws"), i)))).as("bg"))
    val probs = inst.groupBy("bg").agg(count(lit(1)).as("cnt"))
      .withColumn("prob", col("cnt").cast("double") /
        sum("cnt").over(Window.partitionBy(substring_index(col("bg"), " ", 1))))
      .select(col("bg"), col("prob"))
    inst.join(broadcast(probs), Seq("bg"))
      .groupBy(idCol)
      .agg(graft.QueryRegistry.dsum(log(col("prob"))).as("slp"),
        count(lit(1)).as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"),
        round(col("slp") / col("n_bigrams"), 6).as("avg_lp"),
        round(exp(-(col("slp") / col("n_bigrams"))), 4).as("ppl"))
  }

  /** Within-corpus novelty: share of a doc's distinct n-grams whose
    * first occurrence (min id) is the doc itself. first_doc is a min
    * window over the gram partition — the distinct gram table shuffles
    * by ng ONCE, where a groupBy+join would shuffle it twice AND
    * recompute the explode+distinct for both sides. At 100 TB hash the
    * gram strings to xxhash64 longs first (~10× narrower shuffle). */
  def noveltyScores(docs: DataFrame, n: Int = 4, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val grams = wordGrams(docs, n, idCol, textCol)
      .select(col(idCol), col("ng")).distinct()
    grams.withColumn("first_doc",
        min(col(idCol)).over(Window.partitionBy("ng")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("first_doc") === col(idCol), lit(1))).as("n_novel"))
      .select(col(idCol), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams"), 6).as("novelty"))
  }

  /** Deduplicate a new batch AGAINST an existing corpus (daily-ingest
    * shape): left-anti join on the normalized-text digest — only
    * 16-byte digests shuffle, the corpus is never broadcast, and
    * re-running an ingest cannot double-admit. */
  def dedupAgainst(newBatch: DataFrame, corpus: DataFrame,
                   textCol: String = "text"): DataFrame = {
    val oldHashes = corpus
      .select(md5(lower(trim(col(textCol)))).as("__dh")).distinct()
    newBatch.withColumn("__dh", md5(lower(trim(col(textCol)))))
      .join(oldHashes, Seq("__dh"), "left_anti").drop("__dh")
  }

  /** Exactly k rows per stratum, chosen by md5 order — deterministic
    * stratified sampling with O(strata × k) rank state. */
  def stratifiedSample(df: DataFrame, strata: Seq[String], k: Int,
                       keyCol: String, salt: String = ":strat"): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(md5(concat(col(keyCol).cast("string"), lit(salt))), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** One canonical survivor per cluster: the member with the highest
    * quality value (ties by id). Input: (idCol, groupCol, qualityCol).
    * Output: (groupCol, n_members, canonical id, quality) for
    * clusters with >= minMembers members. */
  def canonicalPerCluster(members: DataFrame, groupCol: String, idCol: String,
                          qualityCol: String, minMembers: Int = 2): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    members
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(groupCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("n_members") >= minMembers)
      .select(col(groupCol), col("n_members"), col(idCol), col(qualityCol))
  }

  /** End-to-end curation pipeline — the composition a pretraining run
    * actually executes, chained as ONE lazy plan: language gate →
    * text normalization → repetition + length quality gate → exact
    * dedup (min doc_id per cleaned-text md5) → deterministic split →
    * per-(split, source) doc/token accounting.
    *
    * Scale: the lang filter is pushed to the scan; normalization is a
    * codegen'd row pipeline; the repetition join is doc_id-keyed (its
    * (doc, bigram) agg map-side combines); the dedup window shuffles
    * once on the text hash; the final agg is split×source-sized. No
    * stage materializes the corpus more than once.
    */
  def pipeline(docs: DataFrame, lang: String = "en", minTokens: Int = 20,
               maxRep: Double = 0.2): DataFrame = {
    val norm = regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]+", " "), " +", " ")
    val en = docs.filter(col("lang") === lang)
      .select(col("doc_id"), col("source"), trim(norm).as("t"))
    val rep = repetitionScores(en, "doc_id", "t")
      .select(col("doc_id"), col("rep_ratio"))
    val q = en.join(rep, "doc_id")
      .filter(size(split(col("t"), " ")) >= minTokens &&
        col("rep_ratio") <= maxRep)
    val w = Window.partitionBy(md5(col("t"))).orderBy("doc_id")
    q.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .withColumn("split", splitAssign(col("doc_id")))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("t"), " ")).cast("long")).as("n_tokens"))
  }
}
