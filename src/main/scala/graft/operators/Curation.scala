package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
