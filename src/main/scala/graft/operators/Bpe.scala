package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Iterative byte-pair-encoding merge training (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the full merge LOOP that b5_bpe_pairs' single pair count is the
  * first step of.
  *
  * Scale design — the classic BPE trick: train on the WORD VOCABULARY,
  * never the corpus. One corpus pass builds (word, count) —
  * vocabulary-sized after map-side combine, exactly b5_vocab's shape —
  * and every merge round then runs on that small table: count-weighted
  * adjacent symbol pairs (one hash agg over vocab rows), pick the most
  * frequent pair (a 1-row driver decision with a TOTAL tie-break —
  * freq desc, then left/right lexicographic — the same bounded
  * model-state class as the Lloyd centroids), and rewrite the vocab's
  * symbol arrays in one map pass. N merges cost N vocab passes; the
  * corpus is read ONCE regardless of N. At 100 TB the vocab table is
  * millions of rows (one executor's worth) and standard practice
  * trains on a corpus sample anyway; the resulting merge table — N
  * rows — broadcasts to tokenize the full corpus in a single pass.
  *
  * Typed Dataset ops (flatMap/map) do the vocab rewrites: vocab-sized
  * model training is the sanctioned exception to the expressions-only
  * rule (SURVEY.md §4.2), and left-to-right non-overlapping merge
  * application is inherently sequential per word. Deterministic end to
  * end: exact integer counts, total tie-break, order-defined merge
  * application — the merge table is bit-identical across runs and
  * parallelism levels (BpeSpec asserts this).
  */
object Bpe {

  /** One merge (a, b) → "ab", applied left-to-right, non-overlapping —
    * the standard BPE application rule. */
  private[graft] def applyMerge(syms: IndexedSeq[String], a: String,
                                b: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Train up to `nMerges` BPE merges over whitespace-split lowercased
    * words; stops early when the best pair occurs fewer than 2 times.
    * Output: (rank, left, right, freq), rank 1 = first merge, totally
    * ordered. */
  def trainMerges(docs: DataFrame, nMerges: Int,
                  textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: Dataset[(IndexedSeq[String], Long)] = docs
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .map { case (w, c) => (w.map(_.toString).toIndexedSeq, c) }
      .localCheckpoint(true) // vocab-sized; truncates per-round lineage
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val top = vocab.flatMap { case (syms, c) =>
        if (syms.length < 2) Iterator.empty
        else syms.sliding(2).map(p => (p(0), p(1), c))
      }.toDF("l", "r", "c")
        .groupBy("l", "r").agg(sum(col("c")).as("freq"))
        .orderBy(col("freq").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < 2L) done = true
      else {
        val (a, b, f) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((rank, a, b, f))
        vocab = vocab.map { case (syms, c) => (applyMerge(syms, a, b), c) }
          .localCheckpoint(true)
        rank += 1
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "freq").orderBy("rank")
  }

  /** Tokenize with a trained merge table: apply the merges in rank
    * order to each word — the single corpus pass that consumes the
    * model `trainMerges` produced. Output: (id, tokens). */
  def tokenize(docs: DataFrame, merges: Seq[(String, String)],
               idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("id"), lower(col(textCol)).as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        val toks = t.split(" ").filter(_.nonEmpty).flatMap { w =>
          var syms: IndexedSeq[String] = w.map(_.toString).toIndexedSeq
          merges.foreach { case (a, b) => syms = applyMerge(syms, a, b) }
          syms
        }
        (id, toks.toSeq)
      }
      .toDF("id", "tokens")
  }
}
