package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** Iterative BPE merge training (operators/Bpe.scala): hand-computed
  * merge sequences, deterministic tie-breaks, early stop, and the
  * train→tokenize round trip. */
class BpeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def merges(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("hand-computed merge sequence on a planted corpus, with early stop") {
    // vocab: abab ×3, ab ×1. Round 1 pairs: (a,b) = 2·3+1 = 7,
    // (b,a) = 1·3 = 3 → merge (a,b). Round 2: abab = [ab,ab] ×3 →
    // (ab,ab) = 3 → merge. Round 3: no adjacent pairs anywhere →
    // early stop despite nMerges = 5.
    val docs = Seq((1L, "abab ab abab"), (2L, "abab")).toDF("doc_id", "text")
    assert(merges(Bpe.trainMerges(docs, 5)) ===
      Seq((1, "a", "b", 7L), (2, "ab", "ab", 3L)))
  }

  test("frequency ties break lexicographically — deterministic across runs") {
    // ab ×2, ba ×2 → (a,b) = 2 and (b,a) = 2: the tie must go to
    // (a,b) — lexicographically first — every run; (b,a) then merges
    // in round 2 ("ba" is untouched by round 1).
    val docs = Seq((1L, "ab ab ba ba")).toDF("doc_id", "text")
    val first = merges(Bpe.trainMerges(docs, 3))
    assert(first === Seq((1, "a", "b", 2L), (2, "b", "a", 2L)))
    assert(merges(Bpe.trainMerges(docs, 3)) === first)
  }

  test("driver-side and distributed training are BIT-identical (r13 parity)") {
    // the same corpora through both paths: the default (driver-side,
    // exact incremental counts) and localVocabLimit = 0 (forces the
    // distributed per-round loop) — every merge, rank, and frequency
    // must match, or the bounded fast path is a different tokenizer
    val corpora = Seq(
      Seq((1L, "abab ab abab"), (2L, "abab")),
      Seq((1L, "ab ab ba ba")),
      Seq((1L, "the cat sat on the mat"), (2L, "the bat and the rat sat"),
        (3L, "matter scatter batter the that")),
      Seq((1L, "aaaa aaa aa"))) // overlapping repeats: aaa → (a,a) ×2
    corpora.foreach { rows =>
      val docs = rows.toDF("doc_id", "text")
      val local = merges(Bpe.trainMerges(docs, 12))
      val dist = merges(Bpe.trainMerges(docs, 12, localVocabLimit = 0))
      assert(local === dist, s"paths diverged on $rows")
    }
  }

  test("no repeating pair means zero merges, not a crash") {
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    assert(Bpe.trainMerges(docs, 4).count() === 0)
  }

  test("merge application is left-to-right non-overlapping") {
    // aaa with merge (a,a): [aa, a], never [a, aa] or [aa, aa]
    assert(Bpe.applyMerge(IndexedSeq("a", "a", "a"), "a", "a") ===
      IndexedSeq("aa", "a"))
    assert(Bpe.applyMerge(IndexedSeq("a", "a", "a", "a"), "a", "a") ===
      IndexedSeq("aa", "aa"))
  }

  test("train then tokenize: learned merges compress the training words") {
    val docs = Seq((1L, "abab ab abab"), (2L, "abab")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(docs, 5).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val toks = Bpe.tokenize(docs, m).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(toks(1L) === Seq("abab", "ab", "abab"))
    assert(toks(2L) === Seq("abab"))
  }

  test("tokenize round trip: concatenated tokens reconstruct every word; encode is parallelism-invariant") {
    val docs = Seq(
      (1L, "the quick brown fox the the quick"),
      (2L, "brown brown fox the quick"),
      (3L, "unseensymbols zz")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(docs, 6).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    def encode(parts: Int) =
      Bpe.tokenize(docs.repartition(parts), m).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val one = encode(1)
    // losslessness: merges only ever CONCATENATE adjacent symbols, so
    // joining a word's tokens must give back the word, char for char
    for ((id, text) <- Seq(1L -> "the quick brown fox the the quick",
                           2L -> "brown brown fox the quick",
                           3L -> "unseensymbols zz")) {
      val words = text.split(" ").toSeq
      val rebuilt = {
        // token stream has no word boundaries; re-split greedily by
        // consuming each word's length from the stream
        var rest = one(id)
        words.map { w =>
          var acc = ""
          while (acc.length < w.length) { acc += rest.head; rest = rest.tail }
          acc
        }
      }
      assert(rebuilt === words, s"doc $id round trip")
    }
    // determinism: the encode pass is a pure per-row map — 1, 3, and 8
    // partitions must produce bit-identical token streams
    assert(encode(3) === one && encode(8) === one)
  }
}
