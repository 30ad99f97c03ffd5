package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CurationQueries

/** Invariants of the corpus-curation operators beyond the DuckDB
  * oracle: planted contamination is found, PII never survives the
  * scrub, split fractions land near 12/2/2 out of 16, quantization
  * checksum is bounded by 127*dim.
  */
class CurationSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.01"
  private def q(name: String) =
    CurationQueries.entries.find(_.name == name).get.q(spark, sf)

  test("b9_decontaminate finds overlap and never flags eval docs") {
    val rows = q("b9_decontaminate").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) % 97 != 0))
    assert(rows.forall(_.getLong(1) >= 1))
  }

  test("b9_pii_scrub removes every planted email and phone") {
    val out = q("b9_pii_scrub")
    assert(out.filter(col("clean_tail").rlike("@") ||
      col("clean_tail").rlike("\\+1-555-[0-9]{4}")).count() === 0)
    // every doc had exactly one planted email and one planted phone
    assert(out.filter(col("n_email") =!= 1 || col("n_phone") =!= 1).count() === 0)
    assert(out.filter(col("clean_tail").contains("<EMAIL>") &&
      col("clean_tail").contains("<PHONE>")).count() === out.count())
  }

  test("b9_domain_mix rates are valid and kept counts bounded by stratum size") {
    val rows = q("b9_domain_mix").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, rate, nKept) = (r.getLong(1), r.getDouble(3), r.getLong(4))
      assert(rate > 0 && rate <= 1.0)
      assert(nKept <= nDocs)
      // a capped rate keeps everything: md5-uniform < 1.0 always
      if (rate == 1.0) assert(nKept === nDocs)
    }
    // stateless hash decision: identical on re-evaluation
    assert(q("b9_domain_mix").collect().toSeq === rows.toSeq)
  }

  test("b9_quality_classifier features are in range and keep matches score sign") {
    val rows = q("b9_quality_classifier").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ttr, stopR, score, keep) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(5), r.getBoolean(6))
      assert(ttr > 0 && ttr <= 1.0)
      assert(stopR >= 0 && stopR <= 1.0)
      // keep is the sign decision on the unrounded logit; away from the
      // boundary it must agree with the rounded score
      if (math.abs(score) > 1e-5) assert(keep === (score > 0))
    }
  }

  test("b9_lm_perplexity scores are well-formed LM outputs") {
    val rows = q("b9_lm_perplexity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, avgLp, ppl) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(n >= 1)
      assert(avgLp < 0)    // every bigram prob < 1 on this corpus
      assert(ppl > 1.0)    // exp(-avg_lp) with avg_lp < 0
      // perplexity is bounded by the worst single-bigram probability
      // bound: no prob can be below 1/total_bigrams
      assert(ppl < 1e6)
    }
  }

  test("b9_repetition ratios are in (0,1] and top_cnt <= n_bigrams") {
    val bad = q("b9_repetition")
      .filter(col("rep_ratio") <= 0 || col("rep_ratio") > 1 ||
        col("top_cnt") > col("n_bigrams")).count()
    assert(bad === 0)
  }

  test("b9_train_test_split is deterministic with ~75/12.5/12.5 fractions") {
    val counts = q("b9_train_test_split").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.60 && counts("train") / n < 0.90)
    assert(counts("val") / n > 0.04 && counts("test") / n > 0.04)
    // stable across evaluations (pure hash of the key)
    val again = q("b9_train_test_split").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === counts)
  }

  test("b9_pipeline composes the gates: dedup, lang, length, repetition all bite") {
    import spark.implicits._
    val long = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, long, "en", "srcA"),            // survives
      (2L, long, "en", "srcA"),            // exact dup of 1 → dropped
      (3L, long, "fr", "srcA"),            // wrong lang → dropped
      (4L, "short text", "en", "srcA"),    // under min tokens → dropped
      (5L, Seq.fill(30)("spam").mkString(" "), "en", "srcB"), // repetitive → dropped
      (6L, long + " extra", "en", "srcB")  // survives
    ).toDF("doc_id", "text", "lang", "source")
    val out = graft.operators.Curation.pipeline(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // only docs 1 and 6 survive: one srcA row, one srcB row
    assert(out.map(_._3).sum === 2)
    assert(out.map(t => (t._2, t._3)).toSet === Set(("srcA", 1L), ("srcB", 1L)))
    assert(out.forall(t => Set("train", "val", "test")(t._1)))
    assert(out.collectFirst { case (_, "srcA", _, n) => n }.get === 30L)
  }

  test("b9_norm_quantize: unit-ish norms, |qsum| bounded by 127*dim") {
    val rows = q("b9_norm_quantize").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => math.abs(r.getLong(2)) <= 127L * 64 + 64))
    assert(rows.forall(r => r.getDouble(1) > 0))
  }
}
