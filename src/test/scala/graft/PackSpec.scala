package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.TrainingDataQueries

/** Sequence packing (TrainingDataQueries.packAssignments): the bucket
  * width is a pure parallelism knob — the assignment the two-phase
  * prefix sum produces must be IDENTICAL to the naive global-window
  * cumulative sum at every width. This is the invariant that lets the
  * width scale with the corpus (max(64, n/4096)) while the DuckDB
  * oracle stays the plain global window. */
class PackSpec extends AnyFunSuite with SparkFixture {

  test("pack assignment is bit-identical to the global running sum at any bucket width") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    // ground truth: the partition-less window (fine on 500 test rows;
    // the production plan exists precisely to avoid this shape)
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val truth = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        expr("cum_before div 2048").as("pack_id"),
        (col("cum_before") % 2048).as("pack_offset"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // the two-phase plan at several widths, including degenerate ones
    // (width 1 = one bucket per id; width >> n = one bucket total)
    for (width <- Seq(1L, 7L, 64L, 499L, 1000000L)) {
      val t = docs
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("bucket", expr(s"doc_id div $width"))
      val subs = t.groupBy("bucket").agg(sum(col("n_tokens")).as("bsum"))
        .orderBy("bucket").collect()
      var acc = 0L
      val offs = subs.toSeq.map { r => val o = (r.getLong(0), acc); acc += r.getLong(1); o }
      import spark.implicits._
      val wLocal = Window.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = t.join(broadcast(offs.toDF("bucket", "boff")), Seq("bucket"))
        .withColumn("cum_before",
          col("boff") + sum(col("n_tokens")).over(wLocal) - col("n_tokens"))
        .select(col("doc_id"), col("n_tokens"),
          expr("cum_before div 2048").as("pack_id"),
          (col("cum_before") % 2048).as("pack_offset"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got === truth, s"width $width diverged from the global window")
    }
    // and the production entry (corpus-derived width) matches too
    val (plan, _) = TrainingDataQueries.packAssignments(docs)
    val prod = plan.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(prod === truth)
  }
}
