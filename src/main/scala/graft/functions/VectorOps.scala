package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, Encoders}

/** Vector primitives over ArrayType(FloatType) embedding columns
  * (SURVEY.md §2.B B3/B4/B6, §2.C F8). Scalar math is built from
  * higher-order functions (`zip_with`/`aggregate`) so it stays inside
  * Catalyst — no UDF round-trip in the hot path. All arithmetic is
  * widened to double before accumulation (oracle-drift rule §7.4).
  */
object VectorOps {

  /** dot(a, b) accumulated left-to-right in double — native codegen'd
    * [[DotProduct]] expression (accepts float or double arrays; float
    * values widen exactly, so results match the former
    * `aggregate(zip_with(...))` formulation bit-for-bit). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Euclidean norm in double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** ColBERT MaxSim score over two array<bigint> code columns —
    * native codegen'd [[MaxSimScore]] (three primitive loops in
    * whole-stage codegen; the HOF formulation interpreted ~1,500
    * lambdas per pair). Exact long arithmetic. */
  def maxSim(q: Column, c: Column, subDim: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(MaxSimScore(
      ColumnBridge.expression(q), ColumnBridge.expression(c), subDim))
  }

  /** cosine(a, b) in double; null-safe only in that 0-norm yields null. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Mutable centroid buffer — sums per dimension plus a row count. */
  final case class VecBuf(sums: Array[Double], n: Long)

  /** F8: typed UDAF — per-group mean vector (centroid) over an
    * ArrayType(FloatType) column. Partial-aggregates per partition and
    * merges buffers, so it scales like any other Spark agg. */
  object CentroidAgg extends Aggregator[Seq[Float], VecBuf, Seq[Double]] {
    def zero: VecBuf = VecBuf(Array.emptyDoubleArray, 0L)

    def reduce(b: VecBuf, v: Seq[Float]): VecBuf = {
      if (v == null) return b
      val sums = if (b.sums.isEmpty) new Array[Double](v.length) else b.sums
      var i = 0
      while (i < v.length) { sums(i) += v(i); i += 1 }
      VecBuf(sums, b.n + 1)
    }

    def merge(x: VecBuf, y: VecBuf): VecBuf = {
      if (x.n == 0) return y
      if (y.n == 0) return x
      val sums = x.sums.clone()
      var i = 0
      while (i < sums.length) { sums(i) += y.sums(i); i += 1 }
      VecBuf(sums, x.n + y.n)
    }

    def finish(b: VecBuf): Seq[Double] =
      if (b.n == 0) Seq.empty else b.sums.map(_ / b.n).toSeq

    def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** Column-level centroid aggregate usable in `df.groupBy(...).agg(...)`. */
  def centroid(c: Column): Column = udaf(CentroidAgg).apply(c)
}
