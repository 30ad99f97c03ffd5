package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** The Kirsch–Mitzenmacher position array `[(h1 + i·h2) mod bits | i ∈
  * 0..k-1]` as one codegen'd loop — the fused twin of
  * `transform(sequence(0, k-1), i -> pmod(h1 + i*h2, bits))`, whose
  * lambda body Catalyst evaluates INTERPRETED per element, re-running
  * the whole h1/h2 subtree (two xxhash64 calls) k times per row (r19
  * profile: Pmod.eval/BinaryArithmetic.eval/XxHash64.computeHash were
  * the write-side cost of every bloom-indexed commit).
  *
  * Both children are expected already reduced into [0, bits): the sum
  * h1 + i·h2 then stays below 2^36 for bits ≤ 2^31 and k ≤ 16, so the
  * plain `%` equals pmod exactly and no overflow is possible — the
  * same argument the built-in spelling documents. */
case class HashPositions(left: Expression, right: Expression,
                         bits: Long, k: Int) extends BinaryExpression {
  require(bits > 0 && bits <= Int.MaxValue && k > 0 && k <= 16,
    "need 0 < bits <= 2^31-1 and 1 <= k <= 16")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"hash_positions needs two longs, got $a / $b")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val h1 = a.asInstanceOf[Long]
    val h2 = b.asInstanceOf[Long]
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = (h1 + i * h2) % bits; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("pos")
      val i = ctx.freshName("i")
      s"""
         |long[] $out = new long[$k];
         |for (int $i = 0; $i < $k; $i++) {
         |  $out[$i] = ($a + $i * $b) % ${bits}L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HashPositions =
    copy(left = newLeft, right = newRight)
}
