package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd ColBERT MaxSim score over two int-code arrays
  * (ArrayType(LongType)): treating each array as `numElements/subDim`
  * sub-vectors, score = Σ over query sub-vectors of the MAX dot
  * product against any document sub-vector. All-long arithmetic, so
  * the result is exact and engine-independent (sub-dot ≤ 8·127² at
  * the int8-code scale — far inside long).
  *
  * Why a custom Expression (SURVEY.md §4.2's sanctioned case, same
  * rationale as [[DotProduct]]): the higher-order-function
  * formulation — nested `aggregate(sequence…, transform(sequence…,
  * aggregate(…)))` — interprets a lambda per element: ~1,500 closure
  * invocations and boxed longs per PAIR at dim 64 / subDim 8. Stress
  * measured the HOF form at 130 s for a 50 k-vector corpus × 5
  * queries (rep=10) where the exploded-shuffle form it replaced was
  * itself 6.5 s at sf0.1 — interpretation overhead swamped the
  * shuffle saving. This compiles to three tight primitive loops
  * inside whole-stage codegen and keeps the in-row, zero-shuffle
  * plan shape.
  *
  * NULL when either array is empty or not a multiple of `subDim`
  * (sub-vector decomposition undefined — documented contract).
  */
case class MaxSimScore(left: Expression, right: Expression, subDim: Int)
    extends BinaryExpression {

  require(subDim > 0, "subDim must be positive")

  // NULL on empty / non-multiple inputs even when both are non-null.
  override def nullable: Boolean = true

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"max_sim needs array<bigint> inputs, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    val nq = q.numElements()
    val nc = c.numElements()
    if (nq == 0 || nc == 0 || nq % subDim != 0 || nc % subDim != 0) return null
    val mq = nq / subDim
    val mc = nc / subDim
    var score = 0L
    var qs = 0
    while (qs < mq) {
      var best = Long.MinValue
      var cs = 0
      while (cs < mc) {
        var d = 0L
        var k = 0
        while (k < subDim) {
          d += q.getLong(qs * subDim + k) * c.getLong(cs * subDim + k)
          k += 1
        }
        if (d > best) best = d
        cs += 1
      }
      score += best
      qs += 1
    }
    score
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val qs = ctx.freshName("qs"); val cs = ctx.freshName("cs")
      val k = ctx.freshName("k"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val score = ctx.freshName("score")
      val mq = ctx.freshName("mq"); val mc = ctx.freshName("mc")
      s"""
         |if ($a.numElements() == 0 || $b.numElements() == 0 ||
         |    $a.numElements() % $subDim != 0 || $b.numElements() % $subDim != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $mq = $a.numElements() / $subDim;
         |  int $mc = $b.numElements() / $subDim;
         |  long $score = 0L;
         |  for (int $qs = 0; $qs < $mq; $qs++) {
         |    long $best = Long.MIN_VALUE;
         |    for (int $cs = 0; $cs < $mc; $cs++) {
         |      long $d = 0L;
         |      for (int $k = 0; $k < $subDim; $k++) {
         |        $d += $a.getLong($qs * $subDim + $k) * $b.getLong($cs * $subDim + $k);
         |      }
         |      if ($d > $best) $best = $d;
         |    }
         |    $score += $best;
         |  }
         |  ${ev.value} = $score;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxSimScore =
    copy(left = newLeft, right = newRight)
}
