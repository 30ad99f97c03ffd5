package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two embedding arrays
  * (ArrayType(FloatType) or ArrayType(DoubleType), any mix).
  *
  * Why a custom Catalyst Expression (SURVEY.md §4.2's one sanctioned
  * case): the higher-order-function formulation
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` interprets a lambda per
  * element — ~130 closure invocations and boxed doubles per row at
  * dim=64 — and showed up as the slowest, highest-variance Bench query
  * (b2_cosine_neardup). This compiles to a tight primitive loop inside
  * whole-stage codegen instead.
  *
  * Accumulation is left-to-right in double, float values widened
  * exactly — bit-identical to the previous HOF path and to DuckDB's
  * `list_inner_product(CAST(v AS DOUBLE[]), ...)` oracle. Mismatched
  * dimensions return NULL, matching `aggregate(zip_with(a,b,_*_),...)`
  * where zip_with null-pads the shorter array and the sum goes null
  * (ADVICE.md r02: a silent min-length partial sum looked like a valid
  * similarity to SQL users).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  // NULL on dimension mismatch even when both inputs are non-null.
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemType(left).contains(FloatType)
    val rf = elemType(right).contains(FloatType)
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def get(arr: String, e: Expression) =
        if (elemType(e).contains(FloatType)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${get(a, left)} * ${get(b, right)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
