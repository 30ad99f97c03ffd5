package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact set-Jaccard of two arrays in ONE pass — bit-identical to
  * `size(array_intersect(a,b)).cast("double") / size(array_union(a,b))`
  * but without materializing either result array or building two
  * separate hash sets (r19 profile: SQLOpenHashSet.add/contains +
  * UnsafeArrayData.get from exactly this pattern were ~14 thread-s of
  * b2_prefix_join, the slowest bench query).
  *
  * Replicated built-in semantics:
  *   - `array_intersect` size = |distinct(a) ∩ distinct(b)|, counting
  *     NULL once when both sides contain it;
  *   - `array_union` size = |distinct(a) ∪ distinct(b)|, counting NULL
  *     once when either side contains it;
  *   - division is double/double, so a 0-sized union (two empty
  *     arrays) yields NULL exactly like Spark's non-ANSI Divide;
  *   - NULL when either array is NULL.
  */
case class SetJaccard(left: Expression, right: Expression) extends BinaryExpression {

  override def nullable: Boolean = true

  private def elemType: DataType = left.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  // float/double excluded: Spark's set ops normalize -0.0 to 0.0,
  // which boxed-Double HashMap keys would not replicate
  private def supported(t: DataType): Boolean = t match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
         LongType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _)) if a == b && supported(a) =>
      TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"set_jaccard needs two arrays of the same (string/integral/date) element type, got $a / $b")
  }

  override def dataType: DataType = DoubleType

  // element membership state: present in a only / b only / both
  private val FromA: java.lang.Byte = 0.toByte
  private val FromB: java.lang.Byte = 1.toByte
  private val Both: java.lang.Byte = 2.toByte

  def compute(a: ArrayData, b: ArrayData): Any = {
    val t = elemType
    val state = new java.util.HashMap[Any, java.lang.Byte](
      math.max(16, (a.numElements() + b.numElements()) * 2))
    var inter = 0
    var nullA = false
    var nullB = false
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) nullA = true
      else state.putIfAbsent(a.get(i, t), FromA)
      i += 1
    }
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (b.isNullAt(i)) nullB = true
      else {
        val e = b.get(i, t)
        val prev = state.putIfAbsent(e, FromB)
        if (prev != null && prev == FromA) {
          state.put(e, Both)
          inter += 1
        }
      }
      i += 1
    }
    var union = state.size()
    if (nullA || nullB) union += 1
    if (nullA && nullB) inter += 1
    if (union == 0) {
      // exactly Divide's 0-divisor contract: error under ANSI, NULL
      // otherwise (unreachable from the shingle pipelines — a shingle
      // array always has ≥ 1 element — but pinned by SetJaccardSpec)
      import org.apache.spark.sql.catalyst.expressions.{Divide, EvalMode, Literal}
      // delegate to a real Divide so the thrown error (ANSI) or NULL
      // (non-ANSI) is literally the built-in's
      Divide(Literal(inter.toDouble), Literal(0.0),
        EvalMode.fromSQLConf(org.apache.spark.sql.internal.SQLConf.get)).eval(null)
    }
    else inter.toDouble / union.toDouble
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("setJaccard", this, classOf[SetJaccard].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("j")
      s"""
         |Object $boxed = $ref.compute($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $boxed).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SetJaccard =
    copy(left = newLeft, right = newRight)
}
