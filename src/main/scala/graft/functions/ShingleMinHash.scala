package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle + minhash: from a WORD array straight to the k-slot
  * signature, building each n-word shingle with UTF8String.concat
  * inside the loop — no materialized shingle array, no interpreted
  * slice/concat_ws per shingle (which was the remaining hot spot after
  * [[MinHashSignature]] removed the k-fold re-shingling).
  *
  * Semantics are EXACTLY MinHash.signature(MinHash.shingles(words)):
  * n-word windows joined by single spaces; whole text (all words
  * joined) when there are fewer than n words; per-slot value
  * xxhash64(shingle, slot) with the built-in's 42-seeded fold.
  */
case class ShingleMinHash(child: Expression, n: Int, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_minhash needs array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val space = UTF8String.fromString(" ")

  private def updateMins(sh: UTF8String, mins: Array[Long]): Unit = {
    val base = XXH64.hashUTF8String(sh, 42L)
    var i = 0
    while (i < k) {
      val h = XXH64.hashInt(i, base)
      if (h < mins(i)) mins(i) = h
      i += 1
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nw = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    def word(j: Int): UTF8String =
      if (arr.isNullAt(j)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(j)
    if (nw < n) {
      val segs = new Array[UTF8String](math.max(2 * nw - 1, 0))
      var j = 0
      while (j < nw) {
        segs(2 * j) = word(j)
        if (j < nw - 1) segs(2 * j + 1) = space
        j += 1
      }
      val sh = if (nw == 0) UTF8String.EMPTY_UTF8 else UTF8String.concat(segs: _*)
      updateMins(sh, mins)
    } else {
      var j = 0
      while (j <= nw - n) {
        val segs = new Array[UTF8String](2 * n - 1)
        var t = 0
        while (t < n) {
          segs(2 * t) = word(j + t)
          if (t < n - 1) segs(2 * t + 1) = space
          t += 1
        }
        updateMins(UTF8String.concat(segs: _*), mins)
        j += 1
      }
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val nw = ctx.freshName("nw")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val segs = ctx.freshName("segs")
      val sh = ctx.freshName("sh")
      val base = ctx.freshName("base")
      val h = ctx.freshName("h")
      val spaceRef = ctx.addReferenceObj("shingleSpace", space, classOf[UTF8String].getName)
      // XXH64 statics resolve from Janino; the Scala object's MODULE$
      // does not (see MinHashSignature).
      val xxh64 = classOf[XXH64].getName
      val wordAt = (idx: String) =>
        s"($arr.isNullAt($idx) ? UTF8String.EMPTY_UTF8 : $arr.getUTF8String($idx))"
      s"""
         |int $nw = $arr.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |if ($nw < $n) {
         |  UTF8String[] $segs = new UTF8String[$nw == 0 ? 0 : 2 * $nw - 1];
         |  for (int $j = 0; $j < $nw; $j++) {
         |    $segs[2 * $j] = ${wordAt(j)};
         |    if ($j < $nw - 1) $segs[2 * $j + 1] = $spaceRef;
         |  }
         |  UTF8String $sh = $nw == 0 ? UTF8String.EMPTY_UTF8 : UTF8String.concat($segs);
         |  long $base = $xxh64.hashUTF8String($sh, 42L);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $h = $xxh64.hashInt($i, $base);
         |    if ($h < $mins[$i]) $mins[$i] = $h;
         |  }
         |} else {
         |  for (int $j = 0; $j <= $nw - $n; $j++) {
         |    UTF8String[] $segs = new UTF8String[2 * $n - 1];
         |    for (int $t = 0; $t < $n; $t++) {
         |      $segs[2 * $t] = ${wordAt(s"$j + $t")};
         |      if ($t < $n - 1) $segs[2 * $t + 1] = $spaceRef;
         |    }
         |    UTF8String $sh = UTF8String.concat($segs);
         |    long $base = $xxh64.hashUTF8String($sh, 42L);
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $h = $xxh64.hashInt($i, $base);
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}
