package graft.functions

import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** The next batch of IDENTITY column values: `base + step * ordinal`
  * with per-row ordinals INTERLEAVED across partitions —
  * row `r` (0-based) of partition `p` takes
  * `ordinal = p + 1 + r * numPartitions`.
  *
  * Why interleave instead of `monotonically_increasing_id()`'s
  * 2^33-sized partition blocks: ordinals stay unique (distinct
  * residues mod numPartitions) while the LARGEST allocated ordinal is
  * at most `numPartitions * maxRowsPerPartition` — the batch's row
  * count rounded up to a partition multiple. A 100 TB insert over
  * 100k tasks advances the table's high-water mark by O(rows), not
  * O(tasks * 2^33), so the 64-bit id space survives arbitrarily many
  * commits (the mono-id block scheme burns 2^50 of headroom per
  * millionth-partition batch; this burns what it writes). Gaps within
  * a batch are bounded by the tail partitions' missing rows — ANSI
  * identity permits gaps, never duplicates.
  *
  * One pass, zero shuffles, zero driver coordination: each task
  * derives its values from (partitionIndex, numPartitions) alone,
  * both available at task start. Overflow past Long.MaxValue fails
  * the task loudly (Math.*Exact) rather than wrapping into
  * collisions. Codegen mirrors Spark's own
  * MonotonicallyIncreasingID's mutable-state pattern (public Spark
  * source), so the expression stays inside whole-stage codegen.
  */
case class NextIdentityValue(base: Long, step: Long)
  extends LeafExpression with Nondeterministic {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def stateful: Boolean = true
  override def prettyName: String = "next_identity_value"

  @transient private[this] var count: Long = _
  @transient private[this] var pid: Long = _
  @transient private[this] var nParts: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    count = 0L
    pid = partitionIndex.toLong
    // numPartitions is task metadata (Spark 3.4+); a driver-local
    // evaluation (no task context) is a single-partition plan
    nParts = Option(TaskContext.get()).map(_.numPartitions().toLong)
      .getOrElse(1L)
  }

  override protected def evalInternal(input: InternalRow): Any = {
    val ordinal = Math.addExact(pid + 1L, Math.multiplyExact(nParts, count))
    count += 1L
    Math.addExact(base, Math.multiplyExact(step, ordinal))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val countTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "identityCount")
    val pidTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "identityPid")
    val npTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "identityNumParts")
    ctx.addPartitionInitializationStatement(s"$countTerm = 0L;")
    ctx.addPartitionInitializationStatement(s"$pidTerm = (long) partitionIndex;")
    ctx.addPartitionInitializationStatement(
      s"$npTerm = org.apache.spark.TaskContext.get() == null ? 1L : " +
        "(long) org.apache.spark.TaskContext.get().numPartitions();")
    ev.copy(code = code"""
      final long ${ev.value} = java.lang.Math.addExact(${base}L,
        java.lang.Math.multiplyExact(${step}L,
          java.lang.Math.addExact($pidTerm + 1L,
            java.lang.Math.multiplyExact($npTerm, $countTerm))));
      $countTerm++;""", isNull = FalseLiteral)
  }
}
