package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.{DotProduct, MaxSimScore, MinHashSignature, ShingleMinHash}

/** SparkSessionExtensions entry point: exposes graft's custom Catalyst
  * expressions to SQL users, so a session built with
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * can run `SELECT dot_product(embedding, embedding) FROM ...` — the
  * same codegen'd expression the DataFrame API gets via
  * `VectorOps.dot`. This is the sanctioned extension mechanism (no
  * internal registry poking); injectFunction handles resolution,
  * Scaladoc-style help, and session isolation.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, null, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_product takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, null, "minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "minhash_signature(tokens_array, k)")
        MinHashSignature(children.head, intArg(children(1), "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("max_sim"),
      new ExpressionInfo(classOf[MaxSimScore].getName, null, "max_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "max_sim(q_codes, c_codes, sub_dim)")
        MaxSimScore(children.head, children(1), intArg(children(2), "sub_dim"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_minhash"),
      new ExpressionInfo(classOf[ShingleMinHash].getName, null, "shingle_minhash"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "shingle_minhash(tokens_array, n, k)")
        ShingleMinHash(children.head, intArg(children(1), "n"), intArg(children(2), "k"))
      }))
  }

  /** The n/k parameters shape the output schema, so SQL callers must
    * pass integer literals (mirrors how Spark's own `approx_count_distinct`
    * treats its precision argument). */
  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $e")
  }
}
