package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.DotProduct

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
  }
}
