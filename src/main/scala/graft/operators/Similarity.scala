package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Exact cosine top-k over an embedding column (SURVEY.md §2.B B3).
  * The bounded query set broadcasts against the full corpus; norms are
  * computed once per side; the per-pair dot product is the codegen'd
  * DotProduct expression. The approximate scale paths live in
  * b4_lsh_ann (multi-table LSH) and IvfAnn.
  */
object Similarity {

  /** Top-k nearest neighbors by cosine for every row matching
    * `queryPred` (must select a BOUNDED set — it is broadcast).
    * Output: (qid, rnk, nid, sim) with a total order. */
  def cosineTopK(
      embeddings: DataFrame,
      queryPred: Column,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val e = embeddings
      .select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
    val q = e.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid").asc)
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("sim"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("cid").as("nid"), round(col("sim"), 4).as("sim"))
      .orderBy("qid", "rnk")
  }
}
