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

  /** Fixed-iteration PageRank (damping 0.85) over a directed edge
    * list; pass both directions for an undirected graph. `nodes` must
    * carry an `id` column covering every vertex. Per-node incoming
    * contributions sum through the exact DECIMAL(28,6) accumulator,
    * making every iteration order-independent (and therefore
    * hash-verifiable against a sequential engine). O(iters) shuffles
    * of O(edges); materialize `edges` (localCheckpoint) before calling
    * when it is the product of an expensive candidate join. */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = 5): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val ids = nodes.select(col("id"))
    var pr = ids.withColumn("pr", lit(1.0))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pr, edges("src") === pr("id"))
        .join(deg, Seq("src"))
        .select(col("dst"), (col("pr") / col("deg")).as("c"))
        .groupBy("dst").agg(graft.QueryRegistry.dsum(col("c")).as("contrib"))
      pr = ids.join(contrib, ids("id") === contrib("dst"), "left")
        .select(col("id"),
          (lit(0.15) + lit(0.85) * coalesce(col("contrib"), lit(0.0))).as("pr"))
    }
    pr
  }

  /** Fixed-iteration Lloyd k-means, fully distributed AND exactly
    * reproducible across engines — the trick is arithmetic that no
    * summation order can perturb:
    *  - vectors are int8-quantized first ([[Curation.quantize]]), so
    *    centroid numerators are EXACT integer sums;
    *  - centroid elements are round(sum/count, 6) — one IEEE division
    *    of identical integers, identical everywhere;
    *  - squared-distance terms are quantized to DECIMAL(28,6) and
    *    summed exactly, so the argmin (ties → lower cid) is total.
    * Deterministic init: clusters seed from vec_id < k. Assignment is
    * a pos-equi-join against the broadcast k×dim centroid table +
    * map-side-combining (vec, cid) agg; the update is an integer agg
    * on (cid, pos). O(iters) passes, no driver-side loop over rows —
    * only the k×dim centroid table is ever checkpointed.
    * Output: one row per cluster (cid, n_members, inertia). */
  def kmeansQuantized(embeddings: DataFrame, k: Int = 4, iters: Int = 2,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val xe = embeddings
      .filter(VectorOps.norm(col(vecCol)) > 0)
      .select(col(idCol).as("vec_id"),
        posexplode(graft.operators.Curation.quantize(col(vecCol))))
      .toDF("vec_id", "pos", "xv")
      .localCheckpoint(true)
    def assign(cent: DataFrame): DataFrame =
      xe.join(broadcast(cent), Seq("pos"))
        .select(col("vec_id"), col("cid"),
          ((col("xv") - col("cv")) * (col("xv") - col("cv")))
            .cast(DecimalType(28, 6)).as("term"))
        .groupBy("vec_id", "cid")
        .agg(sum(col("term")).as("dist"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("dist").asc, col("cid").asc)))
        .filter(col("__rn") === 1)
        .select(col("vec_id"), col("cid"), col("dist"))
    var cent = xe.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"), col("pos"),
        col("xv").cast("double").as("cv"))
    for (_ <- 1 to iters)
      cent = xe.join(assign(cent).select("vec_id", "cid"), Seq("vec_id"))
        .groupBy("cid", "pos")
        .agg(round(sum(col("xv")).cast("double") / count(lit(1)), 6).as("cv"))
        .localCheckpoint(true)
    assign(cent)
      .groupBy("cid")
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("dist")).cast("double"), 4).as("inertia"))
  }
}
