package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryRegistry._
import graft.sources.Tables

/** Scale-pattern operators (SURVEY.md §7.5, BASELINE.md design rules):
  * the three shuffle-control techniques a 100 TB deployment leans on —
  * bucketed co-located joins, salted skew joins, and IVF-cell ANN —
  * each demonstrated as a judged query with identical-result oracles
  * where SQL-expressible.
  */
object ScaleQueries {

  /** Drop a managed table AND its warehouse directory — the in-memory
    * catalog forgets tables between sessions while their location
    * survives, and saveAsTable refuses an orphaned location. */
  private def resetTable(s: org.apache.spark.sql.SparkSession, name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(s"$wh/$name"))
  }

  val entries: Seq[Entry] = Seq(
    // C6: bucketed tables → shuffle-free sort-merge join. Both sides are
    // written bucketed+sorted on the join key; the join then reads
    // co-located buckets with NO Exchange (asserted in ScaleQueriesSpec).
    // At 100 TB this converts the nightly fact⋈fact join from a full
    // shuffle of both tables into a per-bucket streaming merge.
    Entry(
      "c6_bucketed_join",
      (s, d) => {
        resetTable(s, "graft_li_bucketed")
        resetTable(s, "graft_orders_bucketed")
        Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable("graft_li_bucketed")
        Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable("graft_orders_bucketed")
        s.table("graft_li_bucketed")
          .join(s.table("graft_orders_bucketed").hint("merge"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
          .orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, ${dsumSql("l_quantity")} AS sum_qty, count(*) AS cnt
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY 1 ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // J9: salted skew join — the hot-key mitigation for when one join
    // key holds a disproportionate share of rows. The big side gets a
    // deterministic salt (l_linenumber mod S); the small side is
    // replicated S ways; the join key becomes (key, salt), spreading a
    // hot key over S reducers. Result set is provably identical to the
    // unsalted join (each left row matches exactly one replica).
    Entry(
      "j9_salted_skew_join",
      (s, d) => {
        val S = 8
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_quantity"),
            pmod(col("l_linenumber"), lit(S)).as("l_salt"))
        val ord = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"),
            explode(sequence(lit(0), lit(S - 1))).as("o_salt"))
        li.join(ord,
            col("l_orderkey") === col("o_orderkey") && col("l_salt") === col("o_salt"))
          .groupBy("o_orderpriority")
          .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
          .orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, ${dsumSql("l_quantity")} AS sum_qty, count(*) AS cnt
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY 1 ORDER BY o_orderpriority NULLS FIRST""".stripMargin)
    ),

    // B4b: IVF-cell approximate NN — the k-means sibling of the
    // random-hyperplane LSH path (b4_lsh_ann). Non-SQL: recall < 1 by
    // construction; quantizer and probe semantics are unit-tested.
    Entry(
      "b4_ivf_ann",
      (s, d) => IvfAnn.topK(Tables.embeddings(s, d),
        nQueries = 10, k = 3, cells = 8, iters = 2),
      None
    )
  )
}
