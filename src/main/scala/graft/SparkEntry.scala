package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.QueryRegistry.Entry

/** Driver contract — see SURVEY.md §0/§7 and the builder prompt.
  * `queries` carries one entry per implemented SURVEY.md §2 operator;
  * `oracleSql` the DuckDB twin for every SQL-expressible one.
  */
object SparkEntry {

  /** Every judged operator, one Entry each (SURVEY.md §2 inventory). */
  val all: Seq[Entry] =
    graft.operators.ScanProjectQueries.entries ++
    graft.operators.JoinQueries.entries ++
    graft.operators.AggWindowQueries.entries ++
    graft.functions.FunctionQueries.entries ++
    graft.operators.LlmQueries.entries ++
    graft.operators.MediaDedupQueries.entries ++
    graft.operators.PipelineQueries.entries ++
    graft.operators.ScaleQueries.entries ++
    graft.operators.LakehouseQueries.entries ++
    graft.operators.TrainingDataQueries.entries ++
    graft.operators.CurationQueries.entries ++
    graft.streaming.StreamingQueries.entries

  /** Flagship query on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.AggWindowQueries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(e => e.name -> e.q).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(e => e.oracle.map(sql => e.name -> sql)).toMap
}
