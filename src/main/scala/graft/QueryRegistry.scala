package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared conventions for every judged query (SURVEY.md §2, §5.3, §7.4).
  *
  * Determinism discipline for the driver's hash-compare:
  *  - every query ends in a total order (all ties broken);
  *  - double SUMs go through an exact DECIMAL(28,6) accumulator so Spark's
  *    partial-aggregation order and DuckDB's sequential order cannot drift;
  *  - AVGs and float-valued scalars are rounded (error << rounding step);
  *  - ASC sorts spell NULLS FIRST on the DuckDB side (Spark's default).
  */
object QueryRegistry {
  /** Driver contract: (SparkSession, sfDir) => DataFrame. */
  type Q = (SparkSession, String) => DataFrame

  /** One judged operator: name, Spark impl, optional DuckDB oracle SQL. */
  final case class Entry(name: String, q: Q, oracle: Option[String])

  /** Exact sum of a double column: cast each value to DECIMAL(28,6)
    * (identical round-to-nearest on both engines), sum exactly, emit
    * double. SQL twin: CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast("double")

  /** SQL twin of [[dsum]]. */
  def dsumSql(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(28,6))) AS DOUBLE)"
}
