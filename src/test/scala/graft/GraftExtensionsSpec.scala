package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: dot_product registered via SparkSessionExtensions. */
class GraftExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("dot_product is callable from SQL in an extensions-built session") {
    spark.range(1).count() // ensure the shared fixture context exists first
    // getOrCreate returns the default session (no extensions) if one is
    // set — clear it so a NEW session is built (reusing the JVM's
    // SparkContext) with GraftExtensions applied, then restore.
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val ext = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = ext.sql(
        "SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .collect().head.getDouble(0)
      assert(r === 32.0)
      val farr = ext.sql(
        "SELECT dot_product(CAST(array(1.0, 0.5) AS ARRAY<FLOAT>), CAST(array(2.0, 4.0) AS ARRAY<FLOAT>)) AS d")
        .collect().head.getDouble(0)
      assert(farr === 4.0)
      // do NOT stop ext — it shares the fixture's SparkContext.
    } finally {
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }
}
