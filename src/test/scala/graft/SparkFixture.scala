package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites — mirrors the harness
  * config (UTC, small shuffle partitions, nanos-as-long for the events
  * table) per SURVEY.md §5.3.
  */
object SparkFixture {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_warehouse_test")
      .config("spark.ui.enabled", "false")
      // fork-free chmod for file: (GraftLocalFileSystem docs)
      .config("spark.hadoop.fs.file.impl",
        "graft.sources.GraftLocalFileSystem")
      // the harness sessions (Verify/Bench) run with GraftExtensions;
      // the fixture matches so every judged query — including the
      // SQL-surface ones — smoke-runs under the same analyzer
      .withExtensions(new GraftExtensions)
      .appName("graft-tests")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkFixture {
  lazy val spark: SparkSession = SparkFixture.session
}
