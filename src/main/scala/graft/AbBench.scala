package graft
import org.apache.spark.sql.SparkSession

/** Focused A/B timer: times ONLY the query keys named in
  * `SPARK_GRAFT_KEYS` (comma-separated), `SPARK_GRAFT_REPS` times each
  * (default 3), interleaved round-robin so a mid-run machine-speed
  * drift hits every key equally. Prints one JSON line with all raw
  * samples plus the min per key, and the same calibration probe Bench
  * uses. Built for regression triage (VERDICT r17 item 1): run it at
  * two git revisions inside ONE bench window and compare mins —
  * cross-window comparison is what made the r16→r17 "regression
  * cluster" ambiguous in the first place.
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val keys = sys.env.getOrElse("SPARK_GRAFT_KEYS", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(keys.nonEmpty, "set SPARK_GRAFT_KEYS=k1,k2,…")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def probeOnce(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      graft.sources.Tables.lineitem(spark, sfDir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity"), sum("l_extendedprice"), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm-up: JIT + codegen + one probe outside the timed region
    try probeOnce() catch { case _: Throwable => () }
    val byName = SparkEntry.queries
    keys.foreach(k => require(byName.contains(k), s"unknown query key $k"))
    var samples = Map.empty[String, List[Double]].withDefaultValue(Nil)
    var probes = List.empty[Double]
    (1 to reps).foreach { _ =>
      probes ::= probeOnce()
      keys.foreach { k =>
        val t0 = System.nanoTime()
        byName(k)(spark, sfDir).write.format("noop").mode("overwrite").save()
        samples += k -> (((System.nanoTime() - t0) / 1e9) :: samples(k))
      }
    }
    probes ::= probeOnce()
    val probeMed = probes.sorted.apply(probes.length / 2)
    val body = keys.map { k =>
      val s = samples(k).reverse
      f""""$k":{"min":${s.min}%.3f,"samples":[${s.map(t => f"$t%.3f").mkString(",")}]}"""
    }.mkString(",")
    println(f"""{"probe_median":$probeMed%.3f,"probes":[${probes.sorted
      .map(p => f"$p%.3f").mkString(",")}],"reps":$reps,"queries":{$body}}""")
    spark.stop()
  }
}
