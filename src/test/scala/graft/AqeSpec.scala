package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime re-planning — the levers that matter when static stats
  * lie at 100 TB. The judged queries rely on manual salting (j9) where
  * skew is KNOWN; this suite pins that AQE also rescues the case where
  * skew is discovered only at runtime.
  */
class AqeSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("AQE splits a runtime-skewed sort-merge join partition") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows, 90% on one key -> one shuffle partition dwarfs the rest
      val left = spark.range(200000)
        .select(when(col("id") % 10 =!= 0, 0L).otherwise(col("id")).as("k"),
          concat(lit("payload_payload_payload_"), col("id")).as("pad"))
      val right = (0L until 1000L).toDF("k").withColumn("v", col("k") * 2)
      val joined = left.join(right, "k").groupBy("v").count()
      joined.collect()
      val executed = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(executed.contains("skew=true"),
        s"expected AQE skew-join split in:\n$executed")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE converts a sort-merge join to broadcast when runtime size allows") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      // static estimate says big (no stats beat the threshold pre-run),
      // runtime shuffle stats say tiny -> AQE re-plans to broadcast
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "1MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val big = spark.range(100000).select(col("id").as("k"), (col("id") % 7).as("x"))
      val small = spark.range(100).select(col("id").as("k"), lit("dim").as("name"))
      val joined = big.join(small, "k").groupBy("name").count()
      joined.collect()
      val executed = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(executed.contains("BroadcastHashJoin"),
        s"expected AQE broadcast conversion in:\n$executed")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
