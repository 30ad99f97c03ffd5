package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over event streams — ordered funnels and
  * cohort retention. Both are single-shuffle-on-user_id shapes: the
  * funnel's dependent stage thresholds are chained window minima over
  * the SAME partition (one exchange feeds every window and the final
  * per-user collapse, pinned in PlanAuditSpec), and retention's
  * cohort join is a fact⋈per-user-aggregate on the same key.
  */
object Analytics {

  /** Per-user ordered funnel: for `stages = Seq(s1, s2, ...)`, t1 is
    * the first s1 event, t2 the first s2 event strictly after t1, and
    * so on. Output: (userCol, t1..tN timestamp columns, stage = the
    * furthest 1-based stage reached, 0 if none). */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val wu = Window.partitionBy(userCol)
    var df = events
    stages.zipWithIndex.foreach { case (st, i) =>
      val base = col(typeCol) === st
      val cond = if (i == 0) base else base && col(tsCol) > col(s"t$i")
      df = df.withColumn(s"t${i + 1}",
        min(when(cond, col(tsCol))).over(wu))
    }
    val ts = stages.indices.map(i => s"t${i + 1}")
    // fold stage-1 first so the FINAL expression tests the deepest
    // stage first: when(max(tN) nonnull, N).otherwise(... t1 ...)
    val stage = ts.zipWithIndex
      .foldLeft(lit(0)) { case (acc, (t, i)) =>
        when(max(col(t)).isNotNull, i + 1).otherwise(acc)
      }
    df.groupBy(userCol)
      .agg(stage.as("stage"), ts.map(t => max(col(t)).as(t)): _*)
  }

  /** Gap-based sessionization: split each user's event sequence into
    * sessions wherever the inter-event gap exceeds `gapUs`, then
    * collapse to one row per session (count, span, value sum,
    * converted flag). Single shuffle on userCol: the lag, the running
    * session counter, and the final collapse all reuse the same
    * hash-partitioning — HashPartitioning(user) satisfies the
    * (user, session_idx) clustered distribution, so the groupBy adds
    * no exchange. State per row is O(1); at 100 TB the cost is one
    * sort within each user partition, which AQE sizes.
    */
  def sessionize(events: DataFrame, gapUs: Long = 30L * 60 * 1000000,
                 userCol: String = "user_id", tsCol: String = "ts",
                 convertType: String = "purchase",
                 idCol: String = "event_id", valueCol: String = "value",
                 typeCol: String = "event_type"): DataFrame = {
    import graft.QueryRegistry.dsum
    // internal columns are __-prefixed so caller frames that already
    // carry us/prev_us/session_idx columns are never silently clobbered
    val wu = Window.partitionBy(userCol).orderBy(col("__us"), col(idCol))
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev_us", lag(col("__us"), 1).over(wu))
      .withColumn("__new_s",
        when(col("__prev_us").isNull || col("__us") - col("__prev_us") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("__new_s")).over(wu.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__us")).as("start_us"),
        max(col("__us")).as("end_us"),
        dsum(col(valueCol)).as("sum_value"),
        max(when(col(typeCol) === convertType, 1).otherwise(0))
          .as("converted"))
  }

  /** Last-touch attribution: each conversion credited to the user's
    * most recent strictly-preceding non-conversion event (its type is
    * the channel; no preceding touch → 'none'). Output per channel:
    * conversion count, exact-decimal revenue, exact integer-µs
    * latency total. One user_id exchange feeds the frame; the rollup
    * is channel-cardinality. */
  def attribution(events: DataFrame,
                  convertType: String = "purchase"): DataFrame = {
    import graft.QueryRegistry.dsum
    val ev = events.select(col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("us"), col("value"))
    val frame = Window.partitionBy("user_id")
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= convertType, col("event_type"))
    val touchUs = when(col("event_type") =!= convertType, col("us"))
    ev.withColumn("src_type", last(touch, ignoreNulls = true).over(frame))
      .withColumn("src_us", last(touchUs, ignoreNulls = true).over(frame))
      .filter(col("event_type") === convertType)
      .groupBy(coalesce(col("src_type"), lit("none")).as("channel"))
      .agg(
        count(lit(1)).as("n_purchases"),
        dsum(col("value")).as("revenue"),
        sum(col("us") - col("src_us")).as("latency_us_total"))
  }

  /** Cohort retention: users grouped by first-activity week; output
    * one row per (cohort week, week offset) with the distinct active
    * user count. Weeks are emitted as µs epochs (hash-compare-safe). */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val ev = events.select(col(userCol), date_trunc("week", col(tsCol)).as("wk"))
    val cohort = ev.groupBy(userCol).agg(min(col("wk")).as("cw"))
    ev.join(cohort, Seq(userCol))
      .groupBy("cw", "wk")
      .agg(countDistinct(col(userCol)).as("n_users"))
      .select(unix_micros(col("cw")).as("cohort_us"),
        ((unix_micros(col("wk")) - unix_micros(col("cw"))) /
          lit(604800000000L)).cast("int").as("week_offset"),
        col("n_users"))
  }

  /** Per-user hourly gap-fill (time-series resample): hour spine
    * between each user's first and last active hour, observed hourly
    * value sums, last observation carried forward (LOCF — exact, no
    * interpolation arithmetic to drift across engines). The spine
    * generator runs on a per-user 2-row aggregate, so generated rows
    * appear after aggregation, never at corpus scale; the fill shares
    * the user_id exchange with the join. Shared by the judged
    * w12_gapfill and the Graft facade. */
  def gapFillHourly(events: DataFrame, userPred: Column = lit(true),
                    userCol: String = "user_id", tsCol: String = "ts",
                    valueCol: String = "value"): DataFrame = {
    import graft.QueryRegistry.dsum
    val hourly = events.filter(userPred)
      .groupBy(col(userCol), date_trunc("hour", col(tsCol)).as("h"))
      .agg(dsum(col(valueCol)).as("v"))
    val spine = hourly.groupBy(userCol)
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col(userCol),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    val w = Window.partitionBy(userCol).orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq(userCol, "h"), "left")
      .withColumn("v_fill", last(col("v"), ignoreNulls = true).over(w))
      .withColumn("filled", col("v").isNull)
  }
}
