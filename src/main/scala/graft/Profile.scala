package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.ConcurrentLinkedQueue

/** Measurement harness (optimization guide §1): runs the named queries
  * once each under a SparkListener and prints, per query, the number of
  * Spark jobs it launched, each job's wall time and task count, and the
  * query's total wall time. Built to attribute the fixed per-query cost
  * of the lakehouse/SQL families (many tiny actions) before optimizing.
  * Usage: SPARK_GRAFT_KEYS=k1,k2 runMain graft.Profile
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    final case class JobRec(id: Int, desc: String, start: Long,
                            var end: Long = 0L, var stages: Int = 0,
                            var tasks: Int = 0)
    val jobs = new ConcurrentLinkedQueue[JobRec]()
    val byId = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val r = JobRec(e.jobId,
          Option(e.properties.getProperty("spark.job.description")).getOrElse(""),
          System.nanoTime())
        jobs.add(r); byId.put(e.jobId, r); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(byId.get(e.jobId)).foreach(_.end = System.nanoTime()); ()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val sid = e.stageInfo.stageId
        jobs.forEach { r =>
          if (byId.containsKey(r.id)) ()
        }
        // attach by most recent running job (approximation: local mode,
        // queries run sequentially, one job at a time)
        val it = jobs.iterator()
        var last: JobRec = null
        while (it.hasNext) { val r = it.next(); if (r.end == 0L || last == null) last = r }
        if (last != null) { last.stages += 1; last.tasks += e.stageInfo.numTasks }
        val _ = sid
      }
    })
    // per-action planning-phase attribution: where the driver time
    // between jobs goes (parse/analyse/optimize/plan vs execute)
    val phaseTotals = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val actionCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val execTotal = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        actionCount.incrementAndGet()
        execTotal.addAndGet(durationNs)
        qe.tracker.phases.foreach { case (ph, summary) =>
          phaseTotals.merge(ph, summary.durationMs, (a, b) => a + b); ()
        }
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })
    val byName = SparkEntry.queries
    keys.foreach(k => require(byName.contains(k), s"unknown query key $k"))
    // one warm pass (JIT) then the measured pass, like Bench's min-of-2
    keys.foreach { k =>
      (1 to 2).foreach { pass =>
        jobs.clear(); byId.clear()
        phaseTotals.clear(); actionCount.set(0); execTotal.set(0L)
        val t0 = System.nanoTime()
        try byName(k)(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => println(s"$k FAILED: ${e.getMessage}") }
        val wall = (System.nanoTime() - t0) / 1e9
        if (pass == 2) {
          println(f"\n===== $k%s wall=$wall%.3f s jobs=${jobs.size}%d =====")
          val it = jobs.iterator()
          var i = 0
          var jobSum = 0.0
          while (it.hasNext) {
            val r = it.next()
            val dur = if (r.end > 0) (r.end - r.start) / 1e9 else -1.0
            if (dur > 0) jobSum += dur
            println(f"  job#$i%-3d ${dur}%8.3f s stages=${r.stages}%-3d tasks=${r.tasks}%-5d ${r.desc.take(100)}%s")
            i += 1
          }
          import scala.jdk.CollectionConverters._
          val phases = phaseTotals.asScala.toSeq.sortBy(-_._2)
            .map { case (p, ms) => f"$p=${ms / 1e3}%.2f" }.mkString(" ")
          println(f"  actions=${actionCount.get}%d execSum=${execTotal.get / 1e9}%.3f jobSum=$jobSum%.3f gap=${wall - jobSum}%.3f phases: $phases")
        }
      }
    }
    spark.stop()
  }
}
