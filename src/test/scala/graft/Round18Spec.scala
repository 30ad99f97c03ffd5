package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import graft.sources.{GraftCatalog => G, ManifestTable, MviewIncremental}

/** r18 self-review: hostile drills against this round's new paths —
  * telescoping multi-table MV refresh, the TTL'd durable catalog, and
  * watermarked aggregate view streaming — aimed at the seams the
  * happy-path specs don't reach. */
class Round18Spec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_r18_$tag").toString + "/t"

  private def refreshInc(mview: String): (Int, String) = {
    val r = spark.sql(s"REFRESH MATERIALIZED VIEW graft.$mview INCREMENTAL")
      .collect().head
    (r.getInt(0), r.getString(1))
  }

  private def assertExact(mview: String, definingSql: String): Unit = {
    val img = spark.sql(s"SELECT * FROM graft.$mview").collect().toSeq
      .map(_.toSeq).sortBy(_.mkString("|"))
    val full = spark.sql(definingSql).collect().toSeq
      .map(_.toSeq).sortBy(_.mkString("|"))
    assert(img === full, s"graft.$mview image drifted from its defining query")
  }

  test("telescoping covers THREE tables all churned in one window — exact") {
    import spark.implicits._
    val at = tmp("t3_a"); val bt = tmp("t3_b"); val ct = tmp("t3_c")
    val mt = tmp("t3_m")
    ManifestTable.commit(spark, at,
      Seq((1L, 10L, 2L), (2L, 11L, 3L), (3L, 12L, 5L), (4L, 10L, 7L))
        .toDF("id", "b_id", "v"), SaveMode.Overwrite)
    ManifestTable.commit(spark, bt,
      Seq((10L, 100L), (11L, 101L), (12L, 100L)).toDF("b_id", "c_id"),
      SaveMode.Overwrite)
    ManifestTable.commit(spark, ct,
      Seq((100L, "x"), (101L, "y")).toDF("c_id", "grp"), SaveMode.Overwrite)
    G.register("r18_a", at); G.register("r18_b", bt); G.register("r18_c", ct)
    val defSql = """SELECT c.grp AS grp, count(*) AS n, sum(a.v) AS total
                   |FROM graft.r18_a a
                   |JOIN graft.r18_b b ON a.b_id = b.b_id
                   |JOIN graft.r18_c c ON b.c_id = c.c_id
                   |GROUP BY c.grp""".stripMargin
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.r18_m3 LOCATION '$mt' AS $defSql")
      assert(refreshInc("r18_m3")._2 == "full") // prime
      // churn EVERY table in one window: fact rows, a mid-table
      // retarget, and a leaf relabel
      spark.sql("INSERT INTO graft.r18_a VALUES (5, 12, 11), (6, 11, 13)")
      spark.sql("UPDATE graft.r18_b SET c_id = 101 WHERE b_id = 10")
      spark.sql("UPDATE graft.r18_c SET grp = 'z' WHERE c_id = 100")
      val (_, mode) = refreshInc("r18_m3")
      assert(mode == "incremental",
        s"three churned tables must telescope: $mode")
      assertExact("r18_m3", defSql)
      // and the follow-up window still composes
      spark.sql("DELETE FROM graft.r18_a WHERE id = 1")
      val (_, m2) = refreshInc("r18_m3")
      assert(m2 == "incremental", m2)
      assertExact("r18_m3", defSql)
    } finally Seq("r18_m3", "r18_a", "r18_b", "r18_c").foreach(G.unregister)
  }

  test("incremental refresh stays exact when the base gained a column mid-window") {
    import spark.implicits._
    val bt = tmp("ev_b"); val mt = tmp("ev_m")
    ManifestTable.commit(spark, bt,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "grp", "v"),
      SaveMode.Overwrite)
    G.register("r18_evb", bt)
    val defSql =
      "SELECT grp, count(*) AS n, sum(v) AS total FROM graft.r18_evb GROUP BY grp"
    try {
      spark.sql(s"CREATE MATERIALIZED VIEW graft.r18_ev LOCATION '$mt' AS $defSql")
      refreshInc("r18_ev") // prime
      // schema evolution INSIDE the marker window: add a column with
      // an exists-default, then churn through the NEW schema — the
      // delta and the rescan span both schema eras
      spark.sql("""ALTER TABLE graft.r18_evb
                  |ADD COLUMNS (src STRING DEFAULT 'legacy')""".stripMargin)
      spark.sql("INSERT INTO graft.r18_evb VALUES (3, 'a', 30, 'fresh')")
      spark.sql("DELETE FROM graft.r18_evb WHERE id = 2")
      val (_, mode) = refreshInc("r18_ev")
      assert(mode == "incremental",
        s"schema growth inside the window must not break the delta: $mode")
      assertExact("r18_ev", defSql)
    } finally Seq("r18_ev", "r18_evb").foreach(G.unregister)
  }

  test("catalog retention race: concurrent cold loads under 40 rapid publishes never fail") {
    val prev = G.warehouse
    val wh = java.nio.file.Files.createTempDirectory("graft_r18_race").toString
    val prevTtl = G.refreshTtlMs
    G.warehouse = Some(wh)
    G.refreshTtlMs = 0 // list-per-miss: maximum listing pressure
    try {
      G.register("r18_race_seed", "/p/seed")
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val reader = new Thread(() => {
        while (!stop.get()) {
          try {
            // a cold process load: version files are being deleted by
            // retention underneath these listings
            G.maybeLoadPersisted(force = true)
            G.lookup("r18_race_seed")
          } catch { case t: Throwable => errs.add(t); stop.set(true) }
        }
      })
      reader.start()
      try {
        // 40 publishes: retention (window 20) deletes old versions the
        // reader may have just listed — the FNF retry must absorb it
        (1 to 40).foreach(i => G.register(s"r18_race_$i", s"/p/$i"))
      } finally { stop.set(true); reader.join(10000) }
      assert(errs.isEmpty,
        s"a reader must never see the retention race: ${errs.peek()}")
      assert(G.lookup("r18_race_40") === Some("/p/40"))
    } finally {
      G.warehouse = None
      G.registered.keys.filter(_.startsWith("r18_race")).foreach(G.unregister)
      G.refreshTtlMs = prevTtl
      G.warehouse = prev
    }
  }

  test("a watermarked aggregate view composes over a NESTED projection view") {
    import spark.implicits._
    import graft.streaming.ChangeFeedStream
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val table = tmp("nest_t")
    ManifestTable.commit(spark, table,
      Seq((1L, "a", 10L, "2024-01-01 10:00:00"),
          (2L, "b", 4L, "2024-01-01 10:01:00"),
          (3L, "a", 6L, "2024-01-01 10:02:00"))
        .toDF("id", "cat", "v", "ts_s")
        .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s"))
    G.register("r18_nb", table)
    // inner view: a row-safe transform; outer view: the aggregate
    G.registerView("r18_ninner",
      "SELECT cat, v * 2 AS v2, ts FROM graft.r18_nb WHERE v >= 5")
    G.registerView("r18_nagg",
      "SELECT cat, count(*) AS n, sum(v2) AS total FROM graft.r18_ninner GROUP BY cat")
    try {
      val agg = ChangeFeedStream.readTableStream(spark, "graft.r18_nagg",
        watermark = Some(("ts", "0 seconds")))
      val q = agg.writeStream.format("memory").queryName("r18_nest_mem")
        .outputMode("complete").start()
      try {
        def state = spark.table("r18_nest_mem").collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
        val want = Map("a" -> (2L, 32L))
        val deadline = System.currentTimeMillis() + 30000
        while (state != want && System.currentTimeMillis() < deadline) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        assert(state === want,
          s"the aggregate must see the inner view's transform: $state")
      } finally q.stop()
      // an aggregate UNDER another aggregate still refuses, watermark
      // or not (the telescoped state would be unbounded/ill-defined)
      G.registerView("r18_nagg2",
        "SELECT count(*) AS c FROM graft.r18_nagg GROUP BY n")
      val e = intercept[Exception](ChangeFeedStream.readTableStream(
        spark, "graft.r18_nagg2", watermark = Some(("ts", "0 seconds"))))
      assert(e.getMessage.contains("stream-safe"), e.getMessage)
    } finally {
      ChangeFeedStream.stopTableStreamPump("r18_nb")
      Seq("r18_nagg2", "r18_nagg", "r18_ninner").foreach(G.unregisterView)
      G.unregister("r18_nb")
    }
  }
}
