package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import graft.sources.{GraftCatalog => G, ManifestTable}

/** The durable catalog (r17): with a warehouse configured, registry
  * mutations publish `<warehouse>/_catalog/v<NNNNNNNN>.json` under the
  * manifest publish primitive, and a fresh process resolves every name
  * with zero re-registering. CloneSpec-style hostile drills: racing
  * writers, crash debris, tampered files, retention.
  *
  * Every test snapshots and restores the global registry mood
  * (warehouse var) and runs against its own scratch warehouse.
  */
class CatalogPersistSpec extends AnyFunSuite with SparkFixture {

  private def freshWh(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_catp_$tag").toString

  /** Run `body` with the durable catalog rooted at a fresh warehouse;
    * always restore the prior global warehouse var. */
  private def withWarehouse(tag: String)(body: String => Unit): Unit = {
    val prev = G.warehouse
    val wh = freshWh(tag)
    G.warehouse = Some(wh)
    try body(wh)
    finally {
      G.warehouse = None // teardown unregisters stay in-memory-only
      G.registered.keys.filter(_.startsWith("catp_")).foreach(G.unregister)
      G.registeredViews.keys.filter(_.startsWith("catp_")).foreach(G.unregisterView)
      G.warehouse = prev
    }
  }

  private def catFiles(wh: String): Seq[String] = {
    val d = new java.io.File(wh, "_catalog")
    Option(d.listFiles()).getOrElse(Array.empty).map(_.getName).toSeq.sorted
  }

  /** Simulate process death, then point the new "process" at `wh`. */
  private def restartInto(wh: String): Unit = {
    G.resetRegistry()
    G.warehouse = Some(wh)
  }

  test("register/view/rename/drop publish versions and survive restart") {
    withWarehouse("basic") { wh =>
      val t = freshWh("basic_t") + "/t"
      import spark.implicits._
      ManifestTable.commit(spark, t, Seq((1L, "a")).toDF("id", "s"),
        SaveMode.Overwrite)
      G.register("catp_a", t)
      G.register("catp_b", t)
      G.registerView("catp_v", "SELECT id FROM graft.catp_a")
      G.renameRegistered("catp_b", "catp_c")
      G.unregister("catp_a")
      assert(catFiles(wh).nonEmpty, "mutations must publish catalog versions")

      restartInto(wh)
      assert(G.registered.isEmpty, "restart must start empty")
      // cold lookups load from disk: a survives? no — it was dropped
      assert(G.lookup("catp_a").isEmpty)
      assert(G.lookup("catp_c") === Some(t), "rename target must survive")
      assert(G.lookup("catp_b").isEmpty)
      assert(G.hintRenamed("catp_b").contains("catp_c"),
        "the rename hint must survive restart")
      assert(G.lookupView("catp_v") === Some("SELECT id FROM graft.catp_a"))
    }
  }

  test("the full SQL face survives into a fresh SparkSession knowing only the conf") {
    withWarehouse("sql") { wh =>
      import spark.implicits._
      Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "x", 30.0))
        .toDF("id", "grp", "v").createOrReplaceTempView("catp_src")
      spark.sql("CREATE TABLE graft.catp_sqlt AS SELECT * FROM catp_src")
      spark.sql(
        """CREATE VIEW graft.catp_sqlv AS
          |SELECT grp, count(*) AS n FROM graft.catp_sqlt GROUP BY grp""".stripMargin)

      G.resetRegistry() // process death — even the warehouse root dies
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.warehouse", wh)
      // the view resolves, and resolves its underlying table, cold
      val got = s2.sql("SELECT grp, n FROM graft.catp_sqlv ORDER BY grp")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === Map("x" -> 2L, "y" -> 1L))
      // DML through the revived name works too
      s2.sql("INSERT INTO graft.catp_sqlt VALUES (4, 'y', 40.0)")
      assert(s2.sql("SELECT count(*) AS c FROM graft.catp_sqlt")
        .head().getLong(0) == 4L)
      G.warehouse = Some(wh) // for the shared teardown sweep
    }
  }

  test("racing registers from many threads all land (CAS retry loop)") {
    withWarehouse("race") { wh =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val gate = new java.util.concurrent.CyclicBarrier(8)
        val futs = (1 to 8).map { i =>
          pool.submit(new Runnable {
            def run(): Unit = { gate.await(); G.register(s"catp_r$i", s"/p/$i") }
          })
        }
        futs.foreach(_.get())
      } finally pool.shutdown()
      restartInto(wh)
      (1 to 8).foreach { i =>
        assert(G.lookup(s"catp_r$i") === Some(s"/p/$i"),
          s"racing register catp_r$i must have published")
      }
    }
  }

  test("crash debris and strangers in _catalog are ignored; tampered head is LOUD") {
    withWarehouse("debris") { wh =>
      G.register("catp_d", "/p/d")
      val dir = java.nio.file.Paths.get(wh, "_catalog")
      // a crashed writer's temp sibling + an unrelated stranger
      java.nio.file.Files.write(dir.resolve(".v00000099.json.dead.tmp"),
        "{torn".getBytes("UTF-8"))
      java.nio.file.Files.write(dir.resolve("README.txt"),
        "hello".getBytes("UTF-8"))
      restartInto(wh)
      assert(G.lookup("catp_d") === Some("/p/d"),
        "debris must not block the load")
      // hand-tamper the latest version: unreadable JSON must refuse
      // loudly, never silently start empty
      val head = catFiles(wh).filter(_.endsWith(".json")).max
      java.nio.file.Files.write(dir.resolve(head), "NOT JSON".getBytes("UTF-8"))
      restartInto(wh)
      intercept[Exception] { G.lookup("catp_d") }
    }
  }

  test("no-op mutations publish nothing; retention bounds the version count") {
    withWarehouse("retain") { wh =>
      G.register("catp_k", "/p/k")
      val after1 = catFiles(wh).size
      // unregistering a name that was never persisted: no new version
      G.unregister("catp_never_registered")
      assert(catFiles(wh).size == after1,
        "a state-identical mutation must not publish")
      // 30 more mutations: retention keeps a bounded window
      (1 to 30).foreach(i => G.register(s"catp_k$i", s"/p/$i"))
      val files = catFiles(wh).filter(_.endsWith(".json"))
      assert(files.size <= 21, s"retention must bound the census: $files")
      restartInto(wh)
      assert(G.lookup("catp_k") === Some("/p/k") &&
        G.lookup("catp_k30") === Some("/p/30"),
        "every name must survive retention")
    }
  }

  test("SHOW TABLES / SHOW VIEWS list the durable names in a fresh process") {
    withWarehouse("show") { wh =>
      import spark.implicits._
      Seq((1L, 2L)).toDF("a", "b").createOrReplaceTempView("catp_show_src")
      spark.sql("CREATE TABLE graft.catp_showt AS SELECT * FROM catp_show_src")
      spark.sql("CREATE VIEW graft.catp_showv AS SELECT a FROM graft.catp_showt")
      G.resetRegistry()
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.warehouse", wh)
      // the LISTING commands load the durable catalog themselves — a
      // fresh operator's first move is SHOW TABLES, not a lucky miss
      assert(s2.sql("SHOW TABLES IN graft LIKE 'catp_show*'").collect()
        .map(_.getString(1)).toSet === Set("catp_showt"))
      assert(s2.sql("SHOW VIEWS IN graft LIKE 'catp_show*'").collect()
        .map(_.getString(1)).toSet === Set("catp_showv"))
      G.warehouse = Some(wh) // for the shared teardown sweep
    }
  }

  test("in-memory entries win over loaded ones; a genuine miss stays a miss") {
    withWarehouse("merge") { wh =>
      G.register("catp_m", "/p/old")
      G.resetRegistry()
      G.warehouse = Some(wh)
      // a live session re-registers the name somewhere else BEFORE the
      // first cold miss: its choice must not be clobbered by the load
      G.register("catp_m", "/p/new")
      assert(G.lookup("catp_m") === Some("/p/new"))
      assert(G.lookup("catp_no_such_name").isEmpty)
    }
  }

  // -------------------------------------------------------------------
  // r18: ADVICE r17 (medium) — a publish must merge the state it read
  // -------------------------------------------------------------------

  test("ADVICE r17: unregister as a fresh process's FIRST op must not strand the other durable names") {
    withWarehouse("advmerge") { wh =>
      G.register("catp_adv_keep", "/p/keep")
      G.register("catp_adv_drop", "/p/drop")
      G.registerView("catp_adv_view", "SELECT 1 AS one")
      restartInto(wh)
      // the standard pre-clean idiom: the first catalog op is a
      // programmatic unregister of a PERSISTED name — it publishes
      // v+1, and before r18 that set loadedCatVersion past the
      // durable state without ever loading it, stranding every other
      // durable name for the life of the JVM
      G.unregister("catp_adv_drop")
      assert(G.lookup("catp_adv_keep") === Some("/p/keep"),
        "durable names must survive a publish-first op ordering")
      assert(G.lookupView("catp_adv_view") === Some("SELECT 1 AS one"))
      assert(G.lookup("catp_adv_drop").isEmpty)
      // same shape through unregisterView
      restartInto(wh)
      G.unregisterView("catp_adv_view")
      assert(G.lookup("catp_adv_keep") === Some("/p/keep"))
      assert(G.lookupView("catp_adv_view").isEmpty)
    }
  }

  // -------------------------------------------------------------------
  // r18 (VERDICT r17 ask 5): TTL'd cross-process staleness bound
  // -------------------------------------------------------------------

  /** Run `body` with the staleness TTL pinned; always restore. */
  private def withTtl(ms: Long)(body: => Unit): Unit = {
    val prev = G.refreshTtlMs
    G.refreshTtlMs = ms
    try body finally G.refreshTtlMs = prev
  }

  test("cross-process: a remote CREATE/DROP/retarget is visible within the TTL without restart") {
    withWarehouse("xproc") { wh =>
      withTtl(1) { // expire practically immediately
        G.register("catp_x_local", "/p/local")
        // ANOTHER process's DDL = a raw publish (no in-memory touch)
        G.publishRaw(st => st.copy(
          tables = st.tables + ("catp_x_remote" -> "/p/remote")))
        assert(!G.registered.contains("catp_x_remote"),
          "a raw publish must not touch this process's memory")
        Thread.sleep(5)
        assert(G.lookup("catp_x_remote") === Some("/p/remote"),
          "a remote CREATE must be visible within the TTL")
        // remote DROP of a disk-sourced name evicts it on refresh
        G.publishRaw(st => st.copy(tables = st.tables - "catp_x_remote"))
        Thread.sleep(5)
        assert(G.lookup("catp_x_remote").isEmpty,
          "a remote DROP must evict the disk-sourced entry")
        // a disk-owned entry follows remote retargets
        G.publishRaw(st => st.copy(tables = st.tables + ("catp_x_mv" -> "/p/v1")))
        Thread.sleep(5)
        assert(G.lookup("catp_x_mv") === Some("/p/v1"))
        G.publishRaw(st => st.copy(tables = st.tables + ("catp_x_mv" -> "/p/v2")))
        Thread.sleep(5)
        assert(G.lookup("catp_x_mv") === Some("/p/v2"),
          "a disk-owned entry must follow a remote retarget")
        // …but a LOCALLY registered name is never evicted (in-memory wins)
        G.publishRaw(st => st.copy(tables = st.tables - "catp_x_local"))
        Thread.sleep(5)
        assert(G.lookup("catp_x_local") === Some("/p/local"),
          "locally-registered names are never evicted by a refresh")
        // views sync the same way
        G.publishRaw(st => st.copy(
          views = st.views + ("catp_x_rview" -> "SELECT 2 AS two")))
        Thread.sleep(5)
        assert(G.lookupView("catp_x_rview") === Some("SELECT 2 AS two"))
        G.publishRaw(st => st.copy(views = st.views - "catp_x_rview"))
        Thread.sleep(5)
        assert(G.lookupView("catp_x_rview").isEmpty)
      }
    }
  }

  test("inside the TTL window lookups are memory-only; DDL forces past the memo") {
    withWarehouse("memo") { wh =>
      withTtl(600000) {
        G.register("catp_memo_a", "/p/a") // publish primes the memo
        G.publishRaw(st => st.copy(
          tables = st.tables + ("catp_memo_late" -> "/p/late")))
        // ADVICE r17 (listing cost): inside the window a miss does NOT
        // re-list _catalog — bounded staleness is the documented price
        assert(G.lookup("catp_memo_late").isEmpty,
          "inside the TTL the persisted state must not be re-read")
        // but DDL collision checks FORCE a fresh load: a remote VIEW
        // of the same name must refuse this register
        G.publishRaw(st => st.copy(
          views = st.views + ("catp_memo_v" -> "SELECT 1")))
        intercept[Exception] { G.register("catp_memo_v", "/p/x") }
      }
    }
  }

  test("refreshTtlMs <= 0 restores list-per-miss (no staleness window)") {
    withWarehouse("nottl") { wh =>
      withTtl(0) {
        G.register("catp_nt_local", "/p/l")
        G.publishRaw(st => st.copy(
          tables = st.tables + ("catp_nt_remote" -> "/p/r")))
        // no memo: the very next miss lists and loads
        assert(G.lookup("catp_nt_remote") === Some("/p/r"))
      }
    }
  }
}
