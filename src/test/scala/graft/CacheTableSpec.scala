package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SaveMode
import graft.sources.{GraftCatalog, ManifestTable}

/** `CACHE [LAZY] TABLE graft.<t>` / `UNCACHE TABLE` (r16): version-
  * keyed block caching — the cache key is the snapshot version, so a
  * write invalidates by construction and a stale read is impossible. */
class CacheTableSpec extends AnyFunSuite with SparkFixture {

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cache_$tag").toString + "/t"

  test("cached reads serve from memory and writes invalidate by version") {
    import spark.implicits._
    val t = tmp("basic")
    ManifestTable.commit(spark, t,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), SaveMode.Overwrite)
    GraftCatalog.register("cache_t", t)
    try {
      spark.sql("CACHE TABLE graft.cache_t")
      assert(ManifestTable.isCached(spark, t))
      // the cached frame plans as an in-memory scan
      val p = spark.sql("SELECT sum(v) FROM graft.cache_t")
        .queryExecution.executedPlan.toString
      assert(p.contains("InMemoryTableScan"), s"expected cached scan in:\n$p")
      assert(spark.sql("SELECT sum(v) FROM graft.cache_t")
        .head().getDouble(0) == 30.0)
      // a write advances the version: the stale entry can never serve
      ManifestTable.commit(spark, t, Seq((3L, 70.0)).toDF("id", "v"))
      assert(!ManifestTable.isCached(spark, t),
        "the old version's entry must not pass for the new head")
      assert(spark.sql("SELECT sum(v) FROM graft.cache_t")
        .head().getDouble(0) == 100.0,
        "the first post-write read must see the new rows")
      // ... and that read re-cached the new head
      assert(ManifestTable.isCached(spark, t))
      val p2 = spark.sql("SELECT sum(v) FROM graft.cache_t")
        .queryExecution.executedPlan.toString
      assert(p2.contains("InMemoryTableScan"), s"expected re-cache in:\n$p2")
      spark.sql("UNCACHE TABLE graft.cache_t")
      assert(!ManifestTable.isCached(spark, t))
      spark.sql("UNCACHE TABLE graft.cache_t") // never-cached: no-op
    } finally GraftCatalog.unregister("cache_t")
  }

  test("CACHE LAZY TABLE defers materialization; time-travel reads bypass the cache") {
    import spark.implicits._
    val t = tmp("lazy")
    ManifestTable.commit(spark, t,
      Seq((1L, 1.0)).toDF("id", "v"), SaveMode.Overwrite)      // v1
    ManifestTable.commit(spark, t, Seq((2L, 2.0)).toDF("id", "v")) // v2
    GraftCatalog.register("cache_l", t)
    try {
      spark.sql("CACHE LAZY TABLE graft.cache_l")
      assert(spark.sql("SELECT count(*) FROM graft.cache_l")
        .head().getLong(0) == 2)
      // time travel reads the OLD version correctly, never the cache
      assert(ManifestTable.read(spark, t, 1).count() == 1)
      // the cached head still answers
      assert(spark.sql("SELECT count(*) FROM graft.cache_l")
        .head().getLong(0) == 2)
    } finally {
      ManifestTable.uncacheTable(spark, t)
      GraftCatalog.unregister("cache_l")
    }
  }
}
