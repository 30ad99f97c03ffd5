package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{Lake, LakeConfig}

/** Object-store access layer (sources/Lake.scala): dl.cfg parsing,
  * credential injection into the session's Hadoop conf, and a full
  * write→read round trip through a scheme-prefixed base URI. Driven
  * against file:// (the same Hadoop FileSystem abstraction S3A plugs
  * into) because the sandbox has zero egress — the s3a:// leg differs
  * only in config values, not code path. */
class LakeSpec extends AnyFunSuite with SparkFixture {

  private val dlCfg =
    """[AWS]
      |# the reference's dl.cfg shape: credentials + the lake root
      |AWS_ACCESS_KEY_ID='AKIATESTKEY'
      |AWS_SECRET_ACCESS_KEY='secret/with/slashes'
      |base_uri = s3a://udacity-dend/
      |fs.s3a.endpoint = s3.us-west-2.amazonaws.com
      |unrelated_tool_setting = ignored
      |""".stripMargin

  test("dl.cfg parse: AWS names map to S3A options, base_uri and fs.* pass through") {
    val cfg = LakeConfig.parse(dlCfg)
    assert(cfg.baseUri === "s3a://udacity-dend/")
    assert(cfg.hadoopConf("fs.s3a.access.key") === "AKIATESTKEY")
    assert(cfg.hadoopConf("fs.s3a.secret.key") === "secret/with/slashes")
    assert(cfg.hadoopConf("fs.s3a.endpoint") === "s3.us-west-2.amazonaws.com")
    assert(!cfg.hadoopConf.contains("unrelated_tool_setting"))
  }

  test("path join tolerates trailing/leading slashes") {
    assert(LakeConfig.parse(dlCfg).path("/songs.parquet") ===
      "s3a://udacity-dend/songs.parquet")
    assert(LakeConfig("s3a://b").path("x.parquet") === "s3a://b/x.parquet")
  }

  test("configure injects credentials into the session Hadoop conf") {
    val cfg = LakeConfig.parse(dlCfg)
    Lake.configure(spark, cfg)
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.access.key") === "AKIATESTKEY")
    assert(hc.get("fs.s3a.endpoint") === "s3.us-west-2.amazonaws.com")
  }

  test("config-driven ingest round trip over an explicit file:// base URI") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_lake").toUri.toString
    // file:///... — same code path a s3a:// base takes
    val cfg = LakeConfig(base, Map("fs.s3a.access.key" -> "unused-on-file"))
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "name")
    Lake.write(spark, cfg, df, "dim.parquet", partitionBy = Seq("name"))
    val back = Lake.table(spark, cfg, "dim")
    assert(back.count() === 3)
    assert(back.filter(col("name") === "beta").select("id").as[Long].head() === 2L)
    // partitioned layout actually materialized (A2-style sink)
    val dirs = new java.io.File(new java.net.URI(base).getPath, "dim.parquet")
      .listFiles().map(_.getName).filter(_.startsWith("name="))
    assert(dirs.toSet === Set("name=alpha", "name=beta", "name=gamma"))
  }
}
