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

  test("configure scopes s3a credentials to the base bucket, not session-global") {
    val cfg = LakeConfig.parse(dlCfg)
    Lake.configure(spark, cfg)
    val hc = spark.sparkContext.hadoopConfiguration
    // per-bucket form: other s3a tables in this session never see them
    assert(hc.get("fs.s3a.bucket.udacity-dend.access.key") === "AKIATESTKEY")
    assert(hc.get("fs.s3a.bucket.udacity-dend.endpoint") === "s3.us-west-2.amazonaws.com")
    assert(hc.get("fs.s3a.access.key") === null,
      "credentials leaked into the global s3a namespace")
  }

  test("two bucket configs coexist — no last-write-wins clobber") {
    val a = LakeConfig("s3a://lake-a/", Map("fs.s3a.access.key" -> "KEY-A"))
    val b = LakeConfig("s3a://lake-b/", Map("fs.s3a.access.key" -> "KEY-B",
      "fs.s3a.endpoint" -> "localhost:9000"))
    Lake.configure(spark, a)
    Lake.configure(spark, b)
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.bucket.lake-a.access.key") === "KEY-A")
    assert(hc.get("fs.s3a.bucket.lake-b.access.key") === "KEY-B")
    assert(hc.get("fs.s3a.bucket.lake-b.endpoint") === "localhost:9000")
  }

  test("JSON ingest leg: glob over a file:// base resolves, infers, reads (A1+A13)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lake_json")
    // the reference's nested layout: <base>/log_data/<y>/<m>/file.json
    val sub = dir.resolve("log_data/2018/11")
    java.nio.file.Files.createDirectories(sub)
    java.nio.file.Files.write(sub.resolve("a.json"),
      "{\"song\":\"alpha\",\"plays\":3}\n{\"song\":\"beta\",\"plays\":5}\n".getBytes)
    java.nio.file.Files.write(sub.resolve("b.json"),
      "{\"song\":\"gamma\",\"plays\":1}\n".getBytes)
    val cfg = LakeConfig(dir.toUri.toString)
    val df = Lake.json(spark, cfg, "log_data/*/*/*.json")
    assert(df.count() === 3)
    assert(df.schema.fieldNames.sorted.toSeq === Seq("plays", "song"))
    assert(df.agg(sum(col("plays"))).head().getLong(0) === 9L)
  }

  test("dl.cfg parse is robust: quotes, spaces, case, unknown keys, comments") {
    val messy =
      """; full-line comment
        |[AWS]
        |  Aws_Access_Key_Id = "quoted value"
        |AWS_SECRET_ACCESS_KEY='sq'
        |BASE_URI=s3a://bkt
        |not_a_kv_line
        |rogue=but-unknown-so-ignored
        |fs.custom.flag = kept
        |""".stripMargin
    val cfg = LakeConfig.parse(messy)
    assert(cfg.baseUri === "s3a://bkt")
    assert(cfg.hadoopConf("fs.s3a.access.key") === "quoted value")
    assert(cfg.hadoopConf("fs.s3a.secret.key") === "sq")
    assert(cfg.hadoopConf("fs.custom.flag") === "kept")
    assert(!cfg.hadoopConf.exists(_._1.contains("rogue")))
    // parse never throws on arbitrary text; base falls back to default
    for (junk <- Seq("", "===", "[only-a-section]", "x=", "=y", "#c\n;c2"))
      assert(LakeConfig.parse(junk).baseUri === "file:///tmp/lake")
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
