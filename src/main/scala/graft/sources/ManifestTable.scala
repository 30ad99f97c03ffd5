package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** A minimal manifest-commit table format over raw parquet — the ACID
  * story a lake user expects from a Delta/Iceberg-class table, built
  * from nothing but the Hadoop FileSystem API (offline sandbox: no
  * external table-format deps, and none are needed to demonstrate the
  * protocol; Delta's LAST checkpointless design is exactly this).
  *
  * Layout:
  * {{{
  *   <table>/data/<uuid>/part-*.parquet   -- immutable data files
  *   <table>/_manifests/v00000042.json    -- snapshot manifests
  * }}}
  *
  * Protocol (writer):
  *  1. write the new data files COMPLETELY, under a fresh uuid dir no
  *     manifest references yet — crash here leaves garbage, never a
  *     torn table;
  *  2. compose the next SNAPSHOT manifest (the complete file list of
  *     the new version — append = old list + new files, overwrite =
  *     new files only, delete-by-predicate = old list minus victims);
  *  3. write it to a temp name, then RENAME to `v<N+1>.json`. The
  *     rename is the commit point: it is atomic on HDFS-class
  *     filesystems and object stores with atomic metadata ops, so a
  *     manifest is either absent or complete — a reader can never
  *     observe half a commit. If `v<N+1>` already exists (concurrent
  *     writer won), re-read the head and retry against N+2 —
  *     optimistic concurrency, exactly the Delta/Iceberg commit loop.
  *
  * Protocol (reader): list `_manifests/`, take the HIGHEST version,
  * read exactly the files it names. Time travel falls out for free:
  * pass an older version. Readers touch no lock and block no writer.
  *
  * Caveats, stated honestly: on S3A the rename-as-commit needs the
  * store's conditional-put (or a commit coordinator) to be truly
  * atomic; local-FS rename overwrites silently, so the exclusive-
  * version check is best-effort there. The PROTOCOL — full data write
  * → atomic manifest publish → monotonic versions — is the real
  * content, and is what the spec exercises (ManifestTableSpec,
  * including a torn-write drill where data files exist with no
  * manifest and readers still see the old snapshot).
  */
object ManifestTable {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(table: String) = new Path(table, "_manifests")
  private def versionOf(p: Path): Int =
    p.getName.stripPrefix("v").stripSuffix(".json").toInt
  private def manifestPath(table: String, v: Int) =
    new Path(manifestDir(table), f"v$v%08d.json")
  // only fully-published manifests count: a crashed writer's temp file
  // (.tmp-*) or any foreign file in _manifests/ must be invisible to
  // readers, not a parse crash
  private def isManifest(p: Path): Boolean = p.getName.matches("v\\d{8}\\.json")

  /** Highest committed version, or 0 if the table has no commits. */
  def currentVersion(spark: SparkSession, table: String): Int = {
    val dir = manifestDir(table)
    val f = fs(spark, dir)
    if (!f.exists(dir)) 0
    else f.listStatus(dir).map(_.getPath).filter(isManifest)
      .map(versionOf).foldLeft(0)(math.max)
  }

  /** The complete data-file list of `version` (default: head). Empty
    * for version 0 (the empty table). */
  def snapshotFiles(spark: SparkSession, table: String,
                    version: Int = -1): Seq[String] = {
    val v = if (version < 0) currentVersion(spark, table) else version
    if (v == 0) Nil
    else {
      val p = manifestPath(table, v)
      val in = fs(spark, p).open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      // manifest grammar is ours and trivial: one quoted path per line
      // inside "files": [...] — no JSON dep needed to write or read it
      "\"(/[^\"]+)\"".r.findAllMatchIn(text).map(_.group(1)).toSeq
    }
  }

  /** Read the table at `version` (default head). Version 0 / an empty
    * file list yields an empty-but-typed read only if `schemaFrom` has
    * at least one committed version — callers read what they wrote. */
  def read(spark: SparkSession, table: String, version: Int = -1): DataFrame = {
    val files = snapshotFiles(spark, table, version)
    require(files.nonEmpty, s"no committed snapshot in $table")
    spark.read.parquet(files: _*)
  }

  /** Commit `df` as the next version. `SaveMode.Append` unions the new
    * files with the head snapshot's; `SaveMode.Overwrite` replaces it.
    * Returns the committed version number. */
  def commit(spark: SparkSession, table: String, df: DataFrame,
             mode: SaveMode = SaveMode.Append): Int = {
    // 1. full data write under a fresh uuid — unreferenced until step 3
    val uuid = java.util.UUID.randomUUID().toString
    val dataDir = new Path(table, s"data/$uuid")
    df.write.mode(SaveMode.ErrorIfExists).parquet(dataDir.toString)
    val f = fs(spark, dataDir)
    val newFiles = f.listStatus(dataDir)
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map(s => Path.getPathWithoutSchemeAndAuthority(s.getPath).toString)
      .toSeq.sorted
    // 2+3. publish: compose snapshot against the CURRENT head, rename
    // into the next version slot, retry on a concurrent winner
    var committed = -1
    while (committed < 0) {
      val head = currentVersion(spark, table)
      val base = if (mode == SaveMode.Append) snapshotFiles(spark, table, head) else Nil
      val files = (base ++ newFiles).map(p => s"    \"$p\"").mkString(",\n")
      val body =
        s"""{
           |  "version": ${head + 1},
           |  "files": [
           |$files
           |  ]
           |}""".stripMargin
      val target = manifestPath(table, head + 1)
      val tmp = new Path(manifestDir(table), s".tmp-$uuid-${head + 1}.json")
      val out = f.create(tmp, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      if (!f.exists(target) && f.rename(tmp, target)) committed = head + 1
      else f.delete(tmp, false) // lost the race — recompose against new head
    }
    committed
  }

  /** MERGE-style upsert: rows of `updates` replace current rows with
    * equal `keys`; unmatched update rows insert. One new snapshot —
    * readers see the pre-image until the commit point, the full
    * post-image after, never a mix (the c12_upsert_latest semantics
    * with real isolation). */
  def upsert(spark: SparkSession, table: String, updates: DataFrame,
             keys: Seq[String]): Int = {
    val survivors = read(spark, table).join(
      updates.select(keys.map(org.apache.spark.sql.functions.col): _*).distinct(),
      keys, "left_anti")
    commit(spark, table, survivors.unionByName(updates), SaveMode.Overwrite)
  }
}
