package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.ManifestTable

/** The manifest table's change feed as a STREAM — the incremental
  * consumer c23 models with a polling loop, promoted to Structured
  * Streaming so downstream jobs get triggers, checkpoints, and
  * exactly-once sinks for free.
  *
  * Spark's file source cannot tail the table directly: data files land
  * under `data/<uuid>/` BEFORE the commit point, so a file stream on
  * the table root would read uncommitted (possibly never-committed)
  * files — a torn read the manifest protocol exists to prevent. The
  * composition here keeps the commit point authoritative:
  *
  *  1. [[publishPending]] (the pump; run from a scheduler or the
  *     [[pump]] daemon thread) reads `changes(lastPublished, head)` —
  *     committed rows only — and publishes them into
  *     `feedDir/data/v<lo>/` (covered hi rides inside as a `_hi_<n>`
  *     marker) via write-to-temp + atomic rename. The range dir IS the
  *     progress marker: lastPublished is re-derived from the published
  *     dirs, so there is no separate progress file to fall out of sync
  *     with the data. A crash before the rename leaves an invisible
  *     `.tmp-*` dir (hidden from Spark's file listing, reclaimed after
  *     a 30-min grace); a crash after is a completed publish.
  *     Re-running a tick is a no-op, and because the commit point is
  *     keyed on LO alone, two pumps that both observed the same
  *     lastPublished — even with different heads — target the SAME dir
  *     name: at most one publish per lo ever becomes visible, so
  *     ranges cannot overlap and no row is ever delivered twice.
  *  2. [[readChangeStream]] is a plain parquet file-source stream over
  *     `feedDir/data/v*`, schema-pinned to the table's recorded head
  *     schema. The file source's own checkpoint tracks which feed
  *     files each sink consumed — restart-safe, exactly-once into
  *     transactional sinks.
  *
  * At 100 TB each tick moves only the files the commits in
  * `(lastPublished, head]` added — append cost, never a table scan;
  * the feed dir is a bounded spill the operator prunes with ordinary
  * retention once consumers pass it. */
object ChangeFeedStream {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // Range dirs are named BY THEIR LOWER BOUND ONLY (`v<lo>`), with the
  // covered upper bound riding inside as a `_hi_<n>` marker file
  // (underscore-prefixed → invisible to Spark's readers) written
  // BEFORE the atomic rename. Keying the commit point on lo is what
  // makes racing pumps safe: two pumps that both read lastPublished=N
  // target the SAME dir name, so at most one publish per lo becomes
  // visible and ranges can never overlap — a hi-keyed name
  // (`v<lo>_<hi>`, the legacy form, still parsed) let two pumps that
  // observed different heads publish overlapping ranges as two
  // distinct dirs, permanently duplicating rows for every consumer.
  private val LegacyRangeDir = "v(\\d+)_(\\d+)".r
  private val LoRangeDir = "v(\\d+)".r
  private val HiMarker = "_hi_(\\d+)".r

  /** The published ranges: (hi, dir path) per visible range dir. */
  private def publishedRanges(spark: SparkSession,
                              feedDir: String): Seq[(Int, Path)] = {
    val dataDir = new Path(feedDir, "data")
    val f = fs(spark, dataDir)
    if (!f.exists(dataDir)) Nil
    else f.listStatus(dataDir).map(_.getPath).toSeq.flatMap { p =>
      p.getName match {
        case LegacyRangeDir(_, hi) => Some((hi.toInt, p))
        case LoRangeDir(_) =>
          f.listStatus(p).map(_.getPath.getName).collectFirst {
            case HiMarker(hi) => (hi.toInt, p)
          }
        case _ => None
      }
    }
  }

  /** Highest table version already published into `feedDir` (0 when
    * the feed is empty). */
  def publishedUpTo(spark: SparkSession, feedDir: String): Int =
    publishedRanges(spark, feedDir).map(_._1).foldLeft(0)(math.max)

  /** One pump tick: publish `changes(lastPublished, head)` into the
    * feed, atomically. Returns the version the feed now reaches.
    * Idempotent — call it from any scheduler, as often as you like. */
  def publishPending(spark: SparkSession, table: String, feedDir: String): Int =
    publishWith(spark, table, feedDir, "file")(
      (last, head) => ManifestTable.changes(spark, table, last, head),
      // changes() reads the base manifest (when last > 0) and every
      // manifest in (last, head]
      (last, head) => math.max(last, 1) to head)

  /** Row-level variant: each published range holds the CLASSIFIED diff
    * of [[ManifestTable.rowChanges]] (table columns + `_change_type` ∈
    * insert / update_post / delete) instead of the file-granular added
    * rows — streaming row-level CDC. One MODE per feedDir (the two
    * publish different schemas); consume with
    * [[readRowChangeStream]]. Same idempotent crash-safe protocol. */
  def publishPendingRows(spark: SparkSession, table: String,
                         feedDir: String, keys: Seq[String]): Int =
    publishWith(spark, table, feedDir, "rows")(
      (last, head) => ManifestTable.rowChanges(spark, table, last, keys, head),
      // rowChanges diffs exactly TWO snapshots — intermediates lost
      // out-of-band do not block a rows feed
      (last, head) => Seq(last).filter(_ > 0) :+ head)

  /** The wedge signal: the table no longer holds the manifests this
    * feed needs — retrying cannot recover, a NEW feedDir must be
    * bootstrapped from a snapshot ([[bootstrap]]). A dedicated type so
    * [[pump]] stops on exactly this and nothing else. */
  final class FeedWedgedException(msg: String)
    extends IllegalStateException(msg)

  /** The append-only contract of a live streamed AGGREGATE view was
    * broken by a commit landing after the stream started
    * ([[assertAppendOnly]]). [[pump]] stops on it: continuing to
    * publish would feed a silently-diverging aggregate. */
  final class AppendContractException(msg: String)
    extends IllegalStateException(msg)

  // basePath → stream-start head of the earliest-constructed live
  // aggregate view stream over that base: the version its append-only
  // contract was verified up to ([[readTableStream]] aggregate path)
  private val aggContracts =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Assert `table` took no non-append commit after `sinceVersion` —
    * the per-tick twin of the aggregate-view stream's construction
    * check, windowed so its cost tracks NEW commits only. The session
    * auto-pump calls this for tables with a live aggregate contract;
    * deployments running [[publishPending]] from their OWN scheduler
    * should call it there, feeding each call the previous call's
    * return value (the asserted-clean head) as the next
    * `sinceVersion`. Throws [[AppendContractException]] naming the
    * offending commits. */
  def assertAppendOnly(spark: SparkSession, table: String,
                       sinceVersion: Int): Int = {
    // head read BEFORE the scan: the scan covers at least (since,
    // head], so returning head as the new asserted-clean marker is
    // race-safe (a commit landing mid-scan is either scanned or
    // above the returned marker — never silently inside it)
    val head = ManifestTable.currentVersion(spark, table)
    val bad = nonAppendVersions(spark, table, sinceVersion)
      .filter(_._1 > sinceVersion)
    if (bad.nonEmpty) throw new AppendContractException(
      s"table $table took non-append commits (${bad.take(3).map {
        case (v, op) => s"v$v=$op" }.mkString(", ")}${
        if (bad.size > 3) ", …" else ""}) after version $sinceVersion, " +
        "where a live streamed aggregate view started — the append " +
        "feed cannot deliver their retractions, so the aggregate " +
        "would silently diverge from the view's batch result. Stop " +
        "the aggregate stream (its image is valid up to the last " +
        "pre-commit batch), or rebuild it from a fresh batch " +
        "refresh; use MviewMaintenance.maintainView for maintenance " +
        "that reads manifests instead of the feed")
    math.max(sinceVersion, head)
  }

  /** Bootstrap a NEW feed from the table's current snapshot — the
    * recovery the wedge message prescribes, as an API instead of
    * manual surgery: the full head snapshot is published as the feed's
    * FIRST range (lo-keyed `v1`, hi = the head version), so a fresh
    * consumer reads the snapshot once through the ordinary stream and
    * every later [[publishPending]] tick continues INCREMENTALLY from
    * the head, with exactly-once accounting from the snapshot on. The
    * bootstrap itself needs only the HEAD manifest — but incremental
    * ticks still need every manifest from the bootstrap head forward:
    * retention must keep at least the inter-tick window alive
    * (`expire(keepLast)` covering the commits between pump ticks), or
    * the same aggressive policy that wedged the old feed will wedge
    * the new one at its first tick. Requires an EMPTY feedDir: a
    * feed that already delivered ranges cannot absorb a snapshot
    * without re-delivering history to its checkpointed consumers
    * (abandon the wedged dir; its consumers restart on the new one
    * with a fresh checkpoint). Same crash-safe publish protocol as the
    * pump. Returns the table version the feed now reaches (0 for an
    * empty table — nothing to publish, nothing wedged). */
  def bootstrap(spark: SparkSession, table: String, feedDir: String): Int =
    bootstrapWith(spark, table, feedDir, "file")((head: Int) =>
      ManifestTable.read(spark, table, head))

  /** [[bootstrap]] for ROW-level feeds ([[publishPendingRows]] /
    * [[readRowChangeStream]]): the snapshot publishes as `insert`
    * events — exactly what rowChanges(0, head) would classify. */
  def bootstrapRows(spark: SparkSession, table: String, feedDir: String): Int =
    bootstrapWith(spark, table, feedDir, "rows")((head: Int) =>
      ManifestTable.read(spark, table, head).withColumn("_change_type",
        org.apache.spark.sql.functions.lit("insert")))

  private def bootstrapWith(spark: SparkSession, table: String,
                            feedDir: String, mode: String)
                           (snapshotOf: Int => DataFrame): Int = {
    require(publishedRanges(spark, feedDir).isEmpty,
      s"feed $feedDir already holds published ranges — bootstrap needs " +
        "a NEW (empty) feedDir: re-publishing a snapshot into a " +
        "consumed feed would re-deliver history to every checkpointed " +
        "consumer. Point the bootstrap (and the consumers, with fresh " +
        "checkpoints) at a new directory")
    // the snapshot read needs only the head manifest (expired early
    // versions — the wedge cause — are irrelevant); head is read ONCE,
    // inside publishWith, so the version the guard validates IS the
    // version the snapshot reads. An empty table (head 0) publishes
    // nothing and returns 0 through the head <= last early-out.
    publishWith(spark, table, feedDir, mode)(
      (_, h) => snapshotOf(h),
      (_, h) => Seq(h))
  }

  private def publishWith(spark: SparkSession, table: String, feedDir: String,
                          mode: String)(
      batchOf: (Int, Int) => DataFrame,
      neededVersions: (Int, Int) => Seq[Int]): Int = {
    // mode check FIRST — even a no-op tick from the wrong-kind
    // publisher is a deployment wiring error worth failing loudly
    requireMode(spark, feedDir, mode, create = true)
    val head = ManifestTable.currentVersion(spark, table)
    val last = publishedUpTo(spark, feedDir)
    if (head <= last) return last
    // wedge guard: continuing needs this feed kind's manifests on the
    // TABLE side — if retention (ManifestTable.expire) dropped one,
    // every future tick would throw identically, so fail with the
    // operational answer instead of letting the pump spin on it. This
    // covers the bootstrap case too (a fresh feed against a table
    // whose early versions are already expired).
    val avail = ManifestTable.versions(spark, table).toSet
    val missing = neededVersions(last, head).filterNot(avail)
    if (missing.nonEmpty) throw new FeedWedgedException(
      s"change feed of $table is at v$last but table versions " +
        s"${missing.mkString(", ")} are expired — the incremental feed " +
        "cannot continue; run ChangeFeedStream.bootstrap(table, " +
        "NEW feedDir) to restart consumers from the current snapshot")
    val dataDir = new Path(feedDir, "data")
    val f = fs(spark, dataDir)
    f.mkdirs(dataDir)
    // reclaim crashed ticks' temp dirs — but only ones whose WHOLE TREE
    // is idle 30+ min: a fresh .tmp may be a CONCURRENT pump's
    // in-flight write, and its task output lands nested under
    // _temporary/ without refreshing the top-level mtime (the same
    // top-level-only trap scratchDir and expire() avoid). A dir
    // vanishing mid-scan (a racing pump deleting its own lost tmp) is
    // treated as fresh — never a crash, never a delete.
    val cutoff = System.currentTimeMillis() - 30L * 60 * 1000
    def newestMtime(p: Path): Long =
      try {
        val st = f.getFileStatus(p)
        (st.getModificationTime +: (if (st.isDirectory)
          f.listStatus(p).map(x => newestMtime(x.getPath)).toSeq else Nil)).max
      } catch { case _: java.io.FileNotFoundException => Long.MaxValue }
    def reclaimTmps(dir: Path): Unit =
      if (f.exists(dir))
        f.listStatus(dir)
          .filter(st => st.getPath.getName.startsWith(".tmp-") &&
            newestMtime(st.getPath) < cutoff)
          .foreach(st => f.delete(st.getPath, true))
    reclaimTmps(dataDir)
    // a crashed LOST race can leave its tmp NESTED inside the winner's
    // range dir (rename-into-existing-dir) — sweep those too
    publishedRanges(spark, feedDir).foreach { case (_, p) => reclaimTmps(p) }
    val batch0 = batchOf(last, head)
    // a delete/metadata-only window diffs to ZERO rows and an empty
    // 0-partition frame writes no part files at all — the file-source
    // consumers would never SEE this range, so a trigger-style
    // consumer (MviewMaintenance) sleeps straight through the commit
    // and its image goes silently stale until the next row-adding
    // churn. One empty partition forces one schema-only part file:
    // zero rows for aggregate consumers (harmless), one new file for
    // the source to fire a batch on (the wake-up signal)
    val batch = if (batch0.rdd.getNumPartitions == 0)
      batch0.repartition(1) else batch0
    val uuid = java.util.UUID.randomUUID().toString
    val tmp = new Path(dataDir, s".tmp-$uuid")
    batch.write.mode("overwrite").parquet(tmp.toString)
    // hi marker INSIDE the dir, before the atomic publish; plus a
    // UNIQUE token so the publisher can tell whether ITS dir became
    // the visible range (underscore-prefixed → invisible to readers)
    f.create(new Path(tmp, s"_hi_$head"), true).close()
    f.create(new Path(tmp, s"_pub_$uuid"), true).close()
    val target = new Path(dataDir, s"v${last + 1}")
    // lo-keyed commit point: one visible publish per lo, ever. In the
    // worst exists→rename race a loser's rename NESTS its tmp inside
    // the winner's dir and still returns true — so "my rename
    // returned true" does NOT mean "I won": the proof is MY token
    // sitting as a direct child of the target. A loser cleans up both
    // places its tmp may be (where it started, and nested inside the
    // winner's dir).
    val renamed = !f.exists(target) && f.rename(tmp, target)
    val won = renamed && f.exists(new Path(target, s"_pub_$uuid"))
    if (!won) {
      f.delete(tmp, true)
      f.delete(new Path(target, tmp.getName), true)
    }
    // a won publish proves the feed reaches head — only a lost race
    // needs the (O(range dirs)) relisting to learn the winner's reach
    if (won) head else publishedUpTo(spark, feedDir)
  }

  /** One MODE per feedDir, enforced: the file-level and row-level
    * publishers write different schemas, and a file-level bootstrap
    * into a row feed would stream the whole snapshot with
    * `_change_type = null` — silently classified as nothing by every
    * consumer. The first publish stamps the feed's kind; every later
    * publish (and any reader that finds a stamp) must match it.
    *
    * The stamp is ONE path (`_feed_mode`) whose CONTENT is the kind,
    * published atomic-exclusively — the r9 name-encoded stamps
    * (`_mode_<kind>`, still read for legacy feeds) made first-stamping
    * check-then-act across TWO paths: two concurrent first publishers
    * of different kinds could each create their own stamp, after which
    * every later publisher and reader of either kind failed the
    * all-stamps-agree check — the feed permanently wedged with no
    * writer at fault. With a single slot, exactly one first publisher
    * wins; the loser reads the winner's kind and either proceeds
    * (same kind) or fails ITSELF loudly (wrong kind) — the feed is
    * never wedged for the winner's kind. */
  private val ModeStamp = "_feed_mode"

  private def readStampContent(f: org.apache.hadoop.fs.FileSystem,
                               p: Path): Option[String] =
    try {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }

  private def requireMode(spark: SparkSession, feedDir: String,
                          mode: String, create: Boolean): Unit = {
    val dataDir = new Path(feedDir, "data")
    val f = fs(spark, dataDir)
    def stampedModes(): Seq[String] = {
      val legacy =
        if (!f.exists(dataDir)) Nil
        else f.listStatus(dataDir).map(_.getPath.getName)
          .filter(_.startsWith("_mode_")).map(_.stripPrefix("_mode_")).toSeq
      legacy ++ readStampContent(f, new Path(dataDir, ModeStamp)).toSeq
    }
    def requireMatch(modes: Seq[String]): Unit = require(modes.forall(_ == mode),
      s"feed $feedDir is a ${modes.filterNot(_ == mode).head}-level feed — " +
        s"a $mode-level publisher/reader on it would silently mis-classify " +
        "every row (use the matching publishPending/bootstrap/read " +
        "variant, or a new feedDir)")
    stampedModes() match {
      case Nil if create =>
        f.mkdirs(dataDir)
        // write-to-temp + atomic-exclusive link/rename into the single
        // stamp slot (the manifest publish primitive): the winner's
        // stamp is complete before it becomes visible, and a loser
        // re-reads the slot and verifies instead of wedging the feed
        val tmp = new Path(dataDir,
          s".tmp-mode-${java.util.UUID.randomUUID().toString.take(8)}")
        val out = f.create(tmp, true)
        try out.write(mode.getBytes("UTF-8")) finally out.close()
        val target = new Path(dataDir, ModeStamp)
        val won = f match {
          case _: org.apache.hadoop.fs.LocalFileSystem |
               _: org.apache.hadoop.fs.RawLocalFileSystem =>
            try {
              java.nio.file.Files.createLink(
                java.nio.file.Paths.get(target.toUri.getPath),
                java.nio.file.Paths.get(tmp.toUri.getPath))
              true
            } catch { case _: java.nio.file.FileAlreadyExistsException => false }
          case _ => !f.exists(target) && f.rename(tmp, target)
        }
        f.delete(tmp, false)
        if (!won) {
          // a lost slot means someone else stamped — verify against
          // THEIR stamp. An EMPTY re-read means the publish failed for
          // a persistent non-race reason (permissions, an FS whose
          // rename misbehaves): proceeding would publish into an
          // unstamped feed that a later opposite-kind publisher could
          // claim, silently mis-classifying these rows — fail fast
          // instead, like the manifest publish does (review r10)
          val now = stampedModes()
          require(now.nonEmpty,
            s"mode stamp publish on $feedDir failed although no " +
              "concurrent publisher claimed the slot — non-race " +
              "failure (permissions or filesystem misbehavior)")
          requireMatch(now)
        }
      case Nil => // nothing stamped yet, nothing to contradict
      case modes => requireMatch(modes)
    }
  }

  /** The feed as a streaming DataFrame (parquet file source over the
    * published range dirs), schema-pinned to the table's recorded head
    * schema so pre-evolution feed files surface added columns as null
    * exactly like the batch read path. */
  def readChangeStream(spark: SparkSession, table: String,
                       feedDir: String): DataFrame = {
    requireMode(spark, feedDir, "file", create = false)
    fs(spark, new Path(feedDir, "data")).mkdirs(new Path(feedDir, "data"))
    val schema = ManifestTable.snapshotSchema(spark, table)
      .getOrElse(ManifestTable.read(spark, table).schema)
    spark.readStream.schema(schema).parquet(s"$feedDir/data/v*")
  }

  /** The row-level feed as a streaming DataFrame — the table's columns
    * plus `_change_type`, for feeds fed by [[publishPendingRows]]. */
  def readRowChangeStream(spark: SparkSession, table: String,
                          feedDir: String): DataFrame = {
    requireMode(spark, feedDir, "rows", create = false)
    fs(spark, new Path(feedDir, "data")).mkdirs(new Path(feedDir, "data"))
    val base = ManifestTable.snapshotSchema(spark, table)
      .getOrElse(ManifestTable.read(spark, table).schema)
    val schema = org.apache.spark.sql.types.StructType(base.fields :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType))
    spark.readStream.schema(schema).parquet(s"$feedDir/data/v*")
  }

  /** Feed retention: drop all but the newest `keepLast` published
    * range dirs — consumed history a checkpointed consumer never
    * re-reads (the file source remembers processed files and never
    * re-lists deleted ones, so running and restarted streams are
    * unaffected). A NEW consumer starting after expiry sees only the
    * retained tail; bootstrap one from a snapshot instead:
    * `ManifestTable.read(table)` + a stream from the current head. */
  def expireFeed(spark: SparkSession, feedDir: String, keepLast: Int): Unit = {
    // the newest range dir IS the progress marker (publishedUpTo):
    // dropping it would reset lastSeen to 0 and the next tick would
    // republish history as new files — duplicates for every consumer
    require(keepLast >= 1, "must keep at least the newest range (the progress marker)")
    val f = fs(spark, new Path(feedDir, "data"))
    publishedRanges(spark, feedDir).sortBy(_._1)
      .dropRight(keepLast).foreach { case (_, p) => f.delete(p, true) }
  }

  /** Continuous pump: a daemon thread ticking [[publishPending]] every
    * `pollIntervalMs`. Close to stop. One pump per feed is the intended
    * deployment; racing pumps stay correct (see object doc), they just
    * waste work. */
  def pump(spark: SparkSession, table: String, feedDir: String,
           pollIntervalMs: Long = 1000L): AutoCloseable = {
    @volatile var running = true
    val t = new Thread(() => {
      while (running) {
        try {
          // live aggregate-view contract: re-assert append-only past
          // the asserted-clean marker BEFORE publishing this window —
          // a violating commit stops the pump (loud stall beats a
          // silently-diverging aggregate). The marker advances to the
          // scanned head on every clean pass, so the per-tick scan
          // window covers only NEW commits, not the whole history
          Option(aggContracts.get(table)).foreach { h0 =>
            val clean = assertAppendOnly(spark, table, h0.intValue)
            aggContracts.replace(table, h0, Integer.valueOf(clean))
          }
          publishPending(spark, table, feedDir)
        }
        catch { case _: InterruptedException => running = false
                case e @ (_: FeedWedgedException |
                          _: AppendContractException) =>
                  // unrecoverable by retrying (expired table versions /
                  // broken append contract): stop instead of spinning
                  // on the same error forever — ONLY on the dedicated
                  // signals, so a transient IllegalStateException from
                  // Spark internals does not silently kill the feed
                  System.err.println(s"[change-feed pump] stopping: ${e.getMessage}")
                  running = false
                case e: Throwable =>
                  System.err.println(s"[change-feed pump] tick failed: ${e.getMessage}") }
        try Thread.sleep(pollIntervalMs)
        catch { case _: InterruptedException => running = false }
      }
    }, s"graft-change-feed-pump")
    t.setDaemon(true)
    t.start()
    () => { running = false; t.interrupt(); t.join(5000) }
  }

  // ---- by-name streaming sugar (r14, the r13 verdict gap #4) --------

  /** The feed dir the by-name sugar owns: an underscore-prefixed
    * sibling of `data/` inside the table directory (invisible to
    * Spark's file listings, like `_manifests`), so a registered table
    * is streamable with zero configuration. */
  private def defaultFeedDir(path: String): String =
    path.stripSuffix("/") + "/_changes"

  // one auto-pump per feed dir per JVM — repeated readTableStream
  // calls (and restarted queries in the same session) share it
  private val autoPumps =
    new java.util.concurrent.ConcurrentHashMap[String, AutoCloseable]()

  /** `readTableStream(spark, "events")` — the streaming face of the
    * catalog-name ergonomics the batch side got in r10: resolve a
    * REGISTERED name (bare or `graft.`-qualified), stamp/adopt the
    * table's default feed dir, start (or share) a session-local pump,
    * and return the change stream. Exactly-once into transactional
    * sinks rides the file source's own checkpoint, so a restarted
    * query resumes where it left off. Production deployments that
    * want ONE pump per table across many sessions run
    * [[publishPending]] from their own scheduler and pass
    * `autoPump = false` — the stream then only ever sees what the
    * external pump publishes. */
  def readTableStream(spark: SparkSession, name: String,
                      autoPump: Boolean = true,
                      pollIntervalMs: Long = 250L,
                      watermark: Option[(String, String)] = None): DataFrame = {
    val bare = name.stripPrefix("graft.")
    // a VIEW name composes for free when its text is stream-safe
    // (r17, VERDICT r16 ask #5): pure projections/filters expand over
    // the underlying table's change stream — streaming through the
    // view ≡ streaming the table + the view's own transform. With a
    // `watermark` (column, delay) supplied, AGGREGATE views stream
    // too (r18) — see [[viewStream]].
    graft.sources.GraftCatalog.lookupView(bare).foreach { sql =>
      return viewStream(spark, bare, sql, autoPump, pollIntervalMs,
        watermark, Set(bare))
    }
    val path = graft.sources.GraftCatalog.lookup(bare).getOrElse(
      throw new IllegalArgumentException(
        s"readTableStream: no registered table '$name' — " +
          "GraftCatalog.register(name, path) first"))
    val feedDir = defaultFeedDir(path)
    requireMode(spark, feedDir, "file", create = true)
    if (autoPump)
      autoPumps.computeIfAbsent(feedDir,
        _ => pump(spark, path, feedDir, pollIntervalMs))
    val raw = readChangeStream(spark, path, feedDir)
    // the watermark lands on the BASE stream — below any view
    // transform, where a streaming aggregate needs it
    watermark.fold(raw) { case (c, d) => raw.withWatermark(c, d) }
  }

  /** Expand a registered view's text over the change stream of the
    * table it (transitively) reads. Stream-safe = exactly
    * [alias|project|filter]* over ONE relation — per-row transforms
    * that compose with a change stream untouched — plus, WHEN the
    * caller supplies a `watermark` (r18): one GROUP BY aggregate on
    * top of that shape. The watermark lands on the base stream below
    * the aggregate, so the expansion is exactly the watermarked
    * streaming aggregation the user would hand-write; Spark's own
    * unsupported-operation checker still governs output-mode
    * legality at query start. The aggregate streams the table's
    * APPEND feed (each commit's added rows) — and that contract is
    * ENFORCED (r19, ADVICE r18): a base whose history holds
    * non-append commits refuses at query start, because the feed
    * cannot deliver their retractions and the streamed aggregate
    * would silently diverge from the batch view. Update/delete-heavy
    * tables want the row-level CDC feed, or
    * [[MviewMaintenance.maintainView]] (which reads manifests, not
    * the feed). Aggregates WITHOUT a watermark, joins, sorts and set
    * ops REFUSE (unbounded state / not per-row; silently batch-ifying
    * would lie). */
  private def viewStream(spark: SparkSession, name: String, sql: String,
                         autoPump: Boolean, pollIntervalMs: Long,
                         watermark: Option[(String, String)],
                         seen: Set[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Project, SubqueryAlias}
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    // scalar/IN/EXISTS subqueries hide whole plans inside EXPRESSIONS
    // — a plan-node walk alone would pass `SELECT a, (SELECT max(x)
    // FROM graft.u) FROM graft.t` and then silently evaluate the
    // subquery as a point-in-time batch read per microbatch,
    // violating the per-row contract (ADVICE r17)
    def exprSafe(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Boolean = !p.expressions.exists(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))
    def rowSafe(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Boolean = p match {
      case _: UnresolvedRelation => true
      case SubqueryAlias(_, c) => rowSafe(c)
      case Filter(_, c) => exprSafe(p) && rowSafe(c)
      case Project(_, c) => exprSafe(p) && rowSafe(c)
      case _ => false
    }
    def streamSafe(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Boolean = p match {
      // one aggregate, only with a watermark to bound its state; its
      // child must be the plain row-safe shape (a nested aggregate
      // refuses here; Spark would refuse the multi-agg plan anyway)
      case Aggregate(_, _, c, _) if watermark.isDefined =>
        exprSafe(p) && rowSafe(c)
      case SubqueryAlias(_, c) => streamSafe(c)
      case Filter(_, c) => exprSafe(p) && streamSafe(c)
      case Project(_, c) => exprSafe(p) && streamSafe(c)
      case _ => rowSafe(p)
    }
    require(streamSafe(plan),
      s"readTableStream: view graft.$name is not stream-safe — " +
        "single-table projections/filters compose over a change " +
        "stream, and ONE GROUP BY aggregate may sit on top when the " +
        "call supplies watermark=(column, delay); joins, sorts, set " +
        "ops and unwatermarked aggregates need their own streaming " +
        "query over the base table's stream")
    val relName = plan.collectFirst { case u: UnresolvedRelation =>
      u.multipartIdentifier match {
        case Seq(ns, ident) if ns.equalsIgnoreCase("graft") => ident
        case Seq(ident) => ident
        case parts => throw new IllegalArgumentException(
          s"readTableStream: view graft.$name reads " +
            s"'${parts.mkString(".")}', which is not a graft name")
      }
    }.getOrElse(throw new IllegalArgumentException(
      s"readTableStream: view graft.$name reads no table"))
    require(!seen.contains(relName),
      s"readTableStream: view graft.$name is cyclic — " +
        (seen + relName).mkString(" -> "))
    // nested views expand recursively (cycle guard threads through);
    // the base table starts the actual change stream (same pump/feed
    // semantics as ever)
    val base = graft.sources.GraftCatalog.lookupView(relName) match {
      // nested views stay row-safe wrappers (an aggregate below an
      // aggregate would refuse above); the watermark threads down to
      // the BASE table stream where state bounding needs it
      case Some(inner) => viewStream(spark, relName, inner, autoPump,
        pollIntervalMs, watermark, seen + relName)
      case None => readTableStream(spark, relName, autoPump,
        pollIntervalMs, watermark)
    }
    val substituted = plan.transformUp {
      case _: UnresolvedRelation =>
        SubqueryAlias(relName, base.queryExecution.analyzed)
    }
    val result =
      org.apache.spark.sql.graftbridge.PlanBridge.ofRows(spark, substituted)
    // a GLOBAL aggregate parses as a plain Project (GlobalAggregates
    // promotes it at ANALYSIS) — gate the analyzed plan too; row-local
    // generators (explode) stay legal. With a watermark ONE aggregate
    // is the point (Spark's checker owns output-mode legality) — but
    // only one: nested views can stack an aggregate view on another
    // (each level passes the parse gate alone; the composed plan is
    // a double streaming aggregation, caught HERE on the analyzed
    // whole — r18 self-review). Window FUNCTIONS stay refused — they
    // need ordered state no watermark bounds
    val analyzed = result.queryExecution.analyzed
    val aggCount = analyzed.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size
    require((if (watermark.isEmpty) aggCount == 0 else aggCount <= 1) &&
        !analyzed.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window]),
      s"readTableStream: view graft.$name is not stream-safe — only " +
        "single-table projections/filters compose over a change " +
        "stream; ONE aggregate view streams with an explicit " +
        "watermark=(column, delay) (stacked aggregate views do not), " +
        "and window functions need their own streaming query over " +
        "the base table's stream")
    // APPEND-ONLY contract, enforced (ADVICE r18): the file-level feed
    // carries each commit's ADDED rows only, so a base-table UPDATE/
    // DELETE/OPTIMIZE would never reach (or would double-count into) a
    // streamed aggregate — the result silently diverges from the
    // view's batch semantics. Refuse at query construction when the
    // base's surviving history already holds such a commit, instead
    // of leaving the caveat in a code comment.
    if (watermark.isDefined && aggCount == 1) {
      @annotation.tailrec
      def baseName(n: String): String =
        graft.sources.GraftCatalog.lookupView(n) match {
          case Some(inner) =>
            baseName(spark.sessionState.sqlParser.parsePlan(inner)
              .collectFirst { case u: UnresolvedRelation =>
                u.multipartIdentifier.last }.getOrElse(n))
          case None => n
        }
      val bn = baseName(relName)
      graft.sources.GraftCatalog.lookup(bn).foreach { basePath =>
        // head read BEFORE the history scan: a commit racing the
        // construction lands either inside the scan (refused below)
        // or above h0 (caught by the pump's per-tick assert) — never
        // silently inside the recorded contract window
        val h0 = ManifestTable.currentVersion(spark, basePath)
        val bad = nonAppendVersions(spark, basePath)
        // the contract holds at construction — record it so the
        // auto-pump re-asserts it on every tick ([[assertAppendOnly]];
        // a non-append commit landing AFTER the stream starts would
        // otherwise diverge just as silently as a historical one)
        if (bad.isEmpty)
          aggContracts.merge(basePath, Integer.valueOf(h0),
            (a, b) => Integer.valueOf(math.min(a.intValue, b.intValue)))
        require(bad.isEmpty,
          s"readTableStream: view graft.$name aggregates the APPEND " +
            s"feed of graft.$bn, but that table's history holds " +
            s"non-append commits (${bad.take(3).map { case (v, op) =>
              s"v$v=$op" }.mkString(", ")}${
              if (bad.size > 3) ", …" else ""}) whose retractions/" +
            "rewrites the feed cannot deliver — the streamed aggregate " +
            "would silently diverge from the view's batch result. Use " +
            "the row-level CDC feed (publishPendingRows/" +
            "readRowChangeStream) with your own retraction logic, or " +
            "MviewMaintenance.maintainView for continuous maintenance " +
            "that reads the manifests instead of the feed")
      }
    }
    result
  }

  /** Versions of `table` whose commit is NOT pure row addition — file
    * removals/rewrites (n_removed > 0: overwrite, compaction, restore,
    * eager deletes) and row-level removals that move no file
    * (delete-lazy, delete-vector, DV-backed update/merge — detected
    * from the manifest's ACTUAL dv/tombstone delta, so an insert-only
    * MERGE or a zero-match DELETE stays append-safe instead of
    * refusing on the op name). The oldest surviving version after
    * retention (parent manifest gone, delta unknowable) is trusted
    * only for the explicitly append-shaped ops. */
  private[streaming] def nonAppendVersions(
      spark: SparkSession, table: String,
      since: Int = 0): Seq[(Int, String)] = {
    val appendShaped = Set("append", "copy-into", "clone")
    ManifestTable.historySince(spark, table, since)
      .select("version", "op", "n_removed")
      .collect().toSeq.flatMap { r =>
        val v = r.getInt(0); val op = r.getString(1)
        val removed = if (r.isNullAt(2)) None else Some(r.getLong(2))
        val bad = removed.exists(_ > 0) ||
          (v > 1 && removed.isEmpty && !appendShaped(op)) ||
          (removed.contains(0L) && !appendShaped(op) &&
            (try ManifestTable.rowStateShrunkAt(spark, table, v)
             catch { // parent expired mid-check: unknowable = unsafe
               case _: ManifestTable.ExpiredVersionException => true }))
        if (bad) Some((v, op)) else None
      }
  }

  /** Stop and forget the auto-pump a [[readTableStream]] call started
    * for `name`'s default feed (no-op when none is running). */
  def stopTableStreamPump(name: String): Unit = {
    val bare = name.stripPrefix("graft.")
    graft.sources.GraftCatalog.lookup(bare).foreach { path =>
      Option(autoPumps.remove(defaultFeedDir(path))).foreach(_.close())
      aggContracts.remove(path) // the contract dies with its stream
    }
  }
}
