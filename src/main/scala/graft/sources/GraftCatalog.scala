package graft.sources

import org.apache.spark.sql.{Column, Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedIdentifier, UnresolvedRelation, UnresolvedTable, UnresolvedTableOrView}
import org.apache.spark.sql.catalyst.expressions.{And, CheckConstraint, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{AddColumns, AddCheckConstraint, AlterColumns, AnalyzeColumn, AnalyzeTable, CreateTable, CreateTableAsSelect, DeleteAction, DeleteFromTable, DescribeRelation, DropColumns, DropConstraint => DropConstraintPlan, DropTable, InsertAction, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeIntoTable, RenameColumn, ReplaceTable, ReplaceTableAsSelect, ShowCreateTable, ShowTables, SubqueryAlias, TableSpec, TableSpecBase, UnresolvedTableSpec, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.constraints.{Check, Constraint}
import org.apache.spark.sql.connector.expressions.{Literal => V2Literal, Transform}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Name resolution for manifest tables — the catalog face the TVFs
  * are sugar over. `register("orders", "/lake/orders")` makes
  *
  * {{{
  *   SELECT * FROM graft.orders            -- the current head
  *   SELECT * FROM orders                  -- one-part, if nothing else claims it
  *   SELECT * FROM graft.`orders@v3`       -- version time travel
  * }}}
  *
  * resolve — at QUERY time, to the same analyzed plan
  * [[ManifestTable.read]] builds, so a name always reads the head as
  * of the query (a temp view would freeze the file list of whatever
  * head existed at registration). Resolution rides the sanctioned
  * `injectResolutionRule` extension point (graft.GraftExtensions):
  * the rule only sees relations the built-in resolver left
  * UNRESOLVED, so real tables and temp views always win a name clash
  * — registering `orders` can never shadow an existing table.
  * Timestamp travel stays on `graft_table_at(path, ms)`.
  *
  * The registry is JVM-wide and name-keyed (Spark SQL identifiers are
  * case-insensitive; names are folded to lowercase) — the same scope
  * as a session-catalog temp function, intended for the
  * one-application-per-JVM deployment Spark local/driver processes
  * are. At 100 TB this is operational sugar, not a data path: the
  * cost of a named read is identical to the path read it resolves
  * to. */
object GraftCatalog {

  /** Serializes every in-memory registry MUTATION — registrations,
    * renames, unregistrations, and the persisted-state merge
    * ([[mergeState]]/[[maybeLoadPersisted]]/[[publishCatalog]]).
    * Without it (ADVICE r18, medium): a TTL refresh racing register()
    * could observe the diskSourced flag before register cleared it and
    * overwrite the just-registered path with the stale persisted
    * value; and two interleaved merges of different catalog versions
    * could evict a name present in the newer snapshot. Reads (lookup
    * hits) stay lock-free on the ConcurrentHashMaps; only the
    * miss-path/TTL load and DDL contend — DDL-rate operations. */
  private val stateLock = new Object

  private val reg = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** How many times [[Resolution]] ran its full rewrite walk (i.e.
    * survived both bail-outs) — visible so tests can pin that plain
    * relational statements never pay for the graft rewrite. */
  private[graft] val resolutionWalks = new java.util.concurrent.atomic.AtomicLong

  /** Partition-count ceiling for dynamic `INSERT OVERWRITE`: past
    * this, the enumerated region disjunction stops being a predicate
    * the DNF pruner handles gracefully, and the statement is almost
    * certainly a full reload wearing the wrong syntax. */
  val DynamicOverwriteMaxPartitions = 1000

  /** Root directory `CREATE TABLE graft.<name>` resolves a table path
    * under when the statement names no LOCATION: `<warehouse>/<name>`.
    * Unset (the default), a LOCATION-less CREATE is refused loudly —
    * a manifest table IS a directory, so the path must come from
    * somewhere explicit. */
  @volatile var warehouse: Option[String] = None

  private def norm(name: String): String = name.toLowerCase(java.util.Locale.ROOT)

  def register(name: String, path: String): Unit = stateLock.synchronized {
    require(name.nonEmpty && !name.contains(".") && !name.contains("@"),
      s"table name '$name' must be a plain identifier (no '.' or '@' — " +
        "'@v<N>' is reserved for time travel)")
    // collision checks must see the durable state, fresher than the
    // TTL window allows — this is DDL, one listing is nothing
    maybeLoadPersisted(force = true)
    require(!viewReg.containsKey(norm(name)),
      s"table name '$name' collides with a registered view")
    // flag-clear BEFORE the map put (ADVICE r18) — with every merge
    // serialized under stateLock the order is belt-and-braces, but it
    // keeps the invariant local: a flagged entry is always the
    // persisted value, never a fresher local registration
    localName("t:", name) // registered HERE: never evicted by a refresh
    reg.put(norm(name), path)
    // the name is live (again): a hint left from an earlier rename
    // would outlive this registration's history and lie (ADVICE r15)
    localName("r:", name)
    renamedAway.remove(norm(name))
    publishCatalog(st => st.copy(
      tables = st.tables + (norm(name) -> path),
      renamed = st.renamed - norm(name)))
  }

  def unregister(name: String): Unit = stateLock.synchronized {
    localName("t:", name)
    reg.remove(norm(name))
    publishCatalog(st => st.copy(tables = st.tables - norm(name)))
  }

  def lookup(name: String): Option[String] = {
    // hits re-check the durable state at most once per TTL, so a
    // remote DROP/RENAME of a DISK-SOURCED name is observed without a
    // restart (r18). The contract is qualified (ADVICE r18): a name
    // registered BY THIS PROCESS is never evicted by a refresh —
    // in-memory wins, the restart-durability guarantee — so a remote
    // DROP of it stays invisible here until this process re-registers
    // or restarts. Exhausted listing races degrade to a stale read on
    // this path (maybeLoadPersisted throws only under force=DDL).
    maybeRefresh()
    Option(reg.get(norm(name))).orElse {
      // a fresh process resolves durably-cataloged names with zero
      // re-registering (r17): the miss-path loads <warehouse>/_catalog
      // once per TTL window and re-checks — a genuine miss stays a miss
      maybeLoadPersisted()
      Option(reg.get(norm(name)))
    }
  }

  // -------------------------------------------------------------------
  // SQL views (r16): name → the view's SQL text, session-scoped like
  // the table registry. A view is pure TEXT — it expands at analysis
  // into its (re-parsed) plan, so it always reads the CURRENT state of
  // every table it references; there is no materialization, no storage
  // and no versioning surface (the referenced tables carry those).
  // -------------------------------------------------------------------

  private val viewReg = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def registerView(name: String, sql: String): Unit = stateLock.synchronized {
    require(name.nonEmpty && !name.contains(".") && !name.contains("@"),
      s"view name '$name' must be a plain identifier")
    maybeLoadPersisted(force = true) // DDL: the collision check must
    require(lookup(name).isEmpty,    // see the freshest durable state
      s"view name '$name' collides with a registered table")
    localName("v:", name) // flag-clear before the put, as in register
    viewReg.put(norm(name), sql)
    publishCatalog(st => st.copy(views = st.views + (norm(name) -> sql)))
  }

  def unregisterView(name: String): Unit = stateLock.synchronized {
    localName("v:", name)
    viewReg.remove(norm(name))
    publishCatalog(st => st.copy(views = st.views - norm(name)))
  }

  def lookupView(name: String): Option[String] = {
    maybeRefresh()
    Option(viewReg.get(norm(name))).orElse {
      maybeLoadPersisted()
      Option(viewReg.get(norm(name)))
    }
  }

  def registeredViews: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    viewReg.asScala.toMap
  }

  /** A relation identifier that names a registered VIEW — same
    * namespace rules as tables (2-part `graft.<name>` or a bare
    * registered name); time-travel suffixes never match (a view has
    * no versions — its tables do). */
  private def viewParts(parts: Seq[String]): Option[String] = parts match {
    case Seq(ns, ident) if norm(ns) == "graft" &&
        viewReg.containsKey(norm(ident)) => Some(norm(ident))
    case Seq(ident) if viewReg.containsKey(norm(ident)) => Some(norm(ident))
    case _ => None
  }

  /** The view's plan, fully expanded: nested view references inline
    * recursively HERE (one rule firing, not one analyzer iteration
    * per level), so a definition cycle is a clean refusal instead of
    * a fixed-point blowup. Table references stay unresolved for the
    * ordinary machinery. */
  private def expandView(session: SparkSession, name: String,
                         seen: Set[String]): LogicalPlan = {
    require(!seen.contains(name),
      s"view graft.$name is cyclic — expansion chain: " +
        (seen + name).mkString(" -> "))
    val sql = Option(viewReg.get(name)).getOrElse(
      throw new IllegalArgumentException(s"no such view graft.$name"))
    val parsed = session.sessionState.sqlParser.parsePlan(sql)
    parsed.transformUpWithSubqueries {
      case u: UnresolvedRelation if viewParts(u.multipartIdentifier).isDefined =>
        val inner = viewParts(u.multipartIdentifier).get
        SubqueryAlias(inner, expandView(session, inner, seen + name))
    }
  }

  // where renamed names WENT — so a command aimed at a stale name can
  // say so instead of "no such table" (session-local, like `reg`)
  private val renamedAway =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** " — it was renamed to graft.<new>" when `name` was renamed away
    * in this session; empty otherwise. Appended to not-found errors. */
  private[graft] def hintRenamed(name: String): String =
    Option(renamedAway.get(norm(name)))
      .map(n => s" — it was renamed to graft.$n").getOrElse("")

  /** `ALTER TABLE graft.a RENAME TO graft.b` — metadata-only: the
    * NAME moves, the directory (and with it every version, the
    * history, the config sidecar, and time travel) stays put — the
    * external-table rename contract (Delta's path-based tables behave
    * the same). Atomic on the registry: the new name claims its slot
    * with putIfAbsent, so racing renames to one name leave exactly
    * one winner. */
  def renameRegistered(from: String, to: String): Unit =
      stateLock.synchronized {
    val f = norm(from); val t = norm(to)
    require(t.nonEmpty && !t.contains(".") && !t.contains("@"),
      s"RENAME TO '$to': the new name must be a plain identifier " +
        "(no '.' or '@' — '@v<N>' is reserved for time travel)")
    require(f != t, s"RENAME graft.$from: old and new names are the same")
    val path = Option(reg.get(f)).getOrElse(throw new IllegalArgumentException(
      s"ALTER TABLE graft.$from RENAME TO: no such registered table" +
        hintRenamed(from)))
    val prev = reg.putIfAbsent(t, path)
    require(prev == null,
      s"ALTER TABLE graft.$from RENAME TO graft.$to: the name is already " +
        s"registered to $prev")
    reg.remove(f, path)
    localName("t:", f); localName("t:", t) // both slots mutated HERE
    renamedAway.put(f, t)
    localName("r:", f)
    renamedAway.remove(t) // the name is live again; a stale hint would lie
    localName("r:", t)
    // chained renames stay transitive (ADVICE r15): after a→b then
    // b→c, the hint for `a` must point at LIVE c, not dead b
    renamedAway.replaceAll((_, dest) => if (dest == f) t else dest)
    publishCatalog { st =>
      val p = st.tables.getOrElse(f, path)
      st.copy(
        tables = st.tables - f + (t -> p),
        renamed = st.renamed.map { case (k, d) =>
          k -> (if (d == f) t else d) } + (f -> t) - t)
    }
  }

  // -------------------------------------------------------------------
  // Durable registry (r17): with a warehouse configured — the
  // [[warehouse]] var, or the session conf `spark.graft.warehouse` —
  // every registry mutation (CREATE/DROP/RENAME TABLE, CREATE/DROP
  // VIEW, and their programmatic faces above) also publishes the full
  // name→path / name→viewSQL state to `<warehouse>/_catalog/
  // v<NNNNNNNN>.json`, under the manifest publish primitive
  // (write-temp-then-link: readers never observe a torn file, exactly
  // one of any number of racing writers claims a version — losers
  // reload, re-apply their mutation, retry). A fresh process needs
  // only the warehouse location: the first lookup MISS loads the
  // latest catalog version and the whole name-addressed face — SQL,
  // TVFs, readTableStream, ManifestSink — resolves with zero
  // re-registering. Without a warehouse nothing is written and the
  // registry stays session-local, exactly as before.
  //
  // Scope and scale: the catalog is metadata-plane — one small JSON
  // file per DDL mutation, one directory listing per cold lookup
  // miss; the data path (manifests, parquet) is untouched. In-memory
  // entries win over loaded ones (putIfAbsent), so the durable state
  // restores names but never clobbers a live session's view of them;
  // cross-process LIVE sync (seeing another JVM's concurrent DROP) is
  // explicitly out of scope — restart durability is the contract.
  // -------------------------------------------------------------------

  private[graft] final case class CatState(
      tables: Map[String, String], views: Map[String, String],
      renamed: Map[String, String])
  private[graft] object CatState { val empty = CatState(Map(), Map(), Map()) }

  private val catMapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val CatFile = """v(\d{8})\.json""".r
  /** Keep this many published versions behind the head for concurrent
    * readers (a reader lists, then reads — retention must never delete
    * the version it just listed). */
  private val CatRetain = 20

  /** The effective warehouse root: the programmatic var, else the
    * active session's `spark.graft.warehouse` conf. */
  private[graft] def warehouseRoot: Option[String] =
    warehouse.orElse(SparkSession.getActiveSession.flatMap(s =>
      Option(s.conf.get("spark.graft.warehouse", null))))

  private def catalogDir(wh: String) =
    new org.apache.hadoop.fs.Path(wh.stripSuffix("/"), "_catalog")

  private def catalogFs(dir: org.apache.hadoop.fs.Path) =
    dir.getFileSystem(SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration()))

  private def latestCatVersion(f: org.apache.hadoop.fs.FileSystem,
                               dir: org.apache.hadoop.fs.Path): Int =
    try f.listStatus(dir).foldLeft(0) { (m, st) =>
      st.getPath.getName match {
        case CatFile(n) => math.max(m, n.toInt)
        case _ => m // crash debris (.tmp siblings) and strangers: ignored
      }
    } catch { case _: java.io.FileNotFoundException => 0 }

  private def catBytes(st: CatState): Array[Byte] = {
    val root = catMapper.createObjectNode()
    def put(field: String, m: Map[String, String]): Unit = {
      val n = root.putObject(field)
      m.toSeq.sortBy(_._1).foreach { case (k, v) => n.put(k, v) }
    }
    put("tables", st.tables); put("views", st.views); put("renamed", st.renamed)
    catMapper.writeValueAsBytes(root)
  }

  /** Parse failures are LOUD: an unreadable catalog version can only
    * be hand-tampering (publishes are atomic), and silently starting
    * empty would re-fragment the namespace. */
  private def readCatState(f: org.apache.hadoop.fs.FileSystem,
                           dir: org.apache.hadoop.fs.Path, v: Int): CatState = {
    val p = new org.apache.hadoop.fs.Path(dir, f"v$v%08d.json")
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val node = catMapper.readTree(text)
    import scala.jdk.CollectionConverters._
    def m(field: String): Map[String, String] =
      node.path(field).fields().asScala
        .map(kv => kv.getKey -> kv.getValue.asText()).toMap
    CatState(m("tables"), m("views"), m("renamed"))
  }

  /** Highest catalog version already merged into memory, per
    * warehouse — repeat loads against an unchanged catalog re-list
    * the directory but skip the read+merge. */
  private val loadedCatVersion =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Names merged FROM the durable state (keys prefixed "t:"/"v:"/
    * "r:" for tables/views/rename hints) rather than registered by
    * this process. The durable catalog OWNS these: a refresh that
    * finds one gone from (or retargeted in) the latest persisted
    * version evicts/updates it, so another process's DROP, RENAME, or
    * re-CREATE becomes visible here within [[refreshTtlMs]].
    * Locally-registered names are never evicted — in-memory wins,
    * exactly the restart-durability contract. */
  private val diskSourced =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def localName(prefix: String, name: String): Unit =
    diskSourced.remove(prefix + norm(name))

  /** Staleness bound for observing OTHER processes' catalog mutations
    * (r18, cross-process sync + the listing-cost advisory): the
    * `_catalog` directory is listed at most once per TTL window —
    * lookups inside the window are pure memory ops (r17 listed on
    * EVERY miss, so each unresolved bare name in an analysis pass
    * paid a FS listing) — and a lookup after the window re-lists, so
    * a remote CREATE/DROP/RENAME is visible within the TTL without
    * resetRegistry. `<= 0` restores the r17 list-per-miss behavior
    * (no staleness window, no memo, no hit-path refresh). */
  @volatile var refreshTtlMs: Long = 30000L
  @volatile private var lastLoadNanos = 0L

  private def ttlFresh(): Boolean = {
    val ttl = refreshTtlMs
    ttl > 0 && lastLoadNanos != 0L &&
      System.nanoTime() - lastLoadNanos < ttl * 1000000L
  }

  /** Hit-path staleness check: one volatile read + clock compare when
    * fresh; zero work when no durable state was ever loaded (a
    * process without a warehouse never pays anything here). */
  private def maybeRefresh(): Unit = {
    val ttl = refreshTtlMs
    if (ttl > 0 && lastLoadNanos != 0L &&
        System.nanoTime() - lastLoadNanos >= ttl * 1000000L)
      maybeLoadPersisted()
  }

  /** Merge a persisted catalog snapshot into the in-memory registry.
    * putIfAbsent — in-memory entries win; newly-inserted names are
    * marked disk-sourced. `evict`: disk-sourced names absent from the
    * snapshot are dropped and disk-sourced names whose persisted
    * value changed are updated (the snapshot is the FULL persisted
    * state, so absence means a remote DROP). */
  private def mergeState(st: CatState, evict: Boolean): Unit = {
    def mergeMap(prefix: String, m: Map[String, String],
        into: java.util.concurrent.ConcurrentHashMap[String, String]): Unit = {
      m.foreach { case (n, v) =>
        if (into.putIfAbsent(n, v) == null) diskSourced.add(prefix + n)
        else if (diskSourced.contains(prefix + n)) into.put(n, v)
      }
      if (evict) {
        import scala.jdk.CollectionConverters._
        diskSourced.asScala.toSeq.foreach { k =>
          if (k.startsWith(prefix) && !m.contains(k.stripPrefix(prefix))) {
            into.remove(k.stripPrefix(prefix)); diskSourced.remove(k)
          }
        }
      }
    }
    mergeMap("t:", st.tables, reg)
    mergeMap("v:", st.views, viewReg)
    mergeMap("r:", st.renamed, renamedAway)
  }

  /** Merge the latest persisted catalog into the in-memory registry.
    * No-op without a warehouse; inside the TTL window the listing is
    * skipped too unless `force` (DDL collision checks force — they
    * must judge against the freshest durable state). A
    * FileNotFoundException between listing and read is the retention
    * race (>= CatRetain publishes landed in the gap and deleted the
    * listed head) — re-list and retry instead of surfacing it
    * (ADVICE r17). */
  private[graft] def maybeLoadPersisted(force: Boolean = false): Unit =
    warehouseRoot.foreach { wh =>
      if (force || !ttlFresh()) stateLock.synchronized {
        // re-check under the lock: a queued waiter whose predecessor
        // just loaded must not re-list the directory
        if (force || !ttlFresh()) {
        val dir = catalogDir(wh)
        val f = catalogFs(dir)
        var attempt = 0
        var done = false
        while (!done && attempt < 5) {
          attempt += 1
          try {
            val latest = latestCatVersion(f, dir)
            if (latest > 0 &&
                !Option(loadedCatVersion.get(wh)).exists(_ >= latest)) {
              mergeState(readCatState(f, dir, latest), evict = true)
              loadedCatVersion.put(wh, latest)
            }
            lastLoadNanos = System.nanoTime()
            done = true
          } catch { case _: java.io.FileNotFoundException => () }
        }
        // 5 straight listed-then-deleted races: DDL (force) must judge
        // against fresh durable state and fails loudly; a READ path
        // (lookup miss / TTL refresh) degrades to the in-memory view —
        // a stale read beats throwing from lookup() (ADVICE r18), and
        // lastLoadNanos stays unset so the next lookup retries
        if (!done && force) throw new IllegalStateException(
          s"catalog under $wh: 5 straight listed-then-deleted races")
        }
      }
    }

  /** The raw CAS publish: read the LATEST persisted state, apply
    * `op`, claim head+1 exclusively — the manifest commit loop in
    * miniature. A lost race reloads and re-applies, so concurrent
    * mutations from many processes all land; an op that changes
    * nothing (unregistering a name that was never persisted — every
    * test teardown) writes nothing and returns None. Touches NO
    * in-memory state — specs use it to simulate another process's
    * DDL. Returns (warehouse, published version, published state). */
  private[graft] def publishRaw(
      op: CatState => CatState): Option[(String, Int, CatState)] =
    warehouseRoot.flatMap { wh =>
      val dir = catalogDir(wh)
      val f = catalogFs(dir)
      f.mkdirs(dir)
      var attempt = 0
      while (attempt < 50) {
        attempt += 1
        val latest = latestCatVersion(f, dir)
        // null = the retention race (the listed head was deleted
        // under us — ADVICE r17): fall through and re-list
        val cur: CatState =
          try { if (latest == 0) CatState.empty else readCatState(f, dir, latest) }
          catch { case _: java.io.FileNotFoundException => null }
        if (cur != null) {
          val next = op(cur)
          if (next == cur) return None
          val target = new org.apache.hadoop.fs.Path(dir, f"v${latest + 1}%08d.json")
          if (ManifestTable.createExclusive(f, target, catBytes(next))) {
            // best-effort retention: tiny files, but unbounded growth
            // is unbounded growth — keep a window for in-flight readers
            if (latest + 1 > CatRetain) try {
              f.listStatus(dir).foreach(s => s.getPath.getName match {
                case CatFile(n) if n.toInt <= latest + 1 - CatRetain =>
                  f.delete(s.getPath, false)
                case _ => ()
              })
            } catch { case _: Exception => () }
            return Some((wh, latest + 1, next))
          }
        }
      }
      throw new IllegalStateException(
        s"catalog publish under $wh lost 50 straight races — giving up")
    }

  /** Publish `op` as the next catalog version AND merge the published
    * snapshot into memory. The merge is load-bearing (ADVICE r17,
    * medium): without it, a fresh process whose FIRST catalog op is an
    * unregister would set loadedCatVersion past the durable state
    * without ever loading it — every later lookup miss sees
    * latest == loaded, skips the load, and all remaining durable
    * names stay unresolvable for the life of the JVM. */
  private def publishCatalog(op: CatState => CatState): Unit =
    publishRaw(op).foreach { case (wh, v, next) =>
      stateLock.synchronized { // merges are serialized (ADVICE r18)
        mergeState(next, evict = true)
        loadedCatVersion.put(wh, v)
        lastLoadNanos = System.nanoTime()
      }
    }

  /** Forget ALL in-memory registry state (tables, views, rename
    * hints, the warehouse root, and load memos) — the process-death
    * simulation the durability drills restart from. Persisted state
    * on disk is untouched; data is never touched. */
  def resetRegistry(): Unit = stateLock.synchronized {
    reg.clear(); viewReg.clear(); renamedAway.clear()
    loadedCatVersion.clear(); warehouse = None
    diskSourced.clear(); lastLoadNanos = 0L
  }

  def registered: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    reg.asScala.toMap
  }

  /** `name` or `name@v<N>` → (path, version); -1 = head. */
  private def resolveSpec(ident: String): Option[(String, Int)] = {
    val at = ident.lastIndexOf("@v")
    // toIntOption, not toInt: a version literal past Int.MaxValue must
    // fall through as an ordinary unresolved name (the standard
    // table-not-found error), never throw NumberFormatException out of
    // an analyzer rule and abort the whole statement
    val parsed =
      if (at > 0 && ident.length > at + 2 &&
          ident.substring(at + 2).forall(_.isDigit))
        ident.substring(at + 2).toIntOption.map(v =>
          (ident.substring(0, at), v))
      else None
    val (name, v) = parsed.getOrElse((ident, -1))
    lookup(name).map(_ -> v)
  }

  private def specOf(u: UnresolvedRelation): Option[(String, Int)] =
    partsSpec(u.multipartIdentifier)

  private def partsSpec(parts: Seq[String]): Option[(String, Int)] =
    parts match {
      case Seq(ns, ident) if norm(ns) == "graft" => resolveSpec(ident)
      case Seq(ident) => resolveSpec(ident)
      case _ => None
    }

  /** An ALTER target: registered name → table path, with time-travel
    * suffixes refused (DDL mutates the HEAD only). */
  private def alterSpec(u: UnresolvedTable, what: String): Option[String] =
    partsSpec(u.multipartIdentifier).map { case (path, v) =>
      require(v < 0,
        s"cannot $what time-travel version v$v of " +
          s"${u.multipartIdentifier.mkString(".")} — snapshots are immutable")
      path
    }

  /** A CREATE/DROP target: exactly `graft.<name>` (bare names are NOT
    * claimed — `CREATE TABLE t` belongs to the session catalog). */
  private def graftIdent(parts: Seq[String]): Option[String] = parts match {
    case Seq(ns, ident) if norm(ns) == "graft" && !ident.contains("@") =>
      Some(ident)
    case _ => None
  }

  /** A DDL statement's name child → the graft table name, matched in
    * BOTH analysis states: the builtin ResolveIdentifier may beat the
    * injected rule to the node and resolve `graft.<name>` against the
    * session catalog (where `graft` reads as a database that will fail
    * at execution) — claim that form too. */
  private def ddlIdent(name: LogicalPlan): Option[String] = name match {
    case u: UnresolvedIdentifier => graftIdent(u.nameParts)
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedView =>
      graftIdent(u.multipartIdentifier)
    case u: UnresolvedTable => graftIdent(u.multipartIdentifier)
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
      graftIdent(u.multipartIdentifier)
    case r: org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier =>
      graftIdent(r.identifier.namespace.toSeq :+ r.identifier.name)
    case _ => None
  }

  /** One PARTITIONED BY transform → the `partitionBy` spelling
    * [[ManifestTable.commit]] parses (`days(c)` / `bucket(n, c)` /
    * `truncate(w, c)` / plain identity columns). */
  private def transformSpelling(t: Transform, ident: String): String = {
    val refs = t.references
    require(refs.length == 1 && refs.head.fieldNames.length == 1,
      s"PARTITIONED BY on $ident: each transform must reference exactly " +
        s"one top-level column, got $t")
    val c = refs.head.fieldNames.head
    val lits = t.arguments.toSeq.collect { case l: V2Literal[_] => l.value.toString }
    t.name match {
      case "identity" => c
      case n @ ("years" | "months" | "days" | "hours") => s"$n($c)"
      case n @ ("bucket" | "truncate") =>
        require(lits.length == 1,
          s"PARTITIONED BY on $ident: $n takes one literal and one column")
        s"$n(${lits.head}, $c)"
      case other => throw new IllegalArgumentException(
        s"PARTITIONED BY on $ident: unsupported transform '$other' — " +
          "supported: identity columns, years/months/days/hours(c), " +
          "bucket(n, c), truncate(w, c)")
    }
  }

  /** Split a CREATE/REPLACE transform list into (CLUSTER BY columns,
    * real partitioning transforms) — `CLUSTER BY (a[, b])` arrives as
    * Spark's ClusterByTransform riding the partitioning list (r16).
    * Clustering and partitioning don't combine (one physical layout
    * per table — the Delta liquid-clustering rule), and the dimension
    * cap matches OPTIMIZE ZORDER's (more interleave dilutes every
    * dimension). */
  private def clusterSplit(ident: String, transforms: Seq[Transform])
      : (Seq[String], Seq[Transform]) = {
    val (ct, rest) = transforms.partition(_.isInstanceOf[
      org.apache.spark.sql.connector.expressions.ClusterByTransform])
    val cols: Seq[String] = ct.headOption.map(
      _.asInstanceOf[org.apache.spark.sql.connector.expressions.ClusterByTransform]
        .columnNames.map { r =>
          require(r.fieldNames.length == 1,
            s"CLUSTER BY on $ident takes top-level columns, got " +
              r.fieldNames.mkString("."))
          r.fieldNames.head
        }).getOrElse(Nil)
    require(cols.isEmpty || rest.isEmpty,
      s"$ident: CLUSTER BY and PARTITIONED BY do not combine — cluster " +
        "the flat table (OPTIMIZE re-clusters it) or partition it, not both")
    require(cols.size <= 2,
      s"$ident: CLUSTER BY interleaves at most 2 dimensions " +
        s"(got ${cols.mkString(", ")}) — more dims dilute every " +
        "dimension's clustering; pick the 2 most selective")
    require(cols.map(norm).distinct.size == cols.size,
      s"$ident: duplicate CLUSTER BY column")
    (cols, rest)
  }

  /** The table-config properties a CREATE may record. */
  private val SupportedProps = Set("graft.statsColumns")

  /** Validate a CREATE's table spec down to what the engine records:
    * (location, config props, CHECK constraints). Everything the
    * manifest table cannot honor is refused loudly — a silently
    * dropped clause is a lie about the table. Handles BOTH spec
    * states: the DDL rule runs pre-resolution (see [[DdlResolution]]),
    * where the parser's UnresolvedTableSpec still holds constraints as
    * expression trees; the resolved TableSpec form is kept for
    * completeness. */
  /** Column-definition discipline shared by CREATE and REPLACE.
    * DEFAULT / GENERATED ALWAYS AS (expr) / GENERATED … AS IDENTITY
    * clauses (r16) are validated here and recorded as field metadata
    * in the table's versioned schema (see [[ColumnSpecs]]); NOT NULL
    * is refused rather than recorded-but-unenforced (CHECK is the
    * enforced spelling). Generated expressions validate against the
    * full declared column set, so order of declaration doesn't
    * matter — but they may only REFERENCE plain or DEFAULT-bearing
    * columns (a generated-over-generated chain would need a
    * topological write order nobody can read back from the DDL). */
  private def v1Fields(what: String, ident: String,
      cols: Seq[org.apache.spark.sql.catalyst.plans.logical.ColumnDefinition],
      session: SparkSession)
      : Seq[org.apache.spark.sql.types.StructField] = {
    val bare = cols.map { c =>
      require(c.nullable,
        s"$what $ident: NOT NULL on column '${c.name}' is " +
          "not enforced — declare CONSTRAINT <name> CHECK " +
          s"(${c.name} IS NOT NULL) instead (CHECKs are enforced " +
          "on every write)")
      var f = c.toV1Column
      c.defaultValue.foreach { d =>
        ColumnSpecs.validateDefault(session, s"$what $ident", c.name,
          c.dataType, d.originalSQL)
        f = ColumnSpecs.withDefault(f, d.originalSQL)
      }
      c.identityColumnSpec.foreach { is =>
        ColumnSpecs.validateIdentity(s"$what $ident", c.name, c.dataType,
          is.getStep)
        f = ColumnSpecs.withIdentity(f, is.getStart, is.getStep,
          is.isAllowExplicitInsert)
      }
      c.generationExpression.foreach { g =>
        f = ColumnSpecs.withGenerated(f, g)
      }
      f
    }
    // generated expressions validate against the final sibling set
    // (with every sibling's own spec already attached, so a reference
    // to another GENERATED or IDENTITY column refuses)
    cols.zip(bare).foreach { case (c, f) =>
      c.generationExpression.foreach(g =>
        ColumnSpecs.validateGenerated(session, s"$what $ident", c.name,
          c.dataType, g, bare))
    }
    bare
  }

  private def createSpec(ident: String, spec: TableSpecBase)
      : (Option[String], Map[String, String], Seq[(String, String)]) = {
    def common(properties: Map[String, String], provider: Option[String],
               optionsEmpty: Boolean, location: Option[String],
               comment: Option[String], collation: Option[String],
               hasSerde: Boolean, cons: Seq[(String, String)]) = {
      provider.foreach(p => require(norm(p) == "graft",
        s"CREATE TABLE $ident: USING $p is unsupported — manifest tables " +
          "have one storage format (USING graft, or omit the clause)"))
      require(optionsEmpty,
        s"CREATE TABLE $ident: OPTIONS are unsupported")
      require(!hasSerde,
        s"CREATE TABLE $ident: ROW FORMAT/SERDE clauses are unsupported")
      require(collation.isEmpty,
        s"CREATE TABLE $ident: DEFAULT COLLATION is unsupported")
      val unknown = properties.keySet -- SupportedProps
      require(unknown.isEmpty,
        s"CREATE TABLE $ident: unsupported TBLPROPERTIES ${unknown.mkString(", ")} " +
          s"— supported: ${SupportedProps.mkString(", ")}")
      require(cons.map(_._1).distinct.length == cons.length,
        s"CREATE TABLE $ident: duplicate constraint names")
      (location, properties ++ comment.map("comment" -> _), cons)
    }
    spec match {
      case u: UnresolvedTableSpec =>
        common(u.properties, u.provider, u.optionExpression.options.isEmpty,
          u.location, u.comment, u.collation, u.serde.isDefined,
          u.constraints.map {
            case c: CheckConstraint => c.name -> c.condition
            case other => throw new IllegalArgumentException(
              s"CREATE TABLE $ident: only CHECK constraints are enforced — " +
                s"got ${other.sql}")
          })
      case t: TableSpec =>
        common(t.properties, t.provider, t.options.isEmpty, t.location,
          t.comment, t.collation, t.serde.isDefined,
          t.constraints.map {
            case c: Check => c.name -> c.predicateSql
            case other: Constraint => throw new IllegalArgumentException(
              s"CREATE TABLE $ident: only CHECK constraints are enforced — " +
                s"got ${other.toDDL}")
          })
      case other => throw new IllegalArgumentException(
        s"CREATE TABLE $ident: unsupported table spec $other")
    }
  }

  /** The analyzer rule (injected by GraftExtensions): rewrites
    * still-unresolved `graft.<name>` (and bare `<name>`, when
    * registered) relations into the manifest read's analyzed plan, and
    * `INSERT INTO graft.<name>` statements into [[InsertCommand]] —
    * the write-side twin, r12. Two passes on purpose: the INSERT
    * rewrite must claim its target relation BEFORE the read rewrite
    * would turn it into a (non-insertable) scan plan. */
  /** Could ANY node of an analysis-in-progress plan be claimed by
    * [[Resolution]]? A cheap instanceof-and-lookup test, mirrored
    * 1:1 from the rule's own match arms (no false negatives): a node
    * the pre-scan rejects is one the full walk would leave untouched.
    * Used as the rule's bail-out — [[Resolution]] runs in the
    * fixed-point Resolution batch, so without it every ITERATION of
    * every statement in an extensions session pays the
    * `resolveOperatorsUp` machinery twice for a feature most
    * statements never use (r13 verdict watch item — the DdlResolution
    * root-test discipline, extended to a rule whose claims can sit
    * anywhere in the tree). */
  private def claims(p: LogicalPlan): Boolean = {
    def rel(t: LogicalPlan): Option[UnresolvedRelation] = t match {
      case SubqueryAlias(_, u: UnresolvedRelation) => Some(u)
      case u: UnresolvedRelation => Some(u)
      case _ => None
    }
    p match {
      case i: InsertIntoStatement => i.table match {
        case u: UnresolvedRelation => specOf(u).isDefined ||
          viewParts(u.multipartIdentifier).isDefined
        case _ => false
      }
      case d: DeleteFromTable => rel(d.table).exists(u =>
        specOf(u).isDefined || viewParts(u.multipartIdentifier).isDefined)
      case t: org.apache.spark.sql.catalyst.plans.logical.TruncateTable =>
        t.table match {
          case u: UnresolvedTable => partsSpec(u.multipartIdentifier).isDefined
          case _ => false
        }
      case t: org.apache.spark.sql.catalyst.plans.logical.TruncatePartition =>
        t.table match {
          case u: UnresolvedTable => partsSpec(u.multipartIdentifier).isDefined
          case _ => false
        }
      case up: UpdateTable => rel(up.table).exists(u =>
        specOf(u).isDefined || viewParts(u.multipartIdentifier).isDefined)
      case m: MergeIntoTable => rel(m.targetTable).exists(u =>
        specOf(u).isDefined || viewParts(u.multipartIdentifier).isDefined)
      case a: org.apache.spark.sql.catalyst.plans.logical.AlterTableCommand =>
        a.table match {
          case u: UnresolvedTable => partsSpec(u.multipartIdentifier).isDefined
          case _ => false
        }
      case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel =>
        tt.relation match {
          case u: UnresolvedRelation => specOf(u).isDefined
          case _ => false
        }
      case u: UnresolvedRelation => !u.isStreaming &&
        (specOf(u).isDefined || viewParts(u.multipartIdentifier).isDefined)
      case _ => false
    }
  }

  final class Resolution(session: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      // bail-outs, cheapest first: an empty registry can resolve
      // NOTHING (O(1)), and a plan with no claimable node needs no
      // rewrite (one instanceof walk instead of two full
      // resolveOperatorsUp passes per analyzer iteration)
      if (reg.isEmpty && viewReg.isEmpty) {
        // a FRESH process with a durable catalog reaches here with
        // empty registries only because nothing loaded yet (r17):
        // one load attempt, then bail if still genuinely empty
        if (warehouseRoot.isEmpty) return plan
        maybeLoadPersisted()
        if (reg.isEmpty && viewReg.isEmpty) return plan
      }
      if (!plan.exists(claims)) return plan
      resolutionWalks.incrementAndGet() // test observability only
      val withWrites = plan.resolveOperatorsUp {
        case i @ InsertIntoStatement(u: UnresolvedRelation, partSpec,
            userCols, query, overwrite, ifPartNotExists, byName) =>
          specOf(u) match {
            case Some((path, v)) =>
              val ident = u.multipartIdentifier.mkString(".")
              require(v < 0,
                s"cannot INSERT into time-travel version v$v of $ident — " +
                  "snapshots are immutable")
              // static PARTITION clauses (r15): `PARTITION (p = 'x')`
              // names identity partition columns; values are injected
              // as typed literals and, under OVERWRITE, spell the
              // replaced region. `PARTITION (p)` (dynamic mention) is
              // declaration only — the query carries the column.
              require(!ifPartNotExists,
                s"INSERT … PARTITION … IF NOT EXISTS on $ident is " +
                  "unsupported — spell the existence check explicitly")
              InsertCommand(ident, path,
                query, overwrite, userCols, byName, partSpec)
            case None =>
              viewParts(u.multipartIdentifier).foreach(v =>
                throw new IllegalArgumentException(
                  s"cannot INSERT into view graft.$v — views are " +
                    "read-only; write to the tables they read"))
              i
          }
        case d @ DeleteFromTable(tgtPlan, condition) =>
          // unwrap `DELETE FROM graft.<name> [AS t]`
          val (delAlias, delRel) = tgtPlan match {
            case SubqueryAlias(id, u: UnresolvedRelation) => (Some(id.name), Some(u))
            case u: UnresolvedRelation => (None, Some(u))
            case _ => (None, None)
          }
          delRel.flatMap(specOf) match {
            case Some((path, v)) =>
              val u = delRel.get
              require(v < 0,
                s"cannot DELETE from time-travel version v$v of " +
                  s"${u.multipartIdentifier.mkString(".")} — snapshots are immutable")
              // strip target qualifiers: the condition resolves against
              // the bare table frame at run time (see UPDATE below)
              val quals: Set[Seq[String]] =
                delAlias.map(a => Seq(norm(a))).toSet +
                  u.multipartIdentifier.takeRight(1).map(norm) +
                  u.multipartIdentifier.map(norm)
              val cond = condition.transformUp {
                case ua: UnresolvedAttribute if ua.nameParts.length > 1 &&
                    quals.contains(ua.nameParts.init.map(norm)) =>
                  UnresolvedAttribute(Seq(ua.nameParts.last))
              }
              DeleteCommand(u.multipartIdentifier.mkString("."), path,
                ColumnBridge.column(cond))
            case None =>
              delRel.flatMap(r => viewParts(r.multipartIdentifier)).foreach(v =>
                throw new IllegalArgumentException(
                  s"cannot DELETE from view graft.$v — views are " +
                    "read-only; write to the tables they read"))
              d
          }
        // TRUNCATE TABLE graft.<name> — the versioned-table semantics:
        // a new version with ZERO files, metadata-only (ADVICE r14 —
        // no data read, no survivor scan), history and time travel
        // intact; Hive's partition-spec form refuses with the
        // predicate spelling
        case tr @ org.apache.spark.sql.catalyst.plans.logical
            .TruncateTable(u: UnresolvedTable) =>
          alterSpec(u, "TRUNCATE") match {
            case Some(path) =>
              TruncateCommand(u.multipartIdentifier.mkString("."), path)
            case None => tr
          }
        case tp @ org.apache.spark.sql.catalyst.plans.logical
            .TruncatePartition(u: UnresolvedTable, _) =>
          alterSpec(u, "TRUNCATE") match {
            case Some(_) => throw new IllegalArgumentException(
              s"TRUNCATE … PARTITION on " +
                s"${u.multipartIdentifier.mkString(".")}: partition-spec " +
                "truncation is Hive's spelling — use DELETE FROM " +
                "graft.<name> WHERE <partition predicate> (stats-pruned " +
                "to the partition's files, same cost)")
            case None => tp
          }
        case up @ UpdateTable(tgtPlan, assignments, condition) =>
          // unwrap `UPDATE graft.<name> [AS t]`
          val (updAlias, updRel) = tgtPlan match {
            case SubqueryAlias(id, u: UnresolvedRelation) => (Some(id.name), Some(u))
            case u: UnresolvedRelation => (None, Some(u))
            case _ => (None, None)
          }
          updRel.flatMap(specOf) match {
            case Some((path, v)) =>
              val u = updRel.get
              val ident = u.multipartIdentifier.mkString(".")
              require(v < 0,
                s"cannot UPDATE time-travel version v$v of $ident — " +
                  "snapshots are immutable")
              // qualifiers a SET target may carry: the alias, the bare
              // table name, or the full graft-qualified name — all
              // standard SQL spellings of the same target (ADVICE r12)
              val quals: Set[Seq[String]] =
                updAlias.map(a => Seq(norm(a))).toSet +
                  u.multipartIdentifier.takeRight(1).map(norm) +
                  u.multipartIdentifier.map(norm)
              // conditions and assignment values resolve against the
              // bare table frame at run time, which knows nothing of
              // the statement's alias — strip target qualifiers here
              def unqualify(e: Expression): Expression = e.transformUp {
                case ua: UnresolvedAttribute if ua.nameParts.length > 1 &&
                    quals.contains(ua.nameParts.init.map(norm)) =>
                  UnresolvedAttribute(Seq(ua.nameParts.last))
              }
              val pairs = assignments.map { a =>
                val name = a.key match {
                  case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
                    ua.nameParts.head
                  // `SET t.c = …`: strip a qualifier naming the target
                  // table/alias; anything else (a genuinely nested
                  // struct path, a foreign qualifier) must not
                  // silently assign to the column its LAST part names
                  case ua: UnresolvedAttribute
                      if quals.contains(ua.nameParts.init.map(norm)) =>
                    ua.nameParts.last
                  case other => throw new IllegalArgumentException(
                    s"UPDATE on $ident can only assign whole top-level " +
                      s"columns (optionally qualified by the target " +
                      s"table or its alias), not '${other.sql}'")
                }
                name -> ColumnBridge.column(unqualify(a.value))
              }
              // GENERATED/IDENTITY discipline (r16): a generated
              // column is never assigned directly — it RECOMPUTES over
              // the post-assignment row (assignment expressions
              // substituted into the generation expression, so SQL's
              // pre-image RHS semantics still hold), and an update of
              // a source column can never leave a stale derived value.
              // ALWAYS-identity columns are unassignable.
              val recSchema = ManifestTable.snapshotSchema(session, path)
              // ANSI `SET c = DEFAULT` (r16): the bare keyword (an
              // unresolvable single-part reference — unless a real
              // column spells that name) substitutes the recorded
              // DEFAULT expression; a column without one refuses
              val hasDefaultCol = recSchema.exists(_.fields.exists(f =>
                norm(f.name) == "default"))
              val pairs2 = pairs.map { case (n, c) =>
                ColumnBridge.expression(c) match {
                  case ua: UnresolvedAttribute if !hasDefaultCol &&
                      ua.nameParts.length == 1 &&
                      norm(ua.nameParts.head) == "default" =>
                    val f = recSchema.flatMap(_.fields.find(x =>
                        norm(x.name) == norm(n)))
                      .getOrElse(throw new IllegalArgumentException(
                        s"UPDATE on $ident: SET $n = DEFAULT — no such " +
                          "recorded column"))
                    ColumnSpecs.defaultOf(f) match {
                      case Some(d) =>
                        n -> ColumnSpecs.defaultColumn(session, d, f.dataType)
                      case None => throw new IllegalArgumentException(
                        s"UPDATE on $ident: SET ${f.name} = DEFAULT — the " +
                          "column records no DEFAULT")
                    }
                  case _ => (n, c)
                }
              }
              val assignedN = pairs2.map(p => norm(p._1)).toSet
              val assignExpr: Map[String, Expression] = pairs2.map(p =>
                norm(p._1) -> ColumnBridge.expression(p._2)).toMap
              val genRecompute: Seq[(String, Column)] =
                recSchema.toSeq.flatMap(_.fields.toSeq).flatMap { f =>
                  ColumnSpecs.identityOf(f).foreach { is =>
                    require(is.byDefault || !assignedN(norm(f.name)),
                      s"UPDATE on $ident: '${f.name}' is GENERATED ALWAYS " +
                        "AS IDENTITY — it cannot be assigned")
                  }
                  ColumnSpecs.generatedOf(f).map { sql =>
                    require(!assignedN(norm(f.name)),
                      s"UPDATE on $ident: '${f.name}' is GENERATED ALWAYS " +
                        s"AS ($sql) — it recomputes from its expression, " +
                        "assign its source columns instead")
                    val post = session.sessionState.sqlParser
                      .parseExpression(sql).transformUp {
                        case ua: UnresolvedAttribute
                            if ua.nameParts.length == 1 &&
                              assignExpr.contains(norm(ua.nameParts.head)) =>
                          assignExpr(norm(ua.nameParts.head))
                      }
                    f.name -> ColumnBridge.column(
                      org.apache.spark.sql.catalyst.expressions.Cast(post,
                        f.dataType,
                        Option(session.sessionState.conf.sessionLocalTimeZone),
                        org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI))
                  }
                }
              UpdateCommand(ident, path,
                pairs2 ++ genRecompute,
                condition.map(c => ColumnBridge.column(unqualify(c))))
            case None =>
              updRel.flatMap(r => viewParts(r.multipartIdentifier)).foreach(v =>
                throw new IllegalArgumentException(
                  s"cannot UPDATE view graft.$v — views are read-only; " +
                    "write to the tables they read"))
              up
          }
        case m @ MergeIntoTable(tgtPlan, srcPlan, onCond,
            matchedActs, notMatchedActs, notMatchedBySrc, withEvolution) =>
          // unwrap `MERGE INTO graft.<name> [AS t]`
          val (tgtAlias, tgtRel) = tgtPlan match {
            case SubqueryAlias(id, u: UnresolvedRelation) => (Some(id.name), Some(u))
            case u: UnresolvedRelation => (None, Some(u))
            case _ => (None, None)
          }
          tgtRel.flatMap(specOf) match {
            case Some((path, v)) =>
              val u = tgtRel.get
              val ident = u.multipartIdentifier.mkString(".")
              require(v < 0,
                s"cannot MERGE into time-travel version v$v of $ident — " +
                  "snapshots are immutable")
              val srcAlias = srcPlan match {
                case SubqueryAlias(id, _) => Some(id.name)
                case _ => None
              }
              // qualifier sets for condition rewriting: target columns
              // surface unqualified in the merge frame, source columns
              // through the `_src` struct
              val tgtQ = (tgtAlias.toSeq ++ u.multipartIdentifier.lastOption)
                .map(norm).toSet
              val srcQ = srcAlias.map(norm).toSet
              // the target's recorded columns, for classifying BARE
              // references: one that names no target column can only
              // mean a source column, which the merge frame holds
              // under `_src` — an unqualified spelling would fail at
              // run time with a missing-column error instead of this
              // analysis-time message (ADVICE r12)
              lazy val tgtCols: Set[String] =
                (ManifestTable.snapshotSchema(session, path)
                  .map(_.fieldNames.toSeq).getOrElse(Nil) ++
                  ManifestTable.partitionColumns(session, path))
                  .map(norm).toSet
              def rewrite(e: Expression): Expression = e.transformUp {
                case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
                  require(tgtCols.contains(norm(ua.nameParts.head)),
                    s"MERGE on $ident: '${ua.nameParts.head}' is not a " +
                      "target column — qualify source columns with the " +
                      "source alias")
                  ua
                case ua: UnresolvedAttribute if ua.nameParts.length == 2 =>
                  val q = norm(ua.nameParts.head)
                  if (srcQ.contains(q))
                    UnresolvedAttribute(Seq("_src", ua.nameParts(1)))
                  else if (tgtQ.contains(q))
                    UnresolvedAttribute(Seq(ua.nameParts(1)))
                  else throw new IllegalArgumentException(
                    s"MERGE on $ident: qualifier '${ua.nameParts.head}' is " +
                      "neither the target nor the source alias " +
                      s"(${(tgtQ ++ srcQ).toSeq.sorted.mkString(", ")})")
                case ua: UnresolvedAttribute if ua.nameParts.length > 2 =>
                  throw new IllegalArgumentException(
                    s"MERGE on $ident: '${ua.sql}' — clause conditions take " +
                      "alias-qualified column references only, not nested " +
                      "fields or multi-part table names")
              }
              // ON: a conjunction of key equalities. Each conjunct is
              // either target=source of the SAME name (the by-name
              // fast path — envelope and pruning run on the raw
              // column) or target-column = EXPRESSION-over-source
              // (the key-mapped CDC idiom, r14 verdict ask #3:
              // `ON t.k = s.k + 1`). A mapped key REPLACES the source
              // frame's column of that name BEFORE the merge runs, so
              // the key envelope, pass-0/1 file pruning, and the
              // lost-race conflict scan all see the EVALUATED key
              // values — the reconcile validity argument needs those,
              // not the raw source column. Consequently `_src.<k>` in
              // clause conditions and SET * both observe the MAPPED
              // value, which is exactly what keeps SET * from moving
              // a matched row out of its own key.
              def conjuncts(e: Expression): Seq[Expression] = e match {
                case And(l, r) => conjuncts(l) ++ conjuncts(r)
                case x => Seq(x)
              }
              // the expression side of a mapped key evaluates against
              // the RAW source frame: source-alias qualifiers strip,
              // bare names ride through (they resolve on the source at
              // run time), target qualifiers refuse — the target side
              // of the equality is the single bare key column
              def srcExpr(e: Expression): Expression = e.transformUp {
                case ua: UnresolvedAttribute if ua.nameParts.length == 2 =>
                  val q = norm(ua.nameParts.head)
                  if (srcQ.contains(q)) UnresolvedAttribute(Seq(ua.nameParts(1)))
                  else if (tgtQ.contains(q)) throw new IllegalArgumentException(
                    s"MERGE on $ident: the expression side of an ON key " +
                      "equality can only reference SOURCE columns (one side " +
                      s"must be a plain target column), got '${ua.sql}'")
                  else throw new IllegalArgumentException(
                    s"MERGE on $ident: qualifier '${ua.nameParts.head}' is " +
                      "neither the target nor the source alias " +
                      s"(${(tgtQ ++ srcQ).toSeq.sorted.mkString(", ")})")
                case ua: UnresolvedAttribute if ua.nameParts.length > 2 =>
                  throw new IllegalArgumentException(
                    s"MERGE on $ident: '${ua.sql}' — ON key expressions take " +
                      "alias-qualified column references only")
              }
              def asTargetKey(e: Expression): Option[String] = e match {
                case ua: UnresolvedAttribute => ua.nameParts match {
                  case Seq(n) if tgtCols.contains(norm(n)) => Some(n)
                  case Seq(q, n) if tgtQ.contains(norm(q)) => Some(n)
                  case _ => None
                }
                case _ => None
              }
              val keyPairs: Seq[(String, Option[Column])] =
                conjuncts(onCond).map {
                  case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute)
                      if norm(l.nameParts.last) == norm(r.nameParts.last) &&
                        (asTargetKey(l).isDefined || asTargetKey(r).isDefined) =>
                    (l.nameParts.last, None)
                  case EqualTo(l, r) =>
                    (asTargetKey(l), asTargetKey(r)) match {
                      case (Some(k), None) =>
                        (k, Some(ColumnBridge.column(srcExpr(r))))
                      case (None, Some(k)) =>
                        (k, Some(ColumnBridge.column(srcExpr(l))))
                      case (Some(_), Some(_)) => throw new IllegalArgumentException(
                        s"MERGE on $ident: ON equates two TARGET columns — " +
                          "one side must be the source key (same name) or an " +
                          "expression over source columns")
                      case (None, None) => throw new IllegalArgumentException(
                        s"MERGE on $ident: ON must equate a target column " +
                          "with the same-named source column or with an " +
                          s"expression over source columns, got ${l.sql} = ${r.sql}")
                    }
                  case other => throw new IllegalArgumentException(
                    s"MERGE on $ident: ON must be a conjunction of column " +
                      s"equalities, got ${other.sql}")
                }
              val keys = keyPairs.map(_._1)
              val keyMap = keyPairs.collect { case (k, Some(c)) => (k, c) }
              // matched actions: at most one UPDATE (SET * or an
              // explicit SET list, r14) and one DELETE
              var upd: Option[Option[Column]] = None // None=absent
              var del: Option[Column] = None
              var matchedAssign: Option[Seq[(String, Column)]] = None
              var updIdx = -1; var delIdx = -1
              matchedActs.zipWithIndex.foreach {
                case (UpdateStarAction(c), i) =>
                  require(upd.isEmpty, s"MERGE on $ident: one UPDATE clause only")
                  upd = Some(c.map(e => ColumnBridge.column(rewrite(e))))
                  updIdx = i
                case (UpdateAction(c, assigns, false), i) =>
                  // `WHEN MATCHED THEN UPDATE SET c = e, …` — the
                  // explicit-list idiom (r13 verdict ask #4): the
                  // target row survives with only the named columns
                  // reassigned; values may mix target columns
                  // (unqualified) and source columns (alias-qualified,
                  // landing on the merge frame's `_src` struct)
                  require(upd.isEmpty, s"MERGE on $ident: one UPDATE clause only")
                  upd = Some(c.map(e => ColumnBridge.column(rewrite(e))))
                  matchedAssign = Some(assigns.map { a =>
                    val name = a.key match {
                      case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
                        ua.nameParts.head
                      case ua: UnresolvedAttribute if ua.nameParts.length == 2 &&
                          tgtQ.contains(norm(ua.nameParts.head)) =>
                        ua.nameParts(1)
                      case other => throw new IllegalArgumentException(
                        s"MERGE on $ident: UPDATE SET can only assign whole " +
                          s"target columns, not '${other.sql}'")
                    }
                    name -> ColumnBridge.column(rewrite(a.value))
                  })
                  updIdx = i
                case (DeleteAction(c), i) =>
                  require(del.isEmpty, s"MERGE on $ident: one DELETE clause only")
                  del = Some(c.map(e => ColumnBridge.column(rewrite(e)))
                    .getOrElse(org.apache.spark.sql.functions.lit(true)))
                  delIdx = i
                case (other, _) => throw new IllegalArgumentException(
                  s"MERGE on $ident: only UPDATE SET * / UPDATE SET c = e " +
                    s"and DELETE matched clauses are supported, got $other")
              }
              // SQL clause precedence is FIRST-MATCH in listed order;
              // the engine's delete always outranks its update. When
              // the statement lists UPDATE before DELETE, narrow the
              // delete by ¬(update fires) so a row both clauses match
              // is UPDATED, exactly as the statement reads. (DELETE
              // listed first already agrees with the engine.)
              if (updIdx >= 0 && delIdx > updIdx && del.isDefined) {
                import org.apache.spark.sql.functions.{coalesce, lit, not}
                val updFires = upd.get
                  .map(c => coalesce(c, lit(false))).getOrElse(lit(true))
                del = del.map(d => d && not(updFires))
              }
              // the insert arm (r14 completes it): INSERT * — bare,
              // conditioned (AND c over SOURCE columns), or with an
              // explicit column list (assignments over SOURCE columns;
              // unassigned target columns insert as typed nulls) — or
              // absent entirely (the MATCHED-ONLY idiom, r13).
              // References in insert conditions/values evaluate against
              // the raw SOURCE frame (there is no target row for an
              // unmatched source row): bare names stay (they resolve on
              // the source at run time), source-alias qualifiers strip,
              // target qualifiers refuse.
              def srcSide(e: Expression, what: String): Expression =
                e.transformUp {
                  case ua: UnresolvedAttribute if ua.nameParts.length == 2 =>
                    val q = norm(ua.nameParts.head)
                    if (srcQ.contains(q)) UnresolvedAttribute(Seq(ua.nameParts(1)))
                    else if (tgtQ.contains(q)) throw new IllegalArgumentException(
                      s"MERGE on $ident: a NOT MATCHED $what can only " +
                        "reference source columns — there is no target row " +
                        "for an unmatched source row")
                    else throw new IllegalArgumentException(
                      s"MERGE on $ident: qualifier '${ua.nameParts.head}' is " +
                        "neither the target nor the source alias " +
                        s"(${(tgtQ ++ srcQ).toSeq.sorted.mkString(", ")})")
                  case ua: UnresolvedAttribute if ua.nameParts.length > 2 =>
                    throw new IllegalArgumentException(
                      s"MERGE on $ident: '${ua.sql}' — NOT MATCHED clauses " +
                        "take alias-qualified column references only")
                }
              val (insertUnmatched, insertCond, insertAssign) =
                notMatchedActs match {
                  case Seq() => (false, None, None)
                  case Seq(InsertStarAction(c)) =>
                    (true, c.map(e => ColumnBridge.column(
                      srcSide(e, "condition"))), None)
                  case Seq(InsertAction(c, assigns)) =>
                    val pairs = assigns.map { a =>
                      val name = a.key match {
                        case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
                          ua.nameParts.head
                        case ua: UnresolvedAttribute
                            if ua.nameParts.length == 2 &&
                              tgtQ.contains(norm(ua.nameParts.head)) =>
                          ua.nameParts(1)
                        case other => throw new IllegalArgumentException(
                          s"MERGE on $ident: INSERT can only assign whole " +
                            s"target columns, not '${other.sql}'")
                      }
                      name -> ColumnBridge.column(srcSide(a.value, "value"))
                    }
                    (true, c.map(e => ColumnBridge.column(
                      srcSide(e, "condition"))), Some(pairs))
                  case _ => throw new IllegalArgumentException(
                    s"MERGE on $ident takes at most ONE NOT MATCHED clause " +
                      "— INSERT * [AND cond] or INSERT (cols) VALUES (…)")
                }
              // WHEN NOT MATCHED BY SOURCE THEN DELETE / UPDATE SET
              // (r13): conditions and assignment values see TARGET
              // columns only (there is no source row, by definition) —
              // and no SET * for the same reason; first-match
              // precedence in listed order, like the matched clauses
              def tgtOnly(e: Expression, what: String): Expression = {
                val r = rewrite(e)
                require(!r.exists {
                  case ua: UnresolvedAttribute =>
                    ua.nameParts.headOption.contains("_src")
                  case _ => false
                }, s"MERGE on $ident: a NOT MATCHED BY SOURCE $what can " +
                  "only reference target columns — there is no source " +
                  "row for an unmatched target row")
                r
              }
              var bySrcDelete: Option[Column] = None
              var bySrcUpdate: Option[(Seq[(String, Column)], Column)] = None
              var bsDelIdx = -1; var bsUpdIdx = -1
              notMatchedBySrc.zipWithIndex.foreach {
                case (DeleteAction(c), i) =>
                  require(bySrcDelete.isEmpty,
                    s"MERGE on $ident: one BY SOURCE DELETE clause only")
                  bySrcDelete = Some(ColumnBridge.column(
                    c.map(tgtOnly(_, "condition")).getOrElse(
                      org.apache.spark.sql.catalyst.expressions.Literal(true))))
                  bsDelIdx = i
                case (UpdateAction(c, assigns, fromStar), i) =>
                  require(!fromStar,
                    s"MERGE on $ident: BY SOURCE UPDATE SET * is impossible " +
                      "— there is no source row; name the assignments")
                  require(bySrcUpdate.isEmpty,
                    s"MERGE on $ident: one BY SOURCE UPDATE clause only")
                  val cond = ColumnBridge.column(
                    c.map(tgtOnly(_, "condition")).getOrElse(
                      org.apache.spark.sql.catalyst.expressions.Literal(true)))
                  val pairs = assigns.map { a =>
                    val name = a.key match {
                      case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
                        ua.nameParts.head
                      case ua: UnresolvedAttribute if ua.nameParts.length == 2 &&
                          tgtQ.contains(norm(ua.nameParts.head)) =>
                        ua.nameParts(1)
                      case other => throw new IllegalArgumentException(
                        s"MERGE on $ident: BY SOURCE UPDATE can only " +
                          s"assign whole target columns, not '${other.sql}'")
                    }
                    name -> ColumnBridge.column(tgtOnly(a.value, "assignment"))
                  }
                  bySrcUpdate = Some((pairs, cond))
                  bsUpdIdx = i
                case (other, _) => throw new IllegalArgumentException(
                  s"MERGE on $ident: WHEN NOT MATCHED BY SOURCE supports " +
                    s"THEN DELETE [AND cond] and UPDATE SET c = e, got $other")
              }
              // the engine evaluates BY SOURCE delete before update;
              // UPDATE listed first must win rows both conditions match
              if (bsUpdIdx >= 0 && bsDelIdx > bsUpdIdx && bySrcDelete.isDefined) {
                import org.apache.spark.sql.functions.{coalesce, lit, not}
                val updFires = coalesce(bySrcUpdate.get._2, lit(false))
                bySrcDelete = bySrcDelete.map(d => d && not(updFires))
              }
              require(insertUnmatched || upd.isDefined || del.isDefined ||
                  bySrcDelete.isDefined || bySrcUpdate.isDefined,
                s"MERGE on $ident has no effective clause")
              val matchedUpdate: Option[Column] = upd match {
                case Some(c) => c // present: None inside = unconditional
                case None => // no UPDATE clause: matches stay untouched —
                  // and the never-firing "replaced" frame must build as
                  // an EMPTY SET LIST (target schema), not SET * (source
                  // schema): an INSERT-only merge with a source narrower
                  // than the target otherwise crashes the post-image
                  // union on the missing columns (r17)
                  if (matchedAssign.isEmpty) matchedAssign = Some(Nil)
                  Some(org.apache.spark.sql.functions.lit(false))
              }
              MergeCommand(ident, path, srcPlan, keys, matchedUpdate, del,
                withEvolution, insertUnmatched, bySrcDelete = bySrcDelete,
                bySrcUpdate = bySrcUpdate, matchedAssign = matchedAssign,
                insertCond = insertCond, insertAssign = insertAssign,
                keyMap = keyMap)
            case None =>
              tgtRel.flatMap(r => viewParts(r.multipartIdentifier)).foreach(v =>
                throw new IllegalArgumentException(
                  s"cannot MERGE into view graft.$v — views are " +
                    "read-only; write to the tables they read"))
              m
          }
        // ---- ALTER TABLE graft.<name> … — the DDL face over the
        // metadata-only schema-evolution operators (r12)
        case rc @ RenameColumn(u: UnresolvedTable, colName, newName) =>
          val ident = u.multipartIdentifier.mkString(".")
          alterSpec(u, "ALTER") match {
            case Some(path) => AlterCommand(ident, path,
              // multi-part = a nested struct-field rename (r13)
              Rename(colName.name, newName))
            case None => rc
          }
        case ac @ AddColumns(u: UnresolvedTable, cols) =>
          val ident = u.multipartIdentifier.mkString(".")
          alterSpec(u, "ALTER") match {
            case Some(path) =>
              val adds = cols.map { c =>
                require(c.nullable,
                  s"ADD COLUMNS on $ident: new columns must be nullable — " +
                    "every pre-add row reads them as null or the declared " +
                    "exists-default")
                // `ADD COLUMNS (c T DEFAULT e)` (r17): backfill-free —
                // the default freezes into an exists-default literal
                // pre-add files surface on READ, and doubles as the
                // CURRENT default future inserts fill. Top-level only:
                // nested fields have no insert-fill face.
                require(c.default.isEmpty || c.name.length == 1,
                  s"ADD COLUMNS on $ident: DEFAULT on the nested field " +
                    s"'${c.name.mkString(".")}' is unsupported — " +
                    "exists-defaults are top-level")
                require(c.position.isEmpty,
                  s"ADD COLUMNS on $ident: the recorded schema appends new " +
                    "columns last — positions are unsupported")
                // nested adds (r14): `ADD COLUMNS (s.c INT)` — c.name is
                // the full path, parent spelled Delta-style (structs by
                // field name, `element`, `key`/`value`)
                c.name.toSeq -> c.dataType
              }
              val defaults = cols.flatMap(c =>
                c.default.map(d => c.name.head -> d.originalSQL)).toMap
              AlterCommand(ident, path, Add(adds, defaults))
            case None => ac
          }
        case dc @ DropColumns(u: UnresolvedTable, cols, ifExists) =>
          val ident = u.multipartIdentifier.mkString(".")
          alterSpec(u, "ALTER") match {
            case Some(path) => AlterCommand(ident, path,
              Drop(cols.map(_.name.toSeq), ifExists))
            case None => dc
          }
        case al @ AlterColumns(u: UnresolvedTable, specs) =>
          val ident = u.multipartIdentifier.mkString(".")
          alterSpec(u, "ALTER") match {
            case Some(path) =>
              // two metadata-only families (r16): TYPE widening, and
              // SET/DROP DEFAULT. One statement speaks one family —
              // a mixed edit would entangle two failure surfaces.
              if (specs.forall(s =>
                  s.newDefaultExpression.isDefined || s.dropDefault)) {
                val edits = specs.map { s =>
                  require(s.newDataType.isEmpty && s.newNullability.isEmpty &&
                      s.newComment.isEmpty && s.newPosition.isEmpty,
                    s"ALTER COLUMN on $ident: SET/DROP DEFAULT cannot be " +
                      "combined with other column changes in one spec")
                  s.column.name.toSeq -> s.newDefaultExpression.map(_.originalSQL)
                }
                AlterCommand(ident, path, SetDefault(edits))
              } else {
                val widens = specs.map { s =>
                  require(s.newDataType.isDefined && s.newNullability.isEmpty &&
                      s.newComment.isEmpty && s.newPosition.isEmpty &&
                      s.newDefaultExpression.isEmpty && !s.dropDefault,
                    s"ALTER COLUMN on $ident supports TYPE changes (the " +
                      "metadata-only widening lattice) and SET/DROP " +
                      "DEFAULT only")
                  s.column.name.toSeq -> s.newDataType.get
                }
                AlterCommand(ident, path, Widen(widens))
              }
            case None => al
          }
        // SET/UNSET TBLPROPERTIES aimed at a graft table would
        // otherwise escape to the session catalog and die with an
        // opaque not-found — refuse with the mechanism that DOES
        // evolve each property family (the refuse-loudly policy)
        case sp @ org.apache.spark.sql.catalyst.plans.logical
            .SetTableProperties(u: UnresolvedTable, _) =>
          alterSpec(u, "ALTER").foreach { _ =>
            throw new IllegalArgumentException(
              s"SET TBLPROPERTIES on ${u.multipartIdentifier.mkString(".")}: " +
                "table properties are recorded at CREATE in the config " +
                "sidecar and do not mutate in place — stats columns " +
                "evolve via ANALYZE TABLE … COMPUTE STATISTICS FOR " +
                "COLUMNS (begins collection and binds later writers), " +
                "constraints via ALTER TABLE … ADD/DROP CONSTRAINT")
          }
          sp
        case up @ org.apache.spark.sql.catalyst.plans.logical
            .UnsetTableProperties(u: UnresolvedTable, _, _) =>
          alterSpec(u, "ALTER").foreach { _ =>
            throw new IllegalArgumentException(
              s"UNSET TBLPROPERTIES on " +
                s"${u.multipartIdentifier.mkString(".")}: table properties " +
                "are recorded at CREATE and do not mutate in place — see " +
                "SET TBLPROPERTIES for the per-family evolution paths")
          }
          up
      }
      withWrites.resolveOperatorsUp {
        // standard SQL time travel (r13): `FROM graft.<name> VERSION AS
        // OF 3` / `TIMESTAMP AS OF '…'` — the ANSI-ish spelling next to
        // the engine's own back-tick form. RelationTimeTravel is a leaf
        // (its relation is NOT a child), so the bare-relation case
        // below never rewrites it out from under this one.
        case tt: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel =>
          tt.relation match {
            case u: UnresolvedRelation =>
              specOf(u) match {
                case Some((path, v0)) =>
                  val ident = u.multipartIdentifier.mkString(".")
                  require(v0 < 0,
                    s"cannot combine the @v spelling with VERSION/TIMESTAMP " +
                      s"AS OF on $ident")
                  val v = (tt.version, tt.timestamp) match {
                    case (Some(vs), None) => vs.toIntOption.getOrElse(
                      throw new IllegalArgumentException(
                        s"VERSION AS OF on $ident takes an integer " +
                          s"version, got '$vs'"))
                    case (None, Some(e)) =>
                      require(e.foldable,
                        s"TIMESTAMP AS OF on $ident takes a literal timestamp")
                      val micros = org.apache.spark.sql.catalyst.expressions.Cast(
                        e, org.apache.spark.sql.types.TimestampType,
                        Some(session.sessionState.conf.sessionLocalTimeZone))
                        .eval(null)
                      require(micros != null,
                        s"TIMESTAMP AS OF on $ident: '${e.sql}' is not a timestamp")
                      ManifestTable.versionAsOf(session, path,
                        micros.asInstanceOf[Long] / 1000L)
                    case _ => throw new IllegalArgumentException(
                      s"time travel on $ident needs VERSION AS OF or " +
                        "TIMESTAMP AS OF")
                  }
                  ManifestTable.read(session, path, v).queryExecution.analyzed
                case None => tt
              }
            case _ => tt
          }
        // a registered VIEW expands to its (re-parsed, recursively
        // view-inlined) definition — always the current table state,
        // cycles refused inside expandView (r16)
        case u: UnresolvedRelation if !u.isStreaming &&
            specOf(u).isEmpty &&
            viewParts(u.multipartIdentifier).isDefined =>
          val n = viewParts(u.multipartIdentifier).get
          SubqueryAlias(n, expandView(session, n, Set.empty))
        case u: UnresolvedRelation if !u.isStreaming =>
          specOf(u) match {
            case Some((path, v)) =>
              ManifestTable.read(session, path, v).queryExecution.analyzed
            case None => u
          }
      }
    }
  }

  /** A static `PARTITION (col = 'raw')` value as ONE typed literal:
    * ANSI-cast driver-side so a value that doesn't fit the recorded
    * partition type fails the STATEMENT with the offending spelling —
    * never a silent null partition, never a runtime cast per row. */
  private def staticPartitionLiteral(raw: String, f: StructField,
      ident: String, session: SparkSession): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal}
    val v =
      try Cast(Literal(raw), f.dataType,
        Option(session.sessionState.conf.sessionLocalTimeZone),
        EvalMode.ANSI).eval(null)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"INSERT … PARTITION on $ident: value '$raw' for ${f.name} does " +
          s"not cast to ${f.dataType.simpleString}", e) }
    require(v != null,
      s"INSERT … PARTITION on $ident: value '$raw' for ${f.name} casts " +
        s"to NULL — a null partition must be written dynamically " +
        "(carry the column in the query)")
    ColumnBridge.column(Literal(v, f.dataType))
  }

  /** `INSERT INTO graft.<name>` — the SQL write path. Runs at
    * execution time like Spark's own RunnableCommands: the source
    * query analyzes and executes then, and the write goes through
    * [[ManifestTable.commit]]'s full discipline — strict schema
    * match, CHECK constraints, inherited partition layout (hidden
    * transforms re-derived), bloom indexing, stats continuity, and
    * the atomic conditional publish. Semantics, exactly ANSI:
    *
    *  - `INSERT INTO` appends; `INSERT OVERWRITE` replaces. On a
    *    layout-free table it is the full overwrite. On a table with
    *    IDENTITY partitions it is DYNAMIC PARTITION OVERWRITE (r14
    *    verdict ask #1 — the canonical ETL reload, the reference's own
    *    A2 `mode("overwrite") + partitionBy` shape): the batch's
    *    distinct partition tuples are enumerated and the statement
    *    lowers to [[ManifestTable.replaceWhere]] over exactly those
    *    regions — one atomic version, untouched partitions carried by
    *    reference, O(replaced region) write volume at 100 TB. A batch
    *    spanning more than [[DynamicOverwriteMaxPartitions]] regions
    *    refuses (enumerating the predicate stops paying for itself —
    *    use the Scala API's SaveMode.Overwrite for a full reload), as
    *    does a hidden-transform layout (the physical region isn't
    *    spellable over the read frame — REPLACE WHERE over the
    *    transform SOURCES says what you mean).
    *  - assignment is POSITIONAL (or BY NAME with the keyword); an
    *    explicit column list `(b, a)` maps query columns to those
    *    names positionally. A column may be OMITTED (from the list or
    *    the BY NAME set) iff it fills itself (r16): DEFAULT columns
    *    re-evaluate their recorded expression per statement, GENERATED
    *    columns compute from the completed row (and are EQUALITY-
    *    enforced when supplied explicitly — one column-pruned pass,
    *    the CHECK discipline), IDENTITY columns allocate via
    *    [[graft.functions.NextIdentityValue]] (one codegen'd
    *    projection column, zero shuffles; the high-water mark
    *    advances at publish from the write's own recorded stats, and
    *    a concurrent allocation race is REFUSED at commit, never
    *    published as duplicates). GENERATED ALWAYS AS IDENTITY
    *    refuses explicit values; BY DEFAULT permits them. Positional
    *    inserts supply every non-identity column.
    *  - `PARTITION (p = 'x'[, q])` — the Hive-idiom static/dynamic
    *    partition clause (r16, finishing the r15 half-build). The
    *    clause must name EVERY identity partition column (Hive's own
    *    contract): a key with a value is STATIC — the query does NOT
    *    carry that column; its value is validated and injected as one
    *    typed literal (driver-side ANSI cast, so `p='oops'` into an
    *    INT layout fails at the statement, not as a null partition) —
    *    while a bare key is a DYNAMIC mention, declaration only (the
    *    query carries it). Under OVERWRITE the static keys SPELL the
    *    replaced region directly — no enumeration pass over the batch
    *    for them — and only the dynamic remainder is enumerated; all
    *    partition columns static means exactly one replaceWhere region
    *    and ZERO extra passes. Hidden-transform layouts refuse (the
    *    physical region isn't spellable) as does `IF NOT EXISTS`.
    *  - a narrow-typed source is refused by commit's append
    *    discipline, never silently cast. */
  final case class InsertCommand(ident: String, path: String,
      query: LogicalPlan, overwrite: Boolean, userCols: Seq[String],
      byName: Boolean,
      partSpec: Map[String, Option[String]] = Map.empty)
    extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(query)
    override def run(session: SparkSession): Seq[Row] = {
      requireNotMView(session, path, ident, "INSERT")
      val recorded = ManifestTable.snapshotSchema(session, path)
      val partBy = ManifestTable.partitionColumns(session, path)
      if (partSpec.nonEmpty) {
        // static PARTITION pre-flight — every refusal BEFORE the query
        // runs (cheap metadata checks; a 100 TB source should never
        // execute against a clause that can't land)
        val hidden = ManifestTable.partitionTransforms(session, path)
        require(hidden.isEmpty,
          s"INSERT … PARTITION on $ident: the layout hides " +
            s"${hidden.map(_.target).mkString(", ")} behind transforms — " +
            "a static value can't address a derived region; use " +
            "REPLACE WHERE over the transform sources")
        require(partBy.nonEmpty,
          s"INSERT … PARTITION on $ident: the table is unpartitioned — " +
            "drop the PARTITION clause")
        val partNorm = partBy.map(norm).toSet
        val bad = partSpec.keys.filterNot(k => partNorm(norm(k)))
        require(bad.isEmpty,
          s"INSERT … PARTITION on $ident: ${bad.mkString(", ")} " +
            s"is not a partition column (layout: ${partBy.mkString(", ")})")
        require(partSpec.map(k => norm(k._1)).toSet.size == partSpec.size,
          s"INSERT … PARTITION on $ident: duplicate partition key")
        require(partSpec.size == partBy.size,
          s"INSERT … PARTITION on $ident must mention every partition " +
            s"column (${partBy.mkString(", ")}) — static keys with a " +
            "value, dynamic keys bare (Hive's own contract)")
      }
      // static keys in RECORDED layout order / recorded case, each
      // value eagerly ANSI-cast to the recorded field type
      val staticRaw: Map[String, String] =
        partSpec.collect { case (k, Some(v)) => norm(k) -> v }
      val staticCols: Seq[(StructField, Column)] = recorded match {
        case Some(s) if staticRaw.nonEmpty =>
          s.fields.toSeq.filter(f => staticRaw.contains(norm(f.name)))
            .map(f => f -> staticPartitionLiteral(
              staticRaw(norm(f.name)), f, ident, session))
        case _ =>
          require(staticRaw.isEmpty,
            s"INSERT … PARTITION on $ident: the table has no recorded " +
              "schema yet — static values need a typed layout to land in")
          Nil
      }
      // the query side supplies the table MINUS the static columns
      val querySide: Option[StructType] = recorded.map(s =>
        StructType(s.fields.filterNot(f => staticRaw.contains(norm(f.name)))))
      import ColumnSpecs.{autoFillable, defaultOf, generatedOf, identityOf}
      // ANSI `DEFAULT` in VALUES (r16): a bare DEFAULT inside an
      // inline row marks "use the recorded default" for its position.
      // The keyword parses as an unresolved single-part reference with
      // no real column to resolve against, so it rewrites HERE —
      // position → target column → recorded DEFAULT expression
      // (ANSI-cast). IDENTITY/GENERATED positions refuse with the
      // omission spelling (their fills are not expressions an inline
      // table can hold — non-foldable / sibling-referencing).
      def isDefaultRef(e: Expression): Boolean = e match {
        case ua: UnresolvedAttribute =>
          ua.nameParts.length == 1 && norm(ua.nameParts.head) == "default"
        case _ => false
      }
      val queryR = recorded match {
        case Some(s) if !byName =>
          lazy val positional: Seq[String] = userCols match {
            case Nil => querySide.map(_.fields.toSeq
                .filter(f => ColumnSpecs.identityOf(f).isEmpty).map(_.name))
              .getOrElse(Nil)
            case cols => cols
          }
          query.transformUp {
            case it: org.apache.spark.sql.catalyst.analysis.UnresolvedInlineTable
                if it.rows.exists(_.exists(isDefaultRef)) =>
              it.copy(rows = it.rows.map(row => row.zipWithIndex.map {
                case (e, i) if isDefaultRef(e) =>
                  require(row.length == positional.length && i < positional.length,
                    s"INSERT INTO $ident: a DEFAULT keyword at position " +
                      s"${i + 1} does not map onto the target columns " +
                      s"(${positional.mkString(", ")})")
                  val f = s.fields.find(x => norm(x.name) == norm(positional(i)))
                    .getOrElse(throw new IllegalArgumentException(
                      s"INSERT INTO $ident: DEFAULT keyword position " +
                        s"${i + 1} names no table column"))
                  ColumnSpecs.defaultOf(f) match {
                    case Some(d) =>
                      ColumnSpecs.defaultExpression(session, d, f.dataType)
                    case None => throw new IllegalArgumentException(
                      s"INSERT INTO $ident: DEFAULT keyword for '${f.name}' — " +
                        "the column records no DEFAULT (IDENTITY/GENERATED " +
                        "columns fill themselves: omit them from the column " +
                        "list instead)")
                  }
                case (e, _) => e
              }))
          }
        case _ => query
      }
      val src = PlanBridge.ofRows(session, queryR)
      val aligned =
        if (byName && userCols.isEmpty) {
          // BY NAME still refuses a shape drift: an extra source column
          // would otherwise be silently projected away below (the same
          // data-loss pattern copyInto refuses). A MISSING column is
          // legal iff it fills itself — DEFAULT, GENERATED, IDENTITY.
          querySide.foreach { s =>
            val byNorm = s.fields.map(f => norm(f.name)).toSet
            val extra = src.columns.filterNot(c => byNorm(norm(c)))
            require(extra.isEmpty,
              s"INSERT BY NAME into $ident: source columns " +
                s"${extra.mkString(", ")} are not table columns " +
                s"(expected among: ${s.fieldNames.sorted.mkString(", ")})")
            val suppliedN = src.columns.map(norm).toSet
            val bad = s.fields.filterNot(f => suppliedN(norm(f.name)))
              .filterNot(autoFillable)
            require(bad.isEmpty,
              s"INSERT BY NAME into $ident omits " +
                s"${bad.map(_.name).mkString(", ")} — an omitted column " +
                "needs a DEFAULT, GENERATED, or IDENTITY spec")
          }
          src
        }
        else {
          val targets: Seq[String] = userCols match {
            case Nil =>
              // positional: the query supplies every non-IDENTITY
              // column in recorded order (identity columns are
              // allocated — ALWAYS ones are unwritable, and BY
              // DEFAULT ones need an explicit column list to address)
              querySide.map(_.fields.toSeq
                  .filter(f => identityOf(f).isEmpty).map(_.name))
                .getOrElse(src.columns.toSeq)
            case cols =>
              querySide.foreach { s =>
                val byNorm = s.fields.map(f => norm(f.name)).toSet
                val bad = cols.filterNot(c => byNorm(norm(c)))
                require(bad.isEmpty,
                  s"INSERT INTO $ident (${cols.mkString(", ")}): " +
                    s"${bad.mkString(", ")} are not insertable table " +
                    s"columns (expected among: ${s.fieldNames.mkString(", ")})")
                require(cols.map(norm).toSet.size == cols.size,
                  s"INSERT INTO $ident: duplicate column in the list")
                val named = cols.map(norm).toSet
                val nofill = s.fields.filterNot(f => named(norm(f.name)))
                  .filterNot(autoFillable)
                require(nofill.isEmpty,
                  s"INSERT INTO $ident (${cols.mkString(", ")}) omits " +
                    s"${nofill.map(_.name).mkString(", ")} — an omitted " +
                    "column needs a DEFAULT, GENERATED, or IDENTITY spec")
              }
              cols
          }
          require(src.schema.length == targets.length,
            s"INSERT INTO $ident: query produces ${src.schema.length} " +
              s"column(s), target takes ${targets.length} " +
              s"(${targets.mkString(", ")})")
          src.toDF(targets: _*)
        }
      // explicit values into a GENERATED ALWAYS AS IDENTITY column are
      // refused (BY DEFAULT permits them — the high-water mark then
      // self-syncs from the write's recorded stats at publish)
      val suppliedNorm = aligned.columns.map(norm).toSet
      querySide.foreach(_.fields.foreach { f =>
        identityOf(f).foreach { is =>
          require(is.byDefault || !suppliedNorm(norm(f.name)),
            s"INSERT into $ident: '${f.name}' is GENERATED ALWAYS AS " +
              "IDENTITY — omit it from the insert (GENERATED BY DEFAULT " +
              "would permit explicit values)")
        }
      })
      // fill pass 1 (r16) — omitted DEFAULT and IDENTITY columns.
      // Defaults are column-free expressions re-evaluated per
      // statement; identity is ONE codegen'd projection column
      // (NextIdentityValue: interleaved ordinals, zero shuffles, zero
      // driver coordination — see its Scaladoc for the 100 TB math).
      var identityBases = Map.empty[String, Long]
      var filled = aligned
      querySide.foreach(_.fields.foreach { f =>
        if (!suppliedNorm(norm(f.name))) {
          identityOf(f) match {
            case Some(is) =>
              filled = filled.withColumn(f.name, ColumnBridge.column(
                graft.functions.NextIdentityValue(is.base, is.step)))
              identityBases += f.name -> is.base
            case None => defaultOf(f).foreach { sql =>
              filled = filled.withColumn(f.name,
                ColumnSpecs.defaultColumn(session, sql, f.dataType))
            }
          }
        }
      })
      // fill pass 2 — GENERATED columns, after defaults (the
      // expression may reference DEFAULT-bearing siblings): computed
      // over the completed frame when omitted; when SUPPLIED the
      // values must AGREE with the expression — one column-pruned
      // null-safe-equality pass, the CHECK-constraint discipline
      // (stored generated values that silently drift from their
      // expression are a lie about the table)
      // a SUPPLIED generated column triggers an agree-check that
      // re-executes the source query — pin the frame first (r17,
      // advisory) so a nondeterministic source (rand(), uuid()) can't
      // pass the check on one sample and write another, and the check
      // no longer doubles every such insert's scan cost
      if (querySide.exists(_.fields.exists(f =>
          generatedOf(f).isDefined && suppliedNorm(norm(f.name)))))
        filled = filled.localCheckpoint()
      querySide.foreach(_.fields.foreach { f =>
        generatedOf(f).foreach { sql =>
          val gen = ColumnSpecs.generatedColumn(session, sql, f.dataType)
          if (!suppliedNorm(norm(f.name)))
            filled = filled.withColumn(f.name, gen)
          else {
            import org.apache.spark.sql.functions.not
            require(filled.filter(not(filled.col(f.name) <=> gen)).isEmpty,
              s"INSERT into $ident supplies GENERATED column '${f.name}' " +
                s"with values that disagree with GENERATED ALWAYS AS ($sql)")
          }
        }
      })
      // recorded order (the analyzer resolves names case-insensitively),
      // with ANSI store-assignment on the SAFE side only: a source
      // column whose type is a sanctioned WIDENING of the recorded one
      // (int literal into a long column — the VALUES(1, …) shape)
      // up-casts through the same value-preserving lattice widenColumn
      // uses; anything else reaches commit unchanged and is refused by
      // its strict discipline, never silently narrowed. Column specs
      // (DEFAULT/GENERATED/IDENTITY metadata) re-attach via the alias:
      // an OVERWRITE commit records the batch's own schema, and a bare
      // alias would silently wipe them (appends ignore batch metadata).
      val staticByNorm = staticCols.map { case (f, c) => norm(f.name) -> c }.toMap
      val ordered = recorded match {
        case Some(s) =>
          val srcTypes = filled.schema
            .map(f => norm(f.name) -> f.dataType).toMap
          filled.select(s.fields.map { f =>
            def alias(c: Column): Column = ColumnSpecs.specMetadata(f) match {
              case Some(m) => c.as(f.name, m)
              case None => c.as(f.name)
            }
            staticByNorm.get(norm(f.name)) match {
              case Some(litCol) => alias(litCol) // injected static value
              case None =>
                val c = filled.col(f.name)
                srcTypes.get(norm(f.name)) match {
                  case Some(t) if t != f.dataType &&
                      ManifestTable.safeStoreCast(t, f.dataType) =>
                    alias(c.cast(f.dataType))
                  case _ => alias(c)
                }
            }
          }.toSeq: _*)
        case None => filled
      }
      if (overwrite && partBy.nonEmpty) {
        import org.apache.spark.sql.functions.{col, lit}
        // STATIC region first: keys with values spell their slice of
        // the replaced region directly — zero passes over the batch
        val staticPred: Option[Column] = staticCols match {
          case Nil => None
          case cs => Some(cs.map { case (f, c) => col(f.name) === c }
            .reduce(_ && _))
        }
        val dynCols = partBy.filterNot(c => staticByNorm.contains(norm(c)))
        if (dynCols.isEmpty && staticPred.nonEmpty) {
          // every partition column pinned: ONE replaceWhere, no
          // enumeration — injected literals guarantee every row lands
          // inside the region, so the write-time re-filter is a no-op
          ManifestTable.replaceWhere(session, path, staticPred.get, ordered)
          return Nil
        }
        // DYNAMIC PARTITION OVERWRITE: enumerate the batch's distinct
        // partition tuples (one column-pruned distinct — O(batch) with
        // map-side partial aggregation, the only way to LEARN the
        // regions), spell them as a disjunction of per-tuple conjuncts,
        // and swap the regions atomically via replaceWhere. Untouched
        // partitions carry by reference; replaceWhere's write-time
        // re-filter keeps a non-deterministic source from leaking rows
        // into a region this enumeration never saw. Only the DYNAMIC
        // remainder of the layout is enumerated — static keys already
        // spelled their slice above.
        val hidden = ManifestTable.partitionTransforms(session, path)
        require(hidden.isEmpty,
          s"INSERT OVERWRITE on $ident: dynamic partition overwrite needs " +
            "identity partitions — this table's layout hides " +
            s"${hidden.map(_.target).mkString(", ")}; spell the region " +
            s"explicitly: INSERT INTO $ident REPLACE WHERE <predicate over " +
            "the transform sources> SELECT …")
        // ONE evaluation of the batch feeds both the enumeration and
        // the write (ADVICE r15): a non-deterministic source re-run at
        // write time could materialize rows in partitions the
        // enumeration never saw — replaceWhere's re-filter would then
        // silently DROP them. Deterministic plans (the overwhelmingly
        // common case) skip the pin — recompute is stable by
        // definition and the checkpoint's extra materialization is
        // pure cost at 100 TB.
        val batch =
          if (ordered.queryExecution.analyzed.exists(
              _.expressions.exists(e => !e.deterministic)))
            ordered.localCheckpoint()
          else ordered
        val tuples = batch
          .select(dynCols.map(col): _*).distinct()
          .limit(DynamicOverwriteMaxPartitions + 1).collect()
        require(tuples.length <= DynamicOverwriteMaxPartitions,
          s"INSERT OVERWRITE on $ident: the batch spans more than " +
            s"$DynamicOverwriteMaxPartitions partitions — enumerating the " +
            "region predicate stops paying for itself; use " +
            "ManifestTable.commit(..., SaveMode.Overwrite, partitionBy = " +
            "<layout>) for a full reload")
        if (tuples.isEmpty) return Nil // no regions to replace — a no-op
        val dynPred = tuples.toSeq.map { t =>
          dynCols.zipWithIndex.map { case (c, i) =>
            if (t.isNullAt(i)) col(c).isNull else col(c) === lit(t.get(i))
          }.reduce(_ && _)
        }.reduce(_ || _)
        val pred = staticPred.map(_ && dynPred).getOrElse(dynPred)
        ManifestTable.replaceWhere(session, path, pred, batch)
        return Nil
      }
      ManifestTable.commit(session, path, ordered,
        if (overwrite) SaveMode.Overwrite else SaveMode.Append,
        identityBase = identityBases)
      Nil
    }
  }

  /** `DELETE FROM graft.<name> [WHERE …]` — [[ManifestTable.deleteWhere]]
    * through SQL: stats-pruned victim scan, affected files rewritten,
    * the rest carried by reference, one atomic version (or none when
    * nothing matches). The condition resolves against the table's
    * read frame inside deleteWhere, so bad references fail loudly.
    *
    * The predicate/assignment expressions are carried as [[Column]]s,
    * not Expressions, ON PURPOSE: QueryPlan reflects over constructor
    * args collecting every Expression, and CheckAnalysis would then
    * fail the (deliberately still-unresolved — they resolve against
    * the table frame at run time, Spark's own command pattern) trees
    * as unresolved attributes. A Column is opaque to that sweep. */
  final case class DeleteCommand(ident: String, path: String,
      condition: Column) extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      requireNotMView(session, path, ident, "DELETE")
      ManifestTable.deleteWhere(session, path, condition)
      Nil
    }
  }

  /** `ALTER TABLE graft.<a> RENAME TO graft.<b>` —
    * [[renameRegistered]]: the name moves, every byte stays; history
    * and time travel are intact under the new name, and commands
    * aimed at the old one get a pointer instead of a bare not-found. */
  final case class RenameTableCommand(from: String, to: String)
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      renameRegistered(from, to)
      Nil
    }
  }

  /** `TRUNCATE TABLE graft.<name>` — [[ManifestTable.truncate]]: one
    * metadata-only publish of an empty snapshot (schema, layout, and
    * constraints carried; tombstones/DVs cleared), zero data files
    * read or written — the O(manifest) cost the framework promises,
    * where lowering to DELETE-with-true would scan every live row
    * (ADVICE r14). */
  final case class TruncateCommand(ident: String, path: String)
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      requireNotMView(session, path, ident, "TRUNCATE")
      ManifestTable.truncate(session, path)
      Nil
    }
  }

  /** `MERGE INTO graft.<name> USING … ON … WHEN …` — the engine's
    * [[ManifestTable.merge]] through SQL: key-envelope file pruning,
    * only matched files rewritten, exactly-once-able, one atomic
    * version. The rule pre-validated the shape (same-named key
    * equalities, UPDATE SET * / DELETE matched clauses, mandatory
    * INSERT *); clause conditions were rewritten to the merge frame
    * (target columns bare, source through the `_src` struct) and ride
    * as Columns for the CheckAnalysis reason on [[DeleteCommand]].
    * `keyMap` carries the EXPRESSION-mapped keys (`ON t.k = s.k + 1`,
    * r14 verdict ask #3): each entry's column evaluates against the
    * raw source frame and REPLACES (or adds) the source column of
    * that key's name before the merge — so the key envelope, file
    * pruning, and reconcile conflict scan all run on the evaluated
    * key values. */
  final case class MergeCommand(ident: String, path: String,
      source: LogicalPlan, keys: Seq[String],
      matchedUpdate: Option[Column], matchedDelete: Option[Column],
      evolve: Boolean, insertUnmatched: Boolean = true,
      bySrcDelete: Option[Column] = None,
      bySrcUpdate: Option[(Seq[(String, Column)], Column)] = None,
      matchedAssign: Option[Seq[(String, Column)]] = None,
      insertCond: Option[Column] = None,
      insertAssign: Option[Seq[(String, Column)]] = None,
      keyMap: Seq[(String, Column)] = Nil)
    extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(source)
    override def run(session: SparkSession): Seq[Row] = {
      // ALL mapped keys evaluate in ONE projection against the RAW
      // source frame (ADVICE r15): a sequential withColumn fold would
      // let `ON t.a = s.b AND t.b = s.a` compute t.b's key from the
      // already-REPLACED `a` — silently wrong swap-key merges
      requireNotMView(session, path, ident, "MERGE")
      val src = PlanBridge.ofRows(session, source)
        .withColumns(keyMap.toMap)
      ManifestTable.merge(session, path, src,
        keys, matchedUpdate, matchedDelete, mergeSchema = evolve,
        insertUnmatched = insertUnmatched,
        whenNotMatchedBySourceDelete = bySrcDelete,
        whenNotMatchedBySourceUpdate = bySrcUpdate,
        whenMatchedAssign = matchedAssign,
        insertCondition = insertCond,
        insertAssign = insertAssign)
      Nil
    }
  }

  /** One ALTER TABLE change, pre-validated by the rule. */
  sealed trait Alter extends Serializable
  final case class Rename(from: Seq[String], to: String) extends Alter
  final case class Add(cols: Seq[(Seq[String], DataType)],
                       defaults: Map[String, String] = Map.empty) extends Alter
  final case class Drop(cols: Seq[Seq[String]], ifExists: Boolean) extends Alter
  final case class Widen(cols: Seq[(Seq[String], DataType)]) extends Alter
  /** SET DEFAULT (Some(sql)) / DROP DEFAULT (None) per column (r16). */
  final case class SetDefault(cols: Seq[(Seq[String], Option[String])])
    extends Alter

  /** `ALTER TABLE graft.<name> RENAME COLUMN / ADD COLUMNS /
    * DROP COLUMN / ALTER COLUMN … TYPE …` — each maps to the
    * metadata-only schema-evolution operator it names (renameColumn /
    * addColumn / dropColumn / widenColumn), one atomic version per
    * column change, every refusal those operators make surfacing
    * verbatim (partition/transform/bloom/constraint references,
    * non-widening type changes, physical-name collisions). */
  final case class AlterCommand(ident: String, path: String, change: Alter)
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      change match {
        case Rename(from, to) =>
          ManifestTable.renameColumnPath(session, path, from, to)
        // multi-column forms are statement-ATOMIC (ADVICE r12): every
        // column validates against the same head and the whole change
        // publishes as ONE version — a failing column fails the
        // statement with the table untouched
        case Add(cols, defaults) =>
          ManifestTable.addColumnsAt(session, path, cols, defaults = defaults)
        case Drop(cols, ifExists) =>
          val keep =
            if (!ifExists) cols
            else {
              // IF EXISTS resolves the whole PATH, any depth
              val sch = ManifestTable.snapshotSchema(session, path)
              def exists(p: Seq[String]): Boolean = {
                import org.apache.spark.sql.types.{ArrayType, MapType}
                def walk(dt: org.apache.spark.sql.types.DataType,
                         rest: Seq[String]): Boolean =
                  if (rest.isEmpty) true
                  else (dt, rest.head) match {
                    case (st: StructType, step) =>
                      st.fields.find(_.name == step)
                        .exists(f => walk(f.dataType, rest.tail))
                    case (ArrayType(et, _), "element") => walk(et, rest.tail)
                    case (MapType(k, _, _), "key") => walk(k, rest.tail)
                    case (MapType(_, v, _), "value") => walk(v, rest.tail)
                    case _ => false
                  }
                sch.exists(walk(_, p))
              }
              cols.filter(exists)
            }
          if (keep.nonEmpty) ManifestTable.dropColumnsAt(session, path, keep)
        case Widen(cols) =>
          ManifestTable.widenColumnsAt(session, path, cols)
        case SetDefault(cols) =>
          val edits = cols.map { case (p, sqlOpt) =>
            require(p.length == 1,
              s"SET/DROP DEFAULT on $ident: '${p.mkString(".")}' is " +
                "nested — defaults fill INSERT columns, which are " +
                "top-level")
            p.head -> sqlOpt
          }
          ManifestTable.setColumnDefaults(session, path, edits)
      }
      Nil
    }
  }

  /** The DDL rule, injected as a HINT-resolution rule (the Hints
    * batch) on purpose: it must see CREATE/DROP statements in their
    * raw parsed state. Waiting for the Resolution batch is too late —
    * the builtin identifier resolver claims `graft.<name>` for the
    * session catalog first and aborts analysis with SCHEMA_NOT_FOUND
    * before any injected resolution rule runs. The statements it
    * rewrites are pure parse-tree shapes (a CTAS query rides along
    * unresolved and analyzes at execution, the MergeCommand pattern),
    * so running pre-resolution loses nothing. */
  final class DdlResolution(session: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      // the DDL statements this rule claims are always the plan ROOT —
      // one instanceof test bails out of every ordinary query's
      // analysis (the rule runs in the fixed-point Hints batch, so a
      // wholesale tree walk per iteration would tax every statement
      // in the session for a feature most never use)
      if (!plan.isInstanceOf[CreateTable] &&
          !plan.isInstanceOf[CreateTableAsSelect] &&
          !plan.isInstanceOf[ReplaceTable] &&
          !plan.isInstanceOf[ReplaceTableAsSelect] &&
          !plan.isInstanceOf[DropTable] &&
          !plan.isInstanceOf[DescribeRelation] &&
          !plan.isInstanceOf[ShowCreateTable] &&
          !plan.isInstanceOf[ShowTables] &&
          !plan.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.ShowPartitions] &&
          !plan.isInstanceOf[AddCheckConstraint] &&
          !plan.isInstanceOf[DropConstraintPlan] &&
          !plan.isInstanceOf[AnalyzeColumn] &&
          !plan.isInstanceOf[AnalyzeTable] &&
          !plan.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.RenameTable] &&
          !plan.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.CreateView] &&
          !plan.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.DropView] &&
          !plan.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.AlterViewAs] &&
          !plan.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.ShowViews] &&
          !plan.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.CacheTable] &&
          !plan.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.UncacheTable] &&
          !plan.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.ShowColumns] &&
          !plan.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.logical.ShowTableProperties]) return plan
      plan.resolveOperatorsUp {
        // ---- ALTER TABLE graft.a RENAME TO graft.b — the registry
        // rename (r14 verdict ask #5): metadata-only, the directory
        // and all its versions stay put; only the 2-part graft
        // namespace is claimed on BOTH sides (bare names and ALTER
        // VIEW stay with the session catalog). Handled here for the
        // CREATE reason above.
        case rt @ org.apache.spark.sql.catalyst.plans.logical.RenameTable(
            child, newName, isView) if !isView =>
          val src = child match {
            case u: UnresolvedTableOrView => graftIdent(u.multipartIdentifier)
            case u: UnresolvedTable => graftIdent(u.multipartIdentifier)
            case _ => None
          }
          src match {
            case Some(from) =>
              val to = graftIdent(newName).getOrElse(
                throw new IllegalArgumentException(
                  s"ALTER TABLE graft.$from RENAME TO: the new name must " +
                    "stay in the graft namespace — RENAME TO graft.<name>, " +
                    s"got ${newName.mkString(".")}"))
              RenameTableCommand(from, to)
            case None => rt
          }
        // ---- ALTER TABLE graft.<name> ADD/DROP CONSTRAINT — the SQL
        // spelling of add/dropConstraint (r14): until now the
        // constraint set was CREATE-time or Scala-only, so a SQL-only
        // operator could create a table but never tighten it. Handled
        // HERE (not the Resolution batch) for the CREATE reason above:
        // ResolveSessionCatalog claims constraint statements for the
        // session catalog and crashes on the graft namespace first.
        // the parse tree wraps the target in Spark's own
        // validate-existing-rows Filter scan — the engine's
        // addConstraint does its own pre-validation, so only the
        // relation underneath matters here
        case ad @ AddCheckConstraint(child, chk) =>
          val target = child match {
            case org.apache.spark.sql.catalyst.plans.logical
                .Filter(_, u: UnresolvedRelation) => Some(u)
            case u: UnresolvedRelation => Some(u)
            case _ => None
          }
          target.flatMap(u => partsSpec(u.multipartIdentifier)
            .map(s => (u, s))) match {
            case Some((u, (path, v))) =>
              val ident = u.multipartIdentifier.mkString(".")
              require(v < 0,
                s"cannot ALTER time-travel version v$v of $ident — " +
                  "snapshots are immutable")
              require(!chk.userProvidedCharacteristic.enforced.contains(false),
                s"ADD CONSTRAINT on $ident: NOT ENFORCED is refused — every " +
                  "graft CHECK binds every writer (drop the clause)")
              AddConstraintCommand(ident, path, chk.name, chk.condition)
            case None => ad
          }
        case dcon @ DropConstraintPlan(u: UnresolvedTable, name,
            ifExists, cascade) =>
          val ident = u.multipartIdentifier.mkString(".")
          alterSpec(u, "ALTER") match {
            case Some(path) =>
              require(!cascade,
                s"DROP CONSTRAINT on $ident: CASCADE is meaningless here — " +
                  "CHECK constraints have no dependents")
              DropConstraintCommand(ident, path, name, ifExists)
            case None => dcon
          }
        // ---- ANALYZE TABLE graft.<name> COMPUTE STATISTICS FOR
        // COLUMNS … — the stats backfill (r14): write paths collect at
        // write time only, so a column that started mattering later
        // has no skipping power over old files until ANALYZE catches
        // them up.
        case an @ AnalyzeColumn(u: UnresolvedTableOrView, colNames, all) =>
          partsSpec(u.multipartIdentifier) match {
            case Some((path, v)) =>
              val ident = u.multipartIdentifier.mkString(".")
              require(v < 0,
                s"cannot ANALYZE time-travel version v$v of $ident — " +
                  "stats publish as a new version of the HEAD")
              AnalyzeCommand(ident, path,
                if (all) Nil else colNames.getOrElse(Nil))
            case None => an
          }
        case at @ AnalyzeTable(u: UnresolvedTableOrView, _, _)
            if partsSpec(u.multipartIdentifier).isDefined =>
          throw new IllegalArgumentException(
            s"ANALYZE TABLE ${u.multipartIdentifier.mkString(".")} COMPUTE " +
              "STATISTICS: row/byte totals are already recorded per file " +
              "at every write — use COMPUTE STATISTICS FOR COLUMNS c1, … " +
              "(or FOR ALL COLUMNS) to backfill skipping stats")
        // ---- CREATE TABLE graft.<name> — the SQL bootstrap (r13):
        // only the 2-part graft namespace is claimed; `CREATE TABLE t`
        // stays with the session catalog.
        case ct: CreateTable if ddlIdent(ct.name).isDefined =>
          val name = ddlIdent(ct.name).get
          val ident = s"graft.$name"
          val fields = v1Fields("CREATE TABLE", ident, ct.columns, session)
          require(fields.nonEmpty, s"CREATE TABLE $ident needs a column list")
          val (loc, props, cons) = createSpec(ident, ct.tableSpec)
          val (clusterBy, partT) = clusterSplit(ident, ct.partitioning)
          CreateCommand(ident, name, StructType(fields),
            partT.map(transformSpelling(_, ident)), loc, props,
            cons, ct.ignoreIfExists, query = None, clusterBy = clusterBy)
        case cta: CreateTableAsSelect if ddlIdent(cta.name).isDefined =>
          val name = ddlIdent(cta.name).get
          val ident = s"graft.$name"
          require(cta.writeOptions.isEmpty,
            s"CREATE TABLE $ident AS: write OPTIONS are unsupported")
          val (loc, props, cons) = createSpec(ident, cta.tableSpec)
          val (clusterBy, partT) = clusterSplit(ident, cta.partitioning)
          CreateCommand(ident, name, new StructType(),
            partT.map(transformSpelling(_, ident)), loc, props,
            cons, cta.ignoreIfExists, query = Some(cta.query),
            clusterBy = clusterBy)
        // ---- [CREATE OR] REPLACE TABLE graft.<name> — the atomic
        // table swap (r16): ONE overwrite version replaces schema,
        // layout, data, AND the CHECK-constraint set; history and
        // time travel reach the pre-replace table, a failed query
        // leaves it untouched. OR CREATE falls through to the CREATE
        // bootstrap when the table doesn't exist yet.
        case rt: ReplaceTable if ddlIdent(rt.name).isDefined =>
          val name = ddlIdent(rt.name).get
          val ident = s"graft.$name"
          val fields = v1Fields("REPLACE TABLE", ident, rt.columns, session)
          require(fields.nonEmpty, s"REPLACE TABLE $ident needs a column list")
          val (loc, props, cons) = createSpec(ident, rt.tableSpec)
          val (clusterBy, partT) = clusterSplit(ident, rt.partitioning)
          ReplaceCommand(ident, name, StructType(fields),
            partT.map(transformSpelling(_, ident)), loc, props,
            cons, rt.orCreate, query = None, clusterBy = clusterBy)
        case rta: ReplaceTableAsSelect if ddlIdent(rta.name).isDefined =>
          val name = ddlIdent(rta.name).get
          val ident = s"graft.$name"
          require(rta.writeOptions.isEmpty,
            s"REPLACE TABLE $ident AS: write OPTIONS are unsupported")
          val (loc, props, cons) = createSpec(ident, rta.tableSpec)
          val (clusterBy, partT) = clusterSplit(ident, rta.partitioning)
          ReplaceCommand(ident, name, new StructType(),
            partT.map(transformSpelling(_, ident)), loc, props,
            cons, rta.orCreate, query = Some(rta.query),
            clusterBy = clusterBy)
        // ---- DROP TABLE graft.<name> — external-table semantics: the
        // registration goes, the directory stays (expire/vacuum is the
        // only way bytes die).
        case dt: DropTable if ddlIdent(dt.child).isDefined =>
          val name = ddlIdent(dt.child).get
          require(!dt.purge,
            s"DROP TABLE graft.$name PURGE is unsupported — a graft DROP " +
              "only unregisters the name; reclaim bytes with expire")
          DropCommand(name, dt.ifExists)
        // ---- CREATE/ALTER/DROP/SHOW VIEW graft.<name> (r16) — the
        // view face; only the 2-part graft namespace is claimed (temp
        // views and session-catalog views stay with Spark).
        case cv: org.apache.spark.sql.catalyst.plans.logical.CreateView
            if ddlIdent(cv.child).isDefined =>
          val name = ddlIdent(cv.child).get
          require(cv.userSpecifiedColumns.isEmpty,
            s"CREATE VIEW graft.$name: a column list is unsupported — " +
              "alias the columns in the SELECT")
          require(cv.properties.isEmpty && cv.comment.isEmpty &&
              cv.collation.isEmpty,
            s"CREATE VIEW graft.$name: TBLPROPERTIES / COMMENT / " +
              "COLLATION clauses are unsupported")
          val sql = cv.originalText.getOrElse(
            throw new IllegalArgumentException(
              s"CREATE VIEW graft.$name needs the query's original text"))
          CreateViewCommand(name, sql, cv.allowExisting, cv.replace)
        case dv @ org.apache.spark.sql.catalyst.plans.logical.DropView(
            child, ifExists) =>
          ddlIdent(child) match {
            case Some(name) => DropViewCommand(name, ifExists)
            case None => dv
          }
        case av @ org.apache.spark.sql.catalyst.plans.logical.AlterViewAs(
            child, text, _) if ddlIdent(child).isDefined =>
          AlterViewAsCommand(ddlIdent(child).get, text)
        case sv @ org.apache.spark.sql.catalyst.plans.logical.ShowViews(
            ns, pattern, _) =>
          ns match {
            case n: org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace
                if n.multipartIdentifier.map(norm) == Seq("graft") =>
              ShowViewsCommand(pattern)
            case _ => sv
          }
        // ---- CACHE/UNCACHE TABLE graft.<name> (r16) — version-keyed
        // block caching: the cache key is the snapshot version, so
        // every write invalidates by construction (see
        // ManifestTable.read); LAZY defers materialization.
        case ct0: org.apache.spark.sql.catalyst.plans.logical.CacheTable
            if partsSpec(ct0.multipartIdentifier).isDefined =>
          val ident = ct0.multipartIdentifier.mkString(".")
          val (path, v) = partsSpec(ct0.multipartIdentifier).get
          require(v < 0,
            s"cannot CACHE time-travel version v$v of $ident — the cache " +
              "keys on the LIVE head (old versions would hoard memory)")
          require(ct0.options.isEmpty,
            s"CACHE TABLE $ident: OPTIONS are unsupported (blocks persist " +
              "at Spark's default storage level)")
          CacheCommand(ident, path, lazyCache = ct0.isLazy)
        case ut0: org.apache.spark.sql.catalyst.plans.logical.UncacheTable =>
          ut0.table match {
            case u: UnresolvedRelation
                if partsSpec(u.multipartIdentifier).isDefined =>
              UncacheCommand(partsSpec(u.multipartIdentifier).get._1)
            case _ => ut0
          }
        // ---- SHOW COLUMNS (FROM|IN) graft.<name> (r16) — the
        // recorded column names, top-level, in recorded order.
        case sc0 @ org.apache.spark.sql.catalyst.plans.logical.ShowColumns(
            child, _, _) =>
          ddlIdent(child) match {
            case Some(name) => ShowColumnsCommand(name)
            case None => sc0
          }
        // ---- SHOW TBLPROPERTIES graft.<name> ['key'] (r16) — the
        // config sidecar's recorded properties (the read twin of the
        // refused SET/UNSET mutators).
        case sp0 @ org.apache.spark.sql.catalyst.plans.logical
            .ShowTableProperties(child, key, _) =>
          ddlIdent(child) match {
            case Some(name) => ShowTblPropertiesCommand(name, key)
            case None => sp0
          }
        // ---- DESCRIBE TABLE graft.<name> — the recorded schema, the
        // partition layout (hidden transforms included), and with
        // EXTENDED the table's whole metadata face.
        case dr: DescribeRelation if ddlIdent(dr.relation).isDefined =>
          require(dr.partitionSpec.isEmpty,
            "DESCRIBE with a PARTITION spec is unsupported on graft tables")
          DescribeCommand(ddlIdent(dr.relation).get, dr.isExtended)
        // ---- SHOW CREATE TABLE graft.<name> — the DDL round-trip:
        // the emitted statement re-creates the table through the
        // CREATE path above (schema, layout incl. hidden transforms,
        // location, properties, CHECK constraints).
        case sct: ShowCreateTable if ddlIdent(sct.child).isDefined =>
          ShowCreateCommand(ddlIdent(sct.child).get)
        // ---- SHOW PARTITIONS graft.<name> — the O(metadata)
        // partition census: values, file counts, rows, bytes, all
        // from the manifest (paths + per-file stats), zero data read.
        case sp @ org.apache.spark.sql.catalyst.plans.logical
            .ShowPartitions(child, spec, _) if ddlIdent(child).isDefined =>
          require(spec.isEmpty,
            "SHOW PARTITIONS with a partial spec is unsupported on " +
              "graft tables — filter the full listing instead")
          ShowPartitionsCommand(ddlIdent(child).get)
        // ---- SHOW TABLES IN graft — the registry listing.
        case st: ShowTables
            if (st.namespace match {
              case ns: org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace =>
                ns.multipartIdentifier.map(norm) == Seq("graft")
              case _ => false
            }) =>
          ShowTablesCommand(st.pattern)
      }
    }
  }

  /** `CREATE TABLE graft.<name> (…) [USING graft] [PARTITIONED BY …]
    * [LOCATION …] [TBLPROPERTIES …]` and the `AS SELECT …` (CTAS)
    * variant — the SQL bootstrap the catalog face lacked (r12 verdict
    * gap #1): until now a table had to exist via the Scala API before
    * SQL could touch it. The statement maps onto the engine's own
    * primitives, in order:
    *
    *  1. path = LOCATION, or `<warehouse>/<name>` when
    *     [[GraftCatalog.warehouse]] is set — refused otherwise (a
    *     manifest table IS a directory; the path must be explicit);
    *  2. TBLPROPERTIES (`graft.statsColumns`) and the table comment
    *     land in the config sidecar BEFORE the first commit, so stats
    *     collection begins at the first insert even though an empty
    *     table has no per-file stats to remember the set in;
    *  3. v1 = [[ManifestTable.commit]] of the declared schema with
    *     zero rows (a files-less snapshot with a recorded schema is a
    *     real state) — or of the CTAS query's rows, laid out by
    *     PARTITIONED BY (hidden transforms included) with stats
    *     collected per the config;
    *  4. CHECK constraints attach via [[ManifestTable.addConstraint]]
    *     (CTAS rows pre-validate BEFORE anything is written — a
    *     refused create leaves no data to vacuum);
    *  5. the name registers, making `graft.<name>` readable/writable
    *     by every later statement in the JVM.
    *
    * IF NOT EXISTS: an existing table (the path has manifests)
    * re-registers the name and changes nothing — but a name already
    * registered to a DIFFERENT path is always a loud conflict. */
  final case class CreateCommand(ident: String, name: String,
      tableSchema: StructType, partitionBy: Seq[String], location: Option[String],
      props: Map[String, String], checks: Seq[(String, String)],
      ignoreIfExists: Boolean, query: Option[LogicalPlan],
      clusterBy: Seq[String] = Nil)
    extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = query.toSeq
    override def run(session: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
      val path = location.orElse(warehouseRoot.map(w =>
        w.stripSuffix("/") + "/" + name)).getOrElse(
        throw new IllegalArgumentException(
          s"CREATE TABLE $ident needs a LOCATION (or set " +
            "GraftCatalog.warehouse for a default root)"))
      lookup(name).foreach(p => require(p == path,
        s"CREATE TABLE $ident: the name is already registered to $p — " +
          s"unregister it before re-creating at $path"))
      if (ManifestTable.versions(session, path).nonEmpty) {
        if (ignoreIfExists) { register(name, path); return Nil }
        throw new IllegalArgumentException(
          s"CREATE TABLE $ident: $path already holds a table " +
            "(IF NOT EXISTS to adopt it, or pick a fresh LOCATION)")
      }
      // an IDENTITY partition column would defeat its own allocation:
      // partition columns carry no per-file stats (their values live
      // in the dir key), so the high-water mark could never sync —
      // and every row is unique anyway, one dir per row
      tableSchema.fields.filter(f => ColumnSpecs.identityOf(f).isDefined)
        .foreach(f => require(!partitionBy.map(norm).contains(norm(f.name)),
          s"CREATE TABLE $ident: IDENTITY column '${f.name}' cannot be a " +
            "partition column — per-value dirs and no stats to sync the " +
            "high-water mark from"))
      val df = query match {
        case Some(q) => PlanBridge.ofRows(session, q)
        case None => session.createDataFrame(
          java.util.Collections.emptyList[Row](), tableSchema)
      }
      props.get("graft.statsColumns").foreach { s =>
        val names = df.columns.map(norm).toSet
        val bad = s.split(",").map(_.trim).filter(_.nonEmpty)
          .filterNot(c => names.contains(norm(c)))
        require(bad.isEmpty,
          s"CREATE TABLE $ident: graft.statsColumns names unknown " +
            s"column(s) ${bad.mkString(", ")}")
      }
      // CLUSTER BY (r16): validated against the table's columns,
      // recorded in the config sidecar; the columns join the
      // stats-tracked set (skipping on the clustered dims is the
      // point) and plain OPTIMIZE re-clusters on them
      val badCluster = clusterBy.filterNot(c =>
        df.columns.map(norm).contains(norm(c)))
      require(badCluster.isEmpty,
        s"CREATE TABLE $ident: CLUSTER BY names unknown column(s) " +
          badCluster.mkString(", "))
      val propsAll = props ++ (if (clusterBy.isEmpty) Map.empty
        else Map("graft.clusterBy" -> clusterBy.mkString(",")))
      // CTAS rows validate the declared CHECKs BEFORE any write — the
      // addConstraint below re-validates per its own contract, but a
      // violating query must refuse with zero bytes on disk
      checks.foreach { case (n, sql) =>
        require(df.filter(not(coalesce(expr(sql), lit(true)))).isEmpty,
          s"CREATE TABLE $ident: the AS SELECT rows violate CHECK " +
            s"constraint $n ($sql)")
      }
      // config precedes v1 (commit consults it for stats columns).
      // The write is atomic-exclusive and content-keyed (ADVICE r13):
      // an identical racing/replayed CREATE lands idempotently, a
      // DIFFERENT statement racing this path refuses loudly, and a
      // winner that published v1 first surfaces here as
      // ConcurrentCreateException — taken as the adopt path below,
      // exactly like a lost v1 publish, instead of escaping as an
      // opaque version-check failure
      try ManifestTable.writeTableConfig(session, path, propsAll)
      catch {
        case e: ManifestTable.ConcurrentCreateException =>
          if (ignoreIfExists &&
              ManifestTable.versions(session, path).nonEmpty) {
            register(name, path); return Nil
          }
          throw new IllegalArgumentException(
            s"CREATE TABLE $ident: a concurrent CREATE won the race at " +
              s"$path (IF NOT EXISTS to adopt the winner)", e)
      }
      // exactly-once under a CREATE race: two concurrent CREATEs at
      // the same fresh path must produce ONE v1 — without the txn
      // gate, the loser's commit would APPEND as v2 (duplicating the
      // CTAS rows). The txn records ("sql:create", 1) on the winner's
      // v1; the loser's gate sees it BEFORE writing any data and
      // adopts the winner's table, exactly like a replayed micro-batch
      ManifestTable.commit(session, path, df, SaveMode.Append,
        partitionBy = partitionBy, txn = Some(("sql:create", 1L)))
      checks.foreach { case (n, sql) =>
        ManifestTable.addConstraint(session, path, n, sql) }
      register(name, path)
      Nil
    }
  }

  /** `[CREATE OR] REPLACE TABLE graft.<name> (…)/(AS SELECT …)` —
    * the atomic table swap (r16, the r15 verdict's optional ask):
    *
    *  - the replacement image (declared empty schema, or the CTAS
    *    rows) publishes as ONE overwrite version that swaps schema,
    *    partition layout (hidden transforms included), data, AND the
    *    CHECK-constraint set together — `constraintsOverride` rides
    *    the same conditional publish as the data, so no observer ever
    *    sees the new data under the old constraints or vice versa;
    *  - history and time travel reach the pre-replace table
    *    (`graft.<name>@v<N>`), and a failed query/violated CHECK
    *    leaves the table untouched — the batch validates against the
    *    DECLARED set before anything is written;
    *  - `CREATE OR REPLACE` on a missing table falls through to the
    *    CREATE bootstrap; plain `REPLACE TABLE` refuses (ANSI);
    *  - the name must keep its path: REPLACE swaps content IN PLACE,
    *    never moves a table (a LOCATION naming a different directory
    *    is a loud conflict — that statement is a CREATE);
    *  - TBLPROPERTIES may be repeated verbatim (idempotent re-runs)
    *    but not changed — the config sidecar is create-time by
    *    design; stats evolve via ANALYZE.
    *
    * At 100 TB: the swap writes O(new image) and the old snapshot's
    * files carry untouched in history until expire — exactly the
    * overwrite-commit cost, with zero extra passes for the
    * constraint/layout swap (pure manifest metadata). */
  final case class ReplaceCommand(ident: String, name: String,
      tableSchema: StructType, partitionBy: Seq[String],
      location: Option[String], props: Map[String, String],
      checks: Seq[(String, String)], orCreate: Boolean,
      query: Option[LogicalPlan], clusterBy: Seq[String] = Nil)
    extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = query.toSeq
    override def run(session: SparkSession): Seq[Row] = {
      val registered = lookup(name)
      val path = location.orElse(registered).orElse(warehouseRoot.map(w =>
        w.stripSuffix("/") + "/" + name)).getOrElse(
        throw new IllegalArgumentException(
          s"REPLACE TABLE $ident needs a LOCATION (or set " +
            "GraftCatalog.warehouse for a default root)"))
      registered.foreach(p => require(p == path,
        s"REPLACE TABLE $ident: the name is registered to $p, not $path — " +
          "REPLACE swaps content in place, never moves a table"))
      if (ManifestTable.versions(session, path).isEmpty) {
        if (!orCreate) throw new IllegalArgumentException(
          s"REPLACE TABLE $ident: no table at $path — use CREATE OR " +
            "REPLACE TABLE (or CREATE TABLE) to bootstrap one" +
            hintRenamed(name))
        return CreateCommand(ident, name, tableSchema, partitionBy,
          Some(path), props, checks, ignoreIfExists = false, query,
          clusterBy = clusterBy).run(session)
      }
      val propsAll = props ++ (if (clusterBy.isEmpty) Map.empty
        else Map("graft.clusterBy" -> clusterBy.mkString(",")))
      if (propsAll.nonEmpty) {
        val have = ManifestTable.tableConfig(session, path)
        require(propsAll == have,
          s"REPLACE TABLE $ident: TBLPROPERTIES/CLUSTER BY differ from " +
            s"the recorded config ($have) — the config sidecar is " +
            "create-time; stats evolve via ANALYZE, constraints via the " +
            "CONSTRAINT clause")
      }
      tableSchema.fields.filter(f => ColumnSpecs.identityOf(f).isDefined)
        .foreach(f => require(!partitionBy.map(norm).contains(norm(f.name)),
          s"REPLACE TABLE $ident: IDENTITY column '${f.name}' cannot be a " +
            "partition column — per-value dirs and no stats to sync the " +
            "high-water mark from"))
      val df = query match {
        case Some(q) => PlanBridge.ofRows(session, q)
        case None => session.createDataFrame(
          java.util.Collections.emptyList[Row](), tableSchema)
      }
      // ONE atomic version: the declared CHECKs validate the
      // replacement image inside commit (before any write) and
      // publish with it — an empty declared set CLEARS the old one
      // (REPLACE semantics: nothing from the old table survives
      // except its history)
      ManifestTable.commit(session, path, df, SaveMode.Overwrite,
        partitionBy = partitionBy,
        constraintsOverride = Some(checks.toMap))
      register(name, path)
      Nil
    }
  }

  /** `DROP TABLE graft.<name>` — unregisters the name; the directory
    * and every byte in it stay (external-table semantics — expire is
    * the only byte-reclaim path, and PURGE is refused upstream). */
  final case class DropCommand(name: String, ifExists: Boolean)
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      if (lookup(name).isEmpty) {
        if (ifExists) return Nil
        throw new IllegalArgumentException(
          s"DROP TABLE graft.$name: no such registered table" + hintRenamed(name))
      }
      unregister(name)
      Nil
    }
  }

  /** `CREATE [OR REPLACE] VIEW graft.<name> AS SELECT …` (r16) — a
    * session-registered NAMED QUERY: the definition is stored as TEXT
    * and expands at analysis time, so the view always reads the
    * CURRENT state of every table it references (time travel, renames
    * and schema evolution flow through with zero view-side machinery).
    * The definition must ANALYZE at the statement — a view whose
    * references are already broken is refused here, not at first use —
    * and a self-referencing definition refuses as a cycle. Views and
    * tables share the `graft` namespace (a collision refuses loudly);
    * writes against a view refuse pointing at its tables. */
  final case class CreateViewCommand(name: String, sql: String,
      allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      require(lookup(name).isEmpty,
        s"CREATE VIEW graft.$name: the name is a registered TABLE — " +
          "views and tables share the graft namespace")
      val prior = lookupView(name)
      if (prior.isDefined && !replace) {
        if (allowExisting) return Nil
        throw new IllegalArgumentException(
          s"CREATE VIEW graft.$name: a view with this name exists " +
            "(OR REPLACE to swap it, IF NOT EXISTS to keep it)")
      }
      registerView(name, sql)
      try {
        PlanBridge.ofRows(session, session.sessionState.sqlParser
          .parsePlan(s"SELECT * FROM graft.`$name`"))
        ()
      } catch { case e: Exception =>
        prior match {
          case Some(p) => registerView(name, p)
          case None => unregisterView(name)
        }
        throw new IllegalArgumentException(
          s"CREATE VIEW graft.$name: the definition does not analyze — " +
            e.getMessage, e)
      }
      Nil
    }
  }

  /** `ALTER VIEW graft.<name> AS SELECT …` — swap the definition;
    * same analyze-now discipline, same rollback on refusal. */
  final case class AlterViewAsCommand(name: String, sql: String)
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      val prior = lookupView(name).getOrElse(throw new IllegalArgumentException(
        s"ALTER VIEW graft.$name: no such view" +
          (if (lookup(name).isDefined) " — that name is a TABLE" else "")))
      registerView(name, sql)
      try {
        PlanBridge.ofRows(session, session.sessionState.sqlParser
          .parsePlan(s"SELECT * FROM graft.`$name`"))
        ()
      } catch { case e: Exception =>
        registerView(name, prior)
        throw new IllegalArgumentException(
          s"ALTER VIEW graft.$name: the new definition does not analyze — " +
            e.getMessage, e)
      }
      Nil
    }
  }

  /** `CREATE MATERIALIZED VIEW graft.<name> [LOCATION '…'] AS <query>`
    * (r16) — a manifest TABLE whose defining query is recorded in the
    * config sidecar: the initial image commits at CREATE, and `REFRESH
    * MATERIALIZED VIEW` re-runs the text as ONE atomic overwrite
    * version (readers never see a partial refresh; the pre-refresh
    * image stays time-travelable; a failed refresh leaves the old
    * image live). Every read-side capability of a table — stats
    * skipping, DESCRIBE, history, clone, OPTIMIZE/VACUUM maintenance —
    * works unchanged; direct DML refuses (the defining query is the
    * single source of truth; see [[requireNotMView]]). At 100 TB:
    * refresh cost is O(defining query) + O(new image) writes, the old
    * image carries in history until expire — the honest full-refresh
    * contract (incremental maintenance would silently change
    * semantics for non-distributive queries). */
  final case class CreateMaterializedViewCommand(name: String, sql: String,
      location: Option[String], ignoreIfExists: Boolean)
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      val ident = s"graft.$name"
      require(lookupView(name).isEmpty,
        s"CREATE MATERIALIZED VIEW $ident: the name is a plain VIEW — " +
          "views and tables share the graft namespace")
      val path = location.orElse(warehouseRoot.map(w =>
        w.stripSuffix("/") + "/" + name)).getOrElse(
        throw new IllegalArgumentException(
          s"CREATE MATERIALIZED VIEW $ident needs a LOCATION (or set " +
            "GraftCatalog.warehouse for a default root)"))
      lookup(name).foreach(p => require(p == path,
        s"CREATE MATERIALIZED VIEW $ident: the name is already " +
          s"registered to $p"))
      if (ManifestTable.versions(session, path).nonEmpty) {
        if (ignoreIfExists) { register(name, path); return Nil }
        throw new IllegalArgumentException(
          s"CREATE MATERIALIZED VIEW $ident: $path already holds a table " +
            "(IF NOT EXISTS to adopt it, or pick a fresh LOCATION)")
      }
      val df = PlanBridge.ofRows(session,
        session.sessionState.sqlParser.parseQuery(sql))
      try ManifestTable.writeTableConfig(session, path,
        Map("graft.mview" -> sql))
      catch {
        case e: ManifestTable.ConcurrentCreateException =>
          if (ignoreIfExists &&
              ManifestTable.versions(session, path).nonEmpty) {
            register(name, path); return Nil
          }
          throw new IllegalArgumentException(
            s"CREATE MATERIALIZED VIEW $ident: a concurrent CREATE won " +
              s"the race at $path (IF NOT EXISTS to adopt the winner)", e)
      }
      ManifestTable.commit(session, path, df, SaveMode.Append,
        txn = Some(("sql:create-mview", 1L)))
      register(name, path)
      Nil
    }
  }

  /** `REFRESH MATERIALIZED VIEW graft.<name>` — re-run the recorded
    * defining query, publish as ONE overwrite version. */
  /** `REFRESH MATERIALIZED VIEW graft.<name> [INCREMENTAL]` (r17):
    * plain = pinned full recompute (now also recording the
    * base-version marker for qualifying shapes); INCREMENTAL = the
    * dirty-group rescan ([[MviewIncremental]]) — O(churned groups),
    * not O(base) — returning (version, mode) where mode reports
    * incremental / full (self-priming) / noop. */
  final case class RefreshMaterializedViewCommand(name: String,
      incremental: Boolean = false) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "version", org.apache.spark.sql.types.IntegerType,
        nullable = false)()) ++
        (if (incremental) Seq(strAttr("mode")) else Nil)
    override def run(session: SparkSession): Seq[Row] = {
      val path = lookup(name).getOrElse(throw new IllegalArgumentException(
        s"REFRESH MATERIALIZED VIEW graft.$name: no such registered " +
          "table" + hintRenamed(name)))
      val sql = ManifestTable.tableConfig(session, path).get("graft.mview")
        .getOrElse(throw new IllegalArgumentException(
          s"graft.$name is not a materialized view — it records no " +
            "defining query (REFRESH applies to CREATE MATERIALIZED " +
            "VIEW tables only)"))
      if (incremental) {
        val (v, mode) = MviewIncremental.incrementalRefresh(
          session, name, path, sql)
        Seq(Row(v, mode))
      } else Seq(Row(MviewIncremental.fullRefresh(session, path, sql)))
    }
  }

  /** Direct DML aimed at a materialized view refuses — its defining
    * query is the single source of truth; a hand-edit would silently
    * vanish at the next REFRESH. One tiny config read per statement. */
  private[graft] def requireNotMView(session: SparkSession, path: String,
                                     ident: String, what: String): Unit =
    require(!ManifestTable.tableConfig(session, path).contains("graft.mview"),
      s"$what on $ident: it is a MATERIALIZED VIEW — edit its source " +
        "tables and REFRESH MATERIALIZED VIEW (a direct edit would " +
        "silently vanish at the next refresh)")

  /** `CACHE [LAZY] TABLE graft.<name>` — version-keyed block caching
    * (r16): see [[ManifestTable.cacheTable]]. */
  final case class CacheCommand(ident: String, path: String,
      lazyCache: Boolean) extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      ManifestTable.cacheTable(session, path, eager = !lazyCache)
      Nil
    }
  }

  /** `UNCACHE TABLE graft.<name>` — release the cached blocks;
    * a never-cached table is a no-op (Spark's own semantics). */
  final case class UncacheCommand(path: String) extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      ManifestTable.uncacheTable(session, path)
      Nil
    }
  }

  /** `SHOW COLUMNS FROM graft.<name>` — recorded top-level column
    * names in recorded order (views answer through one analysis of
    * their expansion). */
  final case class ShowColumnsCommand(name: String)
    extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(strAttr("col_name"))
    override def run(session: SparkSession): Seq[Row] = {
      lookupView(name).foreach { _ =>
        return PlanBridge.ofRows(session, session.sessionState.sqlParser
            .parsePlan(s"SELECT * FROM graft.`$name`"))
          .columns.toSeq.map(Row(_))
      }
      val path = lookup(name).getOrElse(throw new IllegalArgumentException(
        s"SHOW COLUMNS FROM graft.$name: no such registered table" +
          hintRenamed(name)))
      ManifestTable.snapshotSchema(session, path)
        .map(_.fieldNames.toSeq).getOrElse(Nil).map(Row(_))
    }
  }

  /** `SHOW TBLPROPERTIES graft.<name> ['key']` — the config
    * sidecar's recorded properties (Spark's (key, value) shape); a
    * requested key that was never recorded answers with Spark's own
    * "does not have property" value rather than an empty set. */
  final case class ShowTblPropertiesCommand(name: String,
      key: Option[String]) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(strAttr("key"), strAttr("value"))
    override def run(session: SparkSession): Seq[Row] = {
      val path = lookup(name).getOrElse(throw new IllegalArgumentException(
        s"SHOW TBLPROPERTIES graft.$name: no such registered table" +
          hintRenamed(name)))
      val props = ManifestTable.tableConfig(session, path)
      key match {
        case Some(k) => Seq(Row(k, props.getOrElse(k,
          s"Table graft.$name does not have property: $k")))
        case None => props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
      }
    }
  }

  /** `DROP VIEW [IF EXISTS] graft.<name>` — unregister the name. */
  final case class DropViewCommand(name: String, ifExists: Boolean)
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      if (lookupView(name).isEmpty) {
        if (ifExists) return Nil
        throw new IllegalArgumentException(
          s"DROP VIEW graft.$name: no such view" +
            (if (lookup(name).isDefined)
               " — that name is a TABLE (DROP TABLE)" else ""))
      }
      unregisterView(name)
      Nil
    }
  }

  /** `SHOW VIEWS IN graft [LIKE 'pat*']` — the view-registry listing
    * (Spark's SHOW VIEWS output shape). */
  final case class ShowViewsCommand(pattern: Option[String])
    extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(strAttr("namespace"), strAttr("viewName"),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "isTemporary", org.apache.spark.sql.types.BooleanType,
          nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      maybeLoadPersisted() // a fresh process lists the durable views too
      val re = pattern.map(p => p.split("\\|").map(a =>
        java.util.regex.Pattern.quote(a).replace("*", "\\E.*\\Q"))
        .mkString("(?i)(", ")|(", ")").r)
      registeredViews.toSeq.sortBy(_._1).collect {
        case (n, _) if re.forall(_.matches(n)) => Row("graft", n, false)
      }
    }
  }

  private def strAttr(name: String): org.apache.spark.sql.catalyst.expressions.Attribute =
    org.apache.spark.sql.catalyst.expressions.AttributeReference(
      name, org.apache.spark.sql.types.StringType, nullable = true)()

  /** `DESCRIBE [EXTENDED] TABLE graft.<name>` — the recorded schema in
    * Spark's own (col_name, data_type, comment) shape, the partition
    * layout with hidden transforms spelled out, and under EXTENDED the
    * table's whole metadata face: path, version, file count, protocol
    * features, CHECK constraints, and config properties. Reads ONLY
    * manifests — O(metadata) at any table size. */
  final case class DescribeCommand(name: String, extended: Boolean)
    extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(strAttr("col_name"), strAttr("data_type"), strAttr("comment"))
    override def run(session: SparkSession): Seq[Row] = {
      val path = lookup(name).getOrElse(throw new IllegalArgumentException(
        s"DESCRIBE graft.$name: no such registered table" + hintRenamed(name)))
      val sch = ManifestTable.snapshotSchema(session, path).getOrElse(
        new StructType())
      val cols = sch.fields.toSeq.map { f =>
        // column specs surface in the comment slot (r16) — the one
        // human-facing column DESCRIBE has for per-column facts
        val spec = ColumnSpecs.identityOf(f).map(is =>
            s"generated ${if (is.byDefault) "by default" else "always"} as " +
              s"identity (start ${is.start} step ${is.step}" +
              is.hwm.map(h => s", high-water mark $h").getOrElse("") + ")")
          .orElse(ColumnSpecs.generatedOf(f).map(g => s"generated always as ($g)"))
          .orElse(ColumnSpecs.defaultOf(f).map(d => s"default $d"))
        val cmt = if (f.metadata.contains("comment"))
          Some(f.metadata.getString("comment")) else None
        Row(f.name, f.dataType.simpleString,
          (cmt.toSeq ++ spec.toSeq).reduceOption(_ + "; " + _).orNull)
      }
      val partBy = ManifestTable.partitionColumns(session, path)
      val transforms = ManifestTable.partitionTransforms(session, path)
      val partRows =
        if (partBy.isEmpty) Nil
        else Row("# Partition Information", "", null) +: partBy.map { p =>
          transforms.find(_.target == p) match {
            case Some(pt) =>
              val spelled = pt.kind match {
                case "bucket" => s"bucket(${pt.n}, ${pt.source})"
                case "truncate" => s"truncate(${pt.n}, ${pt.source})"
                case k => s"$k(${pt.source})"
              }
              Row(p, s"hidden: $spelled", null)
            case None => Row(p, sch.fields.find(_.name == p)
              .map(_.dataType.simpleString).getOrElse(""), null)
          }
        }
      val extRows =
        if (!extended) Nil
        else {
          val v = ManifestTable.currentVersion(session, path)
          val files = ManifestTable.snapshotFiles(session, path)
          Seq(Row("# Detailed Table Information", "", null),
            Row("Name", s"graft.$name", null),
            Row("Location", path, null),
            Row("Version", v.toString, null),
            Row("Files", files.size.toString, null),
            Row("Features", ManifestTable.tableFeatures(session, path)
              .mkString(", "), null)) ++
            ManifestTable.checkConstraints(session, path, v).toSeq.sorted
              .map { case (n, sql) => Row(s"Constraint $n", sql, null) } ++
            ManifestTable.tableConfig(session, path).toSeq.sorted
              .map { case (k, vl) => Row(s"Property $k", vl, null) }
        }
      cols ++ partRows ++ extRows
    }
  }

  /** `DESCRIBE DETAIL graft.<name>` — the Delta one-row detail: the
    * table's physical identity as a single machine-consumable row,
    * all O(metadata) (the file/byte totals come from the manifest's
    * recorded sizes, not a directory walk). `size_in_bytes` follows
    * ShowPartitions' all-or-null rule (ADVICE r14): a snapshot holding
    * any legacy file without a recorded size reports null rather than
    * a silent undercount. */
  final case class DescribeDetailCommand(name: String)
    extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(strAttr("format"), strAttr("name"), strAttr("location"),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "version", org.apache.spark.sql.types.IntegerType,
          nullable = false)(),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "num_files", org.apache.spark.sql.types.IntegerType,
          nullable = false)(),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "size_in_bytes", org.apache.spark.sql.types.LongType,
          nullable = true)(),
        strAttr("partition_columns"), strAttr("features"),
        strAttr("properties"))
    override def run(session: SparkSession): Seq[Row] = {
      val path = lookup(name).getOrElse(throw new IllegalArgumentException(
        s"DESCRIBE DETAIL graft.$name: no such registered table" + hintRenamed(name)))
      val v = ManifestTable.currentVersion(session, path)
      val files = ManifestTable.snapshotFiles(session, path)
      val partBy = ManifestTable.partitionColumns(session, path)
      val transforms = ManifestTable.partitionTransforms(session, path)
      val spelled = partBy.map(p => transforms.find(_.target == p) match {
        case Some(pt) => pt.kind match {
          case "bucket" => s"bucket(${pt.n}, ${pt.source})"
          case "truncate" => s"truncate(${pt.n}, ${pt.source})"
          case k => s"$k(${pt.source})"
        }
        case None => p
      })
      val sizes = ManifestTable.snapshotSizes(session, path)
      val perFile = files.map(sizes.get)
      Seq(Row("graft", s"graft.$name", path, v, files.size,
        if (perFile.forall(_.isDefined)) perFile.flatten.sum else null,
        spelled.mkString(", "),
        ManifestTable.tableFeatures(session, path).mkString(", "),
        ManifestTable.tableConfig(session, path).toSeq.sorted
          .map { case (k, vl) => s"$k=$vl" }.mkString(", ")))
    }
  }

  /** `SHOW CREATE TABLE graft.<name>` — the statement that would
    * re-create the table through [[CreateCommand]]: column list with
    * CHECK constraints, PARTITIONED BY with hidden transforms spelled
    * back (`bucket(4, id)`), LOCATION, and TBLPROPERTIES from the
    * config sidecar. Renamed columns emit their LOGICAL names — the
    * round-trip creates a mapping-free table with the same logical
    * face (physical spellings are storage history, not schema). */
  final case class ShowCreateCommand(name: String)
    extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(strAttr("createtab_stmt"))
    override def run(session: SparkSession): Seq[Row] = {
      // a VIEW round-trips as its defining statement (r16)
      lookupView(name).foreach(v =>
        return Seq(Row(s"CREATE VIEW graft.$name AS\n$v")))
      val path = lookup(name).getOrElse(throw new IllegalArgumentException(
        s"SHOW CREATE TABLE graft.$name: no such registered table" + hintRenamed(name)))
      // a MATERIALIZED VIEW round-trips as its defining statement too
      ManifestTable.tableConfig(session, path).get("graft.mview").foreach(q =>
        return Seq(Row(
          s"CREATE MATERIALIZED VIEW graft.$name\nLOCATION '$path'\nAS $q")))
      val v = ManifestTable.currentVersion(session, path)
      val sch = ManifestTable.snapshotSchema(session, path).getOrElse(
        new StructType())
      val cons = ManifestTable.checkConstraints(session, path, v).toSeq.sorted
      def lit(s: String) = // \-escapes (Spark's default string lexer)
        "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
      val colLines = sch.fields.toSeq.map { f =>
        val cmt = if (f.metadata.contains("comment"))
          s" COMMENT ${lit(f.metadata.getString("comment"))}" else ""
        // column specs round-trip (r16): the replayed statement
        // re-declares DEFAULT / GENERATED / IDENTITY exactly (the
        // identity high-water mark is allocation STATE, not DDL — a
        // replayed CREATE starts a fresh table at START WITH)
        val spec = ColumnSpecs.identityOf(f).map(is =>
            s" GENERATED ${if (is.byDefault) "BY DEFAULT" else "ALWAYS"} AS " +
              s"IDENTITY (START WITH ${is.start} INCREMENT BY ${is.step})")
          .orElse(ColumnSpecs.generatedOf(f).map(g =>
            s" GENERATED ALWAYS AS ($g)"))
          .orElse(ColumnSpecs.defaultOf(f).map(d => s" DEFAULT $d"))
          .getOrElse("")
        s"  ${f.name} ${f.dataType.sql}$spec$cmt"
      } ++
        cons.map { case (n, sql) => s"  CONSTRAINT $n CHECK ($sql)" }
      val transforms = ManifestTable.partitionTransforms(session, path)
      val partBy = ManifestTable.partitionColumns(session, path).map { p =>
        transforms.find(_.target == p) match {
          case Some(pt) => pt.kind match {
            case "bucket" => s"bucket(${pt.n}, ${pt.source})"
            case "truncate" => s"truncate(${pt.n}, ${pt.source})"
            case k => s"$k(${pt.source})"
          }
          case None => p
        }
      }
      val props = ManifestTable.tableConfig(session, path)
        .filter { case (k, _) => SupportedProps.contains(k) }
        .flatMap { case (k, vl) if k == "graft.statsColumns" =>
          // the config records creation-time names; a column renamed
          // since would make the replayed statement REFUSE — emit only
          // the names the current schema still speaks (the write paths
          // apply the same filter)
          val live = sch.fieldNames.map(norm).toSet
          val kept = vl.split(",").map(_.trim)
            .filter(c => live.contains(norm(c)))
          if (kept.isEmpty) None else Some(k -> kept.mkString(", "))
        case kv => Some(kv)
        }
      val stmt = new StringBuilder()
      stmt ++= s"CREATE TABLE graft.$name (\n"
      stmt ++= colLines.mkString(",\n")
      stmt ++= "\n)"
      // the recorded table COMMENT round-trips (ADVICE r13: it used
      // to land in the config sidecar and silently vanish here)
      ManifestTable.tableConfig(session, path).get("comment")
        .foreach(c => stmt ++= s"\nCOMMENT ${lit(c)}")
      if (partBy.nonEmpty)
        stmt ++= s"\nPARTITIONED BY (${partBy.mkString(", ")})"
      // CLUSTER BY round-trips as its own clause (r16) — filtered to
      // names the current schema still speaks, the statsColumns rule
      ManifestTable.tableConfig(session, path).get("graft.clusterBy")
        .map(_.split(",").iterator.map(_.trim).filter(_.nonEmpty)
          .filter(c => sch.fieldNames.exists(_.equalsIgnoreCase(c))).toSeq)
        .filter(_.nonEmpty)
        .foreach(cb => stmt ++= s"\nCLUSTER BY (${cb.mkString(", ")})")
      stmt ++= s"\nLOCATION '$path'"
      if (props.nonEmpty)
        stmt ++= props.toSeq.sorted
          .map { case (k, vl) => s"'$k' = '$vl'" }
          .mkString("\nTBLPROPERTIES (", ", ", ")")
      Seq(Row(stmt.toString))
    }
  }

  /** `SHOW TABLES IN graft [LIKE 'pat*']` — the registry listing.
    * The pattern is Spark's SHOW glob ('*' any, '|' alternation). */
  final case class ShowTablesCommand(pattern: Option[String])
    extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(strAttr("namespace"), strAttr("tableName"), strAttr("location"))
    override def run(session: SparkSession): Seq[Row] = {
      maybeLoadPersisted() // a fresh process lists the durable names too
      val re = pattern.map(p => p.split("\\|").map(a =>
        java.util.regex.Pattern.quote(a).replace("*", "\\E.*\\Q"))
        .mkString("(?i)(", ")|(", ")").r)
      registered.toSeq.sortBy(_._1).collect {
        case (n, p) if re.forall(_.matches(n)) => Row("graft", n, p)
      }
    }
  }

  /** `SHOW PARTITIONS graft.<name>` — the partition census from the
    * MANIFEST alone: one row per distinct partition directory value
    * with its live file count, recorded row count (null when any of
    * its files predates row tracking) and recorded bytes. Zero data
    * files listed or read — at 100k files this is a driver pass over
    * the already-parsed census, and at 100 TB it replaces the
    * list-every-directory scan SHOW PARTITIONS classically costs.
    * After a partition evolution, pre-evolution files carry no dirs
    * and report under `<unpartitioned>` — an honest census of the
    * table's physical layout, era by era. Row counts follow
    * [[ManifestTable.rowCount]]'s honesty rule exactly (ADVICE r14):
    * deletion-vector-hidden rows are SUBTRACTED (their per-file
    * ordinal counts are exact metadata), and a partition holding any
    * file targeted by a pending lazy-delete tombstone reports null —
    * the hidden-row count is unknown until materializeDeletes, and a
    * wrong number is worse than none. */
  final case class ShowPartitionsCommand(name: String)
    extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(strAttr("partition"),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "n_files", org.apache.spark.sql.types.IntegerType,
          nullable = false)(),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "n_rows", org.apache.spark.sql.types.LongType, nullable = true)(),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "n_bytes", org.apache.spark.sql.types.LongType, nullable = true)())
    override def run(session: SparkSession): Seq[Row] = {
      val path = lookup(name).getOrElse(throw new IllegalArgumentException(
        s"SHOW PARTITIONS graft.$name: no such registered table" + hintRenamed(name)))
      val files = ManifestTable.snapshotFiles(session, path)
      val hasDirs = files.exists(f => f.split("/")
        .drop(2).dropRight(1).exists(_.contains("=")))
      require(ManifestTable.partitionColumns(session, path).nonEmpty ||
          ManifestTable.partitionTransforms(session, path).nonEmpty ||
          hasDirs,
        s"SHOW PARTITIONS graft.$name: the table is not partitioned")
      val stats = ManifestTable.snapshotStats(session, path)
      val sizes = ManifestTable.snapshotSizes(session, path)
      val dvs = ManifestTable.deleteVectors(session, path)
      val tombTargets = ManifestTable.deleteTombstones(session, path)
        .flatMap(_._2).toSet
      def partOf(f: String): String = {
        val segs = f.split("/")
        val dirs = segs.slice(2, segs.length - 1).filter(_.contains("="))
        if (dirs.isEmpty) "<unpartitioned>" else dirs.mkString("/")
      }
      files.groupBy(partOf).toSeq.sortBy(_._1).map { case (p, fs) =>
        val rows = fs.map(f =>
          stats.get(f).flatMap(_.get(ManifestTable.RowsKey)).map(_._2.toLong))
        val bytes = fs.map(sizes.get)
        val dvHidden = fs.map(f => dvs.get(f).map(_.size.toLong).getOrElse(0L)).sum
        val pendingTomb = fs.exists(tombTargets.contains)
        Row(p, fs.size,
          if (!pendingTomb && rows.forall(_.isDefined))
            rows.flatten.sum - dvHidden
          else null,
          if (bytes.forall(_.isDefined)) bytes.flatten.sum else null)
      }
    }
  }

  /** `UPDATE graft.<name> SET c = e, … [WHERE …]` —
    * [[ManifestTable.updateWhere]] through SQL: same pruned-rewrite
    * shape as DELETE, with assignment types checked against the
    * recorded schema (widening-lattice casts only) and updated rows
    * re-validated against CHECK constraints. Columns, not
    * Expressions, for the reason on [[DeleteCommand]]. */
  final case class UpdateCommand(ident: String, path: String,
      assignments: Seq[(String, Column)], condition: Option[Column])
    extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      requireNotMView(session, path, ident, "UPDATE")
      import org.apache.spark.sql.functions.lit
      ManifestTable.updateWhere(session, path, assignments,
        condition.getOrElse(lit(true)))
      Nil
    }
  }

  /** `ALTER TABLE graft.<name> ADD CONSTRAINT nm CHECK (expr)` —
    * [[ManifestTable.addConstraint]] through SQL: existing rows
    * validate BEFORE the constraint publishes, and every later writer
    * is bound with zero cooperation. */
  final case class AddConstraintCommand(ident: String, path: String,
      name: String, conditionSql: String) extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      ManifestTable.addConstraint(session, path, name, conditionSql)
      Nil
    }
  }

  /** `ALTER TABLE graft.<name> DROP CONSTRAINT [IF EXISTS] nm`. */
  final case class DropConstraintCommand(ident: String, path: String,
      name: String, ifExists: Boolean) extends LeafRunnableCommand {
    override def run(session: SparkSession): Seq[Row] = {
      if (ifExists && !ManifestTable.checkConstraints(session, path,
          ManifestTable.currentVersion(session, path)).contains(name))
        return Nil
      ManifestTable.dropConstraint(session, path, name)
      Nil
    }
  }

  /** `ANALYZE TABLE graft.<name> COMPUTE STATISTICS FOR COLUMNS c, …`
    * (empty `cols` = FOR ALL COLUMNS) → [[ManifestTable.analyzeStats]].
    * Returns (version, analyzed columns) like the other audits. */
  final case class AnalyzeCommand(ident: String, path: String,
      cols: Seq[String]) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "version", org.apache.spark.sql.types.IntegerType, nullable = false)(),
        strAttr("analyzed_columns"))
    override def run(session: SparkSession): Seq[Row] = {
      val all =
        if (cols.nonEmpty) cols
        else ManifestTable.snapshotSchema(session, path)
          .map(_.fieldNames.toSeq).getOrElse(Nil)
      val v = ManifestTable.analyzeStats(session, path, all)
      Seq(Row(v, all.mkString(", ")))
    }
  }

  /** `OPTIMIZE graft.<name>` → [[ManifestTable.compactSmall]] (bin-pack
    * the small files, the routine maintenance pass);
    * `OPTIMIZE graft.<name> ZORDER BY (x[, y])` →
    * [[ManifestTable.compact]] with the interleaved sort key and stats
    * on the clustered dimensions (the layout rewrite c29 judges).
    * Parsed by [[graft.GraftSqlParser]] — vanilla Spark has no
    * OPTIMIZE statement. */
  final case class OptimizeCommand(name: String, zorderBy: Seq[String],
      where: Option[String] = None) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "version", org.apache.spark.sql.types.IntegerType, nullable = false)(),
        strAttr("operation"))
    override def run(session: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.col
      val path = lookup(name).getOrElse(throw new IllegalArgumentException(
        s"OPTIMIZE graft.$name: no such registered table" + hintRenamed(name)))
      require(where.isEmpty || zorderBy.isEmpty,
        s"OPTIMIZE graft.$name: WHERE scopes the incremental bin-pack; " +
          "ZORDER rewrites the whole snapshot — the two don't compose " +
          "(z-order the table, or bin-pack the region)")
      def zorder(cols: Seq[String], op: String): Seq[Row] = {
        val sch = ManifestTable.snapshotSchema(session, path)
          .getOrElse(new StructType())
        cols.foreach(c => require(
          sch.fieldNames.exists(_.equalsIgnoreCase(c)),
          s"OPTIMIZE graft.$name: no column '$c' to cluster on"))
        val sortBy = cols match {
          case Seq(c) => Seq(col(c))
          case Seq(x, y) => Seq(graft.operators.LakehouseQueries.zkey16(
            col(x), col(y)))
          // only reachable via a hand-edited/corrupt graft.clusterBy
          // config (clusterSplit caps the DDL path, the ZORDER BY
          // parser its own) — refuse cleanly, never MatchError (r17)
          case more => throw new IllegalArgumentException(
            s"OPTIMIZE graft.$name: CLUSTER BY interleaves at most 2 " +
              s"dimensions (recorded: ${more.mkString(", ")}) — repair " +
              "the graft.clusterBy table config")
        }
        val v = ManifestTable.compact(session, path,
          targetFiles = optimizeTargetFiles(session, path),
          sortBy = sortBy, statsColumns = cols)
        Seq(Row(v, op))
      }
      zorderBy match {
        case Nil =>
          // a CLUSTER BY table's plain OPTIMIZE re-clusters on the
          // recorded dimensions (r16) — the declarative spelling of
          // ZORDER BY; OPTIMIZE WHERE stays the region bin-pack
          val cluster = if (where.isDefined) Nil
            else ManifestTable.tableConfig(session, path)
              .get("graft.clusterBy")
              .map(_.split(",").iterator.map(_.trim)
                .filter(_.nonEmpty).toSeq).getOrElse(Nil)
          if (cluster.nonEmpty)
            zorder(cluster, s"cluster(${cluster.mkString(", ")})")
          else {
            val v = ManifestTable.compactSmall(session, path,
              where = where.map(org.apache.spark.sql.functions.expr))
            Seq(Row(v, where.fold("compact-small")(w =>
              s"compact-small(where $w)")))
          }
        case Seq(c) => zorder(Seq(c), s"zorder($c)")
        case Seq(x, y) => zorder(Seq(x, y), s"zorder($x, $y)")
        case more => throw new IllegalArgumentException(
          s"OPTIMIZE graft.$name: ZORDER BY interleaves at most 2 " +
            s"dimensions (got ${more.mkString(", ")}) — more dims " +
            "dilute every dimension's clustering; pick the 2 most " +
            "selective")
      }
    }
  }

  /** ZORDER rewrites the whole snapshot — size the output like the
    * write path would: one file per ~128 MiB of recorded bytes. */
  private def optimizeTargetFiles(session: SparkSession,
                                  path: String): Int = {
    val bytes = ManifestTable.snapshotSizes(session, path).values.sum
    math.max(1, math.ceil(bytes / (128.0 * (1 << 20))).toInt)
  }

  /** `VACUUM graft.<name> RETAIN <n> VERSIONS|HOURS [DRY RUN]` →
    * [[ManifestTable.expire]] / [[ManifestTable.vacuumPreview]]. The
    * RETAIN clause is REQUIRED — a default retention is a silent
    * time-travel amputation; the operator states what survives.
    * HOURS is the wall-clock spelling (the Delta RETAIN idiom):
    * every version committed inside the window survives, PLUS the
    * version that was current at the window's start — so
    * `TIMESTAMP AS OF` stays answerable for every instant inside the
    * stated window, which is exactly what "retain n hours" promises.
    * RETAIN 0 HOURS keeps just the head. */
  final case class VacuumCommand(name: String, keepLast: Int,
      dryRun: Boolean, byHours: Boolean = false)
    extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "reclaimed_dirs", org.apache.spark.sql.types.IntegerType,
        nullable = false)(),
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "bytes", org.apache.spark.sql.types.LongType, nullable = false)())
    override def run(session: SparkSession): Seq[Row] = {
      val path = lookup(name).getOrElse(throw new IllegalArgumentException(
        s"VACUUM graft.$name: no such registered table" + hintRenamed(name)))
      val keep = if (!byHours) keepLast else {
        val cutoff = System.currentTimeMillis() - keepLast * 3600000L
        val vs = ManifestTable.versions(session, path)
        // the newest version at-or-before the cutoff anchors the
        // window: it is what TIMESTAMP AS OF <window start> reads
        val anchored = vs.lastIndexWhere(v => ManifestTable
          .commitTimeMs(session, path, v).getOrElse(Long.MaxValue) <= cutoff)
        if (anchored < 0) vs.size else vs.size - anchored
      }
      // preview first in BOTH modes: the executed VACUUM reports what
      // it reclaimed, the DRY RUN reports what it would
      val (dirs, bytes) = ManifestTable.vacuumPreview(session, path, keep)
      if (!dryRun) ManifestTable.expire(session, path, keep)
      Seq(Row(dirs.size, bytes))
    }
  }

  /** A parser-level `TIMESTAMP AS OF '<literal>'` resolved to a
    * version number — the same Cast-under-session-timezone semantics
    * the analyzer-level time travel uses (Resolution, above), so
    * `SELECT … TIMESTAMP AS OF t`, `RESTORE … TO TIMESTAMP AS OF t`
    * and `SHALLOW CLONE … TIMESTAMP AS OF t` all land on the same
    * version for the same t. */
  private def versionAtTimestamp(session: SparkSession, path: String,
                                 ts: String, stmt: String): Int = {
    // under ANSI the Cast THROWS on malformed input rather than
    // yielding null — fold both shapes into the one targeted error
    val micros = try org.apache.spark.sql.catalyst.expressions.Cast(
      org.apache.spark.sql.catalyst.expressions.Literal(ts),
      org.apache.spark.sql.types.TimestampType,
      Some(session.sessionState.conf.sessionLocalTimeZone)).eval(null)
    catch { case e: Exception => throw new IllegalArgumentException(
      s"$stmt: '$ts' is not a timestamp", e) }
    if (micros == null) throw new IllegalArgumentException(
      s"$stmt: '$ts' is not a timestamp")
    ManifestTable.versionAsOf(session, path, micros.asInstanceOf[Long] / 1000L)
  }

  /** `ALTER TABLE graft.<name> SET PARTITION SPEC (spec…)` →
    * [[ManifestTable.setPartitionSpec]]: partition evolution — change
    * the layout for future writes as a metadata-only commit, zero
    * files moved; existing eras stay readable from their paths and
    * the table localizes toward the new spec with use. `SPEC ()`
    * evolves to flat. Parsed by [[graft.GraftSqlParser]]. */
  final case class SetPartitionSpecCommand(name: String, spec: Seq[String])
    extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "version", org.apache.spark.sql.types.IntegerType, nullable = false)(),
        strAttr("operation"))
    override def run(session: SparkSession): Seq[Row] = {
      val path = lookup(name).getOrElse(throw new IllegalArgumentException(
        s"ALTER TABLE graft.$name SET PARTITION SPEC: no such registered table" + hintRenamed(name)))
      val v = ManifestTable.setPartitionSpec(session, path, spec)
      val shown = if (spec.isEmpty) "flat" else spec.mkString(", ")
      Seq(Row(v, s"set-partition-spec($shown)"))
    }
  }

  /** `INSERT INTO graft.<name> REPLACE WHERE <cond> SELECT …` →
    * [[ManifestTable.replaceWhere]]: atomically delete the predicate
    * region and insert the query's rows — which must ALL satisfy the
    * predicate — in ONE version (the Delta replaceWhere idiom, the
    * idempotent backfill statement). Victims stats-prune, the batch
    * appends, untouched files carry by reference: O(region) at any
    * table size. Parsed by [[graft.GraftSqlParser]]. */
  final case class ReplaceWhereCommand(name: String, condSql: String,
      query: LogicalPlan) extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(query)
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "version", org.apache.spark.sql.types.IntegerType, nullable = false)(),
        strAttr("operation"))
    override def run(session: SparkSession): Seq[Row] = {
      val path = lookup(name).getOrElse(throw new IllegalArgumentException(
        s"INSERT INTO graft.$name REPLACE WHERE: no such registered table" + hintRenamed(name)))
      requireNotMView(session, path, s"graft.$name", "REPLACE WHERE")
      val df = PlanBridge.ofRows(session, query)
      val v = ManifestTable.replaceWhere(session, path,
        org.apache.spark.sql.functions.expr(condSql), df)
      Seq(Row(v, "replace-where"))
    }
  }

  /** `COPY INTO graft.<name> FROM '<path-or-glob>' FILEFORMAT = fmt`
    * → [[ManifestTable.copyInto]]: idempotent landing-zone ingestion —
    * every (path, length, mtime) source key ingests exactly once per
    * table lifetime (re-running the statement after new files land
    * picks up ONLY the new ones; an exact re-run is a no-op), the
    * batch must match the recorded schema exactly (ingestion, not
    * evolution — extra source columns refuse rather than silently
    * project away). FILEFORMAT is REQUIRED: inferring a format for a
    * landing zone risks misreading it. The returned version is the
    * head after ingestion — unchanged when nothing was fresh. */
  final case class CopyIntoCommand(name: String, sourceGlob: String,
      format: String) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "version", org.apache.spark.sql.types.IntegerType, nullable = false)(),
        strAttr("operation"))
    override def run(session: SparkSession): Seq[Row] = {
      val path = lookup(name).getOrElse(throw new IllegalArgumentException(
        s"COPY INTO graft.$name: no such registered table" + hintRenamed(name)))
      requireNotMView(session, path, s"graft.$name", "COPY INTO")
      val v = ManifestTable.copyInto(session, path, sourceGlob, format)
      Seq(Row(v, s"copy-into($format)"))
    }
  }

  /** `RESTORE TABLE graft.<name> TO VERSION AS OF n` /
    * `TO TIMESTAMP AS OF '…'` → [[ManifestTable.restore]]: roll the
    * head back to the target version's image as a NEW commit — history
    * preserved, zero rows moved (the target's segments are carried by
    * reference), the Delta RESTORE shape. The incident-response
    * statement: an ingest bug poisons the head, one statement flips
    * the table back in O(manifest) time while the bad versions stay
    * inspectable until VACUUMed. Parsed by [[graft.GraftSqlParser]] —
    * vanilla Spark has no RESTORE statement. */
  final case class RestoreCommand(name: String, version: Option[Int],
      timestamp: Option[String]) extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "version", org.apache.spark.sql.types.IntegerType, nullable = false)(),
        strAttr("operation"))
    override def run(session: SparkSession): Seq[Row] = {
      val path = lookup(name).getOrElse(throw new IllegalArgumentException(
        s"RESTORE TABLE graft.$name: no such registered table" + hintRenamed(name)))
      val target = version.getOrElse(versionAtTimestamp(session, path,
        timestamp.get, s"RESTORE TABLE graft.$name TO TIMESTAMP AS OF"))
      val head = ManifestTable.currentVersion(session, path)
      // restoring to the head is a no-op a user almost certainly
      // didn't mean (a typo'd version) — report it without committing
      // an identical snapshot on top
      if (target == head) return Seq(Row(head, s"noop-restore-$target"))
      val v = ManifestTable.restore(session, path, target)
      Seq(Row(v, s"restore-$target"))
    }
  }

  /** `CREATE TABLE graft.<dst> SHALLOW CLONE graft.<src> [VERSION AS
    * OF n | TIMESTAMP AS OF '…'] [LOCATION '…']` →
    * [[ManifestTable.cloneShallow]]: a zero-copy writable branch of
    * the source snapshot — the dst manifest references the donor's
    * files by extern entry, new writes land under the dst's own dir,
    * and the donor never learns the clone exists (the Delta SHALLOW
    * CLONE contract, including its VACUUM hazard — CloneSpec pins
    * both directions). The dev/test workflow at 100 TB: branch the
    * production table in O(manifest) time, experiment destructively,
    * DROP the clone. Path rules match CreateCommand: LOCATION, or
    * `<warehouse>/<name>`, else a loud refusal. DEEP CLONE is refused
    * at parse time (a full copy is CREATE TABLE … AS SELECT — being
    * honest that it moves every byte). */
  final case class CloneCommand(dstName: String, srcName: String,
      version: Option[Int], timestamp: Option[String],
      location: Option[String], ignoreIfExists: Boolean)
    extends LeafRunnableCommand {
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] =
      Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "version", org.apache.spark.sql.types.IntegerType, nullable = false)(),
        strAttr("operation"))
    override def run(session: SparkSession): Seq[Row] = {
      val srcPath = lookup(srcName).getOrElse(
        throw new IllegalArgumentException(
          s"SHALLOW CLONE graft.$srcName: no such registered table" + hintRenamed(srcName)))
      val dstPath = location.orElse(warehouseRoot.map(w =>
        w.stripSuffix("/") + "/" + dstName)).getOrElse(
        throw new IllegalArgumentException(
          s"CREATE TABLE graft.$dstName SHALLOW CLONE needs a LOCATION " +
            "(or set GraftCatalog.warehouse for a default root)"))
      require(dstPath != srcPath,
        s"SHALLOW CLONE graft.$srcName: the clone cannot target the " +
          "donor's own directory")
      lookup(dstName).foreach(p => require(p == dstPath,
        s"CREATE TABLE graft.$dstName: the name is already registered " +
          s"to $p — unregister it before cloning at $dstPath"))
      if (ManifestTable.versions(session, dstPath).nonEmpty) {
        if (ignoreIfExists) { register(dstName, dstPath); return Nil }
        throw new IllegalArgumentException(
          s"CREATE TABLE graft.$dstName: $dstPath already holds a table " +
            "(IF NOT EXISTS to adopt it, or pick a fresh LOCATION)")
      }
      val v = version match {
        case Some(n) => n
        case None => timestamp.fold(-1)(ts => versionAtTimestamp(
          session, srcPath, ts,
          s"SHALLOW CLONE graft.$srcName TIMESTAMP AS OF"))
      }
      val cloned = ManifestTable.cloneShallow(session, srcPath, dstPath, v)
      register(dstName, dstPath)
      val at = if (v < 0) "head" else s"v$v"
      Seq(Row(cloned, s"shallow-clone($srcName@$at)"))
    }
  }
}
