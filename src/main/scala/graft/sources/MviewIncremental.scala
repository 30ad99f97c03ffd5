package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, EqualNullSafe, Expression, Literal, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, HintInfo, Join, JoinHint, LogicalPlan, Project, SubqueryAlias, BROADCAST}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.sql.types.IntegerType

/** Incremental materialized-view maintenance (r17, VERDICT r16 ask #2)
  * — the DIRTY-GROUP RESCAN algorithm:
  *
  *  1. the base-version marker: every (qualifying) refresh commits the
  *     image with `txn = (graft-mview-base, <base version read>)`, the
  *     Delta SetTransaction idiom — "which base snapshot does this
  *     image reflect?" rides the image's own atomic publish;
  *  2. the delta: [[ManifestTable.multisetDelta]] (marker → head) —
  *     O(churned files), keyless, deletion-vector-aware;
  *  3. dirty keys: the defining query's OWN filter+grouping applied to
  *     the delta rows, made distinct — the set of groups whose value
  *     could have changed (a row entering, leaving, or changing within
  *     a group makes it dirty; no other group can move);
  *  4. rescan: re-run the defining aggregate over the base PINNED at
  *     the head version, LEFT-SEMI-restricted to the dirty keys
  *     (broadcast — the dirty set is the churn's group census, not the
  *     table); untouched groups keep their image rows via one
  *     null-safe anti join; one atomic overwrite publishes the result.
  *
  * Rescan, not delta-folding, on purpose: recomputing dirty groups
  * from the base is EXACT for every aggregate — min/max under
  * retraction, avg, count(DISTINCT), sum whose surviving rows are all
  * NULL — where folding ±deltas into the old image is exact only for
  * the count/sum family and silently wrong at the null/retraction
  * edges. The price is a base scan FILTERED to dirty groups, which
  * stats skipping, partition pruning and clustering reduce to the
  * dirty slice when the table is laid out by the group key — the
  * localized-churn case incremental maintenance exists for. Replay is
  * idempotent (a stale marker re-rescans groups already reflected —
  * same result), so a noop refresh never needs to publish just to
  * advance the marker.
  *
  * STAR-JOIN shapes (r18, VERDICT r17 ask #3): the defining query may
  * INNER-join the fact with dimension tables — `fact ⋈ dim… GROUP BY`,
  * the production MV shape. The image records one marker per joined
  * table (the first FROM-clause table under [[TxnApp]], the rest
  * under `graft-mview-dim:<name>`). When EXACTLY ONE table churned —
  * whichever position it holds — an inner join is LINEAR in each
  * input: Δ(σ(F ⋈ D…)) ⊆ σ(ΔT ⋈ others…) when every other table is
  * unchanged, so the dirty groups are exactly the group keys of the
  * defining query replayed with the churned table's delta in its
  * place and everything else pinned at head, and the rescan proceeds
  * as above. SEVERAL churned tables telescope: the exact multiset
  * identity A_h⋈B_h − A_s⋈B_s = ΔA⋈B_h + A_s⋈ΔB generalizes to any
  * table count (term k = table k's delta, earlier tables at head,
  * later tables at their markers), so the dirty set is the union of
  * the terms' group keys — no combination of single-window churn
  * forces a full recompute while the marker-version manifests live.
  * Fact churn is the cheap case (the delta joins only broadcast-sized
  * dims); a churned DIM pays one column-pruned fact scan to FIND its
  * dirty groups, then the restricted rescan — still a win over the
  * full recompute when the fact is clustered by the group key and the
  * image is large.
  *
  * SELF-JOINS (r19, VERDICT r18 ask #5): a table appearing n times
  * telescopes at OCCURRENCE granularity — the identity
  * T_h⋈T_h − T_s⋈T_s = T_h⋈ΔT + ΔT⋈T_s needs NO quadratic ΔT⋈ΔT
  * term, because each step of the chain changes ONE occurrence with
  * the earlier occurrences already at head and the later still at the
  * marker. So a churned table simply contributes one term per
  * occurrence, and the existing union-of-term-keys machinery covers
  * prior-period-comparison views for free.
  *
  * LEFT OUTER dims (r19, VERDICT r18 ask #2): `fact LEFT JOIN dim` is
  * linear in the FACT side exactly like an inner join (each fact row's
  * output depends on that row and the dim alone), so fact-churn terms
  * substitute the delta unchanged. A churned DIM is the null-extension
  * edge: a dim row arriving or leaving flips its matching fact rows
  * between the matched form (dim columns populated) and the
  * null-extended form (dim columns NULL) — so the dim term emits BOTH
  * key shapes: the MATCHED keys come from the tree with the dim join
  * flipped to INNER over ΔD (only fact rows matching the churned dim
  * rows are affected), and the NULL-EXTENDED keys from the tree with
  * the dim join flipped to LEFT-SEMI over ΔD and every reference to
  * the dim's columns above the join replaced by a typed NULL literal —
  * exactly the value those columns hold on a null-extended row. The
  * union is a superset of the affected groups (over-dirtiness only
  * costs rescan work, never exactness — the rescan recomputes from the
  * pinned head either way).
  *
  * Qualification is STRUCTURAL only: one `GROUP BY` aggregate over one
  * registered graft table — or INNER joins of several distinct ones —
  * (optional WHERE), every grouping expression present in the SELECT
  * list (the image must carry the group key to identify dirty rows),
  * deterministic expressions, no subqueries. Non-qualifying queries
  * keep the honest full refresh; `INCREMENTAL` on them refuses with
  * the reason. */
private[graft] object MviewIncremental {

  /** txn appId carrying the fact-table version the image reflects. */
  val TxnApp = "graft-mview-base"

  /** txn appId prefix for each DIMENSION table's recorded version. */
  val DimApp = "graft-mview-dim:"

  /** One FROM-clause occurrence of a base table. `qualifier` is the
    * lower-cased name group keys reach it by (the alias if given, the
    * bare table name otherwise); `leftOuter` marks the occurrence as
    * the RIGHT side of a LEFT OUTER join — the shape whose churn term
    * needs the two-form (matched + null-extended) key expansion. */
  final case class Occ(name: String, path: String, qualifier: String,
                       leftOuter: Boolean)

  final case class Shape(
      /** (normalized name, path) per OCCURRENCE, join order — the
        * LEFTMOST is the fact (the table whose churn keeps the
        * refresh incremental). Size 1 = the single-table shape; a
        * self-joined table appears once per occurrence (r19). */
      tables: Seq[(String, String)],
      /** per-occurrence detail, parallel to `tables` (r19). */
      occs: Seq[Occ],
      /** the WHOLE defining plan — the aggregate, possibly under an
        * UnresolvedHaving (r18): HAVING filters the aggregate's
        * OUTPUT rows, never group membership, so dirty discovery
        * stays on the child and the rescan just re-applies it — a
        * dirty group that newly fails HAVING recomputes to nothing
        * and its old image row anti-joins away. */
      top: LogicalPlan,
      agg: Aggregate, child: LogicalPlan,
      /** each grouping expr (ordinals resolved) with its index in the
        * SELECT list — the image column that carries the group key */
      groups: Seq[(Expression, Int)],
      /** lower-cased FROM-clause qualifier (alias if given, else the
        * bare name) → table name, for attributing a qualified group
        * key to its table */
      aliasOf: Map[String, String]) {
    def factName: String = tables.head._1
    def factPath: String = tables.head._2
    /** Tables that carry MARKERS: one per distinct NAME, first
      * occurrence order — a self-joined table records one marker. */
    def markerTables: Seq[(String, String)] = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      tables.filter { case (n, _) => seen.add(n) }
    }
    def dims: Seq[(String, String)] = markerTables.tail
    /** Whether any table appears more than once (self-join): the
      * envelope pruning's by-name fact substitution is unsound there
      * (both occurrences would read the pruned census), so the rescan
      * keeps the plain pinned read + semi join. */
    def hasRepeatedTable: Boolean = markerTables.size != tables.size
  }

  private def unwrap(ne: NamedExpression): Expression = ne match {
    case a: Alias => a.child
    case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAlias => ua.child
    case e => e
  }

  /** The bare (lower-cased) graft name a relation references, if any. */
  private def graftName(u: UnresolvedRelation): Option[String] =
    u.multipartIdentifier match {
      case Seq(ns, ident) if ns.equalsIgnoreCase("graft") =>
        Some(ident.toLowerCase(java.util.Locale.ROOT))
      case Seq(ident) => Some(ident.toLowerCase(java.util.Locale.ROOT))
      case _ => None
    }

  /** Structural qualification: Right(shape) or Left(reason). */
  def analyze(session: SparkSession, sql: String): Either[String, Shape] = {
    val plan =
      try session.sessionState.sqlParser.parseQuery(sql)
      catch { case e: Exception =>
        return Left(s"the defining query does not parse: ${e.getMessage}") }
    if (plan.exists(_.expressions.exists(_.exists(
        _.isInstanceOf[SubqueryExpression]))))
      return Left("the defining query contains a subquery")
    // `GROUP BY … HAVING …` parses as UnresolvedHaving over the
    // aggregate — same qualification, the HAVING rides `top` (r18)
    val (top, aggPlan) = plan match {
      case h @ org.apache.spark.sql.catalyst.analysis
          .UnresolvedHaving(_, a: Aggregate) => (h: LogicalPlan, a)
      case p => (p, p)
    }
    aggPlan match {
      case agg @ Aggregate(g, out, child, _) =>
        // the child must be [alias|filter]* over one relation, or
        // INNER joins of such shapes (r18: the star-join form), or
        // LEFT OUTER joins whose RIGHT side is one such single-table
        // shape (r19: the null-extension term needs the dim to be a
        // lone relation under its join — nested join trees on the
        // null-extending side have no sound semi-restriction)
        def simpleRel(p: LogicalPlan): Boolean = p match {
          case _: UnresolvedRelation => true
          case SubqueryAlias(_, c) => simpleRel(c)
          case Filter(_, c) => simpleRel(c)
          case _ => false
        }
        def shapeOk(p: LogicalPlan): Boolean = p match {
          case _: UnresolvedRelation => true
          case SubqueryAlias(_, c) => shapeOk(c)
          case Filter(_, c) => shapeOk(c)
          case Join(l, r, Inner, _, _) => shapeOk(l) && shapeOk(r)
          case Join(l, r, LeftOuter, _, _) => shapeOk(l) && simpleRel(r)
          case _ => false
        }
        if (!shapeOk(child))
          return Left("the FROM clause is not a single table, INNER " +
            "joins of such tables, or LEFT OUTER joins with a " +
            "single-table right side, with an optional WHERE — right/" +
            "full outer joins, nested queries and set ops rescan as a " +
            "whole (use plain REFRESH)")
        // relations with their nearest FROM-clause alias (for group-key
        // attribution — `GROUP BY f.grp` names the fact via `f`) and
        // whether each sits as the RIGHT side of a LEFT OUTER join
        def rels(p: LogicalPlan, alias: Option[String], rightOfLO: Boolean)
            : Seq[(Option[String], UnresolvedRelation, Boolean)] = p match {
          case u: UnresolvedRelation => Seq((alias, u, rightOfLO))
          case SubqueryAlias(a, c) => rels(c, Some(a.name), rightOfLO)
          case Filter(_, c) => rels(c, alias, rightOfLO)
          case Join(l, r, jt, _, _) =>
            rels(l, None, rightOfLO = false) ++
              rels(r, None, rightOfLO = jt == LeftOuter)
        }
        val withAlias = rels(child, None, rightOfLO = false)
        val names = withAlias.map { case (_, u, _) =>
          val n = graftName(u).getOrElse(
            return Left("a joined table is not in the graft namespace"))
          if (n.contains("@"))
            return Left("a base is a frozen time-travel snapshot — " +
              "its view can never change")
          n
        }
        val aliasOf: Map[String, String] = withAlias.zip(names).map {
          case ((a, u, _), n) =>
            a.getOrElse(u.multipartIdentifier.last)
              .toLowerCase(java.util.Locale.ROOT) -> n
        }.toMap
        val tables = names.map { n =>
          n -> GraftCatalog.lookup(n).getOrElse(
            return Left(s"the base '$n' is not a registered graft table"))
        }
        val occs = withAlias.zip(tables).map { case ((a, u, lo), (n, p)) =>
          Occ(n, p, a.getOrElse(u.multipartIdentifier.last)
            .toLowerCase(java.util.Locale.ROOT), leftOuter = lo)
        }
        if (out.exists(_.isInstanceOf[
            org.apache.spark.sql.catalyst.analysis.UnresolvedStar]))
          return Left("SELECT * does not name the group/aggregate columns")
        val groups: Seq[(Expression, Int)] = g.map {
          case Literal(n: Int, IntegerType) => // GROUP BY <ordinal>
            if (n < 1 || n > out.length)
              return Left(s"GROUP BY ordinal $n is out of range")
            (unwrap(out(n - 1)), n - 1)
          case e =>
            val idx = out.indexWhere(o => unwrap(o).sql == e.sql)
            if (idx < 0)
              return Left(s"GROUP BY expression ${e.sql} is not in the " +
                "SELECT list — the image must carry the group key to " +
                "identify its dirty rows")
            (e, idx)
        }
        if (groups.isEmpty)
          return Left("a global aggregate has one group — plain REFRESH " +
            "is already minimal")
        // determinism: resolve once (no execution) and inspect — the
        // WHOLE plan, so a HAVING condition is checked too
        val analyzed =
          try PlanBridge.ofRows(session, top).queryExecution.analyzed
          catch { case e: Exception =>
            return Left(s"the defining query does not analyze: ${e.getMessage}") }
        if (analyzed.exists(_.expressions.exists(_.exists(e =>
            e.resolved && !e.deterministic))))
          return Left("the defining query is non-deterministic — a " +
            "partial rescan would disagree with the kept rows")
        Right(Shape(tables, occs, top, agg, child, groups, aliasOf))
      case _ =>
        Left("the defining query is not a single GROUP BY aggregate " +
          "with an optional HAVING (ORDER BY/window shapes rescan as " +
          "a whole — use plain REFRESH)")
    }
  }

  /** Substitute every base relation with a read PINNED at its version
    * in `vs` — the whole refresh then reflects exactly one snapshot
    * per table, and the recorded markers are true even if a base
    * advances mid-refresh. Relations in `skip` are left for the
    * caller to substitute (the delta takes the fact's place). */
  private def pinAll(session: SparkSession, plan: LogicalPlan,
                     sh: Shape, vs: Map[String, Int],
                     skip: Set[String] = Set.empty): LogicalPlan = {
    val paths = sh.tables.toMap
    plan.transformUp {
      case u: UnresolvedRelation
          if graftName(u).exists(n => !skip.contains(n)) =>
        val n = graftName(u).get
        SubqueryAlias(u.multipartIdentifier.last,
          ManifestTable.read(session, paths(n), vs(n))
            .queryExecution.analyzed)
    }
  }

  /** Current head version per joined table, fact first. */
  private def heads(session: SparkSession, sh: Shape): Map[String, Int] =
    sh.tables.map { case (n, p) =>
      n -> ManifestTable.currentVersion(session, p) }.toMap

  /** The dim-marker txn entries for a commit reflecting `vs`. */
  private def dimTxns(sh: Shape, vs: Map[String, Int]): Seq[(String, Long)] =
    sh.dims.map { case (n, _) => (DimApp + n, vs(n).toLong) }

  /** Plain REFRESH, now marker-recording: pinned recompute for
    * qualifying shapes (txn rides the commit unless the recorded
    * marker is already at/above the pinned version — a RESTOREd base
    * falls back to unmarked commits until it catches up); the
    * pre-r17 unpinned recompute for everything else. Returns the
    * committed version. */
  def fullRefresh(session: SparkSession, mviewPath: String,
                  sql: String): Int = {
    analyze(session, sql) match {
      case Right(sh) =>
        val vs = heads(session, sh)
        val baseTo = vs(sh.factName)
        val df = PlanBridge.ofRows(session, pinAll(session, sh.top, sh, vs))
        val rec = ManifestTable.txnVersion(session, mviewPath, TxnApp)
        val txn =
          if (rec.forall(_ < baseTo)) Some((TxnApp, baseTo.toLong)) else None
        ManifestTable.commit(session, mviewPath, df, SaveMode.Overwrite,
          txn = txn, txnExtra = dimTxns(sh, vs))
      case Left(_) =>
        val df = PlanBridge.ofRows(session,
          session.sessionState.sqlParser.parseQuery(sql))
        ManifestTable.commit(session, mviewPath, df, SaveMode.Overwrite)
    }
  }

  /** REFRESH … INCREMENTAL. Returns (version, mode) with mode ∈
    * {incremental, full, noop} — full = the self-priming first
    * refresh (a marker missing, a marker ahead after a base RESTORE,
    * or a needed delta/marker-version manifest already expired).
    * Refuses loudly when the defining query does not qualify. */
  def incrementalRefresh(session: SparkSession, name: String,
                         mviewPath: String, sql: String): (Int, String) = {
    val sh = analyze(session, sql) match {
      case Left(reason) => throw new IllegalArgumentException(
        s"REFRESH MATERIALIZED VIEW graft.$name INCREMENTAL: the " +
          s"defining query does not qualify — $reason")
      case Right(s) => s
    }
    val vs = heads(session, sh)
    // per-table recorded markers (fact under TxnApp, dims by name) —
    // one per distinct NAME: a self-joined table records one marker
    val markers = sh.markerTables
    val recs: Seq[Option[Long]] = markers.zipWithIndex.map {
      case ((n, _), i) => ManifestTable.txnVersion(session, mviewPath,
        if (i == 0) TxnApp else DimApp + n)
    }
    if (recs.exists(_.isEmpty)) // unprimed (or a pre-r18 join image)
      return (fullRefresh(session, mviewPath, sql), "full")
    val recByName: Map[String, Int] =
      markers.map(_._1).zip(recs.map(_.get.toInt)).toMap
    if (markers.exists { case (n, _) => recByName(n) > vs(n) })
      return (fullRefresh(session, mviewPath, sql), "full") // RESTOREd base
    val churned = markers.filter { case (n, _) => recByName(n) < vs(n) }
    if (churned.isEmpty)
      (ManifestTable.currentVersion(session, mviewPath), "noop")
    else if (churned.exists { case (n, p) =>
        !ManifestTable.versions(session, p).contains(recByName(n)) })
      // a churned table's marker-version manifest expired out of
      // retention: the deltas and marker pins are unbuildable — the
      // honest full refresh. Only CHURNED tables are listed (an
      // unchurned marker equals the head, which exists by
      // definition) — one less O(versions) listing per unchurned
      // base per refresh. An EXPLICIT availability check, not a
      // catch: the old blanket IllegalArgumentException handler
      // around the whole rescan also swallowed real bugs in the term
      // machinery (ADVICE r18); the narrow ExpiredVersionException
      // net below covers only the check-to-read retention race
      (fullRefresh(session, mviewPath, sql), "full")
    else {
      // TELESCOPING delta (r18): for inner joins the exact multiset
      // identity  A_h⋈B_h − A_s⋈B_s = ΔA⋈B_h + A_s⋈ΔB  generalizes to
      // any table count — term k substitutes table k's delta, pins
      // tables BEFORE it at head and tables AFTER it at their marker
      // versions — so the dirty groups are the union of the terms'
      // group keys, for ANY set of churned tables. Unchurned tables
      // have marker == head (either pin). r19: terms are per
      // OCCURRENCE (a self-joined churned table contributes one term
      // per occurrence — the chain steps one occurrence at a time, so
      // no ΔT⋈ΔT term ever appears).
      try {
        val deltaByName: Map[String, DataFrame] = churned.map { case (n, p) =>
          val (entered, left) =
            ManifestTable.multisetDelta(session, p, recByName(n), vs(n))
          n -> entered.unionByName(left)
        }.toMap
        incremental(session, sh, mviewPath, deltaByName, recByName, vs)
      } catch {
        // retention racing the availability check above: a marker/
        // delta manifest expired between the listing and the reads.
        // EXACTLY this exception degrades to the honest full refresh
        // (under MviewMaintenance an escaped exception would kill the
        // whole streaming query); term-machinery bugs keep throwing
        case _: ManifestTable.ExpiredVersionException =>
          (fullRefresh(session, mviewPath, sql), "full")
      }
    }
  }

  /** How far (in base versions) the unconsumed delta window may grow
    * before an empty-dirty noop still publishes a metadata-only
    * marker commit to re-pin it. Below the threshold noops stay
    * publish-free; past it, one O(manifest) commit (segments by
    * reference) keeps the next delta short-range and the marker's
    * manifest alive (ADVICE r17 — unbounded windows silently degrade
    * to full recomputes once the since-manifest expires). */
  val MarkerAdvanceVersions = 8

  /** Parquet-file census of the last incremental rescan's PRUNED fact
    * read (-1 = the last refresh took the unpruned pinned read) — an
    * observability hook the pruning specs assert against; the count
    * is the manifest census already in memory, not an extra listing. */
  private[graft] var lastRescanFiles: Int = -1

  /** Positional rewrite of the FROM tree: every graft-relation leaf,
    * in the left-to-right order `analyze`'s rels() walk produced (so
    * indexes line up with [[Shape.occs]]), replaced by `repl(i, u)`. */
  private def substOccs(plan: LogicalPlan)(
      repl: (Int, UnresolvedRelation) => LogicalPlan): LogicalPlan = {
    var i = -1
    def walk(p: LogicalPlan): LogicalPlan = p match {
      case u: UnresolvedRelation if graftName(u).isDefined =>
        i += 1; repl(i, u)
      case other => other.withNewChildren(other.children.map(walk))
    }
    walk(plan)
  }

  private def incremental(session: SparkSession, sh: Shape,
      mviewPath: String, deltaByName: Map[String, DataFrame],
      recByName: Map[String, Int], vs: Map[String, Int]): (Int, String) = {
    val deltaNames = deltaByName.keySet
    // dirty keys: one telescoping TERM per churned table OCCURRENCE —
    // the defining filter+grouping+joins replayed with the delta in
    // that occurrence's place, occurrences BEFORE it (in FROM order)
    // pinned at head, occurrences AFTER it pinned at their tables'
    // marker versions — their union covers every group whose feeding
    // multiset changed. Aliased __graft_gk<i> so the join conditions
    // below can never collide with a base column name.
    val gkAliases: Seq[NamedExpression] = sh.groups.zipWithIndex.map {
      case ((e, _), i) => Alias(e, s"__graft_gk$i")()
    }
    def aliased(u: UnresolvedRelation, plan: LogicalPlan): LogicalPlan =
      SubqueryAlias(u.multipartIdentifier.last, plan)
    // occurrence j pinned for the term at occurrence k: earlier at
    // head, later at marker (the telescope's step-k state)
    def pinnedFor(k: Int)(j: Int, u: UnresolvedRelation): LogicalPlan = {
      val o = sh.occs(j)
      aliased(u, ManifestTable.read(session, o.path,
        if (j < k) vs(o.name) else recByName(o.name))
        .queryExecution.analyzed)
    }
    val termFrames: Seq[DataFrame] = sh.occs.zipWithIndex.flatMap {
      case (occ, k) if deltaNames.contains(occ.name) =>
        val delta = deltaByName(occ.name)
        if (!occ.leftOuter) {
          // INNER-joined (or leftmost) occurrence: the join is linear
          // in this input given the others fixed — plain substitution
          val termChild = substOccs(sh.child)((j, u) =>
            if (j == k) aliased(u, delta.queryExecution.analyzed)
            else pinnedFor(k)(j, u))
          Seq(PlanBridge.ofRows(session, Project(gkAliases, termChild)))
        } else {
          // RIGHT side of a LEFT OUTER join: a churned dim row flips
          // its matching fact rows between matched and null-extended —
          // emit BOTH key shapes (object doc, r19). `pre` pins every
          // OTHER occurrence and leaves this one as the sole
          // unresolved graft relation, so the join above it is
          // locatable by subtree membership.
          val pre = substOccs(sh.child)((j, u) =>
            if (j == k) u else pinnedFor(k)(j, u))
          def hasOcc(p: LogicalPlan): Boolean = p.exists {
            case u: UnresolvedRelation => graftName(u).isDefined
            case _ => false
          }
          def substDelta(p: LogicalPlan): LogicalPlan = p.transformUp {
            case u: UnresolvedRelation if graftName(u).isDefined =>
              aliased(u, delta.queryExecution.analyzed)
          }
          // matched keys: flip THIS join to INNER over the delta —
          // exactly the fact rows whose match set changed, with the
          // dim columns carrying the entering/leaving dim values
          def toInner(p: LogicalPlan): LogicalPlan = p match {
            case Join(l, r, LeftOuter, cond, hint) if hasOcc(r) =>
              Join(l, substDelta(r), Inner, cond, hint)
            case other => other.withNewChildren(other.children.map(toInner))
          }
          // null-extended keys: the SAME affected fact rows (left-semi
          // against the delta), with every reference to this
          // occurrence's columns ABOVE the join replaced by a typed
          // NULL — the value those columns hold on a null-extended row
          val occSchema = ManifestTable.snapshotSchema(session, occ.path)
            .getOrElse(throw new IllegalStateException(
              s"base '${occ.name}' has no recorded schema"))
          val otherCols: Set[String] = sh.occs.zipWithIndex.collect {
            case (o, j) if j != k =>
              ManifestTable.snapshotSchema(session, o.path)
                .map(_.fieldNames.toSeq).getOrElse(Nil)
          }.flatten.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
          def occField(c: String) =
            occSchema.fields.find(_.name.equalsIgnoreCase(c))
          def nullOcc(e: Expression): Expression = e.transformUp {
            case ua: UnresolvedAttribute => ua.nameParts match {
              case Seq(q, c) if q.toLowerCase(java.util.Locale.ROOT) ==
                  occ.qualifier && occField(c).isDefined =>
                Literal.create(null, occField(c).get.dataType)
              case Seq(c) if occField(c).isDefined &&
                  !otherCols.contains(c.toLowerCase(java.util.Locale.ROOT)) =>
                Literal.create(null, occField(c).get.dataType)
              case _ => ua
            }
          }
          def toSemi(p: LogicalPlan): (LogicalPlan, Boolean) = p match {
            case Join(l, r, LeftOuter, cond, hint) if hasOcc(r) =>
              (Join(l, substDelta(r), LeftSemi, cond, hint), true)
            case other =>
              val rec = other.children.map(toSemi)
              val p2 = other.withNewChildren(rec.map(_._1))
              val found = rec.exists(_._2)
              // ancestors of the semi join may still reference the
              // occurrence (WHERE predicates, later join conditions):
              // null them — exact null-extended-row semantics
              (if (found) p2.transformExpressions { case e => nullOcc(e) }
               else p2, found)
          }
          val matched = PlanBridge.ofRows(session,
            Project(gkAliases, toInner(pre)))
          val gkNulled: Seq[NamedExpression] = sh.groups.zipWithIndex.map {
            case ((e, _), i) => Alias(nullOcc(e), s"__graft_gk$i")()
          }
          val nulled = PlanBridge.ofRows(session,
            Project(gkNulled, toSemi(pre)._1))
          Seq(matched, nulled)
        }
      case _ => Nil
    }
    val dirty = termFrames.reduce(_.unionByName(_)).distinct().persist()
    try {
      // ONE action answers both downstream questions (r19: isEmpty and
      // the envelope census were two separate jobs per refresh): empty
      // ⇔ zero rows in the first 1001, and the ≤1000-tuple census is
      // exactly these rows. Driver state stays bounded at 1001 tuples.
      val dirtyProbe = dirty.limit(1001).collect()
      if (dirtyProbe.isEmpty)
        // churn outside the WHERE clause — nothing the view reflects
        // changed; the marker stays put (replay is idempotent) UNLESS
        // the unconsumed window has grown past the threshold, where a
        // metadata-only marker commit re-pins every table at its head
        if (deltaNames.map(n => vs(n) - recByName(n)).max
            >= MarkerAdvanceVersions)
          (ManifestTable.recommitWithTxn(session, mviewPath,
            (TxnApp, vs(sh.factName).toLong), dimTxns(sh, vs)), "noop")
        else
          (ManifestTable.currentVersion(session, mviewPath), "noop")
      else {
        // MANIFEST-LEVEL pruning for the localized-churn case (r17;
        // multi-key r18, VERDICT r17 ask #4): when every group key is
        // a plain FACT column and the dirty census is small (≤1000
        // tuples — the dynamic-overwrite precedent), the rescan reads
        // the fact through readWhere with a PER-COLUMN ENVELOPE —
        // `c1 IN (dirty c1 values) AND c2 IN (dirty c2 values) …`
        // (each clause ORed with IS NULL when a dirty tuple carries a
        // null there) — so per-file stats skip the untouched key
        // ranges BEFORE Spark lists a single file. The envelope is a
        // SUPERSET of the dirty set for ≥2 keys (the cross product of
        // the per-column value sets), so exactness rides the semi
        // join below, never the pruning; for ONE key the envelope IS
        // the exact set and the semi join is skipped (it would be
        // pure double-filtering — a per-row hash probe over the whole
        // rescanned slice). Expression keys / large censuses / join
        // shapes whose key may come from a dim keep the plain pinned
        // read + semi join (row-group and runtime filtering still
        // help; manifest pruning has no sound predicate to use).
        // a group key prunes the FACT read only when it provably IS a
        // fact column: qualified (`f.grp`) → the qualifier must alias
        // the fact; bare → the name must exist in the fact's recorded
        // schema and in NO dim's (ambiguity bails to the semi join)
        lazy val dimSchemas = sh.dims.map { case (_, p) =>
          ManifestTable.snapshotSchema(session, p) }
        lazy val factSchema =
          ManifestTable.snapshotSchema(session, sh.factPath)
        def factColumn(ua: UnresolvedAttribute): Option[String] =
          ua.nameParts match {
            case Seq(c) if sh.tables.size == 1 => Some(c)
            case Seq(c) =>
              val inFact = factSchema.exists(
                _.fields.exists(_.name.equalsIgnoreCase(c)))
              val inDim = dimSchemas.exists(_.exists(
                _.fields.exists(_.name.equalsIgnoreCase(c))))
              if (inFact && !inDim) Some(c) else None
            case Seq(q, c) if sh.aliasOf.get(
                q.toLowerCase(java.util.Locale.ROOT))
                .contains(sh.factName) => Some(c)
            case _ => None
          }
        val plainCols: Option[Seq[String]] = {
          val cols = sh.groups.map(_._1).collect {
            case ua: UnresolvedAttribute => factColumn(ua) }.flatten
          // a self-joined fact disables the envelope: the by-name
          // substitution below would hand the pruned census to EVERY
          // occurrence, and the non-fact occurrence must read whole
          if (cols.size == sh.groups.size && !sh.hasRepeatedTable)
            Some(cols)
          else None
        }
        // (pruned read, exact?) — exact means the predicate alone is
        // dirty-set membership and the semi join can be skipped
        val prunedBase: Option[(DataFrame, Boolean)] = plainCols.flatMap {
          cols =>
            val keys = dirtyProbe // the probe above IS the census
            if (keys.length > 1000) None
            else {
              import org.apache.spark.sql.functions.lit
              val pred = cols.zipWithIndex.map { case (cn, i) =>
                val c = col(cn)
                val vals = keys.map(_.get(i)).toIndexedSeq
                val nonNull = vals.filter(_ != null).distinct
                val in = if (nonNull.isEmpty) lit(false) else c.isin(nonNull: _*)
                if (vals.contains(null)) in || c.isNull else in
              }.reduce(_ && _)
              Some((ManifestTable.readWhere(session, sh.factPath, pred,
                vs(sh.factName)), cols.size == 1))
            }
        }
        lastRescanFiles = prunedBase.fold(-1)(_._1.inputFiles.length)
        // rescan: the defining aggregate, every table pinned at head,
        // restricted to the dirty groups (null-safe: NULL is a group)
        val pinnedChild = prunedBase match {
          case Some((df, _)) =>
            // dims pin at head; only the FACT reads through the
            // envelope-pruned census
            pinAll(session, sh.child, sh, vs, skip = Set(sh.factName))
              .transformUp {
                case u: UnresolvedRelation
                    if graftName(u).contains(sh.factName) =>
                  SubqueryAlias(u.multipartIdentifier.last,
                    df.queryExecution.analyzed)
              }
          case None => pinAll(session, sh.child, sh, vs)
        }
        val restricted =
          if (prunedBase.exists(_._2)) pinnedChild
          else {
            val cond = sh.groups.zipWithIndex.map { case ((e, _), i) =>
              EqualNullSafe(e, UnresolvedAttribute(s"__graft_gk$i"))
                : Expression }.reduce(And(_, _))
            Join(pinnedChild, dirty.queryExecution.analyzed,
              LeftSemi, Some(cond),
              JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
          }
        // rebuild the WHOLE defining plan over the restricted child —
        // the shape guarantees exactly one Aggregate, and a HAVING
        // above it re-applies to the recomputed dirty groups (a group
        // newly failing it vanishes via the anti join below)
        val recomputed = PlanBridge.ofRows(session, sh.top.transformUp {
          case a: Aggregate => a.copy(child = restricted)
        })
        // untouched groups carry their image rows by reference-copy
        val old = ManifestTable.read(session, mviewPath)
        val outNames = recomputed.schema.fieldNames
        val antiCond = sh.groups.zipWithIndex.map { case ((_, j), i) =>
          old.col(outNames(j)) <=> dirty.col(s"__graft_gk$i")
        }.reduce(_ && _)
        val clean = old.join(dirty, antiCond, "left_anti")
        // conform both sides to the image's recorded schema before the
        // union (analysis can re-derive slightly different nullability)
        val recorded = ManifestTable.snapshotSchema(session, mviewPath)
          .getOrElse(recomputed.schema)
        def conform(df: DataFrame): DataFrame =
          df.select(recorded.fields.toSeq.map(f =>
            col(f.name).cast(f.dataType).as(f.name)): _*)
        // the primary txn slot carries the fact marker ONLY when it
        // advances — commit's idempotence gate skips a write whose
        // (appId, v) is already recorded, and a DIM-churned refresh
        // leaves the fact marker where it was (the unchanged entry
        // rides txnExtra, which records without gating)
        val factV = vs(sh.factName).toLong
        val factAdvances = deltaNames.contains(sh.factName)
        val v = ManifestTable.commit(session, mviewPath,
          conform(clean).unionByName(conform(recomputed)),
          SaveMode.Overwrite,
          txn = if (factAdvances) Some((TxnApp, factV)) else None,
          txnExtra = dimTxns(sh, vs) ++
            (if (factAdvances) Nil else Seq((TxnApp, factV))))
        (v, "incremental")
      }
    } finally { dirty.unpersist(false); () }
  }
}
