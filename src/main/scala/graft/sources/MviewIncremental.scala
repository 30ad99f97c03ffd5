package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, EqualNullSafe, Expression, Literal, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
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
  * image is large. A table appearing twice (self-join) never
  * qualifies — its delta would need the quadratic ΔF ⋈ ΔF term.
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

  final case class Shape(
      /** (normalized name, path) per joined table, join order — the
        * LEFTMOST is the fact (the table whose churn keeps the
        * refresh incremental). Size 1 = the single-table shape. */
      tables: Seq[(String, String)],
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
    def dims: Seq[(String, String)] = tables.tail
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
        // INNER joins of such shapes (r18: the star-join form)
        def shapeOk(p: LogicalPlan): Boolean = p match {
          case _: UnresolvedRelation => true
          case SubqueryAlias(_, c) => shapeOk(c)
          case Filter(_, c) => shapeOk(c)
          case Join(l, r, Inner, _, _) => shapeOk(l) && shapeOk(r)
          case _ => false
        }
        if (!shapeOk(child))
          return Left("the FROM clause is not a single table (or INNER " +
            "joins of distinct tables) with an optional WHERE — outer " +
            "joins, nested queries and set ops rescan as a whole (use " +
            "plain REFRESH)")
        // relations with their nearest FROM-clause alias (for group-key
        // attribution — `GROUP BY f.grp` names the fact via `f`)
        def rels(p: LogicalPlan, alias: Option[String])
            : Seq[(Option[String], UnresolvedRelation)] = p match {
          case u: UnresolvedRelation => Seq((alias, u))
          case SubqueryAlias(a, c) => rels(c, Some(a.name))
          case Filter(_, c) => rels(c, alias)
          case Join(l, r, _, _, _) => rels(l, None) ++ rels(r, None)
          case _ => Nil
        }
        val withAlias = rels(child, None)
        val names = withAlias.map { case (_, u) =>
          val n = graftName(u).getOrElse(
            return Left("a joined table is not in the graft namespace"))
          if (n.contains("@"))
            return Left("a base is a frozen time-travel snapshot — " +
              "its view can never change")
          n
        }
        val aliasOf: Map[String, String] = withAlias.zip(names).map {
          case ((a, u), n) =>
            a.getOrElse(u.multipartIdentifier.last)
              .toLowerCase(java.util.Locale.ROOT) -> n
        }.toMap
        if (names.distinct.size != names.size)
          return Left("a table appears more than once (self-join) — the " +
            "fact delta expansion is not linear there; use plain REFRESH")
        val tables = names.map { n =>
          n -> GraftCatalog.lookup(n).getOrElse(
            return Left(s"the base '$n' is not a registered graft table"))
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
        Right(Shape(tables, top, agg, child, groups, aliasOf))
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
    // per-table recorded markers (fact under TxnApp, dims by name)
    val recs: Seq[Option[Long]] = sh.tables.zipWithIndex.map {
      case ((n, _), i) => ManifestTable.txnVersion(session, mviewPath,
        if (i == 0) TxnApp else DimApp + n)
    }
    if (recs.exists(_.isEmpty)) // unprimed (or a pre-r18 join image)
      return (fullRefresh(session, mviewPath, sql), "full")
    val recByName: Map[String, Int] =
      sh.tables.map(_._1).zip(recs.map(_.get.toInt)).toMap
    if (sh.tables.exists { case (n, _) => recByName(n) > vs(n) })
      return (fullRefresh(session, mviewPath, sql), "full") // RESTOREd base
    val churned = sh.tables.filter { case (n, _) => recByName(n) < vs(n) }
    if (churned.isEmpty)
      (ManifestTable.currentVersion(session, mviewPath), "noop")
    else {
      // TELESCOPING delta (r18): for inner joins the exact multiset
      // identity  A_h⋈B_h − A_s⋈B_s = ΔA⋈B_h + A_s⋈ΔB  generalizes to
      // any table count — term k substitutes table k's delta, pins
      // tables BEFORE it at head and tables AFTER it at their marker
      // versions — so the dirty groups are the union of the terms'
      // group keys, for ANY set of churned tables. Unchurned tables
      // have marker == head (either pin). Falls back to full when a
      // needed delta or marker-version manifest has expired.
      try {
        val terms: Seq[DataFrame] = churned.map { case (n, p) =>
          ManifestTable.multisetDelta(session, p, recByName(n), vs(n))
        }.map { case (entered, left) => entered.unionByName(left) }
        incremental(session, sh, mviewPath, churned.map(_._1), recByName,
          vs, terms)
      } catch {
        case _: IllegalArgumentException => // expired manifest window
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

  private def incremental(session: SparkSession, sh: Shape,
      mviewPath: String, deltaNames: Seq[String],
      recByName: Map[String, Int], vs: Map[String, Int],
      deltas: Seq[DataFrame]): (Int, String) = {
    // dirty keys: one telescoping TERM per churned table — the
    // defining filter+grouping+joins replayed with that table's delta
    // rows in its place, tables BEFORE it (in FROM order) pinned at
    // head, tables AFTER it pinned at their marker versions — their
    // union covers every group whose feeding multiset changed.
    // Aliased __graft_gk<i> so the join conditions below can never
    // collide with a base column name.
    val order: Map[String, Int] =
      sh.tables.map(_._1).zipWithIndex.toMap
    val gkAliases: Seq[NamedExpression] = sh.groups.zipWithIndex.map {
      case ((e, _), i) => Alias(e, s"__graft_gk$i")()
    }
    val termFrames = deltaNames.zip(deltas).map { case (dn, delta) =>
      val vsTerm: Map[String, Int] = sh.tables.map { case (tn, _) =>
        tn -> (if (order(tn) < order(dn)) vs(tn) else recByName(tn))
      }.toMap
      val termChild = pinAll(session, sh.child, sh, vsTerm,
        skip = Set(dn)).transformUp {
        case u: UnresolvedRelation if graftName(u).contains(dn) =>
          SubqueryAlias(u.multipartIdentifier.last,
            delta.queryExecution.analyzed)
      }
      PlanBridge.ofRows(session, Project(gkAliases, termChild))
    }
    val dirty = termFrames.reduce(_.unionByName(_)).distinct().persist()
    try {
      if (dirty.isEmpty)
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
          if (cols.size == sh.groups.size) Some(cols) else None
        }
        // (pruned read, exact?) — exact means the predicate alone is
        // dirty-set membership and the semi join can be skipped
        val prunedBase: Option[(DataFrame, Boolean)] = plainCols.flatMap {
          cols =>
            val keys = dirty.limit(1001).collect()
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
