package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, EqualNullSafe, Expression, Literal, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.LeftSemi
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
  * Qualification is STRUCTURAL only: one `GROUP BY` aggregate over one
  * registered graft table (optional WHERE), every grouping expression
  * present in the SELECT list (the image must carry the group key to
  * identify dirty rows), deterministic expressions, no subqueries.
  * Non-qualifying queries keep the honest full refresh; `INCREMENTAL`
  * on them refuses with the reason. */
private[graft] object MviewIncremental {

  /** txn appId carrying the base-table version the image reflects. */
  val TxnApp = "graft-mview-base"

  final case class Shape(
      baseName: String, basePath: String,
      agg: Aggregate, child: LogicalPlan,
      /** each grouping expr (ordinals resolved) with its index in the
        * SELECT list — the image column that carries the group key */
      groups: Seq[(Expression, Int)])

  private def unwrap(ne: NamedExpression): Expression = ne match {
    case a: Alias => a.child
    case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAlias => ua.child
    case e => e
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
    plan match {
      case agg @ Aggregate(g, out, child, _) =>
        def rel(p: LogicalPlan): Option[UnresolvedRelation] = p match {
          case u: UnresolvedRelation => Some(u)
          case SubqueryAlias(_, c) => rel(c)
          case Filter(_, c) => rel(c)
          case _ => None
        }
        // the child must be exactly [alias]*[filter]*[alias]* relation
        def shapeOk(p: LogicalPlan): Boolean = p match {
          case _: UnresolvedRelation => true
          case SubqueryAlias(_, c) => shapeOk(c)
          case Filter(_, c) => shapeOk(c)
          case _ => false
        }
        if (!shapeOk(child))
          return Left("the FROM clause is not a single table with an " +
            "optional WHERE (joins, nested queries and set ops rescan " +
            "as a whole — use plain REFRESH)")
        val u = rel(child).get
        val name = u.multipartIdentifier match {
          case Seq(ns, ident) if ns.equalsIgnoreCase("graft") => ident
          case Seq(ident) => ident
          case _ => return Left("the base table is not in the graft namespace")
        }
        if (name.contains("@"))
          return Left("the base is a frozen time-travel snapshot — " +
            "its view can never change")
        val path = GraftCatalog.lookup(name).getOrElse(
          return Left(s"the base '$name' is not a registered graft table"))
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
        // determinism: resolve once (no execution) and inspect
        val analyzed =
          try PlanBridge.ofRows(session, agg).queryExecution.analyzed
          catch { case e: Exception =>
            return Left(s"the defining query does not analyze: ${e.getMessage}") }
        if (analyzed.exists(_.expressions.exists(_.exists(e =>
            e.resolved && !e.deterministic))))
          return Left("the defining query is non-deterministic — a " +
            "partial rescan would disagree with the kept rows")
        Right(Shape(name, path, agg, child, groups))
      case _ =>
        Left("the defining query is not a single GROUP BY aggregate " +
          "(HAVING/ORDER BY/window shapes rescan as a whole — use " +
          "plain REFRESH)")
    }
  }

  /** Substitute the base relation with a read PINNED at `v` — the
    * whole refresh then reflects exactly one base snapshot, and the
    * recorded marker is true even if the base advances mid-refresh. */
  private def pin(session: SparkSession, plan: LogicalPlan,
                  baseName: String, basePath: String, v: Int): LogicalPlan = {
    lazy val read = SubqueryAlias(baseName,
      ManifestTable.read(session, basePath, v).queryExecution.analyzed)
    plan.transformUp { case _: UnresolvedRelation => read }
  }

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
        val baseTo = ManifestTable.currentVersion(session, sh.basePath)
        val df = PlanBridge.ofRows(session,
          pin(session, sh.agg, sh.baseName, sh.basePath, baseTo))
        val rec = ManifestTable.txnVersion(session, mviewPath, TxnApp)
        val txn =
          if (rec.forall(_ < baseTo)) Some((TxnApp, baseTo.toLong)) else None
        ManifestTable.commit(session, mviewPath, df, SaveMode.Overwrite,
          txn = txn)
      case Left(_) =>
        val df = PlanBridge.ofRows(session,
          session.sessionState.sqlParser.parseQuery(sql))
        ManifestTable.commit(session, mviewPath, df, SaveMode.Overwrite)
    }
  }

  /** REFRESH … INCREMENTAL. Returns (version, mode) with mode ∈
    * {incremental, full, noop} — full = the self-priming first
    * refresh (no marker yet, marker ahead after a base RESTORE, or
    * the marker's manifest already expired). Refuses loudly when the
    * defining query does not qualify. */
  def incrementalRefresh(session: SparkSession, name: String,
                         mviewPath: String, sql: String): (Int, String) = {
    val sh = analyze(session, sql) match {
      case Left(reason) => throw new IllegalArgumentException(
        s"REFRESH MATERIALIZED VIEW graft.$name INCREMENTAL: the " +
          s"defining query does not qualify — $reason")
      case Right(s) => s
    }
    val baseTo = ManifestTable.currentVersion(session, sh.basePath)
    ManifestTable.txnVersion(session, mviewPath, TxnApp) match {
      case Some(since) if since == baseTo =>
        (ManifestTable.currentVersion(session, mviewPath), "noop")
      case Some(since) if since < baseTo =>
        val delta =
          try Some(ManifestTable.multisetDelta(session, sh.basePath,
            since.toInt, baseTo))
          catch { case _: IllegalArgumentException => None } // expired marker
        delta match {
          case None => (fullRefresh(session, mviewPath, sql), "full")
          case Some((entered, left)) =>
            incremental(session, sh, mviewPath, since.toInt, baseTo,
              entered.unionByName(left))
        }
      case _ => // no marker yet, or marker ahead (base RESTORE)
        (fullRefresh(session, mviewPath, sql), "full")
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

  private def incremental(session: SparkSession, sh: Shape,
      mviewPath: String, since: Int, baseTo: Int,
      delta: DataFrame): (Int, String) = {
    // dirty keys: the defining filter+grouping over the delta rows.
    // Aliased __graft_gk<i> so the join conditions below can never
    // collide with a base column name.
    val deltaChild = sh.child.transformUp {
      case _: UnresolvedRelation => delta.queryExecution.analyzed
    }
    val gkAliases: Seq[NamedExpression] = sh.groups.zipWithIndex.map {
      case ((e, _), i) => Alias(e, s"__graft_gk$i")()
    }
    val dirty = PlanBridge.ofRows(session, Project(gkAliases, deltaChild))
      .distinct().persist()
    try {
      if (dirty.isEmpty)
        // churn outside the WHERE clause — nothing the view reflects
        // changed; the marker stays put (replay is idempotent) UNLESS
        // the unconsumed window has grown past the threshold, where a
        // metadata-only marker commit re-pins it at baseTo
        if (baseTo - since >= MarkerAdvanceVersions)
          (ManifestTable.recommitWithTxn(session, mviewPath,
            (TxnApp, baseTo.toLong)), "noop")
        else
          (ManifestTable.currentVersion(session, mviewPath), "noop")
      else {
        // MANIFEST-LEVEL pruning for the localized-churn case (r17):
        // when the ONE group key is a plain column and the dirty
        // census is small (≤1000 — the dynamic-overwrite precedent),
        // the rescan reads the base through readWhere with an IN
        // predicate over the dirty keys, so per-file stats skip the
        // untouched key ranges BEFORE Spark lists a single file — the
        // semi join below still applies (exactness never rides the
        // pruning). Expression keys / large censuses keep the plain
        // pinned read + semi join (row-group and runtime filtering
        // still help; manifest pruning has no sound predicate to use).
        val prunedBase: Option[DataFrame] = sh.groups match {
          case Seq((ua: UnresolvedAttribute, _)) =>
            val keys = dirty.limit(1001).collect()
            if (keys.length > 1000) None
            else {
              import org.apache.spark.sql.functions.lit
              val c = col(ua.nameParts.last)
              val vals = keys.map(_.get(0))
              val nonNull = vals.filter(_ != null)
              val in = if (nonNull.isEmpty) lit(false)
                       else c.isin(nonNull.toIndexedSeq: _*)
              val pred = if (vals.exists(_ == null)) in || c.isNull else in
              Some(ManifestTable.readWhere(session, sh.basePath, pred,
                baseTo))
            }
          case _ => None
        }
        // rescan: the defining aggregate, base pinned at `baseTo`,
        // restricted to the dirty groups (null-safe: NULL is a group)
        val pinnedChild = prunedBase match {
          case Some(df) => sh.child.transformUp {
            case _: UnresolvedRelation =>
              SubqueryAlias(sh.baseName, df.queryExecution.analyzed)
          }
          case None => pin(session, sh.child, sh.baseName, sh.basePath,
            baseTo)
        }
        // the pruned readWhere path already applies the dirty-key
        // predicate ROW-LEVEL (readWhere ≡ read + filter by contract),
        // and the IN-over-collected-keys predicate IS exact dirty-set
        // membership for a single plain key — the semi join would be
        // pure double-filtering there (a per-row hash probe over the
        // whole rescanned slice). Expression keys / large censuses
        // keep the broadcast LEFT SEMI as the restriction.
        val restricted =
          if (prunedBase.isDefined) pinnedChild
          else {
            val cond = sh.groups.zipWithIndex.map { case ((e, _), i) =>
              EqualNullSafe(e, UnresolvedAttribute(s"__graft_gk$i"))
                : Expression }.reduce(And(_, _))
            Join(pinnedChild, dirty.queryExecution.analyzed,
              LeftSemi, Some(cond),
              JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
          }
        val recomputed = PlanBridge.ofRows(session,
          sh.agg.copy(child = restricted))
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
        val v = ManifestTable.commit(session, mviewPath,
          conform(clean).unionByName(conform(recomputed)),
          SaveMode.Overwrite, txn = Some((TxnApp, baseTo.toLong)))
        (v, "incremental")
      }
    } finally { dirty.unpersist(false); () }
  }
}
