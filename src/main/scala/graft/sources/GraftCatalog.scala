package graft.sources

import org.apache.spark.sql.{Column, Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation, UnresolvedTable}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{AddColumns, AlterColumns, DeleteAction, DeleteFromTable, DropColumns, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeIntoTable, RenameColumn, SubqueryAlias, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}
import org.apache.spark.sql.types.DataType

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

  private val reg = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def norm(name: String): String = name.toLowerCase(java.util.Locale.ROOT)

  def register(name: String, path: String): Unit = {
    require(name.nonEmpty && !name.contains(".") && !name.contains("@"),
      s"table name '$name' must be a plain identifier (no '.' or '@' — " +
        "'@v<N>' is reserved for time travel)")
    reg.put(norm(name), path)
  }

  def unregister(name: String): Unit = reg.remove(norm(name))

  def lookup(name: String): Option[String] = Option(reg.get(norm(name)))

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

  private def singleField(name: Seq[String], ident: String,
                          what: String): String = {
    require(name.length == 1,
      s"$what on $ident supports top-level columns only, " +
        s"not '${name.mkString(".")}'")
    name.head
  }

  /** The analyzer rule (injected by GraftExtensions): rewrites
    * still-unresolved `graft.<name>` (and bare `<name>`, when
    * registered) relations into the manifest read's analyzed plan, and
    * `INSERT INTO graft.<name>` statements into [[InsertCommand]] —
    * the write-side twin, r12. Two passes on purpose: the INSERT
    * rewrite must claim its target relation BEFORE the read rewrite
    * would turn it into a (non-insertable) scan plan. */
  final class Resolution(session: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val withWrites = plan.resolveOperatorsUp {
        case i @ InsertIntoStatement(u: UnresolvedRelation, partSpec,
            userCols, query, overwrite, _, byName) =>
          specOf(u) match {
            case Some((path, v)) =>
              require(v < 0,
                s"cannot INSERT into time-travel version v$v of " +
                  s"${u.multipartIdentifier.mkString(".")} — snapshots are immutable")
              require(partSpec.isEmpty,
                "static PARTITION clauses are unsupported on graft tables — " +
                  "the table's recorded layout is inherited automatically")
              InsertCommand(u.multipartIdentifier.mkString("."), path,
                query, overwrite, userCols, byName)
            case None => i
          }
        case d @ DeleteFromTable(u: UnresolvedRelation, condition) =>
          specOf(u) match {
            case Some((path, v)) =>
              require(v < 0,
                s"cannot DELETE from time-travel version v$v of " +
                  s"${u.multipartIdentifier.mkString(".")} — snapshots are immutable")
              DeleteCommand(u.multipartIdentifier.mkString("."), path,
                ColumnBridge.column(condition))
            case None => d
          }
        case up @ UpdateTable(u: UnresolvedRelation, assignments, condition) =>
          specOf(u) match {
            case Some((path, v)) =>
              require(v < 0,
                s"cannot UPDATE time-travel version v$v of " +
                  s"${u.multipartIdentifier.mkString(".")} — snapshots are immutable")
              val pairs = assignments.map { a =>
                val name = a.key match {
                  // single-part only: `SET s.a = …` (a struct field or
                  // a qualified name) must not silently assign to a
                  // column named by its LAST part
                  case ua: UnresolvedAttribute if ua.nameParts.length == 1 =>
                    ua.nameParts.head
                  case other => throw new IllegalArgumentException(
                    s"UPDATE on ${u.multipartIdentifier.mkString(".")} can " +
                      s"only assign whole top-level columns, not '${other.sql}'")
                }
                name -> ColumnBridge.column(a.value)
              }
              UpdateCommand(u.multipartIdentifier.mkString("."), path,
                pairs, condition.map(ColumnBridge.column))
            case None => up
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
              require(notMatchedBySrc.isEmpty,
                s"MERGE on $ident: WHEN NOT MATCHED BY SOURCE is unsupported")
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
              def rewrite(e: Expression): Expression = e.transformUp {
                case ua: UnresolvedAttribute if ua.nameParts.length == 2 =>
                  val q = norm(ua.nameParts.head)
                  if (srcQ.contains(q))
                    UnresolvedAttribute(Seq("_src", ua.nameParts(1)))
                  else if (tgtQ.contains(q))
                    UnresolvedAttribute(Seq(ua.nameParts(1)))
                  else ua
              }
              // ON: a conjunction of same-named target=source column
              // equalities — the engine's merge joins BY NAME
              def conjuncts(e: Expression): Seq[Expression] = e match {
                case And(l, r) => conjuncts(l) ++ conjuncts(r)
                case x => Seq(x)
              }
              val keys = conjuncts(onCond).map {
                case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute) =>
                  val (ln, rn) = (l.nameParts.last, r.nameParts.last)
                  require(norm(ln) == norm(rn),
                    s"MERGE on $ident: ON must equate SAME-named columns " +
                      s"(the engine merges by key name), got $l = $r")
                  ln
                case other => throw new IllegalArgumentException(
                  s"MERGE on $ident: ON must be a conjunction of column " +
                    s"equalities, got ${other.sql}")
              }
              // matched actions: at most one UPDATE SET * and one DELETE
              var upd: Option[Option[Column]] = None // None=absent
              var del: Option[Column] = None
              var updIdx = -1; var delIdx = -1
              matchedActs.zipWithIndex.foreach {
                case (UpdateStarAction(c), i) =>
                  require(upd.isEmpty, s"MERGE on $ident: one UPDATE clause only")
                  upd = Some(c.map(e => ColumnBridge.column(rewrite(e))))
                  updIdx = i
                case (DeleteAction(c), i) =>
                  require(del.isEmpty, s"MERGE on $ident: one DELETE clause only")
                  del = Some(c.map(e => ColumnBridge.column(rewrite(e)))
                    .getOrElse(org.apache.spark.sql.functions.lit(true)))
                  delIdx = i
                case (other, _) => throw new IllegalArgumentException(
                  s"MERGE on $ident: only UPDATE SET * and DELETE matched " +
                    s"clauses are supported, got $other")
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
              notMatchedActs match {
                case Seq(InsertStarAction(None)) => ()
                case _ => throw new IllegalArgumentException(
                  s"MERGE on $ident needs exactly WHEN NOT MATCHED THEN " +
                    "INSERT * (the engine's merge always inserts unmatched " +
                    "source rows — filter the source for anything else)")
              }
              val matchedUpdate: Option[Column] = upd match {
                case Some(c) => c // present: None inside = unconditional
                case None => // no UPDATE clause: matches stay untouched
                  Some(org.apache.spark.sql.functions.lit(false))
              }
              MergeCommand(ident, path, srcPlan, keys, matchedUpdate, del,
                withEvolution)
            case None => m
          }
        // ---- ALTER TABLE graft.<name> … — the DDL face over the
        // metadata-only schema-evolution operators (r12)
        case rc @ RenameColumn(u: UnresolvedTable, colName, newName) =>
          val ident = u.multipartIdentifier.mkString(".")
          alterSpec(u, "ALTER") match {
            case Some(path) => AlterCommand(ident, path,
              Rename(singleField(colName.name, ident, "RENAME COLUMN"), newName))
            case None => rc
          }
        case ac @ AddColumns(u: UnresolvedTable, cols) =>
          val ident = u.multipartIdentifier.mkString(".")
          alterSpec(u, "ALTER") match {
            case Some(path) =>
              val adds = cols.map { c =>
                require(c.path.isEmpty,
                  s"ADD COLUMNS on $ident supports top-level columns only")
                require(c.nullable,
                  s"ADD COLUMNS on $ident: new columns must be nullable — " +
                    "every pre-add row reads them as null")
                require(c.position.isEmpty,
                  s"ADD COLUMNS on $ident: the recorded schema appends new " +
                    "columns last — positions are unsupported")
                c.colName -> c.dataType
              }
              AlterCommand(ident, path, Add(adds))
            case None => ac
          }
        case dc @ DropColumns(u: UnresolvedTable, cols, ifExists) =>
          val ident = u.multipartIdentifier.mkString(".")
          alterSpec(u, "ALTER") match {
            case Some(path) => AlterCommand(ident, path,
              Drop(cols.map(f =>
                singleField(f.name, ident, "DROP COLUMN")), ifExists))
            case None => dc
          }
        case al @ AlterColumns(u: UnresolvedTable, specs) =>
          val ident = u.multipartIdentifier.mkString(".")
          alterSpec(u, "ALTER") match {
            case Some(path) =>
              val widens = specs.map { s =>
                require(s.newDataType.isDefined && s.newNullability.isEmpty &&
                    s.newComment.isEmpty && s.newPosition.isEmpty &&
                    s.newDefaultExpression.isEmpty && !s.dropDefault,
                  s"ALTER COLUMN on $ident supports TYPE changes only " +
                    "(the metadata-only widening lattice)")
                singleField(s.column.name, ident, "ALTER COLUMN") ->
                  s.newDataType.get
              }
              AlterCommand(ident, path, Widen(widens))
            case None => al
          }
      }
      withWrites.resolveOperatorsUp {
        case u: UnresolvedRelation if !u.isStreaming =>
          specOf(u) match {
            case Some((path, v)) =>
              ManifestTable.read(session, path, v).queryExecution.analyzed
            case None => u
          }
      }
    }
  }

  /** `INSERT INTO graft.<name>` — the SQL write path. Runs at
    * execution time like Spark's own RunnableCommands: the source
    * query analyzes and executes then, and the write goes through
    * [[ManifestTable.commit]]'s full discipline — strict schema
    * match, CHECK constraints, inherited partition layout (hidden
    * transforms re-derived), bloom indexing, stats continuity, and
    * the atomic conditional publish. Semantics, exactly ANSI:
    *
    *  - `INSERT INTO` appends; `INSERT OVERWRITE` replaces — the
    *    latter only on layout-free tables (a layout is a Scala-API
    *    choice; OVERWRITE through SQL would silently clear it,
    *    so it refuses and names the alternative).
    *  - assignment is POSITIONAL (or BY NAME with the keyword); an
    *    explicit column list `(b, a)` maps query columns to those
    *    names positionally, and must name every table column —
    *    partial inserts with defaults are not a thing here.
    *  - a narrow-typed source is refused by commit's append
    *    discipline, never silently cast. */
  final case class InsertCommand(ident: String, path: String,
      query: LogicalPlan, overwrite: Boolean, userCols: Seq[String],
      byName: Boolean) extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(query)
    override def run(session: SparkSession): Seq[Row] = {
      val src = PlanBridge.ofRows(session, query)
      val recorded = ManifestTable.snapshotSchema(session, path)
      if (overwrite)
        require(ManifestTable.partitionColumns(session, path).isEmpty,
          s"INSERT OVERWRITE on $ident would clear its recorded partition " +
            "layout — use ManifestTable.commit(..., SaveMode.Overwrite, " +
            "partitionBy = <layout>) to overwrite a partitioned table")
      val aligned =
        if (byName && userCols.isEmpty) {
          // BY NAME still refuses a shape drift: an extra source column
          // would otherwise be silently projected away below (the same
          // data-loss pattern copyInto refuses), and a missing one
          // would fail later with a worse error
          recorded.foreach(s => require(
            src.columns.map(norm).toSet == s.fieldNames.map(norm).toSet,
            s"INSERT BY NAME into $ident: source columns " +
              s"(${src.columns.sorted.mkString(", ")}) must match the table " +
              s"(${s.fieldNames.sorted.mkString(", ")}) exactly"))
          src
        }
        else {
          val targets: Seq[String] = userCols match {
            case Nil =>
              recorded.map(_.fieldNames.toSeq).getOrElse(src.columns.toSeq)
            case cols =>
              recorded.foreach(s => require(
                cols.map(norm).toSet == s.fieldNames.map(norm).toSet,
                s"INSERT INTO $ident (${cols.mkString(", ")}) must name " +
                  s"every table column (${s.fieldNames.mkString(", ")}) — " +
                  "partial inserts with defaults are unsupported"))
              cols
          }
          require(src.schema.length == targets.length,
            s"INSERT INTO $ident: query produces ${src.schema.length} " +
              s"column(s), target takes ${targets.length}")
          src.toDF(targets: _*)
        }
      // recorded order (the analyzer resolves names case-insensitively),
      // with ANSI store-assignment on the SAFE side only: a source
      // column whose type is a sanctioned WIDENING of the recorded one
      // (int literal into a long column — the VALUES(1, …) shape)
      // up-casts through the same value-preserving lattice widenColumn
      // uses; anything else reaches commit unchanged and is refused by
      // its strict discipline, never silently narrowed
      val ordered = recorded match {
        case Some(s) =>
          val srcTypes = aligned.schema
            .map(f => norm(f.name) -> f.dataType).toMap
          aligned.select(s.fields.map { f =>
            val c = aligned.col(f.name)
            srcTypes.get(norm(f.name)) match {
              case Some(t) if t != f.dataType &&
                  ManifestTable.safeStoreCast(t, f.dataType) =>
                c.cast(f.dataType).as(f.name)
              case _ => c
            }
          }.toSeq: _*)
        case None => aligned
      }
      ManifestTable.commit(session, path, ordered,
        if (overwrite) SaveMode.Overwrite else SaveMode.Append)
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
      ManifestTable.deleteWhere(session, path, condition)
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
    * as Columns for the CheckAnalysis reason on [[DeleteCommand]]. */
  final case class MergeCommand(ident: String, path: String,
      source: LogicalPlan, keys: Seq[String],
      matchedUpdate: Option[Column], matchedDelete: Option[Column],
      evolve: Boolean) extends LeafRunnableCommand {
    override def innerChildren: Seq[LogicalPlan] = Seq(source)
    override def run(session: SparkSession): Seq[Row] = {
      ManifestTable.merge(session, path, PlanBridge.ofRows(session, source),
        keys, matchedUpdate, matchedDelete, mergeSchema = evolve)
      Nil
    }
  }

  /** One ALTER TABLE change, pre-validated by the rule. */
  sealed trait Alter extends Serializable
  final case class Rename(from: String, to: String) extends Alter
  final case class Add(cols: Seq[(String, DataType)]) extends Alter
  final case class Drop(cols: Seq[String], ifExists: Boolean) extends Alter
  final case class Widen(cols: Seq[(String, DataType)]) extends Alter

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
          ManifestTable.renameColumn(session, path, from, to)
        case Add(cols) =>
          cols.foreach { case (n, t) => ManifestTable.addColumn(session, path, n, t) }
        case Drop(cols, ifExists) =>
          cols.foreach { n =>
            val have = ManifestTable.snapshotSchema(session, path)
              .exists(_.fieldNames.contains(n))
            if (have || !ifExists) ManifestTable.dropColumn(session, path, n)
          }
        case Widen(cols) =>
          cols.foreach { case (n, t) => ManifestTable.widenColumn(session, path, n, t) }
      }
      Nil
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
      import org.apache.spark.sql.functions.lit
      ManifestTable.updateWhere(session, path, assignments,
        condition.getOrElse(lit(true)))
      Nil
    }
  }
}
