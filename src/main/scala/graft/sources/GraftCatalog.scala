package graft.sources

import org.apache.spark.sql.{Column, Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}

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
    u.multipartIdentifier match {
      case Seq(ns, ident) if norm(ns) == "graft" => resolveSpec(ident)
      case Seq(ident) => resolveSpec(ident)
      case _ => None
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
                  ManifestTable.WideningsTo.get(t).exists(_.contains(f.dataType)) =>
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
