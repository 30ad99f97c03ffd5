package graft

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}
import graft.sources.GraftCatalog

/** The maintenance-statement parser, injected by [[GraftExtensions]]
  * via `injectParser` (the sanctioned extension point — the pattern
  * every lakehouse layer on Spark uses for statements vanilla Spark's
  * grammar lacks):
  *
  *   OPTIMIZE graft.<name> [ZORDER BY (c[, c])]   → compactSmall / compact
  *   VACUUM graft.<name> RETAIN <n> VERSIONS|HOURS [DRY RUN] → expire / preview
  *   RESTORE TABLE graft.<name> TO VERSION AS OF n
  *                            | TO TIMESTAMP AS OF '…' → restore
  *   COPY INTO graft.<name> FROM '<glob>' FILEFORMAT = fmt → copyInto
  *   INSERT INTO graft.<name> REPLACE WHERE cond SELECT … → replaceWhere
  *   ALTER TABLE graft.<name> SET PARTITION SPEC (…) → setPartitionSpec
  *   DESCRIBE HISTORY graft.<name> → the graft_history TVF by name
  *   DESCRIBE DETAIL graft.<name> → one-row table detail
  *   CREATE TABLE [IF NOT EXISTS] graft.<dst> SHALLOW CLONE
  *     graft.<src> [VERSION|TIMESTAMP AS OF …] [LOCATION '…'] → cloneShallow
  *
  * Everything else — including every statement Spark DOES parse, and
  * any OPTIMIZE/VACUUM aimed at a non-graft table — delegates
  * untouched, so the wrapper is invisible outside the two claimed
  * shapes. A claimed-prefix statement that matches neither shape gets
  * a targeted error (the RETAIN clause is REQUIRED on VACUUM: a
  * default retention is a silent time-travel amputation), never a
  * generic parse failure. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case OptimizeStmt(name, where, zorder) =>
      GraftCatalog.OptimizeCommand(name,
        Option(zorder).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil),
        Option(where).map(_.trim))
    case VacuumStmt(name, n, unit, dry) =>
      val byHours = unit.toUpperCase.startsWith("HOUR")
      val keep = n.toIntOption.filter(v => v >= (if (byHours) 0 else 1))
        .getOrElse(throw new IllegalArgumentException(
          if (byHours)
            s"VACUUM graft.$name: RETAIN hours must be >= 0, got $n"
          else
            s"VACUUM graft.$name: RETAIN must keep at least 1 version, got $n"))
      GraftCatalog.VacuumCommand(name, keep, dry != null, byHours = byHours)
    case VacuumNoRetain(name) =>
      throw new IllegalArgumentException(
        s"VACUUM graft.$name needs an explicit retention: " +
          s"VACUUM graft.$name RETAIN <n> VERSIONS|HOURS [DRY RUN] — a " +
          "default would silently amputate time travel")
    case RestoreVersionStmt(name, v) =>
      GraftCatalog.RestoreCommand(name, Some(v.toInt), None)
    case RestoreTimestampStmt(name, ts) =>
      GraftCatalog.RestoreCommand(name, None, Some(ts))
    case RestoreBare(name) =>
      throw new IllegalArgumentException(
        s"RESTORE TABLE graft.$name needs an explicit target: " +
          "TO VERSION AS OF <n> or TO TIMESTAMP AS OF '<ts>'")
    case CloneStmt(ifNotExists, dst, src, v, ts, loc) =>
      GraftCatalog.CloneCommand(dst, src,
        Option(v).map(_.toInt), Option(ts), Option(loc),
        ignoreIfExists = ifNotExists != null)
    case DescribeHistoryStmt(name) =>
      // sugar over the graft_history TVF (which resolves names): the
      // Delta spelling of the audit trail, O(versions) root parses
      org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction(
        "graft_history",
        Seq(org.apache.spark.sql.catalyst.expressions.Literal(
          s"graft.$name")))
    case DescribeDetailStmt(name) =>
      GraftCatalog.DescribeDetailCommand(name)
    case SetPartitionSpecStmt(name, spec) =>
      GraftCatalog.SetPartitionSpecCommand(name, splitSpec(spec))
    case ReplaceWhereStmt(name, cond, query) =>
      // the cond/query boundary is the first SELECT keyword: a
      // condition carrying a subquery is refused downstream anyway
      // (region predicates must be file-prunable scalar predicates)
      GraftCatalog.ReplaceWhereCommand(name, cond.trim,
        delegate.parseQuery(query.replaceAll(";\\s*$", "")))
    case CopyIntoStmt(name, glob, fmt) =>
      GraftCatalog.CopyIntoCommand(name, glob, fmt.toLowerCase)
    case CopyIntoNoFormat(name) =>
      throw new IllegalArgumentException(
        s"COPY INTO graft.$name needs an explicit file format: " +
          s"COPY INTO graft.$name FROM '<path-or-glob>' FILEFORMAT = " +
          "PARQUET|JSON|CSV — inferring one risks misreading the " +
          "landing zone")
    case DeepCloneStmt(dst, _) =>
      throw new IllegalArgumentException(
        s"DEEP CLONE is not supported — a deep clone copies every byte, " +
          s"which is honestly spelled CREATE TABLE graft.$dst … AS " +
          "SELECT …; for a zero-copy branch use SHALLOW CLONE")
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  /** Split a partition-spec list on TOP-LEVEL commas only — a
    * transform like `bucket(4, id)` carries its own comma. */
  private def splitSpec(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer(new StringBuilder)
    var depth = 0
    s.foreach {
      case '(' => depth += 1; out.last.append('(')
      case ')' => depth -= 1; out.last.append(')')
      case ',' if depth == 0 => out += new StringBuilder
      case c => out.last.append(c)
    }
    out.map(_.toString.trim).filter(_.nonEmpty).toSeq
  }

  // (?i) case-insensitive, (?s) dot-matches-newline; names stay the
  // registry's identifier shape (GraftCatalog normalizes case)
  private val Ident = """[A-Za-z_][A-Za-z0-9_]*"""
  private val OptimizeStmt =
    s"""(?is)\\s*OPTIMIZE\\s+graft\\s*\\.\\s*($Ident)(?:\\s+WHERE\\s+(.+?))?\\s*(?:ZORDER\\s+BY\\s*\\(\\s*([^)]*?)\\s*\\))?\\s*;?\\s*""".r
  private val VacuumStmt =
    s"""(?is)\\s*VACUUM\\s+graft\\s*\\.\\s*($Ident)\\s+RETAIN\\s+(\\d+)\\s+(VERSIONS|HOURS)(\\s+DRY\\s+RUN)?\\s*;?\\s*""".r
  private val VacuumNoRetain =
    s"""(?is)\\s*VACUUM\\s+graft\\s*\\.\\s*($Ident)\\s*;?\\s*""".r
  private val RestoreVersionStmt =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?graft\\s*\\.\\s*($Ident)\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*""".r
  private val RestoreTimestampStmt =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?graft\\s*\\.\\s*($Ident)\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']*)'\\s*;?\\s*""".r
  private val RestoreBare =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?graft\\s*\\.\\s*($Ident)\\b.*""".r
  // the AS-OF group is one alternation so "VERSION AS OF n" and
  // "TIMESTAMP AS OF '…'" can't both appear; LOCATION trails either
  private val CloneStmt =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+(?:(IF\\s+NOT\\s+EXISTS)\\s+)?graft\\s*\\.\\s*($Ident)\\s+SHALLOW\\s+CLONE\\s+graft\\s*\\.\\s*($Ident)(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)|\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']*)')?(?:\\s+LOCATION\\s+'([^']*)')?\\s*;?\\s*""".r
  private val DescribeHistoryStmt =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+graft\\s*\\.\\s*($Ident)\\s*;?\\s*""".r
  private val DescribeDetailStmt =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+graft\\s*\\.\\s*($Ident)\\s*;?\\s*""".r
  private val SetPartitionSpecStmt =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+graft\\s*\\.\\s*($Ident)\\s+SET\\s+PARTITION\\s+SPEC\\s*\\(\\s*([^;]*?)\\s*\\)\\s*;?\\s*""".r
  private val ReplaceWhereStmt =
    s"""(?is)\\s*INSERT\\s+INTO\\s+graft\\s*\\.\\s*($Ident)\\s+REPLACE\\s+WHERE\\s+(.+?)\\s+(SELECT\\b.*)""".r
  private val CopyIntoStmt =
    s"""(?is)\\s*COPY\\s+INTO\\s+graft\\s*\\.\\s*($Ident)\\s+FROM\\s+'([^']+)'\\s+FILEFORMAT\\s*=\\s*(PARQUET|JSON|CSV)\\s*;?\\s*""".r
  private val CopyIntoNoFormat =
    s"""(?is)\\s*COPY\\s+INTO\\s+graft\\s*\\.\\s*($Ident)\\b.*""".r
  private val DeepCloneStmt =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?graft\\s*\\.\\s*($Ident)\\s+DEEP\\s+CLONE\\s+(.*)""".r
}
