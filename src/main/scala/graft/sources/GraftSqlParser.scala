package graft.sources

import graft.sources.{SqlText => S}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL dialect front-end (SURVEY.md §2.1/§2.3/§2.4 — the statement
  * shapes flink-sql-parser accepts that Spark's grammar does not),
  * consolidated on the [[SqlText]] token model (round-6 used per-shape
  * regexes, which mis-lex quoted identifiers, keywords inside string
  * literals, and comments between keywords):
  *
  *  1. Temporal join text — the reference's *correlated*
  *     `JOIN rates FOR SYSTEM_TIME AS OF o.ts [AS] r ON ...`
  *     (SqlSnapshot): rewritten to the hinted shape
  *     [[graft.plans.AsOfJoinRule]] plans,
  *     `SELECT /*+ ASOF_JOIN(rowtime) */ ... JOIN rates AS r ON
  *     r.rowtime <= o.ts AND ...`. The versioned side's rowtime comes
  *     from its CREATE TABLE WATERMARK ([[GraftDDL.rowtimeOf]]) — the
  *     exact place the reference's planner finds the version
  *     attribute. Spark's CONSTANT time travel (`AS OF '2024-01-01'`)
  *     and the phrase inside string literals/comments pass through
  *     untouched (the lexer, not luck, guarantees the latter now).
  *
  *  2. Group-window text — `GROUP BY TUMBLE/HOP/SESSION(ts,
  *     INTERVAL ...)` + `*_START/_END/_ROWTIME` auxiliaries →
  *     Spark's `window()`/`session_window()` ([[GroupWindowSql]]).
  *
  * Everything else delegates to Spark's parser unchanged.
  */
/** Registry of temporal table functions (SURVEY.md §2.3 — the
  * reference's OTHER temporal-join spelling:
  * `Table.createTemporalTableFunction(timeAttribute, primaryKey)`
  * registered by name and applied as `LATERAL TABLE (Rates(o.ts))`,
  * `flink-table/flink-table-api-java/src/main/java/org/apache/flink/
  * table/functions/TemporalTableFunction.java:36`). An entry binds the
  * function name to its versioned table, the version/time attribute,
  * and the declared primary key; [[GraftSqlParser]] rewrites the
  * correlate into the hinted as-of join shape
  * [[graft.plans.AsOfJoinRule]] plans (key equalities stay in the
  * WHERE clause, exactly where the reference's users write them — the
  * rule consumes them from the Filter above the join). */
object TemporalTableFunctions {
  final case class Entry(table: String, timeAttr: String, primaryKey: String)
  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()
  def register(name: String, table: String, timeAttr: String,
               primaryKey: String): Unit =
    reg.put(name.toLowerCase, Entry(table, timeAttr, primaryKey))
  def get(name: String): Option[Entry] = Option(reg.get(name.toLowerCase))
}

class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  /** Cheap pre-probe so the common no-dialect statement skips the lex. */
  private def mentionsTemporal(sql: String): Boolean =
    sql.toUpperCase.contains("SYSTEM_TIME")

  /** `FROM a, LATERAL TABLE (Fn(a.ts)) [AS] r` → the hinted as-of
    * join shape, the reference's temporal-table-FUNCTION correlate
    * (LogicalCorrelateToJoinFromTemporalTableFunctionRule.scala). The
    * comma correlate becomes `JOIN <table> AS r ON r.<time> <= a.ts`;
    * the user's key equality lives in the WHERE clause and is
    * consumed by AsOfJoinRule's Filter-above-Join match. A LATERAL
    * TABLE over an UNREGISTERED name fails loudly: the plain
    * table-function correlate spells LATERAL VIEW explode in this
    * engine (q:f6/f7), and silently handing the reference's syntax to
    * Spark's parser would name the wrong dialect. */
  private[graft] def rewriteLateralTemporal(sqlText: String): String = {
    if (!sqlText.toUpperCase.contains("LATERAL")) return sqlText
    val toks = S.lex(sqlText)
    def at(i: Int, kw: String) = i < toks.length && toks(i).is(kw)
    def sym(i: Int, s: String) =
      i < toks.length && toks(i).kind == S.Sym && toks(i).text == s
    def nameAt(i: Int) = i < toks.length &&
      (toks(i).kind == S.Ident || toks(i).kind == S.QIdent)
    // paren depth before each token, so the ASOF hint can target the
    // SELECT of the BLOCK containing the correlate (a CTE query's
    // first SELECT is the wrong one)
    val depth = new Array[Int](toks.length + 1)
    for (k <- toks.indices) depth(k + 1) = depth(k) +
      (if (sym(k, "(")) 1 else if (sym(k, ")")) -1 else 0)
    val edits = Seq.newBuilder[S.Splice]
    // SELECT token index of the enclosing block → rowtimes to hint
    val hintAt = scala.collection.mutable.LinkedHashMap[Int, List[String]]()
    var i = 0
    while (i < toks.length) {
      if (at(i, "LATERAL") && at(i + 1, "TABLE") && sym(i + 2, "(")) {
        val close = S.closeParen(toks, i + 2)
        // inside: fn ( alias . col )
        require(nameAt(i + 3) && sym(i + 4, "("),
          s"malformed LATERAL TABLE call: $sqlText")
        val fn = toks(i + 3).ident
        val fnClose = S.closeParen(toks, i + 4)
        require(fnClose == close - 1,
          s"malformed LATERAL TABLE call: $sqlText")
        val entry = TemporalTableFunctions.get(fn).getOrElse(sys.error(
          s"LATERAL TABLE: '$fn' is not a registered temporal table " +
            "function (TemporalTableFunctions.register); for a plain " +
            "table-function correlate use LATERAL VIEW explode"))
        require(nameAt(i + 5) && sym(i + 6, ".") && nameAt(i + 7) &&
            fnClose == i + 8,
          s"LATERAL TABLE temporal correlate takes one <alias>.<time> " +
            s"argument: $sqlText")
        val leftAlias = toks(i + 5).text
        val leftTime = toks(i + 7).text
        var j = close + 1
        if (at(j, "AS")) j += 1
        require(nameAt(j),
          s"LATERAL TABLE correlate needs an alias: $sqlText")
        val rightAlias = toks(j).text
        // consume the preceding comma (the correlate's cross-apply
        // spelling) so the splice yields a plain JOIN
        val start =
          if (i > 0 && sym(i - 1, ",")) toks(i - 1).start else toks(i).start
        // nearest preceding SELECT at the correlate's own paren depth
        // = the SELECT heading the block this join belongs to
        val sel = (i to 0 by -1).find(k =>
          at(k, "SELECT") && depth(k) == depth(i)).getOrElse(sys.error(
          s"no enclosing SELECT for LATERAL TABLE correlate: $sqlText"))
        hintAt.update(sel, entry.timeAttr :: hintAt.getOrElse(sel, Nil))
        edits += S.Splice(start, toks(j).end,
          s" JOIN ${entry.table} AS $rightAlias ON " +
            s"$rightAlias.${entry.timeAttr} <= $leftAlias.$leftTime")
        i = j + 1
      } else i += 1
    }
    val es = edits.result()
    if (es.isEmpty) return sqlText
    val hints = hintAt.toSeq.map { case (sel, rts) =>
      S.Splice(toks(sel).start, toks(sel).end,
        s"SELECT /*+ ASOF_JOIN(${rts.reverse.distinct.mkString(", ")}) */")
    }
    S.splice(sqlText, es ++ hints)
  }

  private[graft] def rewriteTemporal(sqlText: String): String = {
    if (!mentionsTemporal(sqlText)) return sqlText
    val toks = S.lex(sqlText)
    def at(i: Int, kw: String) = i < toks.length && toks(i).is(kw)
    def sym(i: Int, s: String) =
      i < toks.length && toks(i).kind == S.Sym && toks(i).text == s
    def nameAt(i: Int) = i < toks.length &&
      (toks(i).kind == S.Ident || toks(i).kind == S.QIdent)
    // correlated probe: FOR SYSTEM_TIME AS OF <ident>.<ident> in TOKEN
    // space (a string literal containing the phrase no longer trips it)
    var correlated = false
    val edits = Seq.newBuilder[S.Splice]
    val rowtimes = Seq.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (at(i, "FOR") && at(i + 1, "SYSTEM_TIME") && at(i + 2, "AS") &&
          at(i + 3, "OF") && nameAt(i + 4) && sym(i + 5, ".") && nameAt(i + 6)) {
        correlated = true
        // full JOIN shape: JOIN <table> FOR SYSTEM_TIME AS OF a.t [AS] r ON
        val joinIdx = i - 2
        val ok = joinIdx >= 0 && at(joinIdx, "JOIN") && nameAt(joinIdx + 1)
        if (ok) {
          val table = toks(joinIdx + 1)
          val leftAlias = toks(i + 4).text
          val leftTime = toks(i + 6).text
          var j = i + 7
          if (at(j, "AS")) j += 1
          if (nameAt(j) && at(j + 1, "ON")) {
            val rightAlias = toks(j).text
            val rowtime = GraftDDL.rowtimeOf(table.ident).getOrElse(sys.error(
              s"temporal join: versioned table '${table.ident}' declares no " +
                "WATERMARK (the rowtime of FOR SYSTEM_TIME AS OF comes from " +
                "the DDL, as in the reference)"))
            rowtimes += rowtime
            edits += S.Splice(toks(joinIdx).start, toks(j + 1).end,
              s"JOIN ${table.text} AS $rightAlias ON " +
                s"$rightAlias.$rowtime <= $leftAlias.$leftTime AND ")
            i = j + 2
          } else i += 7
        } else i += 7
      } else i += 1
    }
    val es = edits.result()
    if (!correlated) return sqlText
    if (es.isEmpty)
      sys.error(s"unsupported FOR SYSTEM_TIME AS OF shape: $sqlText")
    // mark the first query block so AsOfJoinRule fires; the hint
    // parameters name the versioned sides' rowtime columns so the rule
    // rewrites ONLY the temporal join(s), never an unrelated range
    // join that happens to share the equi+inequality shape.
    val sel = toks.indexWhere(_.is("SELECT"))
    require(sel >= 0, s"no SELECT in temporal-join statement: $sqlText")
    val params = rowtimes.result().distinct.mkString(", ")
    val hinted = es :+ S.Splice(toks(sel).start, toks(sel).end,
      s"SELECT /*+ ASOF_JOIN($params) */")
    S.splice(sqlText, hinted)
  }

  /** `<operand> [NOT] SIMILAR TO <pattern> [ESCAPE '<c>']` →
    * `[NOT] similar_to(operand, pattern[, '<c>'])` — the SQL:2003
    * regex-match operator the reference exposes
    * (FlinkSqlOperatorTable.java:1032 SIMILAR_TO / :1031
    * NOT_SIMILAR_TO) and Spark's grammar lacks. Operand recognition is
    * token-structural: a parenthesized group or call `f(...)` scanning
    * back over balanced parens, else a dotted identifier chain / one
    * literal; the pattern side mirrors it forward. Anything fancier on
    * the left (e.g. `a || b SIMILAR TO ...`) needs its own parens —
    * the rewrite fails loudly rather than guessing precedence. */
  /** Token index where the expression operand ENDING at `operandEnd`
    * begins: a parenthesized group or call `f(...)` scanning back over
    * balanced parens (an ident before `(` is a call unless it is a
    * clause keyword), else a dotted identifier chain or one literal.
    * Shared by the infix-operator rewrites (SIMILAR TO, IS JSON). */
  private def operandStart(toks: Vector[S.Tok], operandEnd: Int,
                           opName: String, sqlText: String): Int = {
    def sym(i: Int, s: String) =
      i >= 0 && i < toks.length && toks(i).kind == S.Sym && toks(i).text == s
    def nameAt(i: Int) = i >= 0 && i < toks.length &&
      (toks(i).kind == S.Ident || toks(i).kind == S.QIdent)
    def valueAt(i: Int) = i >= 0 && i < toks.length &&
      (toks(i).kind == S.Str || toks(i).kind == S.Num)
    val notCallable = Set("SELECT", "WHERE", "AND", "OR", "NOT", "ON",
      "WHEN", "THEN", "ELSE", "BY", "HAVING", "FROM", "JOIN", "AS",
      "IN", "CASE", "DISTINCT", "ALL", "SET", "VALUES", "END")
    if (sym(operandEnd, ")")) {
      var depth = 0
      var i = operandEnd
      var open = -1
      while (i >= 0 && open < 0) {
        if (sym(i, ")")) depth += 1
        else if (sym(i, "(")) { depth -= 1; if (depth == 0) open = i }
        i -= 1
      }
      if (open < 0) sys.error(s"unbalanced parentheses before $opName")
      if (nameAt(open - 1) && (toks(open - 1).kind != S.Ident ||
          !notCallable(toks(open - 1).text.toUpperCase)))
        open - 1 // f(...) keeps its name
      else open
    } else if (nameAt(operandEnd) || valueAt(operandEnd)) {
      var s = operandEnd
      while (nameAt(s) && sym(s - 1, ".") && nameAt(s - 2)) s -= 2
      s
    } else sys.error(
      s"$opName needs a parenthesized/identifier/literal operand " +
        s"on its left (add parens): $sqlText")
  }

  private[graft] def rewriteSimilar(sqlText: String): String = {
    if (!sqlText.toUpperCase.contains("SIMILAR")) return sqlText
    val toks = S.lex(sqlText)
    def at(i: Int, kw: String) = i < toks.length && toks(i).is(kw)
    def sym(i: Int, s: String) =
      i < toks.length && i >= 0 && toks(i).kind == S.Sym && toks(i).text == s
    def nameAt(i: Int) = i >= 0 && i < toks.length &&
      (toks(i).kind == S.Ident || toks(i).kind == S.QIdent)
    def valueAt(i: Int) = i >= 0 && i < toks.length &&
      (toks(i).kind == S.Str || toks(i).kind == S.Num)
    val edits = Seq.newBuilder[S.Splice]
    var i = 0
    while (i < toks.length) {
      if (at(i, "SIMILAR") && at(i + 1, "TO")) {
        val negated = at(i - 1, "NOT")
        val operandEnd = if (negated) i - 2 else i - 1 // last operand token
        val opStart = operandStart(toks, operandEnd, "SIMILAR TO", sqlText)
        // pattern side, mirrored forward
        var j = i + 2
        val patStart = j
        val patEnd =
          if (nameAt(j) && sym(j + 1, "(")) S.closeParen(toks, j + 1)
          else if (nameAt(j) || valueAt(j)) {
            while (sym(j + 1, ".") && nameAt(j + 2)) j += 2
            j
          } else sys.error(s"SIMILAR TO needs a pattern operand: $sqlText")
        var end = patEnd
        var escText = ""
        if (at(patEnd + 1, "ESCAPE")) {
          require(patEnd + 2 < toks.length && toks(patEnd + 2).kind == S.Str,
            s"ESCAPE takes a one-char string literal: $sqlText")
          escText = s", ${toks(patEnd + 2).text}"
          end = patEnd + 2
        }
        val operand = S.textOf(sqlText, toks, opStart, operandEnd + 1)
        val pattern = S.textOf(sqlText, toks, patStart, patEnd + 1)
        val repl = (if (negated) "NOT " else "") +
          s"similar_to($operand, $pattern$escText)"
        edits += S.Splice(toks(opStart).start, toks(end).end, repl)
        i = end + 1
      } else i += 1
    }
    val es = edits.result()
    if (es.isEmpty) sqlText else S.splice(sqlText, es)
  }

  /** `<operand> IS [NOT] JSON [VALUE|OBJECT|ARRAY|SCALAR]` →
    * `[NOT] is_json_*(operand)` — the SQL:2016 predicate family the
    * reference exposes (FlinkSqlOperatorTable IS_JSON_VALUE family;
    * semantics pinned by JsonFunctionsTest.scala). A bare `IS JSON`
    * defaults to VALUE, per the standard. */
  private[graft] def rewriteJsonPredicate(sqlText: String): String = {
    val up = sqlText.toUpperCase
    if (!up.contains("JSON")) return sqlText
    val toks = S.lex(sqlText)
    def at(i: Int, kw: String) = i >= 0 && i < toks.length && toks(i).is(kw)
    val suffixes = Map("VALUE" -> "is_json_value", "OBJECT" -> "is_json_object",
      "ARRAY" -> "is_json_array", "SCALAR" -> "is_json_scalar")
    val edits = Seq.newBuilder[S.Splice]
    var i = 0
    while (i < toks.length) {
      val negated = at(i, "IS") && at(i + 1, "NOT") && at(i + 2, "JSON")
      if (negated || (at(i, "IS") && at(i + 1, "JSON"))) {
        val jsonIdx = if (negated) i + 2 else i + 1
        val (fn, end) = toks.lift(jsonIdx + 1) match {
          case Some(t) if t.kind == S.Ident &&
              suffixes.contains(t.text.toUpperCase) =>
            (suffixes(t.text.toUpperCase), jsonIdx + 1)
          case _ => (suffixes("VALUE"), jsonIdx) // bare IS JSON
        }
        val opStart = operandStart(toks, i - 1, "IS JSON", sqlText)
        val operand = S.textOf(sqlText, toks, opStart, i)
        val repl = (if (negated) "NOT " else "") + s"$fn($operand)"
        edits += S.Splice(toks(opStart).start, toks(end).end, repl)
        i = end + 1
      } else i += 1
    }
    val es = edits.result()
    if (es.isEmpty) sqlText else S.splice(sqlText, es)
  }

  /** `(s1, e1) OVERLAPS (s2, e2)` → `temporal_overlaps(s1, e1, s2, e2)`
    * (SqlStdOperatorTable.OVERLAPS; runtime vectors from the
    * reference's ScalarFunctionsTest.testOverlaps). */
  private[graft] def rewriteOverlaps(sqlText: String): String = {
    if (!sqlText.toUpperCase.contains("OVERLAPS")) return sqlText
    val toks = S.lex(sqlText)
    def sym(i: Int, s: String) =
      i >= 0 && i < toks.length && toks(i).kind == S.Sym && toks(i).text == s
    val edits = Seq.newBuilder[S.Splice]
    var i = 0
    while (i < toks.length) {
      // only the infix form between two parens is the operator — a bare
      // identifier that happens to be named `overlaps` passes through
      if (toks(i).is("OVERLAPS") && sym(i - 1, ")") && sym(i + 1, "(")) {
        val lOpen = operandStart(toks, i - 1, "OVERLAPS", sqlText)
        require(sym(lOpen, "("),
          s"OVERLAPS left period must be a bare (start, end) pair: $sqlText")
        val rClose = S.closeParen(toks, i + 1)
        def two(open: Int, close: Int): (String, String) = {
          val parts = S.splitTopLevel(toks, open + 1, close)
          require(parts.length == 2,
            s"an OVERLAPS period is (start, end), got ${parts.length} elements: $sqlText")
          (S.textOf(sqlText, toks, parts(0)._1, parts(0)._2),
            S.textOf(sqlText, toks, parts(1)._1, parts(1)._2))
        }
        val (s1, e1) = two(lOpen, i - 1)
        val (s2, e2) = two(i + 1, rClose)
        edits += S.Splice(toks(lOpen).start, toks(rClose).end,
          s"temporal_overlaps($s1, $e1, $s2, $e2)")
        i = rClose + 1
      } else i += 1
    }
    val es = edits.result()
    if (es.isEmpty) sqlText else S.splice(sqlText, es)
  }

  /** `[NOT] BETWEEN SYMMETRIC a AND b` → `[NOT] BETWEEN least(a, b)
    * AND greatest(a, b)` (SqlStdOperatorTable SYMMETRIC_BETWEEN /
    * SYMMETRIC_NOT_BETWEEN — bounds compared after swapping into
    * order; Spark's BETWEEN has no SYMMETRIC). Only the bound text is
    * spliced — the operand and any NOT stay untouched. The second
    * bound ends at the next top-level boundary token (AND/OR/clause
    * keyword/comma/closing paren), the same place Spark's own grammar
    * ends a BETWEEN. */
  private[graft] def rewriteBetweenSymmetric(sqlText: String): String = {
    val up = sqlText.toUpperCase
    if (!up.contains("SYMMETRIC")) return sqlText
    val toks = S.lex(sqlText)
    def at(i: Int, kw: String) = i >= 0 && i < toks.length && toks(i).is(kw)
    val boundary = Set("AND", "OR", "AS", "ORDER", "GROUP", "HAVING", "LIMIT",
      "WHERE", "THEN", "ELSE", "END", "WHEN", "UNION", "EXCEPT", "INTERSECT",
      "FROM", "JOIN", "ON", "WINDOW", "IS")
    // scan an expression fragment from `from` to its top-level boundary;
    // a bare identifier directly after a value token (no operator
    // between) is an implicit alias — also a boundary
    def fragmentEnd(from: Int): Int = {
      var depth = 0
      var i = from
      while (i < toks.length) {
        val t = toks(i)
        if (t.kind == S.Sym && t.text == "(") depth += 1
        else if (t.kind == S.Sym && t.text == ")") {
          if (depth == 0) return i
          depth -= 1
        } else if (depth == 0 && t.kind == S.Sym && Seq(",", ";").contains(t.text))
          return i
        else if (depth == 0 && t.kind == S.Ident &&
            boundary(t.text.toUpperCase)) return i
        else if (depth == 0 && i > from &&
            (t.kind == S.Ident || t.kind == S.QIdent)) {
          // an identifier directly after a value token with no operator
          // between is an implicit alias → boundary. NOT a boundary:
          // a call `f(...)`, a dotted-chain member `a.b`, the unit of an
          // `INTERVAL '1' HOUR` literal, and `DATE/TIMESTAMP '...'`
          // typed-literal heads.
          val prev = toks(i - 1)
          val isCall = i + 1 < toks.length && toks(i + 1).kind == S.Sym &&
            toks(i + 1).text == "("
          val afterDot = prev.kind == S.Sym && prev.text == "."
          val intervalUnit = prev.kind == S.Str && i >= 2 &&
            toks(i - 2).is("INTERVAL")
          val typedLiteralHead = t.kind == S.Ident &&
            Set("DATE", "TIMESTAMP", "TIME", "INTERVAL")(t.text.toUpperCase)
          val prevIsValue = prev.kind == S.Num || prev.kind == S.Str ||
            prev.kind == S.QIdent || prev.kind == S.Ident ||
            (prev.kind == S.Sym && prev.text == ")")
          if (prevIsValue && !isCall && !afterDot && !intervalUnit &&
              !typedLiteralHead) return i
        }
        i += 1
      }
      i
    }
    val edits = Seq.newBuilder[S.Splice]
    var i = 0
    while (i < toks.length) {
      if (at(i, "BETWEEN") && at(i + 1, "SYMMETRIC")) {
        val aStart = i + 2
        val aEnd = fragmentEnd(aStart)
        require(at(aEnd, "AND"),
          s"BETWEEN SYMMETRIC needs 'a AND b' bounds: $sqlText")
        val bStart = aEnd + 1
        val bEnd = fragmentEnd(bStart)
        require(bEnd > bStart, s"BETWEEN SYMMETRIC missing upper bound: $sqlText")
        val a = S.textOf(sqlText, toks, aStart, aEnd)
        val b = S.textOf(sqlText, toks, bStart, bEnd)
        // the rewrite DUPLICATES each bound's text (least/greatest):
        // a non-deterministic or subquery bound would evaluate twice
        // with different draws — reject loudly rather than mis-answer
        // (standard BETWEEN SYMMETRIC evaluates each bound once)
        val nonDet =
          "(?i)\\b(rand|randn|random|rand_integer|uuid|shuffle|monotonically_increasing_id)\\s*\\(|\\(\\s*select\\b".r
        Seq(a, b).foreach { frag =>
          require(nonDet.findFirstIn(frag).isEmpty,
            s"BETWEEN SYMMETRIC bound '$frag' is non-deterministic or a " +
              "subquery: the least/greatest rewrite would evaluate it " +
              "twice — bind it to a column first")
        }
        edits += S.Splice(toks(i + 1).start, toks(bEnd - 1).end,
          s"least($a, $b) AND greatest($a, $b)")
        i = bEnd
      } else i += 1
    }
    val es = edits.result()
    if (es.isEmpty) sqlText else S.splice(sqlText, es)
  }

  private val hintOptRe = """'([^']+)'\s*=\s*'([^']*)'""".r

  /** Dynamic table options (FLIP-113 — `FROM t /*+ OPTIONS('k'='v') */`,
    * docs/dev/table/sql/hints.md): a table reference followed by an
    * OPTIONS hint re-binds through [[GraftDDL.withDynamicOptions]] —
    * the option overrides merge into the table's binding for THIS
    * query only, and the spliced-in derived view name carries them.
    * Only fires in table position (after FROM/JOIN/','), only for
    * OPTIONS hints (planner hints like BROADCAST pass through), and a
    * table without a CREATE TABLE binding fails loudly like the
    * reference's validator. */
  private[graft] def rewriteDynamicOptions(sqlText: String): String = {
    if (!sqlText.toUpperCase.contains("OPTIONS")) return sqlText
    val toks = S.lex(sqlText)
    def tablePos(i: Int) = i > 0 && {
      val p = toks(i - 1)
      p.is("FROM") || p.is("JOIN") ||
        (p.kind == S.Sym && p.text == ",")
    }
    val edits = Seq.newBuilder[S.Splice]
    var i = 0
    while (i < toks.length - 1) {
      val t = toks(i)
      val h = toks(i + 1)
      val isOptionsHint = h.kind == S.Hint &&
        h.text.replaceAll("(?s)^/\\*\\+\\s*", "").toUpperCase.startsWith("OPTIONS")
      if ((t.kind == S.Ident || t.kind == S.QIdent) && isOptionsHint &&
          tablePos(i)) {
        val opts = hintOptRe.findAllMatchIn(h.text)
          .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
        require(opts.nonEmpty, s"OPTIONS hint with no options: $sqlText")
        val spark = org.apache.spark.sql.SparkSession.active
        val derived = GraftDDL.withDynamicOptions(spark, t.ident, opts)
        edits += S.Splice(t.start, h.end, derived)
        i += 2
      } else i += 1
    }
    val es = edits.result()
    if (es.isEmpty) sqlText else S.splice(sqlText, es)
  }

  private[graft] def rewriteAll(sqlText: String): String =
    GroupWindowSql.rewrite(
      rewriteBetweenSymmetric(rewriteOverlaps(rewriteJsonPredicate(
        rewriteSimilar(rewriteLateralTemporal(rewriteTemporal(
          rewriteDynamicOptions(sqlText))))))))

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(rewriteAll(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(rewriteAll(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
