package graft.sources

/** Shared SQL token model for the dialect front-end (SURVEY.md §2.1 —
  * the reference routes all statement text through one parser,
  * flink-sql-parser's generated FlinkSqlParserImpl; this repo's
  * equivalent consolidation point). The round-6 front-end rewrote
  * statements with regexes, which mis-lex quoted identifiers, string
  * literals containing keywords, and comments between keywords. This
  * lexer tokenizes once — skipping comments, respecting single-quoted
  * strings with '' escaping and double-quote/backtick identifier
  * quoting — and every recognizer works on the token stream while
  * REWRITES splice replacement text at original-character offsets, so
  * unrecognized text (including hints and formatting) survives
  * byte-for-byte.
  */
object SqlText {

  sealed trait Kind
  case object Ident extends Kind   // bare identifier or keyword
  case object QIdent extends Kind  // "quoted" or `quoted` identifier
  case object Str extends Kind     // 'string literal' ('' escaping)
  case object Num extends Kind
  case object Sym extends Kind     // punctuation / operator
  case object Hint extends Kind    // /*+ ... */ optimizer hint

  /** One token; [start, end) are offsets into the ORIGINAL text. */
  final case class Tok(kind: Kind, text: String, start: Int, end: Int) {
    /** Case-insensitive keyword test (bare identifiers only: a quoted
      * "select" is an identifier, never the keyword — the exact
      * distinction the regex front-end could not make). */
    def is(kw: String): Boolean =
      kind == Ident && text.equalsIgnoreCase(kw)
    /** Unquoted identifier text (strips "" / `` and un-doubles ""). */
    def ident: String = kind match {
      case QIdent if text.startsWith("\"") =>
        text.substring(1, text.length - 1).replace("\"\"", "\"")
      case QIdent => text.substring(1, text.length - 1).replace("``", "`")
      case _ => text
    }
  }

  /** Tokenize; comments vanish (they carry no grammar), EXCEPT
    * slash-star-plus optimizer hints, which are kept as [[Hint]]
    * tokens (they carry planner meaning — ASOF_JOIN, BROADCAST — and
    * recognizers may look for them). Unterminated strings and
    * comments fail loudly. */
  def lex(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    def isIdentStart(c: Char) = c.isLetter || c == '_'
    def isIdentPart(c: Char) = c.isLetterOrDigit || c == '_' || c == '$'
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val start = i
        val isHint = i + 2 < n && sql.charAt(i + 2) == '+'
        i += 2
        while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        if (i + 1 >= n) sys.error(s"unterminated comment at offset $start")
        i += 2
        if (isHint) out += Tok(Hint, sql.substring(start, i), start, i)
      } else if (c == '\'') {
        val start = i
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2 // '' escape
            else { closed = true; i += 1 }
          } else i += 1
        }
        if (!closed) sys.error(s"unterminated string literal at offset $start")
        out += Tok(Str, sql.substring(start, i), start, i)
      } else if (c == '"' || c == '`') {
        val start = i
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (sql.charAt(i) == c) {
            if (i + 1 < n && sql.charAt(i + 1) == c) i += 2 // doubled escape
            else { closed = true; i += 1 }
          } else i += 1
        }
        if (!closed) sys.error(s"unterminated quoted identifier at offset $start")
        out += Tok(QIdent, sql.substring(start, i), start, i)
      } else if (isIdentStart(c)) {
        val start = i
        while (i < n && isIdentPart(sql.charAt(i))) i += 1
        out += Tok(Ident, sql.substring(start, i), start, i)
      } else if (c.isDigit || (c == '.' && i + 1 < n && sql.charAt(i + 1).isDigit)) {
        val start = i
        while (i < n && (sql.charAt(i).isDigit || sql.charAt(i) == '.' ||
          sql.charAt(i) == 'e' || sql.charAt(i) == 'E' ||
          ((sql.charAt(i) == '+' || sql.charAt(i) == '-') && i > start &&
            (sql.charAt(i - 1) == 'e' || sql.charAt(i - 1) == 'E')))) i += 1
        out += Tok(Num, sql.substring(start, i), start, i)
      } else {
        // multi-char operators first
        val two = if (i + 1 < n) sql.substring(i, i + 2) else ""
        if (Set("<=", ">=", "<>", "!=", "||", "=>").contains(two)) {
          out += Tok(Sym, two, i, i + 2); i += 2
        } else {
          out += Tok(Sym, c.toString, i, i + 1); i += 1
        }
      }
    }
    out.result()
  }

  /** Index of the ')' matching the '(' at `open` (token index), or
    * error — callers always hold a recognized '(' and an unbalanced
    * tail must fail loudly, not silently truncate. */
  def closeParen(toks: Vector[Tok], open: Int): Int = {
    require(toks(open).kind == Sym && toks(open).text == "(",
      s"not an open paren at token $open")
    var depth = 0
    var i = open
    while (i < toks.length) {
      val t = toks(i)
      if (t.kind == Sym && t.text == "(") depth += 1
      else if (t.kind == Sym && t.text == ")") {
        depth -= 1
        if (depth == 0) return i
      }
      i += 1
    }
    sys.error("unbalanced parentheses")
  }

  /** Split the token range [from, to) on TOP-LEVEL commas; returns
    * sub-ranges (from, to) excluding the commas. */
  def splitTopLevel(toks: Vector[Tok], from: Int, to: Int): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var depth = 0
    var segStart = from
    var i = from
    while (i < to) {
      val t = toks(i)
      if (t.kind == Sym && t.text == "(") depth += 1
      else if (t.kind == Sym && t.text == ")") depth -= 1
      else if (t.kind == Sym && t.text == "," && depth == 0) {
        out += ((segStart, i)); segStart = i + 1
      }
      i += 1
    }
    if (segStart < to) out += ((segStart, to))
    out.result()
  }

  /** A pending text replacement: characters [start, end) of the
    * original SQL become `text`. */
  final case class Splice(start: Int, end: Int, text: String)

  /** Apply non-overlapping splices to the original text. */
  def splice(sql: String, edits: Seq[Splice]): String = {
    val sorted = edits.sortBy(_.start)
    sorted.sliding(2).foreach {
      case Seq(a, b) => require(a.end <= b.start,
        s"overlapping SQL rewrites at ${a.start}..${a.end} and ${b.start}")
      case _ =>
    }
    val sb = new StringBuilder
    var pos = 0
    sorted.foreach { e =>
      sb.append(sql.substring(pos, e.start)).append(e.text)
      pos = e.end
    }
    sb.append(sql.substring(pos))
    sb.toString
  }

  /** Original text of the token range [from, to). */
  def textOf(sql: String, toks: Vector[Tok], from: Int, to: Int): String =
    if (from >= to) "" else sql.substring(toks(from).start, toks(to - 1).end)

  /** Render a token slice back to canonical single-spaced text —
    * comments are gone (the lexer dropped them), strings and quoted
    * identifiers are verbatim. Used to hand a CLEANED fragment to a
    * downstream per-item parser that is whitespace-tolerant but
    * comment-blind. */
  def render(toks: Seq[Tok]): String = {
    val sb = new StringBuilder
    var prev: Tok = null
    toks.foreach { t =>
      val noSpaceBefore = t.kind == Sym &&
        Seq(",", ")", "(", ".", ";").contains(t.text)
      val noSpaceAfterPrev = prev != null && prev.kind == Sym &&
        (prev.text == "(" || prev.text == ".")
      if (prev != null && !noSpaceBefore && !noSpaceAfterPrev) sb += ' '
      sb.append(t.text)
      prev = t
    }
    sb.toString
  }
}
