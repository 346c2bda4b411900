package graft

import graft.sources.{GraftSqlParser, SqlText}
import org.scalatest.funsuite.AnyFunSuite

/** Generative robustness for the token-structural SQL front-end
  * (SURVEY.md r7 "SQL-front-end consolidation"): dialect trigger
  * text inside string literals, comments, and quoted identifiers
  * must NEVER mutate a statement, and the lexer's offsets must
  * always slice the original text exactly (the splice machinery's
  * correctness rests on that invariant). Deterministic seeded
  * generation — the same 600 statements every run.
  */
class SqlTextPropertySpec extends AnyFunSuite {

  // dialect heads that, as BARE identifiers, legitimately trigger
  // rewrites — everything else must survive rewriteAll byte-for-byte
  private val triggers = Seq("SYSTEM_TIME", "LATERAL", "SIMILAR", "JSON",
    "OVERLAPS", "SYMMETRIC", "OPTIONS", "TUMBLE", "HOP", "SESSION",
    "TUMBLE_START", "HOP_END", "SESSION_ROWTIME")

  private val safeIdents = Seq("select", "from", "where", "t1", "col_a",
    "order_key", "x", "y$z", "_tmp", "count", "sum", "group", "by",
    "having", "join", "on", "and", "or", "not", "as", "between", "case",
    "when", "then", "end", "price", "qty")

  private val symbols = Seq("(", ")", ",", ".", "=", "<", ">", "<=", ">=",
    "<>", "+", "-", "*", "/", "||", ";")

  /** One random token's TEXT, well-formed by construction. Trigger
    * words appear only INSIDE strings, comments, and quoted
    * identifiers — where the lexer must neutralize them. */
  private def tokenText(r: scala.util.Random): String = r.nextInt(10) match {
    case 0 => // string literal, possibly containing a trigger + '' escape
      val inner = r.nextInt(3) match {
        case 0 => s"FOR ${triggers(r.nextInt(triggers.length))} AS OF o.ts"
        case 1 => "it''s a ''quoted'' value"
        case _ => triggers(r.nextInt(triggers.length))
      }
      s"'$inner'"
    case 1 => // quoted identifier with doubled-quote escape
      val q = if (r.nextBoolean()) "\"" else "`"
      val inner = if (r.nextBoolean()) triggers(r.nextInt(triggers.length))
        else s"a${q}${q}b c"
      s"$q$inner$q"
    case 2 => // line comment holding trigger text (must vanish harmlessly)
      s"-- ${triggers(r.nextInt(triggers.length))} trailing\n"
    case 3 => // block comment, possibly multi-line, holding trigger text
      s"/* ${triggers(r.nextInt(triggers.length))}\n spans lines */"
    case 4 => // number in one of the lexer's accepted shapes
      Seq("42", "1.5", ".25", "1.5e3", "2E-4")(r.nextInt(5))
    case 5 | 6 => symbols(r.nextInt(symbols.length))
    case _ => safeIdents(r.nextInt(safeIdents.length))
  }

  private def statement(r: scala.util.Random): String = {
    val n = 3 + r.nextInt(25)
    val sb = new StringBuilder("SELECT ")
    for (_ <- 0 until n) {
      sb.append(tokenText(r))
      sb.append(if (r.nextInt(4) == 0) "\n" else " ")
    }
    sb.toString
  }

  test("lexer offsets always slice the source exactly; lex is total on well-formed text") {
    val r = new scala.util.Random(20260814L)
    for (_ <- 0 until 600) {
      val sql = statement(r)
      val toks = SqlText.lex(sql)
      toks.foreach { t =>
        assert(sql.substring(t.start, t.end) == t.text,
          s"offset slice mismatch for $t in <$sql>")
      }
      // tokens are non-overlapping and ordered
      toks.sliding(2).foreach {
        case Vector(a, b) => assert(a.end <= b.start, s"overlap in <$sql>")
        case _ =>
      }
    }
  }

  test("trigger words inside strings/comments/quoted identifiers never rewrite") {
    val parser = new GraftSqlParser(null) // delegate unused by rewriteAll
    val r = new scala.util.Random(424242L)
    for (_ <- 0 until 600) {
      val sql = statement(r)
      val out = parser.rewriteAll(sql)
      assert(out == sql,
        s"non-dialect statement was rewritten:\n IN: $sql\nOUT: $out")
    }
  }
}
