package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, round}

/** MATCH_RECOGNIZE SQL surface (SURVEY.md §2.9 —
  * flink-table/.../physical/stream/StreamExecMatch.scala:68, SQL
  * standard row-pattern recognition): parses the clause text and
  * compiles it onto [[PatternNFA]]. Supported grammar (the subset the
  * NFA algebra covers, which is the reference's CEP-backed subset):
  *
  * {{{
  * MATCH_RECOGNIZE (
  *   PARTITION BY key ORDER BY ts
  *   [MEASURES FIRST(A.col) AS x, LAST(B.col) AS y, AVG(B.col) AS z,
  *             ROUND(SUM(B.col), 6) AS w, COUNT(B.col) AS n,
  *             MATCH_NUMBER() AS m, C.col AS last_c, ...]
  *   [ONE ROW PER MATCH | ALL ROWS PER MATCH]
  *   [AFTER MATCH SKIP TO NEXT ROW | AFTER MATCH SKIP PAST LAST ROW]
  *   PATTERN (A B+ C? D{2} E{1,3})
  *   [WITHIN INTERVAL 'n' HOUR|MINUTE|SECOND]
  *   DEFINE A AS kind = 'signup', B AS value > 100 AND kind = 'click', ...
  * )
  * }}}
  *
  * MEASURES (ref StreamExecMatch.scala:68; per-variable measure
  * compilation in flink-table-planner-blink/.../codegen/
  * MatchCodeGenerator.scala): FIRST/LAST/AVG/SUM/COUNT/MIN/MAX over
  * `VAR.column`, an optional ROUND(agg, n) wrapper (oracle-stable
  * floats), MATCH_NUMBER(), and bare `VAR.column` (≡ LAST, the SQL
  * final semantics for ONE ROW PER MATCH). Spark-side the measures do
  * NOT run inside the NFA: the scan emits one row per bound event
  * ([[PatternNFA.runPredicatesBindings]]), joins back to the event
  * table on (key, id), and the measures become a plain distributed
  * groupBy((key, match)).agg(...) — FIRST/LAST via min_by/max_by over
  * the sequence position with a per-variable FILTER clause, all
  * codegen'd built-ins, no UDFs.
  *
  * Output modes: ONE ROW PER MATCH (the default, and the only mode the
  * reference supports — flink docs restrict MATCH_RECOGNIZE to it)
  * emits (key, measures...) per match; ALL ROWS PER MATCH emits one
  * row per MATCHED EVENT — (key, match_no, classifier, event_id,
  * measures...) with FINAL measure semantics, the SQL-standard batch
  * extension one step beyond the reference.
  *
  * DEFINE bodies are ARBITRARY boolean SQL expressions over the event
  * row (compiled with `expr()` onto [[PatternNFA.runPredicates]]'s
  * bitmask pre-evaluation), matching the reference's per-variable
  * predicate compilation (flink-table-planner-blink/.../codegen/
  * MatchCodeGenerator.scala, flink-cep/.../pattern/Pattern.java:155
  * `where()`). Variables without a DEFINE entry are rejected (ALL ROWS
  * semantics like an always-true variable would make `within`
  * unbounded).
  */
object MatchRecognize {
  import PatternNFA._

  private val patternRe = """(?is)PATTERN\s*\(([^)]*)\)""".r
  private val defineRe =
    """(?is)DEFINE\s+(.*?)(?:\)\s*$|$)""".r
  // one definition: NAME AS <any expression up to the next ", NAME AS"
  // or end of the DEFINE body>
  private val defOneRe =
    """(?is)(\w+)\s+AS\s+(.*?)(?=,\s*\w+\s+AS\s|\s*$)""".r
  private val withinRe =
    """(?i)WITHIN\s+INTERVAL\s*'(\d+)'\s*(HOUR|MINUTE|SECOND)S?""".r
  private val skipPastRe = """(?i)AFTER\s+MATCH\s+SKIP\s+PAST\s+LAST\s+ROW""".r
  private val varRe = """(\w+)(\+|\?|\{(\d+)(?:,(\d+))?\})?""".r
  private val measuresRe =
    """(?is)MEASURES\s+(.*?)\s*(?=ONE\s+ROW\s+PER|ALL\s+ROWS\s+PER|AFTER\s+MATCH|PATTERN\s*\()""".r
  private val allRowsRe = """(?i)ALL\s+ROWS\s+PER\s+MATCH""".r
  private val mnRe = """(?i)^MATCH_NUMBER\s*\(\s*\)\s+AS\s+(\w+)$""".r
  private val aggRe =
    """(?i)^(FIRST|LAST|AVG|SUM|COUNT|MIN|MAX)\s*\(\s*(\w+)\.(\w+)\s*\)\s+AS\s+(\w+)$""".r
  private val roundAggRe =
    """(?i)^ROUND\s*\(\s*(FIRST|LAST|AVG|SUM|COUNT|MIN|MAX)\s*\(\s*(\w+)\.(\w+)\s*\)\s*,\s*(\d+)\s*\)\s+AS\s+(\w+)$""".r
  private val bareRe = """(?i)^(\w+)\.(\w+)\s+AS\s+(\w+)$""".r

  /** Split a MEASURES body on TOP-LEVEL commas only (ROUND(AVG(B.v), 6)
    * keeps its internal comma). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; sb += '('
      case ')' => depth -= 1; sb += ')'
      case ',' if depth == 0 => out += sb.toString.trim; sb.clear()
      case c => sb += c
    }
    if (sb.nonEmpty) out += sb.toString.trim
    out.result().filter(_.nonEmpty)
  }

  private def parseMeasure(item: String): Measure = item.trim match {
    case mnRe(alias) => Measure("MATCH_NUMBER", "", "", None, alias)
    case roundAggRe(f, v, c, n, alias) =>
      Measure(f.toUpperCase, v.toUpperCase, c, Some(n.toInt), alias)
    case aggRe(f, v, c, alias) =>
      Measure(f.toUpperCase, v.toUpperCase, c, None, alias)
    case bareRe(v, c, alias) => // bare VAR.col ≡ LAST (final semantics)
      Measure("LAST", v.toUpperCase, c, None, alias)
    case other => sys.error(s"unsupported MEASURES item: $other")
  }

  /** One parsed MEASURES item. func ∈ FIRST/LAST/AVG/SUM/COUNT/MIN/
    * MAX/MATCH_NUMBER; `roundTo` is the optional ROUND(…, n) wrapper. */
  final case class Measure(func: String, varName: String, colName: String,
                           roundTo: Option[Int], alias: String)

  /** steps reference `defines` entries by variable name; `defines`
    * keeps clause order, body = raw SQL predicate text. */
  final case class Compiled(steps: Seq[Step], defines: Seq[(String, String)],
                            withinMicros: Long, afterMatch: AfterMatch,
                            measures: Seq[Measure] = Seq.empty,
                            allRows: Boolean = false)

  def compile(clause: String): Compiled = {
    val patternText = patternRe.findFirstMatchIn(clause)
      .map(_.group(1)).getOrElse(sys.error("missing PATTERN (...)"))
    val defines: Seq[(String, String)] = defineRe.findFirstMatchIn(clause)
      .map(m => defOneRe.findAllMatchIn(m.group(1))
        .map(d => d.group(1).toUpperCase -> d.group(2).trim).toSeq)
      .getOrElse(Seq.empty)
    val defined = defines.map(_._1).toSet
    val steps = varRe.findAllMatchIn(patternText.trim).filter(_.group(1).nonEmpty)
      .map { m =>
        val name = m.group(1)
        if (!defined(name.toUpperCase))
          sys.error(s"PATTERN variable $name has no DEFINE entry")
        val quant = (m.group(2), m.group(3), m.group(4)) match {
          case (null, _, _)      => One
          case ("+", _, _)       => OneOrMore()
          case ("?", _, _)       => Optional
          case (_, n, null)      => Times(n.toInt)
          case (_, lo, hi)       => TimesRange(lo.toInt, hi.toInt)
        }
        // Normalize the step NAME (not just the kind) to the uppercase
        // variable identity: BindingRow.var_name / the ALL ROWS
        // classifier carry Step.name, and MEASURES compares against the
        // uppercased Measure.varName — with a lowercase PATTERN variable
        // the un-normalized name would make every FILTER match nothing
        // and the measures silently return null/0.
        Step(name.toUpperCase, name.toUpperCase, quant)
      }.toSeq
    val withinMicros = withinRe.findFirstMatchIn(clause).map { m =>
      val unit = m.group(2).toUpperCase match {
        case "HOUR" => 3600000000L
        case "MINUTE" => 60000000L
        case _ => 1000000L
      }
      m.group(1).toLong * unit
    }.getOrElse(sys.error("WITHIN is required (unbounded patterns retain state forever)"))
    val afterMatch =
      if (skipPastRe.findFirstIn(clause).isDefined) SkipPastLastEvent
      else SkipToNextRow
    val measures = measuresRe.findFirstMatchIn(clause)
      .map(m => splitTopLevel(m.group(1)).map(parseMeasure))
      .getOrElse(Seq.empty)
    measures.filter(_.func != "MATCH_NUMBER").foreach { m =>
      if (!defined(m.varName))
        sys.error(s"MEASURES references undefined pattern variable ${m.varName}")
    }
    require(measures.map(_.alias).distinct.size == measures.size,
      "duplicate MEASURES alias")
    val allRows = allRowsRe.findFirstIn(clause).isDefined
    if (allRows && measures.isEmpty)
      sys.error("ALL ROWS PER MATCH requires a MEASURES clause here")
    Compiled(steps, defines, withinMicros, afterMatch, measures, allRows)
  }

  /** Run the clause over (key, tsMicros, id, kind, ...) events — extra
    * columns are visible to DEFINE predicates and MEASURES. Without a
    * MEASURES clause the output is the legacy match-row shape (key,
    * anchor_id, end_id, chain, counts); with one, the output follows
    * the clause's row-per-match mode (see object doc). */
  def run(spark: SparkSession, events: DataFrame, clause: String): DataFrame = {
    val c = compile(clause)
    val preds = c.defines.map { case (n, body) => n -> expr(body) }
    if (c.measures.isEmpty)
      PatternNFA.runPredicates(spark, events, c.steps, preds,
        c.withinMicros, c.afterMatch)
    else {
      // Exploded bindings → equi-join back to the event rows → the
      // measures are one distributed groupBy over (key, match_no).
      // Joining back (instead of dragging every event column through
      // the NFA's typed scan) keeps the scan narrow AND the measure
      // aggregation codegen'd.
      val b = PatternNFA.runPredicatesBindings(spark, events, c.steps,
          preds, c.withinMicros, c.afterMatch)
        .withColumnRenamed("key", "_bkey")
      val joined = b.join(events,
          b("_bkey") === events("key") && b("event_id") === events("id"))
        .drop("_bkey").drop(events("id"))
      def aggFor(m: Measure): Column = {
        val base = m.func match {
          case "MATCH_NUMBER" => expr("any_value(match_no)")
          case "FIRST" =>
            expr(s"min_by(${m.colName}, pos) FILTER (WHERE var_name = '${m.varName}')")
          case "LAST" =>
            expr(s"max_by(${m.colName}, pos) FILTER (WHERE var_name = '${m.varName}')")
          case f =>
            expr(s"$f(${m.colName}) FILTER (WHERE var_name = '${m.varName}')")
        }
        m.roundTo.map(n => round(base, n)).getOrElse(base).as(m.alias)
      }
      val aggs = c.measures.map(aggFor)
      // group on an internally-named match column so a measure aliased
      // `match_no` (MATCH_NUMBER() is usually aliased exactly that)
      // can't collide with the grouping column.
      val perMatch = joined.groupBy(col("key"), col("match_no").as("_mno"))
        .agg(aggs.head, aggs.tail: _*)
      if (!c.allRows) perMatch.drop("_mno")
      else joined
        .select(col("key"), col("match_no"),
          col("var_name").as("classifier"), col("event_id"))
        .join(perMatch.withColumnRenamed("_mno", "match_no"),
          Seq("key", "match_no"))
    }
  }
}
