package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** MATCH_RECOGNIZE SQL surface (SURVEY.md §2.9 —
  * flink-table/.../physical/stream/StreamExecMatch.scala:68, SQL
  * standard row-pattern recognition): parses the clause text and
  * compiles it onto [[PatternNFA]]. Supported grammar (the subset the
  * NFA algebra covers, which is the reference's CEP-backed subset):
  *
  * {{{
  * MATCH_RECOGNIZE (
  *   PARTITION BY key ORDER BY ts
  *   [AFTER MATCH SKIP TO NEXT ROW | AFTER MATCH SKIP PAST LAST ROW]
  *   PATTERN (A B+ C? D{2} E{1,3})
  *   [WITHIN INTERVAL 'n' HOUR|MINUTE|SECOND]
  *   DEFINE A AS kind = 'signup', B AS value > 100 AND kind = 'click', ...
  * )
  * }}}
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

  /** steps reference `defines` entries by variable name; `defines`
    * keeps clause order, body = raw SQL predicate text. */
  final case class Compiled(steps: Seq[Step], defines: Seq[(String, String)],
                            withinMicros: Long, afterMatch: AfterMatch)

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
        Step(name, name.toUpperCase, quant)
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
    Compiled(steps, defines, withinMicros, afterMatch)
  }

  /** Run the clause over (key, tsMicros, id, kind, ...) events — extra
    * columns are visible to DEFINE predicates. */
  def run(spark: SparkSession, events: DataFrame, clause: String): DataFrame = {
    val c = compile(clause)
    PatternNFA.runPredicates(spark, events, c.steps,
      c.defines.map { case (n, body) => n -> expr(body) },
      c.withinMicros, c.afterMatch)
  }
}
