package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *   DEFINE A AS kind = 'signup', B AS kind = 'click', ...
  * )
  * }}}
  *
  * Variables without a DEFINE entry are rejected (ALL ROWS semantics
  * like an always-true variable would make `within` unbounded).
  */
object MatchRecognize {
  import PatternNFA._

  private val patternRe = """(?is)PATTERN\s*\(([^)]*)\)""".r
  private val defineRe =
    """(?is)DEFINE\s+(.*?)(?:\)\s*$|$)""".r
  private val defOneRe =
    """(?i)(\w+)\s+AS\s+\w+\s*=\s*'([^']*)'""".r
  private val withinRe =
    """(?i)WITHIN\s+INTERVAL\s*'(\d+)'\s*(HOUR|MINUTE|SECOND)S?""".r
  private val skipPastRe = """(?i)AFTER\s+MATCH\s+SKIP\s+PAST\s+LAST\s+ROW""".r
  private val varRe = """(\w+)(\+|\?|\{(\d+)(?:,(\d+))?\})?""".r

  final case class Compiled(steps: Seq[Step], withinMicros: Long,
                            afterMatch: AfterMatch)

  def compile(clause: String): Compiled = {
    val patternText = patternRe.findFirstMatchIn(clause)
      .map(_.group(1)).getOrElse(sys.error("missing PATTERN (...)"))
    val defines: Map[String, String] = defineRe.findFirstMatchIn(clause)
      .map(m => defOneRe.findAllMatchIn(m.group(1))
        .map(d => d.group(1).toUpperCase -> d.group(2)).toMap)
      .getOrElse(Map.empty)
    val steps = varRe.findAllMatchIn(patternText.trim).filter(_.group(1).nonEmpty)
      .map { m =>
        val name = m.group(1)
        val kind = defines.getOrElse(name.toUpperCase,
          sys.error(s"PATTERN variable $name has no DEFINE entry"))
        val quant = (m.group(2), m.group(3), m.group(4)) match {
          case (null, _, _)      => One
          case ("+", _, _)       => OneOrMore()
          case ("?", _, _)       => Optional
          case (_, n, null)      => Times(n.toInt)
          case (_, lo, hi)       => TimesRange(lo.toInt, hi.toInt)
        }
        Step(name, kind, quant)
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
    Compiled(steps, withinMicros, afterMatch)
  }

  /** Run the clause over (key, tsMicros, id, kind) events. */
  def run(spark: SparkSession, events: DataFrame, clause: String): DataFrame = {
    val c = compile(clause)
    PatternNFA.run(spark, events, c.steps, c.withinMicros, c.afterMatch)
  }
}
