package graft.sources

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL dialect front-end for the reference's temporal-join syntax
  * (SURVEY.md §2.3 — flink-sql-parser SqlSnapshot / `FOR SYSTEM_TIME
  * AS OF`): Spark's grammar reserves that clause for constant time
  * travel, so this parser recognizes the reference's *correlated* form
  *
  * {{{ ... JOIN rates FOR SYSTEM_TIME AS OF o.ts [AS] r ON o.cur = r.cur }}}
  *
  * and rewrites it, text-to-text, into the hinted shape
  * [[graft.plans.AsOfJoinRule]] plans:
  *
  * {{{ SELECT /*+ ASOF_JOIN */ ... JOIN rates AS r ON r.<rowtime> <= o.ts AND o.cur = r.cur }}}
  *
  * The versioned side's rowtime column comes from its CREATE TABLE
  * WATERMARK declaration ([[GraftDDL.rowtimeOf]]) — the exact place
  * the reference's planner finds the version attribute of a temporal
  * table. Everything else delegates to Spark's parser unchanged.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val asofRe =
    """(?is)\bJOIN\s+(\w+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(\w+)\.(\w+)\s+(?:AS\s+)?(\w+)\s+ON\b""".r
  private val selectRe = """(?i)\bSELECT\b""".r

  // the CORRELATED probe form (AS OF <alias>.<col>) — Spark's native
  // grammar cannot express it, so failing to rewrite it must error;
  // the CONSTANT form (AS OF '2024-01-01', Spark time travel) and the
  // phrase inside string literals must pass through untouched.
  private val correlatedProbeRe =
    """(?is)FOR\s+SYSTEM_TIME\s+AS\s+OF\s+\w+\.\w+""".r

  private[graft] def rewriteTemporal(sqlText: String): String = {
    if (correlatedProbeRe.findFirstIn(sqlText).isEmpty) return sqlText
    val rowtimes = Seq.newBuilder[String]
    val replaced = asofRe.replaceAllIn(sqlText, m => {
      val (rightTable, leftAlias, leftTime, rightAlias) =
        (m.group(1), m.group(2), m.group(3), m.group(4))
      val rowtime = GraftDDL.rowtimeOf(rightTable).getOrElse(sys.error(
        s"temporal join: versioned table '$rightTable' declares no WATERMARK " +
          "(the rowtime of FOR SYSTEM_TIME AS OF comes from the DDL, " +
          "as in the reference)"))
      rowtimes += rowtime
      java.util.regex.Matcher.quoteReplacement(
        s"JOIN $rightTable AS $rightAlias ON " +
          s"$rightAlias.$rowtime <= $leftAlias.$leftTime AND ")
    })
    if (replaced == sqlText)
      sys.error(s"unsupported FOR SYSTEM_TIME AS OF shape: $sqlText")
    // mark the first query block so AsOfJoinRule fires; the hint
    // parameters name the versioned sides' rowtime columns so the rule
    // rewrites ONLY the temporal join(s), never an unrelated range
    // join that happens to share the equi+inequality shape.
    selectRe.findFirstMatchIn(replaced) match {
      case Some(m) =>
        val params = rowtimes.result().distinct.mkString(", ")
        replaced.substring(0, m.start) + s"SELECT /*+ ASOF_JOIN($params) */" +
          replaced.substring(m.end)
      case None => replaced
    }
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(rewriteTemporal(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(rewriteTemporal(sqlText))
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
