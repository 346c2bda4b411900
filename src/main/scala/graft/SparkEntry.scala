package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each implemented operator from SURVEY.md §2 is registered as a
  * [[GQuery]] in one of the [[QueryGroup]] objects under
  * `graft.queries`; this object just flattens them into the maps the
  * driver consumes.
  */
object SparkEntry {

  def groups: Seq[QueryGroup] = Seq(
    Q.Relational, Q.Joins, Q.SetOps, Q.Subqueries, Q.OverWindows, Q.GroupingSets,
    Q.Functions, Q.GroupWindows, Q.TextOps, Q.SimilarityQ, Q.MultimodalQ,
    Q.Streaming, Q.Graphs, Q.AggExtras, Q.TypedOps, Q.TpchLike)

  lazy val allQueries: Seq[GQuery] = {
    val qs = groups.flatMap(_.queries)
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: $dup")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(gq => gq.name -> gq.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(gq => gq.oracle.map(gq.name -> _)).toMap
}
