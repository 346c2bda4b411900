package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication (SURVEY.md §2.6 — StreamExecDeduplicate:
  * `DeduplicateKeepFirstRowFunction.java` / `DeduplicateKeepLastRowFunction.java`).
  *
  * Batch form: ROW_NUMBER over (keys, order) = 1 — exactly the rewrite
  * the reference's StreamExecDeduplicateRule recognizes. One shuffle on
  * the keys, Tungsten sort within partitions; scales linearly.
  * Streaming keep-first is `dropDuplicates` with watermark state
  * (see graft.streaming specs).
  */
object Dedup {

  /** Keep the first row per key by (timeCol, tieBreak) ascending. */
  def keepFirst(df: DataFrame, keys: Seq[String], timeCol: String,
                tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col(tieBreak).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Keep the last row per key by (timeCol, tieBreak) ascending. */
  def keepLast(df: DataFrame, keys: Seq[String], timeCol: String,
               tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).desc, col(tieBreak).desc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }
}
