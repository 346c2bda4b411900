package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal/versioned) join — Spark has no built-in.
  *
  * Semantics follow the reference's temporal row-time join
  * (`flink-table-runtime-blink/.../operators/join/temporal/
  * TemporalRowTimeJoinOperator.java:70`): each left row is matched with
  * the latest right row of the same key whose time is <= the left
  * row's time (right-side "version history").
  *
  * Scale design: instead of a quadratic key self-join + argmax, we
  * union both sides and run ONE window sort per key (single shuffle on
  * the key, linear work, spillable Tungsten sort) carrying the most
  * recent right-side version forward — the plan a 1000-executor
  * cluster can run on 100 TB. The streaming variant lives in
  * [[graft.streaming.StreamingAsOfJoin]].
  */
object AsOfJoin {

  /** Left as-of join. Output: all columns of `left` plus
    * `_asof_<timeCol>`→`_asof_ts` and `_asof_<tieBreakCol>` from the
    * matched right row (null when no right row precedes).
    *
    * Right rows sort before left rows at equal timestamps so an exact
    * time tie matches (ASOF `>=` semantics).
    */
  def batch(left: DataFrame, right: DataFrame,
            keyCol: String, timeCol: String, tieBreakCol: String): DataFrame = {
    val leftFields = left.schema.fields.toSeq

    val rTagged = right.select(
      Seq(
        col(keyCol).as("_k"), col(timeCol).as("_t"), lit(0).as("_side"),
        col(timeCol).as("_r_ts"), col(tieBreakCol).as("_r_tb")) ++
      leftFields.map(f => lit(null).cast(f.dataType).as(f.name)): _*)

    val lTagged = left.select(
      Seq(
        col(keyCol).as("_k"), col(timeCol).as("_t"), lit(1).as("_side"),
        lit(null).cast(right.schema(timeCol).dataType).as("_r_ts"),
        lit(null).cast(right.schema(tieBreakCol).dataType).as("_r_tb")) ++
      leftFields.map(f => col(f.name)): _*)

    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_side").asc, col("_r_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rTagged.unionByName(lTagged)
      .withColumn("_asof_ts", last(col("_r_ts"), ignoreNulls = true).over(w))
      .withColumn(s"_asof_$tieBreakCol", last(col("_r_tb"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_k", "_t", "_side", "_r_ts", "_r_tb")
  }
}
