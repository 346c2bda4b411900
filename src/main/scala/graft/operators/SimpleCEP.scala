package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Minimal CEP surface (SURVEY.md §2.9 MATCH_RECOGNIZE /
  * flink-cep `Pattern.followedBy(...).within(...)`): batch detection of
  * "A followedBy B within T" per key.
  *
  * `followedBy` = relaxed contiguity (events may intervene), SKIP TO
  * NEXT after the first B per A — each A matches its earliest B.
  * Implemented as a time-bounded join + rank (one shuffle per side on
  * the key; the range predicate keeps state bounded — at cluster scale
  * this is exactly Spark's stream-stream interval join shape). The
  * streaming NFA variant lives in graft.streaming.
  */
object SimpleCEP {

  /** Events `a` (filtered to pattern step A) followed within
    * `withinSeconds` by events `b` (step B), same `keyCol`; returns the
    * earliest B per A. Both inputs need (keyCol, timeCol, idCol).
    */
  def followedBy(a: DataFrame, b: DataFrame, keyCol: String, timeCol: String,
                 idCol: String, withinSeconds: Long): DataFrame = {
    val l = a.select(col(keyCol).as("_k"), col(timeCol).as("a_ts"), col(idCol).as("a_id"))
    val r = b.select(col(keyCol).as("_rk"), col(timeCol).as("b_ts"), col(idCol).as("b_id"))
    val joined = l.join(r,
      col("_k") === col("_rk") &&
      col("b_ts") > col("a_ts") &&
      col("b_ts") < col("a_ts") + expr(s"INTERVAL $withinSeconds SECOND"))
    val w = Window.partitionBy("_k", "a_id").orderBy(col("b_ts").asc, col("b_id").asc)
    joined.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("_k").as(keyCol), col("a_id"), col("a_ts"), col("b_id"), col("b_ts"))
  }
}
