package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4.2 / the reference's SplitAggregateRule
  * bucketed distinct-agg split): salting utilities that turn one hot
  * key into `salts` sub-keys so no single reducer drowns.
  *
  * AQE's skew-join handling covers sort-merge joins automatically;
  * these helpers cover the aggregate path (pre-aggregate per salted
  * key, then merge) — the two-level MOD(HASH_CODE(x), N) rewrite of
  * SplitAggregateRule.scala expressed as plain DataFrame ops.
  */
object SkewJoin {

  /** Two-phase salted aggregation: sum/count grouped by `key` computed
    * as groupBy(key, salt) partial → groupBy(key) final. Result is
    * identical to a direct groupBy (addition is associative on longs/
    * decimals) but the first shuffle fans each hot key over `salts`
    * reducers. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column,
                     salts: Int): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum("_psum").as("total"), sum("_pcnt").as("n"))
  }
}
