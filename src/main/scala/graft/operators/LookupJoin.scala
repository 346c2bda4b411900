package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lookup join (SURVEY.md §2.3 — StreamExecLookupJoin /
  * LookupJoinRunner.java:34): enrich a fact stream by per-row point
  * lookups into a dimension table.
  *
  * Spark shape: a left BroadcastHashJoin. The dimension is hashed once
  * per executor by the broadcast exchange (no driver materialization,
  * no UDF serialization, codegen'd probe), which is exactly the
  * per-executor cache the reference's lookup runner maintains — and it
  * scales to fat dimensions that would OOM a driver-side collect().
  */
object LookupJoin {

  /** Enrich `facts` with `dimValue` looked up by `factKey` from the
    * (small) `dim` table's key/value columns. Missing keys → null.
    * Duplicate dim keys are collapsed to one value (point-lookup
    * contract), keeping left-row multiplicity exactly 1:1.
    */
  def broadcastLookup(spark: SparkSession, facts: DataFrame, factKey: String,
                      dim: DataFrame, dimKey: String, dimValue: String,
                      outCol: String): DataFrame = {
    val side = dim
      .groupBy(col(dimKey).cast("long").as("__lk_key"))
      .agg(first(col(dimValue).cast("string")).as(outCol))
    facts
      .join(broadcast(side), col(factKey).cast("long") === col("__lk_key"), "left")
      .drop("__lk_key")
  }
}
