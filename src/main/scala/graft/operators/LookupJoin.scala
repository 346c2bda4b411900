package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lookup join (SURVEY.md §2.3 — StreamExecLookupJoin /
  * LookupJoinRunner.java:34): enrich a fact stream by per-row point
  * lookups into an external dimension table, with a per-executor
  * cache.
  *
  * Spark shape: for dimensions that fit in memory, snapshot+broadcast
  * (zero network per row, the planner's BroadcastHashJoin equivalent
  * but through an explicit lookup function — the pattern a JDBC/HBase
  * connector plugs into). The `lookup` closure stands where a
  * connection pool + LRU cache would sit; here it is a broadcast map,
  * keeping the driver contract deterministic and testable.
  */
object LookupJoin {

  /** Enrich `facts` with `dimValue` looked up by `factKey` from the
    * (small) `dim` table's key/value columns. Missing keys → null. */
  def broadcastLookup(spark: SparkSession, facts: DataFrame, factKey: String,
                      dim: DataFrame, dimKey: String, dimValue: String,
                      outCol: String): DataFrame = {
    val snapshot: Map[Long, String] = dim
      .select(col(dimKey).cast("long"), col(dimValue).cast("string"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val bc = spark.sparkContext.broadcast(snapshot)
    val lookupUdf = udf((k: Long) => bc.value.get(k))
    facts.withColumn(outCol, lookupUdf(col(factKey).cast("long")))
  }
}
