package graft.sources

import org.apache.spark.sql.SparkSession

/** Stats-fed planning (SURVEY.md §4 cost-model row — the reference
  * feeds TPC-DS table/column stats to its optimizer via
  * flink-end-to-end-tests/flink-tpcds-test/.../stats/TpcdsStatsProvider.java:47;
  * Catalyst's analog is catalog statistics + CBO).
  *
  * Registers the warehouse parquet files as external catalog tables and
  * runs `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS`, which
  * is what unlocks:
  *   - rowCount/column NDV propagation through the optimized plan
  *     (`spark.sql.cbo.enabled`),
  *   - cost-based join reordering (`spark.sql.cbo.joinReorder.enabled`),
  *   - size-threshold broadcast decisions from MEASURED sizes instead
  *     of raw file sizes — the mechanism that replaces the forced
  *     broadcast() hints deleted in r4 (VERDICT r3 #1): at any SF the
  *     planner sees the real table size and gates the build side on
  *     `autoBroadcastJoinThreshold`, exactly like the reference's
  *     TABLE_OPTIMIZER_BROADCAST_JOIN_THRESHOLD.
  *
  * At 100 TB this runs once per ingest (stats collection is a scan,
  * amortized across every query that plans against the table).
  */
object WarehouseStats {

  /** Register `tables` under `prefix` and collect table+column stats.
    * Unlike the reference's provider the numbers are measured from the
    * data, not hard-coded per scale factor. */
  def register(spark: SparkSession, dir: String, tables: Seq[String],
               prefix: String = "g_"): Unit =
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $prefix$t")
      spark.sql(
        s"CREATE TABLE $prefix$t USING parquet LOCATION '$dir/$t.parquet'")
      spark.sql(
        s"ANALYZE TABLE $prefix$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }

  /** Run `body` with CBO + cost-based join reorder enabled, restoring
    * the session confs afterwards. */
  def withCbo[A](spark: SparkSession)(body: => A): A = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "true"))
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
