package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One library capability exposed to the driver's correctness gate:
  * a Spark-first implementation plus (when SQL-expressible) an
  * equivalent DuckDB oracle query over the same parquet tables.
  *
  * Conventions that keep the driver's hash-compare deterministic:
  *  - every output column is aliased identically in Spark and oracle SQL;
  *  - money/double aggregations go through DECIMAL casts so the result
  *    is order-independent (double summation order varies across
  *    partitions; decimal addition is exact);
  *  - every query ends in a total ORDER BY over a unique key set.
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryGroup {
  def queries: Seq[GQuery]

  /** Oracle-checked query. */
  protected def q(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): GQuery =
    GQuery(name, fn, Some(oracle))

  /** Rows-only checked query (semantics not expressible in DuckDB SQL). */
  protected def qRowsOnly(name: String)(
      fn: (SparkSession, String) => DataFrame): GQuery =
    GQuery(name, fn, None)

  protected def t(spark: SparkSession, dir: String)(name: String): DataFrame =
    Tables(spark, dir, name)
}
