package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Retract-consuming aggregates over a `_change_kind` changelog
  * (SURVEY.md §2.4 — planner/functions/aggfunctions/
  * MinWithRetractAggFunction.java, MaxWithRetract, FirstValueWithRetract,
  * LastValueWithRetract, ListAggWithRetractAggFunction).
  *
  * The reference's retractable accumulators keep a value multiset so a
  * retraction can expose the next-best value (retracting the current
  * min re-scans the remaining map). The batch-relational equivalent:
  * net out the changelog into the surviving row multiset (+I/+U add an
  * instance, -U/-D remove one — matched on the full row), then run the
  * plain aggregate over the survivors. One groupBy for the netting,
  * one for the aggregate; both shuffle on keys, both partial-agg
  * friendly.
  */
object RetractAgg {

  /** Surviving row multiset of a changelog: rows identified by every
    * column except `_change_kind`, kept `_net` (>0) times. */
  def netRows(changelog: DataFrame): DataFrame = {
    val cols = changelog.columns.filterNot(_ == "_change_kind").map(col)
    changelog
      .groupBy(cols: _*)
      .agg(sum(when(col("_change_kind").isin("+I", "+U"), 1).otherwise(-1))
        .as("_net"))
      .filter(col("_net") > 0)
      .withColumn("_i", explode(sequence(lit(1), col("_net"))))
      .drop("_net", "_i")
  }

  /** MIN/MAX/FIRST/LAST/LISTAGG with retraction: aggregate the
    * surviving multiset per key. first/last order by `seqCol`; the
    * LISTAGG renders values as scale-2 decimals (stable across
    * engines) in seq order. */
  def minMaxFirstLastListAgg(changelog: DataFrame, keyCols: Seq[String],
                             valueCol: String, seqCol: String): DataFrame = {
    val survivors = netRows(changelog)
      .withColumn("_vstr",
        col(valueCol).cast(DecimalType(18, 2)).cast(StringType))
    survivors
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(valueCol)).cast(DoubleType).as("min_v"),
        max(col(valueCol)).cast(DoubleType).as("max_v"),
        min_by(col(valueCol), col(seqCol)).cast(DoubleType).as("first_v"),
        max_by(col(valueCol), col(seqCol)).cast(DoubleType).as("last_v"),
        concat_ws(",",
          transform(sort_array(collect_list(struct(col(seqCol).as("s"),
            col("_vstr").as("v")))), x => x("v"))).as("vals"))
  }
}
