package graft.queries

import graft.QueryGroup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-DS-flavored report shapes (the reference's second correctness
  * corpus, flink-tpcds-test/tpcds-tool/query/): channel-union rollup
  * reports, year-over-year window ratios, multi-channel INTERSECT
  * cohorts, above-average ranking — the composite shapes TPC-H misses.
  */
object DsLike extends QueryGroup {

  private val dec18_2 = DecimalType(18, 2)
  private val dec4_2  = DecimalType(4, 2)

  private def rev = col("l_extendedprice").cast(dec18_2) *
    (lit(1) - col("l_discount").cast(dec4_2))

  override def queries = Seq(

    // TPC-DS Q5/Q77-flavored: per-channel yearly profit report, union
    // of channels, then ROLLUP totals (channel, year) → (channel) →
    // grand total.
    q("d1_channel_rollup",
      """WITH ch AS (
        |  SELECT 'returns' AS channel, year(l_shipdate) AS yr,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS amt
        |  FROM lineitem WHERE l_returnflag = 'R'
        |  UNION ALL
        |  SELECT 'sales', year(l_shipdate),
        |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |  FROM lineitem WHERE l_returnflag <> 'R')
        |SELECT channel, yr, count(*) AS n, CAST(sum(amt) AS DOUBLE) AS amount
        |FROM ch GROUP BY ROLLUP (channel, yr)
        |ORDER BY channel NULLS FIRST, yr NULLS FIRST""".stripMargin) { (s, dir) =>
      val li = t(s, dir)("lineitem")
      def channel(name: String, cond: org.apache.spark.sql.Column) =
        li.filter(cond).select(lit(name).as("channel"),
          year(col("l_shipdate")).as("yr"), rev.as("amt"))
      channel("returns", col("l_returnflag") === "R")
        .unionAll(channel("sales", col("l_returnflag") =!= "R"))
        .rollup("channel", "yr")
        .agg(count(lit(1)).as("n"), sum("amt").cast(DoubleType).as("amount"))
        .orderBy(asc_nulls_first("channel"), asc_nulls_first("yr"))
    },

    // TPC-DS Q75-flavored: year-over-year revenue per brand with the
    // previous year's figure and the growth ratio via LAG.
    q("d2_yoy_growth",
      """WITH y AS (
        |  SELECT p_brand, year(l_shipdate) AS yr,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS amount
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  GROUP BY 1, 2)
        |SELECT p_brand, yr, amount,
        |  lag(amount) OVER (PARTITION BY p_brand ORDER BY yr) AS prev_amount,
        |  round(amount / lag(amount) OVER (PARTITION BY p_brand ORDER BY yr), 6) AS yoy
        |FROM y ORDER BY p_brand, yr""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("p_brand").orderBy("yr")
      val li = t(s, dir)("lineitem")
      val p = t(s, dir)("part")
      li.join(broadcast(p), p("p_partkey") === li("l_partkey"))
        .groupBy(col("p_brand"), year(col("l_shipdate")).as("yr"))
        .agg(sum(rev).cast(DoubleType).as("amount"))
        .withColumn("prev_amount", lag(col("amount"), 1).over(w))
        .withColumn("yoy", round(col("amount") / lag(col("amount"), 1).over(w), 6))
        .orderBy("p_brand", "yr")
    },

    // TPC-DS Q38/Q87-flavored: customers active in ALL THREE years —
    // INTERSECT of per-channel cohorts.
    q("d3_cohort_intersect",
      """SELECT c_custkey FROM (
        |  SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1996
        |  INTERSECT
        |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |  INTERSECT
        |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val o = t(s, dir)("orders")
      def cohort(yr: Int) = o.filter(year(col("o_orderdate")) === yr)
        .select(col("o_custkey").as("c_custkey")).distinct()
      cohort(1996).intersect(cohort(1997)).intersect(cohort(1998))
        .orderBy("c_custkey")
    },

    // TPC-DS Q44-flavored: best/worst performing parts vs the overall
    // average — scalar-average comparison + dual ranking.
    q("d4_above_avg_rank",
      """WITH pa AS (
        |  SELECT l_partkey, CAST(sum(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY l_partkey),
        |avg_all AS (SELECT CAST(sum(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS a FROM pa),
        |ranked AS (
        |  SELECT l_partkey, qty,
        |    rank() OVER (ORDER BY qty DESC, l_partkey) AS best_rank,
        |    rank() OVER (ORDER BY qty ASC, l_partkey) AS worst_rank
        |  FROM pa, avg_all WHERE qty > 1.1 * a)
        |SELECT l_partkey, qty, best_rank, worst_rank FROM ranked
        |WHERE best_rank <= 10 OR worst_rank <= 10
        |ORDER BY l_partkey""".stripMargin) { (s, dir) =>
      val pa = t(s, dir)("lineitem")
        .groupBy("l_partkey")
        .agg(sum(col("l_quantity").cast(DecimalType(9, 2)))
          .cast(DoubleType).as("qty"))
      val avgAll = pa.agg(
        (sum(col("qty").cast(dec18_2)).cast(DoubleType) / count(lit(1))).as("a"))
      val wBest = org.apache.spark.sql.expressions.Window
        .orderBy(col("qty").desc, col("l_partkey"))
      val wWorst = org.apache.spark.sql.expressions.Window
        .orderBy(col("qty").asc, col("l_partkey"))
      pa.join(broadcast(avgAll))
        .filter(col("qty") > lit(1.1) * col("a"))
        .withColumn("best_rank", rank().over(wBest))
        .withColumn("worst_rank", rank().over(wWorst))
        .filter(col("best_rank") <= 10 || col("worst_rank") <= 10)
        .select("l_partkey", "qty", "best_rank", "worst_rank")
        .orderBy("l_partkey")
    })
}
