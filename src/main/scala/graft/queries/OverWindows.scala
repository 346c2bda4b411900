package graft.queries

import graft.QueryGroup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OVER-window surface (SURVEY.md §2.5): ROWS/RANGE frames, bounded
  * and unbounded preceding/following, LEAD/LAG offsets, ranking
  * functions, first/last/nth value — all on Spark's WindowExec, the
  * counterpart of the reference's `operators/over/frame` classes.
  *
  * Every window ORDER BY includes a unique tiebreak column so results
  * are deterministic under any partitioning.
  */
object OverWindows extends QueryGroup {

  private val dec18_2 = DecimalType(18, 2)

  override def queries = Seq(

    // Running total per supplier, ROWS UNBOUNDED PRECEDING
    // (UnboundedOverWindowFrame analog).
    q("w1_rows_running",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
        |FROM lineitem WHERE l_suppkey <= 5
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir)("lineitem").filter(col("l_suppkey") <= 5)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_extendedprice").cast(dec18_2)).over(w)
            .cast(DoubleType).as("running_rev"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // Sliding ROWS frame 2 PRECEDING..CURRENT (RowSlidingOverFrame).
    q("w2_rows_sliding",
      """SELECT o_custkey, o_orderkey,
        |  count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_in_frame,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS min3
        |FROM orders WHERE o_custkey <= 50
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
      t(s, dir)("orders").filter(col("o_custkey") <= 50)
        .select(
          col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).as("n_in_frame"),
          min(col("o_totalprice").cast(dec18_2)).over(w).cast(dec18_2).as("min3"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // RANGE frame over a numeric ordering (RangeSlidingOverFrame).
    q("w3_range_frame",
      """SELECT p_brand, p_partkey, p_retailprice,
        |  count(*) OVER (PARTITION BY p_brand ORDER BY p_retailprice
        |                 RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS n_similar
        |FROM part WHERE p_size <= 10
        |ORDER BY p_brand, p_partkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("p_brand").orderBy("p_retailprice")
        .rangeBetween(-100, Window.currentRow)
      t(s, dir)("part").filter(col("p_size") <= 10)
        .select(
          col("p_brand"), col("p_partkey"), col("p_retailprice"),
          count(lit(1)).over(w).as("n_similar"))
        .orderBy("p_brand", "p_partkey")
    },

    // LEAD/LAG offsets with defaults (OffsetOverFrame.java:128).
    q("w4_lead_lag",
      """SELECT user_id, event_id,
        |  lag(event_type, 1, 'none') OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |  lead(event_type, 1, 'none') OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
        |  coalesce(epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)), -1) AS us_since_prev
        |FROM events WHERE user_id <= 3
        |ORDER BY user_id, event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir)("events").filter(col("user_id") <= 3)
        .select(
          col("user_id"), col("event_id"),
          lag(col("event_type"), 1, "none").over(w).as("prev_type"),
          lead(col("event_type"), 1, "none").over(w).as("next_type"),
          coalesce(
            unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)),
            lit(-1L)).as("us_since_prev"))
        .orderBy("user_id", "event_id")
    },

    // Ranking battery: rank / dense_rank / row_number / percent_rank /
    // ntile / cume_dist (RankAggFunction family, SURVEY §2.4/2.5).
    q("w5_ranking",
      """SELECT c_mktsegment, c_custkey,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM customer WHERE c_custkey <= 300
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc)
      val wu = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir)("customer").filter(col("c_custkey") <= 300)
        .select(
          col("c_mktsegment"), col("c_custkey"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          row_number().over(wu).as("rn"),
          round(percent_rank().over(w), 6).as("prnk"),
          ntile(4).over(wu).as("quartile"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy("c_mktsegment", "c_custkey")
    },

    // first/last/nth value with explicit frames
    // (Range/RowUnboundedFollowingOverFrame analogs).
    q("w6_first_last_nth",
      """SELECT s_nationkey, s_suppkey,
        |  first_value(s_name) OVER w AS first_name,
        |  last_value(s_name) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_name,
        |  nth_value(s_name, 2) OVER w AS second_name
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
        |ORDER BY s_nationkey, s_suppkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("s_nationkey").orderBy(col("s_acctbal").desc, col("s_suppkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir)("supplier")
        .select(
          col("s_nationkey"), col("s_suppkey"),
          first(col("s_name")).over(w).as("first_name"),
          last(col("s_name")).over(wFull).as("last_name"),
          nth_value(col("s_name"), 2).over(w).as("second_name"))
        .orderBy("s_nationkey", "s_suppkey")
    },

    // UNBOUNDED FOLLOWING frame: remaining-revenue-from-here per
    // supplier (Range/RowUnboundedFollowingOverFrame analog).
    q("w8_unbounded_following",
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE) AS remaining
        |FROM lineitem WHERE l_suppkey <= 3
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      t(s, dir)("lineitem").filter(col("l_suppkey") <= 3)
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_extendedprice").cast(dec18_2)).over(w)
            .cast(DoubleType).as("remaining"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    },

    // Top-N per group: row_number + filter — the shape the reference's
    // FlinkLogicalRankRule recognizes into its Rank operator
    // (BatchExecRank, SURVEY §2.6).
    q("w7_topn_per_group",
      """SELECT * FROM (
        |  SELECT n_nationkey, c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal,
        |    row_number() OVER (PARTITION BY n_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey)
        |WHERE rn <= 3
        |ORDER BY n_nationkey, rn""".stripMargin) { (s, dir) =>
      val c = t(s, dir)("customer")
      val n = t(s, dir)("nation")
      val w = Window.partitionBy("n_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .select(
          col("n_nationkey"), col("c_custkey"),
          col("c_acctbal").cast(dec18_2).as("acctbal"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("n_nationkey", "rn")
    },

    // Distribution window functions (PERCENT_RANK / CUME_DIST / NTILE
    // — the reference's WindowAggregate rank-function battery,
    // SURVEY §2.5): rank position normalized to [0,1] and quartile
    // assignment per nation. Exact rational arithmetic in both
    // engines (rank/count ratios), rounded for the rendered compare.
    q("w9_distribution_funcs",
      """SELECT s_nationkey, s_suppkey,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  ntile(4) OVER w AS quartile
        |FROM supplier
        |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
        |ORDER BY s_nationkey, s_suppkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("s_nationkey")
        .orderBy(col("s_acctbal"), col("s_suppkey"))
      t(s, dir)("supplier")
        .select(col("s_nationkey"), col("s_suppkey"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"),
          ntile(4).over(w).as("quartile"))
        .orderBy("s_nationkey", "s_suppkey")
    })
}
