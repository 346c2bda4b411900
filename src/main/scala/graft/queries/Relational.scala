package graft.queries

import graft.QueryGroup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch relational core: scan → filter → project → aggregate → sort.
  *
  * Mirrors the reference's Calc / HashAggregate / SortAggregate / Sort /
  * Limit / Rank physical nodes (SURVEY.md §2.2, §2.4, §2.6) — all
  * expressed declaratively so Catalyst plans HashAggregateExec with
  * partial aggregation, TakeOrderedAndProject for sort-limit, and pushes
  * filters/projection into the parquet scan.
  */
object Relational extends QueryGroup {

  private val dec18_2 = DecimalType(18, 2)
  private val dec4_2  = DecimalType(4, 2)

  override def queries = Seq(

    // TPC-H Q1 pricing summary: fused filter+project (Calc), hash agg
    // with partial/final phases, final sort. Money math in DECIMAL so
    // the aggregate is exact and order-independent.
    // Ref semantics: BatchExecHashAggregate.scala:43 + BatchExecCalc.
    q("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  sum(l_quantity) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      val li = t(s, dir)("lineitem")
      val price = col("l_extendedprice").cast(dec18_2)
      val disc  = col("l_discount").cast(dec4_2)
      val tax   = col("l_tax").cast(dec4_2)
      li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(price).cast(DoubleType).as("sum_base_price"),
          sum(price * (lit(1) - disc)).cast(DoubleType).as("sum_disc_price"),
          sum(price * (lit(1) - disc) * (lit(1) + tax)).cast(DoubleType).as("sum_charge"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"),
          (sum(price).cast(DoubleType) / count(lit(1))).as("avg_price"),
          (sum(disc).cast(DoubleType) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Fused project+filter with scalar expressions (StreamExecCalc /
    // BatchExecCalc, SURVEY §2.2) — stays in one WholeStageCodegen span,
    // filter + column pruning pushed to the parquet scan.
    q("q2_calc",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS net_price,
        |  CAST(l_quantity AS BIGINT) AS qty,
        |  upper(l_returnflag) AS flag
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_discount >= 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir)("lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice").cast(dec18_2) * (lit(1) - col("l_discount").cast(dec4_2)))
            .cast(DoubleType).as("net_price"),
          col("l_quantity").cast(LongType).as("qty"),
          upper(col("l_returnflag")).as("flag"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Global (no-key) aggregate — single-group HashAggregate; tests the
    // empty-grouping path (BatchExecHashAggregate with grouping=[]).
    q("q3_global_agg",
      """SELECT count(*) AS n_rows,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
        |FROM lineitem""".stripMargin) { (s, dir) =>
      t(s, dir)("lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(col("l_extendedprice").cast(dec18_2)).cast(DoubleType).as("total_price"),
        min("l_shipdate").as("min_ship"),
        max("l_shipdate").as("max_ship"))
    },

    // Sort + limit → TakeOrderedAndProjectExec (BatchExecSortLimit,
    // SURVEY §2.6): per-partition top-n then global merge, no full sort.
    q("q4_sort_limit",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 25""".stripMargin) { (s, dir) =>
      t(s, dir)("orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    },

    // ORDER BY ... OFFSET ... FETCH (the reference's SortLimit with
    // non-zero offset — Sort.fetch/offset): page 2 of the price
    // ranking. Spark plans offset+limit into the same global
    // TakeOrdered boundary — no full sort.
    q("q7_sort_limit_offset",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 25 OFFSET 25""".stripMargin) { (s, dir) =>
      t(s, dir)("orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(25)
        .limit(25)
    },

    // Multiple DISTINCT aggregates → Catalyst Expand + 2-phase agg
    // (reference splits via SplitAggregateRule, SURVEY §2.4).
    q("q5_distinct_agg",
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT o_orderpriority) AS n_prio,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir)("orders")
        .groupBy("o_orderstatus")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    },

    // Automatic skewed-distinct split (the reference's
    // SplitAggregateRule.scala:108, conf-gated): same answer class as
    // q5, but the plan goes through graft.plans.SplitDistinctAggRule —
    // count(DISTINCT) per (status, pmod(hash(custkey), N)) bucket, then
    // buckets added back — so a hot status never concentrates its
    // whole distinct set in one task. Plan-asserted in PlanSpec.
    q("q8_distinct_split_auto",
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_cust,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
        |  count(*) AS n_orders,
        |  max(o_totalprice) AS max_price
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val base = t(s, dir)("orders")
        .groupBy("o_orderstatus")
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev_dec"),
          count(lit(1)).as("n_orders"),
          max(col("o_totalprice")).as("max_price"))
      val split = graft.plans.SplitDistinctAggRule
        .maybeSplit(base.queryExecution.analyzed, buckets = 64)
      org.apache.spark.sql.GraftSqlBridge.ofRows(s, split)
        .select(col("o_orderstatus"), col("n_cust"),
          col("rev_dec").cast("double").as("rev"),
          col("n_orders"), col("max_price"))
        .orderBy("o_orderstatus")
    },

    // Agg function battery: min/max/first-last-by-order/stddev/variance
    // (reference aggfunctions/*, SURVEY §2.4). Stat moments rounded to
    // 6dp — they are double-only in both engines.
    q("q6_agg_funcs",
      """SELECT c_mktsegment,
        |  min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        |  round(stddev_samp(c_acctbal), 4) AS sd_bal,
        |  round(var_samp(c_acctbal), 4) AS var_bal,
        |  min_by(c_name, c_custkey) AS first_name,
        |  max_by(c_name, c_custkey) AS last_name
        |FROM customer
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      t(s, dir)("customer")
        .groupBy("c_mktsegment")
        .agg(
          min("c_acctbal").as("min_bal"),
          max("c_acctbal").as("max_bal"),
          sum(col("c_acctbal").cast(dec18_2)).cast(DoubleType).as("sum_bal"),
          round(stddev_samp(col("c_acctbal")), 4).as("sd_bal"),
          round(var_samp(col("c_acctbal")), 4).as("var_bal"),
          min_by(col("c_name"), col("c_custkey")).as("first_name"),
          max_by(col("c_name"), col("c_custkey")).as("last_name"))
        .orderBy("c_mktsegment")
    })
}
