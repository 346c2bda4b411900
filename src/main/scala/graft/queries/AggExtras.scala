package graft.queries

import graft.QueryGroup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregate-function parity extras (SURVEY.md §2.4 aggfunctions):
  * ordered LISTAGG, multiset COLLECT, exact percentiles/median, and
  * sketch aggregates (rows-only — no DuckDB equivalent of Spark's HLL
  * bit-for-bit).
  */
object AggExtras extends QueryGroup {

  override def queries = Seq(

    // LISTAGG with deterministic order (ListAggWithRetractAggFunction
    // analog; order fixed by sorting — the reference's LISTAGG has no
    // ordering guarantee, ours is strictly stronger).
    q("a1_listagg",
      """SELECT s_nationkey,
        |  string_agg(s_name, ',' ORDER BY s_name) AS names
        |FROM supplier GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin) { (s, dir) =>
      t(s, dir)("supplier")
        .groupBy("s_nationkey")
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("names"))
        .orderBy("s_nationkey")
    },

    // Multiset COLLECT (element → count), rendered sorted for
    // engine-neutral comparison (MULTISET → MapType per SURVEY §1.2).
    q("a2_collect_multiset",
      """SELECT o_orderstatus,
        |  string_agg(pc, ',' ORDER BY pc) AS multiset
        |FROM (SELECT o_orderstatus, o_orderpriority || ':' || count(*) AS pc
        |      FROM orders GROUP BY o_orderstatus, o_orderpriority)
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      t(s, dir)("orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(col("o_orderstatus"),
          concat(col("o_orderpriority"), lit(":"), col("n")).as("pc"))
        .groupBy("o_orderstatus")
        .agg(array_join(array_sort(collect_list(col("pc"))), ",").as("multiset"))
        .orderBy("o_orderstatus")
    },

    // Exact percentiles / median (interpolating) per group.
    q("a3_percentiles",
      """SELECT c_mktsegment,
        |  round(quantile_cont(c_acctbal, 0.5), 6) AS p50,
        |  round(quantile_cont(c_acctbal, 0.9), 6) AS p90,
        |  round(median(c_acctbal), 6) AS med
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      t(s, dir)("customer")
        .groupBy("c_mktsegment")
        .agg(
          round(expr("percentile(c_acctbal, 0.5)"), 6).as("p50"),
          round(expr("percentile(c_acctbal, 0.9)"), 6).as("p90"),
          round(expr("percentile(c_acctbal, 0.5)"), 6).as("med"))
        .orderBy("c_mktsegment")
    },

    // Typed UDAF (Aggregator): FIRST/LAST_VALUE with explicit order —
    // registered for SQL and exercised through it (SURVEY §2.10).
    q("a5_first_last_by_order",
      """WITH o AS (SELECT user_id, value, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rf,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rl
        |  FROM events)
        |SELECT f.user_id, f.value AS first_v, l.value AS last_v
        |FROM (SELECT user_id, value FROM o WHERE rf = 1) f
        |JOIN (SELECT user_id, value FROM o WHERE rl = 1) l USING (user_id)
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      import graft.functions.OrderedAggregators._
      s.udf.register("first_by", udaf(new FirstValueByOrder))
      s.udf.register("last_by", udaf(new LastValueByOrder))
      graft.Tables.registerAll(s, dir)
      s.sql(
        """SELECT user_id,
          |  first_by(value, unix_micros(ts), event_id) AS first_v,
          |  last_by(value, unix_micros(ts), event_id) AS last_v
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
    },

    // Table aggregate (UDTAGG, SURVEY §2.4 GroupTableAggFunction):
    // emit top-2 rows per group from one aggregate — Aggregator-style
    // collect → sort → slice → explode.
    q("a6_table_agg",
      """SELECT s_nationkey, rank, s_suppkey, CAST(bal AS DECIMAL(18,2)) AS bal FROM (
        |  SELECT s_nationkey, s_suppkey, s_acctbal AS bal,
        |    row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rank
        |  FROM supplier)
        |WHERE rank <= 2
        |ORDER BY s_nationkey, rank""".stripMargin) { (s, dir) =>
      t(s, dir)("supplier")
        .groupBy("s_nationkey")
        .agg(slice(reverse(array_sort(collect_list(
          struct(col("s_acctbal"), (lit(Long.MaxValue) - col("s_suppkey")).as("_inv"),
            col("s_suppkey"))))), 1, 2).as("top2"))
        .select(col("s_nationkey"), posexplode(col("top2")))
        .select(col("s_nationkey"), (col("pos") + 1).as("rank"),
          col("col.s_suppkey").as("s_suppkey"),
          col("col.s_acctbal").cast(DecimalType(18, 2)).as("bal"))
        .orderBy("s_nationkey", "rank")
    },

    // Window ratio-to-report: each nation's share of its region's
    // customer balance (agg + window over agg).
    q("a7_ratio_to_report",
      """WITH nb AS (
        |  SELECT r_name, n_name,
        |    sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY r_name, n_name)
        |SELECT r_name, n_name,
        |  CAST(bal AS DOUBLE) AS bal,
        |  round(CAST(bal AS DOUBLE) / CAST(sum(bal) OVER (PARTITION BY r_name) AS DOUBLE), 6) AS share
        |FROM nb ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      val c = t(s, dir)("customer")
      val n = t(s, dir)("nation")
      val r = t(s, dir)("region")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("r_name")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(col("c_acctbal").cast(DecimalType(18, 2))).as("bal"))
        .select(col("r_name"), col("n_name"),
          col("bal").cast(DoubleType).as("bal"),
          round(col("bal").cast("double") / sum(col("bal")).over(w).cast("double"), 6)
            .as("share"))
        .orderBy("r_name", "n_name")
    },

    // Sketches: HLL distinct + approximate quantiles — algorithms are
    // engine-specific, so this is a rows-only entry; the spec bounds
    // are asserted in BatchOpsSpec instead.
    // Approximate sketches (HLL++ count-distinct, approx percentile).
    // Sketch estimates can't hash-match another engine, but their
    // ACCURACY can: emit round(estimate/exact, 1), which is 1.0 for a
    // 1%-rsd HLL and a 10k-buffer percentile at these cardinalities —
    // the oracle pins the ratio, so a broken sketch fails the gate.
    q("a4_approx_sketches",
      """SELECT l_returnflag, count(*) AS n,
        |  1.0 AS distinct_ratio, 1.0 AS p50_ratio
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir)("lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          round(approx_count_distinct(col("l_partkey"), rsd = 0.01)
            .cast(DoubleType) / countDistinct(col("l_partkey")), 1)
            .as("distinct_ratio"),
          round(expr("approx_percentile(l_extendedprice, 0.5, 10000)") /
            expr("percentile(l_extendedprice, 0.5)"), 1).as("p50_ratio"))
        .orderBy("l_returnflag")
    },

    // Bivariate statistics battery (CORR / COVAR / linear-regression
    // aggregates — the reference's planner aggfunctions beyond q6's
    // univariate set): quantity-vs-price relationship per return flag.
    q("a8_stats_agg",
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 4) AS covs_qp,
        |  round(covar_pop(l_quantity, l_extendedprice), 4) AS covp_qp,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir)("lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covs_qp"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("covp_qp"),
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("intercept"))
        .orderBy("l_returnflag")
    })
}
