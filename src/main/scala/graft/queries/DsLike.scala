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
      li.join(p, p("p_partkey") === li("l_partkey"))
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
      // persist: pa feeds the scalar average and the ranked probe; the
      // exchange is not auto-reused across the consumers (see h16).
      val pa = t(s, dir)("lineitem")
        .groupBy("l_partkey")
        .agg(sum(col("l_quantity").cast(DecimalType(9, 2)))
          .cast(DoubleType).as("qty"))
        .persist()
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
    },

    // TPC-DS Q88-flavored: one-row dashboard of conditional counts —
    // four quantity bands × high-priority flag folded in a single
    // scan (eight concurrent COUNTs in the reference's shape).
    q("d5_band_counts",
      """SELECT
        |  CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
        |  CAST(sum(CASE WHEN l_quantity BETWEEN 11 AND 20 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
        |  CAST(sum(CASE WHEN l_quantity BETWEEN 21 AND 35 THEN 1 ELSE 0 END) AS BIGINT) AS b3,
        |  CAST(sum(CASE WHEN l_quantity BETWEEN 36 AND 50 THEN 1 ELSE 0 END) AS BIGINT) AS b4,
        |  CAST(sum(CASE WHEN l_quantity BETWEEN 1 AND 10 AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS b1_urgent,
        |  CAST(sum(CASE WHEN l_quantity BETWEEN 11 AND 20 AND o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS b2_urgent
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_linestatus = 'F'""".stripMargin) { (s, dir) =>
      val l = t(s, dir)("lineitem").filter(col("l_linestatus") === "F")
      val o = t(s, dir)("orders")
      def band(lo: Int, hi: Int) = col("l_quantity").between(lo, hi)
      val urgent = col("o_orderpriority") === "1-URGENT"
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .agg(
          sum(when(band(1, 10), 1L).otherwise(0L)).as("b1"),
          sum(when(band(11, 20), 1L).otherwise(0L)).as("b2"),
          sum(when(band(21, 35), 1L).otherwise(0L)).as("b3"),
          sum(when(band(36, 50), 1L).otherwise(0L)).as("b4"),
          sum(when(band(1, 10) && urgent, 1L).otherwise(0L)).as("b1_urgent"),
          sum(when(band(11, 20) && urgent, 1L).otherwise(0L)).as("b2_urgent"))
    },

    // TPC-DS Q34/Q73-flavored: frequent buyers — grouped HAVING band
    // on order count, joined back to the dimension for detail rows.
    q("d6_frequent_buyers",
      """WITH cnt AS (
        |  SELECT o_custkey, count(*) AS n FROM orders
        |  WHERE o_orderpriority <> '5-LOW'
        |  GROUP BY o_custkey
        |  HAVING count(*) BETWEEN 10 AND 14)
        |SELECT c_custkey, c_name, n
        |FROM customer JOIN cnt ON c_custkey = o_custkey
        |ORDER BY n DESC, c_custkey""".stripMargin) { (s, dir) =>
      val cnt = t(s, dir)("orders")
        .filter(col("o_orderpriority") =!= "5-LOW")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
        .filter(col("n").between(10, 14))
      val c = t(s, dir)("customer")
      c.join(cnt, c("c_custkey") === cnt("o_custkey"))
        .select("c_custkey", "c_name", "n")
        .orderBy(col("n").desc, col("c_custkey"))
    },

    // TPC-DS Q49-flavored: worst return ratios per part type —
    // integer-valued quantity sums (exact in double), DENSE_RANK over
    // the ratio.
    q("d7_return_ratio_rank",
      """WITH r AS (
        |  SELECT p_type,
        |    sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END) AS ret_qty,
        |    sum(l_quantity) AS tot_qty
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  GROUP BY p_type)
        |SELECT p_type, round(ret_qty / tot_qty, 6) AS ratio,
        |  dense_rank() OVER (ORDER BY ret_qty / tot_qty DESC, p_type) AS rnk
        |FROM r ORDER BY rnk, p_type""".stripMargin) { (s, dir) =>
      val l = t(s, dir)("lineitem")
      val p = t(s, dir)("part")
      val w = org.apache.spark.sql.expressions.Window
        .orderBy((col("ret_qty") / col("tot_qty")).desc, col("p_type"))
      l.join(p, p("p_partkey") === l("l_partkey"))
        .groupBy("p_type")
        .agg(
          sum(when(col("l_returnflag") === "R", col("l_quantity")).otherwise(0d))
            .as("ret_qty"),
          sum("l_quantity").as("tot_qty"))
        .withColumn("rnk", dense_rank().over(w))
        .select(col("p_type"), round(col("ret_qty") / col("tot_qty"), 6).as("ratio"),
          col("rnk"))
        .orderBy("rnk", "p_type")
    },

    // TPC-DS Q36-flavored: profit ROLLUP over the region→nation
    // hierarchy with a RANK within each rollup level (window over
    // grouping flags). SQL surface: DSL rollup over a join trips the
    // ambiguous-self-join detector (same as g1).
    q("d8_margin_rollup_rank",
      """SELECT coalesce(r_name, '<all>') AS region, coalesce(n_name, '<all>') AS nation,
        |  CAST(grouping(n_name) AS INT) AS g_n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS rev,
        |  rank() OVER (PARTITION BY grouping(n_name), r_name
        |               ORDER BY sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) DESC, n_name) AS rnk
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation ON n_nationkey = c_nationkey
        |JOIN region ON r_regionkey = n_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY g_n, region, rnk, nation""".stripMargin) { (s, dir) =>
      graft.Tables.registerAll(s, dir)
      s.sql(
        """SELECT coalesce(r_name, '<all>') AS region, coalesce(n_name, '<all>') AS nation,
          |  CAST(grouping(n_name) AS INT) AS g_n,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS rev,
          |  rank() OVER (PARTITION BY grouping(n_name), r_name
          |               ORDER BY sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) DESC, n_name) AS rnk
          |FROM lineitem
          |JOIN orders ON o_orderkey = l_orderkey
          |JOIN customer ON c_custkey = o_custkey
          |JOIN nation ON n_nationkey = c_nationkey
          |JOIN region ON r_regionkey = n_regionkey
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY g_n, region, rnk, nation""".stripMargin)
    },

    // TPC-DS Q51-flavored: running totals of two channels FULL OUTER
    // joined by month, reporting months where the returns cumulative
    // overtakes a fraction of the sales cumulative. DECIMAL running
    // sums keep the window exact and order-independent.
    q("d9_cumulative_cross",
      """WITH a AS (
        |  SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS m,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS amt
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
        |b AS (
        |  SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS m,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS amt
        |  FROM lineitem WHERE l_returnflag <> 'R' GROUP BY 1),
        |j AS (
        |  SELECT coalesce(a.m, b.m) AS m,
        |    sum(coalesce(a.amt, 0)) OVER (ORDER BY coalesce(a.m, b.m)) AS ret_cum,
        |    sum(coalesce(b.amt, 0)) OVER (ORDER BY coalesce(a.m, b.m)) AS sales_cum
        |  FROM a FULL OUTER JOIN b ON a.m = b.m)
        |SELECT m, CAST(ret_cum AS DOUBLE) AS ret_cum, CAST(sales_cum AS DOUBLE) AS sales_cum
        |FROM j WHERE ret_cum > 0.30 * sales_cum
        |ORDER BY m""".stripMargin) { (s, dir) =>
      val li = t(s, dir)("lineitem")
      def monthly(cond: org.apache.spark.sql.Column) = li.filter(cond)
        .groupBy(date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM").as("m"))
        .agg(sum(col("l_extendedprice").cast(dec18_2)).as("amt"))
      val a = monthly(col("l_returnflag") === "R")
        .select(col("m").as("am"), col("amt").as("ret_amt"))
      val b = monthly(col("l_returnflag") =!= "R")
        .select(col("m").as("bm"), col("amt").as("sales_amt"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy("m").rowsBetween(Long.MinValue, 0)
      a.join(b, col("am") === col("bm"), "full_outer")
        .select(coalesce(col("am"), col("bm")).as("m"),
          coalesce(col("ret_amt"), lit(0)).as("ra"),
          coalesce(col("sales_amt"), lit(0)).as("sa"))
        .withColumn("ret_cum", sum("ra").over(w))
        .withColumn("sales_cum", sum("sa").over(w))
        .filter(col("ret_cum") > lit(0.30) * col("sales_cum"))
        .select(col("m"), col("ret_cum").cast(DoubleType).as("ret_cum"),
          col("sales_cum").cast(DoubleType).as("sales_cum"))
        .orderBy("m")
    },

    // TPC-DS Q10/Q35-flavored: customers active in EITHER of two
    // channels (OR of two EXISTS — union of semi-join key sets) with
    // conditional counts per segment.
    q("d11_multi_channel_exists",
      """SELECT c_mktsegment, count(*) AS n_active,
        |  CAST(sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_rich
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT' AND year(o.o_orderdate) = 1997)
        |   OR EXISTS (SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |              WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R'
        |                AND year(l.l_shipdate) = 1997)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      val c = t(s, dir)("customer")
      val o = t(s, dir)("orders")
      val l = t(s, dir)("lineitem")
      // OR of two EXISTS = semi join against the UNION of the key sets
      // (each set deduplicated by the union distinct — one shuffle).
      val k1 = o.filter(col("o_orderpriority") === "1-URGENT" &&
          year(col("o_orderdate")) === 1997)
        .select(col("o_custkey").as("ck"))
      val k2 = l.filter(col("l_returnflag") === "R" &&
          year(col("l_shipdate")) === 1997)
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .select(col("o_custkey").as("ck"))
      c.join(k1.union(k2).distinct(), c("c_custkey") === col("ck"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("c_acctbal") > 5000, 1L).otherwise(0L)).as("n_rich"))
        .orderBy("c_mktsegment")
    },

    // TPC-DS Q54-flavored: customer lifetime-value histogram — exact
    // DECIMAL totals bucketized by integer floor division.
    q("d12_value_histogram",
      """WITH ct AS (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
        |            FROM orders GROUP BY o_custkey)
        |SELECT CAST(floor(CAST(tot AS DOUBLE) / 50000) AS BIGINT) AS bucket,
        |  count(*) AS n
        |FROM ct GROUP BY bucket
        |ORDER BY bucket""".stripMargin) { (s, dir) =>
      t(s, dir)("orders")
        .groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast(dec18_2)).as("tot"))
        .groupBy(floor(col("tot").cast(DoubleType) / 50000).cast(LongType)
          .as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    },

    // TPC-DS Q47-flavored: brand-months whose revenue deviates >20%
    // above the brand's overall monthly mean. The mean comparison is
    // done in EXACT integer/decimal arithmetic (rev·cnt·5 > tot·6 ⟺
    // rev > 1.2·tot/cnt) so no engine-dependent double summation
    // enters the predicate.
    q("d13_deviating_months",
      """WITH m AS (
        |  SELECT p_brand, strftime(date_trunc('month', l_shipdate), '%Y-%m') AS mo,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT p_brand, mo, rev,
        |    sum(rev) OVER (PARTITION BY p_brand) AS tot,
        |    count(*) OVER (PARTITION BY p_brand) AS cnt
        |  FROM m)
        |SELECT p_brand, mo, CAST(rev AS DOUBLE) AS rev
        |FROM w WHERE rev * cnt * 5 > tot * 6
        |ORDER BY p_brand, mo""".stripMargin) { (s, dir) =>
      val li = t(s, dir)("lineitem")
      val p = t(s, dir)("part")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("p_brand")
      li.join(p, p("p_partkey") === li("l_partkey"))
        .groupBy(col("p_brand"),
          date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM").as("mo"))
        .agg(sum(col("l_extendedprice").cast(dec18_2)).as("rev"))
        .withColumn("tot", sum("rev").over(w))
        .withColumn("cnt", count(lit(1)).over(w))
        .filter(col("rev") * col("cnt") * 5 > col("tot") * 6)
        .select(col("p_brand"), col("mo"), col("rev").cast(DoubleType).as("rev"))
        .orderBy("p_brand", "mo")
    },

    // TPC-DS Q78-flavored: per-customer cross-channel ratio — FULL
    // OUTER join of two grouped channels (returned vs kept revenue),
    // COALESCE'd, with an exact-decimal ratio gate (ret·5 > kept ⟺
    // ratio > 0.2 without dividing).
    q("d14_channel_ratio",
      """WITH r AS (SELECT o_custkey AS ck, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS amt
        |           FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |           WHERE l_returnflag = 'R' GROUP BY 1),
        |k AS (SELECT o_custkey AS ck, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS amt
        |      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |      WHERE l_returnflag <> 'R' GROUP BY 1)
        |SELECT coalesce(r.ck, k.ck) AS c_custkey,
        |  CAST(coalesce(r.amt, 0) AS DOUBLE) AS ret_amt,
        |  CAST(coalesce(k.amt, 0) AS DOUBLE) AS kept_amt
        |FROM r FULL OUTER JOIN k ON r.ck = k.ck
        |WHERE coalesce(r.amt, 0) * 5 > coalesce(k.amt, 0)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val li = t(s, dir)("lineitem")
      val o = t(s, dir)("orders")
      def chan(cond: org.apache.spark.sql.Column, as: String) =
        li.filter(cond).join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy(col("o_custkey").as(s"${as}_ck"))
          .agg(sum(col("l_extendedprice").cast(dec18_2)).as(s"${as}_amt"))
      val r = chan(col("l_returnflag") === "R", "r")
      val k = chan(col("l_returnflag") =!= "R", "k")
      r.join(k, col("r_ck") === col("k_ck"), "full_outer")
        .select(coalesce(col("r_ck"), col("k_ck")).as("c_custkey"),
          coalesce(col("r_amt"), lit(0)).as("ra"),
          coalesce(col("k_amt"), lit(0)).as("ka"))
        .filter(col("ra") * 5 > col("ka"))
        .select(col("c_custkey"), col("ra").cast(DoubleType).as("ret_amt"),
          col("ka").cast(DoubleType).as("kept_amt"))
        .orderBy("c_custkey")
    },

    // TPC-DS Q39-flavored: high-variance parts — the variance/mean
    // gate evaluated in EXACT integer arithmetic on integer-valued
    // quantities (n·Σx² − (Σx)² > 9·n·Σx, i.e. population variance >
    // 9×mean — above the ~8 natural ratio of this corpus, so the
    // gate keeps roughly the volatile quartile) with no
    // engine-dependent floating summation deciding membership.
    q("d15_volatile_parts",
      """WITH s AS (
        |  SELECT l_partkey, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
        |    CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey, n, sx, sxx
        |FROM s WHERE n >= 5 AND n * sxx - sx * sx > 9 * n * sx
        |ORDER BY l_partkey""".stripMargin) { (s, dir) =>
      val qi = col("l_quantity").cast(LongType)
      t(s, dir)("lineitem")
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n"), sum(qi).as("sx"), sum(qi * qi).as("sxx"))
        .filter(col("n") >= 5 &&
          col("n") * col("sxx") - col("sx") * col("sx") > col("n") * col("sx") * 9)
        .orderBy("l_partkey")
    },

    // TPC-DS Q66-flavored: monthly PIVOT report — months become
    // columns via Spark's native RelationalGroupedDataset.pivot (one
    // pass; the CASE-sum form the reference plans is what pivot
    // compiles to).
    q("d16_monthly_pivot",
      """SELECT p_brand,
        |  CAST(sum(CASE WHEN month(l_shipdate) = 1 THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS m01,
        |  CAST(sum(CASE WHEN month(l_shipdate) = 2 THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS m02,
        |  CAST(sum(CASE WHEN month(l_shipdate) = 3 THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS m03,
        |  CAST(sum(CASE WHEN month(l_shipdate) = 4 THEN CAST(l_extendedprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS m04
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE year(l_shipdate) = 1997 AND month(l_shipdate) <= 4
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin) { (s, dir) =>
      val li = t(s, dir)("lineitem")
        .filter(year(col("l_shipdate")) === 1997 && month(col("l_shipdate")) <= 4)
      val p = t(s, dir)("part")
      li.join(p, p("p_partkey") === li("l_partkey"))
        .groupBy("p_brand")
        .pivot(month(col("l_shipdate")), Seq(1, 2, 3, 4))
        .agg(sum(col("l_extendedprice").cast(dec18_2)))
        .select(col("p_brand") +:
          (1 to 4).map(m => coalesce(col(s"$m").cast(DoubleType), lit(0.0))
            .as(f"m$m%02d")): _*)
        .orderBy("p_brand")
    },

    // UNPIVOT (the inverse reshape): a wide conditional aggregate
    // unfolded back to (key, band, n) rows — Spark's stack()
    // generator vs DuckDB's UNPIVOT clause.
    q("d17_band_unpivot",
      """WITH w AS (SELECT l_returnflag,
        |    CAST(sum(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS low_band,
        |    CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS high_band
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, band, n
        |FROM w UNPIVOT (n FOR band IN (low_band, high_band))
        |ORDER BY l_returnflag, band""".stripMargin) { (s, dir) =>
      t(s, dir)("lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("l_quantity") <= 25, 1L).otherwise(0L)).as("low_band"),
          sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("high_band"))
        .selectExpr("l_returnflag",
          "stack(2, 'low_band', low_band, 'high_band', high_band) AS (band, n)")
        .orderBy("l_returnflag", "band")
    },

    // TPC-DS Q59-flavored: weekly revenue joined to the SAME week one
    // year earlier — period comparison as a self-join on a time
    // offset (the join-based sibling of d2's LAG form).
    q("d18_weekly_yoy_join",
      """WITH w AS (
        |  SELECT year(l_shipdate) AS yr, weekofyear(l_shipdate) AS wk,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT a.wk AS wk, CAST(a.rev AS DOUBLE) AS rev,
        |  CAST(b.rev AS DOUBLE) AS prev_year_rev,
        |  round(CAST(a.rev AS DOUBLE) / CAST(b.rev AS DOUBLE), 6) AS ratio
        |FROM w a JOIN w b ON b.yr = a.yr - 1 AND b.wk = a.wk
        |WHERE a.yr = 1997
        |ORDER BY wk""".stripMargin) { (s, dir) =>
      val w = t(s, dir)("lineitem")
        .groupBy(year(col("l_shipdate")).as("yr"),
          weekofyear(col("l_shipdate")).as("wk"))
        .agg(sum(col("l_extendedprice").cast(dec18_2)).as("rev"))
        .persist() // consumed twice (both sides of the offset self-join)
      val a = w.filter(col("yr") === 1997)
        .select(col("wk"), col("rev").as("arev"))
      val b = w.filter(col("yr") === 1996)
        .select(col("wk").as("bwk"), col("rev").as("brev"))
      a.join(b, col("wk") === col("bwk"))
        .select(col("wk"), col("arev").cast(DoubleType).as("rev"),
          col("brev").cast(DoubleType).as("prev_year_rev"),
          round(col("arev").cast(DoubleType) / col("brev").cast(DoubleType), 6)
            .as("ratio"))
        .orderBy("wk")
    },

    // TPC-DS Q65-flavored: parts earning under HALF their brand's
    // average part revenue — a mixed-granularity agg-of-agg join
    // (per-part revenue vs per-brand average), gated in exact decimal
    // arithmetic (rev·cnt·2 < tot ⟺ rev < avg/2).
    q("d19_below_brand_avg",
      """WITH pr AS (
        |  SELECT p_brand, l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  GROUP BY 1, 2),
        |ba AS (SELECT p_brand, sum(rev) AS tot, count(*) AS cnt FROM pr GROUP BY 1)
        |SELECT pr.p_brand, l_partkey, CAST(rev AS DOUBLE) AS rev
        |FROM pr JOIN ba ON pr.p_brand = ba.p_brand
        |WHERE rev * cnt * 2 < tot
        |ORDER BY pr.p_brand, l_partkey""".stripMargin) { (s, dir) =>
      val li = t(s, dir)("lineitem")
      val p = t(s, dir)("part")
      val pr = li.join(p, p("p_partkey") === li("l_partkey"))
        .groupBy("p_brand", "l_partkey")
        .agg(sum(col("l_extendedprice").cast(dec18_2)).as("rev"))
        .persist() // consumed twice (brand rollup + probe side)
      val ba = pr.groupBy(col("p_brand").as("b_brand"))
        .agg(sum("rev").as("tot"), count(lit(1)).as("cnt"))
      pr.join(broadcast(ba), col("p_brand") === col("b_brand"))
        .filter(col("rev") * col("cnt") * 2 < col("tot"))
        .select(col("p_brand"), col("l_partkey"),
          col("rev").cast(DoubleType).as("rev"))
        .orderBy("p_brand", "l_partkey")
    },

    // TPC-DS Q90-flavored: morning/afternoon activity ratio — two
    // time-band counts from one scan, emitted as a single-row ratio.
    q("d10_ampm_ratio",
      """SELECT CAST(sum(CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 1 ELSE 0 END) AS DOUBLE)
        |     / sum(CASE WHEN hour(ts) BETWEEN 12 AND 17 THEN 1 ELSE 0 END) AS am_pm_ratio,
        |  CAST(sum(CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 1 ELSE 0 END) AS BIGINT) AS am_count,
        |  CAST(sum(CASE WHEN hour(ts) BETWEEN 12 AND 17 THEN 1 ELSE 0 END) AS BIGINT) AS pm_count
        |FROM events""".stripMargin) { (s, dir) =>
      val am = hour(col("ts")).between(6, 11)
      val pm = hour(col("ts")).between(12, 17)
      t(s, dir)("events")
        .agg(
          (sum(when(am, 1L).otherwise(0L)).cast(DoubleType) /
            sum(when(pm, 1L).otherwise(0L))).as("am_pm_ratio"),
          sum(when(am, 1L).otherwise(0L)).as("am_count"),
          sum(when(pm, 1L).otherwise(0L)).as("pm_count"))
    },

    // TPC-DS Q97-flavored: channel-overlap counts — customers ordering
    // only high-priority, only low-priority, or in both channels. Two
    // deduplicated key sets FULL OUTER joined, then one-row counts —
    // the set-overlap report shape (never a fact-to-fact join).
    q("d20_channel_overlap",
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderpriority IN ('1-URGENT','2-HIGH')),
        |b AS (SELECT DISTINCT o_custkey FROM orders
        |      WHERE o_orderpriority IN ('4-NOT SPECIFIED','5-LOW'))
        |SELECT
        |  CAST(sum(CASE WHEN b.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_high,
        |  CAST(sum(CASE WHEN a.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_low,
        |  CAST(sum(CASE WHEN a.o_custkey IS NOT NULL AND b.o_custkey IS NOT NULL
        |           THEN 1 ELSE 0 END) AS BIGINT) AS both_ch
        |FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey""".stripMargin) { (s, dir) =>
      val o = t(s, dir)("orders")
      val a = o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_custkey").as("ck_a")).distinct()
      val b = o.filter(col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW"))
        .select(col("o_custkey").as("ck_b")).distinct()
      a.join(b, col("ck_a") === col("ck_b"), "full_outer")
        .agg(
          sum(when(col("ck_b").isNull, 1L).otherwise(0L)).as("only_high"),
          sum(when(col("ck_a").isNull, 1L).otherwise(0L)).as("only_low"),
          sum(when(col("ck_a").isNotNull && col("ck_b").isNotNull, 1L)
            .otherwise(0L)).as("both_ch"))
    },

    // TPC-DS Q51-flavored: two channels' daily counts folded to one
    // row per day, then RUNNING totals compared — the days where the
    // click channel's cumulative count overtakes the view channel's.
    q("d21_cumulative_compare",
      """WITH c AS (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
        |             count(*) AS n
        |           FROM events WHERE event_type IN ('click','view') GROUP BY 1, 2),
        |p AS (SELECT d,
        |        CAST(sum(CASE WHEN event_type = 'click' THEN n ELSE 0 END) AS BIGINT) AS cn,
        |        CAST(sum(CASE WHEN event_type = 'view' THEN n ELSE 0 END) AS BIGINT) AS vn
        |      FROM c GROUP BY d),
        |r AS (SELECT d,
        |        CAST(sum(cn) OVER (ORDER BY d) AS BIGINT) AS click_cum,
        |        CAST(sum(vn) OVER (ORDER BY d) AS BIGINT) AS view_cum
        |      FROM p)
        |SELECT d, click_cum, view_cum FROM r
        |WHERE click_cum > view_cum ORDER BY d""".stripMargin) { (s, dir) =>
      val c = t(s, dir)("events")
        .filter(col("event_type").isin("click", "view"))
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
        .agg(count(lit(1)).as("n"))
      val p = c.groupBy("d").agg(
        sum(when(col("event_type") === "click", col("n")).otherwise(0L)).as("cn"),
        sum(when(col("event_type") === "view", col("n")).otherwise(0L)).as("vn"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("d")
      p.select(col("d"),
          sum("cn").over(w).as("click_cum"), sum("vn").over(w).as("view_cum"))
        .filter(col("click_cum") > col("view_cum"))
        .orderBy("d")
    },

    // Relational DIVISION (the "bought in EVERY period" shape, TPC-DS
    // Q-division flavor): customers with an order in every quarter
    // that 1995 has orders in. The divisor cardinality is a 1-row
    // aggregate broadcast against the per-customer distinct-quarter
    // counts — division via count-match, no per-element anti-join
    // cascade, one shuffle on the customer key.
    q("d22_division",
      """WITH o95 AS (SELECT o_custkey, quarter(o_orderdate) AS qq
        |  FROM orders WHERE year(o_orderdate) = 1995),
        |nq AS (SELECT count(DISTINCT qq) AS n FROM o95),
        |c AS (SELECT o_custkey, count(DISTINCT qq) AS quarters
        |      FROM o95 GROUP BY o_custkey)
        |SELECT c.o_custkey AS custkey, c.quarters
        |FROM c, nq WHERE c.quarters = nq.n
        |ORDER BY custkey""".stripMargin) { (s, dir) =>
      val o95 = t(s, dir)("orders")
        .filter(year(col("o_orderdate")) === 1995)
        .select(col("o_custkey"), quarter(col("o_orderdate")).as("qq"))
      val nq = o95.agg(countDistinct("qq").as("n"))
      o95.groupBy("o_custkey").agg(countDistinct("qq").as("quarters"))
        .crossJoin(broadcast(nq))
        .filter(col("quarters") === col("n"))
        .select(col("o_custkey").as("custkey"), col("quarters"))
        .orderBy("custkey")
    },

    // Ordered conversion FUNNEL: distinct users reaching each stage IN
    // TEMPORAL ORDER (signup, then a click after it, then a purchase
    // after that). Per-stage earliest-qualifying times via three keyed
    // aggregations chained on user_id — every stage is one shuffle on
    // the same key, no event-by-event state, the web-analytics report
    // the reference's CEP examples compute.
    q("d23_funnel",
      """WITH s AS (SELECT user_id, min(ts) AS t_s FROM events
        |           WHERE event_type = 'signup' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_c
        |      FROM events e JOIN s ON s.user_id = e.user_id
        |      WHERE e.event_type = 'click' AND e.ts > s.t_s
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_p
        |      FROM events e JOIN c ON c.user_id = e.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_c
        |      GROUP BY e.user_id)
        |SELECT stage, n_users FROM (
        |  SELECT 1 AS ord, 'signup' AS stage, count(*) AS n_users FROM s
        |  UNION ALL SELECT 2, 'click_after_signup', count(*) FROM c
        |  UNION ALL SELECT 3, 'purchase_after_click', count(*) FROM p)
        |ORDER BY ord""".stripMargin) { (s, dir) =>
      val ev = t(s, dir)("events")
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t_s"))
      val cl = ev.filter(col("event_type") === "click")
        .join(su, "user_id").filter(col("ts") > col("t_s"))
        .groupBy("user_id").agg(min("ts").as("t_c"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(cl, "user_id").filter(col("ts") > col("t_c"))
        .groupBy("user_id").agg(min("ts").as("t_p"))
      def stage(d: org.apache.spark.sql.DataFrame, ord: Int, name: String) =
        d.agg(count(lit(1)).as("n_users"))
          .select(lit(ord).as("ord"), lit(name).as("stage"), col("n_users"))
      stage(su, 1, "signup")
        .unionAll(stage(cl, 2, "click_after_signup"))
        .unionAll(stage(pu, 3, "purchase_after_click"))
        .orderBy("ord")
        .select("stage", "n_users")
    },

    // TPC-DS Q23-flavored (tpcds-tool/query/query23.sql): the repeated
    // multi-CTE scan — frequent items (distinct-order count above 1.1×
    // the average part frequency: an agg-of-agg scalar reused as the
    // threshold, Q23's best_ss_customer 95%-of-max analog appears
    // again for customers) intersected with top-spending "store"
    // customers, then the OTHER two channels' revenue restricted to
    // both sets. Exercises exchange/CTE reuse: `freq` and `best` each
    // feed two union branches, and `spend` feeds both the max scalar
    // and the filter — nothing else in the corpus scans one CTE from
    // three consumers. Both semi joins broadcast at any SF where the
    // frequent/best sets stay selective; the channel union is scanned
    // once per branch with partial aggregation before the final
    // single-key shuffle on channel.
    q("d24_cross_channel_frequent",
      """WITH freq0 AS (
        |  SELECT l_partkey, count(DISTINCT l_orderkey) AS nord
        |  FROM lineitem GROUP BY l_partkey),
        |freq AS (
        |  SELECT l_partkey FROM freq0
        |  WHERE nord > 1.1 * (SELECT avg(nord) FROM freq0)),
        |spend AS (
        |  SELECT o_custkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS amt
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        |  GROUP BY o_custkey),
        |best AS (
        |  SELECT o_custkey FROM spend
        |  WHERE CAST(amt AS DOUBLE) >= 0.5 * (SELECT CAST(max(amt) AS DOUBLE) FROM spend)),
        |ch AS (
        |  SELECT 'catalog' AS channel, l_partkey, o_custkey,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS amt
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE o_orderpriority = '3-MEDIUM'
        |  UNION ALL
        |  SELECT 'web', l_partkey, o_custkey,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE o_orderpriority IN ('4-NOT SPECIFIED','5-LOW'))
        |SELECT channel, count(*) AS n, CAST(sum(amt) AS DOUBLE) AS amount
        |FROM ch
        |WHERE l_partkey IN (SELECT l_partkey FROM freq)
        |  AND o_custkey IN (SELECT o_custkey FROM best)
        |GROUP BY channel ORDER BY channel""".stripMargin) { (s, dir) =>
      val li = t(s, dir)("lineitem")
      val o = t(s, dir)("orders")
      // freq0 feeds the average threshold AND the filter; spend feeds
      // the max scalar AND the best-customer cut — Catalyst does not
      // reuse exchanges across differently-projected consumers, so
      // persist each small aggregate once (the Q23 pattern; the
      // expensive lineitem⋈orders joins below them then run once).
      // At sf0.1 the cache build costs ~0.7 s more than recomputing
      // (solo A/B 2.42 vs 3.09 s) — kept anyway: at 100 TB the
      // duplicated fact-fact join dominates by orders of magnitude.
      val freq0 = li.groupBy("l_partkey")
        .agg(countDistinct("l_orderkey").as("nord"))
        .persist()
      val avgNord = freq0.agg(avg("nord").as("avg_nord"))
      val freq = freq0.crossJoin(broadcast(avgNord))
        .filter(col("nord") > lit(1.1) * col("avg_nord"))
        .select("l_partkey")
      val spend = o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum(rev).as("amt"))
        .persist()
      val mx = spend.agg(max("amt").cast(DoubleType).as("m"))
      val best = spend.crossJoin(broadcast(mx))
        .filter(col("amt").cast(DoubleType) >= lit(0.5) * col("m"))
        .select("o_custkey")
      // r14: the two channel branches unioned two separate fact joins
      // over DISJOINT priority slices — one join over the combined
      // slice with a CASE channel produces the identical rows and
      // halves the join/scan count (same bytes read either way, since
      // the priority filters push to the scan; one fewer join at any
      // scale).
      val ch = o.filter(col("o_orderpriority")
          .isin("3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .select(when(col("o_orderpriority") === "3-MEDIUM", "catalog")
            .otherwise("web").as("channel"),
          col("l_partkey"), col("o_custkey"), rev.as("amt"))
      ch
        .join(freq, Seq("l_partkey"), "left_semi")
        .join(best, Seq("o_custkey"), "left_semi")
        .groupBy("channel")
        .agg(count(lit(1)).as("n"), sum("amt").cast(DoubleType).as("amount"))
        .orderBy("channel")
    },

    // TPC-DS Q64-flavored (tpcds-tool/query/query64.sql): the widest
    // join tree in the corpus — lineitem through orders, customer,
    // customer-nation, supplier, supplier-nation, part (6-way chain
    // with the Q64 address-match analog: customer and supplier in the
    // SAME nation), aggregated per (part, year), then SELF-JOINED
    // across consecutive years with the returns chain joined back —
    // parts whose local-supply revenue GREW year-over-year despite
    // recorded returns. nation joins broadcast; the sales CTE is one
    // shuffled aggregation consumed twice by the year self-join (the
    // exchange-reuse shape Q64 is famous for).
    q("d25_sales_chain_yoy",
      """WITH sales AS (
        |  SELECT p_partkey, p_name, year(o_orderdate) AS yr,
        |    count(*) AS n_items,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS amt
        |  FROM lineitem
        |    JOIN orders ON o_orderkey = l_orderkey
        |    JOIN customer ON c_custkey = o_custkey
        |    JOIN nation cn ON cn.n_nationkey = c_nationkey
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN nation sn ON sn.n_nationkey = s_nationkey
        |    JOIN part ON p_partkey = l_partkey
        |  WHERE cn.n_name = sn.n_name AND l_returnflag <> 'R'
        |  GROUP BY 1, 2, 3),
        |ret AS (
        |  SELECT l_partkey, year(o_orderdate) AS yr, count(*) AS n_ret
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY 1, 2)
        |SELECT s1.p_name, s1.yr,
        |  CAST(s1.amt AS DOUBLE) AS amt_y, CAST(s2.amt AS DOUBLE) AS amt_next,
        |  s1.n_items, r.n_ret
        |FROM sales s1
        |  JOIN sales s2 ON s2.p_partkey = s1.p_partkey AND s2.yr = s1.yr + 1
        |  JOIN ret r ON r.l_partkey = s1.p_partkey AND r.yr = s1.yr
        |WHERE CAST(s2.amt AS DOUBLE) > CAST(s1.amt AS DOUBLE)
        |ORDER BY s1.p_name, s1.yr""".stripMargin) { (s, dir) =>
      val li = t(s, dir)("lineitem")
      val o = t(s, dir)("orders")
      val c = t(s, dir)("customer")
      val su = t(s, dir)("supplier")
      val n = t(s, dir)("nation")
      val p = t(s, dir)("part")
      val cn = n.select(col("n_nationkey").as("cn_key"), col("n_name").as("cn_name"))
      val sn = n.select(col("n_nationkey").as("sn_key"), col("n_name").as("sn_name"))
      val sales = li.filter(col("l_returnflag") =!= "R")
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("c_custkey") === col("o_custkey"))
        .join(broadcast(cn), col("cn_key") === col("c_nationkey"))
        .join(su, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(sn), col("sn_key") === col("s_nationkey"))
        .filter(col("cn_name") === col("sn_name"))
        .join(p, col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_partkey"), col("p_name"),
          year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n_items"), sum(rev).as("amt"))
        // the year self-join consumes `sales` twice and Catalyst does
        // not reuse the exchange across the two differently-projected
        // consumers (verified: 16 scans, 0 ReusedExchange without
        // this) — persist the small per-(part,year) aggregate once.
        // At sf0.1 the cache build costs ~0.3 s more than recomputing
        // (solo A/B 1.66 vs 1.93 s); at 100 TB recomputing the 6-way
        // join twice dominates by orders of magnitude, so the persist
        // is the scale-correct choice. Verify/Bench release cache
        // blocks at every query boundary.
        .persist()
      val ret = li.filter(col("l_returnflag") === "R")
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_partkey"), year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n_ret"))
      val s1 = sales.select(col("p_partkey").as("k1"), col("p_name"),
        col("yr"), col("n_items"), col("amt").cast(DoubleType).as("amt_y"))
      val s2 = sales.select(col("p_partkey").as("k2"),
        col("yr").as("yr2"), col("amt").cast(DoubleType).as("amt_next"))
      val r = ret.select(col("l_partkey").as("kr"),
        col("yr").as("yrr"), col("n_ret"))
      s1.join(s2, col("k2") === col("k1") && col("yr2") === col("yr") + 1)
        .join(r, col("kr") === col("k1") && col("yrr") === col("yr"))
        .filter(col("amt_next") > col("amt_y"))
        .select(col("p_name"), col("yr"), col("amt_y"), col("amt_next"),
          col("n_items"), col("n_ret"))
        .orderBy("p_name", "yr")
    },

    // TPC-DS Q72-flavored (tpcds-tool/query/query72.sql): the widest
    // FACT-FACT-DATE join — demand (lineitem⋈orders⋈customer, one
    // market segment) against a supply proxy (lineitem shipments per
    // part-week) joined on part AND a date-OFFSET week (supply week =
    // demand week + 1, Q72's d1.d_week_seq = d2.d_week_seq shape),
    // keeping weeks where the following week's shipments fall short
    // of what was ordered. Both facts aggregate FIRST (partial aggs
    // shrink the shuffle), then meet on (part, week) — never a raw
    // fact×fact row join; the segment filter reaches the customer
    // scan and prunes demand before its shuffle.
    q("d26_demand_supply_gap",
      """WITH demand AS (
        |  SELECT l_partkey, date_trunc('week', o_orderdate) AS wk,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_ordered,
        |    count(*) AS n_lines
        |  FROM lineitem
        |    JOIN orders ON o_orderkey = l_orderkey
        |    JOIN customer ON c_custkey = o_custkey
        |  WHERE c_mktsegment = 'BUILDING'
        |  GROUP BY 1, 2),
        |supply AS (
        |  SELECT l_partkey, date_trunc('week', l_shipdate) AS wk,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_shipped
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT d.l_partkey AS partkey, CAST(d.wk AS DATE) AS demand_week,
        |  d.qty_ordered, s.qty_shipped, d.n_lines
        |FROM demand d JOIN supply s
        |  ON s.l_partkey = d.l_partkey AND s.wk = d.wk + INTERVAL 7 DAY
        |WHERE s.qty_shipped < d.qty_ordered
        |ORDER BY partkey, demand_week""".stripMargin) { (s, dir) =>
      val li = t(s, dir)("lineitem")
      val o = t(s, dir)("orders")
      val c = t(s, dir)("customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val demand = li
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("l_partkey"), date_trunc("week", col("o_orderdate")).as("wk"))
        .agg(sum(col("l_quantity").cast(dec18_2)).cast(DoubleType).as("qty_ordered"),
          count(lit(1)).as("n_lines"))
      val supply = li
        .groupBy(col("l_partkey").as("s_partkey"),
          date_trunc("week", col("l_shipdate")).as("s_wk"))
        .agg(sum(col("l_quantity").cast(dec18_2)).cast(DoubleType).as("qty_shipped"))
      demand.join(supply,
          col("s_partkey") === col("l_partkey") &&
            col("s_wk") === col("wk") + expr("INTERVAL 7 DAY"))
        .filter(col("qty_shipped") < col("qty_ordered"))
        .select(col("l_partkey").as("partkey"),
          col("wk").cast("date").as("demand_week"),
          col("qty_ordered"), col("qty_shipped"), col("n_lines"))
        .orderBy("partkey", "demand_week")
    },

    // TPC-DS Q95-flavored (tpcds-tool/query/query95.sql): multi-EXISTS
    // self-join on shipping — bulk lines on orders that ALSO
    // shipped from a DIFFERENT supplier (EXISTS self-join, Q95's
    // ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk) and had NO returned
    // line (NOT EXISTS). Both quantifiers are semi/anti joins
    // co-partitioned with the probe on l_orderkey — three facts, one
    // shuffle key, no row explosion (the EXISTS never materializes the
    // matching pairs).
    q("d27_shipping_pairs",
      """SELECT year(l1.l_shipdate) AS yr,
        |  count(DISTINCT l1.l_orderkey) AS n_orders,
        |  count(*) AS n_lines,
        |  CAST(sum(CAST(l1.l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l1.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS amount
        |FROM lineitem l1
        |WHERE l1.l_quantity > 30
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_returnflag = 'R')
        |GROUP BY 1 ORDER BY yr""".stripMargin) { (s, dir) =>
      val li = t(s, dir)("lineitem")
      val probe = li.filter(col("l_quantity") > 30)
      val others = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
      val returned = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("ok3"))
      probe
        .join(others, col("ok2") === col("l_orderkey") &&
          col("sk2") =!= col("l_suppkey"), "left_semi")
        .join(returned, col("ok3") === col("l_orderkey"), "left_anti")
        .groupBy(year(col("l_shipdate")).as("yr"))
        .agg(countDistinct("l_orderkey").as("n_orders"),
          count(lit(1)).as("n_lines"),
          sum(rev).cast(DoubleType).as("amount"))
        .orderBy("yr")
    },

    // TPC-DS Q67-flavored: a four-level ROLLUP (flag, status, year,
    // month) ranked top-10 per flag partition — Expand feeding a
    // two-phase agg feeding one Window pass. The rollup multiplies
    // input 5× through Expand BEFORE the shuffle, so partial
    // aggregation (map-side combine over the expanded rows) is what
    // keeps the exchange bounded at 100 TB; the rank's window
    // partitions by flag only (few, fat partitions) but its input is
    // post-agg — thousands of rows, not billions.
    q("d28_rollup_rank",
      """WITH r AS (
        |  SELECT l_returnflag AS rf, l_linestatus AS ls,
        |    year(l_shipdate) AS yr, month(l_shipdate) AS mon,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sumq
        |  FROM lineitem GROUP BY ROLLUP (rf, ls, yr, mon))
        |SELECT rf, ls, yr, mon, CAST(sumq AS DOUBLE) AS sum_qty, rnk
        |FROM (SELECT *, row_number() OVER (PARTITION BY rf
        |        ORDER BY sumq DESC, ls NULLS FIRST, yr NULLS FIRST,
        |                 mon NULLS FIRST) AS rnk
        |      FROM r)
        |WHERE rnk <= 10
        |ORDER BY rf NULLS FIRST, rnk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val li = t(s, dir)("lineitem")
      val r = li.select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
          year(col("l_shipdate")).as("yr"), month(col("l_shipdate")).as("mon"),
          col("l_quantity").cast(dec18_2).as("q"))
        .rollup("rf", "ls", "yr", "mon")
        .agg(sum("q").as("sumq"))
      r.withColumn("rnk", row_number().over(Window.partitionBy("rf")
          .orderBy(col("sumq").desc, col("ls").asc_nulls_first,
            col("yr").asc_nulls_first, col("mon").asc_nulls_first)))
        .filter(col("rnk") <= 10)
        .select(col("rf"), col("ls"), col("yr"), col("mon"),
          col("sumq").cast(DoubleType).as("sum_qty"), col("rnk"))
        .orderBy(col("rf").asc_nulls_first, col("rnk"))
    },

    // TPC-DS Q51-flavored: two per-supplier cumulative monthly series
    // (returned vs kept revenue) FULL OUTER joined on (supplier,
    // month) and filtered where one running total overtakes the other
    // — two windowed aggregations whose outputs merge in one outer
    // join. Each series aggregates before windowing, so the window
    // and the join both run over supplier×month grain (bounded), not
    // line grain; the decimal running sums are order-exact.
    q("d29_cumulative_overtake",
      """WITH a AS (
        |  SELECT l_suppkey AS sk, year(l_shipdate) * 100 + month(l_shipdate) AS ym,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS amt
        |  FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1, 2),
        |n AS (
        |  SELECT l_suppkey AS sk, year(l_shipdate) * 100 + month(l_shipdate) AS ym,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS amt
        |  FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1, 2),
        |ac AS (SELECT sk, ym,
        |         sum(amt) OVER (PARTITION BY sk ORDER BY ym) AS cum_a FROM a),
        |nc AS (SELECT sk, ym,
        |         sum(amt) OVER (PARTITION BY sk ORDER BY ym) AS cum_n FROM n)
        |SELECT coalesce(ac.sk, nc.sk) AS sk, coalesce(ac.ym, nc.ym) AS ym,
        |  CAST(cum_a AS DOUBLE) AS cum_a, CAST(cum_n AS DOUBLE) AS cum_n
        |FROM ac FULL OUTER JOIN nc ON ac.sk = nc.sk AND ac.ym = nc.ym
        |WHERE coalesce(cum_a, 0) > coalesce(cum_n, 0)
        |ORDER BY sk, ym""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val li = t(s, dir)("lineitem")
      def series(flag: String, cumName: String) =
        li.filter(col("l_returnflag") === flag)
          .groupBy(col("l_suppkey").as("sk"),
            (year(col("l_shipdate")) * 100 + month(col("l_shipdate"))).as("ym"))
          .agg(sum(rev).as("amt"))
          .withColumn(cumName,
            sum("amt").over(Window.partitionBy("sk").orderBy("ym")))
          .drop("amt")
      val ac = series("A", "cum_a")
      val nc = series("N", "cum_n")
        .withColumnRenamed("sk", "sk2").withColumnRenamed("ym", "ym2")
      ac.join(nc, col("sk") === col("sk2") && col("ym") === col("ym2"), "full_outer")
        .select(coalesce(col("sk"), col("sk2")).as("sk"),
          coalesce(col("ym"), col("ym2")).as("ym"),
          col("cum_a").cast(DoubleType).as("cum_a"),
          col("cum_n").cast(DoubleType).as("cum_n"))
        .filter(coalesce(col("cum_a"), lit(0)) > coalesce(col("cum_n"), lit(0)))
        .orderBy("sk", "ym")
    },

    // TPC-DS Q4/Q11-flavored (tpcds-tool/query/query4.sql): the
    // year_total CTE consumed FOUR times — per-customer per-year
    // per-channel revenue (channels via priority bands, the d24
    // convention), self-joined store-y1 × store-y2 × web-y1 × web-y2,
    // keeping customers whose WEB growth across the consecutive-year
    // pair beats their STORE growth (Q11's ratio predicate with its
    // > 0 first-year guards). Stresses the repeated-CTE persist
    // decision beyond d24/d25's two consumers: year_total is a SMALL
    // per-(customer, year, channel) aggregate atop the one expensive
    // fact-fact join — persisted once, the four consumers then join
    // on custkey only.
    q("d30_customer_growth_chain",
      """WITH year_total AS (
        |  SELECT o_custkey, year(o_orderdate) AS yr,
        |    CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |         THEN 'store' ELSE 'web' END AS channel,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS amt
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2, 3)
        |SELECT s1.o_custkey AS custkey,
        |  CAST(s1.amt AS DOUBLE) AS store_y1,
        |  CAST(s2.amt AS DOUBLE) AS store_y2,
        |  CAST(w1.amt AS DOUBLE) AS web_y1,
        |  CAST(w2.amt AS DOUBLE) AS web_y2
        |FROM year_total s1
        |JOIN year_total s2 ON s2.o_custkey = s1.o_custkey
        |  AND s2.channel = 'store' AND s2.yr = 1998
        |JOIN year_total w1 ON w1.o_custkey = s1.o_custkey
        |  AND w1.channel = 'web' AND w1.yr = 1997
        |JOIN year_total w2 ON w2.o_custkey = s1.o_custkey
        |  AND w2.channel = 'web' AND w2.yr = 1998
        |WHERE s1.channel = 'store' AND s1.yr = 1997
        |  AND CAST(s1.amt AS DOUBLE) > 0 AND CAST(w1.amt AS DOUBLE) > 0
        |  AND CAST(w2.amt AS DOUBLE) / CAST(w1.amt AS DOUBLE)
        |      > CAST(s2.amt AS DOUBLE) / CAST(s1.amt AS DOUBLE)
        |ORDER BY custkey""".stripMargin) { (s, dir) =>
      val li = t(s, dir)("lineitem")
      val o = t(s, dir)("orders")
      // Q4/Q11's year_total self-join chain collapsed to ONE pass
      // (r14, guide §2.4 "remove shuffles outright"): each (customer,
      // year, channel) group is unique, so the four inner-joined
      // slices are exactly four conditional sums of the SAME grouped
      // aggregate — pivot them in a single groupBy(custkey) over the
      // fact join (decimal sums stay exact under regrouping; a slice
      // with no rows sums to NULL, and the IS NOT NULL gates are the
      // inner-join existence requirement). Plan: 4 persisted-slice
      // scans + 3 custkey joins (7 exchanges) → 1 aggregation
      // (2 exchanges: join + groupBy), no persist — strictly fewer
      // shuffles at every scale. Solo sf0.1: 2.08 → 1.35 s.
      val yr = year(col("o_orderdate"))
      val isStore = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      def sl(store: Boolean, y: Int) =
        sum(when((if (store) isStore else !isStore) && yr === y, rev))
      o.join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sl(store = true, 1997).cast(DoubleType).as("store_y1"),
          sl(store = true, 1998).cast(DoubleType).as("store_y2"),
          sl(store = false, 1997).cast(DoubleType).as("web_y1"),
          sl(store = false, 1998).cast(DoubleType).as("web_y2"))
        .filter(col("store_y1").isNotNull && col("store_y2").isNotNull &&
          col("web_y1").isNotNull && col("web_y2").isNotNull)
        .filter(col("store_y1") > 0 && col("web_y1") > 0 &&
          col("web_y2") / col("web_y1") > col("store_y2") / col("store_y1"))
        .select(col("o_custkey").as("custkey"), col("store_y1"),
          col("store_y2"), col("web_y1"), col("web_y2"))
        .orderBy("custkey")
    },

    // TPC-DS Q14-flavored (tpcds-tool/query/query14.sql): cross_items
    // — the INTERSECT of the part sets sold in ALL THREE channels —
    // feeding a shared per-channel rollup gated by an avg-sales
    // scalar from the union of channels. Spark-first shape: the
    // intersect is a countDistinct(channel) = 3 filter over the
    // per-(channel, part) aggregate (one pass, no 3-way INTERSECT
    // shuffle chain), the final rollup REUSES that same aggregate
    // (no third fact scan), and the avg threshold broadcasts.
    q("d31_cross_channel_intersect",
      """WITH ch AS (
        |  SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'store'
        |              WHEN o_orderpriority = '3-MEDIUM' THEN 'catalog'
        |              ELSE 'web' END AS channel,
        |    l_partkey,
        |    CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (1 - CAST(l_discount AS DECIMAL(4,2))) AS amt
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |cross_parts AS (
        |  SELECT l_partkey FROM ch WHERE channel = 'store'
        |  INTERSECT SELECT l_partkey FROM ch WHERE channel = 'catalog'
        |  INTERSECT SELECT l_partkey FROM ch WHERE channel = 'web'),
        |avg_sales AS (SELECT avg(CAST(amt AS DOUBLE)) AS threshold FROM ch)
        |SELECT channel, p_brand, count(*) AS n,
        |  CAST(sum(amt) AS DOUBLE) AS amount
        |FROM ch JOIN part ON p_partkey = l_partkey
        |WHERE l_partkey IN (SELECT l_partkey FROM cross_parts)
        |GROUP BY channel, p_brand
        |HAVING sum(CAST(amt AS DOUBLE)) > 100 * (SELECT threshold FROM avg_sales)
        |ORDER BY channel, p_brand""".stripMargin) { (s, dir) =>
      val li = t(s, dir)("lineitem")
      val o = t(s, dir)("orders")
      val p = t(s, dir)("part")
      val channel = when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "store")
        .when(col("o_orderpriority") === "3-MEDIUM", "catalog")
        .otherwise("web")
      val base = o.join(li, col("l_orderkey") === col("o_orderkey"))
        .select(channel.as("channel"), col("l_partkey"), rev.as("amt"))
      // per-(channel, part) partials: bounded by 3×|part| — persisted
      // once, feeding BOTH the cross-channel intersect and the final
      // brand rollup (Q14 scans its fact union three times; here the
      // fact join runs once for the partials + once for the global
      // avg, and everything else works on the small aggregate)
      val chParts = base.groupBy("channel", "l_partkey")
        .agg(sum(col("amt")).as("amt"), count(lit(1)).as("n"))
        .persist()
      chParts.count() // eager fill: three consumers (threshold
      // broadcast, intersect, rollup) probe a warm cache instead of
      // racing to fill it inside the broadcast-build job
      val crossParts = chParts.groupBy("l_partkey")
        .agg(countDistinct(col("channel")).as("nch"))
        .filter(col("nch") === 3).select("l_partkey")
      // r14: the global average re-ran the fact join just to re-sum
      // what chParts already holds — Σamt/Σn over the persisted
      // partials is the same average computed exactly (decimal total,
      // one double division; the previous double-summed avg was
      // already partial-order jitter at the ulp level, which the
      // strict > gate tolerates by construction), and the fact join
      // now runs ONCE for the whole query at any scale. Local trade,
      // same as d24/d25's documented persists: solo A/B 2.24 → 3.13 s
      // at sf0.1 (the old independent threshold subtree overlapped its
      // duplicate fact join with the main pipeline on idle cores; the
      // shared-cache shape serializes the fill) — kept anyway: at
      // 100 TB a second full fact scan+join to produce one scalar
      // dwarfs any pipeline-overlap gain.
      val threshold = chParts.agg(
        (sum(col("amt")).cast(DoubleType) / sum(col("n"))).as("threshold"))
      chParts
        .join(crossParts, Seq("l_partkey"), "left_semi")
        .join(p, col("p_partkey") === col("l_partkey"))
        .groupBy("channel", "p_brand")
        .agg(sum(col("n")).as("n"), sum(col("amt")).as("amt_dec"))
        .crossJoin(broadcast(threshold))
        .filter(col("amt_dec").cast(DoubleType) > lit(100) * col("threshold"))
        .select(col("channel"), col("p_brand"), col("n"),
          col("amt_dec").cast(DoubleType).as("amount"))
        .orderBy("channel", "p_brand")
    },

    // TPC-DS Q23-flavored (r14): frequently-sold items × best
    // customers. Frequent = parts sold on >4 distinct ship dates in
    // 1996; best = customers whose lifetime order spend exceeds half
    // the TOP spender's (Q23's max-csales threshold); the target sum
    // is 1997-H1 revenue restricted to both sets. The spend threshold
    // is a ONE-ROW aggregate broadcast against the per-customer
    // totals (not a global max() OVER () — a single-partition window
    // over every customer is the wrong plan at 100 TB; the broadcast
    // scalar is the same value with no serial stage).
    q("d32_frequent_best_spend",
      """WITH freq AS (
        |  SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1996
        |  GROUP BY l_partkey HAVING count(DISTINCT l_shipdate) > 4),
        |spend AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY o_custkey),
        |mx AS (SELECT max(total) AS m FROM spend),
        |best AS (SELECT o_custkey FROM spend, mx WHERE total > 0.5 * m)
        |SELECT count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS amount
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE year(l_shipdate) = 1997 AND month(l_shipdate) <= 6
        |  AND l_partkey IN (SELECT l_partkey FROM freq)
        |  AND o_custkey IN (SELECT o_custkey FROM best)""".stripMargin) { (s, dir) =>
      val li = t(s, dir)("lineitem")
      val o = t(s, dir)("orders")
      val freq = li.filter(year(col("l_shipdate")) === 1996)
        .groupBy("l_partkey")
        .agg(countDistinct(col("l_shipdate")).as("nd"))
        .filter(col("nd") > 4).select("l_partkey")
      val spend = o.groupBy("o_custkey")
        .agg(sum(col("o_totalprice").cast(dec18_2)).cast(DoubleType)
          .as("total"))
        .persist() // feeds the scalar max AND the threshold probe
      val mx = spend.agg(max(col("total")).as("m"))
      val best = spend.crossJoin(broadcast(mx))
        .filter(col("total") > lit(0.5) * col("m")).select("o_custkey")
      li.filter(year(col("l_shipdate")) === 1997 &&
          month(col("l_shipdate")) <= 6)
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .join(freq, Seq("l_partkey"), "left_semi")
        .join(best, Seq("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n"), sum(rev).cast(DoubleType).as("amount"))
    },

    // TPC-DS Q95-flavored (r14): orders shipped from MORE THAN ONE
    // supplier with NO returned line, in one quarter — Q95's
    // multi-warehouse / no-return web-sales refinement. Both order
    // gates come from ONE aggregation over lineitem (distinct-supplier
    // count + a max-flag for returns — no second scan, no EXISTS
    // self-joins), then a semi join prunes the date-filtered orders.
    q("d33_multi_supplier_orders",
      """WITH gates AS (
        |  SELECT l_orderkey,
        |    count(DISTINCT l_suppkey) AS nsupp,
        |    max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
        |  FROM lineitem GROUP BY l_orderkey),
        |ok AS (SELECT l_orderkey FROM gates WHERE nsupp > 1 AND ret = 0)
        |SELECT count(*) AS order_count,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE o_orderdate >= DATE '1996-01-01'
        |  AND o_orderdate < DATE '1996-04-01'
        |  AND o_orderkey IN (SELECT l_orderkey FROM ok)""".stripMargin) { (s, dir) =>
      val li = t(s, dir)("lineitem")
      val o = t(s, dir)("orders")
      val ok = li.groupBy("l_orderkey")
        .agg(countDistinct(col("l_suppkey")).as("nsupp"),
          max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("ret"))
        .filter(col("nsupp") > 1 && col("ret") === 0)
        .select("l_orderkey")
      o.filter(col("o_orderdate") >= lit(java.sql.Date.valueOf("1996-01-01")) &&
          col("o_orderdate") < lit(java.sql.Date.valueOf("1996-04-01")))
        .join(ok, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .agg(count(lit(1)).as("order_count"),
          sum(col("o_totalprice").cast(dec18_2)).cast(DoubleType)
            .as("total_price"))
    })
}
