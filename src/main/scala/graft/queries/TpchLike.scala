package graft.queries

import graft.QueryGroup
import graft.operators.SimpleCEP
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TPC-H-flavored analytical queries over the driver's star schema
  * (adapted to its column subset) + a multi-step CEP chain — the
  * "whole-query" shapes that exercise join ordering, broadcast
  * selection, and two-phase aggregation together.
  */
object TpchLike extends QueryGroup {

  private val dec18_2 = DecimalType(18, 2)
  private val dec4_2  = DecimalType(4, 2)

  private def rev = col("l_extendedprice").cast(dec18_2) *
    (lit(1) - col("l_discount").cast(dec4_2))

  override def queries = Seq(

    // TPC-H Q5-flavored: revenue by nation for one region and year.
    q("h1_local_supplier_volume",
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA' AND year(o.o_orderdate) = 1996
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val c = t(s, dir)("customer")
      val o = t(s, dir)("orders").filter(year(col("o_orderdate")) === 1996)
      val l = t(s, dir)("lineitem")
      val sup = t(s, dir)("supplier")
      val n = t(s, dir)("nation")
      val r = t(s, dir)("region").filter(col("r_name") === "ASIA")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup),
          l("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(rev).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q14-flavored: promo revenue share per month of 1996.
    q("h2_promo_share",
      """SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
        |        ELSE 0 END) AS DOUBLE) AS promo_rev,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_rev
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE year(l_shipdate) = 1996
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val l = t(s, dir)("lineitem").filter(year(col("l_shipdate")) === 1996)
      val p = t(s, dir)("part")
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM").as("month"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0)))
            .cast(DoubleType).as("promo_rev"),
          sum(rev).cast(DoubleType).as("total_rev"))
        .orderBy("month")
    },

    // TPC-H Q4-flavored: priority distribution of orders having at
    // least one high-quantity line (semi join + agg).
    q("h3_order_priority",
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
        |  AND year(o_orderdate) = 1997
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val o = t(s, dir)("orders").filter(year(col("o_orderdate")) === 1997)
      val l = t(s, dir)("lineitem").filter(col("l_quantity") >= 45)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q10-flavored: top customers by returned revenue.
    q("h4_returned_revenue",
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin) { (s, dir) =>
      val c = t(s, dir)("customer")
      val o = t(s, dir)("orders")
      val l = t(s, dir)("lineitem").filter(col("l_returnflag") === "R")
      val n = t(s, dir)("nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(rev).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q18-flavored: orders whose total quantity exceeds 320.
    q("h5_large_orders",
      """SELECT c_custkey, o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS totalprice, sum_qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
        |      GROUP BY l_orderkey HAVING sum(l_quantity) > 320) big
        |JOIN orders o ON o.o_orderkey = big.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val big = t(s, dir)("lineitem")
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("sum_qty"))
        .filter(col("sum_qty") > 320)
      val o = t(s, dir)("orders")
      val c = t(s, dir)("customer")
      big.join(o, big("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          col("o_totalprice").cast(dec18_2).as("totalprice"), col("sum_qty"))
        .orderBy("o_orderkey")
    },

    // TPC-H Q2-flavored: per part, the shipping supplier with minimum
    // account balance (correlated min over a join).
    q("h6_min_cost_supplier",
      """SELECT p_partkey, s_suppkey, CAST(s_acctbal AS DECIMAL(18,2)) AS acctbal
        |FROM (SELECT l.l_partkey AS p_partkey, s.s_suppkey, s.s_acctbal,
        |        row_number() OVER (PARTITION BY l.l_partkey
        |                           ORDER BY s.s_acctbal, s.s_suppkey) AS rn
        |      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
        |      JOIN supplier s ON s.s_suppkey = l.l_suppkey)
        |WHERE rn = 1 AND p_partkey <= 500
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      val pairs = t(s, dir)("lineitem")
        .select("l_partkey", "l_suppkey").distinct()
      val sup = t(s, dir)("supplier")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_partkey").orderBy(col("s_acctbal").asc, col("s_suppkey").asc)
      pairs.join(broadcast(sup), pairs("l_suppkey") === sup("s_suppkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("l_partkey") <= 500)
        .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
          col("s_acctbal").cast(dec18_2).as("acctbal"))
        .orderBy("p_partkey")
    },

    // CEP with quantifiers: signup → click+ → purchase within 6h
    // (PatternNFA; OneOrMore reports the click count per match).
    q("cep3_pattern_quantifier",
      """WITH a AS (SELECT user_id, event_id AS a_id, epoch_us(ts) AS a_us FROM events WHERE event_type = 'signup'),
        |b AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase'),
        |ab AS (SELECT * FROM (
        |  SELECT a.user_id, a.a_id, a.a_us, b.event_id AS b_id, b.ts_us AS b_us,
        |    row_number() OVER (PARTITION BY a.user_id, a.a_id ORDER BY b.ts_us, b.event_id) AS rn
        |  FROM a JOIN b ON a.user_id = b.user_id
        |    AND b.ts_us > a.a_us AND b.ts_us <= a.a_us + 21600000000) WHERE rn = 1),
        |abc AS (SELECT * FROM (
        |  SELECT ab.user_id, ab.a_id, ab.a_us, ab.b_id, c.event_id AS c_id, c.ts_us AS c_us,
        |    row_number() OVER (PARTITION BY ab.user_id, ab.a_id ORDER BY c.ts_us, c.event_id) AS rn
        |  FROM ab JOIN c ON ab.user_id = c.user_id
        |    AND c.ts_us > ab.b_us AND c.ts_us <= ab.a_us + 21600000000) WHERE rn = 1),
        |cnt AS (SELECT abc.user_id, abc.a_id, count(*) AS n
        |  FROM abc JOIN b ON abc.user_id = b.user_id
        |    AND b.ts_us > abc.a_us AND b.ts_us < abc.c_us
        |  GROUP BY 1, 2)
        |SELECT abc.user_id AS key, abc.a_id AS anchor_id, abc.c_id AS end_id,
        |  abc.a_id || ',' || abc.b_id || ',' || abc.c_id AS chain,
        |  'clicks:' || cnt.n AS counts
        |FROM abc JOIN cnt ON abc.user_id = cnt.user_id AND abc.a_id = cnt.a_id
        |ORDER BY key, anchor_id""".stripMargin) { (s, dir) =>
      import graft.operators.PatternNFA._
      val ev = t(s, dir)("events").select(
        col("user_id").as("key"), unix_micros(col("ts")).as("tsMicros"),
        col("event_id").as("id"), col("event_type").as("kind"))
      run(s, ev, Seq(
          Step("signup", "signup"),
          Step("clicks", "click", OneOrMore),
          Step("purchase", "purchase")),
        withinMicros = 21600L * 1000000L)
        .orderBy("key", "anchor_id")
    },

    // CEP times(2): signup → exactly two successive clicks → purchase.
    q("cep4_pattern_times",
      """WITH a AS (SELECT user_id, event_id AS a_id, epoch_us(ts) AS a_us FROM events WHERE event_type = 'signup'),
        |b AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'purchase'),
        |s1 AS (SELECT * FROM (
        |  SELECT a.user_id, a.a_id, a.a_us, b.event_id AS b1_id, b.ts_us AS b1_us,
        |    row_number() OVER (PARTITION BY a.user_id, a.a_id ORDER BY b.ts_us, b.event_id) AS rn
        |  FROM a JOIN b ON a.user_id = b.user_id
        |    AND b.ts_us > a.a_us AND b.ts_us <= a.a_us + 21600000000) WHERE rn = 1),
        |s2 AS (SELECT * FROM (
        |  SELECT s1.user_id, s1.a_id, s1.a_us, s1.b1_id, b.event_id AS b2_id, b.ts_us AS b2_us,
        |    row_number() OVER (PARTITION BY s1.user_id, s1.a_id ORDER BY b.ts_us, b.event_id) AS rn
        |  FROM s1 JOIN b ON s1.user_id = b.user_id
        |    AND b.ts_us > s1.b1_us AND b.ts_us <= s1.a_us + 21600000000) WHERE rn = 1),
        |s3 AS (SELECT * FROM (
        |  SELECT s2.user_id, s2.a_id, s2.b1_id, s2.b2_id, c.event_id AS c_id,
        |    row_number() OVER (PARTITION BY s2.user_id, s2.a_id ORDER BY c.ts_us, c.event_id) AS rn
        |  FROM s2 JOIN c ON s2.user_id = c.user_id
        |    AND c.ts_us > s2.b2_us AND c.ts_us <= s2.a_us + 21600000000) WHERE rn = 1)
        |SELECT user_id AS key, a_id AS anchor_id, c_id AS end_id,
        |  a_id || ',' || b1_id || ',' || b2_id || ',' || c_id AS chain,
        |  '' AS counts
        |FROM s3 ORDER BY key, anchor_id""".stripMargin) { (s, dir) =>
      import graft.operators.PatternNFA._
      val ev = t(s, dir)("events").select(
        col("user_id").as("key"), unix_micros(col("ts")).as("tsMicros"),
        col("event_id").as("id"), col("event_type").as("kind"))
      run(s, ev, Seq(
          Step("signup", "signup"),
          Step("click", "click", Times(2)),
          Step("purchase", "purchase")),
        withinMicros = 21600L * 1000000L)
        .orderBy("key", "anchor_id")
    },

    // Three-step CEP chain: signup → first purchase → first error
    // after it, all within 6h of the signup (PATTERN (A B C) with
    // relaxed contiguity; composition of two followedBy steps).
    q("cep2_three_step",
      """WITH ab AS (
        |  SELECT user_id, a_id, a_ts, b_id, b_ts FROM (
        |    SELECT a.user_id, a.event_id AS a_id, a.ts AS a_ts,
        |           b.event_id AS b_id, b.ts AS b_ts,
        |      row_number() OVER (PARTITION BY a.user_id, a.event_id ORDER BY b.ts, b.event_id) AS rn
        |    FROM (SELECT * FROM events WHERE event_type = 'signup') a
        |    JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        |      ON a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR)
        |  WHERE rn = 1),
        |abc AS (
        |  SELECT user_id, a_id, b_id, c_id FROM (
        |    SELECT ab.user_id, ab.a_id, ab.b_id, c.event_id AS c_id,
        |      row_number() OVER (PARTITION BY ab.user_id, ab.a_id ORDER BY c.ts, c.event_id) AS rn
        |    FROM ab JOIN (SELECT * FROM events WHERE event_type = 'error') c
        |      ON ab.user_id = c.user_id AND c.ts > ab.b_ts AND c.ts <= ab.a_ts + INTERVAL 6 HOUR)
        |  WHERE rn = 1)
        |SELECT user_id, a_id, b_id, c_id FROM abc
        |ORDER BY user_id, a_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir)("events")
      val ab = SimpleCEP.followedBy(
          a = e.filter(col("event_type") === "signup"),
          b = e.filter(col("event_type") === "purchase"),
          keyCol = "user_id", timeCol = "ts", idCol = "event_id",
          withinSeconds = 21600)
        .select(col("user_id"), col("a_id"), col("a_ts"), col("b_id"), col("b_ts"))
      // step 2: first error after the matched purchase, still within
      // 6h of the signup — dedup per (user, b) with remaining budget.
      val c = e.filter(col("event_type") === "error")
        .select(col("user_id").as("_cu"), col("event_id").as("c_id"), col("ts").as("c_ts"))
      // partition per signup chain (two signups can share a purchase;
      // per-b partitioning would tie-break the a_id arbitrarily)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "a_id").orderBy(col("c_ts").asc, col("c_id").asc)
      ab.join(c, col("user_id") === col("_cu") &&
          col("c_ts") > col("b_ts") &&
          col("c_ts") <= col("a_ts") + expr("INTERVAL 6 HOUR"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select("user_id", "a_id", "b_id", "c_id")
        .orderBy("user_id", "a_id")
    })
}
