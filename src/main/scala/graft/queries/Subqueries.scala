package graft.queries

import graft.QueryGroup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Subquery surface (SURVEY.md §4.1: FlinkSubQueryRemoveRule →
  * semi/anti join; scalar subqueries; correlated EXISTS;
  * decorrelation). Expressed through spark.sql so Catalyst's
  * RewritePredicateSubquery / DecorrelateInnerQuery handle the
  * rewrite — same division of labor as the reference's Calcite rules.
  */
object Subqueries extends QueryGroup {

  private def views(s: org.apache.spark.sql.SparkSession, dir: String): Unit =
    graft.Tables.registerAll(s, dir)

  override def queries = Seq(

    q("sub1_in",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |  AND o_totalprice > 300000
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      views(s, dir)
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders
              |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
              |  AND o_totalprice > 300000
              |ORDER BY o_orderkey""".stripMargin)
    },

    q("sub2_not_in",
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      views(s, dir)
      s.sql("""SELECT c_custkey FROM customer
              |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
              |ORDER BY c_custkey""".stripMargin)
    },

    q("sub3_scalar",
      """SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS totalprice FROM orders
        |WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      views(s, dir)
      s.sql("""SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS totalprice FROM orders
              |WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
              |ORDER BY o_orderkey""".stripMargin)
    },

    // Correlated EXISTS with an extra correlated predicate.
    q("sub4_exists_correlated",
      """SELECT s_suppkey, s_name FROM supplier s
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 50)
        |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      views(s, dir)
      s.sql("""SELECT s_suppkey, s_name FROM supplier s
              |WHERE EXISTS (SELECT 1 FROM lineitem l
              |              WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 50)
              |ORDER BY s_suppkey""".stripMargin)
    },

    // Correlated scalar subquery in the SELECT list (decorrelated to a
    // left outer aggregate join by Catalyst).
    q("sub5_correlated_scalar",
      """SELECT c_custkey,
        |  coalesce((SELECT CAST(max(o_totalprice) AS DECIMAL(18,2)) FROM orders o
        |            WHERE o.o_custkey = c.c_custkey), 0) AS max_order
        |FROM customer c
        |WHERE c_custkey <= 200
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      views(s, dir)
      s.sql("""SELECT c_custkey,
              |  coalesce((SELECT CAST(max(o_totalprice) AS DECIMAL(18,2)) FROM orders o
              |            WHERE o.o_custkey = c.c_custkey), 0) AS max_order
              |FROM customer c
              |WHERE c_custkey <= 200
              |ORDER BY c_custkey""".stripMargin)
    })
}
