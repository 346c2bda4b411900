package graft.queries

import graft.QueryGroup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Grouping sets / rollup / cube (SURVEY.md §2.4,
  * DecomposeGroupingSetsRule.scala:205 → Expand + group agg; Catalyst
  * plans the identical Expand). `grouping()` flags are emitted as
  * explicit int columns (bit order of grouping_id differs between
  * engines, per-column flags don't).
  */
object GroupingSets extends QueryGroup {

  private val dec18_2 = DecimalType(18, 2)

  override def queries = Seq(

    q("g1_rollup",
      """SELECT coalesce(n_name, '<all>') AS nation, coalesce(c_mktsegment, '<all>') AS segment,
        |  CAST(grouping(n_name) AS INT) AS g_nation, CAST(grouping(c_mktsegment) AS INT) AS g_segment,
        |  count(*) AS n, CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY g_nation, g_segment, nation, segment""".stripMargin) { (s, dir) =>
      // DSL rollup + grouping() over a join trips Spark's ambiguous-
      // self-join detector (the Expand keeps two tagged copies of the
      // grouping columns), so this one goes through the SQL surface —
      // Catalyst plans the identical Expand + Aggregate.
      graft.Tables.registerAll(s, dir)
      s.sql(
        """SELECT coalesce(n_name, '<all>') AS nation, coalesce(c_mktsegment, '<all>') AS segment,
          |  CAST(grouping(n_name) AS INT) AS g_nation, CAST(grouping(c_mktsegment) AS INT) AS g_segment,
          |  count(*) AS n, CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
          |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
          |GROUP BY ROLLUP (n_name, c_mktsegment)
          |ORDER BY g_nation, g_segment, nation, segment""".stripMargin)
    },

    q("g2_cube",
      """SELECT coalesce(o_orderstatus, '<all>') AS status, coalesce(o_orderpriority, '<all>') AS priority,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status, CAST(grouping(o_orderpriority) AS INT) AS g_priority,
        |  count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_priority, status, priority""".stripMargin) { (s, dir) =>
      t(s, dir)("orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          grouping(col("o_orderstatus")).cast(IntegerType).as("g_status"),
          grouping(col("o_orderpriority")).cast(IntegerType).as("g_priority"))
        .select(
          coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
          col("g_status"), col("g_priority"), col("n"))
        .orderBy("g_status", "g_priority", "status", "priority")
    },

    q("g3_grouping_sets",
      """SELECT coalesce(l_returnflag, '<all>') AS rflag, coalesce(l_linestatus, '<all>') AS lstatus,
        |  CAST(grouping(l_returnflag) AS INT) AS g_r, CAST(grouping(l_linestatus) AS INT) AS g_l,
        |  sum(l_quantity) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_r, g_l, rflag, lstatus""".stripMargin) { (s, dir) =>
      graft.Tables.registerAll(s, dir)
      s.sql(
        """SELECT coalesce(l_returnflag, '<all>') AS rflag, coalesce(l_linestatus, '<all>') AS lstatus,
          |  CAST(grouping(l_returnflag) AS INT) AS g_r, CAST(grouping(l_linestatus) AS INT) AS g_l,
          |  sum(l_quantity) AS qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY g_r, g_l, rflag, lstatus""".stripMargin)
    })
}
