package graft.queries

import graft.QueryGroup
import graft.operators.GraphOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph library parity (SURVEY.md §2.11 — Gelly): connected
  * components and PageRank as iterative DataFrame supersteps over a
  * bipartite customer–supplier graph derived from high-value orders.
  * Oracles: DuckDB recursive CTEs with the same fixed iteration count.
  */
object Graphs extends QueryGroup {

  /** Bipartite graph: customers ↔ suppliers linked by orders with
    * totalprice > 490000; supplier nodes offset by 1,000,000. */
  private def edgePairs(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir)("orders").filter(col("o_totalprice") > 490000)
    val l = t(s, dir)("lineitem")
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("p"))
      .distinct()
  }

  private val edgesSql =
    """SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS p
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE o_totalprice > 490000""".stripMargin

  override def queries = Seq(

    // Connected components: 6 supersteps of min-label propagation.
    q("gr1_connected_components",
      s"""WITH e0 AS ($edgesSql),
         |nodes AS (SELECT c AS node FROM e0 UNION SELECT p FROM e0),
         |edges AS (SELECT c AS src, p AS dst FROM e0
         |          UNION ALL SELECT p, c FROM e0
         |          UNION ALL SELECT node, node FROM nodes),
         |lbl AS (
         |  WITH RECURSIVE r AS (
         |    SELECT 0 AS it, node, node AS label FROM nodes
         |    UNION ALL
         |    SELECT it + 1, node, label FROM (
         |      SELECT r.it AS it, e.dst AS node, min(r.label) AS label
         |      FROM r JOIN edges e ON e.src = r.node
         |      WHERE r.it < 6 GROUP BY r.it, e.dst))
         |  SELECT node, label FROM r WHERE it = 6)
         |SELECT label AS component, count(*) AS n_nodes, min(node) AS min_node
         |FROM lbl GROUP BY label
         |ORDER BY component""".stripMargin) { (s, dir) =>
      val e0 = edgePairs(s, dir).persist()
      val nodes = e0.select(col("c").as("node"))
        .union(e0.select(col("p"))).distinct()
      val edges = e0.select(col("c").as("src"), col("p").as("dst"))
        .union(e0.select(col("p").as("src"), col("c").as("dst")))
      val lbl = GraphOps.labelPropagation(nodes, edges, iterations = 6)
      // labelPropagation's result is eagerly localCheckpointed, so the
      // edge cache can be released before the (lazy) final aggregate.
      e0.unpersist()
      lbl.groupBy(col("label").as("component"))
        .agg(count(lit(1)).as("n_nodes"), min("node").as("min_node"))
        .orderBy("component")
    },

    // PageRank: 5 supersteps, damping 0.85, rounded to 8dp.
    q("gr2_pagerank",
      s"""WITH e0 AS ($edgesSql),
         |nodes AS (SELECT c AS node FROM e0 UNION SELECT p FROM e0),
         |edges AS (SELECT c AS src, p AS dst FROM e0 UNION ALL SELECT p, c FROM e0),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |ecnt AS (SELECT count(*) AS n FROM nodes),
         |eweight AS (SELECT src, dst, 1 AS w FROM edges
         |            UNION ALL SELECT node, node, 0 FROM nodes),
         |pr AS (
         |  WITH RECURSIVE r AS (
         |    SELECT 0 AS it, node, 1.0 / (SELECT n FROM ecnt) AS pr FROM nodes
         |    UNION ALL
         |    SELECT it + 1, node, 0.15 / (SELECT n FROM ecnt) + 0.85 * s AS pr FROM (
         |      SELECT r.it AS it, ew.dst AS node,
         |        sum(coalesce(r.pr / d.deg, 0) * ew.w) AS s
         |      FROM r JOIN eweight ew ON ew.src = r.node
         |      LEFT JOIN deg d ON d.src = r.node
         |      WHERE r.it < 5 GROUP BY r.it, ew.dst))
         |  SELECT node, pr FROM r WHERE it = 5)
         |SELECT node, round(pr, 8) AS rank FROM pr
         |ORDER BY node""".stripMargin) { (s, dir) =>
      val e0 = edgePairs(s, dir).persist()
      val nodes = e0.select(col("c").as("node"))
        .union(e0.select(col("p"))).distinct()
      val edges = e0.select(col("c").as("src"), col("p").as("dst"))
        .union(e0.select(col("p").as("src"), col("c").as("dst")))
      val pr = GraphOps.pageRank(nodes, edges, d = 0.85, iterations = 5)
      e0.unpersist() // result is checkpointed; see gr1
      pr.select(col("node"), round(col("pr"), 8).as("rank"))
        .orderBy("node")
    })
}
