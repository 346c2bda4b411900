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
    },

    // Single-source shortest paths (Gelly
    // library/SingleSourceShortestPaths.java — scatter-gather min-plus
    // relaxation): 6 bounded supersteps from the minimum customer node
    // over the weighted undirected bipartite graph. Weights are exact
    // integers (ceil(min price / 10000)) so the relaxation is
    // arithmetic-order independent. Unreached nodes carry no row.
    q("gr3_sssp",
      """WITH e0 AS (
        |  SELECT o_custkey AS c, l_suppkey + 1000000 AS p,
        |    CAST(ceil(min(l_extendedprice) / 10000) AS BIGINT) AS w
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  WHERE o_totalprice > 490000 GROUP BY 1, 2),
        |nodes AS (SELECT c AS node FROM e0 UNION SELECT p FROM e0),
        |edges AS (SELECT c AS src, p AS dst, w FROM e0
        |          UNION ALL SELECT p, c, w FROM e0
        |          UNION ALL SELECT node, node, 0 FROM nodes),
        |lbl AS (
        |  WITH RECURSIVE r AS (
        |    SELECT 0 AS it, (SELECT min(c) FROM e0) AS node,
        |      CAST(0 AS BIGINT) AS dist
        |    UNION ALL
        |    SELECT it + 1, node, dist FROM (
        |      SELECT r.it AS it, e.dst AS node, min(r.dist + e.w) AS dist
        |      FROM r JOIN edges e ON e.src = r.node
        |      WHERE r.it < 6 GROUP BY r.it, e.dst))
        |  SELECT node, dist FROM r WHERE it = 6)
        |SELECT node, dist FROM lbl ORDER BY node""".stripMargin) { (s, dir) =>
      val o = t(s, dir)("orders").filter(col("o_totalprice") > 490000)
      val l = t(s, dir)("lineitem")
      val e0 = o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("p"))
        .agg(ceil(min(col("l_extendedprice")) / 10000).cast("long").as("w"))
        .persist()
      val nodes = e0.select(col("c").as("node"))
        .union(e0.select(col("p"))).distinct()
      val edges = e0.select(col("c").as("src"), col("p").as("dst"), col("w"))
        .union(e0.select(col("p").as("src"), col("c").as("dst"), col("w")))
      val source = e0.agg(min("c")).head.getLong(0)
      val d = GraphOps.sssp(nodes, edges, source, iterations = 6)
      e0.unpersist() // result is checkpointed; see gr1
      d.orderBy("node")
    },

    // Community detection (Gelly library/LabelPropagation.java):
    // synchronous most-frequent-neighbor-label voting, ties to the
    // smaller label — 4 fixed iterations, then community size report.
    // A node with no neighbors at iteration k drops out in both
    // engines identically (pure voting, no self-retention), so the
    // fixed-iteration result is well-defined and deterministic.
    q("gr5_community_lp",
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS p
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  WHERE o_totalprice > 490000),
        |nodes AS (SELECT c AS node FROM e0 UNION SELECT p FROM e0),
        |edges AS (SELECT c AS src, p AS dst FROM e0 UNION ALL SELECT p, c FROM e0),
        |lp AS (
        |  WITH RECURSIVE r AS (
        |    SELECT 0 AS it, node, node AS label FROM nodes
        |    UNION ALL
        |    SELECT it + 1, node, label FROM (
        |      SELECT it, node, label,
        |        row_number() OVER (PARTITION BY it, node
        |                           ORDER BY cnt DESC, label ASC) AS rn
        |      FROM (SELECT r.it AS it, e.dst AS node, r.label AS label,
        |              count(*) AS cnt
        |            FROM r JOIN edges e ON e.src = r.node
        |            WHERE r.it < 4 GROUP BY 1, 2, 3)) t
        |    WHERE rn = 1)
        |  SELECT node, label FROM r WHERE it = 4)
        |SELECT label AS community, count(*) AS n_members, min(node) AS min_node
        |FROM lp GROUP BY label ORDER BY community""".stripMargin) { (s, dir) =>
      val e0 = edgePairs(s, dir).persist()
      val nodes = e0.select(col("c").as("node"))
        .union(e0.select(col("p"))).distinct()
      val edges = e0.select(col("c").as("src"), col("p").as("dst"))
        .union(e0.select(col("p").as("src"), col("c").as("dst")))
      val lp = GraphOps.communityLabelPropagation(nodes, edges, iterations = 4)
      e0.unpersist() // result is checkpointed; see gr1
      lp.groupBy(col("label").as("community"))
        .agg(count(lit(1)).as("n_members"), min(col("node")).as("min_node"))
        .orderBy("community")
    },

    // Triangle counting (Gelly library/TriangleEnumerator.java): the
    // supplier co-purchase graph of high-value orders, edges oriented
    // low-id → high-id so each triangle is enumerated exactly once by
    // two equi-joins (the standard distributed enumeration — never
    // vertex-centric neighborhood materialization; a degree-based
    // orientation would further bound skew on power-law graphs, noted
    // in the Scaladoc spirit but unnecessary at this density).
    q("gr4_triangle_count",
      """WITH hv AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 490000),
        |pairs AS (
        |  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        |  FROM lineitem a
        |  JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        |  JOIN hv ON a.l_orderkey = hv.o_orderkey)
        |SELECT (SELECT count(*) FROM pairs) AS n_edges,
        |  (SELECT count(*) FROM pairs e1
        |   JOIN pairs e2 ON e2.u = e1.v
        |   JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles""".stripMargin) { (s, dir) =>
      val hv = t(s, dir)("orders").filter(col("o_totalprice") > 490000)
        .select("o_orderkey")
      val l = t(s, dir)("lineitem").select("l_orderkey", "l_suppkey")
      val a = l.toDF("ok", "u")
      val b = l.toDF("ok2", "v")
      val pairs = a.join(b, col("ok") === col("ok2") && col("u") < col("v"))
        .join(hv, col("ok") === col("o_orderkey"))
        .select("u", "v").distinct().persist()
      val e1 = pairs
      val e2 = pairs.toDF("u2", "v2")
      val e3 = pairs.toDF("u3", "v3")
      val tri = e1.join(e2, col("u2") === col("v"))
        .join(e3, col("u3") === col("u") && col("v3") === col("v2"))
        .count()
      val nEdges = pairs.count()
      pairs.unpersist()
      import s.implicits._
      Seq((nEdges, tri)).toDF("n_edges", "n_triangles")
    })
}
