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

  /** Supplier PRECEDENCE edges for the directed metrics/clustering
    * queries (gr16/gr17): u → v when u's line precedes v's within a
    * high-value order. The high-value cut is ~1-2% of orders, so the
    * fact table is broadcast-SEMI-joined against the order set BEFORE
    * the pair self-join — without CBO stats Catalyst keeps the written
    * join order, and filtering after the self-join would materialize
    * the full per-order pair fan-out only to discard ~98% of it.
    * PlanSpec asserts both self-join inputs carry this cut. */
  private[graft] def precedenceEdges(s: SparkSession, dir: String): DataFrame = {
    val hv = t(s, dir)("orders").filter(col("o_totalprice") > 490000)
      .select("o_orderkey")
    val l = t(s, dir)("lineitem")
      .select("l_orderkey", "l_linenumber", "l_suppkey")
      .join(broadcast(hv), col("l_orderkey") === col("o_orderkey"),
        "left_semi")
    val a = l.toDF("ok", "ln_a", "src")
    val b = l.toDF("ok2", "ln_b", "dst")
    a.join(b, col("ok") === col("ok2") &&
        col("ln_a") < col("ln_b") && col("src") =!= col("dst"))
      .select("src", "dst").distinct()
  }

  /** Supplier CO-PURCHASE pairs (u < v within a high-value order) for
    * the undirected metric queries (gr4/gr9/gr10/gr13). Same scale
    * posture as [[precedenceEdges]]: the high-value cut is ~1-2% of
    * orders, so lineitem is SEMI-joined against the order set BEFORE
    * the pair self-join (guide §3.2 — shrink the big side first).
    * Without CBO stats Catalyst keeps the written join order, and the
    * previous shape (self-join the FULL fact, then filter) built the
    * per-order pair fan-out for every order only to discard ~98% of it
    * — measured solo at sf0.1: gr4 3.43 → 1.02 s, and the r14-host
    * self-join stage dominated every consumer the same way. The
    * broadcast pin rides the GateBroadcastHints size cap like every
    * pinned build side (oversized ⇒ stripped ⇒ shuffle semi join). */
  private[graft] def coPurchasePairs(s: SparkSession, dir: String): DataFrame = {
    val hv = t(s, dir)("orders").filter(col("o_totalprice") > 490000)
      .select("o_orderkey")
    val l = t(s, dir)("lineitem").select("l_orderkey", "l_suppkey")
      .join(broadcast(hv), col("l_orderkey") === col("o_orderkey"),
        "left_semi")
    val a = l.toDF("ok", "u")
    val b = l.toDF("ok2", "v")
    a.join(b, col("ok") === col("ok2") && col("u") < col("v"))
      .select("u", "v").distinct()
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

    // Jaccard index (Gelly library/similarity/JaccardIndex.java):
    // |N(u) ∩ N(v)| / |N(u) ∪ N(v)| for every pair with at least one
    // shared neighbor. Distributed shape = the reference's: pairs are
    // generated per CENTER vertex (the shared neighbor) as an
    // equi-self-join of the adjacency list — never an all-pairs
    // product — and the union size comes from degrees
    // (deg u + deg v − shared), so cost is Σ deg(w)² wedges, the same
    // bound the reference's group-splitting targets; AQE skew-join
    // covers a hot center at scale. Scores are a single int/int
    // division — deterministic doubles, no rounding needed.
    q("gr6_jaccard_index",
      s"""WITH e0 AS ($edgesSql),
         |edges AS (SELECT c AS src, p AS dst FROM e0 UNION ALL SELECT p, c FROM e0),
         |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
         |shared AS (
         |  SELECT e1.dst AS u, e2.dst AS v, count(*) AS shared
         |  FROM edges e1 JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
         |  GROUP BY 1, 2)
         |SELECT s.u, s.v, s.shared,
         |  CAST(s.shared AS DOUBLE) / (du.deg + dv.deg - s.shared) AS jaccard
         |FROM shared s
         |JOIN deg du ON du.node = s.u
         |JOIN deg dv ON dv.node = s.v
         |ORDER BY u, v""".stripMargin) { (s, dir) =>
      val e0 = edgePairs(s, dir).persist()
      e0.count() // eager fill — see gr8
      val edges = e0.select(col("c").as("src"), col("p").as("dst"))
        .union(e0.select(col("p").as("src"), col("c").as("dst")))
      val deg = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      val e1 = edges.toDF("w", "u")
      val e2 = edges.toDF("w2", "v")
      val shared = e1.join(e2, col("w") === col("w2") && col("u") < col("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("shared"))
      val res = shared
        .join(deg.toDF("nu", "du"), col("u") === col("nu"))
        .join(deg.toDF("nv", "dv"), col("v") === col("nv"))
        .select(col("u"), col("v"), col("shared"),
          (col("shared").cast("double") / (col("du") + col("dv") - col("shared")))
            .as("jaccard"))
        .orderBy("u", "v")
      val out = res.localCheckpoint(true)
      e0.unpersist()
      out
    },

    // Adamic-Adar (Gelly library/similarity/AdamicAdar.java): pair
    // affinity Σ over shared neighbors w of 1/ln(deg w) — the center's
    // weight is computed ONCE on the degree table and joined into the
    // wedge generation (the reference folds it into the vertex before
    // pair emission), so the per-pair aggregate is a plain sum. Every
    // center of a wedge has deg ≥ 2, so ln(deg) ≥ ln 2 — no
    // divide-by-zero arm needed. Double sum rounded to 8dp (same
    // order-independence treatment as gr2's PageRank).
    q("gr7_adamic_adar",
      s"""WITH e0 AS ($edgesSql),
         |edges AS (SELECT c AS src, p AS dst FROM e0 UNION ALL SELECT p, c FROM e0),
         |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
         |wedges AS (
         |  SELECT e1.src AS w, e1.dst AS u, e2.dst AS v
         |  FROM edges e1 JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst)
         |SELECT wg.u, wg.v, round(sum(1.0 / ln(d.deg)), 8) AS aa
         |FROM wedges wg JOIN deg d ON d.node = wg.w
         |GROUP BY wg.u, wg.v
         |ORDER BY u, v""".stripMargin) { (s, dir) =>
      val e0 = edgePairs(s, dir).persist()
      e0.count() // eager fill — see gr8
      val edges = e0.select(col("c").as("src"), col("p").as("dst"))
        .union(e0.select(col("p").as("src"), col("c").as("dst")))
      val deg = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      // center weight attached BEFORE the wedge fan-out: the deg join
      // touches |edges| rows instead of |wedges| (Σ deg² ≫ |E|)
      val e1 = edges.join(deg, col("src") === col("node"))
        .select(col("src").as("w"), col("dst").as("u"),
          (lit(1.0) / log(col("deg"))).as("wt"))
      val e2 = edges.toDF("w2", "v")
      val res = e1.join(e2, col("w") === col("w2") && col("u") < col("v"))
        .groupBy("u", "v")
        .agg(round(sum(col("wt")), 8).as("aa"))
        .orderBy("u", "v")
      val out = res.localCheckpoint(true)
      e0.unpersist()
      out
    },

    // HITS (Gelly library/linkanalysis/HITS.java): hubs and
    // authorities over the DIRECTED customer→supplier graph, 2 fixed
    // iterations with the reference's update order — per iteration
    // h_raw(v) = Σ_out a_prev, a_raw(u) = Σ_in h_raw, then BOTH
    // normalized by their Euclidean norms (HITS.java's
    // JoinAndNormalizeHubAndAuthority over broadcast sum-of-squares;
    // here the norm is a 1-row aggregate broadcast by crossJoin —
    // never a re-shuffle of the score table). Oracle = the same two
    // iterations unrolled; scores rounded to 8dp.
    q("gr8_hits",
      s"""WITH e0 AS ($edgesSql),
         |ed AS (SELECT c AS src, p AS dst FROM e0),
         |nodes AS (SELECT c AS node FROM e0 UNION SELECT p FROM e0),
         |h1 AS (SELECT src AS node, CAST(count(*) AS DOUBLE) AS h FROM ed GROUP BY src),
         |a1 AS (SELECT ed.dst AS node, sum(h1.h) AS a
         |       FROM ed JOIN h1 ON h1.node = ed.src GROUP BY ed.dst),
         |an1 AS (SELECT node, a / sqrt((SELECT sum(a * a) FROM a1)) AS a FROM a1),
         |h2 AS (SELECT ed.src AS node, sum(an1.a) AS h
         |       FROM ed JOIN an1 ON an1.node = ed.dst GROUP BY ed.src),
         |a2 AS (SELECT ed.dst AS node, sum(h2.h) AS a
         |       FROM ed JOIN h2 ON h2.node = ed.src GROUP BY ed.dst),
         |hn2 AS (SELECT node, h / sqrt((SELECT sum(h * h) FROM h2)) AS h FROM h2),
         |an2 AS (SELECT node, a / sqrt((SELECT sum(a * a) FROM a2)) AS a FROM a2)
         |SELECT n.node, round(coalesce(hn2.h, 0), 8) AS hub,
         |  round(coalesce(an2.a, 0), 8) AS auth
         |FROM nodes n
         |LEFT JOIN hn2 ON hn2.node = n.node
         |LEFT JOIN an2 ON an2.node = n.node
         |ORDER BY n.node""".stripMargin) { (s, dir) =>
      val e0 = edgePairs(s, dir).persist()
      val ed = e0.select(col("c").as("src"), col("p").as("dst"))
      val nodes = e0.select(col("c").as("node"))
        .union(e0.select(col("p"))).distinct()
      def normalize(scores: DataFrame, c: String): DataFrame = {
        val norm = scores.agg(sqrt(sum(col(c) * col(c))).as("_norm"))
        scores.crossJoin(broadcast(norm))
          .select(col("node"), (col(c) / col("_norm")).as(c))
      }
      // each score table is consumed twice (its norm + the next
      // hop/final join) — persist so Catalyst's no-exchange-reuse
      // doesn't re-run the whole upstream chain per reference (the
      // d24 materialize-once rule; unpersisted once `out` is eager)
      val h1 = ed.groupBy(col("src").as("node"))
        .agg(count(lit(1)).cast("double").as("h"))
      val a1 = ed.join(h1, col("node") === col("src"))
        .groupBy(col("dst")).agg(sum("h").as("a"))
        .select(col("dst").as("node"), col("a")).persist()
      a1.count() // eager fill: both consumers below read the cache
      val an1 = normalize(a1, "a")
      val h2 = ed.join(an1, col("node") === col("dst"))
        .groupBy(col("src")).agg(sum("a").as("h"))
        .select(col("src").as("node"), col("h")).persist()
      h2.count()
      val a2 = ed.join(h2, col("node") === col("src"))
        .groupBy(col("dst")).agg(sum("h").as("a"))
        .select(col("dst").as("node"), col("a")).persist()
      a2.count()
      val hn2 = normalize(h2, "h").withColumnRenamed("node", "hn")
      val an2 = normalize(a2, "a").withColumnRenamed("node", "an")
      val res = nodes
        .join(hn2, col("node") === col("hn"), "left")
        .join(an2, col("node") === col("an"), "left")
        .select(col("node"),
          round(coalesce(col("h"), lit(0.0)), 8).as("hub"),
          round(coalesce(col("a"), lit(0.0)), 8).as("auth"))
        .orderBy("node")
      val out = res.localCheckpoint(true)
      Seq(a1, h2, a2).foreach(_.unpersist(false))
      e0.unpersist()
      out
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
      val pairs = coPurchasePairs(s, dir).persist()
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
    },

    // Local clustering coefficient (Gelly library/clustering/
    // undirected/LocalClusteringCoefficient.java): per-vertex
    // 2·triangles / (deg·(deg−1)) over the supplier co-purchase
    // graph. Triangle credit comes from the SAME oriented two-join
    // enumeration as gr4 (each low<mid<high triangle credits its
    // three corners via a 3-way union — never a per-vertex
    // neighborhood materialization); the score is one int/int double
    // division, so no rounding is needed.
    q("gr9_clustering_coeff",
      """WITH hv AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 490000),
        |pairs AS (
        |  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        |  FROM lineitem a
        |  JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        |  JOIN hv ON a.l_orderkey = hv.o_orderkey),
        |deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs) t
        |  GROUP BY node),
        |tri AS (
        |  SELECT e1.u, e1.v, e2.v AS w
        |  FROM pairs e1
        |  JOIN pairs e2 ON e2.u = e1.v
        |  JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v),
        |tcnt AS (
        |  SELECT node, count(*) AS tri FROM (
        |    SELECT u AS node FROM tri UNION ALL SELECT v FROM tri
        |    UNION ALL SELECT w FROM tri) t
        |  GROUP BY node)
        |SELECT d.node, d.deg, coalesce(tc.tri, 0) AS tri,
        |  CASE WHEN d.deg < 2 THEN 0.0
        |       ELSE CAST(2 * coalesce(tc.tri, 0) AS DOUBLE) / (d.deg * (d.deg - 1))
        |  END AS cc
        |FROM deg d LEFT JOIN tcnt tc ON tc.node = d.node
        |ORDER BY d.node""".stripMargin) { (s, dir) =>
      val pairs = coPurchasePairs(s, dir).persist()
      pairs.count() // eager fill — see gr8
      val deg = pairs.select(col("u").as("node"))
        .union(pairs.select(col("v")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val e2 = pairs.toDF("u2", "v2")
      val e3 = pairs.toDF("u3", "v3")
      val tri = pairs.join(e2, col("u2") === col("v"))
        .join(e3, col("u3") === col("u") && col("v3") === col("v2"))
        .select(col("u"), col("v"), col("v2").as("w"))
      // one pass over the enumeration: explode credits all three
      // corners without re-running the two triangle joins per corner
      val tcnt = tri
        .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("tri"))
      val res = deg.join(tcnt.toDF("tn", "tc"), col("node") === col("tn"), "left")
        .select(col("node"), col("deg"), coalesce(col("tc"), lit(0L)).as("tri"),
          when(col("deg") < 2, lit(0.0))
            .otherwise((coalesce(col("tc"), lit(0L)) * 2).cast("double") /
              (col("deg") * (col("deg") - 1))).as("cc"))
        .orderBy("node")
      val out = res.localCheckpoint(true)
      pairs.unpersist()
      out
    },

    // Vertex metrics (Gelly library/metric/undirected/
    // VertexMetrics.java): one-row graph summary — vertex/edge
    // counts, average degree, maximum degree, and triplet count
    // Σ deg·(deg−1)/2 (the wedge denominator of the global
    // clustering coefficient). All integer aggregates over the
    // degree table; the only division is the final 1-row average.
    q("gr10_vertex_metrics",
      """WITH hv AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 490000),
        |pairs AS (
        |  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        |  FROM lineitem a
        |  JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        |  JOIN hv ON a.l_orderkey = hv.o_orderkey),
        |deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs) t
        |  GROUP BY node)
        |SELECT count(*) AS n_vertices,
        |  (SELECT count(*) FROM pairs) AS n_edges,
        |  CAST(2 * (SELECT count(*) FROM pairs) AS DOUBLE) / count(*) AS avg_degree,
        |  max(deg) AS max_degree,
        |  CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_triplets
        |FROM deg""".stripMargin) { (s, dir) =>
      val pairs = coPurchasePairs(s, dir).persist()
      pairs.count() // eager fill — see gr8
      val deg = pairs.select(col("u").as("node"))
        .union(pairs.select(col("v")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val edgeCnt = pairs.agg(count(lit(1)).as("n_edges"))
      val res = deg.agg(count(lit(1)).as("n_vertices"),
          max("deg").as("max_degree"),
          sum(col("deg") * (col("deg") - 1) / 2).cast("long").as("n_triplets"))
        .crossJoin(broadcast(edgeCnt))
        .select(col("n_vertices"), col("n_edges"),
          ((col("n_edges") * 2).cast("double") / col("n_vertices")).as("avg_degree"),
          col("max_degree"), col("n_triplets"))
      val out = res.localCheckpoint(true)
      pairs.unpersist()
      out
    },

    // Summarization (Gelly library/Summarization.java): contract the
    // bipartite purchase graph by vertex VALUE — customers by their
    // nation, suppliers by theirs — emitting one summarized edge per
    // (source group, target group) with the edge multiplicity and
    // distinct endpoint counts (the reference's summarized vertex
    // counts, folded into the edge row). Group keys come from two
    // broadcast dimension joins; the contraction itself is one
    // hash aggregation.
    q("gr11_summarization",
      s"""WITH e0 AS ($edgesSql)
         |SELECT cn.c_nationkey AS src_nation, sn.s_nationkey AS dst_nation,
         |  count(*) AS n_edges,
         |  count(DISTINCT e0.c) AS n_src_vertices,
         |  count(DISTINCT e0.p) AS n_dst_vertices
         |FROM e0
         |JOIN customer cn ON cn.c_custkey = e0.c
         |JOIN supplier sn ON sn.s_suppkey = e0.p - 1000000
         |GROUP BY 1, 2
         |ORDER BY src_nation, dst_nation""".stripMargin) { (s, dir) =>
      val e0 = edgePairs(s, dir)
      val cn = t(s, dir)("customer").select("c_custkey", "c_nationkey")
      val sn = t(s, dir)("supplier").select("s_suppkey", "s_nationkey")
      // no broadcast() pin: customer/supplier scale with SF — the
      // size-based threshold (and AQE) picks broadcast when they fit
      e0.join(cn, col("c") === col("c_custkey"))
        .join(sn, col("p") - 1000000L === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("src_nation"),
          col("s_nationkey").as("dst_nation"))
        .agg(count(lit(1)).as("n_edges"),
          countDistinct(col("c")).as("n_src_vertices"),
          countDistinct(col("p")).as("n_dst_vertices"))
        .orderBy("src_nation", "dst_nation")
    },

    // Bipartite top-projection (Gelly bipartite/BipartiteGraph.java:130
    // projectionTopSimple): the customer-side graph induced by shared
    // suppliers — one edge per customer pair per shared bottom vertex,
    // produced by the reference's exact shape (edges self-joined on
    // the bottom vertex id), summarized here as pair multiplicity +
    // the smallest shared supplier. Never an all-pairs product; the
    // equi-join on the bottom id bounds work by Σ deg(bottom)².
    q("gr12_bipartite_projection",
      s"""WITH e0 AS ($edgesSql)
         |SELECT a.c AS u, b.c AS v, count(*) AS n_shared,
         |  min(a.p) AS min_shared
         |FROM e0 a JOIN e0 b ON a.p = b.p AND a.c < b.c
         |GROUP BY 1, 2
         |ORDER BY u, v""".stripMargin) { (s, dir) =>
      val e0 = edgePairs(s, dir)
      val a = e0.toDF("u", "pa")
      val b = e0.toDF("v", "pb")
      a.join(b, col("pa") === col("pb") && col("u") < col("v"))
        .groupBy("u", "v")
        .agg(count(lit(1)).as("n_shared"), min(col("pa")).as("min_shared"))
        .orderBy("u", "v")
    },

    // Triadic census (Gelly library/clustering/undirected/
    // TriadicCensus.java:79): occurrences of the four undirected triad
    // types over the supplier co-purchase graph, computed — exactly as
    // the reference does — from the closed-form combination of the
    // triangle count and the degree-derived triplet count, never by
    // enumerating vertex triples: t3 = triangles,
    // t2 = triplets − 3·t3, t1 = E·(n−2) − 2·t2 − 3·t3,
    // t0 = C(n,3) − t1 − t2 − t3. The only distributed work is the
    // gr4 triangle enumeration + one degree aggregation.
    q("gr13_triadic_census",
      """WITH hv AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 490000),
        |pairs AS (
        |  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        |  FROM lineitem a
        |  JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        |  JOIN hv ON a.l_orderkey = hv.o_orderkey),
        |deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs) t
        |  GROUP BY node),
        |m AS (SELECT count(*) AS n,
        |        CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS triplets
        |      FROM deg),
        |ec AS (SELECT count(*) AS e FROM pairs),
        |tc AS (SELECT count(*) AS t3 FROM pairs e1
        |       JOIN pairs e2 ON e2.u = e1.v
        |       JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT t3 AS triads3,
        |  triplets - 3 * t3 AS triads2,
        |  e * (n - 2) - 2 * (triplets - 3 * t3) - 3 * t3 AS triads1,
        |  CAST(n * (n - 1) * (n - 2) / 6
        |    - (e * (n - 2) - 2 * (triplets - 3 * t3) - 3 * t3)
        |    - (triplets - 3 * t3) - t3 AS BIGINT) AS triads0
        |FROM m, ec, tc""".stripMargin) { (s, dir) =>
      val pairs = coPurchasePairs(s, dir).persist()
      pairs.count() // eager fill — see gr8
      val deg = pairs.select(col("u").as("node"))
        .union(pairs.select(col("v")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val m = deg.agg(count(lit(1)).as("n"),
        sum(col("deg") * (col("deg") - 1) / 2).cast("long").as("triplets"))
      val ec = pairs.agg(count(lit(1)).as("e"))
      val e2 = pairs.toDF("u2", "v2")
      val e3 = pairs.toDF("u3", "v3")
      val tc = pairs.join(e2, col("u2") === col("v"))
        .join(e3, col("u3") === col("u") && col("v3") === col("v2"))
        .agg(count(lit(1)).as("t3"))
      val t2c = col("triplets") - lit(3) * col("t3")
      val t1c = col("e") * (col("n") - 2) - lit(2) * t2c - lit(3) * col("t3")
      val res = m.crossJoin(broadcast(ec)).crossJoin(broadcast(tc))
        .select(col("t3").as("triads3"), t2c.as("triads2"), t1c.as("triads1"),
          (col("n") * (col("n") - 1) * (col("n") - 2) / lit(6)
            - t1c - t2c - col("t3")).cast("long").as("triads0"))
      val out = res.localCheckpoint(true)
      pairs.unpersist()
      out
    },

    // Edge metrics (Gelly library/metric/undirected/EdgeMetrics.java):
    // triangle/rectangle triplet counts and maxima from the
    // degree-ordered edge marking — per vertex v, s(v) = neighbors
    // ranked higher in (degree, id) order (EdgeStats' low-side mark),
    // then triangle triplets C(s,2) and rectangle triplets
    // C(s,2) + s·(deg−s), summed and maxed globally. One degree
    // aggregation + one edge join — no triangle enumeration at all,
    // which is the point of the reference's formulation.
    q("gr14_edge_metrics",
      s"""WITH e0 AS ($edgesSql),
         |edges AS (SELECT c AS src, p AS dst FROM e0 UNION ALL SELECT p, c FROM e0),
         |deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
         |s AS (
         |  SELECT e.src AS node, d1.deg AS deg,
         |    sum(CASE WHEN d1.deg < d2.deg
         |             OR (d1.deg = d2.deg AND e.src < e.dst)
         |        THEN 1 ELSE 0 END) AS low
         |  FROM edges e
         |  JOIN deg d1 ON d1.node = e.src
         |  JOIN deg d2 ON d2.node = e.dst
         |  GROUP BY e.src, d1.deg),
         |m AS (SELECT CAST(low * (low - 1) / 2 AS BIGINT) AS tri,
         |        CAST(low * (low - 1) / 2 + low * (deg - low) AS BIGINT) AS rect
         |      FROM s)
         |SELECT CAST(sum(tri) AS BIGINT) AS triangle_triplets,
         |  CAST(sum(rect) AS BIGINT) AS rectangle_triplets,
         |  max(tri) AS max_triangle_triplets,
         |  max(rect) AS max_rectangle_triplets
         |FROM m""".stripMargin) { (s, dir) =>
      val e0 = edgePairs(s, dir).persist()
      e0.count() // eager fill — see gr8
      val edges = e0.select(col("c").as("src"), col("p").as("dst"))
        .union(e0.select(col("p").as("src"), col("c").as("dst")))
      val deg = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      val low = edges
        .join(deg.toDF("n1", "d1"), col("src") === col("n1"))
        .join(deg.toDF("n2", "d2"), col("dst") === col("n2"))
        .groupBy(col("src"), col("d1"))
        .agg(sum(when(col("d1") < col("d2") ||
            (col("d1") === col("d2") && col("src") < col("dst")), 1L)
          .otherwise(0L)).as("low"))
      val m = low.select(
        (col("low") * (col("low") - 1) / 2).cast("long").as("tri"),
        (col("low") * (col("low") - 1) / 2 + col("low") * (col("d1") - col("low")))
          .cast("long").as("rect"))
      val res = m.agg(sum("tri").cast("long").as("triangle_triplets"),
        sum("rect").cast("long").as("rectangle_triplets"),
        max("tri").as("max_triangle_triplets"),
        max("rect").as("max_rectangle_triplets"))
      val out = res.localCheckpoint(true)
      e0.unpersist()
      out
    },

    // Graph generators (Gelly flink-gelly/.../graph/generator/*):
    // every deterministic generator emitted as an index-parameterized
    // map-only edge list (lib:GraphGenerators) and summarized per
    // graph — vertex count, directed edge count, min/max out-degree.
    // The oracle is graph theory: each generator's counts and degree
    // bounds in closed form. (RMat, the non-closed-form member, is
    // spec-pinned: determinism, edge count, vertex bounds.)
    q("gr15_graph_generators",
      """SELECT gname, CAST(n_vertices AS BIGINT) AS n_vertices,
        |  CAST(n_edges AS BIGINT) AS n_edges,
        |  CAST(min_degree AS BIGINT) AS min_degree,
        |  CAST(max_degree AS BIGINT) AS max_degree
        |FROM (VALUES
        |  ('circulant', 13, 52, 4, 4),
        |  ('complete', 8, 56, 7, 7),
        |  ('cycle', 12, 24, 2, 2),
        |  ('empty', 5, 0, 0, 0),
        |  ('grid', 12, 34, 2, 4),
        |  ('hypercube', 16, 64, 4, 4),
        |  ('path', 12, 22, 1, 2),
        |  ('singleton_edge', 12, 12, 1, 1),
        |  ('star', 12, 22, 1, 11)
        |) AS t(gname, n_vertices, n_edges, min_degree, max_degree)
        |ORDER BY gname""".stripMargin) { (s, dir) =>
      import graft.operators.{GraphGenerators => GG}
      def summary(name: String, edges: DataFrame, n: Long): DataFrame = {
        val deg = GG.vertices(s, n)
          .join(edges, col("node") === col("src"), "left")
          .groupBy("node")
          .agg(sum(when(col("src").isNotNull, 1L).otherwise(0L)).as("deg"))
        deg.agg(count(lit(1)).as("n_vertices"), sum("deg").as("n_edges"),
            min("deg").as("min_degree"), max("deg").as("max_degree"))
          .select(lit(name).as("gname"), col("n_vertices"),
            col("n_edges").cast("long").as("n_edges"),
            col("min_degree"), col("max_degree"))
      }
      Seq(
        summary("circulant", GG.circulant(s, 13, Seq(1L, 3L)), 13),
        summary("complete", GG.complete(s, 8), 8),
        summary("cycle", GG.cycle(s, 12), 12),
        summary("empty", GG.empty(s, 5), 5),
        summary("grid", GG.grid(s, 3, 4), 12),
        summary("hypercube", GG.hypercube(s, 4), 16),
        summary("path", GG.path(s, 12), 12),
        summary("singleton_edge", GG.singletonEdge(s, 6), 12),
        summary("star", GG.star(s, 12), 12))
        .reduce(_ union _)
        .orderBy("gname")
    },

    // DIRECTED vertex metrics (Gelly library/metric/directed/
    // VertexMetrics.java + EdgeMetrics' uni/bidirectional split):
    // over the supplier PRECEDENCE graph — u → v when u's line
    // precedes v's within a high-value order — which genuinely mixes
    // unidirectional and bidirectional pairs (opposite orders across
    // different orders). Bidirectionality is a self-SEMI-join against
    // the reversed edge list (never a pair materialization); the
    // six scalars assemble via 1-row broadcast crossJoins.
    q("gr16_directed_metrics",
      """WITH hv AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 490000),
        |de AS (
        |  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        |  FROM lineitem a
        |  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_linenumber < b.l_linenumber AND a.l_suppkey <> b.l_suppkey
        |  JOIN hv ON a.l_orderkey = hv.o_orderkey),
        |bid AS (SELECT count(*) AS nb FROM de e1 WHERE EXISTS (
        |  SELECT 1 FROM de e2 WHERE e2.src = e1.dst AND e2.dst = e1.src)),
        |outd AS (SELECT src, count(*) AS d FROM de GROUP BY src),
        |ind AS (SELECT dst, count(*) AS d FROM de GROUP BY dst),
        |verts AS (SELECT src AS v FROM de UNION SELECT dst FROM de)
        |SELECT (SELECT count(*) FROM verts) AS n_vertices,
        |  (SELECT count(*) FROM de) AS n_edges,
        |  (SELECT count(*) FROM de) - (SELECT nb FROM bid) AS n_unidirectional,
        |  CAST((SELECT nb FROM bid) / 2 AS BIGINT) AS n_bidirectional_pairs,
        |  (SELECT max(d) FROM outd) AS max_out_degree,
        |  (SELECT max(d) FROM ind) AS max_in_degree""".stripMargin) { (s, dir) =>
      val de = precedenceEdges(s, dir).persist()
      de.count() // eager fill — see gr8
      val rev = de.toDF("r_src", "r_dst")
      val bid = de.join(rev,
          col("src") === col("r_dst") && col("dst") === col("r_src"),
          "left_semi")
        .agg(count(lit(1)).as("nb"))
      val nv = de.select(col("src").as("v")).union(de.select(col("dst")))
        .distinct().agg(count(lit(1)).as("n_vertices"))
      val ne = de.agg(count(lit(1)).as("n_edges"))
      val od = de.groupBy("src").agg(count(lit(1)).as("d"))
        .agg(max("d").as("max_out_degree"))
      val idg = de.groupBy("dst").agg(count(lit(1)).as("d"))
        .agg(max("d").as("max_in_degree"))
      val res = nv.crossJoin(broadcast(ne)).crossJoin(broadcast(bid))
        .crossJoin(broadcast(od)).crossJoin(broadcast(idg))
        .select(col("n_vertices"), col("n_edges"),
          (col("n_edges") - col("nb")).as("n_unidirectional"),
          (col("nb") / 2).cast("long").as("n_bidirectional_pairs"),
          col("max_out_degree"), col("max_in_degree"))
      val out = res.localCheckpoint(true)
      de.unpersist()
      out
    },

    // DIRECTED local clustering coefficient (Gelly library/clustering/
    // directed/LocalClusteringCoefficient.java): per vertex, the
    // number of DIRECTED edges among its distinct neighbors (each
    // direction counts) over deg·(deg−1) potential directed edges,
    // deg = |in ∪ out neighbors|. Shape: neighbor list → one wedge
    // join against the edge list → membership equi-join — Σ deg²
    // bounded like every wedge query here, never neighborhoods ×
    // neighborhoods.
    q("gr17_directed_clustering",
      """WITH hv AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 490000),
        |de AS (
        |  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        |  FROM lineitem a
        |  JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        |    AND a.l_linenumber < b.l_linenumber AND a.l_suppkey <> b.l_suppkey
        |  JOIN hv ON a.l_orderkey = hv.o_orderkey),
        |nbr AS (SELECT DISTINCT v, w FROM (
        |  SELECT src AS v, dst AS w FROM de
        |  UNION ALL SELECT dst, src FROM de) t),
        |deg AS (SELECT v, count(*) AS deg FROM nbr GROUP BY v),
        |tri AS (
        |  SELECT n1.v, count(*) AS tri
        |  FROM nbr n1
        |  JOIN de e ON e.src = n1.w
        |  JOIN nbr n2 ON n2.v = n1.v AND n2.w = e.dst
        |  GROUP BY n1.v)
        |SELECT d.v AS node, d.deg, coalesce(t.tri, 0) AS tri,
        |  CASE WHEN d.deg < 2 THEN 0.0
        |       ELSE CAST(coalesce(t.tri, 0) AS DOUBLE) / (d.deg * (d.deg - 1))
        |  END AS cc
        |FROM deg d LEFT JOIN tri t ON t.v = d.v
        |ORDER BY node""".stripMargin) { (s, dir) =>
      val de = precedenceEdges(s, dir).persist()
      de.count() // eager fill — see gr8
      val nbr = de.select(col("src").as("v"), col("dst").as("w"))
        .union(de.select(col("dst").as("v"), col("src").as("w")))
        .distinct().persist()
      nbr.count() // consumed by deg + two wedge-join sides
      val deg = nbr.groupBy("v").agg(count(lit(1)).as("deg"))
      val n1 = nbr.toDF("v1", "w1")
      val n2 = nbr.toDF("v2", "w2")
      val tri = n1.join(de, col("src") === col("w1"))
        .join(n2, col("v2") === col("v1") && col("w2") === col("dst"))
        .groupBy(col("v1")).agg(count(lit(1)).as("tri"))
      val res = deg.join(tri, col("v") === col("v1"), "left")
        .select(col("v").as("node"), col("deg"),
          coalesce(col("tri"), lit(0L)).as("tri"),
          when(col("deg") < 2, lit(0.0))
            .otherwise(coalesce(col("tri"), lit(0L)).cast("double") /
              (col("deg") * (col("deg") - 1))).as("cc"))
        .orderBy("node")
      val out = res.localCheckpoint(true)
      Seq(de, nbr).foreach(_.unpersist(false))
      out
    })
}
