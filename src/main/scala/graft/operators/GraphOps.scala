package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph algorithms on (vertices, edges) DataFrames — the capability
  * analog of the reference's Gelly library (SURVEY.md §2.11,
  * flink-libraries/flink-gelly: pregel/scatter-gather loops).
  *
  * Spark shape: a driver-side iteration loop over DataFrames, each
  * step one message-passing join + aggregate (Pregel superstep). Fixed
  * iteration counts keep results deterministic and oracle-checkable;
  * each step is persisted so the lineage (and plan size) stays flat —
  * the pattern that survives 100+ supersteps on a cluster.
  */
object GraphOps {

  /** Min-label propagation, `iterations` supersteps.
    * `edges` must be (src, dst); treated as directed messages — pass a
    * bidirectional edge set for undirected semantics. Self-loops are
    * added automatically so a node always keeps its own label.
    * Returns (node, label): after enough iterations label = component
    * minimum (connected components).
    */
  def labelPropagation(nodes: DataFrame, edges: DataFrame,
                       iterations: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .union(nodes.select(col("node").as("src"), col("node").as("dst")))
      .persist()
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      // localCheckpoint (eager) materializes AND truncates lineage —
      // plain persist keeps the ever-growing logical plan and the
      // optimizer cost per superstep grows superlinearly.
      val next = labels.join(e, labels("node") === e("src"))
        .groupBy(col("dst").as("node_n"))
        .agg(min("label").as("label"))
        .withColumnRenamed("node_n", "node")
        .localCheckpoint(true)
      labels = next
    }
    e.unpersist()
    labels
  }

  /** Delta iteration (SURVEY.md §2.9 — DataSet.iterateDelta:1234):
    * min-label propagation where only CHANGED labels (the workset)
    * send messages each superstep, with early termination when the
    * workset empties — the Flink delta-iteration optimization that
    * makes late supersteps touch only the frontier. Converges to the
    * same fixpoint as full propagation.
    */
  def labelPropagationDelta(nodes: DataFrame, edges: DataFrame,
                            maxIterations: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    var solution = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    var workset = solution
    var i = 0
    var worksetSize = workset.count()
    while (i < maxIterations && worksetSize > 0) {
      // messages only from changed vertices
      val msgs = workset.join(e, workset("node") === e("src"))
        .groupBy(col("dst").as("m_node"))
        .agg(min("label").as("m_label"))
      // one checkpoint per superstep: `joined` is materialized with
      // truncated lineage; `next` and `workset` are cheap narrow
      // projections of it and need no materialization of their own.
      val joined = solution.join(msgs, solution("node") === col("m_node"), "left")
        .select(col("node"), col("label"), col("m_label"))
        .localCheckpoint(true)
      val next = joined
        .select(col("node"),
          when(col("m_label") < col("label"), col("m_label"))
            .otherwise(col("label")).as("label"))
      workset = joined
        .filter(col("m_label") < col("label"))
        .select(col("node"), col("m_label").as("label"))
      worksetSize = workset.count()
      solution = next
      i += 1
    }
    e.unpersist()
    solution
  }

  /** PageRank with damping d, fixed `iterations` supersteps over a
    * directed edge list; dangling nodes redistribute implicitly via
    * the (1-d)/N floor only (simple variant, deterministic). */
  def pageRank(nodes: DataFrame, edgesIn: DataFrame, d: Double,
               iterations: Int): DataFrame = {
    val edges = edgesIn.persist()
    val n = nodes.count().toDouble
    // deg derives from edges — rename its key so the deg⋈edges double
    // use of `src` doesn't trip the ambiguous-self-join check.
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("_degkey"), col("deg"))
    // fold the static out-degree INTO the edge table once, before the
    // loop: each superstep then needs a single pr⋈edges join instead
    // of pr⋈deg⋈edges — one fewer shuffle of the rank table per
    // iteration, at every scale.
    val edgesW = edges.join(deg, edges("src") === col("_degkey"))
      .select(col("src"), col("dst"), col("deg")).persist()
    var pr = nodes.select(col("node"), lit(1.0 / n).as("pr")).localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contrib = pr
        .join(edgesW, pr("node") === edgesW("src"))
        .select(col("dst"), (col("pr") / col("deg")).as("c"))
        .groupBy(col("dst")).agg(sum("c").as("in_sum"))
      // eager localCheckpoint: materialize + truncate lineage (see
      // labelPropagation note).
      val next = pr.select(col("node"))
        .join(contrib, pr("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit((1 - d) / n) + lit(d) * coalesce(col("in_sum"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
      pr = next
    }
    // release both blocks THIS function pinned (the persisted copy of
    // edgesIn and the degree-folded table); the caller's own persists
    // remain the caller's to manage.
    edgesW.unpersist()
    edges.unpersist()
    pr
  }
}
