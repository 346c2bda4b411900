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

  /** How each superstep's result is materialized (lineage truncation
    * is mandatory either way — without it the logical plan grows per
    * superstep and optimization cost goes superlinear):
    *
    *  - `dir = None` (default): eager `localCheckpoint` — executor
    *    block storage, no replication. Fast, right for local / interactive.
    *  - `dir = Some(path)`: every `every`-th superstep writes a RELIABLE
    *    `checkpoint()` to the directory (HDFS/object store on a real
    *    cluster), localCheckpoint in between. On a 1000-executor
    *    cluster a lost executor then costs at most `every` supersteps
    *    of recompute instead of aborting the whole iteration — the
    *    durability/throughput trade the reference makes with
    *    checkpoint intervals on iterative jobs.
    */
  case class IterationCheckpointing(dir: Option[String] = None, every: Int = 5)

  /** Per-iteration materializer: truncates lineage each superstep AND
    * releases the previous superstep's blocks as soon as its successor
    * is materialized. Without the in-loop release, a 50-superstep run
    * leaves one lineage-truncated RDD per step pinned until the end of
    * the query — bounded memory here means the iteration's storage
    * footprint is O(1) supersteps at any scale, and a caller-side
    * cache sweep (a shared cluster's, or a bench harness's) has exactly
    * one block left to touch instead of dozens of unrecomputable
    * localCheckpoint blocks.
    *
    * Checkpoint-dir note: `setCheckpointDir` stores a qualified
    * `<dir>/<UUID>` path, so equality against the configured `dir`
    * never holds — the guard is a substring check, done ONCE per
    * iteration call, so a caller's own checkpoint dir is reconfigured
    * at most once (not clobbered with a fresh UUID every superstep).
    */
  private final class StepMaterializer(ckpt: IterationCheckpointing,
                                       spark: org.apache.spark.sql.SparkSession) {
    private val sc = spark.sparkContext
    private var prevIds: scala.collection.Set[Int] = Set.empty
    ckpt.dir.foreach { d =>
      val want = d.stripSuffix("/")
      if (!sc.getCheckpointDir.exists(_.contains(want))) sc.setCheckpointDir(want)
    }
    /** Compose-without-materializing: for LINEAR superstep chains
      * (state referenced exactly once by the next step) skipping the
      * materialization of every odd step halves the job count — the
      * skipped step's plan is simply folded into its successor's job.
      * NOT safe for steps that reference state twice (pageRank,
      * vertexCentric): an unmaterialized state would be recomputed per
      * reference, doubling work per skipped step. Callers opt in via
      * `stride`; the final step must pass `last = true` so the loop
      * never returns a lazy plan over an unpersisted edge table. */
    def step(df: DataFrame, i: Int, stride: Int = 1,
             last: Boolean = false): DataFrame = {
      if (stride > 1 && i % stride != 0 && !last) return df
      val out = ckpt.dir match {
        case Some(_) if i % ckpt.every == 0 => df.checkpoint(eager = true)
        case _ => df.localCheckpoint(true)
      }
      // blocks this step just pinned: EXACTLY the RDD the localCheckpoint
      // wrapped into the returned plan's LogicalRDD (a reliable
      // checkpoint pins none). Diffing the whole persistent-RDD map
      // before/after the materialization is wrong here: a loop-INVARIANT
      // cache (the persisted edge table) builds+registers its buffer RDD
      // lazily inside step 1's job, would land in the diff, and get
      // unpersisted at step 2 — every later superstep then recomputes
      // the edge join, defeating the persist.
      val mine: Set[Int] = out.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      }.toSet
      // the previous step only existed to build `df`, which is now
      // materialized — its blocks are dead weight from here on
      val live = sc.getPersistentRDDs
      prevIds.foreach(id => live.get(id).foreach(_.unpersist(false)))
      prevIds = mine
      out
    }
  }

  /** Min-label propagation, `iterations` supersteps.
    * `edges` must be (src, dst); treated as directed messages — pass a
    * bidirectional edge set for undirected semantics. Self-loops are
    * added automatically so a node always keeps its own label.
    * Returns (node, label): after enough iterations label = component
    * minimum (connected components).
    */
  /** Generic synchronous vertex-centric iteration — the abstraction
    * the library algorithms below specialize (SURVEY.md §2.11; Gelly
    * `Graph.runVertexCentricIteration`,
    * `pregel/VertexCentricIteration.java:76`, and the scatter-gather
    * twin `spargel/ScatterGatherIteration.java`). Column-algebra
    * callbacks keep every superstep declarative (codegen'd, no UDFs):
    *
    *  - `vertices`: (node, value) initial state
    *  - `edges`: directed (src, dst[, edge cols]) message topology
    *  - `message`: Column over the joined row — the sender's `value`
    *    plus the edge's columns — evaluated per out-edge (Gelly's
    *    `sendMessageToAllNeighbors` with a computed payload)
    *  - `combine`: aggregate Column over `_msg` reducing a target's
    *    inbox to one value (Gelly's MessageCombiner — running it
    *    inside the shuffle as a partial aggregate is exactly the
    *    reference's combiner optimization, and Spark applies it
    *    map-side automatically)
    *  - `update`: (old value, combined inbox) → new value; the inbox
    *    is NULL when no message arrived (Gelly: compute() not called,
    *    vertex keeps its value — express as `coalesce(m, old)`)
    *
    * Per superstep: ONE shuffle (inbox reduce on dst) + a left join
    * back to state clustered on the same key; lineage truncated per
    * step via the shared materializer, reliable checkpoint every k
    * steps available — the posture that survives 100+ supersteps on a
    * 1000-executor cluster.
    */
  def vertexCentric(vertices: DataFrame, edges: DataFrame,
                    iterations: Int,
                    message: org.apache.spark.sql.Column,
                    combine: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                    update: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
                    ckpt: IterationCheckpointing = IterationCheckpointing()): DataFrame = {
    // persist a DERIVED projection — never the caller's own frame,
    // whose cache entry the final unpersist would silently drop
    // r14: cluster the static edge table on src ONCE at cache fill —
    // every superstep joins state on (node = src), and an unclustered
    // cached edge table re-enters an Exchange in EVERY superstep's
    // job (exchange reuse does not cross jobs). One shuffle up front
    // replaces one full-edge shuffle per superstep, at every scale —
    // the Pregel static-graph partitioning the reference's iteration
    // runtime also keeps.
    val e = edges.select(edges.columns.map(col).toIndexedSeq: _*)
      .repartition(col("src")).persist()
    val mat = new StepMaterializer(ckpt, vertices.sparkSession)
    var state = mat.step(vertices.select(col("node"), col("value")), 0)
    for (i <- 1 to iterations) {
      val inbox = state.join(e, state("node") === e("src"))
        .select(col("dst").as("node"), message.as("_msg"))
        .groupBy("node").agg(combine(col("_msg")).as("_m"))
      val next = state.alias("v")
        .join(inbox.alias("m"), col("v.node") === col("m.node"), "left")
        .select(col("v.node").as("node"),
          update(col("v.value"), col("_m")).as("value"))
      state = mat.step(next, i)
    }
    e.unpersist()
    state
  }

  def labelPropagation(nodes: DataFrame, edges: DataFrame, iterations: Int,
                       ckpt: IterationCheckpointing = IterationCheckpointing()): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .union(nodes.select(col("node").as("src"), col("node").as("dst")))
      .repartition(col("src")).persist() // src-clustered once — see vertexCentric
    val mat = new StepMaterializer(ckpt, nodes.sparkSession)
    var labels = mat.step(
      nodes.select(col("node"), col("node").as("label")), 0)
    for (i <- 1 to iterations) {
      // eager materialization truncates lineage — plain persist keeps
      // the ever-growing logical plan and the optimizer cost per
      // superstep grows superlinearly. Linear chain (labels referenced
      // once per step) → stride-2 materialization halves job count.
      val next = mat.step(
        labels.join(e, labels("node") === e("src"))
          .groupBy(col("dst").as("node_n"))
          .agg(min("label").as("label"))
          .withColumnRenamed("node_n", "node"), i,
        stride = 2, last = i == iterations)
      labels = next
    }
    e.unpersist()
    labels
  }

  /** Single-source shortest paths (SURVEY.md §2.11 — Gelly's
    * `library/SingleSourceShortestPaths.java`: scatter-gather min-plus
    * relaxation). `edges` is a directed (src, dst, w) list with
    * non-negative integral weights; `iterations` supersteps bound the
    * relaxed path length, exactly the Gelly iteration cap. Self-loops
    * of weight 0 are added so a settled distance persists without a
    * special case — the same trick labelPropagation uses for labels.
    * Per superstep: one shuffle on dst (min-plus aggregate), lineage
    * truncated via the shared materializer — identical scale posture
    * to the other Pregel-style loops here.
    */
  def sssp(nodes: DataFrame, edges: DataFrame, sourceId: Long,
           iterations: Int,
           ckpt: IterationCheckpointing = IterationCheckpointing()): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w"))
      .union(nodes.select(col("node").as("src"), col("node").as("dst"),
        lit(0L).as("w")))
      .repartition(col("src")).persist() // src-clustered once — see vertexCentric
    val mat = new StepMaterializer(ckpt, nodes.sparkSession)
    // only reached nodes carry a row (the frontier representation the
    // reference's scatter-gather uses); unreached nodes are absent
    var dist = mat.step(
      nodes.filter(col("node") === sourceId)
        .select(col("node"), lit(0L).as("dist")), 0)
    for (i <- 1 to iterations) {
      dist = mat.step(
        dist.join(e, dist("node") === e("src"))
          .groupBy(col("dst").as("node_n"))
          .agg(min(col("dist") + col("w")).as("dist"))
          .withColumnRenamed("node_n", "node"), i,
        stride = 2, last = i == iterations) // linear chain — see step()
    }
    e.unpersist()
    dist
  }

  /** Community-detection label propagation (SURVEY.md §2.11 — Gelly's
    * `library/LabelPropagation.java`): synchronous iterations where
    * every vertex adopts the MOST FREQUENT label among its neighbors,
    * ties broken deterministically by the smaller label (the
    * reference breaks ties the same way, which is what makes the
    * fixed-iteration result well-defined). Differs from
    * [[labelPropagation]] (min-label flooding = connected components):
    * frequency voting converges to communities, not components.
    * Per superstep: one shuffle (neighbor label counts) + a window
    * rank per node — both clustered on the node, so the rank reuses
    * the aggregation's partitioning.
    */
  def communityLabelPropagation(nodes: DataFrame, edges: DataFrame,
                                iterations: Int,
                                ckpt: IterationCheckpointing = IterationCheckpointing()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).persist() // src-clustered once — see vertexCentric
    val mat = new StepMaterializer(ckpt, nodes.sparkSession)
    var labels = mat.step(
      nodes.select(col("node"), col("node").as("label")), 0)
    for (i <- 1 to iterations) {
      val votes = labels.join(e, labels("node") === e("src"))
        .groupBy(col("dst").as("node_n"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val rank = Window.partitionBy(col("node_n"))
        .orderBy(col("cnt").desc, col("label").asc)
      labels = mat.step(
        votes.withColumn("_rn", row_number().over(rank))
          .where(col("_rn") === 1)
          .select(col("node_n").as("node"), col("label")), i,
        stride = 2, last = i == iterations) // linear chain — see step()
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
  def labelPropagationDelta(nodes: DataFrame, edges: DataFrame, maxIterations: Int,
                            ckpt: IterationCheckpointing = IterationCheckpointing(),
                            seed: Option[DataFrame] = None): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).persist() // src-clustered once — see vertexCentric
    val mat = new StepMaterializer(ckpt, nodes.sparkSession)
    // seed: carry labels from a previous converged state (the
    // streaming-iteration feedback edge) — absent, every node starts
    // as its own label
    var solution = mat.step(
      seed.getOrElse(nodes.select(col("node"), col("node").as("label"))), 0)
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
      val joined = mat.step(
        solution.join(msgs, solution("node") === col("m_node"), "left")
          .select(col("node"), col("label"), col("m_label")), i + 1)
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
  def pageRank(nodes: DataFrame, edgesIn: DataFrame, d: Double, iterations: Int,
               ckpt: IterationCheckpointing = IterationCheckpointing()): DataFrame = {
    // persist an internal PROJECTION of the input, not the input plan
    // itself: Spark's cache is keyed by plan and not ref-counted, so
    // unpersisting the caller's exact plan below would silently drop a
    // cache the caller still holds.
    val edges = edgesIn.select(col("src"), col("dst")).persist()
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
      .select(col("src"), col("dst"), col("deg"))
      .repartition(col("src")).persist() // src-clustered once — see vertexCentric
    val mat = new StepMaterializer(ckpt, nodes.sparkSession)
    var pr = mat.step(
      nodes.select(col("node"), lit(1.0 / n).as("pr")), 0)
    for (i <- 1 to iterations) {
      val contrib = pr
        .join(edgesW, pr("node") === edgesW("src"))
        .select(col("dst"), (col("pr") / col("deg")).as("c"))
        .groupBy(col("dst")).agg(sum("c").as("in_sum"))
      // eager materialization: truncate lineage every superstep (see
      // labelPropagation note).
      val next = mat.step(
        pr.select(col("node"))
          .join(contrib, pr("node") === contrib("dst"), "left")
          .select(col("node"),
            (lit((1 - d) / n) + lit(d) * coalesce(col("in_sum"), lit(0.0))).as("pr")),
        i)
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
