package graft.streaming

import graft.operators.GraphOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming iteration (SURVEY.md §2.9 — the reference's
  * `DataStream.iterate()` / IterativeStream feedback loop,
  * flink-streaming-java/.../datastream/IterativeStream.java): Spark's
  * micro-batch DAG cannot contain a cycle, so the feedback edge is
  * re-expressed as the two things a Flink iteration actually does —
  *
  *  1. iterate to a FIXPOINT within each micro-batch (the feedback
  *     loop's in-flight circulation: here, a delta-iteration label
  *     propagation run inside `foreachBatch`);
  *  2. carry the converged state ACROSS batches (the loop's persistent
  *     progress: the labels of batch n seed batch n+1, so incremental
  *     input re-converges from the previous fixpoint instead of from
  *     scratch).
  *
  * This is the same determinization the reference's own users apply
  * when an IterativeStream job migrates to table-land (iterations are
  * absent from the reference's SQL/Table API for the same no-cycles
  * reason). Demonstrated as incremental connected components over an
  * edge stream — the canonical IterativeStream example.
  */
class StreamingGraphCC(maxIterationsPerBatch: Int = 10) {
  private var labels: Option[DataFrame] = None
  private var allEdges: Option[DataFrame] = None

  /** One feedback-loop turn: fold the batch's edges into the
    * accumulated graph and re-converge labels from the previous
    * fixpoint. Edges are treated as undirected. */
  def step(batch: DataFrame): Unit = {
    val fresh = batch.select(col("src"), col("dst")).distinct()
    // iteration state with truncated lineage, like GraphOps supersteps
    val acc = allEdges match {
      case Some(prev) => prev.union(fresh).distinct().localCheckpoint(true)
      case None       => fresh.localCheckpoint(true)
    }
    allEdges = Some(acc)
    val bidir = acc.union(acc.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = acc.select(col("src").as("node"))
      .union(acc.select(col("dst"))).distinct()
    // feedback edge: previous converged labels seed this batch; nodes
    // first seen here start as their own label
    val seed = labels.map { prev =>
      nodes.join(prev, Seq("node"), "left")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"))
    }
    labels = Some(GraphOps.labelPropagationDelta(
      nodes, bidir, maxIterationsPerBatch, seed = seed))
  }

  /** foreachBatch adapter. */
  def sink: (DataFrame, Long) => Unit = (b: DataFrame, _: Long) => step(b)

  /** Converged (node, label) state of the last completed turn. */
  def currentLabels(spark: SparkSession): DataFrame =
    labels.getOrElse(spark.range(0)
      .select(col("id").as("node"), col("id").as("label")).limit(0))
}

object StreamingGraphCC {
  /** Drain a bounded edge stream through the iteration and return the
    * converged labels. */
  def run(spark: SparkSession, edgeStream: DataFrame,
          maxIterationsPerBatch: Int = 10): DataFrame = {
    val cc = new StreamingGraphCC(maxIterationsPerBatch)
    val q = edgeStream.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(cc.sink)
      .start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    cc.currentLabels(spark)
  }
}
