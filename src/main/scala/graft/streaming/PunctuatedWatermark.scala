package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Punctuated watermark assignment (SURVEY.md §2.9 — the reference's
  * `WatermarkStrategy` punctuated path: `WatermarkGenerator.onEvent`
  * emits a watermark the moment a MARKER EVENT is seen, independent
  * of any bounded-delay heuristic; flink-core/.../eventtime/
  * WatermarkGenerator.java). Spark's `withWatermark` is bounded
  * out-of-orderness only — the max event time drives the watermark,
  * which is exactly what punctuation must NOT do (a data row beyond
  * the last marker may not advance time).
  *
  * The honest Spark analog, since the watermark is a control signal
  * the engine owns: track the punctuated watermark OUTSIDE Spark's
  * mechanism, per micro-batch — the same quantization the reference's
  * MiniBatchAssigner applies to watermarks inside a mini-batch. Per
  * batch: the watermark advances to the max marker timestamp seen (a
  * tiny aggregate of the batch's marker rows — the only driver-side
  * value, a scalar, exactly the control-plane role a watermark has);
  * data rows mature against it. Rows older than the advanced
  * watermark on arrival are late and dropped, matching the
  * reference's late-record rule under a punctuated generator.
  *
  * [[PunctuatedDedupKeepFirst]] runs event-time keep-first dedup
  * under this regime: a group's earliest row is emitted exactly once,
  * when a MARKER (not data volume) matures it — data rows far beyond
  * the pending candidate do NOT trigger emission, and a marker-less
  * stream emits nothing (the punctuated contract; also the spec's
  * negative case). State is carried across batches as
  * localCheckpoint-ed frames (candidate + tombstone per group —
  * bounded by group count, the same bound as the keyed operator);
  * per-batch shuffle is ∝ batch + pending candidates, never history.
  *
  * Emissions go to `emit` as a DISTRIBUTED frame of the batch's
  * matured rows (key, tsMicros, id, value) — a sink write, never a
  * driver materialization: nothing in the operator collects, so it
  * holds at any scale. `emit` must consume its frame within the call
  * (the underlying checkpoint blocks are recycled on the next batch)
  * — true of every real sink; [[PunctuatedDedupKeepFirst.CollectingSink]]
  * is the bounded driver-side convenience for specs and interactive
  * inspection.
  */
class PunctuatedDedupKeepFirst(markerKind: String = "WM",
                               emit: DataFrame => Unit) {
  @volatile private var wm: Long = Long.MinValue
  private var pending: Option[DataFrame] = None   // (key, ts, id, value)
  private var emittedKeys: Option[DataFrame] = None // (key) tombstones

  /** Current punctuated watermark (micros); MinValue until the first
    * marker arrives. */
  def currentWatermark: Long = wm

  def step(batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    // 1. late rule FIRST, against the watermark as it stood BEFORE
    //    this batch: a marker only governs rows that arrive after it,
    //    so a data row followed by a marker IN THE SAME micro-batch is
    //    on-time (the reference's generator sees the row before the
    //    marker's onEvent fires). Filtering against the advanced
    //    watermark would make results depend on batch boundaries.
    val prevWm = wm
    // 2. punctuation: only MARKER rows advance time
    val markerMax = batch.filter(col("kind") === markerKind)
      .agg(max("tsMicros")).head()
    if (!markerMax.isNullAt(0)) wm = wm max markerMax.getLong(0)
    val curWm = wm
    val fresh = batch.filter(col("kind") =!= markerKind)
      .filter(col("tsMicros") >= prevWm)
      .select(col("key"), col("tsMicros").as("ts"), col("id"), col("value"))
    // 3. merge with pending candidates, keep the (ts, id)-minimal row
    //    per key, suppress already-emitted groups; snapshot ONCE —
    //    the matured filter and the pending carry both read the
    //    checkpointed blocks instead of re-running the merge pipeline
    val merged = pending.fold(fresh)(fresh.union)
      .groupBy("key")
      .agg(min(struct(col("ts"), col("id"), col("value"))).as("c"))
      .select(col("key"), col("c.ts"), col("c.id"), col("c.value"))
    val live = emittedKeys.fold(merged)(t =>
        merged.join(t, Seq("key"), "left_anti"))
      .localCheckpoint(true)
    // 4. maturity against the ADVANCED punctuated watermark: the
    //    matured slice goes to the SINK as a distributed frame (both
    //    filters below read the same checkpointed blocks)
    val matured = live.filter(col("ts") <= curWm)
    emit(matured.select(col("key"), col("ts").as("tsMicros"),
      col("id"), col("value")))
    // tombstones: distributed union of the matured keys; the eager
    // checkpoint collapses the lineage each batch so the union chain
    // never grows (an empty matured slice unions zero rows)
    val prevTombIds = rddIds(emittedKeys)
    emittedKeys = Some(emittedKeys.fold(matured.select("key"))(
      _.union(matured.select("key"))).localCheckpoint(true))
    // the superseded snapshots' blocks are dead weight once the new
    // checkpoints are materialized (GraphOps uses the same in-loop
    // release)
    val prevIds = rddIds(pending)
    pending = Some(live.filter(col("ts") > curWm))
    val liveRdds = spark.sparkContext.getPersistentRDDs
    (prevIds ++ prevTombIds).foreach(id =>
      liveRdds.get(id).foreach(_.unpersist(false)))
  }

  private def rddIds(df: Option[DataFrame]): Set[Int] =
    df.toSeq.flatMap(_.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }).toSet

  def sink: (DataFrame, Long) => Unit = (b: DataFrame, _: Long) => step(b)
}

object PunctuatedDedupKeepFirst {
  /** Driver-side collecting sink — BOUNDED BY WHAT IT COLLECTS, for
    * specs and interactive inspection only; library use hands the
    * operator a real sink (parquet append, upsert sink, …). */
  final class CollectingSink {
    private val buf = Seq.newBuilder[(Long, Long, Long, Double)]
    def emit(df: DataFrame): Unit = buf ++= df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    /** Rows emitted so far: (key, tsMicros, id, value). */
    def results: Seq[(Long, Long, Long, Double)] = buf.result()
  }
}
