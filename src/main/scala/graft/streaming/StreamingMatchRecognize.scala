package graft.streaming

import graft.operators.{MatchRecognize, PatternNFA}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING MATCH_RECOGNIZE for arbitrary patterns (SURVEY.md §2.9 —
  * the reference's StreamExecMatch.scala:68 runs its NFA per key on an
  * unbounded stream; this is the Spark analog over
  * `flatMapGroupsWithState`). The batch facade compiles the clause;
  * this operator runs the SAME NFA incrementally:
  *
  *  - DEFINE predicates are pre-evaluated map-side into a bitmask
  *    column (identical to the batch path) so keyed state buffers only
  *    (tsMicros, id, satMask) triples — no strings, no event payloads.
  *  - A match is emitted exactly when its anchor MATURES: anchor.ts +
  *    within <= watermark, i.e. every event its window could bind is
  *    final. Emitted matches therefore equal the batch scan over the
  *    complete input, independent of how events were batched.
  *  - State is bounded by the window: an event is evicted at the same
  *    bound that matures it as an anchor (ts + within <= watermark),
  *    so each anchor is offered exactly once, and per-key state holds
  *    at most one `within` of events. An event-time timer fires at the
  *    earliest buffered event's deadline so quiet keys still flush and
  *    release state (idle-state hygiene).
  *  - AFTER MATCH SKIP PAST LAST ROW carries its high-water mark in
  *    state across micro-batches.
  *
  * MEASURES is a batch-side feature (the reference restricts streaming
  * MATCH_RECOGNIZE similarly); clauses with MEASURES are rejected here.
  */
object StreamingMatchRecognize {

  case class MRState(evs: List[(Long, Long, Long)],
                     markTs: Long, markId: Long, hasMark: Boolean)

  /** events: (key, tsMicros, id, kind, ...) — extra columns visible to
    * DEFINE predicates, exactly like the batch facade. Output rows are
    * the batch [[PatternNFA.PMatch]] shape. */
  def apply(spark: SparkSession, events: DataFrame, clause: String,
            watermarkDelay: String = "10 minutes"): Dataset[PatternNFA.PMatch] = {
    import spark.implicits._
    val c = MatchRecognize.compile(clause)
    require(c.measures.isEmpty,
      "MEASURES is batch-only (the reference restricts streaming MATCH_RECOGNIZE too)")
    val preds = c.defines.map { case (n, body) => n -> expr(body) }
    require(preds.size <= 64, "at most 64 pattern variables")
    val varNames = preds.map(_._1)
    val satCol = preds.zipWithIndex.map { case ((_, p), i) =>
      when(p, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val within = c.withinMicros
    val steps = c.steps
    val afterMatch = c.afterMatch

    // the watermark column must survive the projection — event-time
    // timeout requires the watermark node in the grouped plan
    val ds = events
      .withColumn("_et", timestamp_micros(col("tsMicros")))
      .withWatermark("_et", watermarkDelay)
      .select(col("key").cast("long"), col("tsMicros").cast("long"),
        col("id").cast("long"), satCol.cast("long").as("_sat"), col("_et"))
      .as[(Long, Long, Long, Long, java.sql.Timestamp)]

    ds.groupByKey(_._1).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[(Long, Long, Long, Long, java.sql.Timestamp)],
       state: GroupState[MRState]) =>
        val cur = state.getOption.getOrElse(MRState(Nil, 0L, 0L, hasMark = false))
        val buffered = rows.foldLeft(cur.evs) { case (acc, (_, ts, id, sat, _)) =>
          (ts, id, sat) :: acc
        }
        val wm = state.getCurrentWatermarkMs() * 1000L
        val mark0 = if (cur.hasMark) Some((cur.markTs, cur.markId)) else None
        val (matches, mark) = PatternNFA.matchesMature(
          key, buffered, steps, varNames, within, afterMatch, wm, mark0)
        // eviction bound == maturity bound: kept events are exactly the
        // not-yet-mature suffix of the buffer
        val kept = buffered.filter { case (ts, _, _) => ts + within > wm }
        if (kept.isEmpty) {
          if (state.exists) state.remove()
        } else {
          state.update(MRState(kept,
            mark.map(_._1).getOrElse(0L), mark.map(_._2).getOrElse(0L),
            mark.isDefined))
          // flush-on-silence: fire when the earliest buffered event's
          // window closes even if the key never sees traffic again
          val nextDeadlineMs = (kept.map(_._1).min + within) / 1000L + 1
          state.setTimeoutTimestamp(
            nextDeadlineMs max (state.getCurrentWatermarkMs() + 1))
        }
        matches.iterator
    }
  }
}
