package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming COUNT windows (SURVEY.md §2.4 — the reference's
  * `KeyedStream.countWindow(n)`, flink-streaming-java/.../datastream/
  * KeyedStream.java, firing via api/windowing/triggers/CountTrigger
  * .java: tumbling blocks of N elements per key, a window emitted the
  * moment its N-th element arrives).
  *
  * The reference's blocks form in ARRIVAL order — non-deterministic
  * under replay. This engine's twin (like the batch analog `gw4`)
  * forms blocks in (ts, id) order and emits a block when it is BOTH
  * complete (N events) and MATURE: every member has ts strictly below
  * the watermark, so no event that could still arrive can precede any
  * member and change block membership — emitted blocks equal the
  * batch row_number computation over the complete input, independent
  * of micro-batching (the determinism contract every streaming
  * operator here carries).
  *
  * State per key: the events not yet part of an emitted block — at
  * most N−1 mature events plus the immature suffix (bounded by N +
  * one watermark-delay of traffic) — plus the emitted-block counter.
  * An event-time timer fires at the N-th buffered event's maturity so
  * a quiet key still flushes its completed blocks.
  */
object StreamingCountWindow {

  /** (tsMicros, id, value) triples not yet emitted; `emitted` = blocks
    * already emitted (the next block's wid). */
  case class CWState(evs: List[(Long, Long, Double)], emitted: Long)

  /** One emitted block — the batch `gw4` output shape: per-element
    * DECIMAL(18,2) rounding before the exact sum, so the total matches
    * the oracle's CAST(value AS DECIMAL(18,2)) aggregation bit-for-bit
    * regardless of fold order. */
  case class CWEmit(key: Long, wid: Long, n: Long,
                    firstTsMicros: Long, lastTsMicros: Long, total: Double)

  def apply(spark: SparkSession, events: Dataset[GEvent], n: Int,
            watermarkDelay: String = "1 minute"): Dataset[CWEmit] = {
    import spark.implicits._
    require(n > 0, s"countWindow size must be positive: $n")
    val ds = events.toDF()
      .withColumn("_et", timestamp_micros(col("tsMicros")))
      .withWatermark("_et", watermarkDelay)
      .select(col("key").cast("long"), col("tsMicros").cast("long"),
        col("id").cast("long"), col("value").cast("double"), col("_et"))
      .as[(Long, Long, Long, Double, java.sql.Timestamp)]

    ds.groupByKey(_._1).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long,
       rows: Iterator[(Long, Long, Long, Double, java.sql.Timestamp)],
       state: GroupState[CWState]) =>
        val cur = state.getOption.getOrElse(CWState(Nil, 0L))
        val buffered = rows.foldLeft(cur.evs) {
          case (acc, (_, ts, id, v, _)) => (ts, id, v) :: acc
        }
        val wm = state.getCurrentWatermarkMs() * 1000L
        // (ts, id) order = the batch row_number order; strict maturity
        // (ts < wm): an event AT the watermark could still gain an
        // equal-timestamp sibling ordered before it by id
        val sorted = buffered.sortBy(e => (e._1, e._2))
        val out = Seq.newBuilder[CWEmit]
        var emitted = cur.emitted
        var rest = sorted
        while (rest.lengthCompare(n) >= 0 && rest(n - 1)._1 < wm) {
          val (block, tail) = rest.splitAt(n)
          val total = block.iterator
            .map(e => BigDecimal(e._3)
              .setScale(2, BigDecimal.RoundingMode.HALF_UP))
            .sum
          out += CWEmit(key, emitted, n.toLong,
            block.head._1, block.last._1, total.toDouble)
          emitted += 1
          rest = tail
        }
        if (rest.isEmpty && emitted == 0L) {
          if (state.exists) state.remove()
        } else {
          // `emitted` must survive even with an empty buffer — block
          // numbering continues across quiet spells (the reference's
          // per-key window counter lives in keyed state the same way)
          state.update(CWState(rest, emitted))
          if (rest.lengthCompare(n) >= 0) {
            // a complete-but-immature block: flush when its N-th
            // event matures even if the key goes quiet
            val deadlineMs = rest(n - 1)._1 / 1000L + 1
            state.setTimeoutTimestamp(
              deadlineMs max (state.getCurrentWatermarkMs() + 1))
          }
        }
        out.result().iterator
    }
  }
}
