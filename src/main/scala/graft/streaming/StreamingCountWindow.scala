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
    * already emitted (the next block's wid). `idleSinceMicros` tracks
    * when the buffer drained (for the optional residual-state
    * retention). */
  case class CWState(evs: List[(Long, Long, Double)], emitted: Long,
                     idleSinceMicros: Long = 0L)

  /** One emitted block — the batch `gw4` output shape: per-element
    * DECIMAL(18,2) rounding before the exact sum, so the total matches
    * the oracle's CAST(value AS DECIMAL(18,2)) aggregation bit-for-bit
    * regardless of fold order. */
  case class CWEmit(key: Long, wid: Long, n: Long,
                    firstTsMicros: Long, lastTsMicros: Long, total: Double)

  /** `idleRetentionMicros`: once a key's buffer drains, the only
    * state left is the block counter — without an eviction path that
    * residue grows with the number of distinct keys ever windowed.
    * With retention set, the residue is evicted after the key stays
    * idle for the given event-time span; a block formed AFTER
    * eviction restarts wid at 0 for that key (the reference's
    * idle-state-retention trade, exactly as the MATCH_RECOGNIZE
    * measures door documents it). None (default) keeps strict wid
    * continuity at the cost of per-windowed-key residual state. */
  def apply(spark: SparkSession, events: Dataset[GEvent], n: Int,
            watermarkDelay: String = "1 minute",
            idleRetentionMicros: Option[Long] = None): Dataset[CWEmit] = {
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
        var newRows = 0
        val buffered = rows.foldLeft(cur.evs) {
          case (acc, (_, ts, id, v, _)) => newRows += 1; (ts, id, v) :: acc
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
        } else if (rest.isEmpty) {
          // residual state: only the block counter survives — wid
          // numbering continues across quiet spells (the reference's
          // per-key window counter lives in keyed state the same way)
          idleRetentionMicros match {
            case None =>
              state.update(CWState(Nil, emitted, 0L))
            case Some(ret) =>
              // the clock starts AT the last activity (max 1 keeps the
              // stored value distinguishable from the fresh-state 0
              // even on a first batch whose watermark is still 0)
              val active = newRows > 0 || emitted != cur.emitted ||
                cur.evs.nonEmpty
              val idleSince =
                if (active || cur.idleSinceMicros == 0L) wm max 1L
                else cur.idleSinceMicros
              if (!active && cur.idleSinceMicros != 0L &&
                  wm >= idleSince + ret) {
                // retention elapsed: evict — wid restarts at 0 if the
                // key ever fills a block again (the documented delta)
                state.remove()
              } else {
                state.update(CWState(Nil, emitted, idleSince))
                state.setTimeoutTimestamp(((idleSince + ret) / 1000L + 1)
                  max (state.getCurrentWatermarkMs() + 1))
              }
          }
        } else if (rest.lengthCompare(n) >= 0) {
          state.update(CWState(rest, emitted, 0L))
          // a complete-but-immature block: flush when its N-th
          // event matures even if the key goes quiet
          val deadlineMs = rest(n - 1)._1 / 1000L + 1
          state.setTimeoutTimestamp(
            deadlineMs max (state.getCurrentWatermarkMs() + 1))
        } else {
          // an INCOMPLETE leftover can only grow with new data — with
          // retention set it must still expire, or a long tail of
          // never-filling keys grows state without bound (review r10;
          // eviction DROPS the partial block, the same data-loss trade
          // as the reference's state TTL)
          idleRetentionMicros match {
            case None => state.update(CWState(rest, emitted, 0L))
            case Some(ret) =>
              val active = newRows > 0 || emitted != cur.emitted
              val idleSince =
                if (active || cur.idleSinceMicros == 0L) wm max 1L
                else cur.idleSinceMicros
              if (!active && cur.idleSinceMicros != 0L &&
                  wm >= idleSince + ret) state.remove()
              else {
                state.update(CWState(rest, emitted, idleSince))
                state.setTimeoutTimestamp(((idleSince + ret) / 1000L + 1)
                  max (state.getCurrentWatermarkMs() + 1))
              }
          }
        }
        out.result().iterator
    }
  }

  /** SLIDING count-window state: events not yet evicted, the count of
    * front-evicted events (their ranks are final), and the next window
    * END rank to emit. */
  case class CWSState(evs: List[(Long, Long, Double)], evicted: Long,
                      nextEnd: Long, idleSinceMicros: Long = 0L)

  /** Sliding COUNT window — the reference's `countWindow(size, slide)`
    * (KeyedStream.java; CountTrigger(slide) + CountEvictor(size): fire
    * every `slide` elements with the last `size`). Deterministic twin
    * of the batch `gw9`: window `wid` covers ranks
    * [wid·slide+1, wid·slide+size] in (ts, id) order, COMPLETE windows
    * only, emitted when the window's last element is strictly below
    * the watermark. Ranks are only final for MATURE elements (a
    * not-yet-mature element's position can still shift), so eviction
    * drops exactly the mature prefix no future window covers — state
    * per key is ≤ size−1 retained mature elements (+ ≤ slide gap
    * elements when slide > size) plus the immature suffix. */
  def sliding(spark: SparkSession, events: Dataset[GEvent], size: Int,
              slide: Int, watermarkDelay: String = "1 minute",
              idleRetentionMicros: Option[Long] = None)
      : Dataset[CWEmit] = {
    import spark.implicits._
    require(size > 0 && slide > 0,
      s"countWindow(size, slide) must be positive: ($size, $slide)")
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
       state: GroupState[CWSState]) =>
        val cur = state.getOption.getOrElse(CWSState(Nil, 0L, size.toLong))
        var newRows = 0
        val buffered = rows.foldLeft(cur.evs) {
          case (acc, (_, ts, id, v, _)) => newRows += 1; (ts, id, v) :: acc
        }
        val wm = state.getCurrentWatermarkMs() * 1000L
        val sorted = buffered.sortBy(e => (e._1, e._2)).toVector
        val evicted = cur.evicted
        var nextEnd = cur.nextEnd
        val out = Seq.newBuilder[CWEmit]
        // rank r sits at sorted index r - evicted - 1
        def idxOf(rank: Long): Int = (rank - evicted - 1).toInt
        while (idxOf(nextEnd) < sorted.length && idxOf(nextEnd) >= 0 &&
            sorted(idxOf(nextEnd))._1 < wm) {
          val endIdx = idxOf(nextEnd)
          val startIdx = idxOf(nextEnd - size + 1)
          // eviction keeps every rank a future window covers, so the
          // window's start is always still buffered
          require(startIdx >= 0,
            s"sliding count window invariant: evicted rank ${nextEnd - size + 1}")
          val block = sorted.slice(startIdx, endIdx + 1)
          val total = block.iterator
            .map(e => BigDecimal(e._3)
              .setScale(2, BigDecimal.RoundingMode.HALF_UP))
            .sum
          out += CWEmit(key, (nextEnd - size) / slide, size.toLong,
            block.head._1, block.last._1, total.toDouble)
          nextEnd += slide
        }
        // evict the mature prefix below the next window's first rank
        val maturePrefix = sorted.segmentLength(_._1 < wm)
        val evictN = math.min(
          math.max(0L, nextEnd - size + 1 - evicted - 1),
          maturePrefix.toLong).toInt
        val rest = sorted.drop(evictN)
        if (rest.isEmpty && nextEnd == size.toLong) {
          if (state.exists) state.remove()
        } else if (rest.isEmpty) {
          // residual: only the rank/window counters — same optional
          // idle-retention trade as the tumbling path
          idleRetentionMicros match {
            case None =>
              state.update(CWSState(Nil, evicted + evictN, nextEnd, 0L))
            case Some(ret) =>
              val active = newRows > 0 || nextEnd != cur.nextEnd ||
                cur.evs.nonEmpty
              val idleSince =
                if (active || cur.idleSinceMicros == 0L) wm max 1L
                else cur.idleSinceMicros
              if (!active && cur.idleSinceMicros != 0L &&
                  wm >= idleSince + ret) {
                state.remove()
              } else {
                state.update(CWSState(Nil, evicted + evictN, nextEnd,
                  idleSince))
                state.setTimeoutTimestamp(((idleSince + ret) / 1000L + 1)
                  max (state.getCurrentWatermarkMs() + 1))
              }
          }
        } else {
          // flush when the pending window's end element matures
          val endIdx = (nextEnd - (evicted + evictN) - 1).toInt
          if (endIdx >= 0 && endIdx < rest.length) {
            state.update(CWSState(rest.toList, evicted + evictN, nextEnd, 0L))
            state.setTimeoutTimestamp((rest(endIdx)._1 / 1000L + 1)
              max (state.getCurrentWatermarkMs() + 1))
          } else idleRetentionMicros match {
            // the buffer cannot complete the pending window without
            // new data — same retention rule as the tumbling path
            // (review r10)
            case None =>
              state.update(CWSState(rest.toList, evicted + evictN, nextEnd, 0L))
            case Some(ret) =>
              val active = newRows > 0 || nextEnd != cur.nextEnd
              val idleSince =
                if (active || cur.idleSinceMicros == 0L) wm max 1L
                else cur.idleSinceMicros
              if (!active && cur.idleSinceMicros != 0L &&
                  wm >= idleSince + ret) state.remove()
              else {
                state.update(CWSState(rest.toList, evicted + evictN,
                  nextEnd, idleSince))
                state.setTimeoutTimestamp(((idleSince + ret) / 1000L + 1)
                  max (state.getCurrentWatermarkMs() + 1))
              }
          }
        }
        out.result().iterator
    }
  }
}
