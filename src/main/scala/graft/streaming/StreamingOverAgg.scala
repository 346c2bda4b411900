package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class OverEmit(key: Long, id: Long, tsMicros: Long, frameSum: BigDecimal, nInFrame: Int)

/** Streaming OVER aggregation (SURVEY.md §2.5 —
  * RowTimeRowsBoundedPrecedingFunction.java semantics): per-key
  * ROWS BETWEEN k PRECEDING AND CURRENT ROW aggregate in event-time
  * order, emitted when the row's time passes the watermark.
  *
  * State is bounded: the last k matured rows (the frame tail) plus
  * the not-yet-mature buffer — watermark-driven cleanup, no unbounded
  * history. Sums are computed in BigDecimal(scale 2) so emission is
  * exact and order-independent (oracle-comparable).
  */
object StreamingOverAgg {
  case class State(history: List[(Long, Long, Double)],
                   pending: List[(Long, Long, Double)])

  def apply(spark: SparkSession, events: Dataset[GEvent], kPreceding: Int,
            watermarkDelay: String = "1 minute"): Dataset[OverEmit] = {
    import spark.implicits._
    val tagged = events
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", watermarkDelay)
      .as[GEvent]
    tagged.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[GEvent], state: GroupState[State]) =>
        val cur = state.getOption.getOrElse(State(Nil, Nil))
        var pending = cur.pending
        rows.foreach(e => pending = (e.tsMicros, e.id, e.value) :: pending)
        val wmMicros = state.getCurrentWatermarkMs() * 1000L
        val (mature, stillPending) = pending.partition(_._1 <= wmMicros)
        var history = cur.history
        val out = mature.sortBy(r => (r._1, r._2)).map { case (ts, id, v) =>
          history = ((ts, id, v) :: history).take(kPreceding + 1)
          val sum = history.map(h => BigDecimal(h._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
          OverEmit(key, id, ts, sum, history.size)
        }
        state.update(State(history, stillPending))
        if (stillPending.nonEmpty)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        out.iterator
    }
  }
}

/** UNBOUNDED PRECEDING variant (SURVEY.md §2.5 —
  * RowTimeRowsUnboundedPrecedingFunction.java semantics): per-key
  * running aggregate over ALL rows up to the current one in
  * (event-time, id) order, emitted at watermark maturity. State is a
  * single O(1) accumulator (running sum + count, BigDecimal-exact)
  * plus the not-yet-mature buffer — the smallest state footprint of
  * the over family: no frame tail is retained at all.
  */
object StreamingUnboundedOverAgg {
  case class State(sumCents: Long, n: Int, pending: List[(Long, Long, Double)])

  def apply(spark: SparkSession, events: Dataset[GEvent],
            watermarkDelay: String = "1 minute"): Dataset[OverEmit] = {
    import spark.implicits._
    val tagged = events
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", watermarkDelay)
      .as[GEvent]
    tagged.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[GEvent], state: GroupState[State]) =>
        val cur = state.getOption.getOrElse(State(0L, 0, Nil))
        var pending = cur.pending
        rows.foreach(e => pending = (e.tsMicros, e.id, e.value) :: pending)
        val wmMicros = state.getCurrentWatermarkMs() * 1000L
        val (mature, stillPending) = pending.partition(_._1 <= wmMicros)
        // exact running sum in integer cents (values are 2-dp money)
        var sumCents = cur.sumCents
        var n = cur.n
        val out = mature.sortBy(r => (r._1, r._2)).map { case (ts, id, v) =>
          sumCents += BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            .*(100).toLongExact
          n += 1
          OverEmit(key, id, ts, BigDecimal(sumCents) / 100, n)
        }
        state.update(State(sumCents, n, stillPending))
        if (stillPending.nonEmpty)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        out.iterator
    }
  }
}

/** RANGE-frame variant (RowTimeRangeBoundedPrecedingFunction.java
  * semantics): per-key sum over events in [t − range, t], emitted at
  * watermark maturity; history pruned to the range window → bounded
  * state. Same-timestamp peers are summed in (ts, id) processing
  * order — a peer with a higher id is not yet visible to a lower-id
  * row at the identical timestamp (SQL RANGE frames include all
  * peers; identical-timestamp keys don't occur in the driver data).
  */
object StreamingRangeOverAgg {
  case class State(history: List[(Long, Long, Double)],
                   pending: List[(Long, Long, Double)])

  def apply(spark: SparkSession, events: Dataset[GEvent], rangeMicros: Long,
            watermarkDelay: String = "1 minute"): Dataset[OverEmit] = {
    import spark.implicits._
    val tagged = events
      .withColumn("ts", timestamp_micros(col("tsMicros")))
      .withWatermark("ts", watermarkDelay)
      .as[GEvent]
    tagged.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: Long, rows: Iterator[GEvent], state: GroupState[State]) =>
        val cur = state.getOption.getOrElse(State(Nil, Nil))
        var pending = cur.pending
        rows.foreach(e => pending = (e.tsMicros, e.id, e.value) :: pending)
        val wmMicros = state.getCurrentWatermarkMs() * 1000L
        val (mature, stillPending) = pending.partition(_._1 <= wmMicros)
        var history = cur.history
        val out = mature.sortBy(r => (r._1, r._2)).map { case (ts, id, v) =>
          history = ((ts, id, v) :: history).filter(_._1 >= ts - rangeMicros)
          val inFrame = history.filter(h => h._1 >= ts - rangeMicros && h._1 <= ts)
          val sum = inFrame.map(h => BigDecimal(h._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
          OverEmit(key, id, ts, sum, inFrame.size)
        }
        state.update(State(history, stillPending))
        if (stillPending.nonEmpty)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        out.iterator
    }
  }
}

case class JoinEmit(key: Long, leftId: Long, rightId: Long)

/** Emitted by StreamingLeftOuterJoin: a changelog row — `+I` adds a
  * (left, right) pair or a null-padded left (rightId = -1), `-D`
  * retracts the pad when the left's first match arrives. Folding
  * additions minus retractions yields exactly the batch LEFT OUTER
  * JOIN (Changelog.fold semantics). */
case class OuterJoinEmit(key: Long, leftId: Long, rightId: Long,
                         _change_kind: String)

/** Unbounded stream-stream LEFT OUTER equi-join (SURVEY.md §2.3 —
  * the reference's StreamingJoinOperator.java outer mode: the left
  * row is emitted null-padded while unmatched, and the pad is
  * RETRACTED when its first match arrives). Spark has no per-row
  * RowKind, so the retraction rides the `_change_kind` column
  * convention; the changelog's fold is arrival-order invariant —
  * additions are the per-key cross product and every pad of a
  * matched left is retracted exactly once — so the folded result
  * equals the batch left outer join regardless of batching.
  *
  * State mirrors StreamingSymmetricJoin (both sides buffered per
  * key; `idleRetentionMicros` evicts rows older than the key's max
  * event time minus retention — evicted unmatched lefts keep their
  * pad, the reference's idle-state-retention trade).
  */
object StreamingLeftOuterJoin {
  case class State(lefts: List[(Long, Long, Boolean)],
                   rights: List[(Long, Long)])

  /** `updateBefore = true` switches the pad replacement to the
    * reference's RETRACT mode (StreamingJoinOperator.java:277 emits
    * UPDATE_BEFORE/UPDATE_AFTER): the first match of a previously
    * null-padded left emits `-U (left, null)` then `+U (left, right)`
    * — an exact retraction pair for consumers that need RowKind
    * parity — while genuinely new pairs stay `+I`. The default keeps
    * the upsert-style `-D` pad delete. Folds are identical either
    * way: net (+I/+U) minus (-U/-D) per (key, leftId, rightId). */
  def apply(spark: SparkSession, left: Dataset[GEvent], right: Dataset[GEvent],
            idleRetentionMicros: Long = Long.MaxValue,
            updateBefore: Boolean = false): Dataset[OuterJoinEmit] = {
    import spark.implicits._
    val tagged = left.map(_.copy(kind = "L")).union(right.map(_.copy(kind = "R")))
    tagged.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (key: Long, rows: Iterator[GEvent], state: GroupState[State]) =>
        var st = state.getOption.getOrElse(State(Nil, Nil))
        val out = scala.collection.mutable.ListBuffer.empty[OuterJoinEmit]
        var maxTs = (st.lefts.map(_._1) ++ st.rights.map(_._1))
          .foldLeft(Long.MinValue)(_ max _)
        rows.toSeq.sortBy(e => (e.tsMicros, e.id)).foreach { e =>
          maxTs = maxTs max e.tsMicros
          if (e.kind == "L") {
            if (st.rights.isEmpty) {
              out += OuterJoinEmit(key, e.id, -1L, "+I") // null-padded
              st = st.copy(lefts = (e.tsMicros, e.id, false) :: st.lefts)
            } else {
              st.rights.foreach { case (_, r) =>
                out += OuterJoinEmit(key, e.id, r, "+I") }
              st = st.copy(lefts = (e.tsMicros, e.id, true) :: st.lefts)
            }
          } else {
            // first match of a previously-unmatched left retracts its
            // pad: -D/+I upsert-style, or the -U/+U retract pair
            st.lefts.foreach { case (_, l, matched) =>
              if (!matched) {
                out += OuterJoinEmit(key, l, -1L, if (updateBefore) "-U" else "-D")
                out += OuterJoinEmit(key, l, e.id, if (updateBefore) "+U" else "+I")
              } else out += OuterJoinEmit(key, l, e.id, "+I")
            }
            st = st.copy(
              lefts = st.lefts.map { case (ts, l, _) => (ts, l, true) },
              rights = (e.tsMicros, e.id) :: st.rights)
          }
        }
        if (idleRetentionMicros != Long.MaxValue) {
          val floor = maxTs - idleRetentionMicros
          st = State(st.lefts.filter(_._1 >= floor),
            st.rights.filter(_._1 >= floor))
        }
        if (st.lefts.isEmpty && st.rights.isEmpty) {
          if (state.exists) state.remove()
        } else state.update(st)
        out.iterator
    }
  }
}

/** Unbounded stream-stream FULL OUTER equi-join — the reference's
  * StreamingJoinOperator full-outer mode: BOTH sides emit null-padded
  * while unmatched (pad ids = -1), and each side's pad is retracted
  * when its first opposite-side row arrives. RIGHT OUTER is this
  * operator with the sides swapped (exactly how the reference plans
  * it). The fold (+I net of -D per pair) is arrival-order invariant
  * and equals the batch FULL OUTER JOIN.
  *
  * `idleRetentionMicros` is the reference's IDLE_STATE_RETENTION
  * trade, parity with the LEFT OUTER sibling: rows older than the
  * key's max event time minus the retention are evicted after each
  * batch (evicted unmatched rows keep their pad), so both buffers are
  * bounded by the retention span instead of growing with the stream.
  */
object StreamingFullOuterJoin {
  case class State(lefts: List[(Long, Long, Boolean)],
                   rights: List[(Long, Long, Boolean)])

  def apply(spark: SparkSession, left: Dataset[GEvent],
            right: Dataset[GEvent],
            idleRetentionMicros: Long = Long.MaxValue): Dataset[OuterJoinEmit] = {
    import spark.implicits._
    val tagged = left.map(_.copy(kind = "L")).union(right.map(_.copy(kind = "R")))
    tagged.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (key: Long, rows: Iterator[GEvent], state: GroupState[State]) =>
        var st = state.getOption.getOrElse(State(Nil, Nil))
        val out = scala.collection.mutable.ListBuffer.empty[OuterJoinEmit]
        var maxTs = (st.lefts.map(_._1) ++ st.rights.map(_._1))
          .foldLeft(Long.MinValue)(_ max _)
        rows.toSeq.sortBy(e => (e.tsMicros, e.id)).foreach { e =>
          maxTs = maxTs max e.tsMicros
          if (e.kind == "L") {
            if (st.rights.isEmpty) {
              out += OuterJoinEmit(key, e.id, -1L, "+I")
              st = st.copy(lefts = (e.tsMicros, e.id, false) :: st.lefts)
            } else {
              st.rights.foreach { case (_, r, matched) =>
                if (!matched) out += OuterJoinEmit(key, -1L, r, "-D")
                out += OuterJoinEmit(key, e.id, r, "+I")
              }
              st = State((e.tsMicros, e.id, true) :: st.lefts,
                st.rights.map { case (ts, r, _) => (ts, r, true) })
            }
          } else {
            if (st.lefts.isEmpty) {
              out += OuterJoinEmit(key, -1L, e.id, "+I")
              st = st.copy(rights = (e.tsMicros, e.id, false) :: st.rights)
            } else {
              st.lefts.foreach { case (_, l, matched) =>
                if (!matched) out += OuterJoinEmit(key, l, -1L, "-D")
                out += OuterJoinEmit(key, l, e.id, "+I")
              }
              st = State(st.lefts.map { case (ts, l, _) => (ts, l, true) },
                (e.tsMicros, e.id, true) :: st.rights)
            }
          }
        }
        if (idleRetentionMicros != Long.MaxValue) {
          val floor = maxTs - idleRetentionMicros
          st = State(st.lefts.filter(_._1 >= floor),
            st.rights.filter(_._1 >= floor))
        }
        if (st.lefts.isEmpty && st.rights.isEmpty) {
          if (state.exists) state.remove()
        } else state.update(st)
        out.iterator
    }
  }
}

/** Unbounded stream-stream equi-join (SURVEY.md §2.3 —
  * StreamingJoinOperator.java:36 semantics, inner variant): symmetric
  * hash in keyed state. Each arriving row joins the full buffered
  * opposite side and is then buffered itself — no watermark bound on
  * matching (that is the point: Spark's native stream-stream join
  * requires a time bound; the reference's does not).
  *
  * State grows with the inputs; production deployments bound it with
  * idle-state retention (the reference's
  * ExecutionConfigOptions#IDLE_STATE_RETENTION) — a TTL sweep on
  * tsMicros can be added to the state update without changing the
  * emission logic.
  */
object StreamingSymmetricJoin {
  case class State(lefts: List[(Long, Long)], rights: List[(Long, Long)])

  /** idleRetentionMicros: rows older than (max event time seen in the
    * key's state − retention) are evicted before matching — the
    * reference's IDLE_STATE_RETENTION knob; Long.MaxValue = keep all. */
  def apply(spark: SparkSession, left: Dataset[GEvent], right: Dataset[GEvent],
            idleRetentionMicros: Long = Long.MaxValue): Dataset[JoinEmit] = {
    import spark.implicits._
    val tagged = left.map(_.copy(kind = "L")).union(right.map(_.copy(kind = "R")))
    tagged.groupByKey(_.key).flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (key: Long, rows: Iterator[GEvent], state: GroupState[State]) =>
        var st = state.getOption.getOrElse(State(Nil, Nil))
        val out = scala.collection.mutable.ListBuffer.empty[JoinEmit]
        var maxTs = (st.lefts ++ st.rights).map(_._1).foldLeft(Long.MinValue)(_ max _)
        // process in deterministic order within the batch
        rows.toSeq.sortBy(e => (e.tsMicros, e.id)).foreach { e =>
          maxTs = maxTs max e.tsMicros
          val floor = if (idleRetentionMicros == Long.MaxValue) Long.MinValue
                      else maxTs - idleRetentionMicros
          if (e.kind == "L") {
            st.rights.foreach { case (ts, r) =>
              if (ts >= floor) out += JoinEmit(key, e.id, r) }
            st = st.copy(lefts = (e.tsMicros, e.id) :: st.lefts)
          } else {
            st.lefts.foreach { case (ts, l) =>
              if (ts >= floor) out += JoinEmit(key, l, e.id) }
            st = st.copy(rights = (e.tsMicros, e.id) :: st.rights)
          }
        }
        // evict dead state so it stays bounded under retention
        if (idleRetentionMicros != Long.MaxValue) {
          val floor = maxTs - idleRetentionMicros
          st = State(st.lefts.filter(_._1 >= floor), st.rights.filter(_._1 >= floor))
        }
        state.update(st)
        out.iterator
    }
  }
}
