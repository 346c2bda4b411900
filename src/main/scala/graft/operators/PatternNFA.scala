package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CEP pattern matching with the full quantifier algebra (SURVEY.md
  * §2.9 — flink-cep Pattern algebra: Pattern.java:155-477
  * where/times/timesOrMore/oneOrMore/optional/until/consecutive/
  * allowCombinations/notFollowedBy, NFA skip strategies in
  * AfterMatchSkipStrategy.java).
  *
  * Determinism convention (kept so every query stays oracle-checkable):
  * matches are selected EARLIEST-FIRST — each step binds the earliest
  * eligible event (by (ts, id) order) such that the REMAINDER of the
  * pattern can still complete (regex-style backtracking for Optional /
  * TimesRange). One match per anchor under SkipToNextRow; under
  * SkipPastLastEvent an anchor is only offered if it starts strictly
  * after the previous emitted match's last event (greedy
  * interval-scheduling, the reference's SKIP_PAST_LAST_EVENT).
  *
  * Step semantics:
  *  - One: earliest eligible event of the kind.
  *  - Optional: binds the earliest eligible event if the rest still
  *    completes after it, else binds nothing (greedy-with-backtrack).
  *  - OneOrMore(until): first element binds like One; the loop then
  *    absorbs every event of the kind before the next step's binding,
  *    the horizon, and (if `until` is set) the first until-kind event
  *    after the previous binding — Pattern.java:219 `until` stops the
  *    loop the moment the stop condition fires.
  *  - Times(n, consecutive=false): n successive earliest bindings
  *    (relaxed contiguity). consecutive=true additionally requires the
  *    n events to be ADJACENT in the per-key event sequence (strict
  *    contiguity: any intervening event of any kind kills the run —
  *    Pattern.java consecutive()).
  *  - TimesRange(lo, hi): greedy — binds the LARGEST k in [lo, hi]
  *    successive earliest events for which the remainder completes.
  *  - Not: no event of the kind strictly between the neighboring
  *    bindings (notFollowedBy); a trailing Not checks the interval up
  *    to the horizon deadline.
  *
  * Execution: one shuffle on the key, per-key event-time sort, linear
  * scan with bounded backtracking — the keyed-state access pattern of
  * the streaming variant (graft.streaming.StreamingCEP implements the
  * 2-step case incrementally).
  */
object PatternNFA {

  sealed trait Quant
  case object One extends Quant
  case object Optional extends Quant
  /** Not = notFollowedBy: forbids the kind between neighbor bindings. */
  case object Not extends Quant
  final case class OneOrMore(untilKind: Option[String] = None) extends Quant
  /** Exactly n successive occurrences (Pattern.times(n)); consecutive
    * requires strict contiguity in the event sequence. */
  final case class Times(n: Int, consecutive: Boolean = false) extends Quant
  /** Between lo and hi occurrences, greedy (Pattern.times(from, to)). */
  final case class TimesRange(lo: Int, hi: Int) extends Quant

  sealed trait AfterMatch
  case object SkipToNextRow extends AfterMatch
  case object SkipPastLastEvent extends AfterMatch

  /** One pattern step: match events whose kind equals `kind`. */
  final case class Step(name: String, kind: String, quant: Quant = One)

  final case class PMatch(key: Long, anchor_id: Long, end_id: Long,
                          chain: String, counts: String)

  /** One row per (match, pattern variable, bound event) — the exploded
    * form the MEASURES clause aggregates over. `match_no` is the
    * 1-based per-key match sequence (SQL MATCH_NUMBER()); `pos` is the
    * event's index in the per-key (ts, id) order, the ordering FIRST/
    * LAST measures resolve against. */
  final case class BindingRow(key: Long, match_no: Long, anchor_id: Long,
                              var_name: String, event_id: Long, pos: Int)

  /** Internal step over a variable bit index: a row matches step i iff
    * bit i of its satisfaction mask is set (general predicates; kind
    * equality is the special case `kind = 'literal'`). */
  private final case class IStep(name: String, bit: Int, quant: Quant,
                                 untilBit: Option[Int])

  private final case class Ev(ts: Long, id: Long, sat: Long, idx: Int)
  @inline private def hasBit(e: Ev, i: Int): Boolean = (e.sat & (1L << i)) != 0

  /** events: (key, tsMicros, id, kind) rows. One output row per
    * emitted match: binding-chain ids and loop counts as deterministic
    * strings. */
  /** kind-equality surface compiled onto the predicate NFA: one
    * variable per distinct kind (incl. OneOrMore until-kinds). */
  private def kindPreds(steps: Seq[Step]): Seq[(String, org.apache.spark.sql.Column)] = {
    val kinds = (steps.map(_.kind) ++ steps.collect {
      case Step(_, _, OneOrMore(Some(uk))) => uk
    }).distinct
    kinds.map(k => k -> (col("kind") === lit(k)))
  }

  def run(spark: SparkSession, events: DataFrame, steps: Seq[Step],
          withinMicros: Long,
          afterMatch: AfterMatch = SkipToNextRow): DataFrame =
    runPredicates(spark, events, steps, kindPreds(steps), withinMicros,
      afterMatch)

  /** One timed-out partial match: the longest greedily-bound pattern
    * prefix of an anchor whose run could not complete within its
    * window. `chain` follows the emit() id convention (loop steps
    * contribute their first element); `n_bound` counts steps that
    * bound at least one event (the anchor included). */
  final case class PTimeout(key: Long, anchor_id: Long, last_id: Long,
                            chain: String, n_bound: Int)

  /** Timed-out partial matches (flink-cep `PatternStream.java:175`
    * select(timeoutFunction) / `TimedOutPartialMatchHandler`): every
    * OFFERED anchor whose run cannot complete within its window emits
    * the longest greedily-bindable pattern prefix — the NFA state the
    * reference hands to the timeout function when the within-timer
    * fires. Batch form = complete-input retrospect of that timer.
    * Completed runs emit nothing here (they are [[run]]'s output);
    * under SkipPastLastEvent the skip mark advances on full matches
    * exactly as in the main scan, so this side output sees the same
    * offered anchors the main output does. */
  def runTimeouts(spark: SparkSession, events: DataFrame, steps: Seq[Step],
                  withinMicros: Long,
                  afterMatch: AfterMatch = SkipToNextRow): DataFrame = {
    import spark.implicits._
    val (isteps, ds) = prepare(events, steps, kindPreds(steps))
    ds.groupByKey(_._1).flatMapGroups { (key, it) =>
      val evs = sortKey(it)
      val out = Vector.newBuilder[PTimeout]
      var minAnchorIdx = 0
      evs.foreach { a =>
        if (hasBit(a, isteps.head.bit) && a.idx >= minAnchorIdx) {
          val deadline = a.ts + withinMicros
          matchFrom(evs, isteps.drop(1), a, deadline) match {
            case Some(rest) =>
              if (afterMatch == SkipPastLastEvent)
                minAnchorIdx = (Vector(Vector(a)) ++ rest).flatten
                  .map(_.idx).max + 1
            case None =>
              out += timeoutPartial(key, evs, isteps, a, deadline)
          }
        }
      }
      out.result().iterator
    }.toDF()
  }

  /** Longest prefix the NFA had bound when the window expired: greedy
    * earliest-first over m-1 steps after the anchor, largest m first
    * (m = L-1 .. 1; the empty prefix always binds, so the anchor alone
    * is the floor). */
  private def timeoutPartial(key: Long, evs: Vector[Ev], isteps: Seq[IStep],
                             a: Ev, deadline: Long): PTimeout = {
    val (m, rest) = (isteps.length - 1 to 1 by -1).iterator
      .map(k => k -> matchFrom(evs, isteps.slice(1, k), a, deadline))
      .collectFirst { case (k, Some(r)) => (k, r) }
      .getOrElse((1, Vector.empty[Vector[Ev]]))
    val bound = Vector(Vector(a)) ++ rest
    val ids = isteps.take(m).zip(bound).flatMap { case (st, b) =>
      st.quant match {
        case OneOrMore(_) => b.headOption.map(_.id).toSeq
        case _            => b.map(_.id)
      }
    }
    val lastEv = bound.flatten.maxBy(e => (e.ts, e.id))
    PTimeout(key, a.id, lastEv.id, ids.mkString(","), bound.count(_.nonEmpty))
  }

  /** Streaming twin of [[runTimeouts]]'s per-key scan (the shape
    * [[matchesMature]] is to [[run]]): timed-out partials for MATURE
    * anchors only — anchor.ts + within <= watermark, when the window
    * is provably complete — with the SkipPastLastEvent mark advanced
    * by FULL matches exactly as the main scan advances it, so the
    * timeout stream sees the same offered anchors. */
  private[graft] def matureTimeouts(
      key: Long, triples: Seq[(Long, Long, Long)], steps: Seq[Step],
      varNames: Seq[String], withinMicros: Long, afterMatch: AfterMatch,
      wmMicros: Long, minStart: Option[(Long, Long)])
      : (Seq[PTimeout], Option[(Long, Long)]) = {
    val (_, tmos, mark) = matureScan(key, triples, steps, varNames,
      withinMicros, afterMatch, wmMicros, minStart, collectTimeouts = true)
    (tmos, mark)
  }

  /** General row-pattern matching: each variable in `varPreds` is an
    * arbitrary boolean Column over the event row (the reference
    * compiles DEFINE predicates the same way —
    * flink-table-planner-blink/.../codegen/MatchCodeGenerator.scala).
    * Predicates are evaluated ONCE per event into a bitmask column
    * (codegen'd, before the shuffle — the NFA scan then only tests
    * bits), so predicate cost is map-side and per-event, not
    * per-(event × backtrack-visit). `steps` reference variables by
    * `kind` = variable name; max 64 variables. */
  def runPredicates(spark: SparkSession, events: DataFrame, steps: Seq[Step],
                    varPreds: Seq[(String, org.apache.spark.sql.Column)],
                    withinMicros: Long,
                    afterMatch: AfterMatch = SkipToNextRow): DataFrame = {
    import spark.implicits._
    val (isteps, ds) = prepare(events, steps, varPreds)
    ds.groupByKey(_._1).flatMapGroups { (key, it) =>
      scanKey(sortKey(it), isteps, withinMicros, afterMatch)
        .map { case (bindings, _) => emit(key, isteps, bindings) }
        .iterator
    }.toDF()
  }

  /** [[runPredicates]] in exploded per-binding form: one [[BindingRow]]
    * per (match, variable, bound event). Same scan, same determinism;
    * this is the input shape of the MEASURES clause (the aggregates
    * run as an ordinary distributed groupBy over it — see
    * [[MatchRecognize]]). */
  def runPredicatesBindings(spark: SparkSession, events: DataFrame,
                            steps: Seq[Step],
                            varPreds: Seq[(String, org.apache.spark.sql.Column)],
                            withinMicros: Long,
                            afterMatch: AfterMatch = SkipToNextRow): DataFrame = {
    import spark.implicits._
    val (isteps, ds) = prepare(events, steps, varPreds)
    ds.groupByKey(_._1).flatMapGroups { (key, it) =>
      scanKey(sortKey(it), isteps, withinMicros, afterMatch)
        .flatMap { case (bindings, matchNo) =>
          val anchorId = bindings.head.head.id
          isteps.zip(bindings).flatMap { case (st, bound) =>
            bound.map(e =>
              BindingRow(key, matchNo, anchorId, st.name, e.id, e.idx))
          }
        }.iterator
    }.toDF()
  }

  /** Common front half of the two run shapes: validate, resolve steps
    * onto variable bits, and project events down to the NFA's
    * (key, ts, id, bitmask) dataset with predicates pre-evaluated
    * map-side. */
  private def prepare(events: DataFrame, steps: Seq[Step],
                      varPreds: Seq[(String, org.apache.spark.sql.Column)])
      : (Seq[IStep], org.apache.spark.sql.Dataset[(Long, Long, Long, Long)]) = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty && steps.head.quant == One,
      "first step must be quantifier One (anchor)")
    require(varPreds.size <= 64, "at most 64 pattern variables")
    val bitOf = varPreds.map(_._1).zipWithIndex.toMap
    def bitFor(k: String): Int = bitOf.getOrElse(k,
      sys.error(s"step references undefined pattern variable $k"))
    val isteps = steps.map { st =>
      val untilBit = st.quant match {
        case OneOrMore(Some(uk)) => Some(bitFor(uk))
        case _ => None
      }
      IStep(st.name, bitFor(st.kind), st.quant, untilBit)
    }
    val satCol = varPreds.zipWithIndex.map { case ((_, p), i) =>
      when(p, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val ds = events.select(
        col("key").cast("long"), col("tsMicros").cast("long"),
        col("id").cast("long"), satCol.cast("long").as("_sat"))
      .as[(Long, Long, Long, Long)]
    (isteps, ds)
  }

  /** Incremental per-key scan for the STREAMING runtime
    * ([[graft.streaming.StreamingMatchRecognize]]): run the identical
    * NFA over a state buffer of (tsMicros, id, satMask) triples, but
    * offer ONLY MATURE anchors — those whose whole window is final,
    * i.e. anchor.ts + within <= watermark — so every emitted match is
    * exactly what the batch scan would emit over the complete input
    * (events with ts <= watermark can no longer arrive). `minStart` is
    * the skip-past high-water mark carried in state: under
    * SkipPastLastEvent, anchors at or before it are not offered;
    * the updated mark is returned with the matches. */
  private[graft] def matchesMature(
      key: Long, triples: Seq[(Long, Long, Long)], steps: Seq[Step],
      varNames: Seq[String], withinMicros: Long, afterMatch: AfterMatch,
      wmMicros: Long, minStart: Option[(Long, Long)])
      : (Seq[PMatch], Option[(Long, Long)]) = {
    val (raw, mark) = matureBindings(triples, steps, varNames, withinMicros,
      afterMatch, wmMicros, minStart)
    val isteps = compileSteps(steps, varNames)
    (raw.map { bindings => emit(key, isteps, bindings) }, mark)
  }

  /** [[matchesMature]] in raw-binding form for the streaming MEASURES
    * path: per emitted match, the per-step bound events as (ts, id)
    * pairs in sequence order. Same maturity/eviction/skip contract. */
  private[graft] def matureBindingsRaw(
      triples: Seq[(Long, Long, Long)], steps: Seq[Step],
      varNames: Seq[String], withinMicros: Long, afterMatch: AfterMatch,
      wmMicros: Long, minStart: Option[(Long, Long)])
      : (Seq[Seq[Seq[(Long, Long)]]], Option[(Long, Long)]) = {
    val (raw, mark) = matureBindings(triples, steps, varNames, withinMicros,
      afterMatch, wmMicros, minStart)
    (raw.map(_.map(_.map(e => (e.ts, e.id)))), mark)
  }

  private def compileSteps(steps: Seq[Step], varNames: Seq[String]): Seq[IStep] = {
    val bitOf = varNames.zipWithIndex.toMap
    steps.map { st =>
      val untilBit = st.quant match {
        case OneOrMore(Some(uk)) => Some(bitOf(uk))
        case _ => None
      }
      IStep(st.name, bitOf(st.kind), st.quant, untilBit)
    }
  }

  /** ONE mature-anchor scan serving both streaming side outputs —
    * matches and timed-out partials share the anchor-offering, the
    * maturity bound, and the SkipPastLastEvent mark discipline BY
    * CONSTRUCTION (a drift between two copies would silently break
    * the documented same-offered-anchors contract). The prefix search
    * for timeout partials costs extra matchFrom calls, so it only
    * runs when `collectTimeouts` is set. */
  private def matureScan(
      key: Long, triples: Seq[(Long, Long, Long)], steps: Seq[Step],
      varNames: Seq[String], withinMicros: Long, afterMatch: AfterMatch,
      wmMicros: Long, minStart: Option[(Long, Long)],
      collectTimeouts: Boolean)
      : (Seq[Vector[Vector[Ev]]], Seq[PTimeout], Option[(Long, Long)]) = {
    val isteps = compileSteps(steps, varNames)
    val evs = triples.toVector.sortBy(t => (t._1, t._2))
      .zipWithIndex.map { case ((ts, id, s), i) => Ev(ts, id, s, i) }
    val out = Vector.newBuilder[Vector[Vector[Ev]]]
    val tmos = Vector.newBuilder[PTimeout]
    var mark = minStart
    def afterMark(e: Ev): Boolean = mark.forall { case (ts, id) =>
      e.ts > ts || (e.ts == ts && e.id > id)
    }
    evs.foreach { a =>
      if (hasBit(a, isteps.head.bit) && afterMark(a) &&
          a.ts + withinMicros <= wmMicros) {
        val deadline = a.ts + withinMicros
        matchFrom(evs, isteps.drop(1), a, deadline) match {
          case Some(rest) =>
            val bindings = Vector(Vector(a)) ++ rest
            out += bindings
            // under SkipToNextRow no mark is needed: a mature anchor is
            // evicted in the same invocation (maturity bound == eviction
            // bound), so each is offered exactly once across invocations
            if (afterMatch == SkipPastLastEvent) {
              val lastEv = bindings.flatten.maxBy(e => (e.ts, e.id))
              mark = Some((lastEv.ts, lastEv.id))
            }
          case None if collectTimeouts =>
            tmos += timeoutPartial(key, evs, isteps, a, deadline)
          case None =>
        }
      }
    }
    (out.result(), tmos.result(), mark)
  }

  private def matureBindings(
      triples: Seq[(Long, Long, Long)], steps: Seq[Step],
      varNames: Seq[String], withinMicros: Long, afterMatch: AfterMatch,
      wmMicros: Long, minStart: Option[(Long, Long)])
      : (Seq[Vector[Vector[Ev]]], Option[(Long, Long)]) = {
    val (matches, _, mark) = matureScan(0L, triples, steps, varNames,
      withinMicros, afterMatch, wmMicros, minStart, collectTimeouts = false)
    (matches, mark)
  }

  /** Shared per-key scan: every emitted match as (per-step bindings,
    * 1-based match number), anchors offered earliest-first under the
    * given skip strategy. */
  private def scanKey(evs: Vector[Ev], isteps: Seq[IStep],
                      withinMicros: Long, afterMatch: AfterMatch)
      : Vector[(Vector[Vector[Ev]], Long)] = {
    val out = Vector.newBuilder[(Vector[Vector[Ev]], Long)]
    var minAnchorIdx = 0
    var matchNo = 0L
    evs.foreach { a =>
      if (hasBit(a, isteps.head.bit) && a.idx >= minAnchorIdx) {
        val deadline = a.ts + withinMicros
        matchFrom(evs, isteps.drop(1), a, deadline).foreach { rest =>
          val bindings = Vector(Vector(a)) ++ rest
          matchNo += 1
          out += ((bindings, matchNo))
          if (afterMatch == SkipPastLastEvent)
            minAnchorIdx = bindings.flatten.map(_.idx).max + 1
        }
      }
    }
    out.result()
  }

  /** allowCombinations for a single loop step (Pattern.java
    * allowCombinations()): pattern A → B×times(combinations) → C emits
    * ONE MATCH PER COMBINATION of loop events between the anchor's
    * neighbors, not just the successive-earliest run. Exposed for
    * n = 2 (pairs) — the shape that demonstrates the semantics while
    * keeping output cardinality C(k,2)-bounded. */
  def runCombinationsPairs(spark: SparkSession, events: DataFrame,
                           anchorKind: String, loopKind: String,
                           endKind: String, withinMicros: Long): DataFrame = {
    import spark.implicits._
    // bits: 0 = anchor, 1 = loop, 2 = end
    val sat = Seq(anchorKind, loopKind, endKind).zipWithIndex.map {
      case (k, i) => when(col("kind") === lit(k), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val ds = events.select(
        col("key").cast("long"), col("tsMicros").cast("long"),
        col("id").cast("long"), sat.cast("long").as("_sat"))
      .as[(Long, Long, Long, Long)]
    ds.groupByKey(_._1).flatMapGroups { (key, it) =>
      val evs = sortKey(it)
      val out = Vector.newBuilder[PMatch]
      evs.foreach { a =>
        if (hasBit(a, 0)) {
          val deadline = a.ts + withinMicros
          // end binds earliest-first AFTER at least two loop events.
          val loops = evs.filter(e => hasBit(e, 1) && e.ts > a.ts &&
            e.ts <= deadline)
          val end = evs.find(e => hasBit(e, 2) && e.ts <= deadline &&
            loops.size >= 2 && e.ts > loops(1).ts)
          end.foreach { c =>
            val inWin = loops.filter(_.ts < c.ts)
            for (i <- inWin.indices; j <- (i + 1) until inWin.size)
              out += PMatch(key, a.id, c.id,
                s"${a.id},${inWin(i).id},${inWin(j).id},${c.id}", "")
          }
        }
      }
      out.result().iterator
    }.toDF()
  }

  private def sortKey(it: Iterator[(Long, Long, Long, Long)]): Vector[Ev] =
    it.map(e => (e._2, e._3, e._4)).toVector.sortBy(e => (e._1, e._2))
      .zipWithIndex.map { case ((ts, id, s), i) => Ev(ts, id, s, i) }

  /** Bind `steps` after `prev`, earliest-first with backtracking.
    * Returns one Vector[Ev] of bound events per step (empty Vector for
    * an unbound Optional / a satisfied Not). */
  private def matchFrom(evs: Vector[Ev], steps: Seq[IStep], prev: Ev,
                        deadline: Long): Option[Vector[Vector[Ev]]] = {
    if (steps.isEmpty) return Some(Vector.empty)
    val st = steps.head
    def eligible(from: Int, bit: Int): Iterator[Ev] =
      evs.iterator.drop(from).filter(e => hasBit(e, bit) &&
        e.ts > prev.ts && e.ts <= deadline)
    def noneBetween(bit: Int, loTs: Long, hiTs: Long): Boolean =
      !evs.exists(e => hasBit(e, bit) && e.ts > loTs && e.ts < hiTs)

    st.quant match {
      case One =>
        eligible(prev.idx + 1, st.bit).flatMap { e =>
          matchFrom(evs, steps.tail, e, deadline).map(Vector(Vector(e)) ++ _)
        }.nextOption()

      case Optional =>
        val bound = eligible(prev.idx + 1, st.bit).flatMap { e =>
          matchFrom(evs, steps.tail, e, deadline).map(Vector(Vector(e)) ++ _)
        }.nextOption()
        bound.orElse(
          matchFrom(evs, steps.tail, prev, deadline).map(Vector(Vector.empty[Ev]) ++ _))

      case Not =>
        // bind the remainder first, then check the forbidden interval
        matchFrom(evs, steps.tail, prev, deadline).flatMap { rest =>
          val hiTs = rest.flatten.headOption.map(_.ts).getOrElse(deadline + 1)
          if (noneBetween(st.bit, prev.ts, hiTs))
            Some(Vector(Vector.empty[Ev]) ++ rest)
          else None
        }

      case OneOrMore(_) =>
        eligible(prev.idx + 1, st.bit).flatMap { first =>
          val stopTs = st.untilBit.flatMap(ub =>
            evs.find(e => hasBit(e, ub) && e.ts > prev.ts).map(_.ts))
          if (stopTs.exists(_ <= first.ts)) None
          else matchFrom(evs, steps.tail, first, deadline).map { rest =>
            val hiTs = math.min(
              rest.flatten.headOption.map(_.ts).getOrElse(deadline + 1),
              stopTs.getOrElse(Long.MaxValue))
            val loop = evs.filter(e => hasBit(e, st.bit) && e.ts > prev.ts &&
              e.ts < hiTs && e.ts <= deadline)
            Vector(if (loop.isEmpty) Vector(first) else loop) ++ rest
          }
        }.nextOption()

      case Times(n, consecutive) =>
        if (!consecutive) bindSuccessive(evs, st.bit, prev, deadline, n)
          .flatMap { run =>
            matchFrom(evs, steps.tail, run.last, deadline).map(Vector(run) ++ _)
          }
        else {
          // strict contiguity: earliest run of n ADJACENT events
          val starts = eligible(prev.idx + 1, st.bit)
          starts.flatMap { s =>
            val run = (0 until n).map(i =>
              evs.lift(s.idx + i).filter(e => hasBit(e, st.bit) &&
                e.ts <= deadline))
            if (run.forall(_.isDefined)) {
              val bound = run.flatten.toVector
              matchFrom(evs, steps.tail, bound.last, deadline)
                .map(Vector(bound) ++ _)
            } else None
          }.nextOption()
        }

      case TimesRange(lo, hi) =>
        // greedy: largest k whose remainder still completes
        (hi to lo by -1).iterator.flatMap { k =>
          bindSuccessive(evs, st.bit, prev, deadline, k).flatMap { run =>
            matchFrom(evs, steps.tail, run.last, deadline).map(Vector(run) ++ _)
          }
        }.nextOption()
    }
  }

  /** Earliest n successive events matching `bit` after prev (relaxed). */
  private def bindSuccessive(evs: Vector[Ev], bit: Int, prev: Ev,
                             deadline: Long, n: Int): Option[Vector[Ev]] = {
    var cur = prev
    val out = Vector.newBuilder[Ev]
    var i = 0
    while (i < n) {
      val nxt = evs.iterator.drop(cur.idx + 1).find(e => hasBit(e, bit) &&
        e.ts > cur.ts && e.ts <= deadline)
      nxt match {
        case Some(e) => out += e; cur = e; i += 1
        case None => return None
      }
    }
    Some(out.result())
  }

  /** Chain convention (kept from round 1 so oracles stay in plain SQL):
    * each step contributes its bound ids; a OneOrMore loop contributes
    * only its FIRST element (the loop membership is summarized in
    * `counts` instead); unbound Optional / Not steps contribute
    * nothing. */
  private def emit(key: Long, steps: Seq[IStep],
                   bindings: Vector[Vector[Ev]]): PMatch = {
    val chain = steps.zip(bindings).flatMap {
      case (st, b) if st.quant.isInstanceOf[OneOrMore] => b.take(1).map(_.id)
      case (_, b) => b.map(_.id)
    }
    val counts = steps.zip(bindings).collect {
      case (st, b) if st.quant.isInstanceOf[OneOrMore] =>
        s"${st.name}:${b.size}"
    }.mkString(",")
    PMatch(key, chain.head, chain.last, chain.mkString(","), counts)
  }
}
