package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CEP pattern matching with quantifiers (SURVEY.md §2.9 —
  * flink-cep Pattern algebra: Pattern.java:155-477
  * where/times/oneOrMore/within).
  *
  * Algebra (round 1): a sequence of steps over event kinds with
  * quantifiers {One, OneOrMore}, relaxed contiguity between steps
  * (followedBy), a `within` horizon anchored at the first step, and
  * AFTER MATCH SKIP TO NEXT ROW (every anchor event is offered a
  * match — same convention as the followedBy operators, which keeps
  * results deterministic and SQL-expressible).
  *
  * Matching rule: each step binds to the EARLIEST event of its kind
  * strictly after the previous binding (by (ts, id) order) and within
  * the horizon. A OneOrMore step additionally reports how many events
  * of its kind fall strictly between its neighbors' bindings (≥ 1 by
  * construction; horizon-bounded for a trailing OneOrMore).
  *
  * Execution: one shuffle on the key, per-key event-time sort, linear
  * NFA scan — the keyed-state access pattern of the streaming variant
  * (graft.streaming.StreamingCEP implements the 2-step case
  * incrementally).
  */
object PatternNFA {

  sealed trait Quant
  case object One extends Quant
  case object OneOrMore extends Quant
  /** Exactly n successive earliest occurrences (Pattern.times(n)). */
  final case class Times(n: Int) extends Quant

  /** One pattern step: match events whose kind equals `kind`. */
  final case class Step(name: String, kind: String, quant: Quant = One)

  final case class PMatch(key: Long, anchor_id: Long, end_id: Long,
                          chain: String, counts: String)

  /** events: (key, tsMicros, id, kind) rows. One output row per
    * anchor that completes the pattern: binding-chain ids and
    * OneOrMore counts as deterministic strings. */
  def run(spark: SparkSession, events: DataFrame, stepsIn: Seq[Step],
          withinMicros: Long): DataFrame = {
    import spark.implicits._
    // Times(n) expands to n successive One bindings of the same kind.
    val steps = stepsIn.flatMap {
      case Step(nm, k, Times(n)) => (1 to n).map(i => Step(s"$nm$i", k, One))
      case s => Seq(s)
    }
    require(steps.nonEmpty && steps.head.quant == One,
      "first step must be quantifier One (anchor)")
    val ds = events.select(
      col("key").cast("long"), col("tsMicros").cast("long"),
      col("id").cast("long"), col("kind").cast("string"))
      .as[(Long, Long, Long, String)]

    ds.groupByKey(_._1).flatMapGroups { (key, it) =>
      val evs = it.map(e => (e._2, e._3, e._4)).toVector.sortBy(e => (e._1, e._2))
      val out = Vector.newBuilder[PMatch]
      evs.indices.foreach { a =>
        if (evs(a)._3 == steps.head.kind) {
          val deadline = evs(a)._1 + withinMicros
          // bind each subsequent step to the earliest eligible event
          var bindings = Vector(a)
          var ok = true
          steps.drop(1).foreach { st =>
            if (ok) {
              val prevTs = evs(bindings.last)._1
              val j = evs.indexWhere(e => e._3 == st.kind && e._1 > prevTs &&
                e._1 <= deadline, bindings.last + 1)
              if (j < 0) ok = false else bindings :+= j
            }
          }
          if (ok) {
            val counts = steps.zipWithIndex.collect {
              case (st, i) if st.quant == OneOrMore =>
                val lo = evs(bindings(i - 1))._1
                val hi = if (i + 1 < bindings.size) evs(bindings(i + 1))._1 else deadline + 1
                val n = evs.count(e => e._3 == st.kind && e._1 > lo && e._1 < hi)
                s"${st.name}:$n"
            }.mkString(",")
            out += PMatch(key, evs(a)._2, evs(bindings.last)._2,
              bindings.map(b => evs(b)._2).mkString(","), counts)
          }
        }
      }
      out.result().iterator
    }.toDF()
  }
}
