package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAFs (SURVEY.md §2.10 AggregateFunction surface):
  * FIRST_VALUE / LAST_VALUE with an explicit (ts, id) order — the
  * reference's FirstValueAggFunction/LastValueAggFunction carry an
  * order key for determinism; Spark's first()/last() are
  * arrival-order and nondeterministic under shuffles, so these
  * Aggregators keep the (ts, id)-minimal/maximal row in the buffer.
  * merge() is associative/commutative → safe under partial
  * aggregation at any parallelism.
  */
object OrderedAggregators {

  case class Ordered(v: Double, ts: Long, id: Long)
  case class Buf(v: Double, ts: Long, id: Long, set: Boolean)

  abstract class ByOrder(keepFirst: Boolean) extends Aggregator[Ordered, Buf, Double] {
    override def zero: Buf = Buf(0.0, 0L, 0L, set = false)
    private def better(a: Buf, b: Buf): Buf =
      if (!a.set) b
      else if (!b.set) a
      else {
        val aLess = a.ts < b.ts || (a.ts == b.ts && a.id < b.id)
        if (if (keepFirst) aLess else !aLess) a else b
      }
    override def reduce(b: Buf, x: Ordered): Buf =
      better(b, Buf(x.v, x.ts, x.id, set = true))
    override def merge(a: Buf, b: Buf): Buf = better(a, b)
    override def finish(b: Buf): Double = b.v
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  class FirstValueByOrder extends ByOrder(keepFirst = true)
  class LastValueByOrder extends ByOrder(keepFirst = false)
}
