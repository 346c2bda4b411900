package graft.operators

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Async I/O (SURVEY.md §2.9 — AsyncDataStream / AsyncWaitOperator
  * .java:78): per-partition batched asynchronous lookups with bounded
  * in-flight capacity and ORDERED result emission — the Spark analog
  * is mapPartitions over a window of Futures.
  *
  * The `lookup` function stands where an async client (HTTP/JDBC/KV)
  * would sit. Each partition keeps at most `capacity` requests in
  * flight; results are emitted in input order (AsyncDataStream
  * .orderedWait semantics).
  */
object AsyncLookup {

  def orderedWait[A, B](it: Iterator[A], capacity: Int, lookup: A => Future[B])
                       (implicit ec: ExecutionContext): Iterator[(A, B)] = {
    // sliding window of in-flight futures, emitted in input order
    val window = new scala.collection.mutable.Queue[(A, Future[B])]()
    new Iterator[(A, B)] {
      private def fill(): Unit =
        while (window.size < capacity && it.hasNext) {
          val a = it.next()
          window.enqueue(a -> lookup(a))
        }
      override def hasNext: Boolean = { fill(); window.nonEmpty }
      override def next(): (A, B) = {
        fill()
        val (a, f) = window.dequeue()
        a -> Await.result(f, Duration.Inf)
      }
    }
  }
}
