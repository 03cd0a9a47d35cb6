package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Async I/O operator: per-record async function with bounded in-flight
  * requests, ORDERED result emission.
  *
  * Reference: flink-streaming-java/.../operators/async/AsyncWaitOperator
  * .java:78 (ordered mode) — there a queue of in-flight futures drained in
  * arrival order; here the same sliding window of Futures inside
  * `mapPartitions`, so each partition keeps at most `parallelism` requests
  * outstanding and emits strictly in input order. The executor-side pool is
  * the Spark-idiomatic placement: no driver coordination, scales with the
  * partition count. */
object AsyncIO {

  def mapAsyncOrdered[T, U: Encoder](ds: Dataset[T], parallelism: Int)(f: T => U): Dataset[U] =
    ds.mapPartitions { it =>
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(
        java.util.concurrent.Executors.newFixedThreadPool(parallelism))
      // keep at most `parallelism` futures in flight; emit in input order
      new Iterator[U] {
        private val queue = new scala.collection.mutable.Queue[Future[U]]()
        override def hasNext: Boolean = queue.nonEmpty || it.hasNext
        override def next(): U = {
          while (it.hasNext && queue.size < parallelism) {
            val t = it.next() // materialize on the task thread — the source
            queue.enqueue(Future(f(t))) // iterator is not thread-safe
          }
          Await.result(queue.dequeue(), Duration.Inf)
        }
      }
    }
}
