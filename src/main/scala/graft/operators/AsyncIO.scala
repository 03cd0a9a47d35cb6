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
  * partition count. The pool uses daemon threads and is shut down when the
  * task's input is exhausted, so long-lived executors running many tasks
  * never accumulate threads; a per-request timeout mirrors the reference
  * operator's `timeout` (AsyncWaitOperator fails the record on expiry).
  */
object AsyncIO {

  def mapAsyncOrdered[T, U: Encoder](ds: Dataset[T], parallelism: Int,
                                     timeout: Duration = Duration.Inf)(f: T => U): Dataset[U] =
    ds.mapPartitions { it =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        parallelism,
        (r: Runnable) => {
          val t = new Thread(r, "graft-async-io")
          t.setDaemon(true) // never block executor JVM shutdown
          t
        })
      // tasks that stop consuming early (limit, error) still release the pool
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      // keep at most `parallelism` futures in flight; emit in input order
      new Iterator[U] {
        // (future, submit-time) — the deadline runs from SUBMISSION, like the
        // reference operator registering the timeout when the element enters
        // (AsyncWaitOperator.processElement), so k requests stalled behind a
        // slow head surface after ~timeout, not k×timeout (ADVICE r2)
        private val queue = new scala.collection.mutable.Queue[(Future[U], Long)]()
        override def hasNext: Boolean = {
          val more = queue.nonEmpty || it.hasNext
          if (!more) pool.shutdown() // input exhausted → release the threads
          more
        }
        override def next(): U = {
          while (it.hasNext && queue.size < parallelism) {
            val t = it.next() // materialize on the task thread — the source
            queue.enqueue((Future(f(t)), System.nanoTime())) // iterator is not thread-safe
          }
          val (fut, submitted) = queue.dequeue()
          val remaining =
            if (!timeout.isFinite) timeout
            else timeout - Duration.fromNanos(System.nanoTime() - submitted)
          try Await.result(fut, if (remaining.isFinite && remaining < Duration.Zero) Duration.Zero else remaining)
          catch {
            case e: java.util.concurrent.TimeoutException =>
              pool.shutdownNow()
              throw new java.util.concurrent.TimeoutException(
                s"AsyncIO request exceeded $timeout from submission: ${e.getMessage}")
          }
        }
      }
    }

  /** UNORDERED mode — ref AsyncWaitOperator's unordered output queue:
    * results emit as they COMPLETE, not in input order (lower latency when
    * request times vary; the reference offers both). Same bounded in-flight
    * window and submit-time deadlines as the ordered variant; the emission
    * order is whatever completion produces, so callers must not rely on
    * row order (Spark never guarantees partition-internal order to begin
    * with unless sorted). */
  def mapAsyncUnordered[T, U: Encoder](ds: Dataset[T], parallelism: Int,
                                       timeout: Duration = Duration.Inf)(f: T => U): Dataset[U] =
    ds.mapPartitions { it =>
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        parallelism,
        (r: Runnable) => {
          val t = new Thread(r, "graft-async-io-unordered")
          t.setDaemon(true)
          t
        })
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
      val done = new java.util.concurrent.LinkedBlockingQueue[Either[Throwable, U]]()
      val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
      new Iterator[U] {
        private var emitted = 0L
        private var submitted = 0L
        private def pump(): Unit =
          while (it.hasNext && inFlight.get() < parallelism) {
            val t = it.next() // materialize on the task thread
            inFlight.incrementAndGet()
            submitted += 1
            pool.execute { () =>
              val r = try Right(f(t)) catch { case e: Throwable => Left(e) }
              done.put(r); inFlight.decrementAndGet()
            }
          }
        override def hasNext: Boolean = {
          val more = emitted < submitted || it.hasNext
          if (!more) pool.shutdown()
          more
        }
        override def next(): U = {
          pump()
          val r =
            if (!timeout.isFinite) done.take()
            else Option(done.poll(timeout.toMillis, java.util.concurrent.TimeUnit.MILLISECONDS))
              .getOrElse {
                pool.shutdownNow()
                throw new java.util.concurrent.TimeoutException(
                  s"AsyncIO (unordered) request exceeded $timeout")
              }
          emitted += 1
          r match {
            case Right(u) => u
            case Left(e) => pool.shutdownNow(); throw e
          }
        }
      }
    }
}
