package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Executed-stage counter for the iterative-loop re-execution pins
  * (Round9Spec hits, LoopStageBoundSpec — VERDICT r15 #6).
  *
  * A misplaced localCheckpoint (materializing a frame whose lineage still
  * hangs off an earlier round's LAZY frame) re-executes whole rounds:
  * separate actions never share shuffle output, so the re-run shows up as
  * extra COMPLETED stages (~1.7× in the r15 hits defect), while healthy
  * exchange reuse shows as skipped stages, which never complete. Counting
  * completed stages over the loop's action is therefore exactly the
  * re-execution detector.
  *
  * Drain contract (ADVICE r15): listener events are posted asynchronously,
  * so after `body` returns we poll the count for quiescence (3 consecutive
  * stable 100 ms reads, 10 s deadline) instead of a blind sleep — `body`
  * has already blocked on its action, so only bus flush latency remains.
  *
  * CONFIG DEPENDENCY: every bound calibrated against this counter assumes
  * the SparkTestBase session (local[4], spark.sql.shuffle.partitions=4,
  * AQE defaults). A width or AQE change can shift counts in either
  * direction — recalibrate the bounds, don't widen them blindly. */
object StageCount {
  def executed(spark: SparkSession)(body: => Unit): Int = {
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var prev = -1
      var stable = 0
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (stable < 3 && System.nanoTime() < deadline) {
        val cur = stages.get()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        Thread.sleep(100)
      }
      stages.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
