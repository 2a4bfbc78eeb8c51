package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Per-query resource metering — the Spark analog of the reference's
 * FinOps surface (resource monitor + QUERY_TAG, reference
 * README.md:128-133): run a block under a job-group tag and report what
 * it actually consumed. [[graft.models.Pipeline]] already tags its
 * stages ([[org.apache.spark.SparkContext.setJobGroup]]); this adds the
 * "how many credits did that cost" half as task-metric aggregates —
 * the numbers a capacity plan needs at 100 TB (shuffle volume tells you
 * network, spill tells you memory pressure, task time tells you the
 * bill).
 *
 * Implementation: a [[SparkListener]] keyed by job-group id. Listener
 * delivery is asynchronous, so [[Metrics.measure]] waits (bounded) for
 * every job it saw start in the group to finish before reading the
 * adders. Metrics are task-level sums over all jobs the block ran.
 */
object Metrics {

  final case class QueryMetrics(tag: String, jobs: Long, tasks: Long,
                                taskTimeMs: Long, cpuTimeMs: Long,
                                shuffleReadBytes: Long, shuffleWriteBytes: Long,
                                spillBytes: Long, inputBytes: Long,
                                outputRows: Long)

  private final class Capture(group: String) extends SparkListener {
    val stages = ConcurrentHashMap.newKeySet[Int]()
    val jobsStarted = new LongAdder; val jobsEnded = new LongAdder
    val tasks = new LongAdder; val taskTime = new LongAdder
    val cpuTime = new LongAdder
    val shufRead = new LongAdder; val shufWrite = new LongAdder
    val spill = new LongAdder; val input = new LongAdder
    val outRows = new LongAdder

    override def onJobStart(e: SparkListenerJobStart): Unit =
      if (Option(e.properties).exists(p =>
          group == p.getProperty("spark.jobGroup.id"))) {
        jobsStarted.increment()
        e.stageIds.foreach(stages.add(_))
      }

    override def onJobEnd(e: SparkListenerJobEnd): Unit = jobsEnded.increment()

    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (stages.contains(e.stageId) && e.taskMetrics != null) {
        val m = e.taskMetrics
        tasks.increment()
        taskTime.add(e.taskInfo.duration)
        cpuTime.add(m.executorCpuTime / 1000000L)
        shufRead.add(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.add(m.shuffleWriteMetrics.bytesWritten)
        spill.add(m.memoryBytesSpilled + m.diskBytesSpilled)
        input.add(m.inputMetrics.bytesRead)
        outRows.add(m.outputMetrics.recordsWritten)
      }
  }

  /** Run `body` under job group `tag` and return (result, metrics).
    * `settleMs` bounds the wait for asynchronous listener delivery after
    * the block returns (every job observed started must end). */
  def measure[T](spark: SparkSession, tag: String, settleMs: Long = 10000L)
                (body: => T): (T, QueryMetrics) = {
    val sc = spark.sparkContext
    val cap = new Capture(tag)
    sc.addSparkListener(cap)
    try {
      sc.setJobGroup(tag, s"graft:$tag", interruptOnCancel = false)
      val out = body
      sc.clearJobGroup()
      // listener events are asynchronous: wait until every job this
      // group started has ended (job-end events are not group-filtered,
      // so compare against the global end count conservatively via a
      // stability window), bounded by settleMs
      val deadline = System.nanoTime() + settleMs * 1000000L
      var last = -1L
      var stable = 0
      while (System.nanoTime() < deadline && stable < 3) {
        val now = cap.tasks.sum() + cap.jobsEnded.sum()
        if (now == last) stable += 1 else { stable = 0; last = now }
        Thread.sleep(50)
      }
      (out, QueryMetrics(tag, cap.jobsStarted.sum(), cap.tasks.sum(),
        cap.taskTime.sum(), cap.cpuTime.sum(), cap.shufRead.sum(),
        cap.shufWrite.sum(), cap.spill.sum(), cap.input.sum(),
        cap.outRows.sum()))
    } finally sc.removeSparkListener(cap)
  }
}
