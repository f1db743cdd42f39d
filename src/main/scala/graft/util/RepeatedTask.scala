package graft.util

import java.util.concurrent.{Executors, ScheduledFuture, ThreadFactory, TimeUnit}

/** Fixed-interval background task, re-expressing the reference's
  * RepeatedTimer (repeatedtimer.py:1-29): the realtime server arms
  * one of these to drain its ingest queues every 15 s
  * (realtime.py:42) and to re-review the dataset every
  * data_review_seconds (realtime.py:271).
  *
  * Like the reference's `_run` (re-arm first, then invoke), the next
  * tick is scheduled BEFORE the function runs, so a slow tick delays
  * but never cancels the cadence; unlike Python's one-shot
  * threading.Timer chain this uses a single daemon scheduler thread.
  * Overlap is impossible (one thread runs the ticks serially).
  * A tick that throws is logged and does not kill the schedule.
  */
final class RepeatedTask(intervalMillis: Long, name: String = "graft-repeated-task")(fn: () => Unit) {
  require(intervalMillis > 0, "interval must be positive")

  private val scheduler = Executors.newSingleThreadScheduledExecutor(new ThreadFactory {
    override def newThread(r: Runnable): Thread = {
      val t = new Thread(r, name)
      t.setDaemon(true)
      t
    }
  })
  @volatile private var handle: Option[ScheduledFuture[_]] = None
  @volatile private var running = false

  private val tick: Runnable = () =>
    try fn()
    catch {
      case e: Throwable => System.err.println(s"[$name] tick failed: ${e.getMessage}")
    }

  /** Arm the timer: first tick after one interval (repeatedtimer.py
    * `start`). Idempotent while running. Fixed RATE, not fixed
    * delay: the reference re-arms its Timer BEFORE invoking the
    * function, so a slow tick delays but never stretches the
    * cadence; scheduleAtFixedRate matches that (the single scheduler
    * thread still serializes ticks — an overrunning tick is followed
    * immediately, never concurrently).
    */
  def start(): Unit = synchronized {
    if (!running) {
      handle = Some(scheduler.scheduleAtFixedRate(tick, intervalMillis, intervalMillis, TimeUnit.MILLISECONDS))
      running = true
    }
  }

  /** Run one tick NOW on the scheduler thread, then continue on the
    * interval (repeatedtimer.py `start_immediately`).
    */
  def startImmediately(): Unit = synchronized {
    if (!running) {
      handle = Some(scheduler.scheduleAtFixedRate(tick, 0L, intervalMillis, TimeUnit.MILLISECONDS))
      running = true
    }
  }

  def isRunning: Boolean = running

  /** Cancel the schedule; a tick in flight completes. Restartable. */
  def stop(): Unit = synchronized {
    handle.foreach(_.cancel(false))
    handle = None
    running = false
  }

  /** Stop and release the scheduler thread (no restart after this). */
  def shutdown(): Unit = {
    stop()
    scheduler.shutdown()
  }
}
