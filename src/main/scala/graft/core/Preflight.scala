package graft.core

import scala.util.control.NonFatal

/** Bounded-time guard for catalog-query CONSTRUCTION + ANALYSIS.
  *
  * Round-12 lesson: the full-catalog runners (Bench preflight, Verify,
  * the contract spec) call every query builder, and a builder that
  * never RETURNS — q155's un-checkpointed iterative plan spun the
  * analyzer's clone walk for 300+ s of driver CPU with zero tasks
  * launched — starves the whole sweep: one pathological query zeroed
  * the round's bench AND correctness artifacts. Exceptions were
  * already handled (the r10 preflight); a non-terminating builder was
  * not.
  *
  * [[bounded]] runs the body on a fresh daemon thread and waits at
  * most `timeoutMs`. On timeout the offender becomes a NAMED failed
  * entry (`Left`) and the sweep continues; the runaway thread is
  * interrupted (best effort — a plan-explosion loop doesn't poll
  * interrupts, but the thread is a daemon so it never blocks JVM
  * exit) and `onTimeout` fires so callers can cancel any Spark jobs
  * the body had launched (builders that eagerly checkpoint run real
  * jobs at construction). A FRESH thread per call, not a pool: a hung
  * body would poison a shared worker for every later query — the
  * exact serial failure this guard exists to prevent.
  *
  * Fatal errors (OOM, linkage) are rethrown on the CALLING thread:
  * recording them as a per-query failure and benching on in a
  * corrupted JVM is the contamination the Bench preflight's NonFatal
  * policy already rules out.
  *
  * Spark-safety: builders receive their SparkSession explicitly and
  * the active-session thread-local is inheritable, so running them on
  * a child thread is the same execution environment as inline. */
object Preflight {

  /** Default per-query construction budget — generous because some
    * builders legitimately run jobs eagerly at construction (artifact
    * stores, per-round checkpoints); this is a HANG detector, not a
    * slowness detector. */
  def defaultTimeoutMs: Long =
    sys.env.getOrElse("SPARK_GRAFT_PREFLIGHT_TIMEOUT_SEC", "120").toLong * 1000L

  /** A fatal error (OOM, LinkageError) a body threw AFTER its caller
    * gave up waiting — the caller can no longer rethrow it inline, so
    * it is parked here and rethrown by the NEXT [[bounded]] call: the
    * run aborts one query later instead of benching on indefinitely in
    * a corrupted JVM (r13 advice — previously such an error was
    * recorded in the never-re-read outcome and silently swallowed). */
  private val escapedFatal =
    new java.util.concurrent.atomic.AtomicReference[Throwable](null)

  /** Test hook only: clear a parked fatal so one spec's planted error
    * cannot poison later suites in the same JVM. */
  private[core] def resetEscapedFatal(): Unit = escapedFatal.set(null)

  def bounded[T](what: String, timeoutMs: Long = defaultTimeoutMs,
                 onTimeout: () => Unit = () => ())(body: => T): Either[String, T] = {
    Option(escapedFatal.get()).foreach(throw _)
    @volatile var outcome: Option[Either[Throwable, T]] = None
    val t = new Thread(
      { () =>
        // JVM-corrupting errors are ALWAYS parked first (race-free vs
        // the caller's timeout path); the inline rethrow below un-parks
        // the one it delivers, so only a timed-out body's fatal stays
        // parked. Only VirtualMachineError/LinkageError qualify — an
        // InterruptedException here is the EXPECTED result of our own
        // post-timeout interrupt, not contamination.
        outcome = Some(try Right(body) catch { case e: Throwable =>
          if (e.isInstanceOf[VirtualMachineError] || e.isInstanceOf[LinkageError])
            escapedFatal.compareAndSet(null, e)
          Left(e)
        })
      }: Runnable,
      s"graft-preflight-$what")
    t.setDaemon(true)
    t.start()
    t.join(timeoutMs)
    outcome match {
      case Some(Right(v))                 => Right(v)
      case Some(Left(e)) if !NonFatal(e)  =>
        escapedFatal.compareAndSet(e, null); throw e
      case Some(Left(e))                  =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName))
      case None =>
        t.interrupt()
        try onTimeout() catch { case NonFatal(_) => () }
        Left(s"preflight timed out after ${timeoutMs / 1000}s — builder construction/analysis hung")
    }
  }
}
