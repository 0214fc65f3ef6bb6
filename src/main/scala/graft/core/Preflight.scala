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

  def bounded[T](what: String, timeoutMs: Long = defaultTimeoutMs,
                 onTimeout: () => Unit = () => ())(body: => T): Either[String, T] = {
    @volatile var outcome: Option[Either[Throwable, T]] = None
    val t = new Thread(
      { () => outcome = Some(try Right(body) catch { case e: Throwable => Left(e) }) }: Runnable,
      s"graft-preflight-$what")
    t.setDaemon(true)
    t.start()
    t.join(timeoutMs)
    outcome match {
      case Some(Right(v))                 => Right(v)
      case Some(Left(e)) if !NonFatal(e)  => throw e
      case Some(Left(e))                  =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName))
      case None =>
        t.interrupt()
        try onTimeout() catch { case NonFatal(_) => () }
        Left(s"preflight timed out after ${timeoutMs / 1000}s — builder construction/analysis hung")
    }
  }
}
