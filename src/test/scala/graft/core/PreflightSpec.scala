package graft.core

import graft.SparkTestBase

/** Pins the bounded-preflight guard the full-catalog runners (Bench,
  * Verify, QueryCatalogContractSpec) wrap every builder in: a query
  * whose CONSTRUCTION hangs — the r12 q155 failure, where exponential
  * plan nesting spun the analyzer forever — must become one named
  * failed entry, never a dead run. */
class PreflightSpec extends SparkTestBase {

  test("well-behaved body returns Right") {
    assert(Preflight.bounded("ok", 30000L) { 41 + 1 } == Right(42))
  }

  test("a NonFatal throw becomes a Left with the message") {
    val r = Preflight.bounded("boom", 30000L) {
      throw new IllegalStateException("planted failure"); ()
    }
    assert(r == Left("planted failure"))
  }

  test("a fatal error is rethrown on the calling thread, not recorded") {
    intercept[java.lang.LinkageError] {
      Preflight.bounded("fatal", 30000L) { throw new LinkageError("planted"); () }
    }
  }

  test("a hung body times out into a named failure and fires onTimeout") {
    @volatile var fired = false
    val t0 = System.nanoTime()
    val r = Preflight.bounded("hang", 500L, onTimeout = () => fired = true) {
      Thread.sleep(600000L); ()
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(r.isLeft && r.swap.exists(_.contains("timed out")))
    assert(fired, "onTimeout callback must fire")
    assert(elapsedMs < 10000L, s"guard returned after ${elapsedMs}ms — not bounded")
  }

  test("a fatal thrown AFTER the caller timed out aborts the NEXT bounded call") {
    // r13 advice: an OOM/LinkageError landing on the daemon thread
    // after join() expired used to vanish into the never-re-read
    // outcome — the run kept benching in a corrupted JVM. Now it is
    // parked and rethrown by the next call.
    try {
      val r = Preflight.bounded("late-fatal", 300L) {
        // outlive the timeout, ignoring the guard's interrupt, then die
        val deadline = System.nanoTime() + 800L * 1000000L
        while (System.nanoTime() < deadline)
          try Thread.sleep(50L) catch { case _: InterruptedException => () }
        throw new LinkageError("late planted fatal"); ()
      }
      assert(r.isLeft && r.swap.exists(_.contains("timed out")))
      // give the daemon thread time to reach its throw
      Thread.sleep(1500L)
      val e = intercept[LinkageError] { Preflight.bounded("next", 30000L) { 1 } }
      assert(e.getMessage == "late planted fatal")
    } finally Preflight.resetEscapedFatal()
  }

  test("a deliberately-pathological exponential self-join query yields a failed entry, not a dead run") {
    // The r12 q155 failure mode, reproduced as a fixture: each round
    // self-joins the frame, so construction-time analysis clones a
    // plan that doubles per round — by round 24 the analyzer walk is
    // effectively unbounded. The builder polls interrupts BETWEEN
    // rounds so the runaway daemon thread stops shortly after the
    // guard fires instead of churning a core for the rest of the
    // suite; in Bench/Verify the interrupt lands the same way.
    import spark.implicits._
    val t0 = System.nanoTime()
    val r = Preflight.bounded("exponential-self-join", 1500L) {
      var d = spark.range(4).toDF("v")
      for (_ <- 1 to 24) {
        if (Thread.interrupted()) throw new InterruptedException("preflight interrupt")
        d = d.join(d.withColumnRenamed("v", "w"), $"v" === $"w").drop("w")
      }
      d.schema
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(r.isLeft && r.swap.exists(_.contains("timed out")),
      s"expected a preflight timeout, got $r")
    assert(elapsedMs < 30000L, s"guard returned after ${elapsedMs}ms — not bounded")
  }
}
