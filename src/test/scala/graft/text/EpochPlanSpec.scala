package graft.text

import graft.SparkTestBase

/** q193 epoch plan: planted counts pin the temperature-sampling
  * arithmetic (τ=2 √-damping), the cap boundary (capped ⇔ raw epochs
  * STRICTLY above 4.000), the shortfall accounting, the
  * zero-token-source drop, and — with 100 TB-scale planted counts —
  * that the DECIMAL(38,0) budget×weight product never wraps where an
  * int64 product would. */
class EpochPlanSpec extends SparkTestBase {

  private def counts(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("source", "n_docs", "n_toks")
  }

  private def plan(rows: Seq[(String, Long, Long)]) =
    TextQueries.epochPlanOfCounts(counts(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toMap
  // value tuple: (n_toks, w_millis, target_toks, epochs_x1000,
  //               planned_toks, capped, shortfall_toks)

  test("q193: √-damping lifts the small source; brute-force arithmetic replay") {
    // head: 1,000,000 toks; tail: 10,000 toks. Proportional shares would
    // give the tail 1/101 of budget; √-damping gives it 1/11.
    val out = plan(Seq(("head", 100L, 1000000L), ("tail", 10L, 10000L)))
    val (wHead, wTail) = (1000000L, 100000L) // sqrt×1000 exact for squares
    assert(out("head")._2 == wHead && out("tail")._2 == wTail)
    val budget = 2L * 1010000L
    val wTot = wHead + wTail
    val tHead = budget * wHead / wTot // fits int64 at this scale
    val tTail = budget * wTail / wTot
    assert(out("head")._3 == tHead, out("head"))
    assert(out("tail")._3 == tTail, out("tail"))
    // tail raw epochs = 183636/10 = 18363 x1000 -> capped at 4000
    assert(out("tail")._4 == 4000L && out("tail")._6 == 1L)
    assert(out("tail")._5 == 10000L * 4000L / 1000L)
    assert(out("tail")._7 == tTail - 40000L, out("tail"))
    // head raw epochs = 1836363*1000/1000000 = 1836 -> uncapped
    assert(out("head")._4 == tHead * 1000L / 1000000L && out("head")._6 == 0L)
    assert(out("head")._7 == tHead - 1000000L * out("head")._4 / 1000L)
  }

  test("q193: cap fires strictly above 4.000; every DIV replays exactly") {
    // Perfect-square token counts make w_millis exact, so every stage of
    // the planner's DIV chain can be replayed by hand. (The exact
    // raw == 4000 boundary is not constructible from two √-weighted
    // sources under a fixed 2× budget — b = a(1+√2) has no integer
    // solution — so the boundary contract is pinned as: capped ⇔
    // raw STRICTLY > 4000, plus an exact-division solo replay.)
    val out = plan(Seq(("a", 1L, 62500L), ("b", 1L, 1000000L)))
    // w: a=250·1000=250000, b=1000·1000=1000000; corpus=1062500, budget=2125000
    // target a = 2125000·250000/1250000 = 425000 -> raw = 425000000/62500 = 6800 -> capped
    assert(out("a")._4 == 4000L && out("a")._6 == 1L)
    // b: target = 2125000·1000000/1250000 = 1700000 -> raw = 1700 -> uncapped
    assert(out("b")._4 == 1700L && out("b")._6 == 0L)
    // exact-edge fixture: single source alone gets budget=2·N -> raw 2000;
    // cap edge needs raw == 4000 exactly: use 4 equal sources? Each target
    // = 2·4N/4 = 2N -> 2000. Make one source tiny relative: counts where
    // division is exact — a=10000 toks with target 40000 -> raw 4000.
    val edge = plan(Seq(("tiny", 1L, 10000L), ("big", 1L, 3240000L)))
    // w tiny=100000, big=1800000; corpus=3250000, budget=6500000, wTot=1900000
    // target tiny = 6500000·100000/1900000 = 342105 -> raw 34210 (capped) — not the edge;
    // assert cap semantics still: raw > 4000 -> capped=1
    assert(edge("tiny")._6 == 1L)
    // The strict edge (raw == 4000 -> capped=0) via equal pair with 2×
    // multiplier yields raw 2000; construct directly: one source, budget
    // multiplier 2 -> raw 2000, uncapped, shortfall 0.
    val solo = plan(Seq(("only", 5L, 123457L)))
    assert(solo("only")._4 == 2000L && solo("only")._6 == 0L)
    assert(solo("only")._5 == 123457L * 2000L / 1000L)
    assert(solo("only")._7 == solo("only")._3 - solo("only")._5)
  }

  test("q193: zero-token sources are dropped; planned never exceeds target+rounding") {
    val out = plan(Seq(("empty", 3L, 0L), ("live", 2L, 400L)))
    assert(!out.contains("empty"))
    assert(out.contains("live"))
    out.values.foreach { v =>
      assert(v._5 <= v._3 || v._6 == 0L, v) // capped planned <= target
      assert(v._7 >= 0L, v)
    }
  }

  test("q193: 100 TB-scale counts — DECIMAL(38,0) product, no int64 wrap") {
    // 20 sources × 2.5e12 tokens ≈ a 100 TB corpus. corpus_toks·w_millis
    // ≈ 5e13·1.58e9 ≈ 8e22 — far past int64 (9.2e18); the plan must
    // still produce positive, budget-tiling targets.
    val rows = (0 until 20).map(i => (f"src$i%02d", 1000000L, 2500000000000L))
    val out = plan(rows)
    assert(out.size == 20)
    val budget = 2L * 20L * 2500000000000L
    out.values.foreach { case (n, w, target, ex, planned, capped, short) =>
      assert(target > 0L, "int64 wrap would go negative here")
      assert(ex == 2000L && capped == 0L, (ex, capped)) // equal sources: 2 epochs each
      assert(planned == n * 2L && short == target - planned)
    }
    val sumTargets = out.values.map(_._3).sum
    assert(sumTargets <= budget && budget - sumTargets < 20L * 1000L,
      s"targets should tile the budget up to per-source floor rounding: $sumTargets vs $budget")
  }

  test("q193 on the fixture: targets tile the √-weighted budget; n_toks matches q89's accounting") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val rows = graft.SparkEntry.queries("q193_epoch_plan")(spark, dir).collect()
    assert(rows.nonEmpty)
    val corpus = rows.map(_.getLong(2)).sum
    val budget = TextQueries.EpochBudgetMultiplier * corpus
    val sumTargets = rows.map(_.getLong(4)).sum
    assert(sumTargets <= budget && budget - sumTargets < rows.length.toLong * rows.length,
      s"$sumTargets vs $budget")
    rows.foreach { r =>
      val raw = r.getLong(4) * 1000L / r.getLong(2)
      assert(r.getLong(5) == math.min(raw, TextQueries.MaxEpochsX1000), r)
    }
  }
}
