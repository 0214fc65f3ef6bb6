package graft.text

import graft.SparkTestBase

/** q191 ROC sweep: the oracle hash pins the values; this spec pins the
  * STRUCTURE a correct ROC must have — confusion identities, sweep
  * monotonicity, the everything-admitted endpoint — and that its
  * bucket histogram is exactly q176's (same scored frame, same
  * bucketing: the two views cannot disagree). */
class GateRocSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q191: confusion identities, monotone sweep, and the admit-everything endpoint") {
    assume(ready)
    val rows = graft.SparkEntry.queries("q191_gate_roc")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    val p = rows.head._2 + rows.head._4  // tp + fn constant
    val n = rows.head._3 + rows.head._5  // fp + tn constant
    rows.foreach { case (b, tp, fp, fn, tn, _, _) =>
      assert(tp + fn == p && fp + tn == n, s"identities broken at bucket $b")
      assert(tp >= 0 && fp >= 0 && fn >= 0 && tn >= 0)
    }
    // raising the threshold can only shed admissions
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(hi._2 <= lo._2 && hi._3 <= lo._3, s"sweep not monotone: $lo -> $hi")
      case _ => ()
    }
    // the lowest present bucket admits everything: TPR = 1e6 (if any positives)
    if (p > 0) assert(rows.head._6 == 1000000L, rows.head)
  }

  test("q191's bucket histogram is exactly q176's reliability-diagram histogram") {
    assume(ready)
    val roc = graft.SparkEntry.queries("q191_gate_roc")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2) - (if (r.getLong(0) == 0) 0L else 0L)))
    // recover per-bucket pos from the suffix sums: pos(b) = tp(b) - tp(next)
    val byB = graft.SparkEntry.queries("q191_gate_roc")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(2) + r.getLong(3)))
      .sortBy(_._1)
    val posPerBucket = byB.zip(byB.drop(1) :+ ((Long.MaxValue, 0L, 0L)))
      .map { case ((b, tp, tot), (_, tpN, totN)) => (b, tp - tpN, tot - totN) }
    val q176rows = graft.SparkEntry.queries("q176_score_calibration")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(2))).sortBy(_._1)
    assert(posPerBucket.map(t => (t._1, t._2, t._3)).toSeq ==
      q176rows.map(t => (t._1, t._2, t._3)).toSeq,
      s"histograms diverge:\n${posPerBucket.toSeq}\n${q176rows.toSeq}")
  }
}
