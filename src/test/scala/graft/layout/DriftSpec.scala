package graft.layout

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q187 drift monitor: the i.i.d. fixture slices keep drifted=0
  * everywhere (oracle-checked zeros), so this spec plants a length-
  * regime shift, a same-distribution control, and a brand-new bucket
  * to pin the verdict flip, the χ² growth, and the one-sided-bucket
  * handling. */
class DriftSpec extends SparkTestBase {

  private def df(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("source", "doc_id", "n_chars")
  }

  private def run(base: Seq[(String, Long, Long)], delta: Seq[(String, Long, Long)]) =
    LayoutQueries.driftMonitorOf(df(base), df(delta)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap

  test("q187: a length-regime shift flips the verdict; an i.i.d. slice does not") {
    // steady: base and delta both ~100-char docs → identical buckets
    val steadyBase = (1L to 90L).map(i => ("steady", i, 100L))
    val steadyDelta = (91L to 120L).map(i => ("steady", i, 101L)) // same bucket (bitlen 7)
    // shifted: base ~100 chars (bucket 7), delta ~4000 chars (bucket 12)
    val shiftBase = (1L to 90L).map(i => ("shifted", i, 100L))
    val shiftDelta = (91L to 120L).map(i => ("shifted", i, 4000L))
    val out = run(steadyBase ++ shiftBase, steadyDelta ++ shiftDelta)
    val (sN, sD, sPpm, sChi, sFlag) = out("steady")
    assert((sN, sD, sPpm, sChi, sFlag) == ((90L, 30L, 0L, 0L, 0L)), out("steady"))
    val (_, _, shPpm, shChi, shFlag) = out("shifted")
    // delta mass moved entirely to a bucket with zero base share
    assert(shPpm == 1000000L && shFlag == 1L, out("shifted"))
    assert(shChi > sChi, "χ² must grow with drift")
  }

  test("q187: a bucket present only in the incoming slice is counted against a zero expectation") {
    val base = (1L to 50L).map(i => ("s", i, 100L))
    val delta = Seq(("s", 51L, 100L), ("s", 52L, 1000000L)) // one doc in a brand-new bucket
    val out = run(base, delta)
    val (_, nd, ppm, chi, _) = out("s")
    assert(nd == 2L)
    assert(ppm == 500000L, s"new bucket holds half the delta: $ppm")
    // e_milli = 0 for the new bucket → contribution (1000-0)² / 1 = 1e6
    assert(chi >= 1000000L, s"zero-expectation bucket must dominate χ²: $chi")
  }

  test("q187: the min-sample guard holds the verdict on tiny slices even at huge ppm swings") {
    // 3-doc delta entirely in a new bucket: ppm says 1e6, sample says
    // "too small to call" — the guard must win
    val base = (1L to 50L).map(i => ("s", i, 100L))
    val delta = (51L to 53L).map(i => ("s", i, 4000L))
    val out = run(base, delta)
    assert(out("s")._3 == 1000000L && out("s")._5 == 0L, out("s"))
  }

  test("q187 catalog fixture: drifted=0 on every source (i.i.d. slices; tiny deltas are guard-held)") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val out = graft.SparkEntry.queries("q187_drift_monitor")(spark, dir).collect()
    assert(out.nonEmpty && out.forall(_.getLong(6) == 0L),
      "the %7 slice is i.i.d. — a drift flag here is a bug")
  }
}
