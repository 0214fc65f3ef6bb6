package graft.layout

import graft.SparkTestBase

/** Calibrates q238 (HLL++ ANALYZE) against q217 (exact ANALYZE) — the
  * q25 discipline for the stats pass: the sketch column is gated here
  * because DuckDB cannot replay Spark's HLL++, while every non-sketch
  * column is byte-identical to the oracle-checked q217 (the md5 twin).
  * Also pins the reason q238 exists: the exact pass plans an Expand
  * (×6 row expansion of the whole scan — the catalog's slowest query),
  * the sketch pass must NOT.
  *
  * Measured error table at sf0.01 (deterministic — HLL++ hashing has
  * no seed): l_linenumber 7→7, l_linestatus 2→2, l_returnflag 3→3
  * (tiny NDVs exact), l_orderkey 14743→14206 (−3.6%), l_quantity
  * 50→52 (+4.0%), l_shipdate 2499→2644 (+5.8%) — all within 2σ of the
  * advertised rsd 0.05. */
class ApproxStatsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/lineitem.parquet"))

  test("q238 ndv_approx calibrated to q217 exact; non-sketch columns identical; no Expand") {
    assume(fixture)
    val exact = LayoutQueries.queries("q217_column_stats")(spark, dir).collect()
      .map(r => r.getAs[String]("col") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"), r.getAs[Long]("ndv"),
          r.getAs[String]("min_val"), r.getAs[String]("max_val"))).toMap
    val approx = LayoutQueries.queries("q238_column_stats_approx")(spark, dir).collect()
      .map(r => r.getAs[String]("col") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"), r.getAs[Long]("ndv_approx"),
          r.getAs[String]("min_val"), r.getAs[String]("max_val"))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, (nr, nn, ndv, mn, mx)) =>
      val (anr, ann, andv, amn, amx) = approx(c)
      // md5-twin contract: everything but the sketch is byte-identical
      assert((anr, ann, amn, amx) == (nr, nn, mn, mx), s"$c non-sketch drift")
      // calibration: tiny NDVs exact, large within 2x the rsd envelope
      if (ndv <= 10) assert(andv == ndv, s"$c: tiny NDV $ndv estimated $andv")
      else {
        val err = math.abs(andv - ndv).toDouble / ndv
        assert(err <= 0.10, f"$c: |err| $err%.3f beyond 2x rsd (exact $ndv, approx $andv)")
      }
    }
    // the scale argument, literally: exact plans Expand, sketch must not
    val pExact = LayoutQueries.queries("q217_column_stats")(spark, dir)
      .queryExecution.executedPlan.toString
    val pApprox = LayoutQueries.queries("q238_column_stats_approx")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(pExact.contains("Expand"), "q217 stopped planning Expand — revisit q238's premise")
    assert(!pApprox.contains("Expand"), s"q238 must be the no-Expand single pass:\n$pApprox")
  }
}
