package graft.dedup

import graft.SparkTestBase

/** Pins q231's width sweep against its own q106 single-width sibling
  * (the k=8 row must aggregate exactly q106's per-pair errors — same
  * pairs, same signatures) and the 1/√k law where the fixture can
  * support it: max error strictly shrinks at every width doubling;
  * the 2→8 mean shrinks too (per-row means are small-sample noisy,
  * so adjacent-step mean monotonicity is deliberately NOT pinned). */
class SigWidthSweepSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q231 k=8 row aggregates q106 exactly; max error shrinks per doubling") {
    assume(fixture)
    val sweep = DedupQueries.queries("q231_sig_width_sweep")(spark, dir).collect()
      .map(r => r.getAs[Long]("k") -> (r.getAs[Long]("n_pairs"),
        r.getAs[Long]("mean_abs_err_ppm"), r.getAs[Long]("max_abs_err_ppm"))).toMap
    graft.core.ScratchCache.drain()
    val q106 = DedupQueries.queries("q106_sig_jaccard_est")(spark, dir).collect()
      .map(_.getAs[Long]("err_ppm"))
    graft.core.ScratchCache.drain()
    assert(sweep.keySet == Set(2L, 4L, 8L))
    // cross-query consistency: the k=8 row IS q106's error column
    val (n8, mean8, max8) = sweep(8L)
    assert(n8 == q106.length.toLong, "pair universe drifted from q106")
    assert(mean8 == q106.sum / q106.length, "k=8 mean must aggregate q106's errors")
    assert(max8 == q106.max, "k=8 max must be q106's worst pair")
    // all three widths see the same pair universe
    assert(sweep.values.map(_._1).toSet.size == 1)
    // the 1/√k law, pinned where the sample supports it
    assert(sweep(2L)._3 > sweep(4L)._3 && sweep(4L)._3 > sweep(8L)._3,
      s"max error must shrink at every doubling: ${sweep.view.mapValues(_._3).toMap}")
    assert(sweep(2L)._2 > sweep(8L)._2,
      s"2→8 mean must shrink: ${sweep.view.mapValues(_._2).toMap}")
  }
}
