package graft.sim

import graft.SparkTestBase

/** Pins q223's probe-cost curve: its rank-1 row must equal Σ cell²
  * over q219's balance table (the same index), the curve must be
  * conserving (full-probe cum cost = N² → exactly 1e6 ppm) and
  * monotone — the invariants that make the cost table trustworthy
  * next to AnnRecallSpec's recall@nprobe numbers. */
class ProbeCostSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/embeddings.parquet"))

  test("q223 conserves to N², is monotone, and agrees with q219 at rank 1") {
    assume(fixture)
    val curve = SimilarityQueries.queries("q223_probe_cost_curve")(spark, dir).collect()
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("rank_cost"),
        r.getAs[Long]("cum_cost"), r.getAs[Long]("scanned_ppm")))
      .sortBy(_._1)
    graft.core.ScratchCache.drain()
    val balance = SimilarityQueries.queries("q219_ivf_balance")(spark, dir).collect()
      .map(r => r.getAs[Long]("n_vecs"))
    graft.core.ScratchCache.drain()
    val n = balance.sum
    val liveCells = curve.length.toLong
    // every vector ranks every live cell exactly once: probing all of
    // them scans the whole corpus for every query
    assert(curve.map(_._2).sum == n * n, "total probe cost must be N²")
    assert(curve.last._3 == n * n && curve.last._4 == 1000000L)
    // rank 1 is the self-cell: cost = Σ cell² (big cells get more
    // queries AND cost more per query) — q219's table squared
    assert(curve.head._2 == balance.map(c => c * c).sum,
      "rank-1 cost must equal Σ cell² from the q219 balance table")
    // cum is strictly increasing, ranks are dense 1..cells
    assert(curve.map(_._1).toSeq == (1L to liveCells).toSeq)
    assert(curve.map(_._3).zip(curve.map(_._3).tail).forall { case (a, b) => b > a })
    // floor-exactness of the ppm column
    curve.foreach { case (_, _, cum, ppm) =>
      assert(ppm == cum * 1000000L / (n * n)) }
  }
}
