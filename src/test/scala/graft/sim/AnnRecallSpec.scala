package graft.sim

import graft.SparkTestBase

/** Recall@10 of the approximate ANN paths against the brute-force
  * ground truth on the sf0.01 embeddings (500 × 64-dim, 20 query
  * vectors). The asserted floors are deliberately loose — they exist
  * to catch recall COLLAPSE (a bucketing bug, a sign flip in the
  * hyperplanes, a cell-assignment regression), not to certify a
  * particular operating point; the measured numbers are printed for
  * the round log so tuning PLANES / probe count / n_cells is an
  * informed decision, not a guess. */
class AnnRecallSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/embeddings.parquet"))
  private val N = 20 // query vectors
  private val K = 10

  test("multi-probe LSH dominates single-probe and clears the recall floor; IVF is non-degenerate") {
    assume(ready)
    val exact = SimilarityQueries.exactTopK(spark, dir, N, K).cache()
    val single = SimilarityQueries.recallAtK(exact, SimilarityQueries.lshTopK(spark, dir, N, K, multiProbe = false))
    val multi = SimilarityQueries.recallAtK(exact, SimilarityQueries.lshTopK(spark, dir, N, K, multiProbe = true))
    val multi4 = SimilarityQueries.recallAtK(exact, SimilarityQueries.lshTopK(spark, dir, N, K, multiProbe = true, tables = 4))
    val ivf = SimilarityQueries.recallAtK(exact, SimilarityQueries.ivfTopK(spark, dir, N, K))
    val ivf4 = SimilarityQueries.recallAtK(exact, SimilarityQueries.ivfTopK(spark, dir, N, K, nProbe = 4))
    info(f"recall@$K over $N queries: lsh-single=$single%.3f lsh-multi=$multi%.3f lsh-multi-4tables=$multi4%.3f ivf=$ivf%.3f ivf-nprobe4=$ivf4%.3f")
    println(f"[ann-recall] recall@$K over $N queries: lsh-single=$single%.3f lsh-multi=$multi%.3f lsh-multi-4tables=$multi4%.3f ivf=$ivf%.3f ivf-nprobe4=$ivf4%.3f")
    exact.unpersist()
    assert(multi >= single, f"multi-probe ($multi%.3f) must not lose to single-probe ($single%.3f)")
    assert(multi4 >= multi, f"4-table multi-probe ($multi4%.3f) must not lose to 1-table ($multi%.3f)")
    assert(multi4 >= 0.5, f"4-table multi-probe recall collapsed: $multi4%.3f < 0.5")
    assert(single > 0.0, f"single-probe recall is zero — bucketing is broken")
    assert(ivf > 0.0, f"IVF recall is zero — cell assignment is broken")
    assert(ivf4 >= ivf, f"nProbe=4 IVF ($ivf4%.3f) must not lose to nProbe=1 ($ivf%.3f)")
    assert(ivf4 >= 0.5, f"nProbe=4 IVF recall collapsed: $ivf4%.3f < 0.5")
  }
}
