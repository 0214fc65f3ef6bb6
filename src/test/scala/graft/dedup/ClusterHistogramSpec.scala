package graft.dedup

import graft.SparkTestBase

/** Pins q222's histogram to q75's own cluster labeling (it must bin
  * the REAL fixpoint, not a lookalike) plus the conservation laws
  * that make the buckets trustworthy. */
class ClusterHistogramSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q222 bins q75's clusters exactly; masses tile the corpus") {
    assume(fixture)
    val clusters = DedupQueries.queries("q75_dedup_clusters")(spark, dir).collect()
      .map(r => r.getAs[Long]("cluster_id") -> r.getAs[Long]("doc_id"))
    graft.core.ScratchCache.drain()
    val sizes = clusters.groupBy(_._1).view.mapValues(_.length.toLong).values.toSeq
    val nAll = sizes.sum
    val expected = sizes.groupBy(s => java.lang.Long.toBinaryString(s).length.toLong)
      .map { case (b, ss) =>
        val docs = ss.sum
        b -> (ss.length.toLong, docs, docs - ss.length,
          (docs - ss.length) * 1000000L / nAll)
      }
    val got = DedupQueries.queries("q222_cluster_size_histogram")(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket") -> (r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_dupes"),
        r.getAs[Long]("dupe_mass_ppm"))).toMap
    graft.core.ScratchCache.drain()
    assert(got == expected, s"histogram mismatch:\n got=$got\n exp=$expected")
    // conservation: docs tile the corpus; the singleton bucket has
    // zero dupes by definition
    assert(got.values.map(_._2).sum == nAll)
    got.get(1L).foreach { case (nc, nd, dupes, _) =>
      assert(nc == nd && dupes == 0L, "bucket 1 must be pure singletons") }
    // non-vacuity: the fixture has real near-dup structure (some
    // bucket beyond singletons), or the histogram proves nothing
    assert(got.keys.exists(_ > 1L), "no multi-doc cluster on the fixture")
  }
}
