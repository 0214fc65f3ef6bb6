package graft.sim

import graft.SparkTestBase

/** q88's kNN majority-vote labeling, cross-checked against a
  * driver-side brute-force recomputation (same rounded-cosine ranking,
  * same vote/tie rules) from the raw parquet. */
class KnnLabelSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/embeddings.parquet"))

  test("q88 output equals the brute-force vote") {
    assume(ready)
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      // same left-to-right fold the codegen Expression and DuckDB use
      var dot = 0d; var na = 0d; var nb = 0d; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val corpus = raw.filter(_._1 >= 10)
    val expected = raw.filter(_._1 < 10).map { case (qid, _, qv) =>
      val top = corpus
        .map { case (id, lab, v) => (id, lab, r4(cos(v, qv))) }
        .sortBy { case (id, _, c) => (-c, id) }
        .take(10)
      val votes = top.groupBy(_._2).view.mapValues(_.length).toMap
      val (lab, n) = votes.toSeq.sortBy { case (l, c) => (-c, l) }.head
      qid -> ((lab, n.toLong))
    }.toMap
    val got = SimilarityQueries.queries("q88_knn_label")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got == expected, s"diff=${(got.toSet diff expected.toSet)} / ${(expected.toSet diff got.toSet)}")
  }
}
