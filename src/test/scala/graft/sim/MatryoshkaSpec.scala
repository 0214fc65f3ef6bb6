package graft.sim

import graft.SparkTestBase

/** q116's truncation-recall curve: the full-width row is the identity
  * (overlap 10 — the internal sanity check), every overlap is in
  * [0, 10], all declared widths report, and the curve equals a
  * driver-side brute-force recomputation. */
class MatryoshkaSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/embeddings.parquet"))

  test("q116 equals a brute-force driver recomputation; w=64 is the identity row") {
    assume(ready)
    import spark.implicits._
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double], w: Int): Double = {
      var d = 0d; var na = 0d; var nb = 0d; var i = 0
      while (i < w) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = vecs(0L)
    def top10(w: Int): Set[Long] = vecs.filter(_._1 != 0L)
      .map { case (id, v) => id -> cos(q, v, w) }
      .toSeq.sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val full = top10(64)
    val expected = Seq(8, 16, 32, 64)
      .map(w => w.toLong -> top10(w).intersect(full).size.toLong).toMap
    val got = SimilarityQueries.queries("q116_matryoshka_recall")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"got $got expected $expected")
    assert(got(64L) == 10L)
    assert(got.values.forall(o => o >= 0L && o <= 10L))
  }
}
