package graft.text

import graft.SparkTestBase

/** q89's mixture-report invariants: full accounting (doc counts sum to
  * the corpus), ppm shares consistent with the integer token counts,
  * and a monotone cumulative curve ending at exactly 10⁶ ppm. */
class SourceMixtureSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q89 accounts for every doc and its cumulative share closes at 1e6 ppm") {
    assume(ready)
    val rows = TextQueries.queries("q89_source_mixture")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val totalDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_._2).sum == totalDocs, "every doc lands in exactly one source row")
    val totTokens = rows.map(_._3).sum
    rows.foreach { case (src, _, ntok, ppm, _) =>
      val want = math.floor(ntok.toDouble / totTokens * 1000000 + 0.5).toLong
      assert(ppm == want, s"$src share_ppm $ppm != $want")
    }
    // output is ordered by tokens desc: cumulative must be monotone and close at 1e6
    val cums = rows.map(_._5)
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b }, "cumulative share must be monotone")
    assert(cums.last == 1000000L, s"cumulative share must close at 1e6 ppm, got ${cums.last}")
  }
}
