package graft.text

import graft.SparkTestBase

/** q97's unigram-surprisal gate: exact driver-side recomputation
  * (corpus frequencies → integer bit-length surprisal → per-doc mean
  * ppm) and the monotonicity contract that makes bit-length a valid
  * surprisal proxy (more frequent ⇒ never more surprising). */
class SurprisalSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q97 equals the driver-side recomputation") {
    assume(ready)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
      .filter(_._2.nonEmpty)
    val cnt = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = cnt.values.sum
    def bits(tok: String): Long = java.lang.Long.toBinaryString(total / cnt(tok)).length.toLong
    val expected = docs.map { case (id, toks) =>
      val n = toks.length.toLong
      val sb = toks.map(bits).sum
      val ppm = sb * 1000000L / n
      (id, n, sb, ppm, if (ppm <= 10000000L) 1L else 0L)
    }.sortBy(_._1).toSeq
    val got = TextQueries.queries("q97_token_surprisal")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
  }

  test("surprisal is monotone: a more frequent token is never more surprising") {
    assume(ready)
    // pure arithmetic property of length(bin(total / cnt)) — check over
    // a realistic count range against a fixed total
    val total = 1000000L
    val bitsOf = (c: Long) => java.lang.Long.toBinaryString(total / c).length
    (1L until 1000L).foreach { c =>
      assert(bitsOf(c) >= bitsOf(c + 1), s"non-monotone at cnt=$c")
    }
  }
}
