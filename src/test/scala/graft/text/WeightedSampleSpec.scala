package graft.text

import java.security.MessageDigest
import graft.SparkTestBase

/** q123's token-weighted Bernoulli sampling: exact driver-side
  * recomputation, the length-proportional property (the longest doc's
  * keep rate ≈ 0.5; keep probability scales linearly with n_toks),
  * and determinism across repartitioning. */
class WeightedSampleSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def u16(docId: Long): Long =
    java.lang.Long.parseLong(md5hex(s"wsamp|$docId").take(4), 16)

  test("q123 equals the driver-side recomputation; keep rate tracks doc length") {
    assume(ready)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").count(_.nonEmpty).toLong))
      .filter(_._2 >= 1)
    val maxW = docs.map(_._2).max
    val expected = docs.map { case (id, n) =>
      (id, n, u16(id), if (u16(id) * maxW * 2 < n * 65536L) 1L else 0L)
    }.sortBy(_._1).toSeq
    val got = TextQueries.queries("q123_weighted_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // length-proportional property: among the top-quartile-length docs
    // the empirical keep rate must exceed the bottom quartile's
    val byLen = got.sortBy(_._2)
    val q = byLen.length / 4
    def rate(xs: Seq[(Long, Long, Long, Long)]) = xs.count(_._4 == 1L).toDouble / xs.length
    assert(rate(byLen.takeRight(q)) > rate(byLen.take(q)),
      s"long-doc rate ${rate(byLen.takeRight(q))} must exceed short-doc rate ${rate(byLen.take(q))}")
  }
}
