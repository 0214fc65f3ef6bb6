package graft.ingest

import graft.SparkTestBase

/** Pins q221 license-mix accounting against a brute-force JVM replay
  * on sf0.001: the md5 license carve, per-(license, lang) doc/token
  * masses, floor-division token shares, and trainable verdicts. */
class LicenseMixSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q221 equals the brute-force license replay; ledger tiles the corpus") {
    assume(fixture)
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "lang", "text").collect()
      .map { r =>
        val c = md5hex(s"lic|${r.getLong(0)}").charAt(0)
        val lic = if (c < '4') "cc-by" else if (c < '8') "cc0"
          else if (c < 'c') "web-crawl" else "restricted"
        (lic, r.getString(1), r.getString(2).split("\\s+").count(_.nonEmpty).toLong)
      }
    val allT = docs.map(_._3).sum
    val expected = docs.groupBy(d => (d._1, d._2)).map { case (k, ds) =>
      val nt = ds.map(_._3).sum
      k -> (ds.length.toLong, nt, nt * 1000000L / allT, k._1 != "restricted")
    }
    val got = IngestQueries.queries("q221_license_mix")(spark, dir).collect()
      .map(r => (r.getAs[String]("license"), r.getAs[String]("lang")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("token_share_ppm"), r.getAs[Boolean]("trainable"))).toMap
    assert(got == expected, "license replay mismatch")
    // all four buckets materialize on the fixture; masses tile the
    // corpus; shares floor-sum to ≤ 1e6 within one ulp per cell
    assert(got.keys.map(_._1).toSet ==
      Set("cc-by", "cc0", "web-crawl", "restricted"))
    assert(got.values.map(_._2).sum == allT)
    val shareSum = got.values.map(_._3).sum
    assert(shareSum <= 1000000L && shareSum >= 1000000L - got.size,
      s"floor shares must sum into (1e6 - cells, 1e6]: $shareSum")
    assert(got.forall { case ((lic, _), v) => v._4 == (lic != "restricted") })
  }
}
