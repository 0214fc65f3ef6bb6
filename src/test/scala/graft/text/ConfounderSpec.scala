package graft.text

import graft.SparkTestBase

/** Pins q230's score–length audit against a brute-force JVM replay on
  * sf0.001 (md5 feature weights, power-of-two buckets, truncating
  * integer division on a NEGATIVE score mass — the engine-parity case
  * this query verified empirically: DuckDB BIGINT // truncates toward
  * zero exactly like Spark DIV). */
class ConfounderSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q230 equals the brute-force confounder replay on a negative score mass") {
    assume(fixture)
    val docs = graft.core.Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    def weight(tok: String): Long = {
      val h = md5hex(s"feat|$tok")
      val hx = "0123456789abcdef"
      ((hx.indexOf(h.charAt(0))) * 16 + hx.indexOf(h.charAt(1)) - 128).toLong
    }
    val scored = docs.map(_.split("\\s+").filter(_.nonEmpty))
      .filter(_.nonEmpty)
      .map(t => (t.length.toLong, t.map(weight).sum))
    val expected = scored.groupBy { case (n, _) =>
      java.lang.Long.toBinaryString(n).length.toLong }
      .map { case (b, ds) =>
        val st = ds.map(_._1).sum; val ss = ds.map(_._2).sum
        // Scala / on Long truncates toward zero — the shared semantic
        b -> (ds.length.toLong, st, ss, ss * 1000L / st)
      }
    val got = TextQueries.queries("q230_score_length_confounder")(spark, dir).collect()
      .map(r => r.getAs[Long]("bucket") -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_tokens"), r.getAs[Long]("sum_score"),
        r.getAs[Long]("score_milli_per_token"))).toMap
    assert(got == expected, s"confounder replay mismatch:\n got=$got\n exp=$expected")
    // the parity case must actually be exercised: at least one bucket
    // carries a NEGATIVE score mass (the md5 weights are mean −0.5
    // per token, so the fixture guarantees it)
    assert(got.values.exists(_._3 < 0L), "no negative score mass — parity case unexercised")
    // non-vacuity: more than one bucket, so a trend is observable
    assert(got.size > 1)
  }
}
