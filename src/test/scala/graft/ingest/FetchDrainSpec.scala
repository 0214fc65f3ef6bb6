package graft.ingest

import graft.SparkTestBase

/** Pins q208's fetch-drain plan: its page counts must tile q160's
  * admitted verdicts exactly (same fetches, same policy), the
  * delay/drain/bucket arithmetic is replayed JVM-side from the md5
  * carve, and the policy dim joins broadcast. */
class FetchDrainSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def delaySel(d: String) = md5hex(s"delay|$d").head < '8'
  private def delayVal(d: String) = "0123456789abcdef".indexOf(md5hex(s"delay|$d")(1)) + 1L

  test("q208 pages tile q160's admitted; delay/drain/bucket replay the carve; dim broadcast") {
    assume(fixture)
    val df = IngestQueries.queries("q208_fetch_drain")(spark, dir)
    val got = df.collect().map(r => r.getAs[String]("domain") ->
      (r.getAs[Long]("n_pages"), r.getAs[Long]("delay_s"),
        r.getAs[Long]("drain_s"), r.getAs[Long]("bucket"))).toMap
    assert(got.nonEmpty)
    // page counts == q160's admitted counts, domain for domain (drain
    // only prices ADMITTED pages — blocked/robots pages are not fetched)
    val adm = IngestQueries.queries("q160_policy_admission")(spark, dir)
      .collect().map(r => r.getAs[String]("domain") -> r.getAs[Long]("n_admitted"))
      .filter(_._2 > 0L).toMap
    assert(got.view.mapValues(_._1).toMap == adm,
      "drain page counts must tile q160's admitted verdicts")
    // arithmetic replay from the carve
    got.foreach { case (d, (n, delay, drain, bucket)) =>
      val expDelay = if (delaySel(d)) delayVal(d) else 1L
      assert(delay == expDelay, s"$d: delay $delay != carved $expDelay")
      assert(drain == n * delay, s"$d: drain $drain != $n*$delay")
      val expBucket =
        if (drain < 3600L) 0L else java.lang.Long.toBinaryString(drain / 3600L).length.toLong
      assert(bucket == expBucket, s"$d: bucket $bucket != $expBucket")
    }
    // both carve branches live
    assert(got.keys.exists(delaySel) && got.keys.exists(d => !delaySel(d)),
      "fixture must exercise carved and default delays")
    // the policy dim (now carrying the delay) broadcasts — q160's shape
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"policy dim must broadcast-join the fetch stream:\n$plan")
  }
}
