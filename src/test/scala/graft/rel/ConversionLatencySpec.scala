package graft.rel

import graft.SparkTestBase

/** Pins q227's conversion-latency histogram against a brute-force JVM
  * replay on sf0.001 (first view, first at-or-after purchase, integer
  * minute floor, power-of-two buckets, floor-ppm shares). */
class ConversionLatencySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/events.parquet"))

  test("q227 equals the brute-force latency replay; cum reaches exactly 1e6") {
    assume(fixture)
    val ev = graft.core.Tables.events(spark, dir)
      .selectExpr("user_id", "event_type", "unix_millis(ts) AS ms").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val lat = byUser.flatMap { case (_, rows) =>
      val views = rows.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val fv = views.min
        val ps = rows.filter(r => r._2 == "purchase" && r._3 >= fv).map(_._3)
        if (ps.isEmpty) None else Some((ps.min - fv) / 60000L)
      }
    }.toSeq
    val nConv = lat.length.toLong
    val expected = lat.groupBy(m =>
      if (m <= 0L) 0L else java.lang.Long.toBinaryString(m).length.toLong)
      .map { case (b, ms) => b -> ms.length.toLong }
    val got = RelQueries.queries("q227_conversion_latency")(spark, dir).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_users"),
        r.getAs[Long]("share_ppm"), r.getAs[Long]("cum_ppm")))
    graft.core.ScratchCache.drain()
    assert(got.map(r => r._1 -> r._2).toMap == expected, "latency replay mismatch")
    // exact shares and a cumulative that lands exactly on 1e6 (the
    // last bucket's cum is floor(total*1e6/total))
    var run = 0L
    got.sortBy(_._1).foreach { case (_, n, share, cum) =>
      run += n
      assert(share == n * 1000000L / nConv)
      assert(cum == run * 1000000L / nConv)
    }
    assert(got.map(_._2).sum == nConv)
    assert(got.sortBy(_._1).last._4 == 1000000L)
    // non-vacuity: conversions spread over >1 bucket
    assert(got.length > 1)
  }
}
