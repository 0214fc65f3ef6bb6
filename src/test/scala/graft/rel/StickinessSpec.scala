package graft.rel

import graft.SparkTestBase

/** Pins q225 DAU/WAU/MAU against a brute-force JVM replay on sf0.001
  * (distinct (day, user) activity, trailing 7/30-day distinct-user
  * windows, floor-division stickiness) plus the containment laws that
  * make the dashboard trustworthy. */
class StickinessSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/events.parquet"))

  test("q225 equals the brute-force trailing-window replay") {
    assume(fixture)
    val du = graft.core.Tables.events(spark, dir)
      .selectExpr("CAST(to_date(ts) AS STRING) AS d", "user_id").distinct()
      .collect().map(r => (java.time.LocalDate.parse(r.getString(0)), r.getLong(1)))
    val days = du.map(_._1).distinct.sorted
    def win(d: java.time.LocalDate, n: Int) =
      du.filter { case (dd, _) => !dd.isAfter(d) && !dd.isBefore(d.minusDays(n - 1)) }
        .map(_._2).distinct.length.toLong
    val expected = days.map { d =>
      val dau = du.count(_._1 == d).toLong
      val wau = win(d, 7)
      d.toString -> (dau, wau, win(d, 30), dau * 1000000L / wau)
    }.toMap
    val got = RelQueries.queries("q225_stickiness")(spark, dir).collect()
      .map(r => r.getAs[String]("day") -> (r.getAs[Long]("dau"), r.getAs[Long]("wau"),
        r.getAs[Long]("mau"), r.getAs[Long]("dau_wau_ppm"))).toMap
    graft.core.ScratchCache.drain()
    assert(got == expected, s"stickiness replay mismatch")
    // containment: DAU ≤ WAU ≤ MAU every day; stickiness ≤ 1e6; and
    // the fixture spans enough days that the trailing windows differ
    // from plain DAU somewhere (non-vacuity of the range join)
    got.values.foreach { case (dau, wau, mau, ppm) =>
      assert(dau <= wau && wau <= mau && ppm <= 1000000L) }
    assert(got.values.exists { case (dau, wau, _, _) => wau > dau },
      "WAU never exceeds DAU — the trailing window did no work")
    assert(got.size == days.length)
  }
}
