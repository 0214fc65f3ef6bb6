package graft.rel

import graft.SparkTestBase

/** Pins q211 attribution against a brute-force JVM replay — per-user
  * timelines scanned naively for each purchase's first/last touch in
  * the trailing 7-day window — plus the accounting contracts: both
  * models' totals tile the purchase count and value mass exactly
  * (including the '(none)' miss path), and the two models disagree on
  * the fixture (the delta IS the operator's output). */
class AttributionSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/events.parquet"))

  test("q211 equals the naive replay; totals tile purchases; models disagree") {
    assume(fixture)
    val ev = graft.core.Tables.events(spark, dir)
      .selectExpr("event_id", "user_id", "event_type", "value", "unix_micros(ts) AS tu")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), r.getLong(4)))
    val byUser = ev.groupBy(_._2)
    val W = 604800000000L
    val credits = ev.filter(_._3 == "purchase").map { case (_, u, _, v, tu) =>
      val touches = byUser(u)
        .filter(e => (e._3 == "click" || e._3 == "view") && e._5 >= tu - W && e._5 <= tu)
        .map(e => (f"${e._5}%020d|${e._1}%012d", e._3))
      val first = if (touches.isEmpty) "(none)" else touches.minBy(_._1)._2
      val last = if (touches.isEmpty) "(none)" else touches.maxBy(_._1)._2
      (first, last, math.floor(v * 1000 + 0.5).toLong)
    }
    val expected =
      credits.groupBy(_._1).map { case (t, g) =>
        ("first_touch", t) -> (g.length.toLong, g.map(_._3).sum) } ++
      credits.groupBy(_._2).map { case (t, g) =>
        ("last_touch", t) -> (g.length.toLong, g.map(_._3).sum) }
    val got = RelQueries.queries("q211_attribution")(spark, dir)
      .collect().map(r => ((r.getAs[String]("model"), r.getAs[String]("touch_type")),
        (r.getAs[Long]("n_conversions"), r.getAs[Long]("value_milli")))).toMap
    assert(got == expected, s"attribution replay mismatch:\n got=$got\n exp=$expected")
    // both models tile the purchase universe, count and value
    val purchases = credits.length.toLong
    val mass = credits.map(_._3).sum
    for (m <- Seq("first_touch", "last_touch")) {
      val rows = got.collect { case ((`m`, _), v) => v }
      assert(rows.map(_._1).sum == purchases, s"$m counts don't tile purchases")
      assert(rows.map(_._2).sum == mass, s"$m value doesn't tile purchase mass")
    }
    // the model delta is non-vacuous: at least one touch type is
    // credited differently by the two models
    val firstDist = got.collect { case (("first_touch", t), v) => t -> v._1 }.toMap
    val lastDist = got.collect { case (("last_touch", t), v) => t -> v._1 }.toMap
    assert(firstDist != lastDist, "fixture must make first- and last-touch disagree")
  }
}
