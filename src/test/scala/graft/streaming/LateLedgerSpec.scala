package graft.streaming

import graft.SparkTestBase

/** Pins q205's late-data ledger against a full brute-force JVM replay:
  * the planted-lateness carve + delay ladder, the per-user arrival-
  * sequence running max, the d_us > W drop rule, and the per-(W, type)
  * roll-up are recomputed in plain Scala and compared cell-for-cell —
  * plus the contracts a single hash can't name: drops are monotone
  * non-increasing in W, and the fixture exercises both dropped and
  * clean cells at every W. */
class LateLedgerSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/events.parquet"))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def delayUs(eventId: Long): Long =
    if (md5hex(s"late|$eventId").head < '2') (eventId % 5) match {
      case 0 => 21600000000L; case 1 => 86400000000L; case 2 => 259200000000L
      case 3 => 864000000000L; case _ => 2592000000000L
    } else 0L
  private val delays = Seq(0L, 3600000000L, 86400000000L, 259200000000L, 864000000000L)

  test("q205 ledger equals the brute-force replay; monotone in W; non-vacuous") {
    assume(fixture)
    val ev = graft.core.Tables.events(spark, dir)
      .selectExpr("CAST(user_id AS LONG) AS u", "CAST(event_id AS LONG) AS i",
        "event_type", "unix_micros(ts) AS tu")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // replay: backdate carved events, per-user running max in arrival order
    val dUs = ev.groupBy(_._1).values.flatMap { g =>
      var runMax = Long.MinValue
      g.sortBy(_._2).map { case (_, i, t, tu) =>
        val t2 = tu - delayUs(i)
        val d = if (runMax == Long.MinValue) 0L else math.max(0L, runMax - t2)
        runMax = math.max(runMax, t2)
        (t, d)
      }
    }.toSeq
    val expected = (for {
      w <- delays
      (tpe, g) <- dUs.groupBy(_._1)
    } yield {
      val late = g.filter(_._2 > w)
      ((w / 1000000L, tpe), (g.size.toLong, late.size.toLong,
        late.size.toLong * 1000000L / g.size,
        if (late.isEmpty) 0L else late.map(_._2).max))
    }).toMap
    val got = StreamQueries.queries("q205_late_data_ledger")(spark, dir)
      .collect().map(r => ((r.getAs[Long]("w_s"), r.getAs[String]("event_type")),
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_late"),
          r.getAs[Long]("late_ppm"), r.getAs[Long]("max_late_us")))).toMap
    assert(got == expected, s"ledger replay mismatch:\n got=$got\n exp=$expected")
    // drops monotone non-increasing in W, per type
    val types = got.keys.map(_._2).toSet
    for (t <- types) {
      val byW = delays.map(w => got((w / 1000000L, t))._2)
      assert(byW == byW.sorted.reverse, s"type $t: drops not monotone in W: $byW")
    }
    // non-vacuous: lateness exists at the largest W, and some cell is clean
    assert(got.collect { case ((w, _), v) if w == 864000L => v._2 }.sum > 0,
      "planted 30d delays must survive the largest candidate W")
    assert(got.values.forall(v => v._2 < v._1),
      "no cell may drop everything — the carve is 1/8 of events")
    assert(got.collect { case ((w, _), v) if w == 0L => v._2 }.sum >
      got.collect { case ((w, _), v) if w == 864000L => v._2 }.sum,
      "larger watermark delays must recover some of the planted band")
  }
}
