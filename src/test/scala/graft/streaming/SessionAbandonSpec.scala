package graft.streaming

import graft.SparkTestBase

/** Pins q218 session abandonment against a brute-force JVM replay on
  * sf0.001: q62's exact gap rule (30-min, double-second arithmetic,
  * (ts, event_id) order), the reversed-rank last event, conversion
  * tagging, and the integer-ms roll-up are recomputed in plain Scala
  * and compared cell-for-cell. */
class SessionAbandonSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/events.parquet"))

  test("q218 equals the brute-force sessionization replay") {
    assume(fixture)
    val ev = graft.core.Tables.events(spark, dir)
      .selectExpr("user_id", "event_id", "event_type",
        "CAST(ts AS DOUBLE) AS tsd", "unix_millis(ts) AS tsm")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
    case class Sess(events: Seq[(Long, String, Double, Long)])
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._4, r._2)).map(r => (r._2, r._3, r._4, r._5))
      val out = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[(Long, String, Double, Long)]]
      var prev: Option[Double] = None
      sorted.foreach { e =>
        if (prev.isEmpty || e._3 - prev.get > 1800.0) out += scala.collection.mutable.ArrayBuffer(e)
        else out.last += e
        prev = Some(e._3)
      }
      out.map(b => Sess(b.toSeq))
    }.toSeq
    val expected = sessions.groupBy { s =>
      val conv = s.events.exists(_._2 == "purchase")
      val last = s.events.maxBy(e => (e._3, e._1))._2
      (conv, last)
    }.map { case (k, ss) =>
      val nEv = ss.map(_.events.length.toLong).sum
      val tot = ss.map(s => s.events.map(_._4).max - s.events.map(_._4).min).sum
      k -> (ss.length.toLong, nEv, tot, tot / ss.length)
    }
    val got = StreamQueries.queries("q218_session_abandonment")(spark, dir).collect()
      .map(r => (r.getAs[Boolean]("converted"), r.getAs[String]("last_type")) ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"),
          r.getAs[Long]("total_ms"), r.getAs[Long]("ms_per_session"))).toMap
    assert(got == expected, s"abandonment replay mismatch:\n got=$got\n exp=$expected")
    // structure: sessions tile the events; the dominant converted
    // outcome must be ending ON the purchase (events are near-uniform,
    // so a session containing a purchase usually ends elsewhere only
    // when more events follow within the gap)
    assert(got.values.map(_._2).sum == ev.length.toLong, "sessions must tile events")
    val convRows = got.filter(_._1._1)
    assert(convRows.nonEmpty && convRows.maxBy(_._2._1)._1._2 == "purchase")
    // non-vacuity: both converted and abandoned sessions exist
    assert(got.keys.exists(_._1) && got.keys.exists(!_._1))
  }

  test("q218 plan: ONE user-keyed shuffle feeds all three windows and the session aggregate") {
    assume(fixture)
    val df = StreamQueries.queries("q218_session_abandonment")(spark, dir)
    df.collect()
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      p +: kids.flatMap(nodes)
    }
    val all = nodes(df.queryExecution.executedPlan)
    val shuffles = all.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    // the scale claim: gap flags, session numbering, reversed last-event
    // rank AND the (user, session) aggregate all ride the single
    // hash(user_id) exchange (HashPartitioning(user) satisfies the
    // (user, session) clustering); only the ≤2×|types| roll-up and the
    // final orderBy shuffle again
    val userShuffles = shuffles.filter(_.outputPartitioning.toString.contains("user_id"))
    assert(userShuffles.size == 1,
      s"expected exactly 1 user-keyed exchange, got ${userShuffles.size}")
    assert(shuffles.size <= 3,
      s"plan re-shuffles: ${shuffles.size} exchanges (user + tiny roll-up + sort expected)")
  }
}
