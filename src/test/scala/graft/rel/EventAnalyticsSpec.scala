package graft.rel

import java.sql.Timestamp
import graft.SparkTestBase

/** q118/q119 semantics on planted fixtures: the funnel counts ORDER,
  * not mere presence (click-before-view does not convert), and the
  * retention matrix's offset-0 row equals each cohort's size. */
class EventAnalyticsSpec extends SparkTestBase {

  private def writeEvents(rows: Seq[(Long, String, Long, String)]): String = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("ev").toString
    // nanosecond int64 ts column, as the driver fixtures store it
    rows.toDF("event_id", "tss", "user_id", "event_type")
      .select($"event_id",
        (unix_micros(to_timestamp($"tss")) * 1000).as("ts"),
        $"user_id", $"event_type",
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("q118: conversion requires strict view < click < purchase order") {
    val t = (m: Int) => f"2024-01-01 00:$m%02d:00"
    val rows = Seq[(Long, String, Long, String)](
      // user 1: full ordered funnel
      (1L, t(1), 1L, "view"), (2L, t(2), 1L, "click"), (3L, t(3), 1L, "purchase"),
      // user 2: click BEFORE view — no step-2 conversion
      (4L, t(1), 2L, "click"), (5L, t(2), 2L, "view"), (6L, t(3), 2L, "purchase"),
      // user 3: view + click, purchase before click — stops at step 2
      (7L, t(1), 3L, "view"), (8L, t(2), 3L, "purchase"), (9L, t(3), 3L, "click"),
      // user 4: view only
      (10L, t(1), 4L, "view"))
    val dir = writeEvents(rows)
    val got = RelQueries.queries("q118_funnel")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("1_view", 4L, 1000000L),
      ("2_view_click", 2L, 500000L),      // users 1, 3
      ("3_view_click_purchase", 1L, 500000L))) // user 1 only
  }

  test("q121: a planted volume spike is flagged; steady hours are not") {
    // 10 steady hours with 2 views each, one hour with 30 — a >2-sigma
    // spike against the type's own distribution
    val steady = (0 until 10).flatMap { h =>
      Seq((h * 10L, f"2024-01-01 $h%02d:05:00", 1L, "view"),
        (h * 10L + 1, f"2024-01-01 $h%02d:35:00", 2L, "view"))
    }
    val spike = (0 until 30).map { i =>
      (1000L + i, f"2024-01-01 11:${i % 60}%02d:00", 3L, "view")
    }
    val dir = writeEvents(steady ++ spike)
    val got = RelQueries.queries("q121_anomaly_hours")(spark, dir)
      .collect().map(r => (r.getTimestamp(1).toString, r.getLong(2), r.getLong(4))).toSeq
    val flagged = got.filter(_._3 == 1L)
    assert(flagged.map(_._1) == Seq("2024-01-01 11:00:00.0"), s"got $got")
    assert(flagged.head._2 == 30L)
    assert(got.size == 11)
  }

  test("q119: offset-0 equals cohort size; a returning user lands in the right cell") {
    val rows = Seq[(Long, String, Long, String)](
      // cohort 2024-01-01: users 1, 2; user 1 returns on day 2
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 11:00:00", 2L, "view"),
      (3L, "2024-01-03 09:00:00", 1L, "click"),
      // cohort 2024-01-02: user 3
      (4L, "2024-01-02 08:00:00", 3L, "view"))
    val dir = writeEvents(rows)
    val got = RelQueries.queries("q119_retention")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 2L),
      ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L)))
  }

  test("q144: gaps are explicit grid rows and the last value carries forward") {
    // cohort user 3 (user_id % 19 == 3): two events in hour 0, one in
    // hour 3 — hours 1 and 2 are gaps that must appear with the hour-0
    // sum carried forward. user 22 spans a single hour (1-row grid).
    // user 5 is OUTSIDE the % 19 == 3 cohort and must not appear.
    val rows = Seq[(Long, String, Long, String)](
      (1L, "2024-01-01 00:10:00", 3L, "view"),
      (2L, "2024-01-01 00:40:00", 3L, "view"),
      (3L, "2024-01-01 03:20:00", 3L, "click"),
      (4L, "2024-01-01 07:00:00", 22L, "view"),
      (5L, "2024-01-01 01:00:00", 5L, "view"))
    val dir = writeEvents(rows)
    val got = RelQueries.queries("q144_resample_ffill")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      (3L, "2024-01-01 00:00:00.0", 2L, 0L, 2.0),
      (3L, "2024-01-01 01:00:00.0", 0L, 1L, 2.0), // gap row, hour-0 sum carried
      (3L, "2024-01-01 02:00:00.0", 0L, 1L, 2.0),
      (3L, "2024-01-01 03:00:00.0", 1L, 0L, 1.0),
      (22L, "2024-01-01 07:00:00.0", 1L, 0L, 1.0)), s"got $got")
  }

  test("q148: trailing-hour RANGE frame is inclusive-exact at the 3599 s boundary") {
    val rows = Seq[(Long, String, Long, String)](
      (1L, "2024-01-01 00:00:00", 1L, "view"), // es 0
      (2L, "2024-01-01 00:30:00", 1L, "view"), // es 1800
      (3L, "2024-01-01 00:59:59", 1L, "view"), // es 3599: frame [0, 3599] → 3
      (4L, "2024-01-01 01:00:00", 1L, "view"), // es 3600: frame [1, 3600] → excludes es 0
      (5L, "2024-01-01 01:00:00", 2L, "view")) // other user: own frame
    val dir = writeEvents(rows)
    val got = RelQueries.queries("q148_trailing_window")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      (1L, 1L, 1.0), (2L, 2L, 2.0), (3L, 3L, 3.0), (4L, 3L, 3.0), (5L, 1L, 1.0)),
      s"got $got")
  }
}
