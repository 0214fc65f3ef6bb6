package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Pins the streaming side of the per-key rate quota (q139's batch twin
  * is oracle-checked; this is the part DuckDB cannot see): emit-once
  * when the watermark clears the window, k-lowest admission under
  * shuffled multi-batch arrival, displacement of a provisional admit by
  * a late-but-in-watermark event, and agreement with the batch rank
  * formulation on the same data. */
class QuotaStreamSpec extends SparkTestBase {

  private def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
  private val HourUs = 3600L * 1000000L
  private val winUs = 1704067200L * 1000000L // 2024-01-01T00:00Z in µs (UTC session tz)

  test("quota: k-lowest admitted once the watermark passes the window, shuffled arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Long)]
    val q = EventStreams.quotaStream(
        input.toDF().toDF("ts", "user_id", "event_id"), quota = 4)
      .toDF("user_id", "win_start", "event_id", "rk")
      .writeStream.format("memory").queryName("quota_test").outputMode("append").start()
    try {
      // hour-0 events for user 1 arrive out of order across batches:
      // first batch carries minutes 50/30/20 — if admission were
      // arrival-order they'd be final; they are only provisional.
      // Watermark after this batch: 00:50 − 30 min = 00:20.
      input.addData((t(0, 50), 1L, 106L), (t(0, 30), 1L, 104L), (t(0, 20), 1L, 103L))
      q.processAllAvailable()
      assert(spark.table("quota_test").count() == 0, "must not emit before the watermark")
      // second batch: LATE-but-in-watermark events (00:22/00:28 ≥ the
      // 00:20 watermark) displace the provisional minute-50/40 admits;
      // watermark stays inside hour 0, so still no output
      input.addData((t(0, 22), 1L, 101L), (t(0, 28), 1L, 102L), (t(0, 40), 1L, 105L))
      q.processAllAvailable()
      assert(spark.table("quota_test").count() == 0, "still inside the watermark horizon")
      // push the watermark past hour 0's end (02:40 - 30min = 02:10);
      // the timeout fires on the following trigger
      input.addData((t(2, 40), 9L, 901L))
      q.processAllAvailable()
      input.addData((t(2, 41), 9L, 902L))
      q.processAllAvailable()
      val rows = spark.table("quota_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // the 4 LOWEST (ts, id) of hour 0 — 00:20(103), 00:22(101),
      // 00:28(102), 00:30(104); minute-40/50 throttled out
      assert(rows == Set(
        (1L, winUs, 103L, 1L), (1L, winUs, 101L, 2L),
        (1L, winUs, 102L, 3L), (1L, winUs, 104L, 4L)), s"got $rows")
    } finally q.stop()
  }

  test("quota: emission matches the batch window-rank twin on the same frame") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 7 users × variable volumes across two hours, ids unique
    val data = for {
      u <- 1L to 7L
      i <- 0L until (u + 3L)
    } yield (t(((i % 2) * 1).toInt, (i * 7 % 60).toInt), u, u * 100 + i)
    val input = MemoryStream[(Timestamp, Long, Long)]
    // a 10-hour watermark: the fully shuffled replay below reorders
    // arbitrarily across batches, so nothing may fall behind the
    // horizon — the twin claim is about ADMISSION order-independence,
    // not about late-drop policy (test 1 covers the horizon)
    val q = EventStreams.quotaStream(
        input.toDF().toDF("ts", "user_id", "event_id"), quota = 4,
        watermark = "10 hours")
      .toDF("user_id", "win_start", "event_id", "rk")
      .writeStream.format("memory").queryName("quota_twin_test").outputMode("append").start()
    try {
      val shuffled = new scala.util.Random(42).shuffle(data)
      val (a, b) = shuffled.splitAt(shuffled.size / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
      input.addData((t(13, 0), 99L, 9901L)); q.processAllAvailable()
      input.addData((t(13, 1), 99L, 9902L)); q.processAllAvailable()
      val streamed = spark.table("quota_twin_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // batch twin: row_number over (user, hour) by (ts, id), keep ≤ 4
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val batch = data.toDF("ts", "user_id", "event_id")
        .select($"user_id", unix_micros($"ts").as("tu"), $"event_id")
        .withColumn("win_start", expr("(tu DIV 3600000000) * 3600000000"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"user_id", $"win_start").orderBy($"tu", $"event_id")))
        .filter($"rk" <= 4)
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("win_start"),
          r.getAs[Long]("event_id"), r.getAs[Int]("rk").toLong)).toSet
      assert(streamed == batch,
        s"streamed-batch diff: ${streamed.diff(batch)} / ${batch.diff(streamed)}")
    } finally q.stop()
  }

  test("quota: state per live window is bounded at k pairs") {
    // contract documented on quotaStream: state is the ≤ quota lowest
    // (ts, id) pairs — verified structurally: merging N arrivals
    // through .sorted.take(quota) can never retain more than quota
    val merged = (List((5L, 1L), (3L, 2L), (9L, 3L)) ++
      Seq((1L, 4L), (2L, 5L), (7L, 6L))).sorted.take(4)
    assert(merged == List((1L, 4L), (2L, 5L), (3L, 2L), (5L, 1L)))
  }
}
