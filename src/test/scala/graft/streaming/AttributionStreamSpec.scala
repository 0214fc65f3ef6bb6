package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Pins the streaming side of first/last-touch attribution (q235's
  * batch ledger is oracle-checked; q211's roll-up is oracle-checked;
  * this is the part DuckDB cannot see): emit-once when the watermark
  * passes the purchase, a late-but-in-watermark touch landing in a
  * still-pending purchase's window, the '(none)' miss path, NULL value
  * credit, exact convergence of the streamed ledger — and of its q211
  * roll-up — to the batch twin under shuffled multi-batch replay, the
  * 7-day window boundary, and state drain after emission. */
class AttributionStreamSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  type Ev = (Timestamp, Long, String, Long, Option[Double])

  private def startStream(input: MemoryStream[Ev], name: String, watermark: String) =
    EventStreams.attributionStream(
        input.toDF().toDF("ts", "user_id", "event_type", "event_id", "value"),
        watermark = watermark)
      .toDF("user_id", "purchase_id", "first_touch", "last_touch", "value_milli")
      .writeStream.format("memory").queryName(name).outputMode("append").start()

  private def collectLedger(name: String) =
    spark.table(name).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        if (r.isNullAt(4)) null else java.lang.Long.valueOf(r.getLong(4)))
    }.toSet

  test("attribution: emit-once after the watermark passes the purchase; late touch lands") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = startStream(input, "attr_emit_test", watermark = "30 minutes")
    try {
      // batch 1: user 1 view 10:00, purchase 12:00 (value 5.0); user 2
      // purchase 10:30 with NO touch ever (miss path), NULL value.
      // Watermark after this batch: 12:00 - 30 min = 11:30 — PAST user
      // 2's purchase (which finalizes promptly via the no-data batch
      // that fires its timeout) but NOT past user 1's.
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "view", 1L, Some(2.0)),
        (ts("2024-01-01 12:00:00"), 1L, "purchase", 10L, Some(5.0)),
        (ts("2024-01-01 10:30:00"), 2L, "purchase", 20L, None))
      q.processAllAvailable()
      assert(collectLedger("attr_emit_test") ==
        Set((2L, 20L, "(none)", "(none)", null: java.lang.Long)),
        "only the already-final miss-path purchase may emit; user 1's is held")
      // batch 2: LATE-but-in-watermark click at 11:45 (>= the 11:30
      // watermark) — lands inside user 1's still-pending window and
      // must become the LAST touch. User 1 still not emittable.
      input.addData((ts("2024-01-01 11:45:00"), 1L, "click", 2L, Some(1.0)))
      q.processAllAvailable()
      assert(spark.table("attr_emit_test").count() == 1, "user 1 still inside the horizon")
      // push the watermark past both purchases (13:00 - 30 min =
      // 12:30); the timeout fires on the following trigger
      input.addData((ts("2024-01-01 13:00:00"), 9L, "view", 901L, Some(0.0)))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 13:01:00"), 9L, "view", 902L, Some(0.0)))
      q.processAllAvailable()
      val rows = collectLedger("attr_emit_test")
      assert(rows == Set(
        (1L, 10L, "view", "click", java.lang.Long.valueOf(5000L)),
        (2L, 20L, "(none)", "(none)", null: java.lang.Long)), s"got $rows")
    } finally q.stop()
  }

  test("attribution: streamed ledger and its q211 roll-up converge to the batch twin under shuffled replay") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // mixed fixture: 6 users x interleaved touch/purchase timelines
    // spanning ~5 days, plus exact 7-day-boundary users: user 7's only
    // touch sits at EXACTLY purchase - 7d (inside the RANGE frame),
    // user 8's at purchase - 7d - 1s (outside -> '(none)')
    val base = ts("2024-01-01 00:00:00").getTime
    def at(ms: Long) = new Timestamp(base + ms)
    val H = 3600L * 1000
    val types = Vector("view", "click", "purchase", "signup", "view", "purchase")
    val data: Seq[Ev] = (for {
      u <- 1L to 6L
      i <- 0L until (10L + u)
    } yield (at(i * (u + 2) * H), u, types((i % 6).toInt),
        u * 1000 + i, Some(((i * 13 % 400) + u).toDouble / 100.0))) ++ Seq[Ev](
      (at(0), 7L, "view", 7001L, Some(1.0)),
      (at(7L * 24 * H), 7L, "purchase", 7002L, Some(2.0)),
      (at(0), 8L, "view", 8001L, Some(1.0)),
      (at(7L * 24 * H + 1000), 8L, "purchase", 8002L, Some(2.0)))
    val input = MemoryStream[Ev]
    // watermark delay covering the whole span: the shuffled replay
    // reorders arbitrarily across batches, so nothing may be dropped
    // late — the twin claim is about ledger order-independence (test 1
    // covers the horizon/timing behavior)
    val q = startStream(input, "attr_twin_test", watermark = "50 days")
    try {
      val shuffled = new scala.util.Random(17).shuffle(data)
      val (a, rest) = shuffled.splitAt(shuffled.size / 3)
      val (b, c) = rest.splitAt(rest.size / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
      input.addData(c); q.processAllAvailable()
      // two pushes: first advances the watermark past every purchase
      // (+50d delay), second triggers the timeouts it armed
      input.addData((at(120L * 24 * H), 99L, "view", 9901L, Some(0.0)))
      q.processAllAvailable()
      input.addData((at(120L * 24 * H + 1000), 99L, "view", 9902L, Some(0.0)))
      q.processAllAvailable()
      val streamed = collectLedger("attr_twin_test")

      val batchDf = data.toDF("ts", "user_id", "event_type", "event_id", "value")
      val expected = graft.rel.RelQueries.attributionCredits(batchDf)
        .collect().map { r =>
          (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
            if (r.isNullAt(4)) null else java.lang.Long.valueOf(r.getLong(4)))
        }.toSet
      assert(expected.nonEmpty && expected.exists(_._3 != "(none)"),
        "fixture must produce real attributions")
      assert(streamed == expected,
        s"ledger diff: ${streamed.diff(expected)} / ${expected.diff(streamed)}")
      // boundary rows: exactly-7d touch attributes, 7d+1s misses
      assert(streamed.contains((7L, 7002L, "view", "view", java.lang.Long.valueOf(2000L))))
      assert(streamed.contains((8L, 8002L, "(none)", "(none)", java.lang.Long.valueOf(2000L))))

      // the q211 report rolled up from the STREAMED ledger equals the
      // roll-up of the batch ledger — same rollup code on both sides,
      // so this pins that streaming loses/duplicates no credit mass
      val rollStream = graft.rel.RelQueries.attributionRollup(
          spark.table("attr_twin_test").select(
            col("first_touch"), col("last_touch"), col("value_milli")))
        .collect().map(_.toSeq).toSeq
      val rollBatch = graft.rel.RelQueries.attributionRollup(
          graft.rel.RelQueries.attributionCredits(batchDf))
        .collect().map(_.toSeq).toSeq
      assert(rollStream == rollBatch, s"roll-up diff: $rollStream vs $rollBatch")
    } finally q.stop()
  }

  test("attribution: state drains after emission — touches age out, purchases leave at emit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = startStream(input, "attr_drain_test", watermark = "30 minutes")
    try {
      // user 1 purchase+touch, user 2 touch only — both fully in the past
      input.addData(
        (ts("2024-01-01 09:00:00"), 1L, "click", 1L, Some(1.0)),
        (ts("2024-01-01 10:00:00"), 1L, "purchase", 2L, Some(3.0)),
        (ts("2024-01-01 09:30:00"), 2L, "view", 3L, Some(1.0)))
      q.processAllAvailable()
      // jump the watermark 30 days ahead: user 1's purchase emits, and
      // BOTH users' touches age past the 7-day horizon -> state removed
      input.addData((ts("2024-01-31 00:00:00"), 9L, "view", 901L, Some(0.0)))
      q.processAllAvailable()
      input.addData((ts("2024-01-31 00:01:00"), 9L, "view", 902L, Some(0.0)))
      q.processAllAvailable()
      input.addData((ts("2024-01-31 00:02:00"), 9L, "view", 903L, Some(0.0)))
      q.processAllAvailable()
      assert(collectLedger("attr_drain_test") ==
        Set((1L, 2L, "click", "click", java.lang.Long.valueOf(3000L))))
      // only the watermark-pusher user 9 may still hold state
      val stateRows = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
      assert(stateRows <= 1, s"drained users must leave the store, got $stateRows rows")
    } finally q.stop()
  }
}
