package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Real Structured Streaming runs (readStream → transform → writeStream
  * with a memory source/sink): watermarked tumbling windows including
  * late-data drop, session windows, and batch/stream equivalence for
  * on-time data — the behaviors DuckDB cannot oracle (SURVEY.md §7.5). */
class StreamingSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
  private def tsAt(hour: Int, minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  test("tumbling window with watermark: on-time counts and late-data drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")
    val q = EventStreams.tumblingCountsStream(events)
      .writeStream.format("memory").queryName("tumbling_test").outputMode("update").start()
    try {
      // batch 1: two events in the 10:00 hour, one in 11:00
      input.addData((tsAt(10, 5), "click"), (tsAt(10, 40), "click"), (tsAt(11, 10), "view"))
      q.processAllAvailable()
      // batch 2: advance watermark far past 10:00 (12:30 - 30min = 12:00)
      input.addData((tsAt(12, 30), "view"))
      q.processAllAvailable()
      // batch 3: a LATE click at 10:50 — behind the watermark, must be dropped
      input.addData((tsAt(10, 50), "click"))
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .groupBy($"w_start", $"event_type").agg(max($"n").as("n")) // update mode: take latest
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows.contains((tsAt(10, 0), "click", 2L)), s"on-time counts wrong: $rows")
      assert(!rows.contains((tsAt(10, 0), "click", 3L)), "late event behind watermark must be dropped")
    } finally q.stop()
  }

  test("streaming sessionization via session_window groups by 30-min gaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "user_id")
    val q = EventStreams.sessionizeStream(events)
      .writeStream.format("memory").queryName("session_test").outputMode("append").start()
    try {
      // user 1: events at 10:00, 10:10 (same session), 11:30 (new session)
      input.addData((ts(0), 1L), (ts(10), 1L), (tsAt(11, 30), 1L))
      q.processAllAvailable()
      // push watermark forward so both sessions close
      input.addData((tsAt(14, 0), 99L))
      q.processAllAvailable()
      val rows = spark.table("session_test")
        .filter($"user_id" === 1L)
        .collect().map(r => (r.getTimestamp(1), r.getLong(3))).toSet
      assert(rows == Set((ts(0), 2L), (tsAt(11, 30), 1L)), s"got $rows")
    } finally q.stop()
  }

  test("streaming dedup drops repeated event_ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val events = input.toDF().toDF("ts", "event_id")
    val q = EventStreams.dedupStream(events)
      .writeStream.format("memory").queryName("dedup_test").outputMode("append").start()
    try {
      input.addData((tsAt(10, 0), 1L), (tsAt(10, 1), 2L), (tsAt(10, 1), 1L)) // 1 repeated in-batch
      q.processAllAvailable()
      input.addData((tsAt(10, 5), 2L), (tsAt(10, 6), 3L)) // 2 repeated across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_test").collect().map(_.getLong(1)).toSeq.sorted
      assert(ids == Seq(1L, 2L, 3L), s"each id exactly once, got $ids")
    } finally q.stop()
  }

  test("stream-stream interval join matches clicks to purchases within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val q = EventStreams.clickPurchaseJoinStream(
        clicks.toDF().toDF("ts", "user_id", "click_id"),
        purchases.toDF().toDF("ts", "user_id", "purchase_id"))
      .writeStream.format("memory").queryName("ssjoin_test").outputMode("append").start()
    try {
      clicks.addData((tsAt(10, 0), 1L, 100L), (tsAt(10, 0), 2L, 200L))
      purchases.addData((tsAt(10, 30), 1L, 900L),  // within 60 min of click 100
        (tsAt(12, 0), 2L, 901L))                   // 2 h after click 200 — outside
      q.processAllAvailable()
      // advance both watermarks so results finalize
      clicks.addData((tsAt(14, 0), 9L, 999L)); purchases.addData((tsAt(14, 0), 9L, 998L))
      q.processAllAvailable()
      val got = spark.table("ssjoin_test")
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet // (click_id, purchase_id)
      assert(got.contains((100L, 900L)))
      assert(!got.contains((200L, 901L)), "purchase beyond the horizon must not join")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join emits null-padded rows for unconverted clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val q = EventStreams.clickPurchaseLeftJoinStream(
        clicks.toDF().toDF("ts", "user_id", "click_id"),
        purchases.toDF().toDF("ts", "user_id", "purchase_id"))
      .writeStream.format("memory").queryName("ssleft_test").outputMode("append").start()
    try {
      clicks.addData((tsAt(10, 0), 1L, 100L), (tsAt(10, 0), 2L, 200L))
      purchases.addData((tsAt(10, 30), 1L, 900L), // converts click 100
        (tsAt(12, 0), 2L, 901L))                  // outside click 200's horizon
      q.processAllAvailable()
      // the null-padded row for click 200 must NOT be emitted while a
      // matching purchase could still arrive (watermark below horizon)
      val early = spark.table("ssleft_test")
        .filter($"click_id" === 200L).count()
      assert(early == 0, "outer row emitted before the watermark closed the horizon")
      // advance both watermarks past every horizon so outer results finalize
      clicks.addData((tsAt(14, 0), 9L, 999L)); purchases.addData((tsAt(14, 0), 9L, 998L))
      q.processAllAvailable()
      val got = spark.table("ssleft_test")
        .collect()
        .map(r => (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toSet // (click_id, purchase_id?)
      assert(got.contains((100L, Some(900L))), s"matched row missing: $got")
      assert(got.contains((200L, None)), s"null-padded row for unconverted click missing: $got")
      assert(!got.contains((200L, Some(901L))), "purchase beyond the horizon must not join")
    } finally q.stop()
  }

  test("mapGroupsWithState keeps cumulative per-user counts across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val q = EventStreams.runningCountsStream(input.toDF().toDF("user_id"))
      .toDF("user_id", "running")
      .writeStream.format("memory").queryName("state_test").outputMode("update").start()
    try {
      input.addData(1L, 1L, 2L)
      q.processAllAvailable()
      input.addData(1L, 2L, 2L)
      q.processAllAvailable()
      val latest = spark.table("state_test")
        .groupBy($"user_id").agg(max($"running").as("running"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(latest == Map(1L -> 3L, 2L -> 3L), s"got $latest")
    } finally q.stop()
  }

  test("funnel state machine converges to the batch stages under shuffled multi-batch arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStreams.funnelStageStream(
        input.toDF().toDF("ts", "user_id", "event_type"))
      .toDF("user_id", "stage")
      .writeStream.format("memory").queryName("funnel_test").outputMode("update").start()
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    def latestStages() = spark.table("funnel_test")
      .withColumn("rn", org.apache.spark.sql.functions.monotonically_increasing_id())
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.max_by($"stage", $"rn").as("stage"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      // user 1's click+purchase arrive BEFORE its view (out of order,
      // different batch); user 2's click precedes its view in event
      // time — must stay stage 1 forever
      input.addData((t(2), 1L, "click"), (t(3), 1L, "purchase"), (t(1), 2L, "click"))
      q.processAllAvailable()
      val mid = latestStages()
      assert(mid(1L) == 0L, s"no view yet: $mid") // click/purchase alone = stage 0
      // user 3 = view only; user 4 = view<click, never purchases. The
      // MaxValue "not seen" sentinel must not satisfy `v < c` / `c < p`.
      input.addData((t(1), 1L, "view"), (t(2), 2L, "view"),
        (t(1), 3L, "view"), (t(1), 4L, "view"), (t(2), 4L, "click"))
      q.processAllAvailable()
      val fin = latestStages()
      // late-arriving earlier view upgrades user 1 straight to stage 3;
      // user 2's view came after its click in EVENT time → stage 1;
      // view-only user 3 stays at 1; no-purchase user 4 stops at 2
      assert(fin == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 2L), s"got $fin")
    } finally q.stop()
  }

  test("flatMapGroupsWithState threshold alerts: emitted once at each crossing, split across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val q = EventStreams.thresholdAlertsStream(
        input.toDF().toDF("user_id", "value"), step = 100L)
      .toDF("user_id", "m")
      .writeStream.format("memory").queryName("alerts_test").outputMode("append").start()
    try {
      input.addData((1L, 60.0), (1L, 30.0)) // total 90: no alert
      q.processAllAvailable()
      assert(spark.table("alerts_test").count() == 0)
      input.addData((1L, 220.0), (2L, 100.0)) // user1 -> 310 (crosses 100,200,300), user2 -> 100
      q.processAllAvailable()
      val rows = spark.table("alerts_test")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L)), s"got $rows")
      input.addData((1L, 50.0)) // 360: no new multiple, nothing re-emitted
      q.processAllAvailable()
      assert(spark.table("alerts_test").count() == 4)
      // negative values: sum dips to 60 then climbs back to 340 — still
      // below the 360 high-water mark, so no multiple fires twice
      input.addData((1L, -300.0))
      q.processAllAvailable()
      input.addData((1L, 280.0))
      q.processAllAvailable()
      assert(spark.table("alerts_test").count() == 4,
        "re-crossing below the high-water mark must not re-emit alerts")
    } finally q.stop()
  }

  test("file sink + checkpoint: restart resumes from the offset log without duplicating output") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("ckpt").toString
    val (out, ckpt) = (s"$base/out", s"$base/ckpt")
    val input = MemoryStream[Long]
    def start() = input.toDF().toDF("event_id")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    // run 1: two batches, then a hard stop
    val q1 = start()
    input.addData(1L, 2L); q1.processAllAvailable()
    input.addData(3L); q1.processAllAvailable()
    q1.stop()
    // run 2: SAME checkpoint — the committed offsets must not replay
    val q2 = start()
    input.addData(4L, 5L); q2.processAllAvailable()
    q2.stop()
    val rows = spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq
    // exactly-once at the sink: every event exactly once across the restart
    assert(rows == Seq(1L, 2L, 3L, 4L, 5L), s"got $rows")
  }

  test("stream-static enrichment joins the broadcast dimension statelessly; batch and stream agree") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dims = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("c_custkey", "c_mktsegment")
    val data = Seq((tsAt(9, 5), 1L, 10.0), (tsAt(9, 30), 2L, 5.0),
      (tsAt(10, 5), 1L, 2.5), (tsAt(10, 6), 3L, 99.0)) // user 3: no dim row → dropped
    val input = MemoryStream[(Timestamp, Long, Double)]
    val q = EventStreams.enrichedSegmentCountsStream(
        input.toDF().toDF("ts", "user_id", "value"), dims)
      .writeStream.format("memory").queryName("enrich_test").outputMode("complete").start()
    try {
      // two batches: the dimension must enrich both without join state
      input.addData(data.take(2): _*)
      q.processAllAvailable()
      input.addData(data.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("enrich_test")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = EventStreams.enrichedSegmentCounts(data.toDF("ts", "user_id", "value"), dims)
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == batch)
      assert(!streamed.exists(_._4 == 99.0), "dimension-less user must not survive the inner join")
      // stateless join: the only stateful operator is the windowed agg
      assert(q.lastProgress.stateOperators.length == 1,
        s"expected 1 stateful operator (the window agg), got ${q.lastProgress.stateOperators.length}")
    } finally q.stop()
  }

  test("streaming corpus admission: corpus hits rejected, redelivery suppressed, batch twin agrees") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // static corpus knows "alpha"
    val corpus = Seq(md5hex("alpha")).toDF("digest")
    val input = MemoryStream[(Timestamp, Long, String)]
    val arrivals = input.toDF().toDF("ingest_ts", "doc_id", "text")
    val q = EventStreams.admissionStream(arrivals, corpus)
      .writeStream.format("memory").queryName("admission_test").outputMode("append").start()
    try {
      // batch 1: "alpha" is already in the corpus (reject), "beta" is new
      input.addData((tsAt(10, 0), 1L, "alpha"), (tsAt(10, 1), 2L, "beta"))
      q.processAllAvailable()
      // batch 2: "beta" redelivered within the watermark (suppress), "gamma" new
      input.addData((tsAt(10, 5), 3L, "beta"), (tsAt(10, 6), 4L, "gamma"))
      q.processAllAvailable()
      val streamed = spark.table("admission_test").collect().map(_.getString(0)).toSet
      assert(streamed == Set(md5hex("beta"), md5hex("gamma")),
        s"admitted set wrong: $streamed")
      // batch twin over the same arrivals emits the same admitted set
      val batchArrivals = Seq(
        (tsAt(10, 0), 1L, "alpha"), (tsAt(10, 1), 2L, "beta"),
        (tsAt(10, 5), 3L, "beta"), (tsAt(10, 6), 4L, "gamma"))
        .toDF("ingest_ts", "doc_id", "text")
      val batch = EventStreams.admissionStream(batchArrivals, corpus)
        .collect().map(_.getString(0)).toSet
      assert(batch == streamed, s"batch twin diverged: $batch vs $streamed")
    } finally q.stop()
  }

  test("batch and streaming tumbling counts agree for on-time data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val data = Seq((tsAt(9, 5), "a"), (tsAt(9, 55), "a"), (tsAt(10, 5), "b"), (tsAt(10, 6), "a"))
    // streaming pass
    val input = MemoryStream[(Timestamp, String)]
    val q = EventStreams.tumblingCountsStream(input.toDF().toDF("ts", "event_type"))
      .writeStream.format("memory").queryName("equiv_test").outputMode("complete").start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("equiv_test")
        .select($"w_start", $"event_type", $"n")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      // batch pass over the same frame (same transform family)
      val batch = EventStreams.tumblingCounts(data.toDF("ts", "event_type").withColumn("value", lit(1.0)))
        .select($"w_start", $"event_type", $"n")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
