package graft.streaming

import graft.SparkTestBase
import graft.core.Tables
import org.apache.spark.sql.functions._

/** Streaming soak on REAL data volume: the sf0.1 events table (not a
  * hand-sized fixture) is replayed through a file-source stream in
  * micro-batches, and q60's streaming output must equal its batch twin
  * row-for-row. StreamingSpec pins watermark/late-data/state semantics
  * on small fixtures; this closes the "batch twin ≡ stream" equivalence
  * at data volume, through the real file-source path (schema inference
  * off, maxFilesPerTrigger micro-batching, complete-mode agg state
  * carried across batches). */
class StreamSoakSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.1"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/events.parquet"))

  /** Stage the µs-truncated events as `n` parquet files and open a
    * 1-file-per-trigger stream over them. Returns (stagePath, stream,
    * batch frame, row count). Caller deletes the stage dir. */
  private def stagedStream(n: Int): (String, org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, Long) = {
    val stage = java.nio.file.Files.createTempDirectory("graft-soak").toString
    val batchEvents = Tables.events(spark, dir)
    val nRows = batchEvents.count()
    batchEvents.repartition(n).write.parquet(s"$stage/events")
    val schema = spark.read.parquet(s"$stage/events").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$stage/events")
    (stage, stream, batchEvents, nRows)
  }

  private def multiBatch(q: org.apache.spark.sql.streaming.StreamingQuery, atLeast: Int): Unit = {
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= atLeast, s"expected a multi-batch replay, got $batches batches")
  }

  test("q60 tumbling counts over a micro-batched file stream of sf0.1 events equal the batch run") {
    assume(ready)
    import spark.implicits._
    // Stage the events as MANY parquet files so maxFilesPerTrigger=1
    // yields a genuine multi-batch replay. The µs truncation happens at
    // staging (Tables.events), so the stream source reads a plain
    // timestamp column — the production layout.
    val stage = java.nio.file.Files.createTempDirectory("graft-soak").toString
    val batchEvents = Tables.events(spark, dir)
    val nRows = batchEvents.count()
    batchEvents.repartition(8).write.parquet(s"$stage/events")
    val schema = spark.read.parquet(s"$stage/events").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$stage/events")
    assert(stream.isStreaming)
    val q = EventStreams.tumblingCounts(stream)
      .writeStream.format("memory").queryName("soak_q60")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 8, s"expected a multi-batch replay, got $batches batches")
      val streamed = spark.table("soak_q60")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = EventStreams.tumblingCounts(batchEvents)
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(batch.nonEmpty && nRows > 10000L, s"soak fixture too small: $nRows rows")
      assert(streamed == batch,
        s"stream/batch divergence: onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  test("q102 stream-static enrichment over micro-batched sf0.1 events equals the batch run") {
    assume(ready)
    val (stage, stream, batchEvents, nRows) = stagedStream(8)
    val customers = Tables.customer(spark, dir)
    val q = EventStreams.enrichedSegmentCounts(stream, customers)
      .writeStream.format("memory").queryName("soak_q102")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      multiBatch(q, 8)
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val streamed = canon(spark.table("soak_q102"))
      val batch = canon(EventStreams.enrichedSegmentCounts(batchEvents, customers))
      assert(batch.nonEmpty && nRows > 10000L, s"soak fixture too small: $nRows rows")
      assert(streamed == batch,
        s"stream/batch divergence: onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  test("q103 left-outer interval join over micro-batched sf0.1 events equals the batch run") {
    assume(ready)
    import spark.implicits._
    val (stage, stream, batchEvents, _) = stagedStream(8)
    // files replay in arbitrary order, so the DELAY watermark must
    // cover the whole 30-day span (43200 min) or mid-replay "late"
    // rows get dropped; the join HORIZON stays the production 60 min
    val wmMin = 45000
    def carve(df: org.apache.spark.sql.DataFrame, et: String, idAs: String) =
      df.filter(col("event_type") === et)
        .select(col("ts"), col("user_id"), col("event_id").as(idAs))
    val joined = EventStreams.clickPurchaseLeftJoinStream(
      carve(stream, "click", "click_id"), carve(stream, "purchase", "purchase_id"),
      horizonMinutes = 60, watermarkMinutes = Some(wmMin))
    val q = joined.writeStream.format("memory").queryName("soak_q103")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      multiBatch(q, 8)
      // outer rows flush only once BOTH watermarks pass every click's
      // horizon: append a far-future sentinel click+purchase (disjoint
      // negative user ids so they match nothing, including each other)
      val maxTs = batchEvents.agg(max($"ts")).collect()(0).getTimestamp(0)
      val sentinelTs = new java.sql.Timestamp(maxTs.getTime + (wmMin + 120L * 60) * 60000L)
      Seq((-1L, sentinelTs, -1L, "click", 0.0, "{}"),
          (-2L, sentinelTs, -2L, "purchase", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(s"$stage/events")
      q.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("user_id") >= 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      val streamed = canon(spark.table("soak_q103")
        .select($"user_id", $"click_id", $"purchase_id"))
      val batch = canon(EventStreams.clickPurchaseLeftJoinStream(
          carve(batchEvents, "click", "click_id"), carve(batchEvents, "purchase", "purchase_id"))
        .select($"user_id", $"click_id", $"purchase_id"))
      assert(batch.exists(_._3 == -1L), "batch twin must contain unconverted clicks")
      assert(streamed == batch,
        s"stream/batch divergence: onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  /** ADVERSARIAL ARRIVAL staging: the events staged as `n` files, a
    * copy of every `dupEvery`-th file appended under a fresh name (the
    * at-least-once REDELIVERY a real source does on retry — same rows,
    * distinct path, so the file source ingests them twice), and every
    * file's mtime set to a deterministically SHUFFLED order, which is
    * the order the file source replays (it processes oldest-mtime
    * first) — so micro-batches arrive neither in write order nor in
    * event-time order. */
  private def stagedDisordered(n: Int, dupEvery: Int): (String, org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, Int) = {
    val stage = java.nio.file.Files.createTempDirectory("graft-soak-dis").toString
    val batchEvents = Tables.events(spark, dir)
    batchEvents.repartition(n).write.parquet(s"$stage/events")
    val evDir = new java.io.File(s"$stage/events")
    val parts = evDir.listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val dups = parts.zipWithIndex.collect { case (f, i) if dupEvery > 0 && i % dupEvery == 0 =>
      val d = new java.io.File(evDir, f.getName.replace("part-", "redeliver-"))
      java.nio.file.Files.copy(f.toPath, d.toPath)
      d
    }
    val rnd = new scala.util.Random(1234)
    rnd.shuffle((parts ++ dups).toSeq).zipWithIndex.foreach { case (f, i) =>
      assert(f.setLastModified(1700000000000L + i * 60000L), s"mtime not settable on $f")
    }
    val schema = spark.read.parquet(s"$stage/events").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$stage/events")
    (stage, stream, batchEvents, parts.length + dups.length)
  }

  // covers the sf0.1 event span (~30 days) so disorder never expires
  // in-flight state mid-replay
  private val SpanMinutes = 45000

  test("q235 attribution under shuffled + redelivered files: dedup + ledger converge to the batch twin") {
    assume(ready)
    import org.apache.spark.sql.functions.col
    // the full production chain: at-least-once file replay -> dedup
    // repair -> attribution ledger. Redelivered PURCHASES would emit
    // twice without the dedup stage; shuffled mtimes mean purchases
    // can arrive before their touches and vice versa.
    val (stage, stream, batchEvents, nFiles) = stagedDisordered(12, dupEvery = 3)
    val deduped = EventStreams.dedupStream(stream, watermark = s"$SpanMinutes minutes")
    val q = EventStreams.attributionStream(deduped, inputsPreWatermarked = true)
      .toDF("user_id", "purchase_id", "first_touch", "last_touch", "value_milli")
      .writeStream.format("memory").queryName("soak_q235").outputMode("append").start()
    try {
      q.processAllAvailable()
      multiBatch(q, nFiles)
      // the 45000-minute watermark sits behind every event until the
      // pusher below arrives — nothing may finalize during the replay
      assert(spark.table("soak_q235").count() == 0,
        "no purchase may emit before the watermark passes it")
      // two pusher files (touch-only rows for user 0, months ahead):
      // the first advances the watermark past every purchase, the
      // second triggers the armed timeouts
      def pusher(id: Long, t: String) = batchEvents.limit(1).selectExpr(
        s"CAST($id AS BIGINT) AS event_id", s"timestamp'$t' AS ts",
        "CAST(0 AS BIGINT) AS user_id", "'view' AS event_type",
        "CAST(0.0 AS DOUBLE) AS value", "props")
      pusher(999999901L, "2024-06-01 00:00:00")
        .write.mode("append").parquet(s"$stage/events")
      q.processAllAvailable()
      pusher(999999902L, "2024-06-01 00:01:00")
        .write.mode("append").parquet(s"$stage/events")
      q.processAllAvailable()
      def tuples(df: org.apache.spark.sql.DataFrame) = df
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
          if (r.isNullAt(4)) null else java.lang.Long.valueOf(r.getLong(4)))).toSet
      val streamed = tuples(spark.table("soak_q235"))
      val batch = tuples(graft.rel.RelQueries.attributionCredits(batchEvents)
        .select(col("user_id"), col("purchase_id"), col("first_touch"),
          col("last_touch"), col("value_milli")))
      assert(batch.size > 1000, s"soak fixture too small: ${batch.size} purchases")
      assert(streamed == batch,
        s"ledger divergence: onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  test("q102 under shuffled + redelivered files: dedup repair converges to the batch twin") {
    assume(ready)
    val (stage, stream, batchEvents, nFiles) = stagedDisordered(8, dupEvery = 2)
    val customers = Tables.customer(spark, dir)
    // production at-least-once composition: dedupStream in front of the
    // aggregate — the duplicated files are exactly the redelivery it
    // repairs (batch mode degrades to dropDuplicates, a no-op here)
    val q = EventStreams.enrichedSegmentCounts(
        EventStreams.dedupStream(stream, watermark = s"$SpanMinutes minutes"), customers)
      .writeStream.format("memory").queryName("soak_q102_dis")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      multiBatch(q, nFiles)
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val streamed = canon(spark.table("soak_q102_dis"))
      val batch = canon(EventStreams.enrichedSegmentCounts(
        EventStreams.dedupStream(batchEvents), customers))
      assert(batch.nonEmpty, "empty batch twin")
      assert(streamed == batch,
        s"disorder divergence: onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  test("q103 under shuffled + redelivered files: dedup + outer interval join converge") {
    assume(ready)
    import spark.implicits._
    val (stage, stream, batchEvents, nFiles) = stagedDisordered(8, dupEvery = 2)
    def carve(df: org.apache.spark.sql.DataFrame, et: String, idAs: String) =
      df.filter(col("event_type") === et)
        .select(col("ts"), col("user_id"), col("event_id").as(idAs))
    // each branch repairs redelivery independently (per-branch dedup
    // state), then the watermarked outer join runs on clean streams
    def dd(df: org.apache.spark.sql.DataFrame) =
      EventStreams.dedupStream(df, watermark = s"$SpanMinutes minutes")
    val joined = EventStreams.clickPurchaseLeftJoinStream(
      carve(dd(stream), "click", "click_id"), carve(dd(stream), "purchase", "purchase_id"),
      horizonMinutes = 60, inputsPreWatermarked = true)
    val q = joined.writeStream.format("memory").queryName("soak_q103_dis")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      multiBatch(q, nFiles)
      // NEVER EARLY: before the watermark-advancing sentinels, a
      // null-padded "did-not-convert" row may exist only for clicks
      // that are null-padded in the batch twin too — a click that DOES
      // convert must never have emitted a premature outer row, because
      // append-mode output is immutable (the real row could only be
      // emitted alongside it, a duplicate click_id).
      def tuples(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("user_id") >= 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
      val batchSeq = tuples(EventStreams.clickPurchaseLeftJoinStream(
          carve(batchEvents, "click", "click_id"), carve(batchEvents, "purchase", "purchase_id"))
        .select($"user_id", $"click_id", $"purchase_id"))
      val convertedClicks = batchSeq.collect { case (_, c, p) if p != -1L => c }.toSet
      val earlyNulls = tuples(spark.table("soak_q103_dis")
          .select($"user_id", $"click_id", $"purchase_id"))
        .collect { case (_, c, -1L) if convertedClicks(c) => c }
      assert(earlyNulls.isEmpty,
        s"outer rows emitted EARLY for clicks that later convert: ${earlyNulls.take(5)}")
      // flush outer state: far-future sentinels (see the in-order test)
      val maxTs = batchEvents.agg(max($"ts")).collect()(0).getTimestamp(0)
      val sentinelTs = new java.sql.Timestamp(maxTs.getTime + (SpanMinutes + 120L * 60) * 60000L)
      Seq((-1L, sentinelTs, -1L, "click", 0.0, "{}"),
          (-2L, sentinelTs, -2L, "purchase", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(s"$stage/events")
      q.processAllAvailable()
      val streamedSeq = tuples(spark.table("soak_q103_dis")
        .select($"user_id", $"click_id", $"purchase_id"))
      // EXACTLY ONCE: multiset equality, not set equality — a
      // redelivered file that slipped past the dedup stage would
      // double-emit join rows that a Set comparison silently collapses
      def multi(s: Seq[(Long, Long, Long)]) = s.groupBy(identity).view.mapValues(_.size).toMap
      val streamed = multi(streamedSeq)
      val batch = multi(batchSeq)
      assert(batchSeq.exists(_._3 == -1L), "batch twin must contain unconverted clicks")
      val onlyS = streamed.collect { case (k, n) if batch.getOrElse(k, 0) != n => (k, n) }
      val onlyB = batch.collect { case (k, n) if streamed.getOrElse(k, 0) != n => (k, n) }
      assert(onlyS.isEmpty && onlyB.isEmpty,
        s"disorder divergence (multiset): onlyStream=${onlyS.take(3)} onlyBatch=${onlyB.take(3)}")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  test("q63 under shuffled + redelivered files: dedup + inner interval join emit exactly once") {
    assume(ready)
    import spark.implicits._
    val (stage, stream, batchEvents, nFiles) = stagedDisordered(8, dupEvery = 2)
    def carve(df: org.apache.spark.sql.DataFrame, et: String, idAs: String) =
      df.filter(col("event_type") === et)
        .select(col("ts"), col("user_id"), col("event_id").as(idAs))
    def dd(df: org.apache.spark.sql.DataFrame) =
      EventStreams.dedupStream(df, watermark = s"$SpanMinutes minutes")
    val joined = EventStreams.clickPurchaseJoinStream(
      carve(dd(stream), "click", "click_id"), carve(dd(stream), "purchase", "purchase_id"),
      horizonMinutes = 60, inputsPreWatermarked = true)
    val q = joined.writeStream.format("memory").queryName("soak_q63_dis")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      multiBatch(q, nFiles)
      // inner matches need no state flush — but EXACTLY ONCE must hold
      // as a multiset: every redelivered click/purchase pair would
      // double-join if the per-branch dedup state leaked a duplicate
      def multi(df: org.apache.spark.sql.DataFrame) = df
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      val streamed = multi(spark.table("soak_q63_dis")
        .select($"user_id", $"click_id", $"purchase_id"))
      val batch = multi(EventStreams.clickPurchaseJoinStream(
          carve(batchEvents, "click", "click_id"), carve(batchEvents, "purchase", "purchase_id"))
        .select($"user_id", $"click_id", $"purchase_id"))
      assert(batch.nonEmpty, "batch twin must contain converted clicks")
      assert(batch.values.forall(_ == 1), "batch twin must be duplicate-free")
      val onlyS = streamed.collect { case (k, n) if batch.getOrElse(k, 0) != n => (k, n) }
      val onlyB = batch.collect { case (k, n) if streamed.getOrElse(k, 0) != n => (k, n) }
      assert(onlyS.isEmpty && onlyB.isEmpty,
        s"disorder divergence (multiset): onlyStream=${onlyS.take(3)} onlyBatch=${onlyB.take(3)}")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  test("q120 under shuffled + redelivered files: first-seen state is idempotent, no dedup needed") {
    assume(ready)
    import spark.implicits._
    val (stage, stream, batchEvents, nFiles) = stagedDisordered(8, dupEvery = 2)
    // the funnel state is a min-accumulator per user: redelivered rows
    // and arbitrary arrival order must both be absorbed by the state
    // itself — the strongest convergence claim, with NO repair stage
    val q = EventStreams.funnelStageStream(stream)
      .toDF("user_id", "stage")
      .writeStream.format("memory").queryName("soak_q120_dis")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      multiBatch(q, nFiles)
      val latest = spark.table("soak_q120_dis")
        .withColumn("rn", monotonically_increasing_id())
        .groupBy($"user_id").agg(max_by($"stage", $"rn").as("stage"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = EventStreams.funnelStageStream(batchEvents)
        .collect().map(t => t._1 -> t._2).toMap
      assert(batch.size > 100, s"soak fixture too small: ${batch.size} users")
      assert(latest == batch,
        s"disorder divergence on ${latest.toSet.diff(batch.toSet).take(5)}")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  test("q120 funnel state machine over micro-batched sf0.1 events converges to the batch stages") {
    assume(ready)
    import spark.implicits._
    val (stage, stream, batchEvents, _) = stagedStream(8)
    // update-mode state machine: first-seen mins are order-independent
    // accumulators, so ANY file replay order must converge to the
    // batch answer — the strongest form of the StreamingSpec property,
    // at data volume
    val q = EventStreams.funnelStageStream(stream)
      .toDF("user_id", "stage")
      .writeStream.format("memory").queryName("soak_q120")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      multiBatch(q, 8)
      val latest = spark.table("soak_q120")
        .withColumn("rn", monotonically_increasing_id())
        .groupBy($"user_id").agg(max_by($"stage", $"rn").as("stage"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = EventStreams.funnelStageStream(batchEvents)
        .collect().map(t => t._1 -> t._2).toMap
      assert(batch.size > 100, s"soak fixture too small: ${batch.size} users")
      assert(batch.values.toSet.size > 1, "fixture must exercise multiple stages")
      assert(latest == batch,
        s"stream/batch divergence on ${latest.toSet.diff(batch.toSet).take(5)}")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }

  test("q128 corpus admission over a micro-batched file stream of sf0.1 documents equals the batch twin") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val stage = java.nio.file.Files.createTempDirectory("graft-soak-docs").toString
    val docs = Tables.documents(spark, dir)
    val isBatch = substring(
      md5(concat(lit("batch|"), col("doc_id").cast("string"))), 1, 1).isin("0", "1")
    // base the ingest clock at 2024-01-01, not the epoch: the watermark
    // floors at 0, so an epoch-time row (doc_id 0) arriving late in the
    // shuffled replay would be dropped as behind-watermark
    val arrivals = docs.filter(isBatch)
      .withColumn("ingest_ts", expr("timestamp_micros((1704067200 + doc_id) * 1000000)"))
      .select(col("doc_id"), col("text"), col("ingest_ts"))
    val corpusDigests = docs.filter(!isBatch).select(md5(col("text")).as("digest")).distinct()
    val nArrivals = arrivals.count()
    arrivals.repartition(8).write.parquet(s"$stage/docs")
    val schema = spark.read.parquet(s"$stage/docs").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$stage/docs")
    // repartition shuffles arrival order across files, so a later
    // micro-batch can carry an EARLIER ingest_ts — the watermark delay
    // must cover the fixture's full ingest span (~83 min of doc_id
    // seconds) or the dedup operator drops those rows as late (the
    // same delay-vs-horizon split the interval-join soaks use)
    val q = EventStreams.admissionStream(stream, corpusDigests, watermark = "24 hours")
      .writeStream.format("memory").queryName("soak_q128")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      multiBatch(q, 8)
      val streamed = spark.table("soak_q128").collect().map(_.getString(0)).toSet
      val batch = EventStreams.admissionStream(arrivals, corpusDigests)
        .collect().map(_.getString(0)).toSet
      assert(nArrivals > 100 && batch.nonEmpty, s"soak fixture too small: $nArrivals arrivals")
      assert(batch.size < nArrivals,
        "fixture must exercise rejection/dedup (admitted digests < arriving docs)")
      assert(streamed == batch,
        s"stream/batch divergence: onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
  }
}
