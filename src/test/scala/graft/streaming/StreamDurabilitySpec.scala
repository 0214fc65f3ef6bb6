package graft.streaming

import graft.SparkTestBase
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming STATE DURABILITY — the leg StreamSoakSpec (shuffled +
  * redelivered replay) and the in-memory soak tests cannot cover: the
  * q235 attribution chain and the q139 quota run under the RocksDB
  * state store provider with a real checkpoint, the query is KILLED
  * mid-replay (stop() while source files are still unconsumed, state
  * full of pending purchases / provisional admits), restarted from the
  * checkpoint, and the ledger published through the exactly-once FILE
  * sink must still be byte-identical to the batch twin. This is the
  * executor-loss / driver-restart story a 100 TB/day stream needs:
  * state lives in the provider + checkpoint, not in the JVM, and
  * emit-once survives the restart because the sink's metadata log
  * makes replayed batches idempotent. */
class StreamDurabilitySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/events.parquet"))

  private val RocksDB =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** Stage the events (only the columns the operators read) as `n`
    * parquet files so maxFilesPerTrigger=1 gives a genuine multi-batch
    * replay with room to kill the query mid-stream. */
  private def stage(n: Int): (String, DataFrame) = {
    val root = java.nio.file.Files.createTempDirectory("graft-durable").toString
    val batch = Tables.events(spark, dir)
      .select(col("ts"), col("user_id"), col("event_type"), col("event_id"), col("value"))
    batch.repartition(n).write.parquet(s"$root/in")
    (root, batch)
  }

  /** Poll until at least `k` micro-batches committed, then stop() —
    * a mid-stream kill with most source files still unconsumed. */
  private def killAfter(q: org.apache.spark.sql.streaming.StreamingQuery, k: Int): Unit = {
    val deadline = System.currentTimeMillis() + 120000
    while (q.recentProgress.count(_.numInputRows > 0) < k &&
           System.currentTimeMillis() < deadline && q.isActive)
      Thread.sleep(5)
    q.stop()
    q.awaitTermination()
  }

  /** Append one sentinel event file (far-future, disjoint user id) to
    * the source dir — the watermark pusher; two pushes advance the
    * watermark then fire the armed timeouts. */
  private def pushSentinel(root: String, ts: java.sql.Timestamp, id: Long): Unit = {
    import spark.implicits._
    Seq((ts, 99999L, "view", id, Some(0.0)))
      .toDF("ts", "user_id", "event_type", "event_id", "value")
      .coalesce(1).write.mode("append").parquet(s"$root/in")
  }

  private def withRocksDB[T](body: => T): T = {
    val prior = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDB)
    try body
    finally prior match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None    => spark.conf.unset(ProviderKey)
    }
  }

  test("q235 attribution under RocksDB: kill mid-replay, restart from checkpoint, ledger equals the batch twin exactly") {
    assume(ready)
    withRocksDB {
      val (root, batch) = stage(16)
      try {
        val schema = spark.read.parquet(s"$root/in").schema
        // file replay is order-arbitrary, so the DELAY must cover the
        // 30-day span; the attribution HORIZON stays the production 7d
        def start() = EventStreams.attributionStream(
            spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(s"$root/in"),
            watermark = "90 days")
          .toDF("user_id", "purchase_id", "first_touch", "last_touch", "value_milli")
          .writeStream.format("parquet").option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ck")
          .outputMode("append").start()

        // run 1: consume a few micro-batches (purchases pile up in
        // RocksDB state — nothing can emit, the watermark is 90 days
        // behind), then KILL with most files unconsumed
        val q1 = start()
        killAfter(q1, k = 3)
        val consumed1 = q1.recentProgress.map(_.numInputRows).sum
        assert(consumed1 > 0, "run 1 must have committed at least one batch")
        assert(consumed1 < batch.count(),
          "the kill must land mid-replay (raise the file count if this flakes)")

        // run 2: restart from the checkpoint — RocksDB state must
        // restore, the source log must resume at the right file
        val q2 = start()
        try {
          q2.processAllAvailable()
          assert(q2.recentProgress.exists(_.numInputRows > 0),
            "the restart must consume the files the kill left behind")
          // the provider actually in use is RocksDB (progress carries
          // its custom metrics), not a silent fallback to HDFS-backed
          assert(q2.recentProgress.exists(_.json.contains("rocksdb")),
            s"expected RocksDB state store metrics in: ${Option(q2.lastProgress).map(_.json).getOrElse("<no progress>")}")
          // push the watermark past every purchase, then fire timeouts
          val maxTs = batch.agg(max(col("ts"))).collect()(0).getTimestamp(0)
          def plusDays(d: Int) = new java.sql.Timestamp(maxTs.getTime + d * 86400000L)
          pushSentinel(root, plusDays(100), 999001L); q2.processAllAvailable()
          pushSentinel(root, plusDays(101), 999002L); q2.processAllAvailable()
          pushSentinel(root, plusDays(102), 999003L); q2.processAllAvailable()
        } finally { q2.stop(); q2.awaitTermination() }

        // the exactly-once file sink's view of the ledger (metadata-log
        // aware read: replayed batches from the kill window are invisible)
        val streamed = spark.read.parquet(s"$root/out")
          .filter(col("user_id") =!= 99999L)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
            if (r.isNullAt(4)) null else java.lang.Long.valueOf(r.getLong(4)))).toSet
        val expected = graft.rel.RelQueries.attributionCredits(batch)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
            if (r.isNullAt(4)) null else java.lang.Long.valueOf(r.getLong(4)))).toSet
        assert(expected.size > 100, s"fixture must carry real purchases, got ${expected.size}")
        assert(streamed == expected,
          s"ledger diff after restart: onlyStream=${(streamed -- expected).take(3)} " +
            s"onlyBatch=${(expected -- streamed).take(3)}")
      } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("q139 quota under RocksDB: kill mid-replay, restart from checkpoint, admissions equal the batch rank twin") {
    assume(ready)
    withRocksDB {
      val (root, batch) = stage(16)
      try {
        val schema = spark.read.parquet(s"$root/in").schema
        def start() = EventStreams.quotaStream(
            spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(s"$root/in"),
            quota = 4, watermark = "90 days")
          .toDF("user_id", "win_start", "event_id", "rk")
          .writeStream.format("parquet").option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ck")
          .outputMode("append").start()

        val q1 = start()
        killAfter(q1, k = 3)
        assert(q1.recentProgress.map(_.numInputRows).sum < batch.count(),
          "the kill must land mid-replay (raise the file count if this flakes)")

        val q2 = start()
        try {
          q2.processAllAvailable()
          assert(q2.recentProgress.exists(_.json.contains("rocksdb")),
            s"expected RocksDB state store metrics in: ${Option(q2.lastProgress).map(_.json).getOrElse("<no progress>")}")
          val maxTs = batch.agg(max(col("ts"))).collect()(0).getTimestamp(0)
          def plusDays(d: Int) = new java.sql.Timestamp(maxTs.getTime + d * 86400000L)
          pushSentinel(root, plusDays(100), 999001L); q2.processAllAvailable()
          pushSentinel(root, plusDays(101), 999002L); q2.processAllAvailable()
          pushSentinel(root, plusDays(102), 999003L); q2.processAllAvailable()
        } finally { q2.stop(); q2.awaitTermination() }

        val streamed = spark.read.parquet(s"$root/out")
          .filter(col("user_id") =!= 99999L)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        // batch twin: the q139 window-rank formulation
        import org.apache.spark.sql.expressions.Window
        val expected = batch
          .select(col("user_id"), unix_micros(col("ts")).as("tu"), col("event_id"))
          .withColumn("win_start", expr("(tu DIV 3600000000) * 3600000000"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("user_id"), col("win_start")).orderBy(col("tu"), col("event_id"))))
          .filter(col("rk") <= 4)
          .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("win_start"),
            r.getAs[Long]("event_id"), r.getAs[Int]("rk").toLong)).toSet
        assert(expected.size > 500, s"fixture must carry real admissions, got ${expected.size}")
        assert(streamed == expected,
          s"admission diff after restart: onlyStream=${(streamed -- expected).take(3)} " +
            s"onlyBatch=${(expected -- streamed).take(3)}")
      } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }
}
