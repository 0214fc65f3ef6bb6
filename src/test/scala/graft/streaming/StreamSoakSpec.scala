package graft.streaming

import graft.SparkTestBase
import graft.core.Tables

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
}
