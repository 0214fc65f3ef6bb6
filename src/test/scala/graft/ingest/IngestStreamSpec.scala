package graft.ingest

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q161's streaming contract: the SAME sourceRollup transform, run
  * over a file-source readStream of the raw JSONL store with ONE FILE
  * PER MICRO-BATCH, converges to the batch answer bit-for-bit — the
  * continuous crawl loader is the batch loader incrementalized, with
  * quarantine riding each micro-batch's scan and one row of state per
  * source feed. */
class IngestStreamSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q161 file-source streaming ingest converges to the batch roll-up across micro-batches") {
    assume(fixture)
    val batch = IngestQueries.queries("q161_stream_raw_ingest")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(batch.nonEmpty && batch.exists(_._1 == "(corrupt)"),
      "fixture must quarantine at least one line")

    val stream = IngestQueries.readJsonlStream(spark, dir)
    assert(stream.isStreaming, "readJsonlStream must be a streaming frame")
    val q = IngestQueries.sourceRollup(stream)
      .writeStream.format("memory").queryName("ing161")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // maxFilesPerTrigger=1 must actually have split the work — a
      // single-batch run would prove nothing about incremental state
      assert(q.recentProgress.length > 1,
        s"expected multiple micro-batches, got ${q.recentProgress.length}")
      val streamed = spark.table("ing161")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      assert(streamed.toSeq == batch.toSeq,
        s"stream result diverged from batch:\n stream ${streamed.toSeq}\n batch  ${batch.toSeq}")
    } finally q.stop()
  }
}
