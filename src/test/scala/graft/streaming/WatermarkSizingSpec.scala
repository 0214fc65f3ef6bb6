package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q184 watermark sizing: planted arrival sequences with hand-computed
  * disorder pin the bucket boundaries, the per-user isolation of the
  * running max, and the cumulative-ppm contract the oracle hash can't
  * name. */
class WatermarkSizingSpec extends SparkTestBase {

  private def ev(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_id", "tu")
      .select(col("user_id"), col("event_id"), timestamp_micros(col("tu")).as("ts"))
  }

  test("q184: planted disorder lands in the exact power-of-two buckets, per user") {
    val S = 1000000L // one second in micros
    val rows = Seq(
      // user 1: perfectly ordered -> all bucket 0
      (1L, 1L, 10 * S), (1L, 2L, 20 * S), (1L, 3L, 30 * S),
      // user 2: 0.5 s late -> bucket 1; 3 s late -> bucket 3 ([2,4) s);
      //         100 s late -> bucket 8 ([64,128) s)
      (2L, 1L, 1000 * S),
      (2L, 2L, 1000 * S - S / 2),
      (2L, 3L, 2000 * S),
      (2L, 4L, 2000 * S - 3 * S),
      (2L, 5L, 3000 * S),
      (2L, 6L, 3000 * S - 100 * S),
      // user 3: an event EARLIER than user 2's max but in order for
      // user 3 -> bucket 0 (running max must not leak across users)
      (3L, 1L, 5 * S), (3L, 2L, 6 * S))
    val out = StreamQueries.watermarkSizingOf(ev(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byBucket = out.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byBucket(0L) == ((8L, 0L)), byBucket.get(0L))         // 3+3+2 in-order
    assert(byBucket(1L) == ((1L, S / 2)), byBucket.get(1L))
    assert(byBucket(3L) == ((1L, 3 * S)), byBucket.get(3L))
    assert(byBucket(8L) == ((1L, 100 * S)), byBucket.get(8L))
    assert(out.map(_._1).sorted.sameElements(out.map(_._1)), "sorted by bucket")
    // cumulative ppm is monotone and ends at exactly 1e6
    val cum = out.map(_._4)
    assert(cum.zip(cum.tail).forall(p => p._1 <= p._2) && cum.last == 1000000L, cum.toSeq)
  }

  test("q184: bucket boundaries are exact at the power-of-two edges") {
    val S = 1000000L
    // disorders: exactly 1 s (bucket 2: [1,2)), exactly 2 s (bucket 3),
    // exactly 4 s (bucket 4) — bit-length semantics, no log rounding
    val rows = Seq(
      (7L, 1L, 100 * S), (7L, 2L, 99 * S),
      (8L, 1L, 100 * S), (8L, 2L, 98 * S),
      (9L, 1L, 100 * S), (9L, 2L, 96 * S))
    val out = StreamQueries.watermarkSizingOf(ev(rows)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 1L), out)
  }

  test("q184 catalog plan: running max partitions by user, histogram combines map-side") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/events.parquet")))
    val p = graft.SparkEntry.queries("q184_watermark_sizing")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("windowspecdefinition(user_id"), p)
    assert(p.contains("partial_count") || p.contains("partial_max"), p)
  }
}
