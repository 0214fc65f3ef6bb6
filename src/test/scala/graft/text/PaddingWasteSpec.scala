package graft.text

import graft.SparkTestBase

/** Pins q232's padding audit against a brute-force JVM replay on
  * sf0.001 (q85's exact batch assignment for both schemes, pad-to-
  * longest capacity arithmetic) plus the verdict the table exists to
  * deliver: bucketing measurably cuts the waste. */
class PaddingWasteSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q232 equals the brute-force padding replay; bucketing beats the baseline") {
    assume(fixture)
    val sized = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").count(_.nonEmpty).toLong))
      .filter(_._2 > 0)
    val nShards = math.max(1L, math.ceil(sized.length / 128.0).toLong) // TargetShardDocs
    def batches(withBucket: Boolean) = sized
      .map { case (id, n) =>
        val b = if (withBucket) java.lang.Long.toBinaryString(n).length.toLong else 0L
        (b, id % nShards, id, n)
      }
      .groupBy(r => (r._1, r._2)).toSeq.flatMap { case ((b, sh), rs) =>
        rs.sortBy(_._3).zipWithIndex.map { case ((_, _, _, n), i) =>
          (b, sh, i / 32, n) }
      }
      .groupBy(r => (r._1, r._2, r._3)).toSeq.map { case ((b, _, _), rs) =>
        (b, rs.length.toLong, rs.map(_._4).max, rs.map(_._4).sum) }
      .groupBy(_._1).map { case (b, bs) =>
        val payload = bs.map(_._4).sum
        val padded = bs.map(x => x._2 * x._3).sum
        b -> (bs.length.toLong, bs.map(_._2).sum, payload, padded,
          (padded - payload) * 1000000L / padded)
      }
    val expected =
      batches(withBucket = true).map { case (b, v) => ("bucketed", b) -> v } ++
        batches(withBucket = false).map { case (b, v) => ("unbucketed", b) -> v }
    val got = TextQueries.queries("q232_padding_waste")(spark, dir).collect()
      .map(r => (r.getAs[String]("scheme"), r.getAs[Long]("bucket")) ->
        (r.getAs[Long]("n_batches"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("payload_tokens"), r.getAs[Long]("padded_tokens"),
          r.getAs[Long]("waste_ppm"))).toMap
    graft.core.ScratchCache.drain()
    assert(got == expected, s"padding replay mismatch:\n got=$got\n exp=$expected")
    // conservation: both schemes batch the same docs and payload
    def tot(scheme: String, f: ((Long, Long, Long, Long, Long)) => Long) =
      got.collect { case ((s, _), v) if s == scheme => f(v) }.sum
    assert(tot("bucketed", _._2) == tot("unbucketed", _._2))
    assert(tot("bucketed", _._3) == tot("unbucketed", _._3))
    // the verdict: overall bucketed waste is decisively below the
    // unbucketed baseline (the measured value of dynamic batching)
    val wB = (tot("bucketed", _._4) - tot("bucketed", _._3)) * 1000000L / tot("bucketed", _._4)
    val wU = (tot("unbucketed", _._4) - tot("unbucketed", _._3)) * 1000000L / tot("unbucketed", _._4)
    assert(wB * 3 < wU * 2, s"bucketing should cut waste by ≥ a third: $wB vs $wU ppm")
  }
}
