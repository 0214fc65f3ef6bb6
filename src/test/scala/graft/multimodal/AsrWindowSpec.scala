package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q179 ASR window planning: planted durations exercise every branch
  * (single window, exact fit, tail clamp, tail merge, long clip), a
  * brute-force reference recomputes the plan per clip, and invariants
  * pin the scheduling contract the oracle hash can't express by name:
  * full coverage, exact decoder-context overlap, and no wasted decode
  * call shorter than the minimum tail. */
class AsrWindowSpec extends SparkTestBase {

  import MultimodalQueries.{AsrWinMs => W, AsrStrideMs => S, AsrMinTailMs => MT}

  // brute-force reference: (start, end, isMerged) per window
  private def ref(dur: Long): Seq[(Long, Long, Boolean)] = {
    require(dur > 0)
    val nRaw = if (dur <= W) 1L else (dur - W + S - 1) / S + 1
    val merged = nRaw >= 2 && dur - (nRaw - 1) * S < MT
    val n = if (merged) nRaw - 1 else nRaw
    (0L until n).map { i =>
      val start = i * S
      val end = if (i == n - 1) dur else start + W
      (start, end, i == n - 1 && merged)
    }
  }

  private val durations = Seq(
    4400L,          // short clip: single window
    W,              // exact fit: single window, no merge
    W + 1,          // just over: n_raw=2, tail 2001ms... merged into one
    31000L,         // merge collapses to a single (extended) window
    33000L,         // tail exactly MT: NOT merged (strict <)
    32999L,         // tail MT-1: merged
    58000L,         // tail = W exactly, two windows, no merge
    60000L,         // planted merge at n_raw=3
    129100L,        // long clip, 5 windows, no merge
    200000L)        // longer still

  test("q179 core matches the brute-force plan on planted durations and holds the scheduling invariants") {
    val clips = spark.createDataFrame(
      durations.zipWithIndex.map { case (d, i) => (i.toLong, d) }
    ).toDF("media_id", "dur_ms")
    val got = MultimodalQueries.asrWindowsOf(clips).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))

    durations.zipWithIndex.foreach { case (dur, id) =>
      val exp = ref(dur)
      val mine = got.filter(_._1 == id.toLong).sortBy(_._2)
      assert(mine.length == exp.length, s"clip $id dur=$dur window count")
      exp.zipWithIndex.foreach { case ((s0, e0, m0), i) =>
        val w = mine(i)
        assert(w._3 == s0 && w._4 == e0 && (w._6 == 1L) == m0,
          s"clip $id dur=$dur win $i: got $w expected ($s0,$e0,$m0)")
      }
      // invariants: coverage from 0 to dur; consecutive overlap is the
      // decoder context EXACTLY; no kept window shorter than the
      // minimum tail unless it is the clip's only window
      assert(mine.head._3 == 0L && mine.last._4 == dur)
      mine.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 == a._3 + S, "stride")
          assert(a._4 - b._3 == W - S, s"clip $id overlap")
        case _ => ()
      }
      mine.foreach { w =>
        val len = w._4 - w._3
        assert(len >= MT || mine.length == 1, s"clip $id window below MinTail: $w")
        assert(len < W + MT, s"clip $id window above merge bound: $w")
      }
    }
  }

  test("q179 catalog plan is map-side: the only exchange is the output sort") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val df = graft.SparkEntry.queries("q179_asr_windows")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("Generate explode") || p.contains("Generate"), p)
    // window plan rows cover the fixture: every doc yields >= 1 window
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(df.select(countDistinct(col("media_id"))).head.getLong(0) == nDocs)
  }
}
