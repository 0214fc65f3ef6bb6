package graft.text

import graft.SparkTestBase

/** q173's frequency-class arithmetic: the engine computes coverage
  * without ever ranking the vocabulary, so the spec replays the curve
  * FROM the explicit global rank (the thing the engine avoids) and
  * pins that the fixture genuinely exercises a mid-class cut — the
  * case where tiebreak-independence is doing the work. */
class VocabCoverageSpec extends SparkTestBase {

  // sf0.01, not the usual sf0.001: the synthetic word pool is ~31
  // types, and only the larger fixture puts equal counts at ranks 10
  // and 11 — the mid-class cut this spec exists to exercise
  private val dir = "/root/testdata/sf0.01"
  private def ready = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q173 equals the explicit-rank recomputation; curve monotone; a checkpoint cuts inside a class") {
    assume(ready)
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).split("\\s+").filter(_.nonEmpty))
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    // the explicit global rank the engine never materializes
    val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }.map(_._2)
    val total = ranked.sum
    val checkpoints = Seq(10L, 100L, 1000L, 10000L)
    val expected = checkpoints.map { n =>
      val nEff = math.min(n, ranked.length.toLong)
      val covered = ranked.take(nEff.toInt).sum
      (n, nEff, covered, total, covered * 1000000L / total)
    }
    val got = TextQueries.queries("q173_vocab_coverage")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // curve contracts: monotone non-decreasing, bounded by 10^6 ppm
    got.sliding(2).foreach {
      case Seq(a, b) => assert(a._3 <= b._3 && a._5 <= b._5, "coverage must be monotone")
      case _ =>
    }
    assert(got.forall(_._5 <= 1000000L))
    // the fixture must exercise a MID-CLASS cut at some in-range
    // checkpoint: the type at rank N shares its frequency with the
    // type at rank N+1, so any rank-dependent tiebreak would still
    // yield this exact coverage — the property the engine relies on
    val midClass = checkpoints.exists { n =>
      n < ranked.length && ranked(n.toInt - 1) == ranked(n.toInt)
    }
    assert(midClass, "no checkpoint fell inside a frequency class — " +
      "the tiebreak-independence path is untested at this fixture")
  }
}
