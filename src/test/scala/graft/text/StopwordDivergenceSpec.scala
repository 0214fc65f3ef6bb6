package graft.text

import graft.SparkTestBase

/** Pins q220 stopword divergence against a brute-force JVM replay on
  * sf0.001: the global top-20 (count desc, token asc), per-source
  * stopword counts, and the floor-division ppm L1 are recomputed in
  * plain Scala and compared cell-for-cell. */
class StopwordDivergenceSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q220 equals the brute-force divergence replay") {
    assume(fixture)
    val toks = graft.core.Tables.documents(spark, dir)
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).split("\\s+").filter(_.nonEmpty)
        .map(t => (r.getString(0), t)))
    val nAll = toks.length.toLong
    val globalCnt = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val stop = globalCnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    val bySrc = toks.groupBy(_._1)
    val expected = bySrc.map { case (src, ts) =>
      val nSrc = ts.length.toLong
      val srcCnt = ts.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val mass = stop.map { case (t, _) => srcCnt.getOrElse(t, 0L) }.sum
      val l1 = stop.map { case (t, c) =>
        math.abs(srcCnt.getOrElse(t, 0L) * 1000000L / nSrc - c * 1000000L / nAll) }.sum
      src -> (nSrc, mass * 1000000L / nSrc, l1)
    }
    val got = TextQueries.queries("q220_stopword_divergence")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("stop_mass_ppm"), r.getAs[Long]("l1_ppm"))).toMap
    graft.core.ScratchCache.drain()
    assert(got == expected, s"divergence replay mismatch")
    // non-vacuity: stopwords carry real mass on every source (the
    // fixture vocabulary is small so top-20 dominates), and sources
    // genuinely differ (at least two distinct l1 values)
    assert(got.values.forall(_._2 > 100000L), "stop mass suspiciously low")
    assert(got.values.map(_._3).toSet.size > 1, "L1 constant across sources — no signal")
  }
}
