package graft.dedup

import graft.SparkTestBase

/** Pins q216 n-gram novelty against a brute-force JVM replay on
  * sf0.001 (per-doc DISTINCT 5-grams, min-doc_id first-seen,
  * per-source floor-division ppm), plus the conservation law that
  * makes the numbers trustworthy: Σ n_novel over sources equals the
  * corpus's distinct-gram count (every gram is first-seen exactly
  * once). */
class NgramNoveltySpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def fixture = java.nio.file.Files.exists(
    java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q216 equals the brute-force novelty replay; novel mass conserves") {
    assume(fixture)
    val docs = graft.core.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val grams = docs.flatMap { case (id, src, text) =>
      val t = text.split("\\s+").filter(_.nonEmpty)
      if (t.length < 5) Seq.empty
      else (0 to t.length - 5).map(i => t.slice(i, i + 5).mkString(" "))
        .distinct.map(g => (id, src, g))
    }
    val firstSeen = grams.groupBy(_._3).view.mapValues(_.map(_._1).min).toMap
    val expected = grams.groupBy(_._2).map { case (src, gs) =>
      val novel = gs.count { case (id, _, g) => firstSeen(g) == id }.toLong
      src -> (gs.length.toLong, novel, novel * 1000000L / gs.length)
    }
    val got = DedupQueries.queries("q216_ngram_novelty")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> (r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_novel"), r.getAs[Long]("novelty_ppm"))).toMap
    graft.core.ScratchCache.drain()
    assert(got == expected, "novelty replay mismatch")
    // conservation: each distinct gram is novel in exactly one doc
    assert(got.values.map(_._2).sum == firstSeen.size.toLong,
      "sum of novel grams must equal the corpus distinct-gram count")
    // non-vacuity: the random-word fixture must have BOTH novel and
    // repeated grams, or the attribution join proves nothing
    assert(got.values.map(_._2).sum < got.values.map(_._1).sum)
    assert(got.values.forall { case (_, _, ppm) => ppm > 0 && ppm <= 1000000L })
  }
}
