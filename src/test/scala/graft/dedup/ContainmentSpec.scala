package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** q98's containment detector: the fixture an excerpt/quote pipeline
  * cares about — a short doc whose text is a contiguous slice of a
  * long doc. Symmetric Jaccard (q44's score) stays far below any
  * dedup threshold because the long doc's union dilutes it; the
  * asymmetric containment score must still hit 100%. The end-to-end
  * test exists because candidates must NOT come from MinHash banding:
  * band recall tracks symmetric Jaccard (~9% at J≈0.15), so a banded
  * q98 would miss this very fixture ~91% of the time. */
class ContainmentSpec extends SparkTestBase {

  private val longText = (1 to 120).map(i => s"w$i").mkString(" ")
  private val excerpt = (41 to 60).map(i => s"w$i").mkString(" ") // 20-token slice

  test("an embedded excerpt scores containment 1.0 where Jaccard misses it") {
    import spark.implicits._
    val docs = Seq((1L, longText), (2L, excerpt)).toDF("doc_id", "text")

    val sh = DedupQueries.withShinglesOf(docs)
      .select($"doc_id", array_distinct($"shingles").as("sset"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val inter = sh(1L).intersect(sh(2L)).size
    val jaccard = inter.toDouble / sh(1L).union(sh(2L)).size
    val containment = inter.toDouble / math.min(sh(1L).size, sh(2L).size)
    assert(containment == 1.0, s"excerpt shingles must all be contained, got $containment")
    assert(jaccard < 0.7, s"symmetric Jaccard should miss this pair, got $jaccard")
  }

  test("q98 end-to-end flags the planted excerpt pair (the case banding would drop)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-containment").toString
    try {
      val unrelated = (1 to 50).map(i => s"x$i").mkString(" ")
      Seq((1L, longText), (2L, excerpt), (3L, unrelated))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = DedupQueries.queries("q98_containment_dedup")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5)))
      graft.core.ScratchCache.drain()
      val hit = got.find(p => p._1 == 1L && p._2 == 2L)
      assert(hit.isDefined, s"planted excerpt pair (1,2) not recalled; got ${got.mkString(", ")}")
      assert(hit.get._3 == 1000000L, s"expected containment 1000000 ppm, got ${hit.get._3}")
      assert(hit.get._4 == 1L, "excerpt pair must carry is_excerpt = 1")
      assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
        "the disjoint doc must produce no candidate pair")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("q98 on the fixture dir emits exact ppm arithmetic on every pair") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val got = DedupQueries.queries("q98_containment_dedup")(spark, dir).collect()
    assert(got.nonEmpty, "sf0.001 corpus has near-dup docs; q98 must emit candidates")
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < b, s"pair ($a,$b) not ordered")
      val (common, nmin, ppm) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(common >= 1L, s"candidate ($a,$b) shares no shingle")
      assert(ppm == common * 1000000L / nmin, s"ppm mismatch for ($a,$b)")
      assert(common <= nmin, s"intersection exceeds smaller set for ($a,$b)")
    }
  }
}
