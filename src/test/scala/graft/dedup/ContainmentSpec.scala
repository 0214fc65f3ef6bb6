package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** q98's containment detector: the fixture an excerpt/quote pipeline
  * cares about — a short doc whose text is a contiguous slice of a
  * long doc. Symmetric Jaccard (q44's score) stays far below any
  * dedup threshold because the long doc's union dilutes it; the
  * asymmetric containment score must still hit 100%. */
class ContainmentSpec extends SparkTestBase {

  test("an embedded excerpt scores containment 1.0 where Jaccard misses it") {
    import spark.implicits._
    val longText = (1 to 120).map(i => s"w$i").mkString(" ")
    val excerpt = (41 to 60).map(i => s"w$i").mkString(" ") // 20-token slice
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

  test("q98 on the fixture dir emits only banded candidates with exact ppm scores") {
    val dir = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet")))
    val pairs = DedupQueries.queries("q42_dedup_lsh_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = DedupQueries.queries("q98_containment_dedup")(spark, dir).collect()
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(pairs.contains((a, b)), s"($a,$b) not a banded candidate")
      val (common, nmin, ppm) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ppm == common * 1000000L / nmin, s"ppm mismatch for ($a,$b)")
      assert(common <= nmin, s"intersection exceeds smaller set for ($a,$b)")
    }
  }
}
