package graft.text

import graft.SparkTestBase

/** q93's rare-bigram fluency filter: accounting invariants (every doc
  * with ≥ 2 tokens appears; its bigram count is exactly dl − 1) and an
  * exact driver-side recomputation of the rare share. */
class RareBigramSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q93 equals the driver-side recomputation") {
    assume(ready)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+").filter(_.nonEmpty)))
      .filter(_._2.length >= 2)
    val bigrams = docs.map { case (id, toks) =>
      id -> toks.sliding(2).map(_.mkString(" ")).toArray
    }
    val corpusCnt = bigrams.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = bigrams.map { case (id, bs) =>
      val nb = bs.length.toLong
      val rare = bs.count(b => corpusCnt(b) <= 5).toLong
      val ppm = rare * 1000000L / nb
      (id, nb, rare, ppm, if (ppm <= 100000L) 1L else 0L)
    }.sortBy(_._1).toSeq
    val got = TextQueries.queries("q93_rare_bigram_rate")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    // every bigram-bearing doc accounted for, with exactly dl-1 occurrences
    assert(got.map(_._1) == docs.map(_._1).sorted.toSeq)
    val dls = docs.map { case (id, toks) => id -> toks.length.toLong }.toMap
    got.foreach { case (id, nb, _, _, _) => assert(nb == dls(id) - 1, s"doc $id") }
  }
}
