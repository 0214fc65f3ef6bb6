package graft.text

import graft.SparkTestBase

/** q95's BPE merge ranking, cross-checked against a driver-side
  * recomputation (token counts → weighted adjacent char pairs →
  * top-20 by count, pair). */
class BpeMergesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q95 equals the driver-side recomputation") {
    assume(ready)
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).split("\\s+").filter(_.nonEmpty))
    val vocab = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairCnt = scala.collection.mutable.Map.empty[String, Long]
    vocab.foreach { case (t, c) =>
      if (t.length >= 2) t.sliding(2).foreach { p =>
        val key = s"${p(0)} ${p(1)}"
        pairCnt(key) = pairCnt.getOrElse(key, 0L) + c
      }
    }
    val expected = pairCnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    val got = TextQueries.queries("q95_bpe_merges")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected, s"got=$got\nwant=$expected")
  }
}
