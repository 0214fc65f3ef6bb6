package graft.text

import graft.SparkTestBase

/** q122's confusion matrix must be q34's per-doc predictions,
  * aggregated: cell counts equal a groupBy over q34's output, every
  * labeled row's counts sum to that language's doc count, and ppm
  * shares sum to ≤ 1e6 per row (floor division). */
class LangidConfusionSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  test("q122 aggregates q34's per-doc predictions exactly") {
    assume(ready)
    import spark.implicits._
    val perDoc = TextQueries.queries("q34_langid")(spark, dir)
      .select($"labeled_lang", $"predicted_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = perDoc.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case ((l, p), n) => (l, p, n) }.sortBy(t => (t._1, t._2))
    val got = TextQueries.queries("q122_langid_confusion")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.map(t => (t._1, t._2, t._3)) == expected)
    // per-row accounting: counts sum to the language's doc count,
    // ppm shares sum to ≤ 1e6 (floor) and > 1e6 - |cells| per row
    val langTotals = perDoc.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    got.groupBy(_._1).foreach { case (lang, cells) =>
      assert(cells.map(_._3).sum == langTotals(lang), s"$lang row count")
      val ppm = cells.map(_._4).sum
      assert(ppm <= 1000000L && ppm > 1000000L - cells.size, s"$lang ppm sum $ppm")
    }
  }
}
