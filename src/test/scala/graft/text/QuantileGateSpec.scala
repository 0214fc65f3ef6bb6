package graft.text

import java.security.MessageDigest
import graft.SparkTestBase

/** q105's per-language quality-quantile gate: the kept set equals a
  * driver-side recomputation (exact integer scores, exact interpolated
  * p75 per lang), and the documented production swap (percentile →
  * approx_percentile) returns the identical result on data small
  * enough that the sketch is exact. */
class QuantileGateSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def ready = java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/documents.parquet"))

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def weight(tok: String): Long = {
    val h = md5hex(s"feat|$tok")
    val hex = "0123456789abcdef"
    (hex.indexOf(h(0)) * 16 + hex.indexOf(h(1)) - 128).toLong
  }
  /** Spark/DuckDB shared definition: lo + (hi - lo) * p at rank p(n-1). */
  private def p75(sorted: Seq[Long]): Double = {
    val rank = 0.75 * (sorted.size - 1)
    val lo = sorted(rank.toInt)
    val hi = sorted(math.min(rank.toInt + 1, sorted.size - 1))
    lo + (hi - lo) * (rank - rank.toInt)
  }

  private def expectedKept(): Set[(Long, String, Long)] = {
    val scored = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split("\\s+").filter(_.nonEmpty)))
      .filter(_._3.nonEmpty)
      .map { case (id, lang, toks) => (id, lang, toks.map(weight).sum) }
    val thr = scored.groupBy(_._2).map { case (lang, rows) =>
      lang -> p75(rows.map(_._3).sorted.toSeq)
    }
    scored.filter { case (_, lang, score) => score.toDouble >= thr(lang) }.toSet
  }

  test("q105 kept set equals the driver-side exact-percentile recomputation") {
    assume(ready)
    val got = TextQueries.queries("q105_quality_quantile")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expectedKept(), s"diff: ${got.diff(expectedKept())} / ${expectedKept().diff(got)}")
  }

  test("every language keeps at least one doc and at most ~a quarter plus ties") {
    assume(ready)
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val perLangTotal = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = TextQueries.queries("q105_quality_quantile")(spark, dir)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLangTotal.foreach { case (lang, total) =>
      val k = kept.getOrElse(lang, 0L)
      assert(k >= 1, s"$lang kept nothing")
      // >= on the interpolated p75 keeps at least the top quarter;
      // ties and interpolation can push past it but never past half
      // on this fixture
      assert(k <= (total + 1) / 2, s"$lang kept $k of $total — threshold not biting")
    }
  }

  test("the documented approx_percentile production swap keeps a superset within discretization slack") {
    assume(ready)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val exact = TextQueries.quantileGateOf(docs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val approx = TextQueries.quantileGateOf(docs, exact = false)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(exact.nonEmpty)
    // approx_percentile returns a DISCRETE score from the dataset (no
    // interpolation), so its threshold is <= the interpolated exact
    // p75: the approx gate keeps every exact-kept doc plus at most the
    // borderline docs between the two thresholds — on this fixture a
    // handful, never a material drift
    assert(exact.subsetOf(approx), s"approx dropped exact-kept docs: ${exact.diff(approx)}")
    assert(approx.size - exact.size <= 5, s"approx kept too many extras: ${approx.diff(exact)}")
  }
}
